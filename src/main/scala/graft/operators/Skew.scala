package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys: salt the big side into
  * `saltCount` sub-keys and replicate the small side across every
  * salt, so one hot key spreads over `saltCount` reducers instead of
  * melting a single one. (AQE's skew-join split handles sort-merge
  * skew automatically; explicit salting is the tool when the skew is
  * known up front or AQE can't kick in — e.g. aggregations after the
  * join.) Result is identical to the unsalted join.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salted `saltCount` ways. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltCount: Int, joinType: String = "inner"): DataFrame = {
    require(saltCount > 0, "saltCount must be positive")
    // Deterministic spread: hash of the whole big-side row modulo salt.
    val bigCols = big.columns.map(col).toIndexedSeq
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(bigCols: _*), lit(saltCount)).cast("int"))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltCount - 1))))
    bigS.join(smallS, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
