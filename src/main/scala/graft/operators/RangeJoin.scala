package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Exact.dsum

/** Bin-bucketed range (interval) join.
  *
  * Spark plans a bare `f.v BETWEEN r.lo AND r.hi` join as
  * BroadcastNestedLoopJoin (or a cartesian product when neither side
  * fits in a broadcast) — O(|F|·|R|) compared row pairs, the classic
  * 100 TB cliff for point-in-interval matching (the reference reaches
  * the same semantics through its federated SQL surface over Iceberg
  * tables — docs/architecture/lakehouse.md:28-61).
  *
  * The scale-correct composition, using only built-in operators:
  * pick a bin width W, assign each point to bin `floor(v/W)`, EXPLODE
  * each interval into the bins it covers (`sequence(floor(lo/W),
  * floor(hi/W))` — inclusive, so every (point, interval) pair with
  * v∈[lo,hi] co-locates in exactly the point's bin, exactly once), then
  * an ordinary EQUI join on the bin plus the exact BETWEEN residual.
  * Cost: one key shuffle of |F| + Σ(span/W) rows — both sides
  * partition-parallel, no nested loop anywhere, AQE/skew handling
  * apply as on any equi join. W tunes the explode-vs-selectivity
  * trade: W ≈ median interval span ⇒ ~2 bins per interval.
  *
  * NULL semantics match SQL BETWEEN: a NULL point or bound never
  * matches (null bins never equi-match). Sides must have disjoint
  * column names.
  */
object RangeJoin {

  /** Inner-join `points` to every `intervals` row whose `[lo, hi]`
    * contains `pointCol`; returns all columns of both sides.
    */
  def binned(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    require(points.columns.toSet.intersect(intervals.columns.toSet).isEmpty,
      "range-join sides must have disjoint column names")
    def bin(c: Column): Column = floor(c / binWidth).cast("long")
    val p = points.withColumn("__graft_bin", bin(col(pointCol)))
    val iv = intervals.withColumn("__graft_bin",
      explode(sequence(bin(col(loCol)), bin(col(hiCol)))))
    p.join(iv, Seq("__graft_bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__graft_bin")
  }

  /** q65: point-in-interval enrichment under the gate — each supplier
    * sponsors the balance band `[s_acctbal−100, s_acctbal+100]`;
    * every customer whose account balance falls in a band matches
    * that supplier (bands overlap freely — a customer can match many
    * suppliers, a real interval join, not bucketing arithmetic).
    * W=250 ≈ band span ⇒ ≤ 2 bins per band. The oracle runs the
    * equivalent BETWEEN join; RuleSpec asserts the plan is nested-
    * loop-free.
    */
  def q65RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val bands = Tables(spark, dir, "supplier").select(
      col("s_suppkey"),
      (col("s_acctbal") - 100.0).as("lo"),
      (col("s_acctbal") + 100.0).as("hi"))
    val points = Tables(spark, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal"))
    binned(points, "c_acctbal", bands, "lo", "hi", binWidth = 250.0)
      .groupBy(col("s_suppkey"))
      .agg(
        count(lit(1)).as("n_in_band"),
        dsum(col("c_acctbal"), 2).as("band_balance"))
      .orderBy(col("s_suppkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q65_range_join" -> (q65RangeJoin _)
  )

  val oracles: Map[String, String] = Map(
    "q65_range_join" ->
      """SELECT s_suppkey,
        |  COUNT(*) AS n_in_band,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS band_balance
        |FROM supplier JOIN customer
        |  ON c_acctbal BETWEEN s_acctbal - 100.0 AND s_acctbal + 100.0
        |GROUP BY 1
        |ORDER BY 1""".stripMargin
  )
}
