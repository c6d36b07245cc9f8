package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global ranking. `row_number() OVER (ORDER BY …)` with no
  * PARTITION BY plans as a single-partition WindowExec — every row
  * moves to ONE task (Spark itself warns "No Partition Defined"),
  * which is the first thing to fall over at 100 TB.
  *
  * `globalRowNumber` produces the IDENTICAL ranking distributed:
  *  1. range-repartition by the sort key (total order ACROSS
  *     partitions, data stays spread);
  *  2. per-partition row_number (partitioned window — parallel);
  *  3. add each partition's global offset (prefix sum over the tiny
  *     per-partition count table, broadcast back).
  *
  * The order must be total (tie-break on a unique column) — the same
  * requirement the oracle-parity rules already impose on every
  * window in this library (SURVEY.md §4).
  */
object Rank {

  /** Global row_number over `order` (must be a total order), as column
    * `rankCol`, with no single-partition data move.
    */
  def globalRowNumber(df: DataFrame, order: Seq[Column],
      rankCol: String = "row_num"): DataFrame = {
    // Eager localCheckpoint: the offsets branch and the ranked output
    // must read the SAME materialized partitioning — without it they
    // are two independent recomputations of the range exchange, and
    // spark_partition_id agreement then rests on exchange reuse +
    // deterministic range sampling, which AQE re-planning or a
    // nondeterministic upstream can break (wrong/duplicate ranks).
    // (localCheckpoint, not persist: unpersist cascades into child
    // caches, and a cache left behind leaks.)
    val parted = df.repartitionByRange(order: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    // tiny side: one row per partition → prefix-sum offsets
    val offsets = parted.groupBy(col("__pid")).count()
      .withColumn("__offset",
        sum(col("count")).over(Window.orderBy(col("__pid"))) - col("count"))
      .select(col("__pid"), col("__offset"))
    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
    parted.join(broadcast(offsets), "__pid")
      .withColumn(rankCol, row_number().over(w) + col("__offset"))
      .drop("__pid", "__offset")
  }

  /** Global RANK() (ties share the smallest position) distributed:
    * row_number over a totalized order, then min-per-value-group — a
    * value-partitioned window, never a single-partition move. `values`
    * are the raw ranking value columns (tie groups); `order` the same
    * values with sort direction; `tiebreak` any unique column(s).
    * percent_rank at scale = (globalRank - 1) / (N - 1).
    */
  def globalRank(df: DataFrame, values: Seq[Column], order: Seq[Column],
      tiebreak: Seq[Column], rankCol: String = "rank"): DataFrame = {
    val rn = globalRowNumber(df, order ++ tiebreak, "__rn")
    rn.withColumn(rankCol, min(col("__rn")).over(Window.partitionBy(values: _*)))
      .drop("__rn")
  }
}
