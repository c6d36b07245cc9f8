package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for additive rollups.
  *
  * Given a stored materialization `mat` (per-group long count +
  * DECIMAL sums — exact internal state) and the changed rows of a
  * base-table transition (old versions of deleted/updated rows, new
  * versions of inserted/updated rows — e.g. recovered from
  * `Snapshots.diff` keys with two left-semi joins), produces the
  * materialization of the NEW state without touching unchanged
  * groups' source rows: signed partial aggregates over the change
  * set, one full-outer merge join on the group key. Maintenance cost
  * ∝ |changes|; recompute cost ∝ |table| — the 100 TB refresh path
  * (dbt incremental materializations + Iceberg incremental scans,
  * reference daily_order_metrics.sql / docs/components/iceberg.md).
  *
  * Decimal addition is exact, so maintained == recomputed bit-for-bit
  * (q66's oracle proves it). Groups whose count reaches 0 drop out;
  * non-additive derivations (AVG, rates) belong at read time, over
  * the maintained sums.
  *
  * `sums` maps each measure column of the row sides to its
  * materialized sum column in `mat`; measures are aggregated as
  * `DECIMAL(18, scale)`. `mat` must carry `groupCols ++ countCol ++
  * sums.values`.
  */
object Ivm {

  def maintain(mat: DataFrame, oldRows: DataFrame, newRows: DataFrame,
      groupCols: Seq[String], countCol: String,
      sums: Seq[(String, String)], scale: Int = 2): DataFrame = {
    require(groupCols.nonEmpty, "maintain needs group columns")
    val dec = s"decimal(18,$scale)"
    def signed(df: DataFrame, w: Int) = df.withColumn("__graft_w", lit(w))
    val delta = signed(oldRows, -1).unionByName(signed(newRows, 1))
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(col("__graft_w").cast("long")).as("__graft_dn"),
        sums.map { case (src, matCol) =>
          sum(col(src).cast(dec) * col("__graft_w")).as(s"__graft_d_$matCol")
        }: _*)
    // NULL-SAFE merge join: SQL GROUP BY puts NULL keys in one group,
    // so the maintenance join must match them too (<=>), not drop
    // them into two disjoint rows as a plain equi join would
    val m = mat.as("m")
    val d = delta.as("d")
    val cond = groupCols.map(c => col(s"m.$c") <=> col(s"d.$c")).reduce(_ && _)
    m.join(d, cond, "full_outer")
      .select(groupCols.map(c => coalesce(col(s"m.$c"), col(s"d.$c")).as(c)) ++ Seq(
        (coalesce(col(s"m.$countCol"), lit(0L)) +
          coalesce(col("__graft_dn"), lit(0L))).as(countCol)) ++
        sums.map { case (_, matCol) =>
          (coalesce(col(s"m.$matCol"), lit(0).cast(dec)) +
            coalesce(col(s"__graft_d_$matCol"), lit(0).cast(dec))).as(matCol)
        }: _*)
      .filter(col(countCol) > 0)
  }
}
