package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: the ANALYZE TABLE aggregate in both shapes — the pre-r10
  * single aggregate carrying every column's countDistinct (plans an
  * Expand ×(C+1) and a wide-keyed hash aggregate) vs one per-column
  * single-distinct aggregate (no Expand, one-column scan). Writes
  * plans/r10/q108_analyze_agg_{before,after}.txt; the gated entry's
  * own explain cannot show this (the aggregate runs eagerly inside
  * analyzeTable).
  */
object AnalyzeShape {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val df = graft.Tables(spark, dir, "orders")
    val fields = df.schema.fields.toSeq
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("plans/r10"))
    val oldAggs = fields.flatMap { f =>
      Seq(count(col(f.name)).as(s"nn_${f.name}"),
        countDistinct(col(f.name)).as(s"nd_${f.name}"),
        min(col(f.name)).cast("string").as(s"mn_${f.name}"),
        max(col(f.name)).cast("string").as(s"mx_${f.name}"))
    }
    val before = df.agg(count(lit(1)).as("n_rows"), oldAggs: _*)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("plans/r10/q108_analyze_agg_before.txt"),
      before.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    val f0 = fields.head
    val after = df.select(col(f0.name)).agg(
      count(lit(1)).as("n_rows"), count(col(f0.name)).as("nn"),
      countDistinct(col(f0.name)).as("nd"),
      min(col(f0.name)).cast("string").as("mn"),
      max(col(f0.name)).cast("string").as("mx"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("plans/r10/q108_analyze_agg_after.txt"),
      after.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode) +
        s"\n(one such aggregate per column, submitted concurrently; " +
        s"${fields.size} columns here)\n")
    def n(df: org.apache.spark.sql.DataFrame, pat: String) =
      pat.r.findAllIn(df.queryExecution.executedPlan.toString).length
    println(s"[analyzeshape] before: expand=${n(before, "Expand")}")
    println(s"[analyzeshape] after : expand=${n(after, "Expand")}")
    spark.stop()
  }
}
