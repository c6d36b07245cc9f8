package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: explain ONE q88 Jacobi iteration under both edge-table
  * layouts — unpartitioned (pre-r10) vs hash-partitioned on dst
  * (r10) — because the gated entry's final plan is localCheckpoint-
  * truncated and cannot show the per-iteration Exchange. Writes
  * plans/r10/q88_iteration_{before,after}.txt.
  */
object Q88Iter {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    def t(n: String) = graft.Tables(spark, dir, n)
    val e0 = t("orders").select(col("o_orderkey"), col("o_custkey"))
      .join(t("lineitem").select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2L).as("src"),
        (col("l_suppkey") * 2L + 1L).as("dst"))
      .distinct()
    val und = e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("plans/r10"))
    Seq(("before", und.persist()),
        ("after", und.repartition(col("dst")).persist())).foreach {
      case (tag, edges) =>
        edges.count()
        val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        val rank = deg.select(col("src").as("node"), col("deg"),
          lit(0.001).as("r")).localCheckpoint(eager = true)
        val contrib = edges
          .join(broadcast(rank), col("src") === col("node"))
          .select(col("dst"),
            floor(lit(0.85) * col("r") / col("deg") * lit(1e12)).as("t"))
        val agg = contrib.groupBy(col("dst")).agg(sum(col("t")).as("ts"))
        agg.collect()
        val plan = agg.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"plans/r10/q88_iteration_$tag.txt"), plan)
        val nEx = "Exchange".r.findAllIn(
          agg.queryExecution.executedPlan.toString).length
        println(s"[q88iter] $tag: exchanges in iteration combine = $nEx")
        edges.unpersist(true)
    }
    spark.stop()
  }
}
