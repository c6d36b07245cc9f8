package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev-only stage profiler for q88 (same session shape as Bench). */
object ProfileQ88 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm
    t("warm full")(graft.queries.TpchSuite.q88GraphRank(spark, dir).count())
    spark.catalog.clearCache()
    t("timed full")(graft.queries.TpchSuite.q88GraphRank(spark, dir).count())
    spark.catalog.clearCache()
    // stage breakdown
    import org.apache.spark.sql.functions._
    val e0 = t("e0 distinct") {
      val d = graft.Tables(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        .join(graft.Tables(spark, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst")).distinct().persist()
      println("  |E0|=" + d.count()); d
    }
    val edges = e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst"))).persist()
    t("edges persist")(println("  |E|=" + edges.count()))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg")).persist()
    t("deg")(println("  |V|=" + deg.count()))
    var rank = deg.select(col("src").as("node"), col("deg"), (lit(1.0) / lit(16000.0)).as("r"))
    for (i <- 1 to 5) {
      rank = t(s"iter $i") {
        val r2 = rank.localCheckpoint(true)
        val contrib = edges.join(broadcast(r2), col("src") === col("node"))
          .select(col("dst"), floor(lit(0.85) * col("r") / col("deg") * lit(1e12)).as("t"))
        val agg = contrib.groupBy(col("dst")).agg(sum(col("t")).as("ts"))
        val nr = deg.select(col("src").as("node"), col("deg"))
          .join(broadcast(agg), col("node") === col("dst"), "left")
          .select(col("node"), col("deg"),
            (lit(0.15) / lit(16000.0) + coalesce(col("ts"), lit(0L)).cast("double") / lit(1e12)).as("r"))
        nr.localCheckpoint(true)
      }
    }
    t("top20")(rank.orderBy(col("r").desc).limit(20).collect())
    spark.stop()
  }
}
