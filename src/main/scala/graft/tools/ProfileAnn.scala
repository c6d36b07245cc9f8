package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev-only timer for the kmeans/PQ entries (same session shape as
  * Bench: warmup pass, then timed count) — backs the r8 argmin-
  * aggregate rework of s08/s10/s11.
  */
object ProfileAnn {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ids = Seq("s08_ann_kmeans", "s10_pq_codebook", "s11_pq_search",
      "d10_semantic_dedup")
    ids.foreach { id =>
      try graft.SparkEntry.queries(id)(spark, dir).count()
      catch { case e: Throwable => println(s"[prof] warmup $id: $e") }
      spark.catalog.clearCache()
    }
    (1 to 2).foreach { run =>
      ids.foreach { id =>
        System.gc()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(id)(spark, dir).count()
        println(f"[prof] run$run $id: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
