package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler for the dupLabels fixpoint (dev-only). */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warmup JVM on an unrelated query
    graft.Tables(spark, dir, "documents").count()
    time("d06 full (run 1)") {
      graft.operators.Dedup.d06DupClusters(spark, dir).write.mode("overwrite")
        .parquet("/tmp/profile_d06")
    }
    spark.catalog.clearCache()
    time("d06 full (run 2)") {
      graft.operators.Dedup.d06DupClusters(spark, dir).write.mode("overwrite")
        .parquet("/tmp/profile_d06")
    }
    spark.stop()
  }
}
