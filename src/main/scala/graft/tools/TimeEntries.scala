package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
/** Dev-only: isolated warm-then-timed runs of named gated entries at
  * sf0.1 — the per-entry steady-state yardstick behind SURVEY §5's
  * perf claims (bench context adds cross-entry cache pressure this
  * probe deliberately excludes).
  */
object TimeEntries {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config(graft.streaming.EventStream.STREAM_SHUFFLE_KEY, "8")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    args.foreach { name =>
      // warmup
      SparkEntry.queries(name)(spark, dir).count()
      spark.catalog.clearCache()
      // min-of-3: the sandbox host carries multi-core ambient load
      // with ±2-3x swings; the minimum is the defensible steady-state
      val runs = (1 to 3).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).count()
        val s = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        s
      }
      println(f"TIMED $name ${runs.min}%.2f s (runs: ${runs.map(r => f"$r%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
