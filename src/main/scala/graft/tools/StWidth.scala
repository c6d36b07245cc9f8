package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: time one streaming entry at several STREAM_SHUFFLE_KEY
  * widths (same session pattern as Bench) — the stream width is a
  * per-trigger-volume knob, and entries whose single trigger is
  * corpus-sized may want the session width, not the drain width.
  */
object StWidth {
  def main(args: Array[String]): Unit = {
    val entry = args.head
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.drop(1).foreach { w =>
      val spark = SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config(graft.streaming.EventStream.STREAM_SHUFFLE_KEY, w)
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      graft.SparkEntry.queries(entry)(spark, dir).count() // warm
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(entry)(spark, dir).count()
      println(f"WIDTH $w: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.stop()
    }
  }
}
