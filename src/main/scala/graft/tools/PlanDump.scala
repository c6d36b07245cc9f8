package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev-only: dump `.explain("formatted")` of named gated entries to
  * `plans/r11/<entry>_<tag>.txt` — the before/after plan evidence for
  * the optimization round. Usage: runMain graft.tools.PlanDump <tag>
  * <entry>... (tag = "before" | "after").
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args.head
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config(graft.streaming.EventStream.STREAM_SHUFFLE_KEY, "4")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("plans/r11"))
    args.drop(1).foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"plans/r11/${name}_$tag.txt"), formatted)
      println(s"[plandump] wrote plans/r11/${name}_$tag.txt")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
