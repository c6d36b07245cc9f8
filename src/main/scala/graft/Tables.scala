package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loader for the driver-generated testdata layout
  * (`<dir>/<name>.parquet`). One function so every operator reads
  * through the same (pushdown-friendly, plain `spark.read`) path.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts varies across generator versions: parquet
      // TIMESTAMP(NANOS) (which Spark 4 only reads as long, via the
      // legacy conf) or TIMESTAMP(MICROS) with isAdjustedToUTC=false
      // (read natively as TIMESTAMP_NTZ). Normalize both to a
      // microsecond TimestampType so every operator sees one shape.
      // All graft sessions run with session.timeZone=UTC, so the
      // NTZ→LTZ cast is value-preserving.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          // nanos long → micros long → timestamp; `div` stays in Long
          // (a double round-trip would lose precision above 2^53 ns)
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts", col("ts").cast("timestamp"))
        case _ => df
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }

  /** Ensure at least the session's shuffle width of partitions before
    * CPU-heavy per-row work (hashing, gram explosion). A local
    * single-file scan is ONE task, so everything narrow downstream of
    * it runs single-threaded; on a cluster the scan already has ≥
    * width splits and this adds nothing. The repartition only ships
    * the projected columns, so spread a slim projection, not the
    * full table. Call ONLY on scan-rooted frames (scan + filter +
    * project): the width probe plans the frame's RDD, and under AQE
    * a frame containing a shuffle would materialize its upstream
    * stages eagerly — once for the probe and again for the action.
    */
  def spread(df: DataFrame): DataFrame = {
    val width = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    if (df.rdd.getNumPartitions < width) df.repartition(width) else df
  }
}
