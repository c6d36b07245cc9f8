package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Exact.dsum

/** Structured Streaming surface — the engine-side equivalent of the
  * reference's Debezium→Kafka ingestion path (docs/components/cdc.md):
  * event streams land as files and are aggregated with event-time
  * windows + watermark. Locally we drive the stream synchronously from
  * the events parquet via a memory sink; on a cluster the same plan
  * runs against a Kafka/file source with a real trigger.
  */
object EventStream {

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),       // TIMESTAMP(NANOS) read as long
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** st01: event-time windowed aggregation (6 h tumbling, 1 h
    * watermark) run through a real StreamingQuery.
    */
  def st01StreamWindow(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stream = spark.readStream
      .schema(eventsSchema)
      .option("pathGlobFilter", "events.parquet")  // file source needs a dir
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "1 hour")
    val agg = stream
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value"), 4).as("total_value"))
    spark.catalog.dropTempView("st01_out")
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("st01_out")
      .start()
    try {
      q.processAllAvailable()
    } finally {
      q.stop()
    }
    spark.table("st01_out")
      .select(
        unix_millis(col("window.start")).as("window_start_ms"),
        col("event_type"), col("n_events"), col("total_value"))
      .orderBy(col("window_start_ms"), col("event_type"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st01_stream_window" -> (st01StreamWindow _)
  )

  // time_bucket's default origin (2000-01-03) is a whole multiple of
  // 6 h from the epoch, so buckets align with Spark's epoch-aligned
  // window() for divisors of 24 h.
  val oracles: Map[String, String] = Map(
    "st01_stream_window" ->
      """SELECT epoch_ms(time_bucket(INTERVAL '6 hours', ts)) AS window_start_ms,
        |  event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin
  )
}
