package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Source/sink breadth — the lake-side formats the reference ingests
  * (parquet landing zones, CSV/JSON drops from Kafka Connect, ORC
  * interchange) plus layout tools (partitioned writes, the on-disk
  * organization that makes 100 TB scans prunable).
  */
object Sources {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readCsv(spark: SparkSession, path: String, header: Boolean = true): DataFrame =
    spark.read.option("header", header.toString).option("inferSchema", "true").csv(path)

  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** Hive-style partitioned parquet: the partition column becomes the
    * directory key, so `WHERE part = x` prunes whole directories at
    * scan planning (the layout the reference's Iceberg tables get from
    * `partitioned by __source_ts` in docs/components/cdc.md).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed + sorted table: both sides of a fact⋈fact join bucketed
    * the same way join with NO shuffle exchange (each bucket pairs up
    * 1:1) — the layout that turns the biggest 100 TB join from a
    * full-cluster shuffle into local merges. Registered via
    * saveAsTable (bucketing metadata lives in the catalog).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int, path: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Small-file compaction — streaming/CDC ingest (one file per
    * micro-batch per partition, the reference's Kafka→Iceberg sink
    * pattern) degrades scans with open/footer overhead; periodically
    * rewrite to ~targetMB files. File count derives from actual input
    * bytes; sortCols (optional) co-locates hot predicate ranges so
    * row-group min/max stats prune after the rewrite. Reads + writes
    * are distributed; only file STATS are driver-side.
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetMB: Int = 256, sortCols: Seq[String] = Nil): Long = {
    val df = spark.read.parquet(inPath)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val nFiles = math.max(1L,
      (bytes / (targetMB.toLong * 1024 * 1024)).toLong).toInt
    val laid =
      if (sortCols.nonEmpty)
        df.repartitionByRange(nFiles, sortCols.map(df.col): _*)
          .sortWithinPartitions(sortCols.map(df.col): _*)
      else df.repartition(nFiles)
    laid.write.mode(SaveMode.Overwrite).parquet(outPath)
    nFiles.toLong
  }
}
