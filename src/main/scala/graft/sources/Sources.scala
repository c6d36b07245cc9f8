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

  /** A pruned read produced by [[readSkipping]]: the DataFrame over
    * only the surviving files, plus the skip accounting.
    */
  case class Skipped(df: DataFrame, selected: Int, total: Int)

  /** Land `df` range-clustered on a LONG column with a per-file
    * min/max stats manifest — Iceberg's metadata-based file skipping
    * (manifests record `lower_bounds`/`upper_bounds` per data file;
    * a predicate prunes files before any I/O). Clustering makes the
    * per-file ranges narrow, so skipping is effective; the stats
    * pass is one aggregation producing #files rows (manifest-sized).
    * The manifest lands as `_stats.tsv` (underscore-prefixed — Spark
    * file listing ignores it).
    */
  def landWithStats(df: DataFrame, path: String, statsCol: String,
      numFiles: Int): Unit = {
    import org.apache.spark.sql.functions._
    require(df.schema(statsCol).dataType == org.apache.spark.sql.types.LongType,
      s"landWithStats clusters a BIGINT column, got ${df.schema(statsCol).dataType.sql}")
    df.repartitionByRange(numFiles, df.col(statsCol))
      .sortWithinPartitions(statsCol)
      .write.mode(SaveMode.Overwrite).parquet(path)
    val stats = df.sparkSession.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(statsCol)).as("lo"), max(col(statsCol)).as("hi"))
      .collect() // #files rows — manifest-sized, not data-sized
      .filterNot(_.isNullAt(1)) // all-NULL file: no bounds → never scanned
      .map(r => s"${r.getString(0)}\t${r.getLong(1)}\t${r.getLong(2)}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path.stripPrefix("file:"), "_stats.tsv"),
      stats.sorted.mkString("", "\n", "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Scan only the files whose recorded `[lo, hi]` intersects
    * `[qLo, qHi]` — file-granular, so callers still apply the exact
    * predicate as a residual (same contract as Iceberg skipping:
    * stats prune I/O, they don't evaluate the filter). All-NULL
    * files carry no bounds and are skipped (a BETWEEN never matches
    * NULL).
    */
  def readSkipping(spark: SparkSession, path: String, statsCol: String,
      qLo: Long, qHi: Long): Skipped = {
    import scala.jdk.CollectionConverters._
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(path.stripPrefix("file:"), "_stats.tsv")).asScala
    val all = lines.filter(_.nonEmpty).map { l =>
      val Array(f, lo, hi) = l.split('\t')
      (f, lo.toLong, hi.toLong)
    }
    val keep = all.filter { case (_, lo, hi) => hi >= qLo && lo <= qHi }
    val df =
      if (keep.isEmpty) spark.read.parquet(path).limit(0)
      else spark.read.parquet(keep.map(_._1).toSeq: _*)
    Skipped(df, keep.size, all.size)
  }
}
