package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Iceberg-style PARTITION TRANSFORMS with file-level pruning — the
  * other half of hidden partitioning next to [[Layouts]] (which
  * evolves Hive directory specs): here the transform itself is
  * RECORDED IN THE TABLE'S METADATA, the partition value never
  * appears in user queries, and scan planning turns a predicate on
  * the RAW source column into the exact set of files to open via
  * transform arithmetic alone (reference: the CDC landing is
  * "partitioned by" the source timestamp — docs/components/cdc.md —
  * and Iceberg's spec derives `days(ts)` / `bucket(n, key)` values
  * the reader never names).
  *
  * Layout:
  *   tableDir/data/__pv=<v>/…parquet   one directory per partition value
  *   tableDir/_spec                    "<transform>\t<sourceCol>[\t<n>]"
  *   tableDir/_pvals                   one partition value per line
  *
  * `land` repartitions by the derived value before the partitioned
  * write, so every value directory is written by exactly ONE task →
  * exactly one file per partition value; `n_files_read` below is
  * therefore the partition-value count and oracle-derivable from the
  * transform arithmetic. `_pvals` (the manifest) is written from the
  * directory listing after the write — planning reads ONLY this
  * sidecar, never a data footer: cost = one tiny file, independent of
  * data size. At 100 TB a day-range query opens the hit days and a
  * key lookup opens one bucket; everything else is never listed.
  *
  * Transforms:
  *   - `days(srcTimestamp)` — value = days since 1970-01-01 of the
  *     source timestamp (Iceberg's `days` transform exactly).
  *   - `bucket(n, srcKey)` — value = key mod n. (Iceberg specs
  *     murmur3-32 here; this engine's recorded bucket function is
  *     `mod`, deterministic and cross-engine reproducible — the
  *     planner and writer share whatever function the spec records,
  *     which is the property that matters.)
  */
object Transforms {

  private val PvCol = "__pv"

  sealed trait Transform {
    def sourceCol: String
    /** Partition value of a row, as BIGINT. */
    def derive: Column
    def specLine: String
  }
  /** `days(ts)`: days since epoch of a timestamp/date column. */
  final case class Days(sourceCol: String) extends Transform {
    def derive: Column =
      datediff(col(sourceCol).cast("date"), lit("1970-01-01").cast("date"))
        .cast("long")
    def specLine: String = s"days\t$sourceCol"
  }
  /** `bucket(n, key)`: key mod n over an integral key column. */
  final case class Bucket(n: Int, sourceCol: String) extends Transform {
    require(n > 0, s"bucket count must be positive: $n")
    def derive: Column = pmod(col(sourceCol).cast("long"), lit(n.toLong))
    def specLine: String = s"bucket\t$sourceCol\t$n"
  }

  private def readSpec(tableDir: String): Transform = {
    val f = Paths.get(tableDir, "_spec")
    require(Files.exists(f), s"no transform spec at $tableDir")
    val p = Files.readAllLines(f, StandardCharsets.UTF_8).asScala
      .find(_.nonEmpty).get.split('\t')
    p(0) match {
      case "days" => Days(p(1))
      case "bucket" => Bucket(p(2).toInt, p(1))
      case other => throw new IllegalArgumentException(
        s"unknown transform '$other'")
    }
  }

  /** The manifest: every partition value with a data directory. */
  def partitionValues(tableDir: String): Seq[Long] = {
    val f = Paths.get(tableDir, "_pvals")
    require(Files.exists(f), s"no partition manifest at $tableDir")
    Files.readAllLines(f, StandardCharsets.UTF_8).asScala.toSeq
      .filter(_.nonEmpty).map(_.toLong).sorted
  }

  /** Land `df` partitioned by `t`'s derived value (hidden — the
    * column is dropped from the data files' payload into the
    * directory key). One task per value → one file per value.
    */
  def land(spark: SparkSession, tableDir: String, df: DataFrame,
      t: Transform): Unit = {
    Files.createDirectories(Paths.get(tableDir))
    df.withColumn(PvCol, t.derive)
      .repartition(col(PvCol))
      .write.mode(SaveMode.Overwrite).partitionBy(PvCol)
      .parquet(s"$tableDir/data")
    writeManifest(tableDir, t)
  }

  /** Manifest (+spec) rebuilt from the directory listing — what was
    * actually written, never what a writer intended.
    */
  private def writeManifest(tableDir: String, t: Transform): Unit = {
    val listing = Files.list(Paths.get(tableDir, "data"))
    val pvals =
      try listing.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.startsWith(s"$PvCol="))
        .map(_.stripPrefix(s"$PvCol=").toLong)
        .toSeq.sorted
      finally listing.close()
    Files.write(Paths.get(tableDir, "_spec"),
      s"${t.specLine}\n".getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.write(Paths.get(tableDir, "_pvals"),
      pvals.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }

  /** INCREMENTAL landing — the streaming/multi-batch variant of
    * [[land]] (the reference's CDC landing grows a day-partition at
    * a time as Debezium batches arrive, docs/components/cdc.md):
    * appends `df`'s rows into the value directories the transform
    * derives (a touched value gains one file per append — compaction
    * is [[land]]'s full rewrite or a per-directory pass), then
    * rebuilds the `_pvals` manifest so planning sees new partitions
    * immediately. The spec must match the table's recorded transform
    * — a writer cannot silently change the partitioning. `batchId`
    * makes replays idempotent: an id already in the `_batches`
    * ledger short-circuits (the foreachBatch at-least-once
    * contract); the ledger line is written AFTER the data lands, so
    * a crash mid-append re-runs the batch rather than losing it.
    * Micro-batches from one query arrive serially; this writer is
    * not safe under CONCURRENT multi-writer appends (the versioned
    * [[Snapshots]] store is the tool for that).
    */
  def append(spark: SparkSession, tableDir: String, df: DataFrame,
      t: Transform, batchId: Option[Long] = None): Unit = {
    val specF = Paths.get(tableDir, "_spec")
    if (Files.exists(specF))
      require(readSpec(tableDir).specLine == t.specLine,
        s"append with ${t.specLine} onto a ${readSpec(tableDir).specLine} table")
    val ledger = Paths.get(tableDir, "_batches")
    val seen = batchId.isDefined && Files.exists(ledger) &&
      Files.readAllLines(ledger, StandardCharsets.UTF_8).asScala
        .contains(batchId.get.toString)
    if (seen) return
    Files.createDirectories(Paths.get(tableDir))
    df.withColumn(PvCol, t.derive)
      .repartition(col(PvCol))
      .write.mode(SaveMode.Append).partitionBy(PvCol)
      .parquet(s"$tableDir/data")
    writeManifest(tableDir, t)
    batchId.foreach(id => Files.write(ledger,
      s"$id\n".getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND))
  }

  /** Open exactly the directories for `kept` values. */
  private def readParts(spark: SparkSession, tableDir: String,
      kept: Seq[Long]): DataFrame =
    if (kept.isEmpty)
      spark.read.parquet(s"$tableDir/data").filter(lit(false)).drop(PvCol)
    else
      spark.read.parquet(kept.map(v => s"$tableDir/data/$PvCol=$v"): _*)

  /** Day-range scan with the predicate on the RAW timestamp column:
    * `[from, toExcl)` date strings. Planning = transform arithmetic
    * against the `_pvals` manifest (hit days only); the exact
    * row-level predicate trims nothing here (day-aligned bounds) but
    * is applied anyway — the residual-filter contract. Returns
    * (rows, filesRead, filesTotal).
    */
  def scanDays(spark: SparkSession, tableDir: String,
      from: String, toExcl: String): (DataFrame, Long, Long) = {
    val t = readSpec(tableDir) match {
      case d: Days => d
      case other => throw new IllegalArgumentException(
        s"scanDays on a ${other.specLine} table")
    }
    val lo = java.time.LocalDate.parse(from).toEpochDay
    val hi = java.time.LocalDate.parse(toExcl).toEpochDay
    val pvals = partitionValues(tableDir)
    val kept = pvals.filter(v => v >= lo && v < hi)
    val df = readParts(spark, tableDir, kept)
      .filter(col(t.sourceCol).cast("date") >= lit(from).cast("date") &&
        col(t.sourceCol).cast("date") < lit(toExcl).cast("date"))
    (df, kept.size.toLong, pvals.size.toLong)
  }

  /** Point lookups with the predicate on the RAW key column: opens
    * only the buckets the queried keys hash to. Returns
    * (rows, filesRead, filesTotal).
    */
  def scanKeys(spark: SparkSession, tableDir: String,
      keys: Seq[Long]): (DataFrame, Long, Long) = {
    val t = readSpec(tableDir) match {
      case b: Bucket => b
      case other => throw new IllegalArgumentException(
        s"scanKeys on a ${other.specLine} table")
    }
    val pvals = partitionValues(tableDir)
    val want = keys.map(k => java.lang.Math.floorMod(k, t.n.toLong))
      .distinct.toSet
    val kept = pvals.filter(want)
    val df = readParts(spark, tableDir, kept)
      .filter(col(t.sourceCol).isin(keys: _*))
    (df, kept.size.toLong, pvals.size.toLong)
  }
}
