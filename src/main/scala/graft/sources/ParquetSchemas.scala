package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Parquet reads over IMMUTABLE store directories with the inferred
  * schema memoized per directory (JVM-wide). A committed snapshot
  * (`v=N`) or merge-on-read commit (`c=N`) directory never changes
  * after its manifest/ledger line publishes it — rollback, clone,
  * compaction and branch writes all create NEW directories — so the
  * footer-inference pass (a ~100 ms driver job per read-plan,
  * measured) is worth exactly one payment per JVM. This is the
  * Iceberg read contract: schema comes from table metadata, not from
  * re-opening data files on every plan. The FIRST read still infers
  * from the footer (so nullability and physical types are exactly
  * what inference would give); later reads reuse that same schema.
  *
  * NOT for growing directories (the transform store's `data/` tree
  * appends files in place) — callers there keep plain inference.
  */
object ParquetSchemas {
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  /** Exact row count of a parquet directory from the file footers
    * (sum of record counts) — no Spark job, no data pages read. For
    * immutable commit directories this equals `read(path).count()`.
    */
  def rowCount(spark: SparkSession, path: String): Long = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    val w = java.nio.file.Files.walk(java.nio.file.Paths.get(
      path.stripPrefix("file:")))
    try w.iterator().asScala
      .filter(f => java.nio.file.Files.isRegularFile(f) &&
        f.getFileName.toString.endsWith(".parquet"))
      .map { f =>
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f.toUri), conf))
        try reader.getRecordCount finally reader.close()
      }.sum
    finally w.close()
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    val cached = memo.get(path)
    if (cached != null) spark.read.schema(cached).parquet(path)
    else {
      val df = spark.read.parquet(path)
      memo.put(path, df.schema)
      df
    }
  }
}
