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
