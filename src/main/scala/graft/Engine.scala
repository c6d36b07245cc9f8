package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.GraftFunctions

/** SQL facade — the engine-side equivalent of the reference's Kyuubi
  * surface (docs/components/kyuubi.md): a user connects, the warehouse
  * tables are there, and plain Spark SQL works against them. `open`
  * registers every testdata table as a temp view and installs graft's
  * native functions; afterwards `spark.sql(...)` is the full API.
  */
object Engine {

  /** Register all warehouse tables as temp views + graft functions. */
  def open(spark: SparkSession, dir: String): SparkSession = {
    Tables.names.foreach { n =>
      Tables(spark, dir, n).createOrReplaceTempView(n)
    }
    GraftFunctions.register(spark)
    graft.functions.SqlDialect.register(spark)
    spark
  }

  /** Convenience: open + run one SQL statement. */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    open(spark, dir)
    spark.sql(query)
  }
}
