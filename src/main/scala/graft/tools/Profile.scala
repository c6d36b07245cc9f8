package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: microbenchmark of the facade/catalog hot path (guide §1:
  * measure before touching). Builds a 3-table warehouse fixture (one
  * ANALYZEd), then times the pieces a `sqlWarehouse` SELECT pays:
  * openWarehouse registration, Snapshots.read plan construction,
  * headAnalyzedRowCount, and an end-to-end facade SELECT.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    import graft.sources.Snapshots
    import org.apache.spark.sql.functions._
    def time[T](label: String, n: Int)(f: => T): Unit = {
      f // warm
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => f)
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e6 / n}%.1f ms/call (n=$n)")
    }
    val wh = graft.TempDirs.scratch("graft-prof")
    val orders = graft.Tables(spark, dir, "orders")
    val cust = graft.Tables(spark, dir, "customer")
    Snapshots.commit(orders, graft.Engine.tableDir(wh, "analytics.orders"))
    Snapshots.commit(cust, graft.Engine.tableDir(wh, "analytics.customers"))
    Snapshots.commit(cust, graft.Engine.tableDir(wh, "raw.customers"))
    graft.Engine.sqlWarehouse(spark, wh,
      "ANALYZE TABLE analytics.customers COMPUTE STATISTICS")
    val custDir = graft.Engine.tableDir(wh, "analytics.customers")
    time("Snapshots.read plan", 20) {
      Snapshots.read(spark, custDir)
    }
    time("headAnalyzedRowCount", 20) {
      Snapshots.headAnalyzedRowCount(spark, custDir)
    }
    time("openWarehouse (3 tables, 1 analyzed)", 10) {
      graft.Engine.openWarehouse(spark, wh)
    }
    time("sqlWarehouse SELECT 1-row agg", 5) {
      graft.Engine.sqlWarehouse(spark, wh,
        "SELECT COUNT(*) AS n FROM analytics.customers").collect()
    }
    time("analyzeTable(orders)", 3) {
      Snapshots.analyzeTable(spark, graft.Engine.tableDir(wh, "analytics.orders"))
    }
    // view-resolution cost per statement: 3 chained ledgered views —
    // without the r11 views memo every SELECT re-resolves all three
    graft.Engine.sqlWarehouse(spark, wh,
      "CREATE VIEW v1 AS SELECT o_custkey, o_totalprice FROM analytics.orders")
    graft.Engine.sqlWarehouse(spark, wh,
      "CREATE VIEW v2 AS SELECT o_custkey, SUM(o_totalprice) AS s FROM v1 GROUP BY o_custkey")
    graft.Engine.sqlWarehouse(spark, wh,
      "CREATE VIEW v3 AS SELECT COUNT(*) AS n FROM v2 WHERE s > 0")
    time("sqlWarehouse SELECT over 3 ledgered views", 5) {
      graft.Engine.sqlWarehouse(spark, wh, "SELECT n FROM v3").collect()
    }
    spark.stop()
  }
}
