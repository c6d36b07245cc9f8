package graft

import org.scalatest.funsuite.AnyFunSuite

/** The Kyuubi-equivalent surface check: for oracles written in the
  * ANSI subset both engines parse, the SAME SQL TEXT runs through
  * `Engine.open` + `spark.sql` and must produce exactly the DataFrame
  * API result. One engine, three access paths (DataFrame, Spark SQL,
  * DuckDB oracle) — all agreeing on values.
  */
class SqlParitySpec extends AnyFunSuite {
  import TestSession._

  // oracles that avoid DuckDB-only functions (epoch_ms,
  // string_split_regex, list_*, QUALIFY, //-division)
  private val ansiOracles = Seq(
    "q01_pricing_summary", "q05_revenue_by_nation", "q06_forecast_revenue",
    "q26_order_priority", "q27_local_supplier_volume", "q28_nation_volume",
    "q30_profit_by_nation_year", "q32_customer_distribution",
    "q33_promo_revenue", "q34_top_supplier", "q36_disjunctive_revenue",
    "q37_parts_supplier_count", "q41_grouping_sets", "q44_dormant_customers",
    "q45_waiting_suppliers", "q47_null_semantics", "q49_salted_join")

  test("ANSI oracles run verbatim through the SQL facade and match the DataFrame API") {
    Engine.open(spark, sf)
    ansiOracles.foreach { name =>
      val viaSql = spark.sql(SparkEntry.oracleSql(name))
      val viaDf = SparkEntry.queries(name)(spark, sf)
      val a = viaSql.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted
      val b = viaDf.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted
      assert(a.length == b.length, s"$name: row count ${a.length} vs ${b.length}")
      a.zip(b).zipWithIndex.foreach { case ((x, y), i) =>
        assert(x == y, s"$name row $i:\n  sql: $x\n  df:  $y")
      }
    }
  }
}
