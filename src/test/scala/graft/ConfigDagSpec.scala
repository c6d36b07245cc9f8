package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{AnalyticsDag, ConfigDag, Materialization, Runner}

/** The YAML DAG surface: config-built models must run IDENTICAL to
  * the code-built AnalyticsDag, templates must render dbt's exact
  * semantics, and every config typo must fail loudly at load time.
  */
class ConfigDagSpec extends AnyFunSuite {
  import TestSession._

  private def sources(dir: String) = Map(
    "orders" -> Tables(spark, dir, "orders"),
    "customer" -> Tables(spark, dir, "customer"))

  // the spec-local extension of the committed reference config: the
  // fourth model (user_order_summary) spelled the way a dbt user
  // would — a window-ranked SQL mart
  private val SummaryYaml =
    """#models:
      #  - name: stg_users
      #    depends_on: [customer]
      #    materialized: table
      #    sql: |
      #      SELECT c_custkey AS user_id, TRIM(c_name) AS full_name,
      #        UPPER(TRIM(c_mktsegment)) AS segment,
      #        CASE WHEN c_acctbal < 0.0 THEN 'Debt'
      #             WHEN c_acctbal < 5000.0 THEN 'Building'
      #             ELSE 'Established' END AS balance_stage
      #      FROM customer
      #  - name: user_order_summary
      #    depends_on: [stg_users, stg_orders]
      #    materialized: table
      #    sql: |
      #      WITH um AS (
      #        SELECT u.user_id, u.full_name, u.segment, u.balance_stage,
      #          COUNT(o.o_orderkey) AS total_orders,
      #          COUNT(CASE WHEN o.status = 'F' THEN 1 END) AS finished_orders,
      #          COALESCE(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_revenue,
      #          COALESCE(CAST(SUM(CASE WHEN o.status = 'F' THEN CAST(o.o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) AS finished_revenue,
      #          MIN(o.order_date) AS first_order_date,
      #          MAX(o.order_date) AS last_order_date
      #        FROM {{ ref('stg_users') }} u
      #        LEFT JOIN {{ ref('stg_orders') }} o ON u.user_id = o.o_custkey
      #        GROUP BY u.user_id, u.full_name, u.segment, u.balance_stage)
      #      SELECT *,
      #        total_revenue / NULLIF(CAST(total_orders AS DOUBLE), 0) AS avg_order_value,
      #        ROW_NUMBER() OVER (ORDER BY total_revenue DESC, user_id) AS revenue_rank,
      #        ROW_NUMBER() OVER (PARTITION BY segment ORDER BY total_revenue DESC, user_id) AS segment_revenue_rank,
      #        CASE WHEN total_orders = 0 THEN 'No Orders'
      #             WHEN total_orders = 1 THEN 'New Customer'
      #             WHEN total_orders <= 5 THEN 'Regular Customer'
      #             ELSE 'VIP Customer' END AS customer_tier
      #      FROM um
      #""".stripMargin('#')

  test("config-built reference DAG == code-built AnalyticsDag, model for model") {
    val cfgRunner = new Runner(spark, TempDirs.scratch("graft-cfgdag"))
    val models = ConfigDag.load(spark, AnalyticsDag.ReferenceDagYaml) ++
      ConfigDag.load(spark, SummaryYaml)
    cfgRunner.run(models, sources(sf))
    val codeRunner = new Runner(spark, TempDirs.scratch("graft-codedag"))
    codeRunner.run(AnalyticsDag.models, sources(sf))
    def rows(r: Runner, name: String, cols: Seq[String]): Seq[String] = {
      val df = r.readModel(name)
      df.select(cols.map(col): _*).collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    }
    val daily = codeRunner.readModel("daily_order_metrics").columns.toSeq
    assert(rows(cfgRunner, "daily_order_metrics", daily)
      == rows(codeRunner, "daily_order_metrics", daily))
    val summary = codeRunner.readModel("user_order_summary").columns.toSeq
      .filterNot(_ == "email") // code path carries email through stg_users
    assert(rows(cfgRunner, "user_order_summary", summary)
      == rows(codeRunner, "user_order_summary", summary))
    assert(cfgRunner.readModel("simple_pipeline").count() == 5L)
  }

  test("incremental template: {% if is_incremental %} renders only with a current state") {
    val m = ConfigDag.load(spark, AnalyticsDag.ReferenceDagYaml)
      .find(_.name == "daily_order_metrics").get
    assert(m.materialization ==
      Materialization.Incremental(Seq("metric_date")))
    val runner = new Runner(spark, TempDirs.scratch("graft-cfginc"))
    val models = ConfigDag.load(spark, AnalyticsDag.ReferenceDagYaml)
    val orders = Tables(spark, sf, "orders")
    // backfill + incremental refresh == one full recompute (q50's
    // property, through the YAML surface)
    runner.run(models, Map("orders" -> orders.filter(
      col("o_orderdate") < lit("1996-01-01").cast("timestamp"))))
    runner.run(models, Map("orders" -> orders))
    val full = new Runner(spark, TempDirs.scratch("graft-cfgfull"))
    full.run(models, Map("orders" -> orders))
    def dump(r: Runner) = r.readModel("daily_order_metrics").collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(dump(runner) == dump(full))
  }

  test("config parses tags, checks and full_refresh; select composes; typos are loud") {
    val models = ConfigDag.load(spark, AnalyticsDag.ReferenceDagYaml)
    assert(models.map(_.name) ==
      Seq("stg_orders", "daily_order_metrics", "simple_pipeline"))
    assert(models.find(_.name == "stg_orders").get.tags == Set("staging"))
    assert(models.find(_.name == "daily_order_metrics").get.checks.size == 2)
    assert(Runner.select(models, Seq("tag:staging+")).map(_.name)
      == Seq("stg_orders", "daily_order_metrics"))
    def loud(yaml: String): Unit =
      intercept[IllegalArgumentException] { ConfigDag.load(spark, yaml) }
    loud("models:\n  - name: x\n    materialised: table\n    sql: SELECT 1")
    loud("models:\n  - name: x\n    materialized: tabel\n    sql: SELECT 1")
    loud("models:\n  - name: x\n    materialized: incremental\n    sql: SELECT 1")
    loud("models:\n  - name: x\n    sql: SELECT 1\n    checks: [{test: nope, column: c}]")
    loud("models:\n  - name: x\n    sql: SELECT 1\n    checks: [{test: unique, column: c, severity: fatal}]")
    loud("tables:\n  - name: x")
    // full_refresh pin survives the round trip into Runner semantics
    val pinned = ConfigDag.load(spark,
      """models:
        |  - name: never_refresh
        |    depends_on: [src]
        |    materialized: incremental
        |    unique_key: [k]
        |    full_refresh: false
        |    sql: SELECT k, v FROM src
        |""".stripMargin)
    assert(pinned.head.fullRefresh.contains(false))
    import spark.implicits._
    val runner = new Runner(spark, TempDirs.scratch("graft-cfgpin"))
    val src = Seq((1L, 1.0)).toDF("k", "v")
    runner.run(pinned, Map("src" -> src))
    val rerun = runner.run(pinned, Map("src" -> src), fullRefresh = true)
    assert(rerun.head.mode == "merge",
      "full_refresh: false must veto the run flag")
  }

  test("a failing config check aborts the DAG (dbt test semantics reach the YAML surface)") {
    import spark.implicits._
    val models = ConfigDag.load(spark,
      """models:
        |  - name: gated
        |    depends_on: [src]
        |    materialized: table
        |    checks: [{test: accepted_values, column: s, values: [A, B]}]
        |    sql: SELECT k, s FROM src
        |""".stripMargin)
    val runner = new Runner(spark, TempDirs.scratch("graft-cfgcheck"))
    val bad = Seq((1L, "A"), (2L, "Z")).toDF("k", "s")
    val e = intercept[IllegalArgumentException] {
      runner.run(models, Map("src" -> bad))
    }
    assert(e.getMessage.contains("accepted_values"))
  }
}
