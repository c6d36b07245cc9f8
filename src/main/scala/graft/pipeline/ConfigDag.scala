package graft.pipeline

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Declarative DAG definition — the reference's actual authoring
  * surface: its Airflow DAG is GENERATED from config
  * (dag/config/pipeline_config.py; docs/architecture/orchestration.md
  * §6 "Dynamic DAGs — generate DAGs programmatically from YAML"), and
  * its models are SQL files with dbt front-matter
  * (the dbt/analytics/models tree: `materialized=`, `unique_key=`,
  * `tags=`, `{{ ref('…') }}`, `{% if is_incremental() %}`). This
  * loader turns ONE YAML document into [[Runner]] models, so a
  * pipeline is data, not Scala:
  *
  * {{{
  * models:
  *   - name: stg_orders
  *     depends_on: [orders]
  *     materialized: table            # table|view|ephemeral|incremental
  *     sql: SELECT … FROM orders
  *   - name: daily_order_metrics
  *     depends_on: [stg_orders]
  *     materialized: incremental
  *     unique_key: [metric_date]
  *     on_schema_change: fail         # or append_new_columns
  *     full_refresh: false            # optional pin (dbt config)
  *     tags: [marts, daily]
  *     checks:
  *       - {test: not_null, column: metric_date}
  *       - {test: unique, column: metric_date, severity: warn}
  *       - {test: accepted_values, column: status, values: [F, O, P]}
  *     sql: |
  *       SELECT … FROM {{ ref('stg_orders') }}
  *       {% if is_incremental() %}
  *       WHERE order_date >= (SELECT MAX(metric_date) FROM {{ this }})
  *       {% endif %}
  * }}}
  *
  * Template surface (deliberately the dbt subset the reference's
  * models use, nothing more): `{{ ref('x') }}` resolves to the
  * dependency's registered view, `{{ this }}` to the model's current
  * materialized state, and the `is_incremental()` block is kept only
  * when the model HAS a current state (dbt's exact semantics — off on
  * the first build and under `--full-refresh`). Each model's SQL runs
  * with its declared deps registered as temp views under their own
  * names; an undeclared reference fails at run time (Spark's
  * TABLE_OR_VIEW_NOT_FOUND), exactly like a missing `ref()` in dbt.
  *
  * Unknown YAML keys fail loudly — a typo like `materialised:` must
  * never silently default. `relationships` checks and seeds are out
  * of the config surface (they need closures / file paths; declare
  * those models in code).
  */
object ConfigDag {

  private val KnownKeys = Set("name", "depends_on", "materialized",
    "unique_key", "on_schema_change", "full_refresh", "tags", "checks",
    "sql")
  private val KnownCheckKeys = Set("test", "column", "severity", "values")

  private val IncrementalBlock =
    """(?s)\{%\s*if\s+is_incremental\s*(?:\(\s*\))?\s*%\}(.*?)\{%\s*endif\s*%\}""".r
  private val RefCall = """\{\{\s*ref\s*\(\s*'([^']+)'\s*\)\s*\}\}""".r
  private val ThisRef = """\{\{\s*this\s*\}\}""".r

  /** Render the dbt-subset template: strip or keep the incremental
    * block, substitute refs. Exposed for tests.
    */
  private[pipeline] def render(sql: String, incremental: Boolean): String = {
    val afterIf = IncrementalBlock.replaceAllIn(sql, m =>
      if (incremental)
        scala.util.matching.Regex.quoteReplacement(m.group(1))
      else "")
    val afterRef = RefCall.replaceAllIn(afterIf, m =>
      scala.util.matching.Regex.quoteReplacement(m.group(1)))
    ThisRef.replaceAllIn(afterRef, "this")
  }

  private def asStrSeq(v: Any): Seq[String] = v match {
    case null => Nil
    case l: java.util.List[_] => l.asScala.toSeq.map(String.valueOf)
    case s => Seq(String.valueOf(s))
  }

  private def parseCheck(raw: Any): Checks.Check = {
    val m = raw.asInstanceOf[java.util.Map[String, Any]].asScala
    val unknown = m.keySet -- KnownCheckKeys
    require(unknown.isEmpty, s"config check: unknown keys $unknown")
    val column = String.valueOf(m.getOrElse("column",
      throw new IllegalArgumentException("config check needs a column")))
    val severity = m.get("severity").map(String.valueOf)
      .getOrElse(Checks.Error)
    require(severity == Checks.Error || severity == Checks.Warn,
      s"config check: severity must be error|warn, got '$severity'")
    String.valueOf(m.getOrElse("test", "")) match {
      case "not_null" => Checks.NotNull(column, severity)
      case "unique" => Checks.Unique(column, severity)
      case "accepted_values" =>
        Checks.AcceptedValues(column, asStrSeq(m.getOrElse("values", null)),
          severity)
      case other => throw new IllegalArgumentException(
        s"config check: unknown test '$other' " +
          "(supported: not_null, unique, accepted_values)")
    }
  }

  /** Parse one YAML document into Runner models. The SQL executes on
    * the session of the model's resolved inputs (falling back to
    * `spark`), with deps registered as temp views — model names ARE
    * the namespace, the dbt convention.
    */
  def load(spark: SparkSession, yamlText: String): Seq[Model] = {
    val root = new org.yaml.snakeyaml.Yaml().load[Any](yamlText)
      .asInstanceOf[java.util.Map[String, Any]].asScala
    val rawModels = root.getOrElse("models",
      throw new IllegalArgumentException("config: no `models:` list"))
      .asInstanceOf[java.util.List[Any]].asScala.toSeq
    require(rawModels.nonEmpty, "config: empty `models:` list")
    rawModels.map { raw =>
      val m = raw.asInstanceOf[java.util.Map[String, Any]].asScala
      val unknown = m.keySet -- KnownKeys
      require(unknown.isEmpty,
        s"config model: unknown keys $unknown (known: $KnownKeys)")
      val name = String.valueOf(m.getOrElse("name",
        throw new IllegalArgumentException("config model needs a name")))
      val deps = asStrSeq(m.getOrElse("depends_on", null))
      val sql = String.valueOf(m.getOrElse("sql",
        throw new IllegalArgumentException(s"model '$name' needs sql")))
      val mat = String.valueOf(m.getOrElse("materialized", "view")) match {
        case "table" => Materialization.Table
        case "view" => Materialization.View
        case "ephemeral" => Materialization.Ephemeral
        case "incremental" =>
          val keys = asStrSeq(m.getOrElse("unique_key",
            throw new IllegalArgumentException(
              s"incremental model '$name' needs unique_key")))
          val policy = m.get("on_schema_change").map(String.valueOf) match {
            case None | Some("fail") => Materialization.SchemaChange.Fail
            case Some("append_new_columns") =>
              Materialization.SchemaChange.AppendNewColumns
            case Some(other) => throw new IllegalArgumentException(
              s"model '$name': unknown on_schema_change '$other'")
          }
          Materialization.Incremental(keys, policy)
        case other => throw new IllegalArgumentException(
          s"model '$name': unknown materialized '$other' " +
            "(supported: table, view, ephemeral, incremental)")
      }
      val checks = m.get("checks").map(_.asInstanceOf[java.util.List[Any]]
        .asScala.toSeq.map(parseCheck)).getOrElse(Nil)
      val tags = asStrSeq(m.getOrElse("tags", null)).toSet
      val pin = m.get("full_refresh").map {
        case b: java.lang.Boolean => b.booleanValue()
        case other => throw new IllegalArgumentException(
          s"model '$name': full_refresh must be a boolean, got '$other'")
      }
      val build: (Map[String, DataFrame], Option[DataFrame]) => DataFrame =
        (inputs, cur) => {
          val session = inputs.headOption.map(_._2.sparkSession)
            .orElse(cur.map(_.sparkSession)).getOrElse(spark)
          inputs.foreach { case (n, df) => df.createOrReplaceTempView(n) }
          cur.foreach(_.createOrReplaceTempView("this"))
          session.sql(render(sql, incremental = cur.isDefined))
        }
      Model(name, deps, mat, build, checks, tags, pin)
    }
  }
}
