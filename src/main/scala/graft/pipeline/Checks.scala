package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** dbt-style data-quality checks (`tests:` in a model's schema.yml —
  * the reference's dbt project declares `test-paths` for exactly
  * these): not_null, unique, accepted_values, relationships. Each
  * check compiles to ONE aggregate over the table (no driver-side
  * row pulls), and a check suite is a union of those one-row
  * aggregates — a single distributed plan whose output is the test
  * report. [[Runner]] runs a model's suite right after
  * materialization and aborts the DAG on failure, dbt's
  * severity=error semantic.
  */
object Checks {

  sealed trait Check {
    def name: String
    def column: String
  }
  /** Column must contain no NULLs. */
  final case class NotNull(column: String) extends Check {
    val name = "not_null"
  }
  /** Column values must be pairwise distinct (violations = extra
    * copies beyond the first of each value).
    */
  final case class Unique(column: String) extends Check {
    val name = "unique"
  }
  /** Non-null values must come from the accepted set. */
  final case class AcceptedValues(column: String, values: Seq[String]) extends Check {
    val name = "accepted_values"
  }
  /** Non-null values must exist in `refColumn` of the parent table —
    * dbt's referential-integrity test. `ref` resolves the parent
    * lazily so a suite can be declared before the warehouse exists.
    */
  final case class Relationships(column: String, refColumn: String,
      ref: () => DataFrame) extends Check {
    val name = "relationships"
  }

  /** One check → a one-row DataFrame (check_name, col_name,
    * n_violations, passed).
    */
  def summaryOne(df: DataFrame, check: Check): DataFrame = {
    def wrap(violations: Column): DataFrame =
      df.agg(violations.cast("long").as("n_violations"))
        .select(
          lit(check.name).as("check_name"),
          lit(check.column).as("col_name"),
          col("n_violations"),
          (col("n_violations") === 0L).as("passed"))
    check match {
      case NotNull(c) =>
        wrap(count(when(col(c).isNull, 1)))
      case Unique(c) =>
        wrap(count(col(c)) - countDistinct(col(c)))
      case AcceptedValues(c, vs) =>
        // NULLs are not_null's job, not accepted_values' (dbt ditto)
        wrap(count(when(!col(c).isin(vs: _*), 1)))
      case Relationships(c, refCol, ref) =>
        val child = df.select(col(c)).filter(col(c).isNotNull)
        val orphans = child.join(ref().select(col(refCol).as(c)), Seq(c), "left_anti")
        orphans.agg(count(lit(1)).cast("long").as("n_violations"))
          .select(
            lit(check.name).as("check_name"),
            lit(check.column).as("col_name"),
            col("n_violations"),
            (col("n_violations") === 0L).as("passed"))
    }
  }

  /** A suite → one report DataFrame, ordered by (check_name, col_name). */
  def summary(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty check suite")
    checks.map(summaryOne(df, _)).reduce(_.unionAll(_))
      .orderBy(col("check_name"), col("col_name"))
  }

  /** q54: the dbt test-suite semantic under the oracle gate — four
    * check types over orders (+ customer as the relationships
    * parent); oracle recomputes each count in SQL.
    */
  def q54QualityChecks(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir, "orders")
    summary(orders, Seq(
      NotNull("o_custkey"),
      Unique("o_orderkey"),
      AcceptedValues("o_orderstatus", Seq("F", "O", "P")),
      Relationships("o_custkey", "c_custkey",
        () => Tables(spark, dir, "customer"))))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q54_quality_checks" -> (q54QualityChecks _)
  )

  val oracles: Map[String, String] = Map(
    "q54_quality_checks" ->
      """SELECT * FROM (
        |  SELECT 'not_null' AS check_name, 'o_custkey' AS col_name,
        |    COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS n_violations,
        |    COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) = 0 AS passed
        |  FROM orders
        |  UNION ALL
        |  SELECT 'unique', 'o_orderkey',
        |    COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey),
        |    COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) = 0
        |  FROM orders
        |  UNION ALL
        |  SELECT 'accepted_values', 'o_orderstatus',
        |    COUNT(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 END),
        |    COUNT(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 END) = 0
        |  FROM orders
        |  UNION ALL
        |  SELECT 'relationships', 'o_custkey',
        |    (SELECT COUNT(*) FROM orders o
        |     WHERE o.o_custkey IS NOT NULL
        |       AND NOT EXISTS (SELECT 1 FROM customer c
        |                       WHERE c.c_custkey = o.o_custkey)),
        |    (SELECT COUNT(*) FROM orders o
        |     WHERE o.o_custkey IS NOT NULL
        |       AND NOT EXISTS (SELECT 1 FROM customer c
        |                       WHERE c.c_custkey = o.o_custkey)) = 0
        |) ORDER BY check_name, col_name""".stripMargin
  )
}
