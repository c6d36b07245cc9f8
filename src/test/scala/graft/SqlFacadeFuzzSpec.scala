package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Mor, Snapshots}

/** Adversarial statements against the facade's statement parsing
  * (Engine's regex surface + parseAssignments): every entry must
  * either parse CORRECTLY or fail LOUDLY — the one forbidden outcome
  * is a silent mis-parse (r8's MERGE-ON finding class). Keywords
  * hide inside string literals, `''` escapes land mid-assignment,
  * commas nest in function calls, travel clauses appear as data.
  */
class SqlFacadeFuzzSpec extends AnyFunSuite {
  import TestSession._

  private def freshWh(): String = {
    import spark.implicits._
    val wh = TempDirs.scratch("graft-fuzz")
    Snapshots.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "s"),
      Engine.tableDir(wh, "lake.dim"))
    Engine.sqlWarehouse(spark, wh,
      "CREATE TABLE raw.t AS SELECT id AS k, CAST('x' AS STRING) AS s " +
        "FROM range(5)")
    wh
  }

  test("keywords inside string literals never trigger statement surgery") {
    val wh = freshWh()
    def sql(q: String) = Engine.sqlWarehouse(spark, wh, q)
    // UPDATE whose literal contains other statements' keywords
    sql("UPDATE raw.t SET s = 'DELETE FROM raw.t WHERE 1=1' WHERE k = 1")
    assert(sql("SELECT s FROM raw.t WHERE k = 1").head().getString(0)
      == "DELETE FROM raw.t WHERE 1=1")
    assert(sql("SELECT COUNT(*) AS n FROM raw.t").head().getLong(0) == 5L,
      "the literal DELETE must not have deleted anything")
    // travel spellings as DATA: literal untouched, no view surgery
    assert(sql("SELECT COUNT(*) AS n FROM lake.dim " +
      "WHERE s <> 'lake.dim VERSION AS OF 1'").head().getLong(0) == 2L)
    assert(sql("SELECT 'dim TIMESTAMP AS OF NOW()' AS x FROM lake.dim")
      .head().getString(0) == "dim TIMESTAMP AS OF NOW()")
    assert(sql("SELECT 'see dim$history and table_changes(''t'',1,2)' AS x " +
      "FROM lake.dim").count() == 2L)
    // DELETE guarded by a literal containing DELETE
    sql("DELETE FROM raw.t WHERE s = 'DELETE'")
    assert(sql("SELECT COUNT(*) AS n FROM raw.t").head().getLong(0) == 5L)
  }

  test("parseAssignments: '' escapes, nested commas/parens, = inside literals") {
    val wh = freshWh()
    def sql(q: String) = Engine.sqlWarehouse(spark, wh, q)
    def sAt(k: Long): String =
      sql(s"SELECT s FROM raw.t WHERE k = $k").head().getString(0)
    sql("UPDATE raw.t SET s = 'it''s' WHERE k = 2")
    assert(sAt(2) == "it's")
    sql("UPDATE raw.t SET s = concat('a,b', ',', 'c(d,e)') WHERE k = 3")
    assert(sAt(3) == "a,b,c(d,e)")
    sql("UPDATE raw.t SET s = 'a=b' WHERE k = 4")
    assert(sAt(4) == "a=b")
    // multi-assignment with a literal comma in the middle
    Engine.sqlWarehouse(spark, wh,
      "CREATE TABLE raw.u AS SELECT id AS k, CAST('x' AS STRING) AS a, " +
        "CAST('y' AS STRING) AS b FROM range(3)")
    sql("UPDATE raw.u SET a = 'p,q', b = upper(concat(a, ',', 'z')) WHERE k = 0")
    val r = sql("SELECT a, b FROM raw.u WHERE k = 0").head()
    // SQL-standard UPDATE: every SET expression sees the OLD row —
    // b reads a's pre-update value 'x', never the fresh 'p,q'
    assert(r.getString(0) == "p,q" && r.getString(1) == "X,Z")
    // SET of an unknown column: loud, nothing written
    intercept[IllegalArgumentException] {
      sql("UPDATE raw.u SET nope = 1 WHERE k = 0") }
    // malformed assignment: loud, nothing written
    intercept[Exception] { sql("UPDATE raw.t SET s WHERE k = 1") }
  }

  test("MERGE ON: parens, reversed aliases and qualified spellings parse or refuse loudly") {
    import spark.implicits._
    val wh = freshWh()
    Snapshots.commit(Seq((2L, "B"), (3L, "C")).toDF("k", "s"),
      Engine.tableDir(wh, "lake.src"))
    def sql(q: String) = Engine.sqlWarehouse(spark, wh, q)
    // reversed sides in the equality still key-match (s.k = t.k)
    sql("""MERGE INTO lake.dim t USING lake.src s ON s.k = t.k
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(sql("SELECT COUNT(*) AS n FROM lake.dim").head().getLong(0) == 3L)
    // parenthesized ON conjunct: outside the supported grammar ->
    // loud refusal, never a silently dropped predicate
    intercept[IllegalArgumentException] {
      sql("""MERGE INTO lake.dim t USING lake.src s ON (t.k = s.k)
            |WHEN MATCHED THEN UPDATE SET *
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin) }
    // ON against a literal: refused
    intercept[IllegalArgumentException] {
      sql("""MERGE INTO lake.dim t USING lake.src s ON t.k = 'k'
            |WHEN MATCHED THEN UPDATE SET *
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin) }
  }

  test("TBLPROPERTIES/TRUNCATE/EXPLAIN statements: adversarial values parse whole or refuse loudly") {
    val wh = freshWh()
    def sql(q: String) = Engine.sqlWarehouse(spark, wh, q)
    def props(): Map[String, String] =
      sql("SHOW TBLPROPERTIES lake.dim").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
    // statement keywords, commas, parens and '' escapes INSIDE values
    sql("ALTER TABLE lake.dim SET TBLPROPERTIES " +
      "('note' = 'TRUNCATE TABLE lake.dim, DROP(x), it''s fine')")
    assert(props()("note") == "TRUNCATE TABLE lake.dim, DROP(x), it's fine")
    assert(sql("SELECT COUNT(*) AS n FROM lake.dim").head().getLong(0) == 2L,
      "a value mentioning TRUNCATE must not truncate anything")
    // an UNSET key list with a quoted comma-bearing key refuses loudly
    // (keys are single quoted identifiers, not expressions)
    intercept[Exception] {
      sql("ALTER TABLE lake.dim UNSET TBLPROPERTIES (note, 'x')")
    }
    // malformed pair (missing quotes) refuses loudly, ledger untouched
    intercept[Exception] {
      sql("ALTER TABLE lake.dim SET TBLPROPERTIES (owner = etl)")
    }
    assert(!props().contains("owner"))
    // EXPLAIN never executes: an EXPLAIN of a DML-looking SELECT plans
    // fine, and EXPLAIN of garbage fails loudly instead of returning
    assert(sql("EXPLAIN SELECT COUNT(*) AS n FROM lake.dim").count() > 1L)
    intercept[Exception] { sql("EXPLAIN SELECT nope FROM no_such_table") }
    // TRUNCATE of an unknown table refuses loudly
    intercept[Exception] { sql("TRUNCATE TABLE lake.nope") }
  }

  test("WRITE ORDERED/ZORDERED/UNORDERED: adversarial spellings parse whole or refuse loudly") {
    val wh = freshWh()
    def sql(q: String) = Engine.sqlWarehouse(spark, wh, q)
    // happy paths, odd whitespace/case
    sql("alter table raw.t write ordered by ( k )")
    assert(sql("SHOW TBLPROPERTIES raw.t").collect()
      .exists(r => r.getString(0) == "write.sort-order" && r.getString(1) == "k"))
    sql("ALTER TABLE raw.t WRITE UNORDERED")
    assert(!sql("SHOW TBLPROPERTIES raw.t").collect()
      .exists(_.getString(0) == "write.sort-order"))
    // UNORDERED with nothing set: the UNSET path is loud (no silent no-op)
    intercept[IllegalArgumentException] { sql("ALTER TABLE raw.t WRITE UNORDERED") }
    // unknown table / unknown column / empty column list: loud
    intercept[Exception] { sql("ALTER TABLE raw.nope WRITE ORDERED BY (k)") }
    intercept[IllegalArgumentException] {
      sql("ALTER TABLE raw.t WRITE ORDERED BY (ghost)") }
    intercept[Exception] { sql("ALTER TABLE raw.t WRITE ORDERED BY ()") }
    // ZORDERED arity: one or three columns must not half-parse
    intercept[Exception] { sql("ALTER TABLE raw.t WRITE ZORDERED BY (k)") }
    intercept[Exception] { sql("ALTER TABLE raw.t WRITE ZORDERED BY (k, k, k)") }
    // ZORDERED on a non-BIGINT column: loud with the type in the message
    val e = intercept[IllegalArgumentException] {
      sql("ALTER TABLE raw.t WRITE ZORDERED BY (k, s)") }
    assert(e.getMessage.contains("BIGINT"))
    // the keyword inside a string literal is DATA, not DDL
    assert(sql("SELECT 'ALTER TABLE raw.t WRITE ORDERED BY (k)' AS x " +
      "FROM raw.t").count() == 5L)
    assert(!sql("SHOW TBLPROPERTIES raw.t").collect()
      .exists(_.getString(0) == "write.sort-order"))
    // direct property write round-trips through SHOW CREATE as DDL
    sql("ALTER TABLE raw.t SET TBLPROPERTIES ('write.sort-order' = 'k')")
    assert(sql("SHOW CREATE TABLE raw.t").collect()
      .exists(_.getString(1).trim == "WRITE ORDERED BY (k)"))
  }

  test("metadata-table + travel combinations: supported forms answer, others fail loudly") {
    val wh = freshWh()
    import spark.implicits._
    Snapshots.commit(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s"),
      Engine.tableDir(wh, "lake.dim"))
    def sql(q: String) = Engine.sqlWarehouse(spark, wh, q)
    assert(sql("SELECT COUNT(*) AS n FROM lake.dim$history").head().getLong(0) == 2L)
    assert(sql("SELECT COUNT(*) AS n FROM lake.dim VERSION AS OF 1")
      .head().getLong(0) == 2L)
    // $meta of a TRAVELLED table is out of the surface: must be a
    // parse-time failure, not a silently current-version answer
    intercept[Exception] {
      sql("SELECT * FROM lake.dim$files VERSION AS OF 1").collect() }
    // unknown metadata suffix passes through to Spark's parser: loud
    intercept[Exception] {
      sql("SELECT * FROM lake.dim$nope").collect() }
  }
}
