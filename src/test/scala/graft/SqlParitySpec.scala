package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The Kyuubi-equivalent surface check: the SAME SQL TEXT the DuckDB
  * oracle runs goes through `Engine.open` + `spark.sql` and must
  * produce exactly the DataFrame API result — one engine, three access
  * paths (DataFrame, Spark SQL, DuckDB), all agreeing on values.
  * Missing-function spellings are bridged by the native
  * [[graft.functions.SqlDialect]] aliases; only genuinely divergent
  * SEMANTICS (0- vs 1-based dayofweek / array subscripts, IGNORE NULLS
  * placement) get engine-specific text, exactly as they would between
  * any two real engines.
  */
class SqlParitySpec extends AnyFunSuite {
  import TestSession._

  /** Minimal engine-specific rewrites for dialect-semantic divergence. */
  private val variants: Map[String, String => String] = Map(
    // Spark's parser needs a length on VARCHAR; STRING is the alias
    "q108_analyze_stats" -> (_.replace("AS VARCHAR)", "AS STRING)")),
    // DuckDB dayofweek is 0-based (oracle adds 1); Spark's is 1-based
    "q02_stg_orders" -> (_.replace(
      "CAST(dayofweek(o_orderdate) + 1 AS BIGINT)",
      "CAST(dayofweek(o_orderdate) AS BIGINT)")),
    // DuckDB array subscripts are 1-based; Spark's 0-based
    "q15_cte_pipeline" -> (sql => sql
      .replace("string_split(c_name, '#')[1]", "split(c_name, '#')[0]")
      .replace("string_split(c_name, '#')[2]", "split(c_name, '#')[1]")),
    "q48_stg_users_cleanse" -> (sql => sql
      .replace("string_split(trim(c_name), '#')[1]", "split(trim(c_name), '#')[0]")
      .replace("string_split(trim(c_name), '#')[2]", "split(trim(c_name), '#')[1]")),
    // IGNORE NULLS goes inside the call in DuckDB, after it in Spark
    "q20_asof_view_purchase" -> (_.replace(
      "END IGNORE NULLS) OVER w", "END) IGNORE NULLS OVER w")),
    // Spark's parser rejects DuckDB's quoted date_diff unit pre-resolution
    "q31_ship_delay" -> (_.replace(
      "date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))",
      "datediff(CAST(l_shipdate AS DATE), CAST(o_orderdate AS DATE))")),
    "q42_date_suite" -> (_.replace(
      "date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))",
      "datediff(CAST(o_orderdate AS DATE), DATE '1995-01-01')")),
    "q57_cohort_retention" -> (_.replace(
      "date_diff('day', DATE '1970-01-01',\n      CAST(ts AS DATE))",
      "datediff(CAST(ts AS DATE), DATE '1970-01-01')")),
    // DISTINCT inside an aliased aggregate can't ride a temp-function
    // shim; spell the Spark aggregates directly
    "q40_array_agg" -> (sql => sql
      .replace(
        "array_to_string(list_sort(list(DISTINCT CAST(year(o_orderdate) AS BIGINT))), ',')",
        "array_join(array_sort(collect_set(CAST(year(o_orderdate) AS BIGINT))), ',')")
      .replace(
        "array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',')",
        "array_join(array_sort(collect_set(o_orderstatus)), ',')")),
    // DuckDB's series generator + in-call IGNORE NULLS → Spark's
    // sequence/explode + postfix IGNORE NULLS
    "q74_gap_fill" -> (sql => sql
      .replace(
        "unnest(generate_series(DATE '1995-03-01',\n      DATE '1995-03-31', INTERVAL 1 DAY))::DATE AS order_date",
        "explode(sequence(DATE '1995-03-01', DATE '1995-03-31', INTERVAL 1 DAY)) AS order_date")
      .replace(
        "last_value(dl.rev IGNORE NULLS) OVER (",
        "last_value(dl.rev) IGNORE NULLS OVER (")),
    // DuckDB's `//` integer division → Spark's `div`
    "q88_graph_rank" -> (sql => sql
      .replace("CAST(node // 2 AS BIGINT)", "CAST(node div 2 AS BIGINT)")
      .replace("CAST((node - 1) // 2 AS BIGINT)",
        "CAST((node - 1) div 2 AS BIGINT)")),
    // Spark's VARCHAR needs a length; NULL column typed as STRING
    "q85_snapshot_history" -> (_.replace(
      "CAST(NULL AS VARCHAR)", "CAST(NULL AS STRING)")),
    "q89_metadata_tables" -> (_.replace(
      "CAST(NULL AS VARCHAR)", "CAST(NULL AS STRING)")),
    // DuckDB's `//` integer division → Spark's `div`
    "q92_manifest_pruning" -> (_.replace(" // ", " div ")),
    // DuckDB's expression INTERVAL → Spark's add_months; the facade
    // reads parquet timestamps as NTZ, which unix_millis rejects
    "q86_temporal_join" -> (sql => sql
      .replace(
        "epoch_ms(TIMESTAMP '1995-01-01'\n      + INTERVAL ((c_custkey % 48)::INT) MONTH) AS change_ms",
        "epoch_ms(CAST(add_months(DATE '1995-01-01', " +
          "CAST(c_custkey % 48 AS INT)) AS TIMESTAMP)) AS change_ms")
      .replace("epoch_ms(o_orderdate)",
        "epoch_ms(CAST(o_orderdate AS TIMESTAMP))")),
    // DuckDB's ASOF LEFT JOIN syntax, rewritten as the equivalent
    // ranked left join (greatest v_ts <= ts, tie-broken by v_event_id)
    "q23_asof_exec" -> (_ =>
      """WITH p AS (
        |  SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'purchase'),
        |v AS (
        |  SELECT user_id AS v_user_id, event_id AS v_event_id, ts AS v_ts, value AS v_value
        |  FROM events WHERE event_type = 'view'),
        |pairs AS (
        |  SELECT p.user_id, p.event_id, p.ts, p.value,
        |    v.v_event_id, v.v_ts, v.v_value,
        |    ROW_NUMBER() OVER (PARTITION BY p.user_id, p.event_id
        |      ORDER BY v.v_ts DESC, v.v_event_id DESC) AS rn
        |  FROM p LEFT JOIN v ON p.user_id = v.v_user_id AND v.v_ts <= p.ts)
        |SELECT user_id,
        |  event_id AS purchase_id,
        |  epoch_ms(ts) AS purchase_ts_ms,
        |  value AS purchase_value,
        |  v_event_id AS view_id,
        |  epoch_ms(v_ts) AS view_ts_ms,
        |  v_value AS view_value
        |FROM pairs WHERE rn = 1
        |ORDER BY user_id, purchase_id""".stripMargin))

  test("the full relational pack runs through the SQL facade and matches the DataFrame API") {
    Engine.open(spark, sf)
    val rel = SparkEntry.oracleSql.keys.filter(_.startsWith("q")).toSeq.sorted
    assert(rel.size >= 40, s"expected the full relational pack, got ${rel.size}")
    // driver-gate comparison rule: columns sorted by name, rows sorted
    def rows(df: DataFrame): Seq[String] = {
      val cols = df.columns.sorted.map(col)
      df.select(cols.toIndexedSeq: _*).collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted
    }
    val failures = rel.flatMap { name =>
      val text = variants.get(name)
        .fold(SparkEntry.oracleSql(name))(f => f(SparkEntry.oracleSql(name)))
      try {
        val a = rows(spark.sql(text))
        val b = rows(SparkEntry.queries(name)(spark, sf))
        if (a == b) None
        else Some(s"$name: ${a.length} vs ${b.length} rows; first diff: " +
          a.zip(b).collectFirst { case (x, y) if x != y => s"sql=$x df=$y" }
            .getOrElse("row sets differ"))
      } catch {
        case e: Throwable => Some(s"$name: ${e.getMessage.linesIterator.next()}")
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} facade mismatches:\n  ${failures.mkString("\n  ")}")
    info(s"${rel.size} queries verified facade == DataFrame")
  }

  test("facade CALL procedures: metrics shape, compaction floor no-op, loud failures") {
    import graft.sources.Snapshots
    val wh = java.nio.file.Files.createTempDirectory("graft-call-wh").toString
    val t = s"$wh/orders_call"
    val stg = Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    Snapshots.commit(stg.repartition(3), t)
    // below the input-file floor: the scheduled-compaction contract
    // is a no-op, not a rewrite
    val noop = Engine.sqlWarehouse(spark, wh,
      "CALL system.rewrite_data_files('orders_call', min_input_files => 10)")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(noop("rewritten_data_files_count") == 0L)
    assert(Snapshots.versions(t).size == 1, "a no-op must not commit")
    // above the floor: rewrites 3 -> 1 and commits one version
    val done = Engine.sqlWarehouse(spark, wh,
      "CALL iceberg.system.rewrite_data_files('orders_call', min_input_files => 2)")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(done("rewritten_data_files_count") == 3L)
    assert(done("added_data_files_count") == 1L)
    assert(Snapshots.versions(t).size == 2)
    assert(Snapshots.read(spark, t).count() == stg.count(),
      "compaction must preserve the data")
    // unknown procedure / unknown table fail loudly
    intercept[IllegalArgumentException] {
      Engine.sqlWarehouse(spark, wh, "CALL system.no_such_proc('orders_call')")
    }
    intercept[IllegalArgumentException] {
      Engine.sqlWarehouse(spark, wh, "CALL system.rewrite_manifests('nosuch')")
    }
  }

  test("facade time travel: VERSION AS OF / TIMESTAMP AS OF reach snapshot history") {
    import graft.sources.Snapshots
    val wh = java.nio.file.Files.createTempDirectory("graft-tt-wh").toString
    val t = s"$wh/orders_tt"
    val stg = Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    val v1 = Snapshots.commit(stg.filter(col("o_orderkey") % 2 === 0), t)
    val between = System.currentTimeMillis()
    Thread.sleep(5)
    val v2 = Snapshots.commit(stg, t)

    def n(df: DataFrame): Long = df.count()
    // latest view == v2
    Engine.openWarehouse(spark, wh)
    assert(n(spark.table("orders_tt")) == n(Snapshots.read(spark, t, v2)))
    // VERSION AS OF == Snapshots.read(version)
    val viaSql = Engine.sqlWarehouse(spark, wh,
      s"SELECT COUNT(*) AS n FROM orders_tt VERSION AS OF $v1")
      .head.getLong(0)
    assert(viaSql == n(Snapshots.read(spark, t, v1)),
      "facade VERSION AS OF diverges from Snapshots.read")
    assert(viaSql != n(Snapshots.read(spark, t, v2))) // history, not latest
    // TIMESTAMP AS OF (epoch-millis form) between the commits == v1
    val viaTs = Engine.sqlWarehouse(spark, wh,
      s"SELECT COUNT(*) AS n FROM orders_tt TIMESTAMP AS OF $between")
      .head.getLong(0)
    assert(viaTs == n(Snapshots.read(spark, t, v1)),
      "facade TIMESTAMP AS OF diverges from Snapshots.readAsOf")
    // quoted timestamp form parses as UTC (the session convention)
    val utc = java.time.Instant.ofEpochMilli(between)
      .atOffset(java.time.ZoneOffset.UTC).toLocalDateTime
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    val viaTsQuoted = Engine.sqlWarehouse(spark, wh,
      s"SELECT COUNT(*) AS n FROM orders_tt TIMESTAMP AS OF '$utc'")
      .head.getLong(0)
    assert(viaTsQuoted == viaTs, "quoted TIMESTAMP AS OF diverges from epoch form")
    // REF-NAME travel: a tag reads its pinned snapshot, a live branch
    // its unpublished head; unknown refs fail loudly
    Snapshots.tagVersion(t, v1, "rel-a")
    Snapshots.commitToBranch(stg.unionAll(stg), t, "devx")
    val viaTag = Engine.sqlWarehouse(spark, wh,
      "SELECT COUNT(*) AS n FROM orders_tt VERSION AS OF 'rel-a'")
      .head.getLong(0)
    assert(viaTag == n(Snapshots.read(spark, t, v1)),
      "tag-name travel diverges from the pinned snapshot")
    val viaBranch = Engine.sqlWarehouse(spark, wh,
      "SELECT COUNT(*) AS n FROM orders_tt VERSION AS OF 'devx'")
      .head.getLong(0)
    assert(viaBranch == 2 * n(stg), "branch-name travel must read the branch head")
    intercept[IllegalArgumentException] {
      Engine.sqlWarehouse(spark, wh,
        "SELECT COUNT(*) FROM orders_tt VERSION AS OF 'nosuchref'")
    }
    Snapshots.dropBranch(t, "devx")
    // a travel clause on a NON-warehouse name is left for the parser
    intercept[Exception] {
      Engine.sqlWarehouse(spark, wh, "SELECT * FROM nosuch VERSION AS OF 1")
    }
    // travel-looking text inside a string LITERAL is never rewritten
    val lit = Engine.sqlWarehouse(spark, wh,
      s"SELECT 'orders_tt VERSION AS OF $v1' AS s").head.getString(0)
    assert(lit == s"orders_tt VERSION AS OF $v1")
    // two CONNECTIONS (Kyuubi sessions) see isolated view namespaces:
    // each opens its own warehouse; neither sees the other's tables
    locally {
      val whB = java.nio.file.Files.createTempDirectory("graft-tt-whB").toString
      Snapshots.commit(stg.limit(10), s"$whB/other_tbl")
      val (c1, c2) = (Engine.connect(spark), Engine.connect(spark))
      Engine.openWarehouse(c1, wh)
      Engine.openWarehouse(c2, whB)
      assert(c1.catalog.tableExists("orders_tt") && !c1.catalog.tableExists("other_tbl"))
      assert(c2.catalog.tableExists("other_tbl") && !c2.catalog.tableExists("orders_tt"))
    }
    // and a join of two versions of the SAME table works in one query
    val drift = Engine.sqlWarehouse(spark, wh,
      s"""SELECT COUNT(*) AS n
         |FROM orders_tt VERSION AS OF $v2 a
         |LEFT ANTI JOIN orders_tt VERSION AS OF $v1 b
         |  ON a.o_orderkey = b.o_orderkey""".stripMargin)
      .head.getLong(0)
    assert(drift == n(Snapshots.read(spark, t, v2)) - n(Snapshots.read(spark, t, v1)))
    // $history metadata table through the facade == Snapshots.history
    val hist = Engine.sqlWarehouse(spark, wh,
      "SELECT version, tag, n_files FROM orders_tt$history ORDER BY version")
      .collect()
    val api = Snapshots.history(spark, t)
      .select(col("version"), col("tag"), col("n_files"))
      .orderBy("version").collect()
    assert(hist.sameElements(api), "facade $history diverges from the API")
    assert(hist.map(_.getLong(0)).toSeq == Seq(v1, v2))
    // $history on a non-warehouse name passes through the rewriter
    // verbatim (quoteReplacement — `$h` must not be read as a group
    // ref) and is rejected by the PARSER, not the rewriter
    val ex = intercept[Exception] {
      Engine.sqlWarehouse(spark, wh, "SELECT * FROM nosuch$history")
    }
    assert(
      ex.isInstanceOf[org.apache.spark.sql.catalyst.parser.ParseException] ||
        ex.isInstanceOf[org.apache.spark.sql.AnalysisException],
      s"expected parser/analyzer rejection, got ${ex.getClass.getName}: ${ex.getMessage}")
    // `$history` inside a string LITERAL of a valid query survives the
    // rewrite untouched (the inStringLiteral guard's exact case)
    val litRow = Engine.sqlWarehouse(spark, wh,
      "SELECT 'orders_tt$history' AS s, COUNT(*) AS n FROM orders_tt")
      .head
    assert(litRow.getString(0) == "orders_tt$history")
  }

  test("namespaced warehouse: db.table resolution, same-name coexistence, qualified travel + metadata") {
    import graft.sources.Snapshots
    val wh = java.nio.file.Files.createTempDirectory("graft-ns-wh").toString
    val stg = Tables(spark, sf, "orders").select(col("o_orderkey"))
    val even = stg.filter(col("o_orderkey") % 2 === 0)
    val third = stg.filter(col("o_orderkey") % 3 === 0)
    val v1 = Snapshots.commit(even.limit(5), Engine.tableDir(wh, "sales.orders"))
    val v2 = Snapshots.commit(even, Engine.tableDir(wh, "sales.orders"))
    Snapshots.commit(third, Engine.tableDir(wh, "ops.orders"))
    Snapshots.commit(stg, s"$wh/orders_flat") // flat legacy coexists
    def one(sql: String): Long =
      Engine.sqlWarehouse(spark, wh, sql).head.getLong(0)
    // same table NAME, two databases, plus a flat table — all resolve
    assert(one("SELECT COUNT(*) AS n FROM sales.orders") == even.count())
    assert(one("SELECT COUNT(*) AS n FROM ops.orders") == third.count())
    assert(one("SELECT COUNT(*) AS n FROM orders_flat") == stg.count())
    // both same-name tables in ONE statement (alias.column references
    // must pass the qualified rewriter untouched)
    assert(one(
      """SELECT COUNT(*) AS n FROM sales.orders s
        |JOIN ops.orders o ON s.o_orderkey = o.o_orderkey""".stripMargin)
      == stg.filter(col("o_orderkey") % 6 === 0).count())
    // time travel and metadata tables compose with qualification
    assert(one(s"SELECT COUNT(*) AS n FROM sales.orders VERSION AS OF $v1") == 5)
    assert(v2 > v1)
    assert(one("SELECT COUNT(*) AS n FROM sales.orders$snapshots") == 2)
    // a dotted name inside a string literal is never rewritten
    assert(Engine.sqlWarehouse(spark, wh, "SELECT 'sales.orders' AS s")
      .head.getString(0) == "sales.orders")
    // openWarehouse registers the mangled view for DataFrame users
    Engine.openWarehouse(spark, wh)
    assert(spark.table("sales__orders").count() == even.count())
  }
}
