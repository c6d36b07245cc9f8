package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Mor, Snapshots}

/** Two concurrent SESSIONS on one warehouse — the Kyuubi share model
  * the reference deploys (docs/components/kyuubi.md: one Spark
  * application, USER/SERVER share levels, many isolated sessions):
  * interleaved DDL + DML from two `Engine.connect` sessions must
  * serialize through the ledger locks — no lost view, no lost
  * commit, no torn posdelete+data pair, and same-JVM contention must
  * WAIT (monitor), never throw OverlappingFileLockException.
  */
class ConcurrencySpec extends AnyFunSuite {
  import TestSession._

  /** Run `a` and `b` truly concurrently (latch-started), propagate
    * the first failure.
    */
  private def concurrently(a: => Unit, b: => Unit): Unit = {
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    def task(body: => Unit) = pool.submit(new java.util.concurrent.Callable[Unit] {
      def call(): Unit = { start.await(); body }
    })
    val (fa, fb) = (task(a), task(b))
    start.countDown()
    try { fa.get(300, TimeUnit.SECONDS); fb.get(300, TimeUnit.SECONDS) }
    finally { pool.shutdownNow(); () }
  }

  test("two sessions: interleaved CREATE/DROP VIEW never lose a ledger write") {
    import spark.implicits._
    val wh = TempDirs.scratch("graft-conc-views")
    Snapshots.commit(Seq((1L, 1.0), (2L, 2.0)).toDF("k", "x"), s"$wh/base")
    val s1 = Engine.connect(spark)
    val s2 = Engine.connect(spark)
    val n = 8
    def mkViews(s: SparkSession, who: String): Unit = (1 to n).foreach { i =>
      Engine.sqlWarehouse(s, wh,
        s"CREATE VIEW v_${who}_$i AS SELECT k, x * $i AS xx FROM base")
      if (i % 3 == 0) {
        Engine.sqlWarehouse(s, wh, s"DROP VIEW v_${who}_$i")
        Engine.sqlWarehouse(s, wh,
          s"CREATE VIEW v_${who}_$i AS SELECT k FROM base")
      }
    }
    concurrently(mkViews(s1, "a"), mkViews(s2, "b"))
    val listed = Engine.sqlWarehouse(spark, wh, "SHOW VIEWS").collect()
      .map(_.getString(1)).toSet
    val expect = (1 to n).flatMap(i => Seq(s"v_a_$i", s"v_b_$i")).toSet
    assert(listed == expect,
      s"lost views: ${(expect -- listed).toSeq.sorted.mkString(",")}")
    // every surviving definition still resolves (ledger not torn)
    assert(Engine.sqlWarehouse(spark, wh,
      s"SELECT COUNT(*) AS n FROM v_a_$n").head().getLong(0) == 2L)
  }

  test("two sessions: interleaved MoR INSERT/UPDATE serialize; no lost commit, no torn pair") {
    val wh = TempDirs.scratch("graft-conc-mor")
    val s0 = Engine.connect(spark)
    Engine.sqlWarehouse(s0, wh,
      "CREATE TABLE raw.t AS SELECT id AS k, CAST(0 AS DOUBLE) AS v " +
        "FROM range(100)")
    val rounds = 5
    def work(who: Int): Unit = {
      val s = Engine.connect(spark)
      (1 to rounds).foreach { i =>
        // disjoint key halves: serializable outcomes are exactly
        // the per-key last-writes
        val lo = who * 50
        Engine.sqlWarehouse(s, wh,
          s"INSERT INTO raw.t SELECT id + 10000 * ($who + 1) + 100 * $i AS k, " +
            s"CAST($i AS DOUBLE) AS v FROM range(10)")
        Engine.sqlWarehouse(s, wh,
          s"UPDATE raw.t SET v = $i WHERE k >= $lo AND k < ${lo + 50}")
      }
    }
    concurrently(work(0), work(1))
    val t = Engine.tableDir(wh, "raw.t")
    // no lost INSERT: 100 base + 2 writers x rounds x 10
    assert(Mor.read(spark, t).count() == 100L + 2L * rounds * 10L)
    // both halves saw their LAST update (serializable per-key outcome)
    val finals = Mor.read(spark, t)
      .filter(org.apache.spark.sql.functions.col("k") < 100)
      .groupBy("v").count().collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(finals == Map(rounds.toDouble -> 100L),
      s"halves lost an update: $finals")
    // ledger integrity: ids strictly increasing and unique, and every
    // posdelete is immediately followed by its data commit (the
    // atomic pair contract — a torn pair would double-count or lose)
    val ledger = Mor.commits(t)
    assert(ledger.map(_.id) == ledger.map(_.id).sorted &&
      ledger.map(_.id).distinct.size == ledger.size)
    ledger.zipWithIndex.foreach { case (c, i) =>
      if (c.kind == "posdelete") {
        assert(i + 1 < ledger.size && ledger(i + 1).kind == "data" &&
          ledger(i + 1).id == c.id + 1,
          s"torn posdelete+data pair at ledger index $i (id ${c.id})")
      }
    }
  }

  test("USER share level: one engine per user, per-user masks bind at creation, commits still linearize") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val wh = TempDirs.scratch("graft-conc-user")
    // per-user governance defaults BEFORE any engine exists
    Engine.setUserPolicies("conc_analyst", sf, Seq(
      Engine.Policy("customer",
        rowFilter = Some("c_mktsegment = 'BUILDING'"),
        masks = Map("c_name" -> Engine.MaskShowLast4))))
    Engine.setUserPolicies("conc_admin", sf, Seq(Engine.Policy("customer")))
    val a1 = Engine.connectUser(spark, "conc_analyst")
    val a2 = Engine.connectUser(spark, "conc_analyst")
    val adm = Engine.connectUser(spark, "conc_admin")
    // USER level: same user's connections share ONE engine; another
    // user's engine is a different session object
    assert(a1 eq a2)
    assert(!(a1 eq adm))
    // state sharing within a user, invisibility across users
    a1.sql("SELECT 42 AS x").createOrReplaceTempView("conc_scratch")
    assert(a2.catalog.tableExists("conc_scratch"))
    assert(!adm.catalog.tableExists("conc_scratch"))
    a1.conf.set("graft.test.knob", "on")
    assert(a2.conf.get("graft.test.knob") == "on")
    assert(adm.conf.getOption("graft.test.knob").isEmpty)
    // governance bound to the user: analyst rows filtered + masked,
    // admin unmasked — over the SAME warehouse
    val aRows = a1.sql("SELECT c_mktsegment, c_name FROM customer").collect()
    assert(aRows.nonEmpty && aRows.forall(_.getString(0) == "BUILDING"))
    assert(aRows.forall(_.getString(1).startsWith("XXX")))
    val admName = adm.sql("SELECT MIN(c_name) AS n FROM customer").head.getString(0)
    assert(admName.startsWith("Customer#"))
    // reconnect after engine teardown: scratch state is gone but the
    // user's masks re-bind — a reconnect cannot shed governance
    Engine.disconnectUser(spark, "conc_analyst")
    val a3 = Engine.connectUser(spark, "conc_analyst")
    assert(!(a3 eq a1))
    assert(!a3.catalog.tableExists("conc_scratch"))
    assert(a3.sql("SELECT MIN(c_name) AS n FROM customer")
      .head.getString(0).startsWith("XXX"))
    // same-table commits from the two users' engines still serialize
    val t = s"$wh/shared_log"
    def work(s: SparkSession, who: String): Unit = (1 to 3).foreach { i =>
      Snapshots.commit(Seq((who, i.toLong)).toDF("who", "batch"), t)
    }
    concurrently(work(a3, "analyst"), work(adm, "admin"))
    // linear history: 6 versions, no lost commit — every (who, batch)
    // pair landed as exactly one snapshot version
    assert(Snapshots.versions(t) == (1L to 6L))
    val landed = Snapshots.versions(t).map { v =>
      val r = Snapshots.read(spark, t, v).collect()
      assert(r.length == 1, s"version $v holds ${r.length} rows")
      (r.head.getString(0), r.head.getLong(1))
    }
    assert(landed.toSet ==
      Set("analyst", "admin").flatMap(w => (1L to 3L).map(w -> _)))
    Engine.disconnectUser(spark, "conc_analyst")
    Engine.disconnectUser(spark, "conc_admin")
  }

  test("two sessions: optimistic snapshot MERGE retries; both writers' rows land") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val wh = TempDirs.scratch("graft-conc-merge")
    val t = s"$wh/dim"
    Snapshots.commit((0L until 20L).map(k => (k, 0L)).toDF("k", "gen"), t)
    def work(who: Int): Unit = (1 to 4).foreach { i =>
      val batch = (0L until 10L)
        .map(j => (who * 100L + i * 10L + j, i.toLong)).toDF("k", "gen")
      Snapshots.mergeWith(spark, t, batch)((base, src) =>
        graft.operators.Merge.upsert(base, src, Seq("k")))
    }
    concurrently(work(1), work(2))
    val rows = Snapshots.read(spark, t)
    // base 20 + 2 writers x 4 batches x 10 distinct keys
    assert(rows.count() == 20L + 80L)
    assert(rows.filter(col("k") >= 100L && col("k") < 200L).count() == 40L)
    assert(rows.filter(col("k") >= 200L).count() == 40L)
    // linear history: every version readable, row count monotone
    val counts = Snapshots.versions(t)
      .map(v => Snapshots.read(spark, t, v).count())
    assert(counts == counts.sorted, s"non-monotone history: $counts")
  }
}
