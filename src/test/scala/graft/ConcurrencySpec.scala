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
