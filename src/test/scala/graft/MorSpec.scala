package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Mor

/** Merge-on-read invariants q79's oracle can't see: delete commits
  * cost ∝ deleted keys (not table size), base files stay untouched,
  * and the read-side merge is broadcast anti-joins.
  */
class MorSpec extends AnyFunSuite {
  import TestSession._

  private val rowKey =
    Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")

  private def parquetFiles(dir: String) =
    Files.walk(Paths.get(dir)).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .map(p => (p.toString, Files.size(p), Files.getLastModifiedTime(p)))
      .toSeq.sortBy(_._1)

  test("equality delete writes only keys and never touches base data files") {
    val t = TempDirs.scratch("graft-mor-spec")
    val li = Tables(spark, sf, "lineitem")
    Mor.land(li, t)
    val baseBefore = parquetFiles(s"$t/c=1")

    val cond = to_date(col("l_shipdate")) < lit("1996-01-01")
    val matched = li.filter(cond).count()
    assert(matched > 0, "delete predicate matched nothing — dead test")
    Mor.deleteWhere(spark, t, cond, rowKey)

    // base directory is byte-identical after the delete commit
    assert(parquetFiles(s"$t/c=1") == baseBefore,
      "delete rewrote or touched base data files")
    // the delete file holds exactly the matched keys, and costs a
    // fraction of the base even at this tiny sf
    assert(spark.read.parquet(s"$t/c=2").count() == matched)
    assert(Mor.commitBytes(t, 2L) < Mor.commitBytes(t, 1L) / 2,
      s"delete commit not small: ${Mor.commitBytes(t, 2L)} vs base ${Mor.commitBytes(t, 1L)}")

    val total = li.count()
    assert(Mor.read(spark, t).count() == total - matched)
    // time travel: version 1 still sees the deleted rows
    assert(Mor.read(spark, t, 1L).count() == total)
  }

  test("deletes stack, re-deleting is a no-op, compaction is lossless") {
    val t = TempDirs.scratch("graft-mor-spec")
    val li = Tables(spark, sf, "lineitem")
    Mor.land(li, t)
    val c1 = to_date(col("l_shipdate")) < lit("1996-01-01")
    val c2 = col("l_returnflag") === "R" &&
      to_date(col("l_shipdate")) < lit("1999-01-01")
    Mor.deleteWhere(spark, t, c1, rowKey)
    Mor.deleteWhere(spark, t, c2, rowKey)
    val expect = li.filter(!c1 && !c2).count()
    assert(Mor.read(spark, t).count() == expect)

    // rows matching c1 are gone from the merged view, so a replayed
    // delete keys NOTHING — idempotent by construction
    Mor.deleteWhere(spark, t, c1, rowKey)
    assert(spark.read.parquet(s"$t/c=4").count() == 0)
    assert(Mor.read(spark, t).count() == expect)

    val before = Mor.read(spark, t).orderBy(rowKey.map(col): _*).collect()
    val cv = Mor.compact(spark, t)
    val after = Mor.read(spark, t).orderBy(rowKey.map(col): _*).collect()
    assert(after.sameElements(before), "compaction changed the merged view")
    // post-compact reads replay zero deletes: the base IS the view
    assert(spark.read.parquet(s"$t/c=$cv").count() == expect)
  }

  test("upsert: sequence rule scopes the delete, replayed tag is a no-op") {
    import spark.implicits._
    val t = TempDirs.scratch("graft-mor-spec")
    Mor.land(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), t)
    // update id=2, tombstone id=3, insert id=4 — one CDC batch
    val batch = Seq((2L, "B", false), (3L, "c", true), (4L, "d", false))
      .toDF("id", "v", "dead")
    Mor.upsert(t, batch, Seq("id"), "dead", tag = Some("b=1"))

    // merged view: update applied, tombstone gone, insert present —
    // and the paired delete (whose file contains key 2) did NOT kill
    // the NEW row version committed after it (Iceberg's sequence rule)
    assert(Mor.read(spark, t).select("id", "v").as[(Long, String)]
      .collect().toSet == Set((1L, "a"), (2L, "B"), (4L, "d")))
    // time travel to the base still sees the pre-upsert rows
    assert(Mor.read(spark, t, 1L).count() == 3)

    // a zombie writer replaying the batch commits NOTHING new
    val before = Mor.commits(t).map(_.id)
    Mor.upsert(t, batch, Seq("id"), "dead", tag = Some("b=1"))
    assert(Mor.commits(t).map(_.id) == before, "replayed tag double-committed")
  }

  test("upsert is atomic: both ledger lines land in one append; crashed-writer dirs are invisible") {
    import spark.implicits._
    val t = TempDirs.scratch("graft-mor-atomic")
    Mor.land(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t)
    Mor.upsert(t, Seq((2L, "B", false), (3L, "c", false)).toDF("id", "v", "dead"),
      Seq("id"), "dead", tag = Some("b=9"))
    // ledger invariant: the upsert's equality-delete line is
    // IMMEDIATELY followed by its paired data line — both written in
    // ONE locked append, so no crash between commits can leave the
    // delete applied with no data commit (the r7 durability window)
    val lines = Files.readAllLines(Paths.get(t, "_commits")).asScala
      .filter(_.nonEmpty).toSeq
    val delIdx = lines.indexWhere(_.endsWith("b=9:up"))
    assert(delIdx >= 0, s"tagged delete line missing: $lines")
    assert(lines(delIdx).split('\t')(1) == "delete")
    assert(lines(delIdx).split('\t')(2) == "id", "keyCols must ride the pair line")
    assert(lines(delIdx + 1).split('\t')(1) == "data")
    assert(lines(delIdx + 1).split('\t')(3) == "b=9:up#add",
      "data half not adjacent to its delete half")
    // a writer that crashed after writing directories but before the
    // ledger append leaves only an invisible orphan — readers see
    // either the whole pair or nothing
    Seq((9L, "z")).toDF("id", "v").write.parquet(s"$t/c=99")
    assert(Mor.read(spark, t).select("id").as[Long].collect().toSet
      == Set(1L, 2L, 3L))
  }

  test("read-side merge is broadcast anti-joins (no shuffle on the base)") {
    val t = TempDirs.scratch("graft-mor-spec")
    Mor.land(Tables(spark, sf, "lineitem"), t)
    Mor.deleteWhere(spark, t,
      to_date(col("l_shipdate")) < lit("1996-01-01"), rowKey)
    val df = Mor.read(spark, t)
    df.collect()
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case other => other +: other.children.flatMap(walk)
    }
    val plan = walk(df.queryExecution.executedPlan)
    assert(plan.exists {
      case b: BroadcastHashJoinExec => b.joinType.sql == "LEFT ANTI"
      case _ => false
    }, s"anti-join not broadcast:\n${df.queryExecution.executedPlan}")
    assert(!plan.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]),
      "MoR read shuffled the base side")
  }

  test("position delete of ONE known row writes O(1) delete data and leaves the base untouched") {
    val t = TempDirs.scratch("graft-mor-pos")
    val li = Tables(spark, sf, "lineitem")
    Mor.land(li, t)
    val baseBefore = parquetFiles(s"$t/c=1")
    val n0 = Mor.read(spark, t).count()
    // delete one specific physical row (no key needed)
    val v = li.select(col("l_orderkey"), col("l_linenumber")).head
    val isVictim =
      col("l_orderkey") === v.getLong(0) && col("l_linenumber") === v.getInt(1)
    val nVictims = li.filter(isVictim).count() // tiny; not nec. 1 in testdata
    assert(nVictims >= 1L && nVictims <= 4L)
    Mor.deleteAt(spark, t, isVictim)
    assert(Mor.read(spark, t).count() == n0 - nVictims)
    assert(Mor.read(spark, t).filter(isVictim).count() == 0)
    // base files byte-identical; the delete commit is tiny
    assert(parquetFiles(s"$t/c=1") == baseBefore,
      "position delete must not touch base data files")
    // a 1-row delete costs parquet's per-file floor (~1 KB footer),
    // constant — never ∝ the base
    assert(Mor.commitBytes(t, 2L) * 10 < Mor.commitBytes(t, 1L),
      s"pos-delete bytes not O(deleted): ${Mor.commitBytes(t, 2L)}")
    // time travel still sees the deleted row(s)
    assert(Mor.read(spark, t, 1L).filter(isVictim).count() == nVictims)
  }

  test("position + equality deletes stack; compaction bakes them in; posdelete after compact works") {
    val t = TempDirs.scratch("graft-mor-pos2")
    val li = Tables(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_linenumber"), col("l_returnflag"), col("l_extendedprice"))
    Mor.land(li, t)
    Mor.deleteWhere(spark, t, col("l_returnflag") === "R", rowKey) // equality
    Mor.deleteAt(spark, t, col("l_extendedprice") > 50000.0)       // position
    val expect = li.filter(col("l_returnflag") =!= "R" &&
      col("l_extendedprice") <= 50000.0).count()
    assert(Mor.read(spark, t).count() == expect, "stacked delete kinds diverge")
    val c = Mor.compact(spark, t)
    assert(Mor.read(spark, t, c).count() == expect, "compaction changed the view")
    // a position delete AFTER compaction binds to the compacted files
    Mor.deleteAt(spark, t, col("l_orderkey") % 7 === 0)
    val expect2 = li.filter(col("l_returnflag") =!= "R" &&
      col("l_extendedprice") <= 50000.0 && col("l_orderkey") % 7 =!= 0).count()
    assert(Mor.read(spark, t).count() == expect2)
  }

  test("updateWhere: compaction-free row update — delete+append pair, base untouched, history intact") {
    val t = TempDirs.scratch("graft-mor-upd")
    val li = Tables(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_extendedprice"))
    Mor.land(li, t)
    val baseBefore = parquetFiles(s"$t/c=1")
    val n0 = Mor.read(spark, t).count()
    val nMatched = li.filter(col("l_returnflag") === "A").count()
    // reprice every 'A' row by +10%
    val (del, add) = Mor.updateWhere(spark, t,
      col("l_returnflag") === "A",
      Map("l_extendedprice" -> (col("l_extendedprice") * 1.1)))
    assert(del == 2L && add == 3L)
    val now = Mor.read(spark, t)
    assert(now.count() == n0, "update must not change row count")
    // every A row repriced: exact double compare (x*1.1 both sides)
    val expectSum = li.filter(col("l_returnflag") === "A")
      .select(sum(col("l_extendedprice") * 1.1)).head.getDouble(0)
    val gotSum = now.filter(col("l_returnflag") === "A")
      .select(sum(col("l_extendedprice"))).head.getDouble(0)
    assert(math.abs(expectSum - gotSum) < 1e-6 * math.abs(expectSum))
    // base untouched; both commits cost ∝ matched rows, not the table
    assert(parquetFiles(s"$t/c=1") == baseBefore)
    assert(nMatched < n0, "test needs a proper subset")
    // v1 still reads the original prices
    val oldSum = Mor.read(spark, t, 1L).filter(col("l_returnflag") === "A")
      .select(sum(col("l_extendedprice"))).head.getDouble(0)
    val rawSum = li.filter(col("l_returnflag") === "A")
      .select(sum(col("l_extendedprice"))).head.getDouble(0)
    assert(oldSum == rawSum, "time travel must see pre-update values")
  }

  test("tagged updateWhere is replay-safe: a second application is a no-op pair, values applied once") {
    val t = TempDirs.scratch("graft-mor-upd2")
    val li = Tables(spark, sf, "nation")
      .select(col("n_nationkey"), col("n_regionkey"))
    Mor.land(li, t)
    // cond on the KEY, transform on another column: the condition
    // still matches after the update, so an unguarded replay WOULD
    // transform the rows a second time
    val cond = col("n_nationkey") < 5
    val nCond = li.filter(cond).count()
    val before = Mor.read(spark, t).filter(cond)
      .agg(sum(col("n_regionkey"))).head.getLong(0)
    val pair1 = Mor.updateWhere(spark, t, cond,
      Map("n_regionkey" -> (col("n_regionkey") + 100)), tag = Some("batch-7"))
    val after1 = Mor.read(spark, t).filter(cond)
      .agg(sum(col("n_regionkey"))).head.getLong(0)
    assert(after1 == before + 100 * nCond)
    // replay with the same tag: same commit pair back, NO value change
    val pair2 = Mor.updateWhere(spark, t, cond,
      Map("n_regionkey" -> (col("n_regionkey") + 100)), tag = Some("batch-7"))
    assert(pair2 == pair1, s"replay forked: $pair1 vs $pair2")
    assert(Mor.read(spark, t).filter(cond)
      .agg(sum(col("n_regionkey"))).head.getLong(0) == after1,
      "replayed update transformed rows twice")
    assert(Mor.commits(t).size == 3, "replay must not append ledger lines")
  }
}
