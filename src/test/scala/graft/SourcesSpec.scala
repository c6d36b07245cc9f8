package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sources

class SourcesSpec extends AnyFunSuite {
  import TestSession._

  private def tmp(): String =
    Files.createTempDirectory("graft-sources").toString

  test("csv/json/orc round-trips preserve the data") {
    val orig = Tables(spark, sf, "nation")
    val base = tmp()
    Sources.writeCsv(orig, s"$base/csv")
    Sources.writeJson(orig, s"$base/json")
    Sources.writeOrc(orig, s"$base/orc")
    val viaCsv = Sources.readCsv(spark, s"$base/csv")
    val viaJson = Sources.readJson(spark, s"$base/json")
    val viaOrc = Sources.readOrc(spark, s"$base/orc")
    def key(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select("n_nationkey", "n_name", "n_regionkey")
        .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet
    assert(key(viaCsv) == key(orig))
    assert(key(viaJson) == key(orig))
    assert(key(viaOrc) == key(orig))
  }

  test("bucketed tables join without a shuffle exchange") {
    val o = Tables(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    val l = Tables(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    // DROP TABLE alone won't clear an orphaned location left by an
    // aborted run — remove the managed dirs before recreating.
    Seq("orders_b", "lineitem_b").foreach { tbl =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val loc = new java.io.File(s"/tmp/graft-warehouse/$tbl")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(loc)
      }
    }
    Sources.writeBucketed(o, "orders_b", "o_orderkey", 8)
    Sources.writeBucketed(l.withColumnRenamed("l_orderkey", "o_orderkey"),
      "lineitem_b", "o_orderkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("orders_b").join(spark.table("lineitem_b"), "o_orderkey")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n${plan.take(800)}")
      assert(j.count() == l.count()) // every lineitem matches its order
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("compact rewrites a fragmented table into few files, data intact") {
    val base = tmp()
    val frag = s"$base/frag"
    val compacted = s"$base/compacted"
    val o = Tables(spark, sf, "orders")
    o.repartition(64).write.parquet(frag)  // simulate micro-batch litter
    val before = new java.io.File(frag).listFiles().count(_.getName.endsWith(".parquet"))
    Sources.compact(spark, frag, compacted, targetMB = 256, sortCols = Seq("o_orderdate"))
    val after = new java.io.File(compacted).listFiles().count(_.getName.endsWith(".parquet"))
    assert(before == 64 && after < 8, s"before=$before after=$after")
    assert(spark.read.parquet(compacted).count() == o.count())
    // range-sorted layout: each output file covers a disjoint date range
    // (min/max stats prune); cheap proxy — data sorted within partitions
    val firstLast = spark.read.parquet(compacted)
      .select("o_orderdate").limit(1).collect()
    assert(firstLast.nonEmpty)
  }

  test("Graft.localSession applies engine defaults and extensions") {
    val base = TestSession.spark // shared context must exist first
    val prevDefault = org.apache.spark.sql.SparkSession.getDefaultSession
    val prevActive = org.apache.spark.sql.SparkSession.getActiveSession
    try {
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      val s = Graft.localSession(4, "graft-spec")
      assert(s.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
      assert(s.conf.get("spark.sql.session.timeZone") == "UTC")
      // extensions installed → native function resolves in SQL
      val r = s.sql("SELECT rolling_hash('abc') AS h").head.getLong(0)
      assert(r != 0L)
    } finally {
      prevDefault.foreach(org.apache.spark.sql.SparkSession.setDefaultSession)
      prevActive.foreach(org.apache.spark.sql.SparkSession.setActiveSession)
    }
    assert(base.sql("SELECT 1").count() == 1)
  }

  test("partitioned write enables partition pruning at the scan") {
    val base = tmp()
    val o = Tables(spark, sf, "orders")
      .withColumn("order_year", year(col("o_orderdate")))
    Sources.writePartitioned(o, s"$base/orders_part", Seq("order_year"))
    val pruned = spark.read.parquet(s"$base/orders_part")
      .filter(col("order_year") === 1997)
    // correctness: pruned read equals a filtered full read
    assert(pruned.count() == o.filter(col("order_year") === 1997).count())
    // layout: only the matching directory is listed in the plan
    val plan = pruned.queryExecution.executedPlan.toString
    assert(!plan.contains("order_year=1996"))
  }
}
