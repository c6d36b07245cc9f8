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
