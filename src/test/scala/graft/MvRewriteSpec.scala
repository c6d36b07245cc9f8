package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Exact._
import graft.plans.Mv
import graft.queries.Warehouse

class MvRewriteSpec extends AnyFunSuite {
  import TestSession._

  private def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    df.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case q: QueryStageExec => allScans(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(allScans)
    }
    allScans(df.queryExecution.executedPlan)
      .flatMap(_.relation.location.rootPaths.map(_.toUri.getPath))
  }

  test("q80 rollup is rerouted to the MV scan; answers equal the base aggregate") {
    val (out, mvPath, mvName) = Warehouse.mvRollup(spark, sf)
    try {
      val paths = scanPaths(out)
      assert(paths.nonEmpty)
      assert(paths.forall(_.startsWith(mvPath)),
        s"expected only MV scans under $mvPath, got $paths")

      // same query with the registry emptied must hit the base table
      // and produce the identical result
      val defn = Mv.registered.find(_.name == mvName).get
      Mv.drop(mvName)
      val (base, _, _) = (out, mvPath, mvName)
      val plain = spark.read.parquet(s"$sf/lineitem.parquet")
        .filter(col("l_shipdate") < lit("1995-06-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          count(lit(1)).as("cnt"),
          max(col("l_quantity")).as("max_qty"),
          davg(col("l_quantity")).as("avg_qty"))
      val plainPaths = scanPaths(plain)
      assert(plainPaths.forall(_.endsWith("lineitem.parquet")),
        s"unregistered MV must not rewrite: $plainPaths")
      assert(out.collect().map(_.toString).sorted
        .sameElements(plain.collect().map(_.toString).sorted),
        "rewritten and plain answers diverge")
      Mv.register(defn)
      val _ = base
    } finally Mv.drop(mvName)
  }

  test("COUNT(*) keeps its non-nullable zero-groups contract through the rewrite") {
    val (_, _, mvName) = Warehouse.mvRollup(spark, sf)
    try {
      // grand total over an always-false key filter: base answer is a
      // single row (cnt=0, sums NULL); the rewrite must agree
      val df = spark.read.parquet(s"$sf/lineitem.parquet")
        .filter(col("l_returnflag") === "no_such_flag")
        .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("s"))
      assert(scanPaths(df).forall(p => !p.endsWith("lineitem.parquet")),
        "grand-total rollup should rewrite too")
      val row = df.collect().head
      assert(row.getLong(0) == 0L)
      assert(row.isNullAt(1))
    } finally Mv.drop(mvName)
  }

  test("st18: incrementally-maintained MV serves the base-table rollup exactly") {
    val (mvName, basePath) = graft.streaming.EventStream.st18Seeded(spark, sf)
    try {
      val mvPath = Mv.registered.find(_.name == mvName).get.mvPath
      val out = spark.read.parquet(basePath)
        .groupBy("o_orderstatus")
        .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n"))
      val paths = scanPaths(out)
      assert(paths.nonEmpty && paths.forall(_.startsWith(mvPath)),
        s"rollup should serve from the MAINTAINED MV $mvPath, got $paths")
      Mv.drop(mvName)
      val truth = spark.read.parquet(basePath)
        .groupBy("o_orderstatus")
        .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n"))
      assert(out.collect().map(_.toString).sorted
        .sameElements(truth.collect().map(_.toString).sorted),
        "maintained MV diverged from the base table")
    } finally Mv.drop(mvName)
  }

  test("non-rewritable shapes stay on the base table and stay correct") {
    val (_, _, mvName) = Warehouse.mvRollup(spark, sf)
    try {
      val base = spark.read.parquet(s"$sf/lineitem.parquet")
      // (a) grouping by a non-key
      val g = base.groupBy("l_partkey").agg(count(lit(1)).as("n"))
      assert(scanPaths(g).forall(_.endsWith("lineitem.parquet")),
        "group-by non-key must not rewrite")
      // (b) filter on a non-key column
      val f = base.filter(col("l_quantity") > 10)
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      assert(scanPaths(f).forall(_.endsWith("lineitem.parquet")),
        "filter on non-key must not rewrite")
      // (c) aggregate the MV has no measure for
      val s = base.groupBy("l_returnflag").agg(sum("l_tax").as("t"))
      assert(scanPaths(s).forall(_.endsWith("lineitem.parquet")),
        "sum of non-measure must not rewrite")
      // (d) DISTINCT aggregates never rewrite
      val d = base.groupBy("l_returnflag")
        .agg(countDistinct(col("l_quantity")).as("n"))
      assert(scanPaths(d).forall(_.endsWith("lineitem.parquet")),
        "distinct aggregate must not rewrite")
    } finally Mv.drop(mvName)
  }
}
