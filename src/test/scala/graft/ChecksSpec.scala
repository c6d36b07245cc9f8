package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Checks

class ChecksSpec extends AnyFunSuite {
  import TestSession._

  test("a 4-check suite scans the checked table once for all scalar checks") {
    val df = SparkEntry.queries("q54_quality_checks")(spark, sf)
    df.collect()
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case q: QueryStageExec => allScans(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(allScans)
    }
    val scans = allScans(df.queryExecution.executedPlan)
      .map(_.relation.location.rootPaths.mkString)
    // orders: ONE pass shared by not_null+unique+accepted_values, ONE
    // more as the relationships child; customer: one parent scan
    assert(scans.count(_.contains("orders")) == 2,
      s"expected 2 orders scans (scalar pass + relationships child), got $scans")
    assert(scans.count(_.contains("customer")) == 1)
  }

  test("violation counts are exact per check type") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("F")), (Some(1L), Some("O")), // dup key
      (None, Some("F")),                             // null key
      (Some(3L), Some("Z"))                          // bad status
    ).toDF("k", "status")
    val got = Checks.summary(df, Seq(
      Checks.NotNull("k"),
      Checks.Unique("k"),
      Checks.AcceptedValues("status", Seq("F", "O", "P"))))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getBoolean(3))).toSeq
    assert(got == Seq(
      ("accepted_values", 1L, false),
      ("not_null", 1L, false),
      ("unique", 1L, false)))
  }

  test("relationships counts non-null orphans only") {
    import spark.implicits._
    val child = Seq(Some(1L), Some(2L), None, Some(9L)).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val got = Checks.summary(child,
      Seq(Checks.Relationships("fk", "pk", () => parent)))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getBoolean(3))).toSeq
    assert(got == Seq(("relationships", 1L, false))) // only fk=9 is an orphan
  }

  test("commitChecked: violating writes are rejected with NO trace on disk") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cchk").toString + "/t"
    val good = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val v1 = Checks.commitChecked(good, dir, Seq(Checks.NotNull("k"), Checks.Unique("k")))
    assert(v1 == 1L)
    intercept[IllegalStateException] {
      Checks.commitChecked(Seq((Option.empty[Long], "x")).toDF("k", "v"),
        dir, Seq(Checks.NotNull("k")))
    }
    intercept[IllegalStateException] {
      Checks.commitChecked(good.unionAll(good), dir, Seq(Checks.Unique("k")))
    }
    // table unchanged, and the rejected writes created no directories
    // (the check runs BEFORE any data is written — nothing to vacuum)
    assert(graft.sources.Snapshots.versions(dir) == Seq(1L))
    val dirs = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .iterator()
    val vDirs = Iterator.continually(dirs).takeWhile(_.hasNext)
      .map(_.next().getFileName.toString).filter(_.startsWith("v=")).toSeq
    assert(vDirs == Seq("v=1"), s"rejected write left debris: $vDirs")
    assert(graft.sources.Snapshots.read(spark, dir).count() == 2)
  }
}
