package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Snapshots

/** Iceberg-refs branch semantics: main isolation, fast-forward
  * atomicity, the rebase precondition, branch drop.
  */
class BranchSpec extends AnyFunSuite {
  import TestSession._

  private def fresh(): String = {
    val t = java.nio.file.Files.createTempDirectory("graft-branch-spec")
      .toString + "/tbl"
    Snapshots.commit(
      Tables(spark, sf, "region").select(col("r_regionkey"), col("r_name")), t)
    t
  }

  test("branch commits are invisible on main until fast-forward; then all land atomically") {
    val t = fresh()
    val base = Snapshots.read(spark, t)
    val n1 = base.count()
    Snapshots.commitToBranch(base.unionAll(base), t, "wip")
    Snapshots.commitToBranch(base.unionAll(base).unionAll(base), t, "wip")
    // main: still ONE version, still the original rows
    assert(Snapshots.versions(t) == Seq(1L))
    assert(Snapshots.read(spark, t).count() == n1)
    // branch head sees the latest branch commit
    assert(Snapshots.readBranch(spark, t, "wip").count() == 3 * n1)
    val head = Snapshots.fastForward(t, "wip")
    // both branch commits are now main history, in order
    assert(Snapshots.versions(t) == Seq(1L, 2L, 3L))
    assert(head == 3L)
    assert(Snapshots.read(spark, t).count() == 3 * n1)
    assert(Snapshots.read(spark, t, 2L).count() == 2 * n1,
      "intermediate branch commit must be time-travelable after publish")
    // the branch record is gone; a re-fast-forward has nothing to do
    intercept[IllegalArgumentException](Snapshots.fastForward(t, "wip"))
  }

  test("fast-forward refuses when main advanced past the fork (rebase required)") {
    val t = fresh()
    val base = Snapshots.read(spark, t)
    Snapshots.commitToBranch(base.unionAll(base), t, "wip")
    Snapshots.commit(base.limit(1), t) // concurrent main commit
    val ex = intercept[IllegalArgumentException](Snapshots.fastForward(t, "wip"))
    assert(ex.getMessage.contains("rebase"))
    // main unaffected by the refused publish
    assert(Snapshots.versions(t) == Seq(1L, 3L))
  }

  test("cherry-pick applies exactly one branch commit's delta onto a moved head, idempotently") {
    val t = fresh()
    val base = Snapshots.read(spark, t)
    val n1 = base.count()
    // branch: +A (dup of base), then +B on top — two append commits
    val vA = Snapshots.commitToBranch(base.unionAll(base), t, "wip")
    Snapshots.commitToBranch(base.unionAll(base).unionAll(base), t, "wip")
    // main advances: fast-forward is impossible, cherry-pick is not
    Snapshots.commit(base.unionAll(base.limit(1)), t)
    intercept[IllegalArgumentException](Snapshots.fastForward(t, "wip"))
    val head = Snapshots.cherryPick(spark, t, "wip", vA)
    // head = advanced main (n1+1) + A's delta (n1); B never landed
    assert(Snapshots.read(spark, t).count() == 2 * n1 + 1)
    assert(Snapshots.committedTags(t).contains(s"cherrypick:$vA"))
    // replayed pick resolves to the same version, no double-append
    assert(Snapshots.cherryPick(spark, t, "wip", vA) == head)
    assert(Snapshots.read(spark, t).count() == 2 * n1 + 1)
  }

  test("cherry-pick refuses a branch commit that removed rows (appends only)") {
    val t = fresh()
    val base = Snapshots.read(spark, t)
    val v = Snapshots.commitToBranch(base.limit(2), t, "wip") // shrinks
    val ex = intercept[IllegalArgumentException](
      Snapshots.cherryPick(spark, t, "wip", v))
    assert(ex.getMessage.contains("append"))
    assert(Snapshots.versions(t) == Seq(1L), "refused pick must not commit")
    // and an unknown version is rejected outright
    intercept[IllegalArgumentException](
      Snapshots.cherryPick(spark, t, "wip", 99L))
  }

  test("a fresh branch reads its fork point; drop forgets the branch") {
    val t = fresh()
    val n = Snapshots.read(spark, t).count()
    assert(Snapshots.readBranch(spark, t, "nothing-yet").count() == n)
    Snapshots.commitToBranch(Snapshots.read(spark, t), t, "tmp")
    assert(Snapshots.branchVersions(t, "tmp").nonEmpty)
    Snapshots.dropBranch(t, "tmp")
    assert(Snapshots.branchVersions(t, "tmp").isEmpty)
    assert(Snapshots.versions(t) == Seq(1L), "dropped branch must not touch main")
  }
}
