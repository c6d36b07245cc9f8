package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Snapshots

/** Snapshots.rollback: forward-history heal, metadata-only cost
  * (hard links, zero bytes copied), maintenance-safety of the shared
  * file content.
  */
class RollbackSpec extends AnyFunSuite {
  import TestSession._

  private def freshTable(): String = {
    val t = java.nio.file.Files.createTempDirectory("graft-rb").toString + "/t"
    val good = Tables(spark, sf, "nation")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    Snapshots.commit(good, t)
    Snapshots.commit(good.withColumn("n_regionkey", col("n_regionkey") + 100), t)
    t
  }

  test("rollback heals the latest read and keeps the bad version travelable") {
    val t = freshTable()
    val v3 = Snapshots.rollback(t, 1L)
    assert(v3 == 3L)
    assert(Snapshots.versions(t) == Seq(1L, 2L, 3L))
    val healed = Snapshots.read(spark, t).orderBy("n_nationkey").collect()
    val v1 = Snapshots.read(spark, t, 1L).orderBy("n_nationkey").collect()
    assert(healed.sameElements(v1), "latest read != rolled-back-to version")
    // the bad version is history, not erased — still time-travelable
    val bad = Snapshots.read(spark, t, 2L)
      .filter(col("n_regionkey") >= 100).count()
    assert(bad > 0, "bad version no longer readable after rollback")
    assert(Snapshots.committedTags(t).contains("rollback-of-v1-as-v3"))
  }

  test("double rollback to one version: distinct tags, no ledger dupes, no idempotent-commit collision") {
    val t = freshTable()
    val v3 = Snapshots.rollback(t, 1L)
    val v4 = Snapshots.rollback(t, 1L)
    assert(v3 == 3L && v4 == 4L)
    val tags = Snapshots.committedTags(t)
    assert(tags.contains("rollback-of-v1-as-v3") && tags.contains("rollback-of-v1-as-v4"))
    // a user commit tagged with the OLD ambiguous spelling is a fresh
    // commit, not a silent no-op onto a rollback's version
    val good = Snapshots.read(spark, t, 1L)
    val v5 = Snapshots.commit(good, t, tag = Some("rollback-of-v1"))
    assert(v5 == 5L, s"idempotent-commit collided with a rollback tag (got v$v5)")
  }

  test("rollback is metadata-only: every data file is a hard link, zero bytes copied") {
    val t = freshTable()
    Snapshots.rollback(t, 1L)
    val srcDir = Paths.get(t, "v=1")
    val dstDir = Paths.get(t, "v=3")
    val links = Files.list(dstDir).iterator()
    var checked = 0
    while (links.hasNext) {
      val f = links.next()
      if (Files.isRegularFile(f)) {
        val src = srcDir.resolve(f.getFileName)
        assert(Files.exists(src), s"no source twin for ${f.getFileName}")
        assert(Files.getAttribute(f, "unix:ino") ==
          Files.getAttribute(src, "unix:ino"),
          s"${f.getFileName} was copied, not hard-linked")
        checked += 1
      }
    }
    assert(checked > 0, "rollback produced no files")
  }

  test("expiring the rolled-back-from versions keeps the healed data readable") {
    val t = freshTable()
    Snapshots.rollback(t, 1L)
    val expired = Snapshots.expireSnapshots(t, keep = 1)
    assert(expired == Seq(1L, 2L))
    // v=1's directory is gone, but v=3's hard links keep the content
    assert(!Files.exists(Paths.get(t, "v=1")))
    val rows = Snapshots.read(spark, t).count()
    assert(rows > 0, "healed snapshot unreadable after expiring its source")
    assert(Snapshots.read(spark, t)
      .filter(col("n_regionkey") >= 100).count() == 0)
  }
}
