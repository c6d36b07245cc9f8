package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Snapshots

/** Iceberg metadata tables beyond $history: $snapshots (lineage),
  * $files (per-file stats sidecar), $partitions (per-partition
  * rollup) — all metadata-only once the sidecar exists (the q77
  * proof: data files deleted, answers unchanged).
  */
class MetadataTablesSpec extends AnyFunSuite {
  import TestSession._

  private def land(): String = {
    val t = java.nio.file.Files.createTempDirectory("graft-meta-spec")
      .toString + "/nat"
    val base = Tables(spark, sf, "nation")
      .select(col("n_nationkey"), col("n_name"))
    Snapshots.commit(base.repartition(2), t)
    Snapshots.commit(base.unionAll(base).repartition(3), t, tag = Some("t2"))
    t
  }

  test("$snapshots: versions, parent lineage, tags, file counts") {
    val t = land()
    val rows = Snapshots.snapshotsTable(spark, t).orderBy("version").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(rows(0).isNullAt(1) && rows(1).getLong(1) == 1L, "parent lineage wrong")
    assert(rows(0).isNullAt(3) && rows(1).getString(3) == "t2")
    assert(rows.map(_.getLong(4)).toSeq == Seq(2L, 3L))
    assert(rows.forall(_.getLong(5) > 0L), "n_bytes must be positive")
  }

  test("$files row counts sum to the committed data; $partitions rolls them up") {
    val t = land()
    val n1 = Snapshots.read(spark, t, 1L).count()
    val n2 = Snapshots.read(spark, t, 2L).count()
    val files = Snapshots.filesTable(spark, t).collect()
    assert(files.count(_.getLong(0) == 1L) == 2)
    assert(files.count(_.getLong(0) == 2L) == 3)
    assert(files.filter(_.getLong(0) == 1L).map(_.getLong(2)).sum == n1)
    assert(files.filter(_.getLong(0) == 2L).map(_.getLong(2)).sum == n2)
    val p = Snapshots.partitionsTable(spark, t).head // latest = v2
    assert(p.getAs[Long]("file_count") == 3L)
    assert(p.getAs[Long]("record_count") == n2)
    assert(p.getAs[Long]("total_bytes") > 0L)
  }

  test("metadata-only: answers survive deleting every data file (sidecar + manifest)") {
    val t = land()
    // populate the sidecars, then destroy the data
    Snapshots.filesTable(spark, t).count()
    Seq(1L, 2L).foreach { v =>
      val dir = Paths.get(t, s"v=$v")
      val l = Files.list(dir)
      try {
        import scala.jdk.CollectionConverters._
        l.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .foreach(Files.delete(_))
      } finally l.close()
    }
    val files = Snapshots.filesTable(spark, t).collect()
    assert(files.length == 5, "files stats must answer from the sidecar alone")
    assert(files.forall(_.getLong(2) > 0L))
    val snaps = Snapshots.snapshotsTable(spark, t).orderBy("version").collect()
    assert(snaps.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(Snapshots.partitionsTable(spark, t).head.getAs[Long]("file_count") == 3L)
  }

  test("$partitions over a partitioned snapshot: per-partition stats, no data read, rollback links the tree") {
    val t = java.nio.file.Files.createTempDirectory("graft-part-spec")
      .toString + "/ord"
    val src = Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_orderdate"))
      .filter(col("o_orderdate") < lit("1995-04-01").cast("timestamp"))
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
    Snapshots.commitPartitioned(src.repartition(col("o_month")), t, Seq("o_month"))
    // read restores the partition column via scan discovery
    val back = Snapshots.read(spark, t)
    assert(back.columns.toSet == Set("o_orderkey", "o_orderdate", "o_month"))
    assert(back.count() == src.count())
    val expect = src.groupBy("o_month").count().collect()
      .map(r => (s"o_month=${r.getString(0)}", r.getLong(1))).toMap
    val parts = Snapshots.partitionsTable(spark, t).collect()
    assert(parts.map(_.getAs[String]("partition")).toSet == expect.keySet)
    parts.foreach { r =>
      assert(r.getAs[Long]("record_count") == expect(r.getAs[String]("partition")))
      assert(r.getAs[Long]("file_count") == 1L, "one file per partition by construction")
    }
    // metadata-only: delete every data file, $partitions still answers
    val walk = Files.walk(Paths.get(t, "v=1"))
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
        .toSeq.foreach(Files.delete(_))
    } finally walk.close()
    assert(Snapshots.partitionsTable(spark, t).count() == expect.size.toLong)
    // rollback of a partitioned snapshot recreates the nested tree
    val t2 = java.nio.file.Files.createTempDirectory("graft-part-rb")
      .toString + "/ord2"
    Snapshots.commitPartitioned(src.repartition(col("o_month")), t2, Seq("o_month"))
    Snapshots.commit(src.limit(3).drop("o_month"), t2)
    val v3 = Snapshots.rollback(t2, 1L)
    assert(Snapshots.read(spark, t2, v3).count() == src.count(),
      "rollback must restore the partitioned snapshot")
  }

  test("readPruned opens only stat-overlapping files; pruned == full-scan filter; empty overlap is empty") {
    val t = java.nio.file.Files.createTempDirectory("graft-prune-spec")
      .toString + "/cust"
    val base = Tables(spark, sf, "customer")
      .select(col("c_custkey"), col("c_acctbal"))
    // 4 range-disjoint files
    Snapshots.commit(
      base.repartitionByRange(4, col("c_custkey"))
        .sortWithinPartitions(col("c_custkey")), t)
    val full = base.filter(col("c_custkey") >= 10 && col("c_custkey") <= 60)
      .orderBy("c_custkey").collect()
    val (pruned, kept, total) =
      Snapshots.readPruned(spark, t, "c_custkey", 10L, 60L)
    assert(total == 4)
    assert(kept < total, s"no pruning happened ($kept of $total)")
    assert(pruned.orderBy("c_custkey").collect().sameElements(full),
      "pruned scan diverges from the full-scan filter")
    // a window past the key space keeps nothing and returns empty
    val (none, kept0, _) =
      Snapshots.readPruned(spark, t, "c_custkey", 10000000L, 20000000L)
    assert(kept0 == 0 && none.count() == 0)
  }

  test("$refs: main + branches + tags; fast-forward retires the branch ref and moves main") {
    val t = land() // v1, v2 tagged t2
    val base = Tables(spark, sf, "nation")
      .select(col("n_nationkey"), col("n_name"))
    Snapshots.commitToBranch(base, t, "dev")
    def refs() = Snapshots.refsTable(spark, t).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(refs() == Set(
      ("main", "BRANCH", 2L), ("dev", "BRANCH", 3L), ("t2", "TAG", 2L)))
    Snapshots.fastForward(t, "dev")
    // the branch record is gone; main's head IS the published commit
    assert(refs() == Set(("main", "BRANCH", 3L), ("t2", "TAG", 2L)))
    // a cherry-pick-style tagged commit surfaces as a TAG ref
    Snapshots.commit(base, t, tag = Some("release-x"))
    assert(refs().contains(("release-x", "TAG", 4L)))
  }

  test("facade: table$snapshots/$files/$partitions rewrite; non-warehouse names reach the parser") {
    val t = land()
    val wh = Paths.get(t).getParent.toString
    val viaSql = Engine.sqlWarehouse(spark, wh,
      """SELECT s.version, s.n_files, p.record_count
        |FROM nat$snapshots s JOIN nat$partitions p ON s.version = p.version
        |ORDER BY s.version""".stripMargin).collect()
    assert(viaSql.length == 1) // $partitions = latest snapshot only
    assert(viaSql(0).getLong(1) == 3L)
    val nFiles = Engine.sqlWarehouse(spark, wh,
      "SELECT COUNT(*) AS n FROM nat$files WHERE version = 1").head.getLong(0)
    assert(nFiles == 2L)
    val ex = intercept[Exception] {
      Engine.sqlWarehouse(spark, wh, "SELECT * FROM nosuch$files")
    }
    assert(ex.isInstanceOf[org.apache.spark.sql.catalyst.parser.ParseException] ||
      ex.isInstanceOf[org.apache.spark.sql.AnalysisException])
  }
}
