package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r10 optimization invariants: driver-local commits land one file,
  * footer-derived column stats equal the aggregate they replaced
  * (nulls and partition dirs included), and the facade registration
  * memo invalidates on table change.
  */
class StoreOptSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def parquetFiles(dir: String): Seq[java.nio.file.Path] = {
    val w = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
    try {
      import scala.jdk.CollectionConverters._
      w.iterator().asScala.filter(p =>
        java.nio.file.Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet")).toSeq
    } finally w.close()
  }

  test("a driver-local commit writes exactly one data file") {
    import spark.implicits._
    val t = TempDirs.scratch("graft-storeopt") + "/local"
    val v = graft.sources.Snapshots.commit(
      (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "v"), t)
    assert(parquetFiles(s"$t/v=$v").size == 1)
    assert(graft.sources.Snapshots.read(spark, t).count() == 100)
  }

  test("footer column stats equal the data aggregate, nulls included") {
    import graft.sources.Snapshots
    val t = TempDirs.scratch("graft-storeopt") + "/stats"
    // 3 distributed files, one value range per file, k2 all-null in
    // one range — exercises the footer path's null convention
    val df = spark.range(0, 300, 1, 3).select(
      col("id").as("k"),
      when(col("id") < 100, lit(null).cast("long"))
        .otherwise(col("id") * 2).as("k2"))
    val v = Snapshots.commit(df, t)
    Snapshots.writeColStats(spark, t, v, Seq("k", "k2"))
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(t, s"v=$v", "_colstats.tsv"))
    import scala.jdk.CollectionConverters._
    val byFileCol = lines.asScala.filter(_.nonEmpty).map(_.split('\t'))
      .map(a => (a(0), a(1)) -> (a(2).toLong, a(3).toLong)).toMap
    // recompute the same bounds from the data (the replaced aggregate)
    val expect = spark.read.parquet(s"$t/v=$v")
      .groupBy(input_file_name().as("f"))
      .agg(min(col("k")).as("mnk"), max(col("k")).as("mxk"),
        min(col("k2")).as("mn2"), max(col("k2")).as("mx2"))
      .collect()
    assert(expect.nonEmpty)
    expect.foreach { r =>
      val name = r.getString(0).split('/').last
      assert(byFileCol((name, "k")) == (r.getLong(1), r.getLong(2)))
      val want =
        if (r.isNullAt(3)) (0L, 0L) else (r.getLong(3), r.getLong(4))
      assert(byFileCol((name, "k2")) == want)
    }
  }

  test("registration memo refreshes the view after a new commit") {
    import graft.sources.Snapshots
    import spark.implicits._
    val wh = TempDirs.scratch("graft-storeopt-wh")
    val t = s"$wh/tbl"
    Snapshots.commit(Seq((1L, "a")).toDF("k", "v"), t)
    val s = spark.newSession()
    assert(Engine.sqlWarehouse(s, wh, "SELECT COUNT(*) AS n FROM tbl")
      .head().getLong(0) == 1L)
    // second statement on the same session rides the memo
    assert(Engine.sqlWarehouse(s, wh, "SELECT COUNT(*) AS n FROM tbl")
      .head().getLong(0) == 1L)
    Snapshots.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t)
    // fingerprint changed: the view must re-register, not serve v1
    assert(Engine.sqlWarehouse(s, wh, "SELECT COUNT(*) AS n FROM tbl")
      .head().getLong(0) == 2L)
  }
}
