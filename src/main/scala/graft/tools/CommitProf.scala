package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: cost decomposition of one Snapshots.commit — write job vs
  * everything else — plus the produced file count, for scan-rooted,
  * shuffle-rooted and LocalRelation-rooted frames (guide §6: output
  * file sizing).
  */
object CommitProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import graft.sources.Snapshots
    def files(d: String): Int = {
      val w = java.nio.file.Files.walk(java.nio.file.Paths.get(d))
      try {
        import scala.jdk.CollectionConverters._
        w.iterator().asScala.count(p =>
          p.toString.endsWith(".parquet") &&
            java.nio.file.Files.isRegularFile(p))
      } finally w.close()
    }
    def probe(label: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val t = graft.TempDirs.scratch(s"graft-cprof") + "/t"
      df.count() // warm lineage
      val t0 = System.nanoTime()
      Snapshots.commit(df, t)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[commit] $label: $dt%.2f s, ${files(t)} files")
    }
    val orders = graft.Tables(spark, dir, "orders")
    probe("scan-rooted (orders 150k rows)", orders)
    probe("shuffle-rooted (orders grouped)",
      orders.groupBy(col("o_custkey")).agg(count(lit(1)).as("n")))
    import spark.implicits._
    probe("LocalRelation 100 rows", (1 to 100).map(i => (i.toLong, s"v$i"))
      .toDF("k", "v"))
    probe("LocalRelation 100 rows again", (1 to 100).map(i => (i.toLong, s"v$i"))
      .toDF("k", "v"))
    // decomposition: the bare write job vs the commit wrapper, on the
    // 5-row shuffle-rooted frame every streaming rollup commit lands
    val tiny = orders.groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
    tiny.count()
    probe("tiny shuffle-rooted (3 rows)", tiny)
    val bare = graft.TempDirs.scratch("graft-cprof-bare")
    var i = 0
    def t(label: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      (1 to 5).foreach(_ => f)
      println(f"[commit] $label: ${(System.nanoTime() - t0) / 1e9 / 5}%.3f s/call (n=5)")
    }
    t("bare parquet write of tiny frame") {
      i += 1; tiny.write.mode("overwrite").parquet(s"$bare/w$i")
    }
    t("bare parquet write of tiny frame, coalesce(1)") {
      i += 1; tiny.coalesce(1).write.mode("overwrite").parquet(s"$bare/w$i")
    }
    t("optimizedPlan inspection of tiny frame") {
      tiny.queryExecution.optimizedPlan match {
        case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => ()
        case _ => ()
      }
    }
    t("full Snapshots.commit of tiny frame") {
      i += 1; Snapshots.commit(tiny, graft.TempDirs.scratch("graft-cprof2") + s"/t$i")
    }
    spark.stop()
  }
}
