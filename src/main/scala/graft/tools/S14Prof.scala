package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage-level timing of the s14 IVF-PQ chain (guide §1) —
  * where do its seconds go: coarse k-means, PQ codebook training,
  * corpus code assignment, or the ADC serve?
  */
object S14Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[s14] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm the IO / codegen paths once
    graft.SparkEntry.queries("s14_ivf_pq")(spark, dir).count()
    spark.catalog.clearCache()
    (1 to 2).foreach { i =>
      time(s"run$i coarse kmeans via s08 (2 Lloyd rounds + rollup)") {
        graft.SparkEntry.queries("s08_ann_kmeans")(spark, dir).count()
      }
      spark.catalog.clearCache()
      val (cb, asn) = graft.operators.Similarity.pqModel(spark, dir)
      val codebook = time(s"run$i pq codebook train") {
        val c = cb.persist()
        c.queryExecution.toRdd.count()
        c
      }
      time(s"run$i corpus pq-assign")(
        graft.operators.Similarity.pqAssign(spark, dir, codebook).count())
      time(s"run$i FULL s14 entry (everything incl. above, fresh)") {
        spark.catalog.clearCache()
        graft.SparkEntry.queries("s14_ivf_pq")(spark, dir).count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
