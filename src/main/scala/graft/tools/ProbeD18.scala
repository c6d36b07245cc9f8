package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage-by-stage timing of d18 at sf0.1. */
object ProbeD18 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    graft.Tables(spark, dir, "customer").count() // warm session
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val cust = graft.Tables(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"))
    val keyed = cust.withColumn("k", explode(expr(
      "array_union(array(c_name), transform(sequence(1, length(c_name)), " +
        "i -> concat(substring(c_name, 1, i - 1), substring(c_name, i + 1, 100))))")))
    timed("keyed count 1")(println(keyed.count()))
    timed("keyed count 2")(println(keyed.count()))
    val joined = keyed.as("a").join(keyed.as("b"),
      col("a.k") === col("b.k") && col("a.c_custkey") < col("b.c_custkey"))
    timed("join count")(println(joined.count()))
    val lev = joined.select(col("a.c_custkey").as("ak"), col("a.c_name").as("an"),
        col("b.c_name").as("bn"))
      .filter(levenshtein(col("an"), col("bn"), 1) >= 0)
    timed("lev count")(println(lev.count()))
    timed("full entry")(println(
      graft.operators.Dedup.d18FuzzyNameJoin(spark, dir).count()))
    spark.stop()
  }
}
