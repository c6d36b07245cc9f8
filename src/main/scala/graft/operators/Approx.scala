package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Exact, GraftFunctions}

/** Approximate / sketch operators — the 100 TB scale path where exact
  * counterparts (countDistinct, percentile, semi joins) stop fitting:
  *
  *  - HLL sketches are MERGEABLE: partial per-partition sketches union
  *    without rescanning, so distinct counts compose across days/
  *    shards/retries (the property exact countDistinct lacks).
  *  - A bloom filter built on a selective dim side prunes the fact
  *    scan before the shuffle — the manual form of Spark's injected
  *    runtime filters, with no false negatives, so join results stay
  *    EXACT (a02 carries a normal DuckDB oracle).
  */
object Approx {

  /** a01: per-language HLL distinct-source sketches + a merged ALL row
    * (hll_union_agg over the per-lang sketches), with exact counts and
    * relative error alongside. Rows-only check (sketch estimates are
    * engine-specific).
    */
  def a01HllSketches(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
    val perLang = d.groupBy(col("lang"))
      .agg(
        expr("hll_sketch_agg(source)").as("sk"),
        countDistinct(col("source")).as("exact_distinct"),
        count(lit(1)).as("n_docs"))
    val all = perLang.agg(
      expr("hll_union_agg(sk)").as("sk"),
      sum(col("n_docs")).as("n_docs"))
      .join(d.agg(countDistinct(col("source")).as("exact_distinct")))
      .select(lit("ALL").as("lang"), col("sk"), col("exact_distinct"), col("n_docs"))
    perLang.select(col("lang"), col("sk"), col("exact_distinct"), col("n_docs"))
      .unionAll(all)
      .withColumn("approx_distinct", expr("hll_sketch_estimate(sk)"))
      .withColumn("rel_error",
        abs(col("approx_distinct") - col("exact_distinct")).cast("double") /
          col("exact_distinct").cast("double"))
      .drop("sk")
      .orderBy(col("lang"))
  }

  /** a02: bloom-filtered star join. The selective customer slice
    * builds a compact bloom sketch (one collected row — the same
    * mechanism as Spark's injected runtime filters); the orders scan
    * probes it codegen'd BEFORE the shuffle, so only ~matching rows
    * move. False positives are removed by the real join → result is
    * exact, oracle-checkable.
    */
  def a02BloomFilteredJoin(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val dim = Tables(spark, dir, "customer")
      .filter(col("c_acctbal") > 9000.0)
    // 2^20 bits = 128 KB: the sketch is embedded in the probe-side plan
    // (and its generated code), so size it to the build-side
    // cardinality, not "as big as fits" — at 100 TB scale bits with the
    // dim count (~10 bits/key for ~1% FPP).
    val bloom = dim
      .agg(call_function("bloom_agg", col("c_custkey"),
        lit(100000L), lit(1L << 20)).as("bf"))
      .head().getAs[Array[Byte]](0)
    val o = Tables(spark, dir, "orders")
      .filter(call_function("bloom_might_contain", lit(bloom), col("o_custkey")))
    o.join(dim, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        countDistinct(col("c_custkey")).as("n_customers"),
        Exact.dsum(col("o_totalprice")).as("revenue"))
      .orderBy(col("c_mktsegment"))
  }

  /** a03: quantile sketches — per-language approx_percentile (the
    * mergeable rank sketch that replaces exact percentile at 100 TB)
    * side-by-side with the exact interpolated percentiles and the
    * absolute error. Rows-only check (sketch internals are
    * engine-specific); the spec bounds the error.
    */
  def a03QuantileSketch(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
    d.groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        expr("approx_percentile(n_chars, array(0.5, 0.9), 1000)").as("approx"),
        expr("percentile(n_chars, array(0.5, 0.9))").as("exact"))
      .select(col("lang"), col("n_docs"),
        element_at(col("approx"), 1).cast("double").as("approx_p50"),
        element_at(col("exact"), 1).as("exact_p50"),
        element_at(col("approx"), 2).cast("double").as("approx_p90"),
        element_at(col("exact"), 2).as("exact_p90"))
      .withColumn("err_p50", abs(col("approx_p50") - col("exact_p50")))
      .withColumn("err_p90", abs(col("approx_p90") - col("exact_p90")))
      .orderBy(col("lang"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a01_hll_sketches" -> (a01HllSketches _),
    "a02_bloom_filtered_join" -> (a02BloomFilteredJoin _),
    "a03_quantile_sketch" -> (a03QuantileSketch _)
  )

  val oracles: Map[String, String] = Map(
    "a02_bloom_filtered_join" ->
      """SELECT c_mktsegment,
        |  COUNT(*) AS n_orders,
        |  COUNT(DISTINCT c_custkey) AS n_customers,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_acctbal > 9000.0
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin
  )
}
