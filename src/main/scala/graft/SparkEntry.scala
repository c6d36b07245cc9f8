package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Approx, Dedup, Merge, Multimodal, Pipeline, RangeJoin, Similarity, TextAnalysis}
import graft.queries.{Advanced, Relational, TpchSuite, Warehouse}
import graft.streaming.EventStream

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q05RevenueByNation(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Advanced.queries ++ TpchSuite.queries ++
      Merge.queries ++ TextAnalysis.queries ++ Dedup.queries ++
      Similarity.queries ++ Multimodal.queries ++ Pipeline.queries ++
      Approx.queries ++ EventStream.queries ++ graft.streaming.AvroCdc.queries ++
      graft.pipeline.AnalyticsDag.queries ++ Warehouse.queries ++
      graft.pipeline.Checks.queries ++ RangeJoin.queries ++
      graft.pipeline.CorpusDag.queries

  /** For each key in queries, equivalent SQL runnable by DuckDB on the
    * same parquet tables. Omitted keys get a rows-only check.
    */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Advanced.oracles ++ TpchSuite.oracles ++
      Merge.oracles ++ TextAnalysis.oracles ++ Dedup.oracles ++
      Similarity.oracles ++ Multimodal.oracles ++ Pipeline.oracles ++
      Approx.oracles ++ EventStream.oracles ++ graft.streaming.AvroCdc.oracles ++
      graft.pipeline.AnalyticsDag.oracles ++ Warehouse.oracles ++
      graft.pipeline.Checks.oracles ++ RangeJoin.oracles ++
      graft.pipeline.CorpusDag.oracles
}
