package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextGrams
import graft.pipeline.CorpusDag
import graft.sources.Snapshots

/** p18 corpus-cleaning DAG: staged materialization, funnel
  * monotonicity, dedup/decontamination invariants.
  */
class CorpusDagSpec extends AnyFunSuite {
  import TestSession._

  private lazy val wh = {
    val dir = java.nio.file.Files.createTempDirectory("graft-corpus-spec").toString
    val runner = new graft.pipeline.Runner(spark, dir)
    runner.run(CorpusDag.models,
      Map("documents" -> Tables(spark, sf, "documents")))
    runner
  }

  test("every stage lands as a v1 snapshot and the funnel is monotone") {
    CorpusDag.models.foreach { m =>
      assert(Snapshots.versions(wh.tableDir(m.name)) == Seq(1L),
        s"model ${m.name} not materialized exactly once")
    }
    val mart = wh.readModel("corpus_mart").collect()
    assert(mart.nonEmpty)
    mart.foreach { r =>
      val (raw, stg, dd, cl) = (r.getLong(r.fieldIndex("n_raw")),
        r.getLong(r.fieldIndex("n_staged")),
        r.getLong(r.fieldIndex("n_deduped")),
        r.getLong(r.fieldIndex("n_clean")))
      assert(raw >= stg && stg >= dd && dd >= cl,
        s"funnel not monotone for ${r.getString(0)}: $raw/$stg/$dd/$cl")
      assert(cl > 0, s"source ${r.getString(0)} lost every doc")
    }
  }

  test("dedup_docs holds exactly one survivor per text, the smallest doc_id") {
    val dd = wh.readModel("dedup_docs")
    val dupGroups = dd.groupBy(md5(col("text"))).count()
      .filter(col("count") > 1).count()
    assert(dupGroups == 0, s"$dupGroups text hashes still duplicated")
    // survivors are the min doc_id of their duplicate group in staging
    val stg = wh.readModel("stg_docs")
      .groupBy(md5(col("text")).as("h")).agg(min(col("doc_id")).as("min_id"))
    val wrong = dd.select(md5(col("text")).as("h"), col("doc_id"))
      .join(stg, Seq("h"))
      .filter(col("doc_id") =!= col("min_id")).count()
    assert(wrong == 0, s"$wrong survivors are not their group's min doc_id")
  }

  test("clean_docs shares no 5-gram with the benchmark slice and excludes it") {
    val clean = wh.readModel("clean_docs")
    assert(clean.filter(col("doc_id") % 13 === 0).count() == 0,
      "benchmark slice leaked into the training corpus")
    def grams(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), expr(TextGrams.tokensExpr("text")).as("ts"))
      .select(col("doc_id"),
        explode(array_distinct(expr(TextGrams.gramExpr("ts", 5)))).as("g"))
    val bench = grams(wh.readModel("dedup_docs").filter(col("doc_id") % 13 === 0))
      .select(col("g")).distinct()
    val overlap = grams(clean).join(bench, Seq("g"), "left_semi").count()
    assert(overlap == 0, s"$overlap contaminated grams survived the sweep")
  }
}
