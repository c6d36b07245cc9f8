package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftFunctions, RollingHashExpr}
import graft.operators.Multimodal

class FunctionsSpec extends AnyFunSuite {
  import TestSession._

  test("RollingHashExpr: interpreted eval matches the static helper") {
    val h = RollingHashExpr.hash(UTF8String.fromString("spark"))
    assert(h == "spark".getBytes("UTF-8")
      .foldLeft(1125899906842597L)((a, b) => 31 * a + b))
  }

  test("rolling_hash runs inside a DataFrame plan (codegen path)") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val out = Seq("a", "spark", "a").toDF("s")
      .select(GraftFunctions.rollingHash(col("s")).as("h"))
      .collect().map(_.getLong(0))
    assert(out(0) == out(2) && out(0) != out(1))
    assert(out(1) == RollingHashExpr.hash(UTF8String.fromString("spark")))
  }

  test("k_min_values: k smallest distinct, sorted, null-safe, merges across partitions") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // 1000 values with duplicates, spread over 8 partitions so the
    // sketch must MERGE partial buffers; expected = 5 smallest distinct
    val vals = (1L to 500L).flatMap(v => Seq(v * 7 % 501, v * 7 % 501, v))
    val df = vals.toDF("v").repartition(8)
      .select(when(col("v") =!= 13L, col("v")).as("v")) // a NULL in the mix
    val got = df.agg(GraftFunctions.kMinValues(col("v"), 5)).head()
      .getSeq[Long](0)
    val expected = vals.filter(_ != 13L).distinct.sorted.take(5)
    assert(got == expected, s"got $got expected $expected")
    // under-full group: sketch IS the exact distinct set
    val small = Seq(9L, 3L, 9L, 7L).toDF("v")
      .agg(GraftFunctions.kMinValues(col("v"), 5)).head().getSeq[Long](0)
    assert(small == Seq(3L, 7L, 9L))
  }

  test("k_min_values union-of-sketches == sketch-of-union") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val a = (1L to 300L).map(_ * 3).toDF("v")   // multiples of 3
    val b = (1L to 300L).map(_ * 2).toDF("v")   // multiples of 2, overlap on 6s
    def sk(df: org.apache.spark.sql.DataFrame) =
      df.agg(GraftFunctions.kMinValues(col("v"), 16).as("sk"))
    val unioned = sk(a).unionByName(sk(b))
      .select(explode(col("sk")).as("v"))
      .agg(GraftFunctions.kMinValues(col("v"), 16)).head().getSeq[Long](0)
    val direct = sk(a.unionByName(b)).head().getSeq[Long](0)
    assert(unioned == direct)
  }

  test("decodeBatch stub is deterministic and preserves ids") {
    import spark.implicits._
    val payloads = spark.createDataset(Seq(
      (1L, "hello".getBytes("UTF-8")),
      (2L, Array.empty[Byte])))
    val out = Multimodal.decodeBatch(spark, payloads).collect().sortBy(_.doc_id)
    assert(out.map(_.doc_id).toSeq == Seq(1L, 2L))
    assert(out(0).byte_len == 5 && out(1).byte_len == 0)
    val again = Multimodal.decodeBatch(spark, payloads).collect().sortBy(_.doc_id)
    assert(out.toSeq == again.toSeq)
  }
}
