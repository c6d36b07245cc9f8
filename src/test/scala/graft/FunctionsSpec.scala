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
