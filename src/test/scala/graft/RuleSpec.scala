package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.Asof

class RuleSpec extends AnyFunSuite {
  import TestSession._

  test("PushFilterThroughAsofJoin pushes left-only filters below the join") {
    val events = Tables(spark, sf, "events")
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val v = events.filter(col("event_type") === "view")
      .select(col("user_id").as("vu"), col("event_id").as("vid"), col("ts").as("vts"))
    val joined = Asof.join(p, v, "user_id", "vu", "ts", "vts", "vid")
    val filtered = joined.filter(col("user_id") < 10)

    val optimized = filtered.queryExecution.optimizedPlan
    // the AsofJoinPlan node must have the filter in its LEFT subtree,
    // not sitting above the join
    val asof = optimized.collect {
      case a: graft.plans.AsofJoinPlan => a
    }
    assert(asof.nonEmpty, "AsofJoinPlan survived optimization")
    val leftHasFilter = asof.head.left.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.condition.toString.contains("user_id") => f
    }.nonEmpty
    assert(leftHasFilter, s"filter not pushed into left subtree:\n$optimized")

    // and results are unchanged vs filtering before the join
    val direct = Asof.join(p.filter(col("user_id") < 10), v,
      "user_id", "vu", "ts", "vts", "vid")
    assert(filtered.collect().map(_.toString).sorted.toSeq ==
      direct.collect().map(_.toString).sorted.toSeq)
  }
}
