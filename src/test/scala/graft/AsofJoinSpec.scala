package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.Asof

class AsofJoinSpec extends AnyFunSuite {
  import TestSession._

  test("AsofJoinExec matches a composed groupBy-max reference") {
    val events = Tables(spark, sf, "events")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"), col("event_id").as("v_event_id"),
        col("ts").as("v_ts"), col("value").as("v_value"))

    val got = Asof.join(purchases, views, "user_id", "v_user_id", "ts", "v_ts", "v_event_id")
      .select("user_id", "event_id", "v_event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet

    // reference: non-equi join + keep max (v_ts, v_event_id) per purchase
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("event_id"))
      .orderBy(col("v_ts").desc, col("v_event_id").desc)
    val ref = purchases.join(views,
        col("user_id") === col("v_user_id") && col("v_ts") <= col("ts"), "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_id", "v_event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet

    assert(got == ref)
    assert(got.exists(_._3 == -1L) || got.nonEmpty) // unmatched rows allowed
  }

  test("Asof.join rejects colliding column names and unknown columns") {
    val events = Tables(spark, sf, "events")
    val p = events.select("user_id", "event_id", "ts")
    val err = intercept[IllegalArgumentException](
      Asof.join(p, p, "user_id", "user_id", "ts", "ts", "event_id"))
    assert(err.getMessage.contains("rename right-side columns"))
    val v = events.select(col("user_id").as("vu"), col("ts").as("vts"), col("event_id").as("vid"))
    val err2 = intercept[IllegalArgumentException](
      Asof.join(p, v, "user_id", "nope", "ts", "vts", "vid"))
    assert(err2.getMessage.contains("'nope' not found"))
  }
}
