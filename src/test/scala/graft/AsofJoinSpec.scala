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

  test("asof edge cases: empty right side, keys with no match, tied timestamps") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L, "a"), (1L, 20L, 101L, "b"), (2L, 5L, 102L, "c"))
      .toDF("k", "t", "lid", "tag")
      .select(col("k"), org.apache.spark.sql.functions.timestamp_micros(col("t")).as("t"),
        col("lid"), col("tag"))
    // empty right: every left row survives with null right columns
    val emptyRight = Seq.empty[(Long, Long, Long)].toDF("rk", "rt", "rid")
      .select(col("rk"), org.apache.spark.sql.functions.timestamp_micros(col("rt")).as("rt"),
        col("rid"))
    val j1 = Asof.join(left, emptyRight, "k", "rk", "t", "rt", "rid").collect()
    assert(j1.length == 3 && j1.forall(_.isNullAt(j1.head.fieldIndex("rid"))))
    // tied right timestamps: the larger tiebreak id wins deterministically
    val right = Seq((1L, 10L, 7L), (1L, 10L, 9L), (3L, 1L, 11L))
      .toDF("rk", "rt", "rid")
      .select(col("rk"), org.apache.spark.sql.functions.timestamp_micros(col("rt")).as("rt"),
        col("rid"))
    val j2 = Asof.join(left, right, "k", "rk", "t", "rt", "rid")
      .select("k", "lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    // k=1,t=10: both right rows at rt=10 qualify (<=), rid 9 wins;
    // k=1,t=20: same; k=2: no right rows for key → null
    assert(j2 == Set((1L, 100L, 9L), (1L, 101L, 9L), (2L, 102L, -1L)))
  }

  test("oversized build side fails loudly instead of OOMing the driver") {
    val events = Tables(spark, sf, "events")
    val p = events.filter(col("event_type") === "purchase")
      .select("user_id", "event_id", "ts")
    val v = events.select(col("user_id").as("vu"), col("ts").as("vts"),
      col("event_id").as("vid"))
    spark.conf.set(graft.plans.AsofJoinExec.MAX_BUILD_ROWS_KEY, "10")
    try {
      val err = intercept[IllegalStateException] {
        Asof.join(p, v, "user_id", "vu", "ts", "vts", "vid").count()
      }
      assert(err.getMessage.contains("maxBuildRows"),
        s"expected the cap error, got: ${err.getMessage}")
    } finally spark.conf.unset(graft.plans.AsofJoinExec.MAX_BUILD_ROWS_KEY)
    // and with the default cap the same join runs
    assert(Asof.join(p, v, "user_id", "vu", "ts", "vts", "vid").count() > 0)
  }

  test("NULL keys and NULL times follow SQL semantics: never match, never crash") {
    import spark.implicits._
    def ts(c: org.apache.spark.sql.Column) =
      org.apache.spark.sql.functions.timestamp_micros(c)
    val left = Seq((Some(1L), Some(10L), 100L), (None, Some(10L), 101L),
      (Some(1L), None, 102L))
      .toDF("k", "t", "lid").select(col("k"), ts(col("t")).as("t"), col("lid"))
    val right = Seq((Some(1L), Some(5L), 7L), (None, Some(5L), 8L),
      (Some(1L), None, 9L))
      .toDF("rk", "rt", "rid").select(col("rk"), ts(col("rt")).as("rt"), col("rid"))
    val got = Asof.join(left, right, "k", "rk", "t", "rt", "rid")
      .select("lid", "rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // lid=100: k=1,t=10 matches rid=7 (rt=5 <= 10; the NULL-key and
    // NULL-time right rows are unmatchable). lid=101: NULL left key
    // must NOT match the NULL-key right row. lid=102: NULL left time
    // matches nothing.
    assert(got == Map(100L -> 7L, 101L -> -1L, 102L -> -1L))
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

  test("oversized build side auto-falls back to the window composition, same results") {
    val events = Tables(spark, sf, "events")
    val p = events.filter(col("event_type") === "purchase")
      .select("user_id", "event_id", "ts")
    val v = events.filter(col("event_type") === "view")
      .select(col("user_id").as("vu"), col("ts").as("vts"),
        col("event_id").as("vid"))
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("event_id", "vid").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toSet
    val viaExec = Asof.join(p, v, "user_id", "vu", "ts", "vts", "vid")
    // nodeName strips the Exec suffix: the operator prints as "AsofJoin"
    assert(viaExec.queryExecution.executedPlan.toString.contains("AsofJoin"),
      "small build side should pick the broadcast-index exec")
    val execRows = rows(viaExec)
    spark.conf.set(graft.plans.AsofJoinExec.FALLBACK_BYTES_KEY, "1")
    try {
      val viaComposed = Asof.join(p, v, "user_id", "vu", "ts", "vts", "vid")
      assert(!viaComposed.queryExecution.executedPlan.toString.contains("AsofJoin"),
        "past the fallback threshold the plan must not broadcast-index")
      assert(rows(viaComposed) == execRows,
        "fallback composition diverged from the exec path")
    } finally spark.conf.unset(graft.plans.AsofJoinExec.FALLBACK_BYTES_KEY)
  }

  test("composed fallback handles DateType times like the exec path") {
    import spark.implicits._
    def d(s: String) = org.apache.spark.sql.functions.to_date(
      org.apache.spark.sql.functions.lit(s))
    val left = Seq(100L, 101L).toDF("lid")
      .withColumn("k", org.apache.spark.sql.functions.lit(1L))
      .withColumn("t", d("1995-03-15"))
    val right = Seq((1L, 7L), (1L, 8L)).toDF("rk", "rid")
      .withColumn("rt", d("1995-03-01"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("lid", "rid").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toSet
    val viaExec = rows(Asof.join(left, right, "k", "rk", "t", "rt", "rid"))
    val viaComposed = rows(Asof.composed(left, right, "k", "rk", "t", "rt", "rid"))
    assert(viaComposed == viaExec)
    assert(viaComposed == Set(100L -> 8L, 101L -> 8L))
  }

  test("composed fallback keeps the exec's NULL semantics") {
    import spark.implicits._
    def ts(c: org.apache.spark.sql.Column) =
      org.apache.spark.sql.functions.timestamp_micros(c)
    val left = Seq((Some(1L), Some(10L), 100L), (None, Some(10L), 101L),
      (Some(1L), None, 102L))
      .toDF("k", "t", "lid").select(col("k"), ts(col("t")).as("t"), col("lid"))
    val right = Seq((Some(1L), Some(5L), 7L), (None, Some(5L), 8L),
      (Some(1L), None, 9L))
      .toDF("rk", "rt", "rid").select(col("rk"), ts(col("rt")).as("rt"), col("rid"))
    val got = Asof.composed(left, right, "k", "rk", "t", "rt", "rid")
      .select("lid", "rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got == Map(100L -> 7L, 101L -> -1L, 102L -> -1L))
  }
}
