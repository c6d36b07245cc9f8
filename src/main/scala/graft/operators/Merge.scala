package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Incremental MERGE (upsert) — the dbt `incremental_strategy='merge'`
  * / Iceberg MERGE INTO semantics the reference relies on
  * (dbt/analytics/models/marts/daily_order_metrics.sql:1: materialized
  * ='incremental', unique_key, merge), re-expressed as a pure
  * DataFrame transform: WHEN MATCHED → take the source row, WHEN NOT
  * MATCHED → keep/insert. One full-outer shuffle on the merge keys —
  * the same cost profile as a storage-level MERGE at 100 TB.
  */
object Merge {

  /** Row-level upsert: source rows replace matched target rows
    * entirely (not column-wise coalesce — NULLs in source are honored),
    * unmatched source rows are inserted, unmatched target rows kept.
    * Both sides must share the target's schema.
    *
    * `deleteWhen` (evaluated against SOURCE columns) adds the Iceberg
    * `WHEN MATCHED AND cond THEN DELETE` clause
    * (reference docs/components/iceberg.md MERGE surface): a matched
    * source row satisfying the condition removes the target row, and
    * an UNmatched source row satisfying it inserts nothing (a
    * tombstone for an absent key is a no-op, as in MERGE where WHEN
    * NOT MATCHED can only insert). Still one full-outer shuffle.
    */
  def upsert(target: DataFrame, source: DataFrame, keys: Seq[String],
      deleteWhen: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(keys.nonEmpty, "merge needs at least one key column")
    // resolve the delete predicate against bare source columns BEFORE
    // aliasing, so callers never deal with join-internal aliases
    val srcFlagged = deleteWhen.fold(source.withColumn("__graft_del", lit(false)))(c =>
      source.withColumn("__graft_del", coalesce(c, lit(false))))
    val t = target.as("t")
    val s = srcFlagged.as("s")
    val cond = keys.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _)
    val sPresent = col(s"s.${keys.head}").isNotNull
    val cols = target.columns.toSeq.map { c =>
      when(sPresent, col(s"s.$c")).otherwise(col(s"t.$c")).as(c)
    }
    t.join(s, cond, "full_outer")
      .filter(!(sPresent && col("s.__graft_del")))
      .select(cols: _*)
  }

  /** q21: incremental-merge materialization of the CDC latest-wins
    * snapshot: a stale snapshot (events before the cutoff) merged with
    * a recompute for users active after the cutoff. Result must equal
    * the full snapshot (q10's oracle re-used verbatim) — exercising
    * matched-update, not-matched-insert and untouched-keep paths.
    */
  def q21IncrementalMerge(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val events = Tables(spark, dir, "events")
    val cutoff = lit("2024-01-15").cast("timestamp")

    def snapshot(df: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      df.withColumn("rn", row_number().over(w))
        .withColumn("n_changes", count(lit(1)).over(Window.partitionBy(col("user_id"))))
        .filter(col("rn") === 1)
        .select(
          col("user_id"),
          col("event_id").as("last_event_id"),
          col("event_type").as("last_event_type"),
          col("value").as("last_value"),
          unix_millis(col("ts")).as("last_ts_ms"),
          col("n_changes"))
    }

    val target = snapshot(events.filter(col("ts") < cutoff))
    val activeUsers = events.filter(col("ts") >= cutoff).select("user_id").distinct()
    val source = snapshot(events.join(activeUsers, Seq("user_id"), "left_semi"))
    upsert(target, source, Seq("user_id")).orderBy(col("user_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q21_incremental_merge" -> (q21IncrementalMerge _)
  )

  // The merge of stale+recomputed snapshots must equal the full
  // snapshot — same oracle as q10_cdc_latest_snapshot.
  val oracles: Map[String, String] = Map(
    "q21_incremental_merge" ->
      """WITH ranked AS (
        |  SELECT user_id, event_id, event_type, value, ts,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
        |    COUNT(*) OVER (PARTITION BY user_id) AS n_changes
        |  FROM events)
        |SELECT user_id,
        |  event_id AS last_event_id,
        |  event_type AS last_event_type,
        |  value AS last_value,
        |  epoch_ms(ts) AS last_ts_ms,
        |  n_changes
        |FROM ranked WHERE rn = 1
        |ORDER BY user_id""".stripMargin
  )
}
