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

  /** The FULL three-branch MERGE grammar — [[upsert]] plus `WHEN NOT
    * MATCHED BY SOURCE` (Delta's extension, now in the Databricks /
    * Spark 4 MERGE surface), the branch that makes one statement a
    * full-state SYNCHRONIZATION: target rows whose key is ABSENT
    * from the source either get deleted
    * (`notMatchedBySourceDelete`, evaluated on TARGET columns — e.g.
    * "drop stale rows in the synced region only") or get column
    * overrides applied (`notMatchedBySourceSet`, e.g. flip an
    * `is_active` flag) — the deactivate-disappeared-records pattern
    * every dimension sync needs. Without a condition, delete-all
    * unmatched + upsert would degenerate to `SELECT source` — the
    * conditional scoping is the point: rows OUTSIDE the sync scope
    * pass through untouched. Still ONE key-shuffled full-outer join,
    * no second pass — the same cost as plain upsert at 100 TB.
    */
  def upsertFull(target: DataFrame, source: DataFrame, keys: Seq[String],
      deleteWhen: Option[org.apache.spark.sql.Column] = None,
      notMatchedBySourceDelete: Option[org.apache.spark.sql.Column] = None,
      notMatchedBySourceSet: Map[String, org.apache.spark.sql.Column] = Map.empty)
      : DataFrame = {
    require(keys.nonEmpty, "merge needs at least one key column")
    require(notMatchedBySourceSet.keySet.forall(target.columns.contains),
      "notMatchedBySourceSet names a column absent from the target")
    // resolve caller conditions against BARE columns before aliasing
    val srcFlagged = deleteWhen.fold(source.withColumn("__graft_del", lit(false)))(
      c => source.withColumn("__graft_del", coalesce(c, lit(false))))
    val tgtFlagged = notMatchedBySourceDelete.fold(
      target.withColumn("__graft_tdel", lit(false)))(
      c => target.withColumn("__graft_tdel", coalesce(c, lit(false))))
    val t = tgtFlagged.withColumns(notMatchedBySourceSet.map { case (k, v) =>
      s"__graft_set_$k" -> v
    }).as("t")
    val s = srcFlagged.as("s")
    val cond = keys.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _)
    val sPresent = col(s"s.${keys.head}").isNotNull
    val tPresent = col(s"t.${keys.head}").isNotNull
    val targetOnly = tPresent && !sPresent
    val cols = target.columns.toSeq.map { c =>
      val base = when(sPresent, col(s"s.$c")).otherwise(col(s"t.$c"))
      (if (notMatchedBySourceSet.contains(c))
        when(targetOnly, col(s"t.__graft_set_$c")).otherwise(base)
      else base).as(c)
    }
    t.join(s, cond, "full_outer")
      .filter(!(sPresent && col("s.__graft_del")) &&
        !(targetOnly && col("t.__graft_tdel")))
      .select(cols: _*)
  }

  /** Last-writer-wins CDC apply — the Iceberg
    * `WHEN MATCHED AND s.ts > t.ts THEN UPDATE` idiom
    * (reference docs/components/cdc.md: Debezium changelog upserts)
    * with SOFT-DELETE tombstones, so applying micro-batches is
    * ORDER-INSENSITIVE and IDEMPOTENT:
    *
    *  - both sides share the target schema: `keys ++ payload`, where
    *    payload includes `orderCols` (a lexicographic version vector,
    *    e.g. `(ts, event_id)`) and the boolean `deletedCol`;
    *  - on a key match the row with the GREATER `orderCols` tuple
    *    wins whole-row; ties keep the target (replaying a batch is a
    *    no-op);
    *  - a delete is just a payload row with `deletedCol = true` — the
    *    tombstone is RETAINED, so a stale pre-delete update arriving
    *    late loses the version race instead of resurrecting the key.
    *    Readers filter `!deletedCol`; actual removal is a compaction
    *    concern (`Snapshots.expireSnapshots`/`compactLatest`).
    *
    * `batch` must be pre-reduced to one row per key (`max_by` on the
    * same `orderCols` — a map-side-combinable aggregate). One
    * key-shuffled full-outer join per apply, no window, no ordering
    * requirement across applies — the shape that survives Kafka's
    * per-partition-only ordering at 100 TB.
    */
  def cdcApply(target: DataFrame, batch: DataFrame, keys: Seq[String],
      orderCols: Seq[String], deletedCol: String): DataFrame = {
    require(keys.nonEmpty && orderCols.nonEmpty, "cdcApply needs keys and orderCols")
    require(target.columns.contains(deletedCol), s"target lacks $deletedCol")
    val t = target.as("t")
    val s = batch.as("s")
    val cond = keys.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _)
    val sPresent = col(s"s.${keys.head}").isNotNull
    val tPresent = col(s"t.${keys.head}").isNotNull
    // lexicographic "source is strictly newer" over the version vector
    val srcNewer = orderCols.foldRight(lit(false)) { (c, tieBreak) =>
      (col(s"s.$c") > col(s"t.$c")) ||
        (col(s"s.$c") === col(s"t.$c") && tieBreak)
    }
    val takeSource = sPresent && (!tPresent || srcNewer)
    val cols = target.columns.toSeq.map { c =>
      when(takeSource, col(s"s.$c")).otherwise(col(s"t.$c")).as(c)
    }
    t.join(s, cond, "full_outer").select(cols: _*)
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

  /** dbt-snapshot (SCD type-2) incremental apply — the `dbt snapshot`
    * `check` strategy as one MERGE-shaped transform: a batch of
    * current-state rows lands on a type-2 dimension; rows whose
    * tracked columns changed get their current version CLOSED
    * (valid_to = effective date, is_current = false) and a new current
    * version inserted; brand-new keys insert a first version;
    * unchanged keys and already-closed history pass through untouched.
    *
    * `dim` must carry `keys ++ tracked ++ (valid_from DATE, valid_to
    * DATE, is_current BOOLEAN)`; `batch` carries `keys ++ tracked`.
    * Change detection is null-safe (`<=>` per tracked column).
    *
    * Scale shape: two key-shuffled joins of the CURRENT slice against
    * the batch (close + insert classification) — Catalyst reuses the
    * exchange across the two branches — plus a pass-through of closed
    * history; no window, no driver-side state. The same plan cost as
    * a storage-level MERGE at 100 TB.
    */
  def scd2Apply(dim: DataFrame, batch: DataFrame, keys: Seq[String],
      tracked: Seq[String], effective: org.apache.spark.sql.Column): DataFrame = {
    require(keys.nonEmpty && tracked.nonEmpty, "scd2Apply needs keys and tracked columns")
    val current = dim.filter(col("is_current"))
    val s = batch.as("s")
    def joinCond = keys.map(k => col(s"d.$k") === col(s"s.$k")).reduce(_ && _)
    val changedCond = tracked.map(c => !(col(s"d.$c") <=> col(s"s.$c"))).reduce(_ || _)
    val sPresent = col(s"s.${keys.head}").isNotNull
    val closedOrKept = current.as("d").join(s, joinCond, "left")
      .select(dim.columns.toSeq.map {
        case "valid_to" =>
          when(sPresent && changedCond, effective.cast("date"))
            .otherwise(col("d.valid_to")).as("valid_to")
        case "is_current" =>
          when(sPresent && changedCond, lit(false))
            .otherwise(col("d.is_current")).as("is_current")
        case other => col(s"d.$other").as(other)
      }: _*)
    val inserts = s.join(current.as("d"), joinCond, "left")
      .filter(col(s"d.${keys.head}").isNull || changedCond)
      .select((keys ++ tracked).map(c => col(s"s.$c").as(c)) ++ Seq(
        effective.cast("date").as("valid_from"),
        lit(null).cast("date").as("valid_to"),
        lit(true).as("is_current")): _*)
    dim.filter(!col("is_current"))
      .unionByName(closedOrKept)
      .unionByName(inserts)
  }

  /** q62: the snapshot apply end-to-end on `customer` — base dim =
    * all but the `% 11 = 3` keys (those arrive later as NEW keys);
    * the batch re-states every `% 7 = 0` key with a shifted balance
    * (→ close + re-insert) and every `% 5 = 0` key unchanged (→
    * no-op), exercising all four paths. Oracle reconstructs the same
    * final dimension set-wise.
    */
  def q62Scd2Apply(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer")
    val base = cust.filter(col("c_custkey") % 11 =!= 3).select(
      col("c_custkey").as("custkey"),
      col("c_mktsegment").as("segment"),
      col("c_acctbal").as("balance"))
      .withColumn("valid_from", lit("1995-01-01").cast("date"))
      .withColumn("valid_to", lit(null).cast("date"))
      .withColumn("is_current", lit(true))
    val batch = cust
      .filter(col("c_custkey") % 7 === 0 || col("c_custkey") % 5 === 0)
      .select(
        col("c_custkey").as("custkey"),
        col("c_mktsegment").as("segment"),
        when(col("c_custkey") % 7 === 0, col("c_acctbal") + 100.0)
          .otherwise(col("c_acctbal")).as("balance"))
    scd2Apply(base, batch, Seq("custkey"), Seq("segment", "balance"),
      lit("1996-06-01"))
      .orderBy(col("custkey"), col("valid_from"))
  }

  // ---- dbt `snapshot` materialization primitives (check strategy):
  // the snapshot TABLE carries the source columns plus dbt's four
  // metadata columns (dbt_scd_id, dbt_updated_at, dbt_valid_from,
  // dbt_valid_to); each run diffs the CURRENT source state against
  // the open rows — no source timestamp column required, which is
  // the whole point of check_cols vs the timestamp strategy ----

  private def scdId(keys: Seq[String],
      from: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    md5(concat_ws("|", keys.map(col) :+ from.cast("string"): _*))

  /** First `dbt snapshot` run: every source row opens at `ts` — or,
    * under the TIMESTAMP strategy (`updatedAt` set), at its own
    * updated-at value, dbt's exact first-run behavior (dbt_valid_from
    * = the source row's updated_at). `dbt_scd_id` = md5(keys |
    * valid_from) — dbt's surrogate for the (key, version) grain.
    */
  def snapshotFirst(source: DataFrame, keys: Seq[String],
      ts: java.sql.Timestamp, updatedAt: Option[String] = None): DataFrame = {
    require(keys.nonEmpty, "snapshot needs unique keys")
    require(keys.forall(source.columns.contains), "source must carry the keys")
    val from = updatedAt.fold(lit(ts).cast("timestamp"))(c =>
      col(c).cast("timestamp"))
    source
      .withColumn("dbt_scd_id", scdId(keys, from))
      .withColumn("dbt_updated_at", from)
      .withColumn("dbt_valid_from", from)
      .withColumn("dbt_valid_to", lit(null).cast("timestamp"))
  }

  /** Subsequent `dbt snapshot` run, as a MERGE delta: diff `source`
    * (the model's CURRENT output) against `snapshot`'s open rows on
    * `checkCols` (null-safe; empty = all non-key source columns —
    * dbt `check_cols='all'`) and return ONLY the rows the merge must
    * touch, in the snapshot table's schema:
    *
    *  - a changed key CLOSES its open row (`dbt_valid_to = ts`; same
    *    (keys, dbt_valid_from) grain, so the merge replaces in place)
    *    and OPENS a new version at `ts`;
    *  - a brand-new key opens its first version;
    *  - a key absent from `source` closes iff `invalidateHardDeletes`
    *    (dbt's flag of the same name) — otherwise its open row stays.
    *
    * Upsert the result with `keys :+ "dbt_valid_from"` — cost ∝ rows
    * changed, not table size (the dbt-MERGE cost profile): one
    * key-shuffled full-outer join of the OPEN slice against the
    * source, closed history never scanned past the validity filter.
    */
  def snapshotDelta(snapshot: DataFrame, source: DataFrame,
      keys: Seq[String], checkCols: Seq[String], ts: java.sql.Timestamp,
      invalidateHardDeletes: Boolean = false,
      updatedAt: Option[String] = None): DataFrame = {
    require(keys.nonEmpty, "snapshot needs unique keys")
    val tracked =
      if (updatedAt.isDefined) Nil
      else if (checkCols.nonEmpty) checkCols
      else source.columns.toSeq.filterNot(keys.contains)
    require(updatedAt.isDefined || tracked.nonEmpty,
      "snapshot: no columns to check")
    val runTs = lit(ts).cast("timestamp")
    // TIMESTAMP strategy: validity boundaries come from the source
    // row's own updated_at; CHECK strategy: from the run timestamp
    val from = updatedAt.fold(runTs)(c => col(s"s.$c").cast("timestamp"))
    val d = snapshot.filter(col("dbt_valid_to").isNull).as("d")
    val s = source.as("s")
    val cond = keys.map(k => col(s"d.$k") === col(s"s.$k")).reduce(_ && _)
    val sPresent = col(s"s.${keys.head}").isNotNull
    val dPresent = col(s"d.${keys.head}").isNotNull
    // timestamp strategy: "changed" = the source row is NEWER than
    // the open version (dbt compares updated_at > dbt_updated_at);
    // check strategy: any tracked column differs, null-safe
    val changed = updatedAt.fold(
      tracked.map(c => !(col(s"d.$c") <=> col(s"s.$c"))).reduce(_ || _))(c =>
      col(s"s.$c").cast("timestamp") > col("d.dbt_updated_at"))
    val joined = d.join(s, cond, "full_outer")
    val closes = joined
      .filter(dPresent && ((sPresent && changed) ||
        (!sPresent && lit(invalidateHardDeletes))))
      .select(snapshot.columns.toSeq.map {
        // a changed key closes at the NEW version's valid_from (per
        // row under the timestamp strategy); a hard delete closes at
        // the run timestamp (dbt's invalidate_hard_deletes behavior)
        case "dbt_valid_to" =>
          when(sPresent, from).otherwise(runTs).as("dbt_valid_to")
        case c => col(s"d.$c").as(c)
      }: _*)
    val opens = joined
      .filter(sPresent && (!dPresent || changed))
      .select(source.columns.toSeq.map(c => col(s"s.$c").as(c)) ++ Seq(
        scdId(keys.map(k => s"s.$k"), from).as("dbt_scd_id"),
        from.as("dbt_updated_at"),
        from.as("dbt_valid_from"),
        lit(null).cast("timestamp").as("dbt_valid_to")): _*)
    closes.unionByName(opens)
  }

  /** SCHEMA-EVOLVING upsert — MERGE with `mergeSchema` semantics
    * (Iceberg/Delta's auto schema evolution on write: the reference's
    * CDC tables gain columns as sources evolve, docs/components/
    * iceberg.md schema-evolution surface): the source batch may CARRY
    * NEW columns (appended to the output schema; pre-existing target
    * rows read NULL there) and may LACK target columns (matched rows
    * KEEP the target value — `UPDATE SET *` only sets source columns;
    * inserted rows read NULL). Column presence is settled at PLAN
    * time, so this stays one full-outer shuffle with per-column
    * `when()` projection — no per-row schema dispatch.
    */
  def upsertEvolve(target: DataFrame, source: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "merge needs at least one key column")
    require(keys.forall(source.columns.contains), "source must carry the merge keys")
    val tCols = target.columns.toSeq
    val sCols = source.columns.toSeq
    val all = tCols ++ sCols.filterNot(tCols.contains)
    val t = target.as("t")
    val s = source.as("s")
    val cond = keys.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _)
    val sPresent = col(s"s.${keys.head}").isNotNull
    def typed(c: String) =
      sCols.find(_ == c).map(source.schema(_).dataType)
        .orElse(tCols.find(_ == c).map(target.schema(_).dataType)).get
    val cols = all.map { c =>
      val hasS = sCols.contains(c)
      val hasT = tCols.contains(c)
      val fromS = if (hasS) col(s"s.$c") else col(s"t.$c")   // UPDATE SET * keeps target-only cols
      val fromT = if (hasT) col(s"t.$c") else lit(null).cast(typed(c))
      when(sPresent, fromS).otherwise(fromT).as(c)
    }
    t.join(s, cond, "full_outer").select(cols: _*)
  }

  /** q82: schema evolution through MERGE, end-to-end on `customer`:
    * the landed dim has (key, name, acctbal); the incoming batch
    * restates keys ≥ 600 with shifted balances AND a NEW `c_tier`
    * column. After the evolving merge: keys < 600 keep their row with
    * NULL tier, 600–799 update in place and gain a tier, ≥ 800
    * insert fully populated — the oracle rebuilds the same final
    * table from raw data.
    */
  def q82EvolvingMerge(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer")
    val target = cust.filter(col("c_custkey") < 800)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    val source = cust.filter(col("c_custkey") >= 600)
      .select(col("c_custkey"), col("c_name"),
        (col("c_acctbal") + 100.0).as("c_acctbal"),
        when(col("c_acctbal") >= 2000.0, lit("gold")).otherwise(lit("std"))
          .as("c_tier"))
    upsertEvolve(target, source, Seq("c_custkey"))
      .orderBy(col("c_custkey"))
  }

  /** q98: full-grammar MERGE as a scoped dimension SYNC — the
    * deactivate-disappeared-records pattern: the synced scope is the
    * BUILDING segment; the source restates keys 300–1200 of that
    * scope with shifted balances. Matched rows update, new keys
    * insert, and IN-SCOPE target rows that disappeared from the
    * source (BUILDING, key < 300) are PURGED if their balance is
    * negative (`WHEN NOT MATCHED BY SOURCE AND cond THEN DELETE`)
    * and flagged inactive otherwise (`... THEN UPDATE SET`, the
    * condition folded into the SET expression) — while every
    * out-of-scope row passes through untouched, which is exactly
    * what separates this from a blind overwrite. Oracle rebuilds
    * the final state set-wise by key range and segment.
    */
  def q98MergeSync(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer").select(
      col("c_custkey").as("k"),
      col("c_mktsegment").as("segment"),
      col("c_acctbal").as("balance"))
    val target = cust.filter(col("k") <= 900).withColumn("is_active", lit(true))
    val source = cust
      .filter(col("k").between(300, 1200) && col("segment") === "BUILDING")
      .withColumn("balance", col("balance") + 50.0)
      .withColumn("is_active", lit(true))
    upsertFull(target, source, Seq("k"),
      notMatchedBySourceDelete =
        Some(col("segment") === "BUILDING" && col("balance") < 0),
      notMatchedBySourceSet = Map("is_active" ->
        when(col("segment") === "BUILDING", lit(false))
          .otherwise(col("is_active"))))
      .orderBy(col("k"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q21_incremental_merge" -> (q21IncrementalMerge _),
    "q62_scd2_apply" -> (q62Scd2Apply _),
    "q82_evolving_merge" -> (q82EvolvingMerge _),
    "q98_merge_sync" -> (q98MergeSync _)
  )

  // The merge of stale+recomputed snapshots must equal the full
  // snapshot — same oracle as q10_cdc_latest_snapshot.
  val oracles: Map[String, String] = Map(
    // q98: final sync state by key range — in-scope (BUILDING) rows
    // >= 300 take the restated balance, < 300 deactivate or purge;
    // out-of-scope rows pass through
    "q98_merge_sync" ->
      """WITH c AS (
        |  SELECT c_custkey AS k, c_mktsegment AS segment,
        |    c_acctbal AS balance
        |  FROM customer)
        |SELECT k, segment,
        |  CASE WHEN k >= 300 AND segment = 'BUILDING'
        |       THEN balance + 50.0 ELSE balance END AS balance,
        |  NOT (segment = 'BUILDING' AND k < 300) AS is_active
        |FROM c
        |WHERE (k <= 900
        |       AND NOT (k < 300 AND segment = 'BUILDING' AND balance < 0))
        |   OR (k BETWEEN 901 AND 1200 AND segment = 'BUILDING')
        |ORDER BY k""".stripMargin,
    // q82: the evolved table rebuilt set-wise from raw customer —
    // update/keep/insert paths plus the NULL-backfilled new column
    "q82_evolving_merge" ->
      """WITH tgt AS (
        |  SELECT c_custkey, c_name, c_acctbal FROM customer
        |  WHERE c_custkey < 800),
        |src AS (
        |  SELECT c_custkey, c_name, c_acctbal + 100.0 AS c_acctbal,
        |    CASE WHEN c_acctbal >= 2000.0 THEN 'gold' ELSE 'std' END AS c_tier
        |  FROM customer WHERE c_custkey >= 600)
        |SELECT COALESCE(s.c_custkey, t.c_custkey) AS c_custkey,
        |  CASE WHEN s.c_custkey IS NOT NULL THEN s.c_name ELSE t.c_name END AS c_name,
        |  CASE WHEN s.c_custkey IS NOT NULL THEN s.c_acctbal ELSE t.c_acctbal END AS c_acctbal,
        |  CASE WHEN s.c_custkey IS NOT NULL THEN s.c_tier ELSE NULL END AS c_tier
        |FROM tgt t FULL OUTER JOIN src s ON t.c_custkey = s.c_custkey
        |ORDER BY c_custkey""".stripMargin,
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
        |ORDER BY user_id""".stripMargin,
    "q62_scd2_apply" ->
      """WITH base AS (
        |  SELECT c_custkey AS custkey, c_mktsegment AS segment,
        |    c_acctbal AS balance
        |  FROM customer WHERE c_custkey % 11 <> 3),
        |batch AS (
        |  SELECT c_custkey AS custkey, c_mktsegment AS segment,
        |    CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0
        |         ELSE c_acctbal END AS balance
        |  FROM customer WHERE c_custkey % 7 = 0 OR c_custkey % 5 = 0),
        |changed AS (
        |  SELECT b.custkey FROM base b JOIN batch s USING (custkey)
        |  WHERE s.segment IS DISTINCT FROM b.segment
        |     OR s.balance IS DISTINCT FROM b.balance),
        |closed AS (
        |  SELECT custkey, segment, balance,
        |    DATE '1995-01-01' AS valid_from,
        |    DATE '1996-06-01' AS valid_to, FALSE AS is_current
        |  FROM base WHERE custkey IN (SELECT custkey FROM changed)),
        |kept AS (
        |  SELECT custkey, segment, balance,
        |    DATE '1995-01-01' AS valid_from,
        |    CAST(NULL AS DATE) AS valid_to, TRUE AS is_current
        |  FROM base WHERE custkey NOT IN (SELECT custkey FROM changed)),
        |new_rows AS (
        |  SELECT s.custkey, s.segment, s.balance,
        |    DATE '1996-06-01' AS valid_from,
        |    CAST(NULL AS DATE) AS valid_to, TRUE AS is_current
        |  FROM batch s
        |  WHERE s.custkey IN (SELECT custkey FROM changed)
        |     OR s.custkey NOT IN (SELECT custkey FROM base))
        |SELECT * FROM (
        |  SELECT * FROM closed
        |  UNION ALL SELECT * FROM kept
        |  UNION ALL SELECT * FROM new_rows)
        |ORDER BY custkey, valid_from""".stripMargin
  )
}
