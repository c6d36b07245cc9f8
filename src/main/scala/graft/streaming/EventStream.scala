package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import graft.functions.Exact.dsum

/** Raw event row as streamed (ts = parquet TIMESTAMP(NANOS) as long). */
case class RawEvent(event_id: Long, ts: Long, user_id: Long,
  event_type: String, value: Double, props: String)

/** Per-user running aggregate carried in streaming state. */
case class UserAgg(user_id: Long, n_events: Long, total_value: Double,
  last_event_type: String, last_ts_ms: Long)

/** st28 input row (ts = micros since epoch). */
case class EvTws(user_id: Long, event_type: String, value: Double, ts: Long)

/** st28 per-user snapshot emitted after each batch that touched the
  * key (n_events strictly grows, so the final state is the max-n row).
  */
case class UserTws(user_id: Long, n_events: Long, n_types: Long,
  types_sig: String, total_value: Double, min_ts_ms: Long, max_ts_ms: Long)

/** st28: per-user statistics in Spark 4's `transformWithState` typed
  * state — ValueState counters (count, exact scale-4 unscaled sum,
  * min/max event time) plus a MapState per-type histogram: the
  * composable-state-variables API that replaces hand-rolled
  * [GroupState] blobs, backed by the RocksDB state store. All
  * accumulators are ORDER-INDEPENDENT (exact integer adds, min/max),
  * so the result is batch-structure invariant by construction.
  */
class UserStatsProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, EvTws, UserTws] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig, MapState, ValueState}
  import org.apache.spark.sql.Encoders

  @transient private var nState: ValueState[Long] = _
  @transient private var sumState: ValueState[Long] = _ // unscaled, scale 4
  @transient private var minTs: ValueState[Long] = _
  @transient private var maxTs: ValueState[Long] = _
  @transient private var types: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    nState = getHandle.getValueState[Long]("n", Encoders.scalaLong, TTLConfig.NONE)
    sumState = getHandle.getValueState[Long]("sum4", Encoders.scalaLong, TTLConfig.NONE)
    minTs = getHandle.getValueState[Long]("minTs", Encoders.scalaLong, TTLConfig.NONE)
    maxTs = getHandle.getValueState[Long]("maxTs", Encoders.scalaLong, TTLConfig.NONE)
    types = getHandle.getMapState[String, Long]("types",
      Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[EvTws],
      timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[UserTws] = {
    import java.math.{BigDecimal => JBD, RoundingMode}
    var n = if (nState.exists()) nState.get() else 0L
    var sum4 = if (sumState.exists()) sumState.get() else 0L
    var lo = if (minTs.exists()) minTs.get() else Long.MaxValue
    var hi = if (maxTs.exists()) maxTs.get() else Long.MinValue
    rows.foreach { e =>
      n += 1L
      sum4 += JBD.valueOf(e.value).setScale(4, RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
      if (e.ts < lo) lo = e.ts
      if (e.ts > hi) hi = e.ts
      val c = if (types.containsKey(e.event_type)) types.getValue(e.event_type) else 0L
      types.updateValue(e.event_type, c + 1L)
    }
    nState.update(n); sumState.update(sum4); minTs.update(lo); maxTs.update(hi)
    val hist = types.iterator().toSeq.sortBy(_._1)
    Iterator.single(UserTws(key, n, hist.size.toLong,
      hist.map { case (t, c) => s"$t:$c" }.mkString(","),
      new JBD(java.math.BigInteger.valueOf(sum4), 4).doubleValue,
      lo / 1000L, hi / 1000L))
  }
}

/** Structured Streaming surface — the engine-side equivalent of the
  * reference's Debezium→Kafka ingestion path (docs/components/cdc.md):
  * event streams land as files and are aggregated with event-time
  * windows + watermark. Locally we drive the stream synchronously from
  * the events parquet via a memory sink; on a cluster the same plan
  * runs against a Kafka/file source with a real trigger.
  */
object EventStream {

  /** Optional session conf: shuffle width for the STREAMING stateful
    * stages only. Stream-stream joins and streaming aggs pay per-
    * partition state-store fixed costs (4 stores per partition for a
    * join) every micro-batch, so the right width tracks per-TRIGGER
    * volume, not the session-wide `spark.sql.shuffle.partitions` that
    * is sized for full-table batch shuffles. Unset → inherit the
    * session value (a cluster driving high-volume triggers wants them
    * equal; a local drain of small batches wants single digits —
    * measured at sf0.1: 32 → 4 partitions cuts st05 from 5.6 s to
    * ~2 s with identical output).
    */
  val STREAM_SHUFFLE_KEY = "spark.graft.streaming.shufflePartitions"

  /** A CLONED session carrying the streaming tuning: the streaming
    * shuffle width, plus no-data micro-batches skipped (the extra
    * empty batch exists to advance the watermark and evict state on a
    * LONG-RUNNING query; for a drain-everything-then-stop run its
    * state maintenance is pure overhead — outputs are identical, the
    * oracle gate checks that). Each stXX builds its WHOLE pipeline on
    * the clone, so the overrides are scoped to that pipeline's plans:
    * nothing is ever set/restored on the shared session, and a query
    * planned concurrently on it can never be planned at the stream
    * width. With [[STREAM_SHUFFLE_KEY]] unset the clone inherits the
    * session width — the cluster configuration — so the sink-side
    * rollups plan identically there.
    */
  private def streamSession(spark: SparkSession,
      noDataBatches: Boolean = false): SparkSession = {
    val conf = spark.conf
    org.apache.spark.sql.GraftShims.cloneWithConf(spark,
      "spark.sql.shuffle.partitions" ->
        conf.get(STREAM_SHUFFLE_KEY, conf.get("spark.sql.shuffle.partitions")),
      // no-data drain batches are wasted triggers for the inner-agg
      // streams (the st05 r4 perf fix) — but OUTER-join null emission
      // and state eviction happen only in a watermark-advancing batch,
      // so st11 opts back in
      "spark.sql.streaming.noDataMicroBatches.enabled" -> noDataBatches.toString)
  }

  /** Schema for SELF-LANDED event shards (st08 writes ts as long
    * micros before streaming it back). The testdata file's own ts
    * type varies by generator version — use [[eventsStream]] for
    * streams over the testdata directory itself.
    */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** The raw on-disk schema of `<dir>/events.parquet`, probed from the
    * footer: `ts` is TIMESTAMP(NANOS)-as-long under older generator
    * output, TIMESTAMP(MICROS)/NTZ under newer. A file-source stream
    * must declare the files' actual schema, so probe before streaming.
    */
  def rawEventsSchema(s: SparkSession, dir: String): StructType = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/events.parquet").schema
  }

  /** File-source stream over the testdata events table with `ts`
    * normalized to a microsecond TimestampType regardless of the
    * file's physical encoding (all graft sessions run UTC, so the
    * NTZ→LTZ cast is value-preserving). Same normalization as the
    * batch loader [[graft.Tables]].
    */
  def eventsStream(s: SparkSession, dir: String): DataFrame = {
    val raw = rawEventsSchema(s, dir)
    val stream = s.readStream
      .schema(raw)
      .option("pathGlobFilter", "events.parquet")  // file source needs a dir
      .parquet(dir)
    raw("ts").dataType match {
      case LongType => stream.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => stream.withColumn("ts", col("ts").cast("timestamp"))
      case _ => stream
    }
  }

  /** st01: event-time windowed aggregation (6 h tumbling, 1 h
    * watermark) run through a real StreamingQuery.
    */
  def st01StreamWindow(spark: SparkSession, dir: String): DataFrame = {
    val s = streamSession(spark)
    val stream = eventsStream(s, dir)
      .withWatermark("ts", "1 hour")
    val agg = stream
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value"), 4).as("total_value"))
    s.catalog.dropTempView("st01_out")
    locally {
      val q = agg.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName("st01_out")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    s.table("st01_out")
      .select(
        unix_millis(col("window.start")).as("window_start_ms"),
        col("event_type"), col("n_events"), col("total_value"))
      .orderBy(col("window_start_ms"), col("event_type"))
  }

  /** st02: custom streaming state via flatMapGroupsWithState — the
    * KeyValueGroupedDataset stateful path (per-user running count /
    * exact decimal total / latest event). Decimal accumulation uses
    * `BigDecimal.valueOf(_).setScale(4, HALF_UP)`, mirroring Spark's
    * own double→DECIMAL(18,4) cast so the oracle matches bit-exact.
    */
  /** Event-time state retention for st02: a user's state is evicted
    * once the watermark passes their last activity + this many ms of
    * event time; a later event for the key restarts its aggregate
    * from zero. On a real deployment this is what keeps per-key state
    * reclaimable (state ∝ ACTIVE users, not the all-time key
    * universe).
    */
  val St02RetentionMs: Long = 30L * 24 * 3600 * 1000

  /** The st02 stateful core over an already-watermarked event stream
    * — separated so the spec can drive it batch-by-batch from a
    * MemoryStream and observe a key's state actually expire.
    */
  private[graft] def statefulCounts(
      events: org.apache.spark.sql.Dataset[RawEvent]): org.apache.spark.sql.Dataset[UserAgg] = {
    import events.sparkSession.implicits._
    val updateFn = (uid: Long, it: Iterator[RawEvent], state: GroupState[UserAgg]) => {
      import java.math.{BigDecimal => JBD, RoundingMode}
      if (state.hasTimedOut) {
        // watermark passed last activity + retention: reclaim the
        // state. Nothing is emitted — every update was already emitted
        // append-mode, so expiry changes state SIZE, never output; a
        // later event for this key re-aggregates from zero.
        state.remove()
        Iterator.empty
      } else {
      val prior = state.getOption
      // ONE streaming pass over the batch slice — no buffering/sorting
      // of the key's events (a hot key with millions of events per
      // micro-batch must not materialize in executor memory). The
      // decimal sum is order-independent (exact addition); "last" is a
      // running max over (ts, event_id), equal to what sorting found.
      var n = prior.map(_.n_events).getOrElse(0L)
      var sum = prior.map(p => JBD.valueOf(p.total_value).setScale(4, RoundingMode.HALF_UP))
        .getOrElse(JBD.ZERO.setScale(4))
      // sawAny, NOT bestType==null, decides whether this batch had
      // events: an event with a NULL event_type must still win the
      // running max and propagate its (null) type + timestamp
      var sawAny = false
      var bestTs = Long.MinValue
      var bestId = Long.MinValue
      var bestType: String = null
      it.foreach { e =>
        n += 1L
        sum = sum.add(JBD.valueOf(e.value).setScale(4, RoundingMode.HALF_UP))
        if (!sawAny || e.ts > bestTs || (e.ts == bestTs && e.event_id > bestId)) {
          sawAny = true; bestTs = e.ts; bestId = e.event_id; bestType = e.event_type
        }
      }
      val agg = UserAgg(
        uid,
        n,
        sum.doubleValue,
        if (sawAny) bestType else prior.map(_.last_event_type).orNull,
        if (sawAny) bestTs / 1000000L
        else prior.map(_.last_ts_ms).getOrElse(0L))
      state.update(agg)
      // schedule eviction strictly beyond the current watermark (a
      // timeout at-or-before it would be rejected); event-time based,
      // so retention tracks the DATA's clock, not the wall clock
      state.setTimeoutTimestamp(
        math.max(state.getCurrentWatermarkMs() + 1,
          agg.last_ts_ms + St02RetentionMs))
      Iterator.single(agg)
      }
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(updateFn)
  }

  def st02StatefulCounts(spark: SparkSession, dir: String): DataFrame = {
    val s = streamSession(spark)
    import s.implicits._
    // the watermark column exists only to drive EventTimeTimeout state
    // expiry; `as[RawEvent]` drops it at the typed boundary. RawEvent
    // carries ts as NANOS-since-epoch long (the state math divides by
    // 1e6 for ms), derived from the normalized timestamp.
    val stream = eventsStream(s, dir)
      .withColumn("ets", col("ts"))
      .withColumn("ts", unix_micros(col("ets")) * lit(1000L))
      .withWatermark("ets", "1 hour")
      .as[RawEvent]

    val out = statefulCounts(stream)

    s.catalog.dropTempView("st02_out")
    locally {
      val q = out.writeStream
        .outputMode("append")
        .format("memory")
        .queryName("st02_out")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    s.table("st02_out").orderBy(col("user_id"))
  }

  /** st03: stream-static join — the streaming events enriched against
    * the static customer dimension (broadcast per micro-batch), then
    * windowed revenue per market segment. The Kafka→dim-enrich→agg
    * shape of the reference's CDC consumers.
    */
  def st03StreamStaticJoin(spark: SparkSession, dir: String): DataFrame = {
    val s = streamSession(spark)
    val customers = graft.Tables(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val stream = eventsStream(s, dir)
    val agg = stream
      .join(broadcast(customers), col("user_id") === col("c_custkey"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"), col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value"), 4).as("total_value"))
    s.catalog.dropTempView("st03_out")
    locally {
      val q = agg.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName("st03_out")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    s.table("st03_out")
      .select(
        unix_millis(col("window.start")).as("window_start_ms"),
        col("c_mktsegment"), col("n_events"), col("total_value"))
      .orderBy(col("window_start_ms"), col("c_mktsegment"))
  }

  /** st04: streaming exact dedup — the at-least-once ingestion guard.
    * The source is doubled in-plan (simulating redelivery), then
    * `dropDuplicatesWithinWatermark` restores exactly-once rows with
    * WATERMARK-BOUNDED state (keys age out after 1 h of event time —
    * the property that keeps dedup state finite on an unbounded
    * stream), then a windowless per-type aggregate. Oracle = batch
    * counts over the original (un-doubled) events.
    */
  def st04StreamDedup(spark: SparkSession, dir: String): DataFrame = {
    val s = streamSession(spark)
    val stream = eventsStream(s, dir)
      .withColumn("dup", explode(array(lit(1), lit(2))))  // at-least-once: every event twice
      .drop("dup")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    val agg = stream
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value"), 4).as("total_value"))
    s.catalog.dropTempView("st04_out")
    locally {
      val q = agg.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName("st04_out")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    s.table("st04_out").orderBy(col("event_type"))
  }

  /** st05: stream-stream INTERVAL join — purchases matched to the
    * same user's views from the preceding 6 hours, both sides unbounded
    * streams. The event-time range condition plus the two watermarks
    * is what lets Spark BOUND the join state (each side's buffer ages
    * out once the other side's watermark passes the interval) — the
    * property that separates a runnable 100 TB stream-stream join
    * from one whose state grows forever. Pairs are emitted append-
    * mode; the per-user rollup happens batch-side on the sink.
    */
  def st05StreamStreamJoin(spark: SparkSession, dir: String): DataFrame = {
    val s = streamSession(spark)
    // ONE source, two filtered branches (a stream self-join): the
    // events scan runs once per micro-batch instead of once per side
    val src = eventsStream(s, dir)
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("value").as("p_value"))
      .withWatermark("p_ts", "1 hour")
    val views = src.filter(col("event_type") === "view")
      .select(col("event_id").as("v_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", "1 hour")
    val pairs = purchases.join(views,
      col("p_user") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 6 HOURS") &&
        col("v_ts") <= col("p_ts"))
    s.catalog.dropTempView("st05_out")
    locally {
      val q = pairs.writeStream
        .outputMode("append")
        .format("memory")
        .queryName("st05_out")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    s.table("st05_out")
      .groupBy(col("p_user").as("user_id"))
      .agg(
        count(lit(1)).as("n_pairs"),
        countDistinct(col("p_id")).as("n_purchases_with_view"),
        countDistinct(col("v_id")).as("n_distinct_views"))
      .orderBy(col("user_id"))
  }

  /** st06: Kafka/Debezium-envelope ingestion — the reference's actual
    * wire format (docs/components/cdc.md: Debezium posts each change
    * as a key/value envelope on a Kafka topic; consumers `unwrap` it).
    * No broker exists in this sandbox, so the topic is materialized as
    * a file-source stream with Kafka's exact record schema (key binary,
    * value binary, topic, partition, offset, timestamp) — the
    * STREAMING side (envelope decode: value → JSON → op/before/after
    * flatten to typed rows) is identical to what would run off
    * `format("kafka")`; only the source format line differs. The
    * flattened changelog then goes through the q16 apply semantic
    * (latest-op-wins per key, tombstones drop the row), so the oracle
    * proves wire-encode → stream-decode → apply loses nothing vs
    * applying the raw table directly.
    */
  def st06KafkaCdc(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val s = streamSession(spark)
    // 1. land the changelog as Kafka-wire records (what the topic holds)
    val ev = graft.Tables(s, dir, "events")
      .withColumn("op",
        when(col("event_type") === "signup", "c")
          .when(col("event_type") === "error", "d")
          .otherwise("u"))
      .withColumn("ts_us", unix_micros(col("ts")))
    val row = struct(col("user_id"), col("event_id"), col("value"), col("ts_us"))
    val envelope = to_json(struct(
      col("op"), col("ts_us"),
      when(col("op") =!= "d", row).as("after"),   // null for tombstones
      when(col("op") === "d", row).as("before")))
    val topicDump = ev.select(
      col("user_id").cast("string").cast("binary").as("key"),
      envelope.cast("binary").as("value"),
      lit("graft.cdc.events").as("topic"),
      pmod(col("user_id"), lit(8)).cast("int").as("partition"),
      col("event_id").as("offset"),
      col("ts").as("timestamp"))
    val path = graft.TempDirs.scratch("graft-topic")
    // one file per topic partition — the actual Kafka landing shape
    graft.BenchPhase.land {
      topicDump.repartition(8).write.mode("overwrite").parquet(path)
    }

    // 2. STREAM the topic and decode the envelope into typed rows
    val kafkaSchema = StructType(Seq(
      StructField("key", BinaryType), StructField("value", BinaryType),
      StructField("topic", StringType), StructField("partition", IntegerType),
      StructField("offset", LongType), StructField("timestamp", TimestampType)))
    val rowSchema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_id", LongType),
      StructField("value", DoubleType), StructField("ts_us", LongType)))
    val envSchema = StructType(Seq(
      StructField("op", StringType), StructField("ts_us", LongType),
      StructField("after", rowSchema), StructField("before", rowSchema)))
    val flat = s.readStream.schema(kafkaSchema).parquet(path)
      .select(from_json(col("value").cast("string"), envSchema).as("env"))
      .select(
        col("env.op").as("op"),
        coalesce(col("env.after.user_id"), col("env.before.user_id")).as("user_id"),
        coalesce(col("env.after.event_id"), col("env.before.event_id")).as("event_id"),
        col("env.after.value").as("value"),
        col("env.ts_us").as("ts_us"))
    s.catalog.dropTempView("st06_out")
    locally {
      val q = flat.writeStream
        .outputMode("append")
        .format("memory")
        .queryName("st06_out")
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    // 3. apply the decoded changelog: latest-op-wins, tombstones drop
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
    val wAll = Window.partitionBy(col("user_id"))
    s.table("st06_out")
      .withColumn("rn", row_number().over(w))
      .withColumn("n_ops", count(lit(1)).over(wAll))
      .withColumn("n_deletes", count(when(col("op") === "d", 1)).over(wAll))
      .filter(col("rn") === 1 && col("op") =!= "d")
      .select(
        col("user_id"),
        col("op").as("last_op"),
        col("value").as("last_value"),
        expr("ts_us div 1000").as("last_ts_ms"),
        col("n_ops"), col("n_deletes"))
      .orderBy(col("user_id"))
  }

  /** st07: streaming sessionization via `session_window` — the
    * gap-based event-time window (30 min inactivity closes a session),
    * the streaming counterpart of q08's batch sessionize. Sessions
    * merge in state as events arrive (Spark's MergingSessions
    * aggregation). This local drain runs COMPLETE mode into the
    * memory sink (deterministic full output regardless of batch
    * count); a production deployment runs the same plan in
    * append/update mode, where the watermark finalizes closed
    * sessions and EVICTS their state — state ∝ open sessions, not
    * history. The oracle recomputes the same sessions from the raw
    * table with the lag/flag/cumsum composition (new session at gap
    * ≥ 30 min, session end = last event + gap — session_window's
    * exact semantics).
    */
  def st07SessionWindow(spark: SparkSession, dir: String): DataFrame = {
    val s = streamSession(spark)
    val stream = eventsStream(s, dir)
      .withWatermark("ts", "1 hour")
    val agg = stream
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value"), 4).as("total_value"))
    s.catalog.dropTempView("st07_out")
    locally {
      val q = agg.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName("st07_out")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    s.table("st07_out")
      .select(
        col("user_id"),
        unix_millis(col("session_window.start")).as("session_start_ms"),
        unix_millis(col("session_window.end")).as("session_end_ms"),
        col("n_events"), col("total_value"))
      .orderBy(col("user_id"), col("session_start_ms"))
  }

  /** st08: streaming → versioned-table ingestion end-to-end, multi
    * batch — the Kafka→Iceberg sink path under the oracle gate: the
    * event table lands as a 16-shard copy (the micro-batch litter
    * shape), streams back 4 files per trigger, and every micro-batch
    * commits as one compacted snapshot version via [[SnapshotSink]]
    * (idempotent `batch=<id>` tags — a replayed batch can never
    * double-commit). The gated result unions ALL committed versions
    * (the changelog a downstream incremental consumer replays) and
    * rolls it up per event type; the oracle computes the same rollup
    * from the raw table, proving the multi-batch wire path landed
    * every event exactly once.
    */
  def st08StreamIngest(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val s = streamSession(spark)
    val src = graft.TempDirs.scratch("graft-st08-src")
    // land ts as long micros: the sharded copy must round-trip through
    // the long-typed streaming schema (eventsSchema) unchanged
    graft.BenchPhase.land {
      graft.Tables(spark, dir, "events")
        .withColumn("ts", unix_micros(col("ts")))
        .repartition(16)
        .write.mode("overwrite").parquet(src)
    }
    val t = s"${graft.TempDirs.scratch("graft-st08-tbl")}/events_ingest"
    val stream = s.readStream
      .schema(eventsSchema)
      .option("maxFilesPerTrigger", "4")
      .parquet(src)
    val q = SnapshotSink.ingest(stream, t, filesPerBatch = 1)
    try q.processAllAvailable() finally q.stop()
    val all = graft.sources.Snapshots.versions(t)
      .map(v => graft.sources.Snapshots.read(spark, t, v))
      .reduce(_ unionAll _)
    all.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value"), 4).as("total_value"))
      .orderBy(col("event_type"))
  }

  /** st09: streaming CDC upsert into the versioned store — the full
    * reference flow (docs/components/cdc.md: Debezium → Kafka → Spark
    * → Iceberg MERGE) end-to-end: the changelog lands as Kafka-wire
    * envelopes sharded RANDOMLY across 16 topic files (Kafka orders
    * per partition only — cross-key arrival order is arbitrary, and
    * this gate proves the pipeline survives it), streams back 4 files
    * per trigger, and every micro-batch MERGEs into the snapshot
    * store via [[graft.operators.Merge.cdcApply]] — last-writer-wins
    * on `(ts_us, event_id)` with soft-delete tombstones, so the final
    * state is independent of batch boundaries and arrival order.
    * Batch-id commit tags make a replayed batch a no-op (the
    * exactly-once contract of foreachBatch + idempotent sink).
    *
    * The gated result is the LATEST snapshot with tombstones filtered
    * — the live-rows view a downstream consumer reads — plus the
    * version count proving the multi-batch path (seed + 4 merges).
    * The oracle recomputes the same latest-wins state from the raw
    * table in one window.
    */
  def st09CdcMerge(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val s = streamSession(spark)
    // 1. the topic: st06's Debezium envelope, randomly sharded
    val ev = graft.Tables(s, dir, "events")
      .withColumn("op",
        when(col("event_type") === "signup", "c")
          .when(col("event_type") === "error", "d")
          .otherwise("u"))
      .withColumn("ts_us", unix_micros(col("ts")))
    val row = struct(col("user_id"), col("event_id"), col("value"), col("ts_us"))
    val envelope = to_json(struct(
      col("op"), col("ts_us"),
      when(col("op") =!= "d", row).as("after"),
      when(col("op") === "d", row).as("before")))
    val topic = graft.TempDirs.scratch("graft-st09-topic")
    graft.BenchPhase.land {
      ev.select(envelope.cast("binary").as("value"))
        .repartition(16).write.mode("overwrite").parquet(topic)
    }

    // 2. seed the target table (empty v0) with the upsert-state schema
    val stateSchema = StructType(Seq(
      StructField("user_id", LongType),
      StructField("ts_us", LongType),
      StructField("last_event_id", LongType),
      StructField("last_op", StringType),
      StructField("last_value", DoubleType),
      StructField("deleted", BooleanType)))
    val table = s"${graft.TempDirs.scratch("graft-st09-tbl")}/users_upsert"
    graft.sources.Snapshots.commit(
      s.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        stateSchema), table)

    // 3. stream-decode the envelope; MERGE each micro-batch
    val rowSchema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_id", LongType),
      StructField("value", DoubleType), StructField("ts_us", LongType)))
    val envSchema = StructType(Seq(
      StructField("op", StringType), StructField("ts_us", LongType),
      StructField("after", rowSchema), StructField("before", rowSchema)))
    val flat = s.readStream
      .schema(StructType(Seq(StructField("value", BinaryType))))
      .option("maxFilesPerTrigger", "4")
      .parquet(topic)
      .select(from_json(col("value").cast("string"), envSchema).as("env"))
      .select(
        coalesce(col("env.after.user_id"), col("env.before.user_id")).as("user_id"),
        col("env.ts_us").as("ts_us"),
        coalesce(col("env.after.event_id"), col("env.before.event_id")).as("last_event_id"),
        col("env.op").as("last_op"),
        col("env.after.value").as("last_value"),
        (col("env.op") === "d").as("deleted"))
    val q = flat.writeStream
      .option("checkpointLocation", graft.TempDirs.scratch("graft-st09-ckpt"))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        // pre-reduce to one row per key (map-side combinable), then LWW-merge
        val reduced = batch.groupBy(col("user_id"))
          .agg(max_by(
            struct(batch.columns.map(col): _*),
            struct(col("ts_us"), col("last_event_id"))).as("w"))
          .select(col("w.*"))
        graft.sources.Snapshots.mergeWith(
          batch.sparkSession, table, reduced, tag = Some(s"cdc-batch=$id"))(
          graft.operators.Merge.cdcApply(_, _, Seq("user_id"),
            Seq("ts_us", "last_event_id"), "deleted"))
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    // 4. the live view + the wire-path proof (seed + 4 merge commits)
    val nVersions = graft.sources.Snapshots.versions(table).size
    graft.sources.Snapshots.read(spark, table)
      .filter(!col("deleted"))
      .select(
        col("user_id"), col("last_op"), col("last_value"),
        expr("ts_us div 1000").as("last_ts_ms"),
        lit(nVersions).as("n_versions"))
      .orderBy(col("user_id"))
  }

  /** st10: streaming MATERIALIZED VIEW — a storage-backed rollup kept
    * fresh by additive IVM ([[graft.operators.Ivm.maintain]]) from
    * each micro-batch, instead of a state-store streaming aggregation:
    * maintained state lives in the versioned table (restart-safe,
    * queryable mid-stream, size ∝ #groups not #keys-in-watermark),
    * each batch costs one |batch|-sized delta aggregate + one
    * #groups-sized merge — the Kafka→live-mart pattern the reference
    * pairs with its incremental dbt models. Append-only stream ⇒ the
    * IVM old-side is empty; batch-id tags make replays no-ops. The
    * gate reads the final maintained rollup (+ version count proving
    * the multi-batch path); the oracle recomputes it from the raw
    * table — additive maintenance must be decimal-exact across any
    * batch partitioning.
    */
  def st10StreamingIvm(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val s = streamSession(spark)
    val src = graft.TempDirs.scratch("graft-st10-src")
    graft.BenchPhase.land {
      graft.Tables(spark, dir, "events")
        .withColumn("ts", unix_micros(col("ts")))
        .repartition(16)
        .write.mode("overwrite").parquet(src)
    }

    val matSchema = StructType(Seq(
      StructField("event_type", StringType),
      StructField("n_events", LongType),
      StructField("total_value", DecimalType(18, 4))))
    val table = s"${graft.TempDirs.scratch("graft-st10-tbl")}/events_mv"
    graft.sources.Snapshots.commit(
      s.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        matSchema), table)

    val stream = s.readStream
      .schema(eventsSchema)
      .option("maxFilesPerTrigger", "4")
      .parquet(src)
      .select(col("event_type"), col("value"))
    val q = stream.writeStream
      .option("checkpointLocation", graft.TempDirs.scratch("graft-st10-ckpt"))
      .foreachBatch(ivmMergeRollup(table, "mv-batch") _)
      .start()
    try q.processAllAvailable() finally q.stop()

    val nVersions = graft.sources.Snapshots.versions(table).size
    graft.sources.Snapshots.read(spark, table)
      .select(
        col("event_type"),
        col("n_events"),
        col("total_value").cast("double").as("total_value"),
        lit(nVersions).as("n_versions"))
      .orderBy(col("event_type"))
  }

  /** st13: streaming SKETCH maintenance — distinct-user counting over
    * an unbounded stream with BOUNDED state: each micro-batch folds
    * its rows into per-event-type KMV sketches stored in the
    * versioned table ([[graft.functions.KMinValues]]; k·#types longs
    * of state TOTAL, vs st02's per-key exact state ∝ key universe).
    * The merge is union-of-hashes → re-sketch, and KMV's defining
    * property — sketch(A ∪ B) == sketch(sketch(A) ∪ sketch(B)) —
    * makes the maintained sketch BIT-IDENTICAL to one built over the
    * whole history in a single pass, no matter how the stream was
    * batched; `Snapshots.mergeWith` idempotent batch tags make
    * replays no-ops (exactly-once). So the gate is exact, not
    * bound-only: the DuckDB oracle recomputes sketch AND estimator
    * from the raw table (a05's md5-derived 60-bit hash space).
    * The 100 TB shape: kilobytes of restart-safe, queryable-mid-
    * stream state answering "distinct users per type so far" forever.
    */
  def st13StreamingSketch(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.GraftFunctions
    val K = 128
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    GraftFunctions.register(spark) // before the clone: the stream session inherits
    val s = streamSession(spark)
    val hvCol = conv(substring(md5(col("user_id").cast("string").cast("binary")), 1, 15),
      16, 10).cast("long")
    val src = graft.TempDirs.scratch("graft-st13-src")
    graft.BenchPhase.land {
      graft.Tables(spark, dir, "events")
        .select(col("event_type"), hvCol.as("hv"))
        .repartition(16)
        .write.mode("overwrite").parquet(src)
    }

    val skSchema = StructType(Seq(
      StructField("event_type", StringType),
      StructField("sk", org.apache.spark.sql.types.ArrayType(LongType))))
    val table = s"${graft.TempDirs.scratch("graft-st13-tbl")}/user_sketch"
    graft.sources.Snapshots.commit(
      s.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        skSchema), table)

    val stream = s.readStream
      .schema(StructType(Seq(
        StructField("event_type", StringType), StructField("hv", LongType))))
      .option("maxFilesPerTrigger", "4")
      .parquet(src)
    val q = stream.writeStream
      .option("checkpointLocation", graft.TempDirs.scratch("graft-st13-ckpt"))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        GraftFunctions.register(batch.sparkSession) // idempotent
        graft.sources.Snapshots.mergeWith(
          batch.sparkSession, table, batch, tag = Some(s"sk-batch=$id")) { (mat, b) =>
          // stored k-min hashes ∪ the batch's raw hashes → re-sketch:
          // the KMV merge (dedup happens inside the aggregate)
          mat.select(col("event_type"), explode(col("sk")).as("hv"))
            .unionByName(b.select(col("event_type"), col("hv")))
            .groupBy(col("event_type"))
            .agg(GraftFunctions.kMinValues(col("hv"), K).as("sk"))
        }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    val nVersions = graft.sources.Snapshots.versions(table).size
    val estimate =
      when(size(col("sk")) < K, size(col("sk")).cast("double"))
        .otherwise(lit((K - 1).toDouble) * lit(1152921504606846976L).cast("double") /
          element_at(col("sk"), K).cast("double"))
    val exact = graft.Tables(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
    graft.sources.Snapshots.read(spark, table)
      .select(col("event_type"), estimate.as("kmv_est"))
      .join(exact, Seq("event_type"))
      .select(col("event_type"), col("n_exact"), col("kmv_est"),
        lit(nVersions).as("n_versions"))
      .orderBy(col("event_type"))
  }

  /** st14: in-stream VALIDATION with a DEAD-LETTER QUEUE — the fault
    * isolation every production ingest needs: a malformed record must
    * neither kill the stream nor silently vanish. The landed topic
    * carries two deterministic corruption classes (truncated JSON →
    * unparseable; envelope missing the key field → missing_key); each
    * micro-batch splits on parse+validate and appends the typed rows
    * to the main table and the rejects (reason + raw payload,
    * replayable) to the DLQ table — BOTH through `Snapshots.mergeWith`
    * idempotent batch tags, so replays double-commit neither side and
    * valid ∪ dlq == topic exactly. Gate: per-type valid counts +
    * per-reason DLQ counts; the oracle classifies the raw table by
    * the same rules.
    */
  def st14DeadLetter(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val s = streamSession(spark)
    val envSchema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType),
      StructField("ts_us", LongType)))
    val ev = graft.Tables(s, dir, "events").withColumn("ts_us", unix_micros(col("ts")))
    val good = to_json(struct(col("user_id"), col("event_id"), col("event_type"),
      col("value"), col("ts_us")))
    val noKey = to_json(struct(col("event_id"), col("event_type"),
      col("value"), col("ts_us")))
    val payload =
      when(col("event_id") % 13 === 0, substring(good, 1, 10)) // truncated JSON
        .when(col("event_id") % 17 === 0, noKey)               // key field gone
        .otherwise(good)
    val topic = graft.TempDirs.scratch("graft-st14-topic")
    graft.BenchPhase.land {
      ev.select(payload.as("payload")).repartition(16)
        .write.mode("overwrite").parquet(topic)
    }

    val mainT = s"${graft.TempDirs.scratch("graft-st14-tbl")}/events_valid"
    val dlqT = s"${graft.TempDirs.scratch("graft-st14-dlq")}/events_dlq"
    // two independent empty seeds — committed concurrently (guide §2.6)
    graft.BenchPhase.land {
      graft.Overlap.pair(
        graft.sources.Snapshots.commit(
          s.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
            envSchema), mainT),
        graft.sources.Snapshots.commit(
          s.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
            StructType(Seq(StructField("reason", StringType),
              StructField("payload", StringType)))), dlqT))
    }

    val stream = s.readStream
      .schema(StructType(Seq(StructField("payload", StringType))))
      .option("maxFilesPerTrigger", "4")
      .parquet(topic)
    val q = stream.writeStream
      .option("checkpointLocation", graft.TempDirs.scratch("graft-st14-ckpt"))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val parsed = batch
          .withColumn("env", from_json(col("payload"), envSchema))
          // from_json yields an all-NULL struct (not NULL) on garbage:
          // unparseable = no field survived; missing_key = key absent
          .withColumn("unparseable",
            col("env.event_id").isNull && col("env.user_id").isNull &&
              col("env.event_type").isNull)
          .withColumn("invalid", col("unparseable") || col("env.user_id").isNull)
        // the valid slice and the DLQ slice merge into DIFFERENT
        // tables — two independent commits per batch, submitted
        // concurrently (guide §2.6) so the batch pays max() not sum()
        // of two scheduling-dominated tiny jobs
        graft.BenchPhase.land {
          graft.Overlap.pair(
            graft.sources.Snapshots.mergeWith(batch.sparkSession, mainT,
              parsed.filter(!col("invalid")).select(col("env.*")),
              tag = Some(s"valid-batch=$id")) { (mat, b) => mat.unionByName(b) },
            graft.sources.Snapshots.mergeWith(batch.sparkSession, dlqT,
              parsed.filter(col("invalid")).select(
                when(col("unparseable"), "unparseable").otherwise("missing_key")
                  .as("reason"),
                col("payload")),
              tag = Some(s"dlq-batch=$id")) { (mat, b) => mat.unionByName(b) })
        }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    val valid = graft.sources.Snapshots.read(spark, mainT)
      .groupBy(col("event_type").as("label")).agg(count(lit(1)).as("n"))
      .withColumn("kind", lit("valid"))
    val dlq = graft.sources.Snapshots.read(spark, dlqT)
      .groupBy(col("reason").as("label")).agg(count(lit(1)).as("n"))
      .withColumn("kind", lit("dlq"))
    valid.unionByName(dlq)
      .select(col("kind"), col("label"), col("n"))
      .orderBy(col("kind"), col("label"))
  }

  /** st15: RESTART RECOVERY — the exactly-once contract ACROSS query
    * restarts, the one streaming property none of st01-st14 pin down
    * explicitly: a first query instance drains wave 1 of the landing
    * and stops; wave 2 lands; a NEW query instance on the SAME
    * checkpoint must resume from the recorded offsets — reprocessing
    * nothing (no double counts) and skipping nothing (batch ids
    * continue, so the idempotent merge tags can't accidentally
    * swallow wave 2 — if the checkpoint were lost, restarted ids
    * would collide with wave 1's tags and wave 2 would vanish; either
    * failure mode breaks the oracle). Gate: the maintained rollup
    * after both runs == one batch rollup of the whole table, with
    * seed + 4 merge commits.
    */
  def st15RestartRecovery(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val s = streamSession(spark)
    val src = graft.TempDirs.scratch("graft-st15-src")
    val ckpt = graft.TempDirs.scratch("graft-st15-ckpt")
    val ev = graft.Tables(s, dir, "events")
      .select(col("event_type"), col("value"), (col("user_id") % 2).as("half"))
    graft.BenchPhase.land {
      ev.filter(col("half") === 0).drop("half")
        .repartition(8).write.mode("overwrite").parquet(src)
    }

    val matSchema = StructType(Seq(
      StructField("event_type", StringType),
      StructField("n_events", LongType),
      StructField("total_value", DecimalType(18, 4))))
    val table = s"${graft.TempDirs.scratch("graft-st15-tbl")}/events_agg"
    graft.sources.Snapshots.commit(
      s.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        matSchema), table)

    def runOnce(): Unit = {
      val stream = s.readStream
        .schema(StructType(Seq(
          StructField("event_type", StringType), StructField("value", DoubleType))))
        .option("maxFilesPerTrigger", "4")
        .parquet(src)
      val q = stream.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch(ivmMergeRollup(table, "agg-batch") _)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    runOnce() // wave 1: 8 files → 2 merge commits, then the query STOPS
    graft.BenchPhase.land {
      ev.filter(col("half") === 1).drop("half")
        .repartition(8).write.mode("append").parquet(src) // wave 2 lands
    }
    runOnce() // NEW instance, SAME checkpoint: resumes at batch id 2

    val nVersions = graft.sources.Snapshots.versions(table).size
    graft.sources.Snapshots.read(spark, table)
      .select(col("event_type"), col("n_events"),
        col("total_value").cast("double").as("total_value"),
        lit(nVersions).as("n_versions"))
      .orderBy(col("event_type"))
  }

  /** The shared per-micro-batch IVM merge behind the st10/st15/st16
    * maintained rollup: one idempotent tagged commit per batch into
    * the (event_type, n_events, total_value DECIMAL(18,4)) table.
    * One definition so the three entries can never silently diverge
    * on schema, scale, or tagging.
    */
  private def ivmMergeRollup(table: String, tagPrefix: String)(
      batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long): Unit = {
    graft.sources.Snapshots.mergeWith(
      batch.sparkSession, table, batch, tag = Some(s"$tagPrefix=$id")) { (mat, b) =>
      graft.operators.Ivm.maintain(mat,
          oldRows = b.limit(0), newRows = b,
          groupCols = Seq("event_type"), countCol = "n_events",
          sums = Seq("value" -> "total_value"), scale = 4)
        // keep the stored schema stable across commits
        .select(col("event_type"), col("n_events"),
          col("total_value").cast("decimal(18,4)").as("total_value"))
    }
    ()
  }

  /** st16: Trigger.AvailableNow incremental drains — the trigger a
    * scheduled ingest actually runs: each invocation processes
    * exactly the data available at start (still sliced into
    * maxFilesPerTrigger micro-batches, so state/commit sizes stay
    * bounded) and then STOPS ITSELF — no processAllAvailable/stop
    * driver babysitting, no always-on cluster. Offsets persist in the
    * checkpoint across invocations, so a nightly re-run picks up
    * exactly the new files: run 1 drains wave 1 (2 batches), the
    * query terminates; wave 2 lands; run 2 — a NEW query on the same
    * checkpoint — drains only wave 2. The maintained rollup after
    * both runs must equal one batch rollup of the whole table with
    * seed + 4 commits (the st15 gate shape, but the STOPPING is the
    * engine's own data-boundary detection rather than the caller's).
    */
  def st16AvailableNow(spark: SparkSession, dir: String): DataFrame = {
    val s = streamSession(spark)
    val src = graft.TempDirs.scratch("graft-st16-src")
    val ckpt = graft.TempDirs.scratch("graft-st16-ckpt")
    val ev = graft.Tables(s, dir, "events")
      .select(col("event_type"), col("value"), (col("user_id") % 2).as("half"))
    graft.BenchPhase.land {
      ev.filter(col("half") === 0).drop("half")
        .repartition(8).write.mode("overwrite").parquet(src)
    }

    val matSchema = StructType(Seq(
      StructField("event_type", StringType),
      StructField("n_events", LongType),
      StructField("total_value", DecimalType(18, 4))))
    val table = s"${graft.TempDirs.scratch("graft-st16-tbl")}/events_agg"
    graft.sources.Snapshots.commit(
      s.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        matSchema), table)

    drainAvailable(s, src, ckpt, table)   // wave 1: self-terminating
    graft.BenchPhase.land {
      ev.filter(col("half") === 1).drop("half")
        .repartition(8).write.mode("append").parquet(src) // wave 2 lands
    }
    drainAvailable(s, src, ckpt, table)   // new invocation: wave 2 only

    val nVersions = graft.sources.Snapshots.versions(table).size
    graft.sources.Snapshots.read(spark, table)
      .select(col("event_type"), col("n_events"),
        col("total_value").cast("double").as("total_value"),
        lit(nVersions).as("n_versions"))
      .orderBy(col("event_type"))
  }

  /** One Trigger.AvailableNow invocation over the st16 landing:
    * reads from the recorded offsets to the CURRENT data boundary in
    * maxFilesPerTrigger slices, IVM-merges each batch, and
    * terminates on its own. Exposed for the spec's idle-third-run
    * check.
    */
  private[graft] def drainAvailable(s: SparkSession, src: String,
      ckpt: String, table: String): Unit = {
    val stream = s.readStream
      .schema(StructType(Seq(
        StructField("event_type", StringType), StructField("value", DoubleType))))
      .option("maxFilesPerTrigger", "4")
      .parquet(src)
    val q = stream.writeStream
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch(ivmMergeRollup(table, "an-batch") _)
      .start()
    q.awaitTermination() // AvailableNow stops at the data boundary
  }

  /** st11: stream-stream LEFT OUTER interval join — st05's missing
    * half: purchases with NO preceding view must still emit, null-
    * padded. This is the outer-join eviction contract: an unmatched
    * left row is held in state until the watermark proves no matching
    * right row can still arrive (here: views watermark passes p_ts),
    * THEN emits with nulls — so outer results are exactly-once and
    * state stays bounded on both unbounded sides.
    *
    * Determinism at the stream tail: rows within the watermark delay
    * of the stream's frontier are never evicted (nothing proves their
    * match can't arrive), so the gate scopes to purchases ≥ 2 h
    * (delay + margin) behind max event time — computed in-plan from
    * the batch table as a one-row broadcast, identically in the
    * oracle. A production deployment has no such scope: the frontier
    * advances forever and every row eventually resolves.
    */
  def st11StreamLeftJoin(spark: SparkSession, dir: String): DataFrame = {
    val s = streamSession(spark, noDataBatches = true)
    val src = eventsStream(s, dir)
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("value").as("p_value"))
      .withWatermark("p_ts", "1 hour")
    val views = src.filter(col("event_type") === "view")
      .select(col("event_id").as("v_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", "1 hour")
    val pairs = purchases.join(views,
      col("p_user") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 6 HOURS") &&
        col("v_ts") <= col("p_ts"),
      "left_outer")
    s.catalog.dropTempView("st11_out")
    locally {
      val q = pairs.writeStream
        .outputMode("append")
        .format("memory")
        .queryName("st11_out")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    val cutoff = graft.Tables(s, dir, "events")
      .agg(max(col("ts")).as("max_ts"))
      .select((col("max_ts") - expr("INTERVAL 2 HOURS")).as("cutoff"))
    s.table("st11_out")
      .crossJoin(broadcast(cutoff))
      .filter(col("p_ts") <= col("cutoff"))
      .groupBy(col("p_user").as("user_id"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("v_id")).as("n_matched_rows"),
        sum(when(col("v_id").isNull, 1).otherwise(0)).as("n_unmatched_purchases"),
        countDistinct(col("p_id")).as("n_purchases"))
      .orderBy(col("user_id"))
  }

  /** st12: APPEND-mode windowed aggregation — the production
    * complement of st01's complete-mode drain: in append mode a
    * window row is emitted EXACTLY ONCE, only after the watermark
    * passes its end (the result is final — downstream consumers can
    * ingest it as an immutable fact), and its state is evicted at the
    * same moment — state ∝ open windows. Windows still open when the
    * bounded drain ends (end > final watermark = max ts − 1 h) are
    * never emitted, so the gate scopes the oracle to finalized
    * windows — computed from the batch table identically. Needs
    * watermark-advancing no-data batches (st11's flag): append-mode
    * emission happens only when a batch observes the advanced
    * watermark.
    */
  def st12AppendWindows(spark: SparkSession, dir: String): DataFrame = {
    val s = streamSession(spark, noDataBatches = true)
    val stream = eventsStream(s, dir)
      .withWatermark("ts", "1 hour")
    val agg = stream
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value"), 4).as("total_value"))
    s.catalog.dropTempView("st12_out")
    locally {
      val q = agg.writeStream
        .outputMode("append")
        .format("memory")
        .queryName("st12_out")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    // the append stream emitted ONLY finalized windows; prove it by
    // joining nothing away — the gate output IS the emitted set
    s.table("st12_out")
      .select(
        unix_millis(col("window.start")).as("window_start_ms"),
        unix_millis(col("window.end")).as("window_end_ms"),
        col("event_type"), col("n_events"), col("total_value"))
      .orderBy(col("window_start_ms"), col("event_type"))
  }

  /** st17: streaming CDC into a MERGE-ON-READ table — the actual
    * kafka-connect-iceberg write path (reference:
    * docker/kafka-connect-iceberg + docs/components/cdc.md land
    * Debezium CDC into Iceberg format-v2 tables). st09 applies the
    * same changelog COPY-ON-WRITE (every micro-batch rewrites the
    * snapshot via MERGE — read-optimized); here each micro-batch
    * commits an equality-delete file + a data file via
    * [[graft.sources.Mor.upsert]] — write cost ∝ batch size, the
    * accumulated base is NEVER rewritten per batch, and the read side
    * pays broadcast anti-joins until [[graft.sources.Mor.compact]]
    * folds them down (run once post-drain, the maintenance cadence).
    * At 100 TB this is the trade that keeps a high-churn CDC landing
    * affordable: st09's per-batch cost grows with the TABLE, st17's
    * with the BATCH.
    *
    * The topic is sharded BY KEY (`pmod(user_id, 16)`) — Kafka's
    * actual contract (a key sticks to one partition, ordered within
    * it), which is what makes append-only MoR upserts sound: a key's
    * ops arrive together and the per-batch LWW reduce picks its final
    * version; batch-id tags make replayed commits no-ops. Gate = the
    * live merged view post-compact (must equal the raw-table
    * latest-wins snapshot, tombstones dropped) + the commit count
    * proving the multi-batch MoR path (4×(delete+data) + 1 compact).
    */
  def st17MorCdc(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val s = streamSession(spark)
    // 1. the topic: st06's Debezium envelope, sharded BY KEY
    val ev = graft.Tables(s, dir, "events")
      .withColumn("op",
        when(col("event_type") === "signup", "c")
          .when(col("event_type") === "error", "d")
          .otherwise("u"))
      .withColumn("ts_us", unix_micros(col("ts")))
    val row = struct(col("user_id"), col("event_id"), col("value"), col("ts_us"))
    val envelope = to_json(struct(
      col("op"), col("ts_us"),
      when(col("op") =!= "d", row).as("after"),
      when(col("op") === "d", row).as("before")))
    val topic = graft.TempDirs.scratch("graft-st17-topic")
    // one directory+file per topic partition (partitionBy, not
    // repartition: hash collisions over 16 shard values would make
    // the file — and therefore batch/commit — count nondeterministic)
    graft.BenchPhase.land {
      ev.select(envelope.cast("binary").as("value"),
          pmod(col("user_id"), lit(16)).as("kpart"))
        .repartition(16, col("kpart"))
        .write.partitionBy("kpart").mode("overwrite").parquet(topic)
    }

    // 2. stream-decode; each micro-batch = one MoR upsert (two commits)
    val rowSchema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_id", LongType),
      StructField("value", DoubleType), StructField("ts_us", LongType)))
    val envSchema = StructType(Seq(
      StructField("op", StringType), StructField("ts_us", LongType),
      StructField("after", rowSchema), StructField("before", rowSchema)))
    val table = s"${graft.TempDirs.scratch("graft-st17-tbl")}/users_mor"
    val flat = s.readStream
      .schema(StructType(Seq(StructField("value", BinaryType))))
      .option("maxFilesPerTrigger", "4")
      .option("recursiveFileLookup", "true") // 16 shard dirs, 4 batches
      .parquet(topic)
      .select(from_json(col("value").cast("string"), envSchema).as("env"))
      .select(
        coalesce(col("env.after.user_id"), col("env.before.user_id")).as("user_id"),
        col("env.ts_us").as("ts_us"),
        coalesce(col("env.after.event_id"), col("env.before.event_id")).as("last_event_id"),
        col("env.op").as("last_op"),
        col("env.after.value").as("last_value"),
        (col("env.op") === "d").as("deleted"))
    val q = flat.writeStream
      .option("checkpointLocation", graft.TempDirs.scratch("graft-st17-ckpt"))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        // LWW-reduce the batch to one row per key (the key-sharded
        // topic guarantees a key's full history is inside one batch)
        // persisted: the upsert's two staged halves (equality-delete
        // keys + data rows) both derive from this reduce — without the
        // cache each concurrent half recomputes the batch scan +
        // LWW shuffle (guide §5 reuse)
        val reduced = batch.groupBy(col("user_id"))
          .agg(max_by(
            struct(batch.columns.map(col): _*),
            struct(col("ts_us"), col("last_event_id"))).as("w"))
          .select(col("w.*"))
          .persist()
        try {
          graft.sources.Mor.upsert(table, reduced, Seq("user_id"),
            "deleted", tag = Some(s"cdc-batch=$id"))
          ()
        } finally { reduced.unpersist(); () }
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    graft.sources.Mor.compact(s, table)

    // 3. the live view + the MoR-path proof (8 delta commits + compact)
    val nCommits = graft.sources.Mor.commits(table).size
    graft.sources.Mor.read(spark, table)
      .select(
        col("user_id"), col("last_op"), col("last_value"),
        expr("ts_us div 1000").as("last_ts_ms"),
        lit(nCommits).as("n_commits"))
      .orderBy(col("user_id"))
  }

  /** st18: STREAMING-FRESH MATERIALIZED VIEW, served by the automatic
    * rewrite — the full lakehouse serving loop in one operator. A
    * day-grain MV ([[graft.plans.Mv]]) is built over a landed `orders`
    * base; a file stream then ingests the remaining orders, and every
    * micro-batch (a) appends to the base table and (b) incrementally
    * maintains the MV ([[graft.operators.Ivm.maintain]] — cost ∝
    * batch, never ∝ base) into a fresh versioned materialization that
    * re-registers under the same MV name. The gate query aggregates
    * the BASE table; [[graft.plans.MvRewriteRule]] reroutes it to the
    * freshly-maintained MV, so matching the oracle's full-table
    * answer proves maintenance was EXACT through every batch AND the
    * rewrite serves current data. At 100 TB: dashboards keep hitting
    * the fact table; the engine answers from megabytes of maintained
    * summary that is never more than one micro-batch stale.
    */
  def st18StreamingMv(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    import graft.plans.Mv
    val s = streamSession(spark)
    val dec = DecimalType(18, 2)
    val groupCols = Seq("o_orderstatus", "o_orderdate")

    val orders = graft.Tables(spark, dir, "orders")
    val basePath = graft.TempDirs.scratch("graft-st18-base")
    graft.BenchPhase.land {
      orders.filter(col("o_orderkey") % 2 === 0)
        .repartition(8).write.mode("overwrite").parquet(basePath)
    }

    val mvName = s"orders_mv_${java.util.UUID.randomUUID().toString.take(8)}"
    Mv.create(
      spark.read.parquet(basePath), mvName, basePath,
      graft.TempDirs.scratch("graft-st18-mv"), groupCols,
      Seq(Mv.Measure("sum", "o_totalprice", Some(dec), "sum_price")))

    val srcPath = graft.TempDirs.scratch("graft-st18-src")
    graft.BenchPhase.land {
      orders.filter(col("o_orderkey") % 2 === 1)
        .repartition(16).write.mode("overwrite").parquet(srcPath)
    }

    var refreshes = 1
    val q = s.readStream
      .schema(spark.read.parquet(srcPath).schema)
      .option("maxFilesPerTrigger", "4")
      .parquet(srcPath)
      .writeStream
      .option("checkpointLocation", graft.TempDirs.scratch("graft-st18-ckpt"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          batch.persist()
          // the base-table append and the MV maintenance read/derive
          // from DISJOINT state (basePath vs the registered mvPath) —
          // run them as two concurrent jobs per batch (guide §2.6)
          // instead of paying two scheduling-dominated writes in series
          graft.Overlap.pair(
            batch.write.mode("append").parquet(basePath),
            {
              val cur = Mv.registered.find(_.name == mvName).get
              val mat = batch.sparkSession.read.parquet(cur.mvPath)
              val next = graft.operators.Ivm.maintain(
                mat, batch.limit(0), batch,
                groupCols, "cnt_star", Seq("o_totalprice" -> "sum_price"))
                .select(col("o_orderstatus"), col("o_orderdate"),
                  // Mv.create's stored types: sum(DECIMAL(18,2)) = (28,2)
                  col("sum_price").cast(DecimalType(28, 2)).as("sum_price"),
                  col("cnt_star").cast("long").as("cnt_star"))
              val nextPath = graft.TempDirs.scratch("graft-st18-mv")
              next.write.mode("overwrite").parquet(nextPath)
              Mv.register(cur.copy(mvPath = nextPath))
            })
          refreshes += 1
          batch.unpersist()
          ()
        }
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    try {
      val out = spark.read.parquet(basePath)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
        .groupBy("o_orderstatus")
        .agg(
          sum(col("o_totalprice").cast(dec)).cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))
        .withColumn("n_refreshes", lit(refreshes).cast("long"))
        .orderBy(col("o_orderstatus"))
      val resPath = graft.TempDirs.scratch("graft-st18-res")
      out.write.mode("overwrite").parquet(resPath)
      graft.sources.Sources.readParquet(spark, resPath)
    } finally Mv.drop(mvName)
  }

  /** The st18 maintenance step, exposed for the rewrite-integration
    * spec: returns (registered MV name, base path) after seeding +
    * one manual maintenance round.
    */
  def st18Seeded(spark: SparkSession, dir: String): (String, String) = {
    import org.apache.spark.sql.types.DecimalType
    import graft.plans.Mv
    val dec = DecimalType(18, 2)
    val groupCols = Seq("o_orderstatus", "o_orderdate")
    val orders = graft.Tables(spark, dir, "orders")
    val basePath = graft.TempDirs.scratch("graft-st18s-base")
    graft.BenchPhase.land {
      orders.filter(col("o_orderkey") % 2 === 0)
        .repartition(4).write.mode("overwrite").parquet(basePath)
    }
    val mvName = s"orders_mv_${java.util.UUID.randomUUID().toString.take(8)}"
    Mv.create(
      spark.read.parquet(basePath), mvName, basePath,
      graft.TempDirs.scratch("graft-st18s-mv"), groupCols,
      Seq(Mv.Measure("sum", "o_totalprice", Some(dec), "sum_price")))
    val batch = orders.filter(col("o_orderkey") % 2 === 1)
    batch.write.mode("append").parquet(basePath)
    val cur = Mv.registered.find(_.name == mvName).get
    val next = graft.operators.Ivm.maintain(
      spark.read.parquet(cur.mvPath), batch.limit(0), batch,
      groupCols, "cnt_star", Seq("o_totalprice" -> "sum_price"))
      .select(col("o_orderstatus"), col("o_orderdate"),
        col("sum_price").cast(DecimalType(28, 2)).as("sum_price"),
        col("cnt_star").cast("long").as("cnt_star"))
    val nextPath = graft.TempDirs.scratch("graft-st18s-mv")
    next.write.mode("overwrite").parquet(nextPath)
    Mv.register(cur.copy(mvPath = nextPath))
    (mvName, basePath)
  }

  /** st19: OBSERVED METRICS — in-flight data-quality counters riding
    * the stream's own pass (`Dataset.observe`, Spark's observation
    * API): row volume, negative-value anomalies, and null-type rows
    * are counted INSIDE the running query and surfaced through each
    * micro-batch's progress events — no second scan, no extra job,
    * which is the difference between monitoring and re-auditing at
    * 100 TB (st14's DLQ routes bad rows; this instruments the healthy
    * path). The gate emits the per-type rollup the stream computed
    * PLUS the batch-summed observed totals as pinned columns; the
    * oracle recomputes all of them from the raw table, so the
    * monitor's numbers are proven exact, not sampled.
    */
  def st19ObservedMetrics(spark: SparkSession, dir: String): DataFrame = {
    val s = streamSession(spark)
    val stream = eventsStream(s, dir)
      .observe("gate",
        count(lit(1)).as("rows_seen"),
        count(when(col("value") < 0, 1)).as("n_negative"),
        count(when(col("event_type").isNull, 1)).as("n_null_type"))
    val agg = stream
      .groupBy(coalesce(col("event_type"), lit("(null)")).as("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value"), 4).as("total_value"))
    s.catalog.dropTempView("st19_out")
    // accumulate per-batch observed rows through a listener, NOT
    // q.recentProgress: that is a ring buffer bounded by
    // spark.sql.streaming.numRecentProgressUpdates (default 100) — a
    // source spanning >100 micro-batches would silently drop the
    // oldest batches' counts and undercount the totals
    val seen = new java.util.concurrent.atomic.AtomicLong
    val neg = new java.util.concurrent.atomic.AtomicLong
    val nulls = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      // match by queryName: known BEFORE start(), so no window where an
      // early first batch's progress could slip past an unset query id
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        if (e.progress.name == "st19_out") {
          val m = e.progress.observedMetrics
          if (m.containsKey("gate")) {
            val r = m.get("gate")
            seen.addAndGet(r.getLong(0))
            neg.addAndGet(r.getLong(1))
            nulls.addAndGet(r.getLong(2))
          }
        }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    }
    s.streams.addListener(listener)
    try {
      val q = agg.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName("st19_out")
        .start()
      try q.processAllAvailable() finally q.stop()
      // progress events ride the async listener bus — q.stop() does
      // not flush it; drain before reading the accumulators
      org.apache.spark.sql.GraftShims.waitListenerBusEmpty(s)
    } finally s.streams.removeListener(listener)
    s.table("st19_out")
      .withColumn("rows_seen", lit(seen.get))
      .withColumn("n_negative", lit(neg.get))
      .withColumn("n_null_type", lit(nulls.get))
      .orderBy(col("event_type"))
  }

  /** st21: streaming CDC into a HIDDEN-PARTITIONED landing — the
    * reference's actual CDC layout, incrementally: its landing is
    * "partitioned by" the source timestamp the reader never names
    * (docs/components/cdc.md), so each micro-batch must extend the
    * transform-partitioned table, not overwrite it. Events shard 16
    * ways, stream back 4 files per trigger, and every batch
    * `Transforms.append`s under the recorded `days(ts)` transform
    * with batch-id idempotency (a replayed batch is a no-op). After
    * the drain, a RAW-predicate week scan plans via transform
    * arithmetic against the `_pvals` manifest — partitions_read /
    * partitions_total pinned in-result and restated by the oracle
    * from day arithmetic, proving multi-batch appends compose with
    * hidden-partition pruning. At 100 TB: the landing grows a
    * day-directory at a time; a day-range read opens hit days only,
    * planning cost = one sidecar line per batch.
    */
  def st21StreamHiddenPartition(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.Transforms
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val s = streamSession(spark)
    val src = graft.TempDirs.scratch("graft-st21-src")
    graft.BenchPhase.land {
      graft.Tables(spark, dir, "events")
        .withColumn("ts", unix_micros(col("ts")))
        .repartition(16)
        .write.mode("overwrite").parquet(src)
    }
    val table = s"${graft.TempDirs.scratch("graft-st21-tbl")}/events_by_day"
    val stream = s.readStream
      .schema(eventsSchema)
      .option("maxFilesPerTrigger", "4")
      .parquet(src)
    val q = stream.writeStream
      .option("checkpointLocation", graft.TempDirs.scratch("graft-st21-ckpt"))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        Transforms.append(batch.sparkSession, table,
          batch.withColumn("ts", timestamp_micros(col("ts"))),
          Transforms.Days("ts"), batchId = Some(id))
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val (week, partsRead, partsTotal) =
      Transforms.scanDays(spark, table, "2024-01-10", "2024-01-17")
    week.groupBy(col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .withColumn("partitions_read", lit(partsRead))
      .withColumn("partitions_total", lit(partsTotal))
      .orderBy(col("day"))
  }

  /** st22: STREAMING ANN INGEST — the vector half of the CDC story
    * (a production vector store's online indexing path: documents
    * arrive, embed, and become searchable without a rebuild): the
    * stored s13 index is trained on the 80% of the corpus already
    * present, then the remaining 20% arrives as micro-batches and
    * every batch rides [[graft.operators.Similarity.appendAnnIndex]]
    * — frozen coarse quantizer, append-only posting files, write
    * cost ∝ batch. The drained index serves the same query batch
    * with results IDENTICAL to a single bulk append (s15's post
    * phase): frozen-quantizer assignment is per-vector, so the
    * result is batch-structure-invariant — which is exactly what the
    * oracle checks (it knows nothing about the micro-batch split).
    * Delivery is EXACTLY-ONCE per micro-batch: each append carries
    * `batch=<id>` as its ledger tag, so a foreachBatch replay whose
    * tag is already committed is a no-op, and a half-landed crash
    * converges on replay because the tag owns its posting file
    * names (the SnapshotSink ledger pattern applied to the raw
    * partitioned posting layout — see
    * [[graft.operators.Similarity.appendAnnIndex]]). At 100 TB:
    * arrivals index at stream rate, serves stay probed-cells-sized,
    * retrain is a scheduled offline job.
    */
  def st22StreamAnnIngest(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val s = streamSession(spark)
    val idxDir = graft.TempDirs.scratch("graft-st22-idx")
    val e = graft.Tables(spark, dir, "embeddings")
    val src = graft.TempDirs.scratch("graft-st22-src")
    val holdout = e.filter(col("vec_id") % 5 === 4)
    // the 80% index build and the 20% holdout landing read the same
    // source but write disjoint outputs — overlap them (guide §2.6):
    // the landing write back-fills cores the k-means tail leaves idle
    graft.BenchPhase.land {
      graft.Overlap.pair(
        Similarity.buildAnnIndex(spark, dir, idxDir,
          corpus = Some(e.filter(col("vec_id") % 5 =!= 4))),
        holdout.repartition(8).write.mode("overwrite").parquet(src))
    }
    val stream = s.readStream
      .schema(holdout.schema)
      .option("maxFilesPerTrigger", "2")
      .parquet(src)
    val q = stream.writeStream
      .option("checkpointLocation", graft.TempDirs.scratch("graft-st22-ckpt"))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        Similarity.appendAnnIndex(batch.sparkSession, idxDir, batch.toDF(),
          batchTag = Some(s"batch=$batchId"))
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    Similarity.annServe(spark, idxDir, queries, nprobe = 2, topK = 5)
  }

  /** st23: STREAMING SCHEMA DRIFT — the CDC failure mode every
    * production pipeline meets (a producer deploy adds a field
    * mid-stream; reference: the Debezium→Kafka→lakehouse flow of
    * docs/components/cdc.md, where source DDL flows into the topic):
    * phase-A producers emit `{event_id, user_id, value}` JSON, the
    * upgraded phase-B producers add `event_type`, and the sink
    * neither crashes nor silently drops the new field. Per
    * micro-batch the payload schema is INFERRED from the batch
    * itself (`spark.read.json` inside foreachBatch — the per-batch
    * dynamic-inference trick; a streaming `from_json` pins one
    * schema at plan time and cannot see drift), committed as a
    * schema-versioned snapshot (batch-tagged, replay-idempotent),
    * and a WIDENING is detected by diffing against the stored
    * schema and recorded in a `_drift` ledger — the alerting hook.
    * Old versions keep their write-time schema (q96's column-
    * mapping discipline); the drained read serves the union view
    * with pre-drift rows NULL in the new column. Result pins
    * version count, first/last schema width, and the single
    * recorded drift event; every group restates in the oracle from
    * `event_id` parity. At 100 TB: inference costs one pass over
    * each micro-batch (batch-sized, not corpus-sized), and the
    * drift ledger turns a silent producer change into an audited
    * schema event.
    */
  def st23StreamSchemaDrift(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.Snapshots
    val s = streamSession(spark)
    val src = graft.TempDirs.scratch("graft-st23-src")
    val t = s"${graft.TempDirs.scratch("graft-st23-tbl")}/events_drift"
    val ev = graft.Tables(s, dir, "events")
    // phase A: the old producer — three fields
    graft.BenchPhase.land {
      ev.filter(col("event_id") % 2 === 0)
        .select(to_json(struct(col("event_id"), col("user_id"),
          col("value"))).as("value"))
        .repartition(2).write.mode("overwrite").text(src)
    }
    val stream = s.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType))))
      .option("maxFilesPerTrigger", "1")
      .text(src)
    val q = stream.writeStream
      .option("checkpointLocation", graft.TempDirs.scratch("graft-st23-ckpt"))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val sp = batch.sparkSession
        val tag = s"batch=$batchId"
        if (!Snapshots.committedTags(t).contains(tag)) {
          val rows = sp.read.json(
            batch.select(col("value")).as(org.apache.spark.sql.Encoders.STRING))
          if (!rows.isEmpty) {
            val manifest = java.nio.file.Paths.get(t, "_manifest")
            val prevCols: Set[String] =
              if (java.nio.file.Files.exists(manifest))
                Snapshots.versions(t).lastOption.map(v =>
                  Snapshots.read(sp, t, v).columns.toSet).getOrElse(Set.empty)
              else Set.empty
            val added = rows.columns.toSet -- prevCols
            if (prevCols.nonEmpty && added.nonEmpty) {
              import java.nio.file.StandardOpenOption._
              java.nio.file.Files.write(java.nio.file.Paths.get(t, "_drift"),
                s"$batchId\t${added.toSeq.sorted.mkString(",")}\n"
                  .getBytes("UTF-8"), CREATE, APPEND)
              ()
            }
            Snapshots.commit(rows, t, tag = Some(tag))
            ()
          }
        }
      }
      .start()
    try {
      q.processAllAvailable()
      // phase B: the upgraded producer adds event_type mid-stream
      ev.filter(col("event_id") % 2 === 1)
        .select(to_json(struct(col("event_id"), col("user_id"),
          col("value"), col("event_type"))).as("value"))
        .repartition(2).write.mode("append").text(src)
      q.processAllAvailable()
    } finally q.stop()
    val vs = Snapshots.versions(t)
    val all = vs.map(v => Snapshots.read(spark, t, v))
      .reduce((x, y) => x.unionByName(y, allowMissingColumns = true))
    val firstW = Snapshots.read(spark, t, vs.head).columns.length
    val lastW = Snapshots.read(spark, t, vs.last).columns.length
    val nDrift = {
      val p = java.nio.file.Paths.get(t, "_drift")
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.readAllLines(p).size.toLong
      else 0L
    }
    all.groupBy(coalesce(col("event_type"), lit("unknown")).as("etype"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        graft.functions.Exact.dsum(col("value"), 4).as("total_value"))
      .withColumn("n_versions", lit(vs.size.toLong))
      .withColumn("first_width", lit(firstW.toLong))
      .withColumn("last_width", lit(lastW.toLong))
      .withColumn("n_drifts", lit(nDrift))
      .orderBy(col("etype"))
  }

  /** st24: STREAMING TWO-TABLE TRANSACTION — exactly-once across a
    * fact AND its mart per micro-batch: each batch commits the
    * appended fact slice and the UPDATED running mart as ONE
    * [[graft.sources.Snapshots.commitTxn]] transaction keyed by the
    * batch id (replay = the recorded ids back, zero writes), so no
    * reader — at any instant, across any crash — observes the fact
    * advanced but the mart stale: the invariant every
    * streaming-medallion pipeline wants and usually fakes with
    * eventual consistency. The mart state is held in DECIMAL until
    * the final read (counts are exact longs), so the accumulated
    * values are BATCH-STRUCTURE-INVARIANT — the oracle computes the
    * same totals from the raw table with no knowledge of the
    * micro-batch split, which is exactly the claim. The gate also
    * re-derives the mart from the drained fact and pins equality,
    * and pins fact/mart version counts equal (one txn per batch).
    * At 100 TB: per-batch cost = the batch write + a mart-sized
    * merge; the commit point stays one ledger append.
    */
  def st24StreamTwoSinkTxn(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.Snapshots
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val s = streamSession(spark)
    val src = graft.TempDirs.scratch("graft-st24-src")
    graft.BenchPhase.land {
      graft.Tables(spark, dir, "events")
        .withColumn("ts", unix_micros(col("ts")))
        .repartition(16)
        .write.mode("overwrite").parquet(src)
    }
    val wh = graft.TempDirs.scratch("graft-st24-wh")
    val fact = s"$wh/events_fact"
    val mart = s"$wh/events_mart"
    val dec = org.apache.spark.sql.types.DecimalType(18, 4)
    def martOf(df: DataFrame): DataFrame = df
      .groupBy(col("event_type").as("etype"))
      .agg(sum(col("value").cast(dec)).as("rev_dec"),
        count(lit(1)).as("n_events"))
    val stream = s.readStream
      .schema(eventsSchema)
      .option("maxFilesPerTrigger", "4")
      .parquet(src)
    val q = stream.writeStream
      .option("checkpointLocation", graft.TempDirs.scratch("graft-st24-ckpt"))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val sp = batch.sparkSession
        val cached = batch.persist()
        try {
          if (!cached.isEmpty) {
            val prev =
              if (Snapshots.versions(mart).nonEmpty) Snapshots.read(sp, mart)
              else martOf(cached.toDF()).filter(lit(false))
            val merged = prev.unionByName(martOf(cached.toDF()))
              .groupBy(col("etype"))
              .agg(sum(col("rev_dec").cast(dec)).as("rev_dec"),
                sum(col("n_events")).as("n_events"))
            Snapshots.commitTxn(wh,
              Seq((cached.toDF(), fact), (merged, mart)), s"batch-$batchId")
            ()
          }
        } finally { cached.unpersist(); () }
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val factAll = Snapshots.versions(fact)
      .map(v => Snapshots.read(spark, fact, v))
      .reduce(_ unionAll _)
    val fromFact = martOf(factAll)
      .withColumnRenamed("rev_dec", "rev_check")
      .withColumnRenamed("n_events", "n_check")
    Snapshots.read(spark, mart).join(fromFact, Seq("etype"))
      .select(col("etype"), col("n_events"),
        col("rev_dec").cast("double").as("total_value"),
        (col("n_events") === col("n_check") &&
          col("rev_dec") === col("rev_check")).as("mart_matches_fact"),
        lit(Snapshots.versions(fact).size.toLong).as("fact_versions"),
        lit(Snapshots.versions(mart).size.toLong).as("mart_versions"))
      .orderBy(col("etype"))
  }

  /** st25: STREAMING CDF CONSUMPTION — a downstream mart maintained
    * ONLY from the upstream table's change feed (Delta's "streaming
    * from CDF" / Iceberg incremental reads; reference: the Debezium
    * changelog story of docs/components/cdc.md carried one hop
    * further, warehouse table → warehouse table): each micro-batch
    * (1) LWW-merges its CDC slice into the upstream versioned table
    * (st09's idempotent tagged merge), then (2) reads
    * `table_changes(cursor, head)` — NEVER the upstream rows — turns
    * the change images into signed DECIMAL deltas (+post, −pre;
    * tombstone images contribute zero) and (3) commits the updated
    * mart AND the advanced version cursor as ONE q104 transaction,
    * so consumption is exactly-once by construction: a replayed
    * batch finds its merge tag ledgered and its cursor at head (both
    * no-ops); a crash between merge and consume replays into a
    * cursor<head consume; a crash mid-transaction is repaired by
    * recovery before anything else reads. Because consecutive diffs
    * TELESCOPE, consuming cursor→head in one hop is exact no matter
    * how many versions a batch advanced. Fixture: every key upserts
    * (seq 1), keys ≡0 mod 5 re-upsert +100 (seq 2), keys ≡0 mod 7
    * delete (seq 3) — final state is pure key arithmetic, restated in
    * the oracle; the gate also pins mart==recompute, both version
    * counts and cursor==head. At 100 TB: the mart never rescans the
    * upstream — each batch costs the batch merge + a diff of the two
    * versions' keys + a #groups merge, the incremental-consumer
    * economics CDF exists for.
    */
  def st25StreamCdf(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.Snapshots
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val s = streamSession(spark)
    val wh = graft.TempDirs.scratch("graft-st25-wh")
    val up = s"$wh/orders_up"
    val mart = s"$wh/status_mart"
    val cur = s"$wh/cdf_cursor"
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val cust = graft.Tables(spark, dir, "customer")
      .select(col("c_custkey").as("k"),
        col("c_mktsegment").as("seg"),
        col("c_acctbal").as("bal"))
    val base = cust
      .withColumn("seq", lit(1L)).withColumn("deleted", lit(false))
    val upd = cust.filter(col("k") % 5 === 0)
      .withColumn("bal", col("bal") + 100.0)
      .withColumn("seq", lit(2L)).withColumn("deleted", lit(false))
    val del = cust.filter(col("k") % 7 === 0)
      .withColumn("seq", lit(3L)).withColumn("deleted", lit(true))
    val src = graft.TempDirs.scratch("graft-st25-src")
    graft.BenchPhase.land {
      base.unionByName(upd).unionByName(del)
        .repartition(16).write.mode("overwrite").parquet(src)
    }
    // seeds: empty upstream state, empty mart, cursor at the seed —
    // three independent tables, seeded concurrently (guide §2.6)
    import spark.implicits._
    graft.BenchPhase.land {
      graft.Overlap.jobs(Seq[() => Unit](
        () => { Snapshots.commit(base.filter(lit(false)), up); () },
        () => { Snapshots.commit(
          base.filter(lit(false))
            .select(col("seg").as("status"),
              lit(0L).as("n_live"), lit(null).cast(dec).as("rev_dec")), mart); () },
        () => { Snapshots.commit(Seq(1L).toDF("last_version"), cur); () }
      ))(_.apply())
    }
    val srcSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("seg",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("bal",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("seq",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("deleted",
        org.apache.spark.sql.types.BooleanType)))
    val stream = s.readStream.schema(srcSchema)
      .option("maxFilesPerTrigger", "4").parquet(src)
    val q = stream.writeStream
      .option("checkpointLocation", graft.TempDirs.scratch("graft-st25-ckpt"))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val sp = batch.sparkSession
        val cached = batch.persist()
        try {
          if (!cached.isEmpty) {
            // (1) LWW-merge the slice into the upstream versioned table
            val reduced = cached.groupBy(col("k"))
              .agg(max_by(struct(cached.columns.map(col): _*),
                col("seq")).as("w"))
              .select(col("w.*"))
            Snapshots.mergeWith(sp, up, reduced,
              tag = Some(s"cdc-batch=$id"))(
              graft.operators.Merge.cdcApply(_, _, Seq("k"),
                Seq("seq"), "deleted"))
            // (2) consume the change feed cursor → head — every
            // SECOND batch, so each consume hops MULTIPLE upstream
            // versions in one cursor advance: the telescoping claim
            // (diff(v1,v3) == diff(v1,v2) + diff(v2,v3)) exercised
            // live, and half the consumer cost
            val cursor = Snapshots.read(sp, cur).head().getLong(0)
            val head = Snapshots.versions(up).last
            if (id % 2 == 1 && head > cursor) {
              val ch = Snapshots.tableChanges(sp, up, cursor, head,
                Seq("k"))
              val delta = ch.filter(!col("deleted"))
                .withColumn("sgn",
                  when(col("_change_type").isin("insert", "update_postimage"),
                    1L).otherwise(-1L))
                .groupBy(col("seg").as("status"))
                .agg(sum(col("sgn")).as("dn"),
                  sum(when(col("sgn") === 1L, col("bal"))
                    .otherwise(-col("bal")).cast(dec)).as("drev"))
              val prev = Snapshots.read(sp, mart)
                .select(col("status"), col("n_live").as("dn"),
                  col("rev_dec").as("drev"))
              val merged = prev.unionByName(delta)
                .groupBy(col("status"))
                .agg(sum(col("dn")).as("n_live"),
                  sum(col("drev")).cast(dec).as("rev_dec"))
                .filter(col("n_live") > 0)
              // (3) mart + cursor advance as ONE transaction
              val curDf = sp.range(head, head + 1)
                .select(col("id").as("last_version"))
              Snapshots.commitTxn(wh, Seq((merged, mart), (curDf, cur)),
                s"cdf-$cursor-$head")
              ()
            }
          }
        } finally { cached.unpersist(); () }
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val live = Snapshots.read(spark, up).filter(!col("deleted"))
    val recompute = live.groupBy(col("seg").as("status"))
      .agg(count(lit(1)).as("n_chk"),
        sum(col("bal").cast(dec)).cast(dec).as("rev_chk"))
    val cursorFinal = Snapshots.read(spark, cur).head().getLong(0)
    val headFinal = Snapshots.versions(up).last
    Snapshots.read(spark, mart).join(recompute, Seq("status"))
      .select(col("status"), col("n_live"),
        col("rev_dec").cast("double").as("revenue"),
        (col("n_live") === col("n_chk") &&
          col("rev_dec") === col("rev_chk")).as("matches_recompute"),
        lit(Snapshots.versions(up).size.toLong).as("up_versions"),
        lit(Snapshots.versions(mart).size.toLong).as("mart_versions"),
        lit(cursorFinal == headFinal).as("cursor_at_head"))
      .orderBy(col("status"))
  }

  /** st26: STREAMING QUALITY GATE — write-side constraints enforced
    * per micro-batch with dead-letter routing (q87's ADD CONSTRAINT
    * contract meeting st14's DLQ, the shape every production ingest
    * runs: validate → route → commit, never land-then-clean): each
    * batch splits on the constraint predicate, the CLEAN slice
    * commits through [[graft.pipeline.Checks.commitChecked]] (checks
    * run BEFORE the commit point on the pinned batch — a violating
    * write leaves no trace), the violating rows append to a
    * merge-on-read dead-letter table (tagged, exactly-once), and the
    * gate's teeth are proven IN-STREAM: the first dirty batch is
    * also offered RAW to the checked writer and the rejection is
    * recorded (`gate_rejects` — not a spec assertion, a live cell).
    * Fixture: `value` nulled for event_id ≡ 0 (mod 11). The result
    * pins: no null ever landed, clean ∪ DLQ partitions the topic
    * EXACTLY, the per-type rollup, and the 4-batch version count.
    * At 100 TB: the gate costs one predicate scan per batch; the
    * DLQ append costs ∝ violations; the check runs on the batch,
    * never the table.
    */
  def st26StreamQualityGate(spark: SparkSession, dir: String): DataFrame = {
    import graft.pipeline.Checks
    import graft.sources.{Mor, Snapshots}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val s = streamSession(spark)
    val src = graft.TempDirs.scratch("graft-st26-src")
    graft.BenchPhase.land {
      graft.Tables(spark, dir, "events")
        .select(col("event_id"), unix_micros(col("ts")).as("ts"),
          col("user_id"), col("event_type"),
          when(col("event_id") % 11 === 0, lit(null).cast("double"))
            .otherwise(col("value")).as("value"))
        .repartition(16).write.mode("overwrite").parquet(src)
    }
    val wh = graft.TempDirs.scratch("graft-st26-wh")
    val fact = s"$wh/events_clean"
    val dlq = s"$wh/events_dlq"
    val gate = Seq(Checks.NotNull("value"))
    @volatile var gateRejects = false
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType)))
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "4").parquet(src)
    val q = stream.writeStream
      .option("checkpointLocation", graft.TempDirs.scratch("graft-st26-ckpt"))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val sp = batch.sparkSession
        val cached = batch.persist()
        try {
          if (!cached.isEmpty) {
            val bad = cached.filter(col("value").isNull).toDF()
            val good = cached.filter(col("value").isNotNull).toDF()
            val hasBad = !bad.isEmpty // one probe job, reused below
            // prove the gate bites: the raw dirty batch must bounce,
            // and the bounced attempt must leave NO trace
            if (!gateRejects && hasBad) {
              gateRejects =
                try { Checks.commitChecked(cached.toDF(), fact, gate); false }
                catch { case _: IllegalStateException => true }
            }
            val state =
              if (Snapshots.versions(fact).nonEmpty)
                Snapshots.read(sp, fact).unionByName(good)
              else good
            // the clean-state commit and the DLQ delta append write
            // DIFFERENT tables — two independent scheduling-dominated
            // commits per batch, submitted concurrently (guide §2.6)
            graft.BenchPhase.land {
              graft.Overlap.pair(
                Checks.commitChecked(state, fact, gate,
                  tag = Some(s"clean-$id")),
                if (hasBad) { Mor.append(bad, dlq, tag = Some(s"dlq-$id")); () }
                else ())
            }
            ()
          }
        } finally { cached.unpersist(); () }
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val clean = Snapshots.read(spark, fact)
    // the three evidence sources (DLQ, raw topic, clean state) are
    // independent — one aggregate each, run concurrently (guide
    // §2.6); the clean-side row count and null count FUSE into a
    // single aggregate job (was two separate count() actions)
    val counts = graft.Overlap.jobs(Seq[() => Any](
      () => Mor.read(spark, dlq).count(),
      () => spark.read.parquet(src).count(),
      () => clean.agg(count(lit(1)), count(when(col("value").isNull, 1))).head()
    ))(_.apply())
    val nDlq = counts(0).asInstanceOf[Long]
    val total = counts(1).asInstanceOf[Long]
    val cleanStats = counts(2).asInstanceOf[org.apache.spark.sql.Row]
    val noNullLanded = cleanStats.getLong(1) == 0
    clean.groupBy(col("event_type").as("etype"))
      .agg(count(lit(1)).as("n_clean"),
        graft.functions.Exact.dsum(col("value"), 4).as("total_value"))
      .withColumn("n_dlq", lit(nDlq))
      .withColumn("partition_exact",
        lit(cleanStats.getLong(0) + nDlq == total))
      .withColumn("no_null_landed", lit(noNullLanded))
      .withColumn("gate_rejects", lit(gateRejects))
      .withColumn("fact_versions",
        lit(Snapshots.versions(fact).size.toLong))
      .orderBy(col("etype"))
  }

  /** st27: STREAMING JOIN-mart maintenance — q125's delta-join
    * algebra under a live stream: keyed lineitem rows arrive in
    * micro-batches and the dim⋈fact monthly revenue mart advances
    * per batch as mart += agg(dim ⋈ ΔL) — the orders dim broadcasts,
    * the batch IS the delta, and the stored mart never rescans a
    * prior batch (the 100 TB streaming-fact shape: per-trigger cost
    * ∝ batch size, mart state ∝ months). Exactly-once: each merge is
    * tagged with its batch id — `mergeWith` short-circuits replays,
    * so crash/redelivery converges on the same mart. The gate is
    * batch-structure invariance itself: the final mart must equal
    * the from-scratch full join (the DuckDB oracle) no matter how
    * the 16 source files sliced into triggers; 5 versions = seed +
    * ceil(16/4) merge commits, pinned.
    */
  def st27StreamJoinIvm(spark: SparkSession, dir: String): DataFrame = {
    val s = streamSession(spark)
    val src = graft.TempDirs.scratch("graft-st27-src")
    // the CDC-honest keyed grain (q125): the raw (orderkey, linenumber)
    // is not unique in this corpus
    graft.BenchPhase.land {
      graft.Tables(spark, dir, "lineitem")
        .groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(count(lit(1)).as("qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).as("price"))
        .repartition(16)
        .write.mode("overwrite").parquet(src)
    }

    val martSchema = StructType(Seq(
      StructField("o_month", StringType),
      StructField("n_items", LongType),
      StructField("rev", DecimalType(38, 2))))
    val table = s"${graft.TempDirs.scratch("graft-st27-tbl")}/join_mv"
    graft.sources.Snapshots.commit(
      s.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        martSchema), table)

    val lkSchema = StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_linenumber", LongType),
      StructField("qty", LongType),
      StructField("price", DecimalType(28, 2))))
    val stream = s.readStream
      .schema(lkSchema)
      .option("maxFilesPerTrigger", "4")
      .parquet(src)
    // the dim side is IDENTICAL across every micro-batch — persist it
    // once for the drain (released below) instead of re-scanning and
    // re-projecting orders per trigger (guide §5 reuse; the broadcast
    // build still runs per batch, the scan no longer does)
    val dim = graft.Tables(s, dir, "orders").select(
      col("o_orderkey"),
      date_format(col("o_orderdate"), "yyyy-MM").as("o_month")).persist()
    val q = stream.writeStream
      .option("checkpointLocation", graft.TempDirs.scratch("graft-st27-ckpt"))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        graft.sources.Snapshots.mergeWith(
          batch.sparkSession, table, batch, tag = Some(s"jm=$id")) { (mat, b) =>
          val delta = broadcast(dim)
            .join(b, col("o_orderkey") === col("l_orderkey"))
            .groupBy(col("o_month"))
            .agg(sum(col("qty")).as("n_items"), sum(col("price")).as("rev"))
          mat.unionByName(
              delta.select(col("o_month"), col("n_items"),
                col("rev").cast("decimal(38,2)").as("rev")))
            .groupBy(col("o_month"))
            .agg(sum(col("n_items")).as("n_items"), sum(col("rev")).as("rev"))
            .select(col("o_month"), col("n_items"),
              col("rev").cast("decimal(38,2)").as("rev"))
        }
        ()
      }
      .start()
    try q.processAllAvailable() finally { q.stop(); dim.unpersist() }

    val nVersions = graft.sources.Snapshots.versions(table).size
    graft.sources.Snapshots.read(spark, table)
      .select(col("o_month"), col("n_items"),
        col("rev").cast("double").as("revenue"),
        lit(nVersions).as("n_versions"))
      .orderBy(col("o_month"))
  }

  /** st28: Spark 4 `transformWithState` — the new arbitrary-state
    * streaming API ([[UserStatsProcessor]]): NAMED, composable state
    * variables (ValueState counters + a MapState histogram) behind
    * the RocksDB state store provider, replacing the single-blob
    * GroupState pattern st02 uses. Every accumulator is order-
    * independent (integer adds on an exact scale-4 unscaled sum,
    * min/max), so the final per-user row is batch-structure
    * invariant; n_events strictly grows, so `max_by(n_events)` over
    * the append-mode emissions IS the final state — no last-batch
    * bookkeeping. The oracle recomputes every statistic from the raw
    * table, including the sorted per-type histogram signature.
    */
  def st28TransformWithState(spark: SparkSession, dir: String): DataFrame = {
    val s = streamSession(spark)
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import s.implicits._
    val stream = eventsStream(s, dir)
      .select(col("user_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("ts"))
      .as[EvTws]
    val out = stream.groupByKey(_.user_id)
      .transformWithState(new UserStatsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Append())
    s.catalog.dropTempView("st28_out")
    locally {
      val q = out.writeStream
        .outputMode("append")
        .format("memory")
        .queryName("st28_out")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    s.table("st28_out")
      .groupBy(col("user_id"))
      .agg(max_by(
        struct(col("n_events"), col("n_types"), col("types_sig"),
          col("total_value"), col("min_ts_ms"), col("max_ts_ms")),
        col("n_events")).as("f"))
      .select(col("user_id"), col("f.n_events"), col("f.n_types"),
        col("f.types_sig"), col("f.total_value"),
        col("f.min_ts_ms"), col("f.max_ts_ms"))
      .orderBy(col("user_id"))
  }

  /** st29: STREAMING INGEST INTO A WRITE-ORDERED TABLE — the
    * persistent write order (q133, `ALTER TABLE … WRITE ORDERED BY`)
    * meeting the micro-batch landing path: a CDC/event landing zone
    * whose EVERY commit stays range-clustered on the query key, so
    * downstream point/range reads prune files immediately — no
    * nightly compaction pass needed before the data is servable
    * (the streaming-ingest complement of q53's after-the-fact
    * compaction). The order is declared ONCE on the table; the
    * foreachBatch writer just calls Mor.append, which clusters each
    * batch because the TABLE says so — writer code stays
    * order-oblivious, exactly the q133 contract. The gate pins: 4
    * micro-batch data commits (maxFilesPerTrigger over the pinned
    * shard count), EVERY commit's per-file user_id bounds pruning a
    * 1/8-domain range predicate, and the rollup restated from raw.
    */
  def st29StreamWriteOrder(spark: SparkSession, dir: String): DataFrame = {
    val s = streamSession(spark)
    val src = graft.TempDirs.scratch("graft-st29-src")
    graft.BenchPhase.land {
      graft.Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
        .repartition(16)
        .write.mode("overwrite").parquet(src)
    }
    val table = s"${graft.TempDirs.scratch("graft-st29-tbl")}/events_ordered"
    // declare the write order BEFORE any data lands: every commit of
    // this table — batch or streaming — clusters on user_id
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(table))
    graft.sources.Snapshots.setTableProperties(table,
      Seq(graft.sources.Mor.WriteOrderProp -> "user_id"))
    val q = s.readStream
      .schema(StructType(Seq(
        StructField("event_id", LongType), StructField("user_id", LongType),
        StructField("event_type", StringType))))
      .option("maxFilesPerTrigger", "4")
      .parquet(src)
      .writeStream
      .option("checkpointLocation", graft.TempDirs.scratch("graft-st29-ckpt"))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        // idempotent tagged append; the TABLE's write order clusters it
        graft.sources.Mor.append(batch, table, tag = Some(s"st29-batch=$id"))
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    // every data commit must prune: per-file user_id bounds vs a
    // 1/8-domain range predicate (manifest-sized work per commit)
    val hi = graft.Tables(spark, dir, "events")
      .agg(max(col("user_id"))).head().getLong(0)
    val (qLo, qHi) = (1L, math.max(1L, hi / 8))
    val dataCommits = graft.sources.Mor.commits(table).filter(_.kind == "data")
    val clustered = dataCommits.forall { c =>
      val bounds = spark.read.parquet(s"$table/c=${c.id}")
        .groupBy(input_file_name().as("f"))
        .agg(min(col("user_id")).as("lo"), max(col("user_id")).as("hi"))
        .collect() // #files rows per commit
      val hit = bounds.count(r => !r.isNullAt(1) &&
        r.getLong(2) >= qLo && r.getLong(1) <= qHi)
      bounds.length > 1 && hit < bounds.length
    }
    graft.sources.Mor.read(spark, table)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("event_id")).as("sum_event_id"))
      .withColumn("n_data_commits", lit(dataCommits.size.toLong))
      .withColumn("all_commits_clustered", lit(clustered))
      .orderBy(col("event_type"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st29_stream_write_order" -> (st29StreamWriteOrder _),
    "st28_transform_with_state" -> (st28TransformWithState _),
    "st27_stream_join_ivm" -> (st27StreamJoinIvm _),
    "st26_stream_quality_gate" -> (st26StreamQualityGate _),
    "st25_stream_cdf" -> (st25StreamCdf _),
    "st24_two_sink_txn" -> (st24StreamTwoSinkTxn _),
    "st23_stream_schema_drift" -> (st23StreamSchemaDrift _),
    "st22_stream_ann_ingest" -> (st22StreamAnnIngest _),
    "st21_stream_hidden_partition" -> (st21StreamHiddenPartition _),
    "st19_observed_metrics" -> (st19ObservedMetrics _),
    "st18_streaming_mv" -> (st18StreamingMv _),
    "st01_stream_window" -> (st01StreamWindow _),
    "st02_stateful_counts" -> (st02StatefulCounts _),
    "st03_stream_static_join" -> (st03StreamStaticJoin _),
    "st04_stream_dedup" -> (st04StreamDedup _),
    "st05_stream_stream_join" -> (st05StreamStreamJoin _),
    "st06_kafka_cdc" -> (st06KafkaCdc _),
    "st07_session_window" -> (st07SessionWindow _),
    "st08_stream_ingest" -> (st08StreamIngest _),
    "st09_cdc_merge" -> (st09CdcMerge _),
    "st10_streaming_ivm" -> (st10StreamingIvm _),
    "st11_stream_left_join" -> (st11StreamLeftJoin _),
    "st12_append_windows" -> (st12AppendWindows _),
    "st13_streaming_sketch" -> (st13StreamingSketch _),
    "st14_dead_letter" -> (st14DeadLetter _),
    "st15_restart_recovery" -> (st15RestartRecovery _),
    "st16_available_now" -> (st16AvailableNow _),
    "st17_mor_cdc" -> (st17MorCdc _)
  )

  // time_bucket's default origin (2000-01-03) is a whole multiple of
  // 6 h from the epoch, so buckets align with Spark's epoch-aligned
  // window() for divisors of 24 h.
  val oracles: Map[String, String] = Map(
    // st29: the streamed write-ordered landing must be lossless (the
    // rollup restates from raw); commit count and per-commit
    // clustering are in-data proofs
    "st29_stream_write_order" ->
      """SELECT event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
        |  CAST(4 AS BIGINT) AS n_data_commits,
        |  TRUE AS all_commits_clustered
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    // st28: every statistic recomputed from the raw table, including
    // the sorted per-type histogram signature
    "st28_transform_with_state" ->
      """WITH tc AS (
        |  SELECT user_id, event_type, COUNT(*) AS c
        |  FROM events GROUP BY 1, 2),
        |sig AS (
        |  SELECT user_id, COUNT(*) AS n_types,
        |    string_agg(event_type || ':' || c, ',' ORDER BY event_type) AS types_sig
        |  FROM tc GROUP BY 1),
        |agg AS (
        |  SELECT user_id, COUNT(*) AS n_events,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
        |    epoch_ms(MIN(ts)) AS min_ts_ms, epoch_ms(MAX(ts)) AS max_ts_ms
        |  FROM events GROUP BY 1)
        |SELECT a.user_id, a.n_events, s.n_types, s.types_sig,
        |  a.total_value, a.min_ts_ms, a.max_ts_ms
        |FROM agg a JOIN sig s ON a.user_id = s.user_id
        |ORDER BY a.user_id""".stripMargin,
    // st27: the streamed, incrementally-maintained join mart must
    // equal the from-scratch full join at the keyed lineitem grain
    // (qty-weighted = the raw join); 5 versions = seed + 16/4 merges
    "st27_stream_join_ivm" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS o_month,
        |  COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  5 AS n_versions
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // st26: clean rows are event_id %11 != 0 (the nulled fixture),
    // DLQ the rest; pins: partition exactness, no-null-landed, the
    // live gate rejection, the 16-file/4-per-trigger version count
    "st26_stream_quality_gate" ->
      """SELECT event_type AS etype,
        |  COUNT(*) AS n_clean,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
        |    AS total_value,
        |  (SELECT COUNT(*) FROM events WHERE event_id % 11 = 0)
        |    AS n_dlq,
        |  TRUE AS partition_exact,
        |  TRUE AS no_null_landed,
        |  TRUE AS gate_rejects,
        |  CAST(4 AS BIGINT) AS fact_versions
        |FROM events WHERE event_id % 11 <> 0
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    // st25: the final upstream state is pure key arithmetic (keys
    // %7==0 deleted, %5==0 at +100, else base — seq LWW makes it
    // batch-order-independent), the CDF-maintained mart telescopes
    // to exactly that state, and the pinned constants are the
    // 16-file / 4-per-trigger landing (4 batches + 1 seed each side)
    "st25_stream_cdf" ->
      """WITH fin AS (
        |  SELECT c_custkey AS k, c_mktsegment AS seg,
        |    c_acctbal +
        |      CASE WHEN c_custkey % 5 = 0 THEN 100.0 ELSE 0.0 END AS price
        |  FROM customer WHERE c_custkey % 7 <> 0)
        |SELECT seg AS status, COUNT(*) AS n_live,
        |  CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  TRUE AS matches_recompute,
        |  CAST(5 AS BIGINT) AS up_versions,
        |  CAST(3 AS BIGINT) AS mart_versions,
        |  TRUE AS cursor_at_head
        |FROM fin GROUP BY 1
        |ORDER BY 1""".stripMargin,
    // st24: the mart accumulates in DECIMAL, so totals are batch-
    // structure-invariant — the oracle knows nothing of the split;
    // version counts are the 16-file / 4-per-trigger arithmetic and
    // consistency is true by the atomic-commit construction
    "st24_two_sink_txn" ->
      """SELECT event_type AS etype,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
        |  TRUE AS mart_matches_fact,
        |  CAST(4 AS BIGINT) AS fact_versions,
        |  CAST(4 AS BIGINT) AS mart_versions
        |FROM events
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    // st23: phase membership is event_id parity — evens landed
    // pre-drift (no event_type → 'unknown'); the pinned constants
    // are the two-files-per-phase landing arithmetic (4 batches),
    // the 3→4 JSON field widths, and the single drift event
    "st23_stream_schema_drift" ->
      """SELECT CASE WHEN event_id % 2 = 0 THEN 'unknown'
        |    ELSE event_type END AS etype,
        |  COUNT(*) AS n_events,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
        |  CAST(4 AS BIGINT) AS n_versions,
        |  CAST(3 AS BIGINT) AS first_width,
        |  CAST(4 AS BIGINT) AS last_width,
        |  CAST(1 AS BIGINT) AS n_drifts
        |FROM events
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    // st22: s15's post-phase serve verbatim — the oracle knows
    // nothing of the micro-batch split, which is the claim: frozen-
    // quantizer appends are batch-structure-invariant
    "st22_stream_ann_ingest" ->
      s"""WITH ${graft.operators.Similarity.annAppendSqlCtes},
         |hits AS (
         |  SELECT p.qid, d.vec_id AS cid, d.cell_id,
         |    ${graft.operators.Similarity.cosSql("q.embedding", "d.embedding")} AS sim
         |  FROM probes p JOIN embeddings q ON q.vec_id = p.qid
         |  JOIN post_corpus d
         |    ON d.cell_id = p.cell_id AND d.vec_id <> p.qid),
         |served AS (
         |  SELECT qid, cid, cell_id, sim,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rnk
         |  FROM hits)
         |SELECT qid, rnk, cid, cell_id, round(sim, 6) AS sim_r
         |FROM served WHERE rnk <= 5
         |ORDER BY qid, rnk""".stripMargin,
    // st21: per-day week rollup from the raw table; partition counts
    // restated from day arithmetic (hit days / all landed days)
    "st21_stream_hidden_partition" ->
      """SELECT CAST(ts AS DATE) AS day,
        |  COUNT(*) AS n_events,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  (SELECT COUNT(DISTINCT CAST(ts AS DATE)) FROM events
        |   WHERE ts >= TIMESTAMP '2024-01-10'
        |     AND ts < TIMESTAMP '2024-01-17') AS partitions_read,
        |  (SELECT COUNT(DISTINCT CAST(ts AS DATE)) FROM events)
        |    AS partitions_total
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-17'
        |GROUP BY 1
        |ORDER BY day""".stripMargin,
    // st19: rollup AND the observed in-flight counters restated from
    // the raw table — the monitor's numbers must be exact
    "st19_observed_metrics" ->
      """SELECT COALESCE(event_type, '(null)') AS event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
        |  (SELECT COUNT(*) FROM events) AS rows_seen,
        |  (SELECT COUNT(*) FROM events WHERE value < 0) AS n_negative,
        |  (SELECT COUNT(*) FROM events WHERE event_type IS NULL) AS n_null_type
        |FROM events
        |GROUP BY 1
        |ORDER BY event_type""".stripMargin,
    // st18: the MV-served answer must equal the straight full-table
    // rollup — exact through every maintenance batch; 5 refreshes =
    // seed + 16 files / 4 per trigger
    "st18_streaming_mv" ->
      """SELECT o_orderstatus,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_orders,
        |  CAST(5 AS BIGINT) AS n_refreshes
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    // st06 = q16's apply semantic after a wire round-trip; the oracle
    // is the same changelog math over the raw table — encode/decode
    // must be lossless for the hash to match.
    // st10 = the IVM-maintained rollup must equal the batch rollup of
    // the raw table exactly; 5 versions = seed + 16/4 maintenance
    // commits (NULL-typed events count rows but not sums, as in SQL).
    "st10_streaming_ivm" ->
      """SELECT event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
        |  5 AS n_versions
        |FROM events
        |GROUP BY 1
        |ORDER BY event_type""".stripMargin,
    // st09 = the storage-side apply of the same changelog: LWW state
    // (soft deletes filtered) must equal the raw-table latest-wins
    // snapshot no matter how the wire shuffled the batches; 5 versions
    // = seed + exactly ceil(16 files / 4 per trigger) merge commits.
    // st17 = the same LWW state as st09, reached MERGE-ON-READ: the
    // merged view after 4 upsert batches + compact must equal the
    // raw-table latest-wins snapshot; 9 commits = 4×(delete+data) + 1
    "st17_mor_cdc" ->
      """WITH ops AS (
        |  SELECT *,
        |    CASE WHEN event_type = 'signup' THEN 'c'
        |         WHEN event_type = 'error' THEN 'd'
        |         ELSE 'u' END AS op
        |  FROM events),
        |ranked AS (
        |  SELECT user_id, op,
        |    CASE WHEN op <> 'd' THEN value END AS value, ts,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM ops)
        |SELECT user_id, op AS last_op, value AS last_value,
        |  epoch_ms(ts) AS last_ts_ms, 9 AS n_commits
        |FROM ranked WHERE rn = 1 AND op <> 'd'
        |ORDER BY user_id""".stripMargin,
    "st09_cdc_merge" ->
      """WITH ops AS (
        |  SELECT *,
        |    CASE WHEN event_type = 'signup' THEN 'c'
        |         WHEN event_type = 'error' THEN 'd'
        |         ELSE 'u' END AS op
        |  FROM events),
        |ranked AS (
        |  SELECT user_id, op,
        |    CASE WHEN op <> 'd' THEN value END AS value, ts,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM ops)
        |SELECT user_id, op AS last_op, value AS last_value,
        |  epoch_ms(ts) AS last_ts_ms, 5 AS n_versions
        |FROM ranked WHERE rn = 1 AND op <> 'd'
        |ORDER BY user_id""".stripMargin,
    "st06_kafka_cdc" ->
      """WITH ops AS (
        |  SELECT *,
        |    CASE WHEN event_type = 'signup' THEN 'c'
        |         WHEN event_type = 'error' THEN 'd'
        |         ELSE 'u' END AS op
        |  FROM events),
        |ranked AS (
        |  SELECT user_id, op, value, ts,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn,
        |    COUNT(*) OVER (PARTITION BY user_id) AS n_ops,
        |    COUNT(CASE WHEN op = 'd' THEN 1 END) OVER (PARTITION BY user_id) AS n_deletes
        |  FROM ops)
        |SELECT user_id, op AS last_op, value AS last_value,
        |  epoch_ms(ts) AS last_ts_ms, n_ops, n_deletes
        |FROM ranked WHERE rn = 1 AND op <> 'd'
        |ORDER BY user_id""".stripMargin,
    // st11 = the left-outer twin: null-padded unmatched purchases,
    // scoped 2 h behind the frontier (the watermark-resolvable set)
    "st11_stream_left_join" ->
      """WITH p AS (
        |  SELECT event_id AS p_id, user_id AS p_user, ts AS p_ts
        |  FROM events WHERE event_type = 'purchase'),
        |v AS (
        |  SELECT event_id AS v_id, user_id AS v_user, ts AS v_ts
        |  FROM events WHERE event_type = 'view'),
        |mx AS (SELECT max(ts) AS max_ts FROM events),
        |j AS (
        |  SELECT p.p_user, p.p_id, v.v_id
        |  FROM p LEFT JOIN v
        |    ON p.p_user = v.v_user
        |   AND v.v_ts >= p.p_ts - INTERVAL 6 HOUR
        |   AND v.v_ts <= p.p_ts
        |  WHERE p.p_ts <= (SELECT max_ts FROM mx) - INTERVAL 2 HOUR)
        |SELECT p_user AS user_id,
        |  COUNT(*) AS n_rows,
        |  COUNT(v_id) AS n_matched_rows,
        |  CAST(SUM(CASE WHEN v_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_unmatched_purchases,
        |  COUNT(DISTINCT p_id) AS n_purchases
        |FROM j GROUP BY 1
        |ORDER BY 1""".stripMargin,
    "st05_stream_stream_join" ->
      """SELECT p.user_id AS user_id,
        |  COUNT(*) AS n_pairs,
        |  COUNT(DISTINCT p.event_id) AS n_purchases_with_view,
        |  COUNT(DISTINCT v.event_id) AS n_distinct_views
        |FROM events p JOIN events v
        |  ON p.user_id = v.user_id
        |  AND p.event_type = 'purchase' AND v.event_type = 'view'
        |  AND v.ts >= p.ts - INTERVAL 6 HOUR AND v.ts <= p.ts
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    "st04_stream_dedup" ->
      """SELECT event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY 1
        |ORDER BY event_type""".stripMargin,
    "st03_stream_static_join" ->
      """SELECT epoch_ms(time_bucket(INTERVAL '1 day', ts)) AS window_start_ms,
        |  c_mktsegment,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    "st02_stateful_counts" ->
      """WITH ranked AS (
        |  SELECT user_id, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events),
        |agg AS (
        |  SELECT user_id,
        |    COUNT(*) AS n_events,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
        |    epoch_ms(MAX(ts)) AS last_ts_ms
        |  FROM events GROUP BY 1)
        |SELECT a.user_id, a.n_events, a.total_value,
        |  r.event_type AS last_event_type, a.last_ts_ms
        |FROM agg a JOIN ranked r ON a.user_id = r.user_id AND r.rn = 1
        |ORDER BY a.user_id""".stripMargin,
    // st12 = only FINALIZED windows (end ≤ max ts − 1 h watermark) —
    // append mode must have emitted exactly that set, once each
    "st12_append_windows" ->
      """WITH mx AS (SELECT max(ts) AS max_ts FROM events),
        |b AS (
        |  SELECT time_bucket(INTERVAL '6 hours', ts) AS w_start,
        |    time_bucket(INTERVAL '6 hours', ts) + INTERVAL '6 hours' AS w_end,
        |    event_type, value
        |  FROM events)
        |SELECT epoch_ms(w_start) AS window_start_ms,
        |  epoch_ms(w_end) AS window_end_ms,
        |  event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM b
        |WHERE w_end <= (SELECT max_ts FROM mx) - INTERVAL '1 hour'
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 3""".stripMargin,
    // st16: two self-terminating AvailableNow invocations must land
    // every event exactly once; 5 = seed + 2 + 2 commits
    "st16_available_now" ->
      """SELECT event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
        |  5 AS n_versions
        |FROM events
        |GROUP BY 1
        |ORDER BY event_type""".stripMargin,
    // st15: after drain + restart + drain, the maintained rollup must
    // equal the one-pass batch rollup; 5 = seed + 2 + 2 merge commits
    "st15_restart_recovery" ->
      """SELECT event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
        |  5 AS n_versions
        |FROM events
        |GROUP BY 1
        |ORDER BY event_type""".stripMargin,
    // st14: the oracle classifies the raw table by the same two
    // corruption rules; valid ∪ dlq must partition it exactly
    "st14_dead_letter" ->
      """WITH cls AS (
        |  SELECT event_type,
        |    CASE WHEN event_id % 13 = 0 THEN 'unparseable'
        |         WHEN event_id % 17 = 0 THEN 'missing_key'
        |         ELSE NULL END AS reason
        |  FROM events)
        |SELECT kind, label, n FROM (
        |  SELECT 'valid' AS kind, event_type AS label, COUNT(*) AS n
        |  FROM cls WHERE reason IS NULL GROUP BY 2
        |  UNION ALL
        |  SELECT 'dlq', reason, COUNT(*) FROM cls
        |  WHERE reason IS NOT NULL GROUP BY 2)
        |ORDER BY kind, label""".stripMargin,
    // st13: the maintained KMV sketch is bit-identical to a single-pass
    // sketch of the whole table (KMV union property), so the estimator
    // itself is exactly oracled; 5 versions = seed + ceil(16/4) merges
    "st13_streaming_sketch" ->
      """WITH hv AS (
        |  SELECT DISTINCT event_type,
        |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
        |  FROM events),
        |ranked AS (
        |  SELECT event_type, hv,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS nd
        |  FROM hv),
        |exact AS (
        |  SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
        |  FROM events GROUP BY 1)
        |SELECT r.event_type, e.n_exact,
        |  CASE WHEN MAX(r.nd) < 128 THEN CAST(MAX(r.nd) AS DOUBLE)
        |       ELSE CAST(127 AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE) /
        |            CAST(MAX(CASE WHEN r.rn = 128 THEN r.hv END) AS DOUBLE) END AS kmv_est,
        |  5 AS n_versions
        |FROM ranked r JOIN exact e ON r.event_type = e.event_type
        |GROUP BY r.event_type, e.n_exact
        |ORDER BY r.event_type""".stripMargin,
    "st01_stream_window" ->
      """SELECT epoch_ms(time_bucket(INTERVAL '6 hours', ts)) AS window_start_ms,
        |  event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    // st08 = the raw-table rollup: every event must land exactly once
    // across the multi-batch snapshot commits for the hash to match
    "st08_stream_ingest" ->
      """SELECT event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    // session_window semantics: a gap >= 30 min of event time starts a
    // new session; the session's end is its last event + the gap
    "st07_session_window" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ms(ts) AS ms, value FROM events),
        |flagged AS (
        |  SELECT user_id, ms, value,
        |    CASE WHEN lag(ms) OVER w IS NULL
        |           OR ms - lag(ms) OVER w >= 1800000 THEN 1 ELSE 0 END AS new_session
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms)),
        |sess AS (
        |  SELECT user_id, ms, value,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ms
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged)
        |SELECT user_id,
        |  MIN(ms) AS session_start_ms,
        |  MAX(ms) + 1800000 AS session_end_ms,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM sess
        |GROUP BY user_id, sid
        |ORDER BY user_id, session_start_ms""".stripMargin
  )
}
