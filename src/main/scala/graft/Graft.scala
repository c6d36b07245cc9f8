package graft

import org.apache.spark.sql.SparkSession

/** Session factory — the engine's entry point for users, encoding the
  * session defaults every graft deployment should run with. The same
  * knobs the reference stack sets on its Kyuubi-managed Spark engines
  * (reference: docs/components/kyuubi.md engine configs,
  * docs/architecture/overview.md AQE notes), minus the
  * Iceberg/Metastore wiring this standalone library replaces with
  * plain parquet + temp views.
  *
  * Scale rationale per knob:
  *  - AQE on (default in Spark 4) + coalescePartitions: runtime
  *    re-plan fixes shuffle-partition guesses at any data scale.
  *  - skewJoin: splits oversized partitions on join — the automatic
  *    half of skew handling ([[operators.Skew.saltedJoin]] is the
  *    manual half for aggregate skew).
  *  - shuffle.partitions ≈ cluster cores (not the 200 default): at
  *    100 TB AQE coalesces upward from a sane floor instead of
  *    shredding every stage into 200 tasklets.
  *  - timeZone UTC: cross-engine timestamp determinism (SURVEY.md §4).
  */
object Graft {

  /** Local session (tests/bench): `cores` threads, matching shuffle
    * parallelism, graft extensions installed.
    */
  def localSession(cores: Int, appName: String = "graft"): SparkSession =
    configure(SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      // local drains process small triggers: per-partition state-store
      // fixed cost dominates streaming stages, so cap their width
      // (cluster sessions inherit the session value instead)
      .config(graft.streaming.EventStream.STREAM_SHUFFLE_KEY,
        math.min(cores, 4).toString)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()

  /** Cluster session: caller supplies master/deploy config outside;
    * this sets the engine defaults + extensions. Pass the cluster's
    * total executor-core count for `parallelism`.
    */
  def session(parallelism: Int, appName: String = "graft"): SparkSession =
    configure(SparkSession.builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", parallelism.toString))
      .getOrCreate()

  private def configure(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // typed aggregates here (collect_capped) have bounded buffers —
      // don't let the 128-key default demote them to sort aggregation
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      // programmatic injection works even on a reused SparkContext;
      // the static conf only takes effect on a fresh one (spark-submit)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
}
