package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: one untimed warmup pass (absorbs JVM/codegen/file-
  * index init, as any steady-state engine would), then a timed pass.
  * Prints ONE JSON line for the driver.
  */
object Bench {
  /** Short ids benched in round 4 — update each round after the
    * driver snapshots BENCH_r{N}.json (basis of total_shared_prev). */
  private val PREV_ROUND_IDS: Set[String] =
    ((1 to 58).map(i => f"q$i%02d") ++ (1 to 9).map(i => f"t$i%02d") ++
      (1 to 8).map(i => f"d$i%02d") ++ (1 to 8).map(i => f"s$i%02d") ++
      (1 to 11).map(i => f"p$i%02d") ++ (1 to 3).map(i => f"m$i%02d") ++
      (1 to 4).map(i => f"a$i%02d") ++ (1 to 6).map(i => f"st$i%02d")).toSet

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // streaming stateful stages: per-trigger volume here is tiny, so
      // state-store count (∝ partitions) dominates — see STREAM_SHUFFLE_KEY
      .config(graft.streaming.EventStream.STREAM_SHUFFLE_KEY, "4")
      // graft's typed aggregates (collect_capped) carry bounded
      // buffers; Spark's 128-key sort fallback would wrongly demote
      // their hash aggregation on high-cardinality gram keys
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case _: Throwable => () }
      spark.catalog.clearCache() // release per-query persisted intermediates
    }
    // ---- ambient-load instrumentation -------------------------------
    // r8's verdict flagged >2x rows that a same-tree quiet-host run
    // measured at ~1x: the driver host ran OTHER work during those
    // timings. The artifact itself now carries the evidence: per run,
    // sample (a) the 1-min loadavg — total host demand INCLUDING this
    // bench — and (b) this JVM's own CPU share (process-CPU-seconds /
    // wall). `ambient ≈ sysload − own_parallelism`: when a row's wall
    // time doubles while its own CPU share holds and sysload exceeds
    // it by several cores, the inflation came from outside this
    // process. Per-entry maxima land in BENCH-FULL.json (`sysload`,
    // `owncpu` for flagged entries; `ncpu`, `n_ambient` always), so
    // an ambient-vs-regression call is auditable from the artifact
    // alone — no second quiet-host run needed to explain a spike.
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def loadAvg(): Double =
      try java.nio.file.Files
        .readString(java.nio.file.Paths.get("/proc/loadavg"))
        .split(" ")(0).toDouble
      catch { case _: Throwable => osBean.getSystemLoadAverage }
    // `ncpu` echoes the CONFIGURED core count ($SPARK_GRAFT_CPUS — what
    // the session actually runs with), not the host's processor count:
    // the driver benches at two core counts and a host-count ncpu
    // mislabels the low-core artifact (r10 verdict item 2). The host
    // count still feeds the ambient-load bar (host capacity is what
    // ambient load is measured against) and lands in BENCH-FULL.
    val ncpu = cpus.toInt
    val hostCpus = Runtime.getRuntime.availableProcessors
    // (wall sec, sysload sample, own parallelism) of the last timed run
    var lastLoad = (0.0, 0.0)
    // fixture-LANDING seconds inside the last timed run (store-layer
    // writers accumulate into BenchPhase; see BenchPhase.scala) — the
    // r9 verdict's top item: warehouse-block entries build versioned
    // fixtures in-entry, so a wall-only row can't distinguish "landing
    // got slower under 264-entry cache pressure" from "the serve plan
    // regressed". serve_s = wall − land_s per entry, in-artifact.
    var lastLand = 0.0
    def timed(name: String): Double = {
      // untimed GC breather: without it a query pays for its
      // predecessors' garbage (measured multi-second swings on the
      // heaviest queries in a ~100-query session)
      System.gc()
      BenchPhase.drainLandSeconds() // reset: charge only this run's landing
      val cpu0 = osBean.getProcessCpuTime
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).count() }
      catch { case _: Throwable => -1L }
      val wallNs = System.nanoTime() - t0
      val dt = wallNs / 1e9
      val own = if (wallNs > 0) (osBean.getProcessCpuTime - cpu0).toDouble / wallNs
        else 0.0
      lastLoad = (loadAvg(), own)
      lastLand = math.min(BenchPhase.drainLandSeconds(), dt)
      spark.catalog.clearCache() // untimed; keeps later queries unpressured
      dt
    }
    // heavy queries (>1 s) get a second timed run and report the MIN:
    // single-pass totals swung ~10% run-to-run from ambient load/GC,
    // almost entirely on the heavy tail; re-running only that tail
    // bounds the noise without doubling bench wall time. The |t1-t2|
    // divergence is kept and reported as `spread`, so ambient-variance
    // claims about any heavy query are verifiable from the artifact
    // alone (min-of-2 discards exactly that information otherwise).
    // An EXCURSION (t1/t2 divergence beyond both an absolute and a
    // relative bar) gets a THIRD timed run: two-of-three healthy
    // samples distinguish one-off ambient load (driver host runs
    // other work) from a real intermittent — min-of-2 alone can't,
    // which let r7's d14/s10/p15 spreads (8.5/8.4/4.3 s on healthy
    // mins) read as unexplained. All samples land in BENCH-FULL's
    // `runs`, so the claim is auditable from the artifact.
    // EVERY query is timed at least twice (min-of-2). Sub-1 s queries
    // used to be timed once as a cost optimization — which let single
    // noisy samples of 0.1-0.3 s queries read as 2x-baseline rows
    // (r8's q33/t01/t04). Re-timing the small entries costs seconds
    // across the whole bench and leaves no unreplicated number in the
    // artifact; heavy entries keep the excursion third run.
    val results = names.map { name =>
      val t1 = timed(name)
      val l1 = lastLoad
      val land1 = lastLand
      val t2 = timed(name)
      val two = Seq(t1, t2)
      val loads = Seq(l1, lastLoad)
      val lands2 = Seq(land1, lastLand)
      val (runs, allLoads, lands) =
        if (t1 > 1.0 && two.max - two.min > math.max(1.5, 0.75 * two.min)) {
          val t3 = timed(name)
          (two :+ t3, loads :+ lastLoad, lands2 :+ lastLand)
        } else (two, loads, lands2)
      // phase split of the REPORTED (min) run: land_s from the store-
      // layer accumulator, serve_s the remainder
      val minIdx = runs.indexOf(runs.min)
      (name, runs.min, Some(runs),
        allLoads.map(_._1).max, allLoads.map(_._2).max, lands(minIdx))
    }
    // The driver captures only a bounded (~2000 char) tail of stdout
    // and json-parses the single metric line. At 100+ queries the full
    // per-query map no longer fits (round 5's driver artifact records
    // `parsed: None` — the line's HEAD was truncated away), so the
    // full map now goes to a FILE (BENCH-FULL.json, committed with the
    // repo) and stdout carries a short line that always parses: totals,
    // the 20 heaviest queries (the plan-audit tier), and the spread.
    // Locale.ROOT: a comma-decimal default locale would emit 0,123 and
    // break the JSON parse.
    def s3(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    def short(k: String): String = k.takeWhile(_ != '_')
    def jmap(kv: Seq[(String, Double)]): String =
      kv.map { case (k, d) => "\"" + k + "\":" + s3(d) }.mkString("{", ",", "}")
    val perQuery = results.map { case (k, v, _, _, _, _) => short(k) -> v }
    // per-entry {land, serve} of the reported run — only entries with
    // measurable landing work (the warehouse/index/stream-fixture
    // block); pure-compute entries are all-serve by construction
    val phases = results.collect {
      case (k, v, _, _, _, land) if land > 0.05 =>
        (short(k), land, math.max(0.0, v - land))
    }
    // spread = max−min over the 2nd-closest pair: with 3 samples the
    // single outlier is excluded (median−min), so an ambient one-off
    // no longer inflates the reported spread while the raw `runs`
    // keep the full evidence
    val spreadAll = results.collect { case (k, _, Some(rs), _, _, _) =>
      val sorted = rs.sorted
      (short(k), sorted(math.min(1, sorted.size - 1)) - sorted.head)
    }
    val runsAll = results.collect { case (k, _, Some(rs), _, _, _) if rs.size > 2 =>
      short(k) -> rs
    }
    // ambient-suspect: the host demanded several cores more than this
    // bench itself used during at least one of the entry's runs —
    // the row's wall time is not trustworthy as a plans verdict
    val ambientBar = math.max(2.0, 0.25 * hostCpus)
    val ambient = results.collect {
      case (k, _, _, sys, own, _) if sys - own > ambientBar =>
        (short(k), sys, own)
    }
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // Like-for-like subtotal over the ROUND-4 query set (the standing
    // BASELINE-LOCAL.md yardstick), so round-over-round regressions
    // aren't masked by operator growth.
    val sharedPrev = results
      .filter { case (k, _, _, _, _, _) => PREV_ROUND_IDS(short(k)) }
      .map(_._2).sum
    def jruns(kv: Seq[(String, Seq[Double])]): String =
      kv.map { case (k, rs) =>
        "\"" + k + "\":[" + rs.map(s3).mkString(",") + "]"
      }.mkString("{", ",", "}")
    val jambient = ambient.sortBy(_._1).map { case (k, sys, own) =>
      "\"" + k + "\":[" + s3(sys) + "," + s3(own) + "]"
    }.mkString("{", ",", "}")
    val jphases = phases.sortBy(_._1).map { case (k, land, serve) =>
      "\"" + k + "\":{\"land_s\":" + s3(land) + ",\"serve_s\":" + s3(serve) + "}"
    }.mkString("{", ",", "}")
    val fullLine =
      s"""{"metric":"total","value":${s3(total)},"unit":"sec","n_queries":${results.size},"total_shared_prev":${s3(sharedPrev)},"ncpu":$ncpu,"ncpu_host":$hostCpus,"n_ambient":${ambient.size},"ambient":$jambient,"phases":$jphases,"spread":${jmap(spreadAll.sortBy(_._1))},"runs":${jruns(runsAll.sortBy(_._1))},"queries":${jmap(perQuery)},"sf":"$sfDir"}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH-FULL.json"), fullLine + "\n")
    catch { case _: Throwable => () } // read-only cwd: stdout still carries the summary
    // ---- reporting contract (r10 verdict item 1) ---------------------
    // The metric line must be the process's LAST stdout line and carry
    // the FULL per-query map: every round r4-r10 the driver recorded
    // `parsed: null` because the line was printed BEFORE session
    // teardown — a late StateStore-maintenance WARN stack and sbt's
    // epilogue landed after it. So: quiesce the streaming state-store
    // maintenance timer, stop the session, silence late shutdown log
    // chatter, THEN print. (build.sbt routes forked output straight to
    // stdout and suppresses sbt's [success] trailer.) Timing
    // methodology above is byte-for-byte unchanged.
    try {
      val ss = Class.forName(
        "org.apache.spark.sql.execution.streaming.state.StateStore$")
      ss.getMethod("stop").invoke(ss.getField("MODULE$").get(null))
    } catch { case _: Throwable => () }
    try spark.sparkContext.setLogLevel("OFF") catch { case _: Throwable => () }
    spark.stop()
    println(s"""{"metric":"total","value":${s3(total)},"unit":"sec","n_queries":${results.size},"total_shared_prev":${s3(sharedPrev)},"ncpu":$ncpu,"n_ambient":${ambient.size},"full_per_query":"BENCH-FULL.json","queries":${jmap(perQuery)},"sf":"$sfDir"}""")
    System.out.flush()
  }
}
