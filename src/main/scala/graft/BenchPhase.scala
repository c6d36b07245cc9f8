package graft

/** Phase attribution for the bench: fixture-LANDING time vs SERVE
  * time. Warehouse-block entries (q66-q85, s11, st14, …) build their
  * versioned fixture inside the entry itself, so a wall-clock-only
  * bench row mixes "wrote six snapshot versions" with "ran the
  * query" — r9's artifact showed 3-6x apparent slowdowns on untouched
  * code that were really fixture-landing cache pressure, rebuttable
  * only by ad-hoc re-timings. Every store-layer writer (Snapshots/
  * Mor/Transforms commits, Sources landings, direct fixture parquet
  * dumps) now wraps its body in [[land]]; [[Bench]] drains the
  * accumulator per timed run and reports `{land_s, serve_s}` per
  * entry, so a landing-side regression and a serve-side regression
  * are distinguishable from the artifact alone.
  *
  * Reentrancy: nested landing calls (commit → commitWith → write)
  * count once — only the outermost frame on each thread accumulates.
  * Thread-safety: writes from Spark's streaming/foreachBatch threads
  * accumulate atomically; Bench reads are sequential drains.
  */
object BenchPhase {
  private val landNanos = new java.util.concurrent.atomic.AtomicLong(0L)
  private val depth = new ThreadLocal[Integer] {
    override def initialValue(): Integer = 0
  }

  /** Time `body` as fixture-landing work (outermost frame only). */
  def land[T](body: => T): T = {
    val d = depth.get()
    if (d > 0) body
    else {
      depth.set(1)
      val t0 = System.nanoTime()
      try body
      finally {
        landNanos.addAndGet(System.nanoTime() - t0)
        depth.set(0)
      }
    }
  }

  /** Landing seconds accumulated since the last drain; resets to 0. */
  def drainLandSeconds(): Double = landNanos.getAndSet(0L) / 1e9

  /** Is the current thread inside a [[land]] frame? */
  private[graft] def isLanding: Boolean = depth.get() > 0

  /** Run `body` as a NESTED landing frame on this thread — used by
    * [[Overlap]] worker threads so a land-wrapped overlap region
    * accumulates its wall once (the caller's outer frame), not the
    * per-thread sum.
    */
  private[graft] def runNested[T](body: => T): T = {
    val d = depth.get()
    depth.set(d + 1)
    try body finally depth.set(d)
  }
}
