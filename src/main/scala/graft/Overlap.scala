package graft

/** Run INDEPENDENT Spark actions concurrently from a bounded driver
  * thread pool (guide §2.6 "overlap independent jobs"): Spark's
  * scheduler happily runs several jobs at once inside one application
  * — tiny store commits and micro-batch writes are scheduling-
  * dominated, so two independent ones cost max() instead of sum()
  * when submitted from separate threads. FIFO scheduling keeps the
  * back-fill behaviour the guide describes.
  *
  * Failure contract: the FIRST failing action's own exception is
  * rethrown (unwrapped from the pool's ExecutionException), so call
  * sites that catch a specific store error keep working.
  *
  * BenchPhase attribution: workers inherit the CALLER's landing
  * depth — a land-wrapped overlap region accumulates its wall once
  * (the outer frame), never the per-thread sum.
  */
object Overlap {
  def jobs[A, B](items: Seq[A], maxThreads: Int = 4)(f: A => B): Seq[B] = {
    if (items.sizeIs <= 1) items.map(f)
    else {
      val nested = BenchPhase.isLanding
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(items.size, maxThreads))
      try {
        val futs = items.map { a =>
          pool.submit(new java.util.concurrent.Callable[B] {
            def call(): B = if (nested) BenchPhase.runNested(f(a)) else f(a)
          })
        }
        futs.map { fut =>
          try fut.get()
          catch {
            case e: java.util.concurrent.ExecutionException =>
              throw Option(e.getCause).getOrElse(e)
          }
        }
      } finally pool.shutdown()
    }
  }

  /** Two heterogeneous independent actions; returns both results. */
  def pair[A, B](fa: => A, fb: => B): (A, B) = {
    val r = jobs(Seq(0, 1)) { i => if (i == 0) fa else fb }
    (r(0).asInstanceOf[A], r(1).asInstanceOf[B])
  }
}
