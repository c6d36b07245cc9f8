package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Query-scoped caching for intermediate tables.
  *
  * Several operators persist a narrow intermediate that feeds two or
  * more branches of one query plan (e.g. an LSH bucket table read by
  * both sides of a self-join). A bare `.persist()` there leaks: the
  * cache entry outlives the query and accumulates across a long-lived
  * session (a driver running ~100 queries in one SparkSession would
  * pin every intermediate until LRU pressure). `scoped` keeps the
  * persist but registers the table for release once an execution that
  * CONSUMED it completes.
  *
  * Release is keyed to the consuming query: each pending entry records
  * its analyzed plan, and a completed execution releases only entries
  * whose plan appears as a subtree of that execution's analyzed plan
  * (cache substitution happens later, at `withCachedData`, so the
  * original subtree is still present there). An unrelated action —
  * another query interleaved between construction and terminal action,
  * or a driver running two actions on one query (count then collect:
  * both contain the subtree, and only the SECOND-to-run matters for
  * the cache's purpose; the first consumed it too, so releasing after
  * either is release-after-use, and a re-run recomputes from lineage)
  * — can no longer drop a cache it never read.
  *
  * Semantics: release is a cache hint removal, never a correctness
  * event — if an intermediate is dropped early, Spark recomputes it
  * from lineage. An entry whose owning query is abandoned without ever
  * running an action stays persisted until [[drain]] or session GC —
  * same as the bare `.persist()` it replaces.
  */
object Caches {
  private final case class Entry(df: DataFrame, plan: LogicalPlan)
  private val pending = new ConcurrentLinkedQueue[Entry]()
  // weak: a stopped/abandoned SparkSession must not stay pinned by
  // this registry in a long-lived multi-session JVM
  private val hooked = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  /** Persist `df` and schedule its release after the next completed
    * action that consumed it. Returns `df` for chaining.
    */
  def scoped(df: DataFrame): DataFrame = {
    df.persist()
    deferRelease(df)
  }

  /** Schedule an ALREADY-persisted table for release after the next
    * completed action that consumes it — for operators that run eager
    * actions of their own mid-construction (e.g. an iterative
    * fixpoint) and must keep the cache alive through them, deferring
    * release to the caller's terminal action over a plan that embeds
    * the table.
    */
  def deferRelease(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    if (hooked.add(spark)) {
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
            durationNs: Long): Unit = releaseConsumedBy(qe)
        override def onFailure(funcName: String, qe: QueryExecution,
            exception: Exception): Unit = releaseConsumedBy(qe)
      })
    }
    pending.add(Entry(df, df.queryExecution.analyzed))
    df
  }

  /** Release pending entries that `qe`'s plan consumed (subtree match
    * by `sameResult` on analyzed plans; failure counts — the query is
    * done with the cache either way).
    */
  private def releaseConsumedBy(qe: QueryExecution): Unit = {
    val it = pending.iterator()
    while (it.hasNext) {
      val e = it.next()
      val consumed =
        try qe.analyzed.exists(_.sameResult(e.plan))
        catch { case _: Throwable => true } // unresolvable → free it
      if (consumed) {
        it.remove()
        try e.df.unpersist(blocking = false)
        catch { case _: Throwable => () } // session already stopped
      }
    }
  }

  /** Force-release every scheduled intermediate (idempotent) — session
    * teardown / explicit cache hygiene points.
    */
  def drain(): Unit = {
    var e = pending.poll()
    while (e != null) {
      try e.df.unpersist(blocking = false)
      catch { case _: Throwable => () }
      e = pending.poll()
    }
  }
}
