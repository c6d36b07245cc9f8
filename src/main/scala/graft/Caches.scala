package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Query-scoped caching for intermediate tables.
  *
  * Several operators persist a narrow intermediate that feeds two or
  * more branches of one query plan (e.g. an LSH bucket table read by
  * both sides of a self-join). A bare `.persist()` there leaks: the
  * cache entry outlives the query and accumulates across a long-lived
  * session (a driver running ~90 queries in one SparkSession would pin
  * every intermediate until LRU pressure). `scoped` keeps the persist
  * but registers the table for release as soon as the NEXT action in
  * the session completes — the earliest point at which the enclosing
  * query can have finished consuming it.
  *
  * Semantics: release is a cache hint removal, never a correctness
  * event — if an intermediate is dropped early (e.g. an unrelated
  * action interleaves between query construction and its action, or a
  * later re-run of the same DataFrame), Spark recomputes it from
  * lineage. In the serial build-then-act pattern of the bench/verify
  * drivers the release always lands exactly after the query's own
  * terminal action.
  */
object Caches {
  private val pending = new ConcurrentLinkedQueue[DataFrame]()
  // weak: a stopped/abandoned SparkSession must not stay pinned by
  // this registry in a long-lived multi-session JVM
  private val hooked = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  /** Persist `df` and schedule its release after the next completed
    * action on `df`'s session. Returns `df` for chaining.
    */
  def scoped(df: DataFrame): DataFrame = {
    df.persist()
    deferRelease(df)
  }

  /** Schedule an ALREADY-persisted table for release after the next
    * completed action — for operators that run eager actions of their
    * own mid-construction (e.g. an iterative fixpoint) and must keep
    * the cache alive through them, deferring release to the caller's
    * terminal action.
    */
  def deferRelease(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    if (hooked.add(spark)) {
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
            durationNs: Long): Unit = drain()
        override def onFailure(funcName: String, qe: QueryExecution,
            exception: Exception): Unit = drain()
      })
    }
    pending.add(df)
    df
  }

  /** Release every scheduled intermediate (idempotent, non-blocking). */
  def drain(): Unit = {
    var df = pending.poll()
    while (df != null) {
      try df.unpersist(blocking = false)
      catch { case _: Throwable => () } // session already stopped
      df = pending.poll()
    }
  }
}
