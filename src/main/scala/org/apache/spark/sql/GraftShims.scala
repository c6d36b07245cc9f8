package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Narrow bridge into `private[sql]` Spark internals, kept to the one
  * call the engine needs: re-wrapping an `RDD[InternalRow]` produced
  * by `queryExecution.toRdd` back into a DataFrame WITHOUT a
  * Row-encoder round trip (`createDataFrame(rdd: RDD[Row], …)` would
  * deserialize/reserialize every row on the hot path).
  *
  * Lives in `org.apache.spark.sql` purely for package-private access;
  * uses only stable internals (LogicalRDD via internalCreateDataFrame,
  * present since Spark 2.0).
  */
object GraftShims {

  def internalCreateDataFrame(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /** Clone `spark` (shared SparkContext/SharedState — so the cache
    * manager and catalog tables carry over; cloned SessionState — so
    * conf, temp views and functions are copied, then isolated) and
    * apply `entries` to the CLONE's conf only. This is how an operator
    * scopes a conf override (e.g. a narrower shuffle width for an
    * iterative fixpoint, or streaming-specific tuning) to its own
    * plans: queries planned concurrently on the original session are
    * untouched — no session-global set/restore window.
    */
  def cloneWithConf(spark: SparkSession, entries: (String, String)*): SparkSession = {
    val c = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()
    entries.foreach { case (k, v) => c.conf.set(k, v) }
    c
  }

  /** Block until the shared listener bus has delivered every queued
    * event (bounded wait). Streaming progress/termination events ride
    * the async bus; a reader that aggregates them through a
    * StreamingQueryListener must drain the bus after `q.stop()` or it
    * races the last batches' deliveries.
    */
  def waitListenerBusEmpty(spark: SparkSession, timeoutMs: Long = 30000L): Unit =
    try spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: Throwable => () } // timeout: proceed with what arrived

  /** Re-root an already-analyzed DataFrame onto another session (same
    * SparkContext): the plan is re-planned under `spark`'s conf, and
    * cached tables still resolve (the CacheManager is in SharedState
    * and matches by canonicalized plan, not by session).
    */
  def reRoot(spark: SparkSession, df: DataFrame): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession],
      df.queryExecution.analyzed)
}
