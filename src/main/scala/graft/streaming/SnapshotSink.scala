package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.Snapshots

/** Streaming → versioned-table ingestion: every micro-batch commits as
  * a new immutable snapshot — the reference's Kafka→Iceberg sink shape
  * (docs/components/cdc.md) on the [[Snapshots]] store.
  *
  * foreachBatch is AT-LEAST-ONCE: a batch replayed after a crash
  * between `Snapshots.commit` and the checkpoint write arrives again
  * with the SAME batchId. The commit is made idempotent on that id —
  * each committed version is tagged `batch=<id>` in the manifest, and
  * a replayed batch whose tag is already present is skipped, so the
  * end-to-end result is exactly-once per batch. A crashed in-flight
  * batch leaves an orphan `v=<n>` directory but never a visible
  * version (manifest-last commit); [[Snapshots.diff]] turns the
  * version history back into a changelog.
  */
object SnapshotSink {

  /** Start the ingestion query.
    *
    * `filesPerBatch` > 0 coalesces each micro-batch before the commit
    * — the inline half of small-file maintenance (streaming batches
    * are tiny relative to shuffle parallelism, and a file per shuffle
    * partition per batch is how lakehouse tables degrade).
    * `retainVersions` > 0 expires older versions after each commit
    * (incremental-store retention: keep the changelog tail consumers
    * still need, reclaim the rest — Iceberg expire_snapshots run
    * inline instead of as a side DAG).
    */
  def ingest(stream: DataFrame, tableDir: String,
      filesPerBatch: Int = 0, retainVersions: Int = 0): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        val tag = s"batch=$batchId"
        // fast-path skip for replays; the authoritative idempotency
        // re-check happens INSIDE Snapshots.commit's manifest lock,
        // which closes the zombie-writer double-commit window
        if (!Snapshots.committedTags(tableDir).contains(tag)) {
          // persist: the batch is read twice (emptiness probe + the
          // parquet write) — without it the upstream pipeline runs
          // twice per micro-batch
          val cached = batch.persist()
          try {
            if (!cached.isEmpty) {
              val shaped =
                if (filesPerBatch > 0) cached.coalesce(filesPerBatch) else cached
              Snapshots.commit(shaped, tableDir, tag = Some(tag))
              if (retainVersions > 0) {
                Snapshots.expireSnapshots(tableDir, retainVersions); ()
              }
            }
          } finally { cached.unpersist(); () }
        }
      }
      .start()
}
