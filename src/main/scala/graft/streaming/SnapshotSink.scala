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

  def ingest(stream: DataFrame, tableDir: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        val tag = s"batch=$batchId"
        if (!Snapshots.committedTags(tableDir).contains(tag) && !batch.isEmpty) {
          Snapshots.commit(batch, tableDir, tag = Some(tag)); ()
        }
      }
      .start()
}
