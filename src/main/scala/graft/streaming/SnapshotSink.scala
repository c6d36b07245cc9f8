package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.Snapshots

/** Streaming → versioned-table ingestion: every micro-batch commits as
  * a new immutable snapshot — the reference's Kafka→Iceberg sink shape
  * (docs/components/cdc.md) on the [[Snapshots]] store. Exactly-once
  * per batch comes from the manifest-last commit: a crashed batch
  * leaves an orphan directory but never a visible version; downstream
  * readers only ever see fully-committed snapshots, and
  * [[Snapshots.diff]] turns the version history back into a changelog.
  */
object SnapshotSink {

  def ingest(stream: DataFrame, tableDir: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        if (!batch.isEmpty) { Snapshots.commit(batch, tableDir); () }
      }
      .start()
}
