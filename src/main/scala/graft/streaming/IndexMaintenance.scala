package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import graft.ops.{IndexStore, VectorOps}

/** STREAMING maintenance for the persisted IVF-PQ index: the daily-
  * increment path (q129's `appendToIvfPqIndex`) attached to a live
  * embedding stream — new vectors arrive as micro-batches, each batch
  * coarse-assigns + residual-encodes against the FROZEN stored cells
  * and codebook (no retrain), and appends under one atomic snapshot.
  *
  * Exactly-once: foreachBatch is at-least-once under failure — a
  * replayed micro-batch would ingest twice through a naive append. Each
  * batch therefore commits with an idempotency TAG (`stream-<dir-slug>-
  * <batchId>`); [[IndexStore.commitDelta]] skips a tag it has already
  * recorded, so replays are no-ops and the store sees every batch
  * exactly once. The tag log is append-only and survives vacuum, so the
  * replay horizon is not bounded by manifest retention.
  *
  * Serve isolation: a serve planned mid-batch reads the pre-batch
  * snapshot (the IndexStore `_HEAD` protocol) — streaming ingestion
  * never exposes a torn store to concurrent queries. At 100 TB this is
  * the standard "index tailer" deployment: one writer consuming the
  * embedding firehose, any number of serving readers resolving
  * snapshots.
  */
object IndexMaintenance {

  /** Attach incremental index maintenance to an embeddings stream
    * (schema: vec_id, embedding[, label]). Caller starts the returned
    * writer (`.start().awaitTermination()` or a managed trigger). The
    * default AvailableNow trigger drains what exists and stops — the
    * per-tick shape the engine's other streaming gates use; pass a
    * different trigger via `.trigger(...)` on the result to tail
    * continuously. */
  def appendSink(stream: DataFrame, indexDir: String,
                 checkpointDir: String): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty)
          VectorOps.appendToIvfPqIndex(batch.sparkSession, batch, indexDir,
            tag = Some(s"stream-$id"))
      }

  /** Current snapshot version — what a monitoring loop watches to
    * confirm the tailer is publishing. */
  def publishedVersion(indexDir: String): Option[Int] =
    IndexStore.headVersion(indexDir)
}
