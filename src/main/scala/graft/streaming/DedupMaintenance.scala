package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import graft.ops.{DedupLedger, IndexStore}

/** STREAMING ingest with online deduplication: the dedup ledger
  * (q139/q140) attached to a live document stream. Each micro-batch is
  * deduped against the ledger's CURRENT snapshot — exact sha2 hits and
  * signature-estimated near hits both drop — and the survivors'
  * fingerprints append under one atomic tagged snapshot, so the NEXT
  * micro-batch dedups against everything this one admitted. This is
  * the "firehose ingest" deployment: crawl output streams in, only
  * novel documents accumulate, and the dedup state lives in the store,
  * not in executor memory (unlike `dropDuplicates` watermark state,
  * which a 100 TB corpus could never hold in a state store — the
  * ledger IS the state, already partitioned, compactable, vacuumable).
  *
  * Exactly-once: same discipline as [[IndexMaintenance]] — foreachBatch
  * replays are no-ops through the `stream-<batchId>` idempotency tag.
  * Within a micro-batch, exact duplicates collapse to one appended
  * fingerprint ([[DedupLedger.appendSurvivors]]'s representative rule);
  * near-duplicate pairs WITHIN one micro-batch are deliberately not
  * cross-checked (that is the batch family's job — q49 over the
  * landing zone; a tick-sized batch is small enough to re-run it) —
  * the ledger guards the CROSS-batch axis that batch dedup cannot see.
  */
object DedupMaintenance {

  /** Attach online dedup to a document stream (schema: doc_id, text).
    * The ledger must already be published (build it over the seed
    * corpus first); the returned writer drains available data and
    * stops (AvailableNow — the engine's per-tick convention). */
  def dedupSink(stream: DataFrame, ledgerDir: String,
                checkpointDir: String): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          val b = batch.localCheckpoint() // verdict + append read it twice
          val verdict = DedupLedger.dedupAgainstLedger(
            s, b, ledgerDir, IndexStore.snapshot(ledgerDir))
          DedupLedger.appendSurvivors(
            b.join(verdict.filter(col("keep") === 1L).select(col("doc_id")),
              Seq("doc_id"), "left_semi"),
            ledgerDir, tag = s"stream-$id")
          ()
        }
      }

  /** Snapshot version a monitor watches to confirm the tailer publishes. */
  def publishedVersion(ledgerDir: String): Option[Int] =
    IndexStore.headVersion(ledgerDir)
}
