package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types._

/** Structured-Streaming surface (SURVEY.md §2.7): the reference's
  * incremental-scroll crawl loop re-expressed as a checkpointed
  * micro-batch pipeline.
  *
  * Mapping: one micro-batch = one "scroll" (test.py:156-166); checkpointed
  * source offsets = `old_scrolls` delta tracking (test.py:163,558);
  * `dropDuplicates` on the natural key + watermark = re-crawl dedup (T3);
  * `Trigger.AvailableNow` = one cron tick draining everything available
  * (definitions.py:32-37 under external scheduling).
  */
object EventStream {

  /** Parquet-compatible schema for streamed event snapshots (ts already
    * µs — streaming sources feed from cleaned batch dumps, not the raw
    * ns fixture).
    */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source ingest: watch a directory of parquet drops.
    * `stateShufflePartitions`: size the stream's STATE partition count
    * to its concurrent-key scale at creation time (pinned into the
    * checkpoint at first start) — see [[StreamConf]]; `None` inherits
    * the session's batch shuffle default.
    */
  def readEvents(spark: SparkSession, dir: String,
                 stateShufflePartitions: Option[Int] = None): DataFrame =
    StreamConf.sessionFor(spark, stateShufflePartitions)
      .readStream.schema(eventSchema).parquet(dir)

  /** T4 — rate limiting: bound each micro-batch to `maxFiles` input
    * files (the streaming analog of the reference's per-scroll pacing
    * sleeps, test.py:136,178,560 — but as backpressure, not wall-clock).
    * `stateShufflePartitions` as on [[readEvents]].
    */
  def readEventsRateLimited(spark: SparkSession, dir: String,
                            maxFiles: Int,
                            stateShufflePartitions: Option[Int] = None): DataFrame =
    StreamConf.sessionFor(spark, stateShufflePartitions)
      .readStream.schema(eventSchema)
      .option("maxFilesPerTrigger", maxFiles)
      .parquet(dir)

  /** Synthetic load via the built-in rate-micro-batch source:
    * `rowsPerBatch` monotonically numbered rows per micro-batch with
    * event-time timestamps — the deterministic smoke/load generator for
    * exercising a streaming topology without a landing zone (the
    * "does my pipeline keep up at N events/s" harness). Batch k carries
    * values [k*rowsPerBatch, (k+1)*rowsPerBatch), so downstream
    * assertions are exact, not timing-dependent.
    */
  def syntheticRate(spark: SparkSession, rowsPerBatch: Int,
                    partitions: Int = 2,
                    stateShufflePartitions: Option[Int] = None): DataFrame =
    StreamConf.sessionFor(spark, stateShufflePartitions)
      .readStream.format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch)
      .option("numPartitions", partitions)
      .load()

  /** Windowed aggregation with late-data handling: 10-minute watermark,
    * 1-hour tumbling windows per event type — state is bounded because the
    * watermark lets Spark drop windows older than the horizon.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
              col("n"), col("sum_value"))

  /** Re-crawl dedup (T3): drop duplicate event_ids within the watermark
    * horizon — the streaming analog of the reference's old_scrolls slice.
    */
  def dedupedEvents(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream attribution join: views matched to purchases by the
    * same user within 30 minutes after the view. Both sides carry
    * watermarks and the join condition carries the time range, so Spark
    * bounds BOTH state stores — a buffered view older than the watermark
    * minus the range can never match a future purchase and is evicted.
    * Inner join semantics: a match emits as soon as both rows have
    * arrived; the watermark exists for eviction, not emission.
    */
  def attributionJoin(events: DataFrame): DataFrame = {
    val v = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
              col("ts").as("view_ts"))
      .withWatermark("view_ts", "30 minutes")
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("buyer_id"), col("event_id").as("purchase_id"),
              col("ts").as("purchase_ts"), col("value"))
      .withWatermark("purchase_ts", "30 minutes")
    v.join(p,
        col("user_id") === col("buyer_id") &&
        col("purchase_ts") >= col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr("interval 30 minutes"))
      .select(col("user_id"), col("view_id"), col("purchase_id"),
              col("view_ts"), col("purchase_ts"), col("value"))
  }

  /** Streaming gap-based sessions (the streaming form of batch q38):
    * watermark-bounded `session_window` state; in append mode a session
    * row emits only once the watermark passes its close (last event +
    * gap), i.e. once it provably cannot extend.
    */
  def sessionCounts(events: DataFrame, gap: String = "20 minutes"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("session_start"),
              col("session_window.end").as("session_end"),
              col("user_id"), col("n"), col("sum_value"))

  /** Sink: partitioned parquet with checkpointed exactly-once file output;
    * AvailableNow drains all pending input then stops (one cron tick).
    */
  def toParquetSink(df: DataFrame, outDir: String, checkpointDir: String):
      DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .outputMode("append")

  /** Idempotent micro-batch write for non-transactional sinks. Plain
    * parquet append is at-least-once under retries: a batch can re-run
    * after its files landed but before the checkpoint committed,
    * duplicating rows. Keying the output by batch_id and dynamically
    * overwriting ONLY that partition makes the replay rewrite its own
    * files instead — the write becomes idempotent, so checkpoint
    * semantics upgrade to effectively exactly-once.
    */
  def writeBatchIdempotent(batch: DataFrame, batchId: Long, outDir: String): Unit =
    batch.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(outDir)

  /** The streaming form: foreachBatch over writeBatchIdempotent. */
  def idempotentSink(df: DataFrame, outDir: String, checkpointDir: String):
      DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        writeBatchIdempotent(batch, id, outDir)
      }

  /** S8 two-table fan-out inside one stream: a single foreachBatch caches
    * the micro-batch and writes both sinks (job_list / com_url in the
    * reference, test.py:577-580).
    */
  def fanOutSink(df: DataFrame, outA: String, outB: String, checkpointDir: String):
      DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        batch.persist()
        try {
          batch.write.mode("append").parquet(outA)
          batch.select(col("event_type")).distinct()
            .write.mode("append").parquet(outB)
        } finally batch.unpersist()
        ()
      }
}
