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

  /** File-source ingest: watch a directory of parquet drops. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** T4 — rate limiting: bound each micro-batch to `maxFiles` input
    * files (the streaming analog of the reference's per-scroll pacing
    * sleeps, test.py:136,178,560 — but as backpressure, not wall-clock).
    */
  def readEventsRateLimited(spark: SparkSession, dir: String,
                            maxFiles: Int): DataFrame =
    spark.readStream.schema(eventSchema)
      .option("maxFilesPerTrigger", maxFiles)
      .parquet(dir)

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
