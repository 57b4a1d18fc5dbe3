package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types._
import graft.jobs.JobOps

/** The reference's production path (SURVEY.md §3 E1) as one Structured
  * Streaming pipeline: crawl-snapshot JSON drops land in a watched
  * directory (one drop = one "scroll"/cron tick), flow through the
  * cleaning operators, dedup on the natural key, and append to a
  * partitioned parquet `jobs` table — checkpointed end to end, so a
  * killed run resumes at the same offset (the `old_scrolls` cursor,
  * test.py:558, for free).
  */
object JobSnapshotStream {

  /** Raw snapshot schema (the crawler's list+detail fields; streaming
    * sources need an explicit schema — no inference on a stream).
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("job_name", StringType),
    StructField("job_url", StringType),
    StructField("company", StringType),
    StructField("update_date", StringType),
    StructField("tag", StringType),
    StructField("applicants", StringType),
    StructField("management", StringType),
    StructField("tools", StringType),
    StructField("education", StringType),
    StructField("salary", StringType),
    StructField("crawl_ts", TimestampType)))

  /** `stateShufflePartitions`: size the stream's STATE partition count
    * to its concurrent-key scale at creation time (it is pinned into the
    * checkpoint at first start) — see [[StreamConf]]. `None` inherits
    * the session's batch shuffle default.
    */
  def readSnapshots(spark: SparkSession, dir: String,
                    stateShufflePartitions: Option[Int] = None): DataFrame =
    StreamConf.sessionFor(spark, stateShufflePartitions)
      .readStream.schema(rawSchema).json(dir)

  /** One file per micro-batch, oldest first — the reference's
    * one-scroll-per-tick pacing (T4), and the shape that makes the
    * error-budget stop deterministic (each tick's errors are observed
    * before the next tick starts). `stateShufflePartitions` as on
    * [[readSnapshots]].
    */
  def readSnapshotsPaced(spark: SparkSession, dir: String,
                         stateShufflePartitions: Option[Int] = None): DataFrame =
    StreamConf.sessionFor(spark, stateShufflePartitions)
      .readStream.schema(rawSchema)
      .option("maxFilesPerTrigger", 1).json(dir)

  /** A snapshot row that failed extraction (the reference's per-record
    * try/except, test.py:129-144): no parseable job URL means no record
    * key — the row is counted against the error budget and never
    * reaches the sink.
    */
  def isCorrupt: org.apache.spark.sql.Column =
    col("job_url").isNull || !col("job_url").startsWith("https://www.104.com.tw/job/")

  /** The cleaning stage — identical operators to the batch path
    * (JobOps), applied to the stream: plan-level reuse, no forked logic.
    */
  def clean(raw: DataFrame): DataFrame =
    raw.select(
      trim(col("job_name")).as("job_name"),
      col("job_url"),
      trim(col("company")).as("company"),
      JobOps.cleanUpdateDate(col("update_date")).as("update_date"),
      JobOps.activelyHiringFlag(col("tag")).as("actively_hiring"),
      JobOps.cleanApplicants(col("applicants")).as("applicants"),
      JobOps.applyCode(col("job_url")).as("apply_code"),
      col("management"), col("tools"), col("education"), col("salary"),
      coalesce(col("crawl_ts"), current_timestamp()).as("crawl_ts"))
    .withColumn("quality", JobOps.rowQualityFlag(
      Seq("job_name", "company", "update_date", "applicants", "management",
          "tools", "education", "salary"), threshold = 4))

  /** Re-crawl dedup on job_url within the watermark horizon (T3). */
  def dedup(cleaned: DataFrame): DataFrame =
    cleaned.withWatermark("crawl_ts", "1 hour")
      .dropDuplicatesWithinWatermark("job_url")

  def toJobsTable(df: DataFrame, outDir: String, checkpointDir: String,
                  trigger: Trigger = Trigger.AvailableNow()):
      DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .outputMode("append")
}
