package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.EventStream

class StreamingSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("E2E: landing zone -> streaming dedup -> exactly-once curated zone") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.streaming.StatefulOps
    import graft.streaming.StatefulOps.DocRow
    val inZone = tmp("zone-in"); val outZone = tmp("zone-out"); val ckpt = tmp("zone-ckpt")

    def snapshot(kw: String, file: String, rows: Seq[String]): Unit = {
      val dir = new java.io.File(inZone, kw); dir.mkdirs()
      val w = new java.io.PrintWriter(new java.io.File(dir, file), "UTF-8")
      try rows.foreach(w.println) finally w.close()
    }
    def runOnce(): Unit = {
      import spark.implicits._
      val src = spark.readStream.format("graft-keyword")
        .option("fields", "job_id:long,text").load(inZone)
        .select(col("job_id").as("doc_id"), col("text")).as[DocRow]
      val q = StatefulOps.streamingDedup(src)
        .select(lit("curated").as("keyword"), col("doc_id"), col("content_hash"))
        .writeStream.format("graft-keyword")
        .option("fields", "doc_id:long,content_hash")
        .option("path", outZone).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).outputMode("append").start()
      q.awaitTermination(60000)
    }

    // tick 1: two keywords land overlapping docs (cross-keyword dup 1)
    snapshot("scala", "s1.json", Seq(
      """{"job_id": 1, "text": "spark streams data"}""",
      """{"job_id": 2, "text": "unique scala doc"}"""))
    snapshot("spark", "p1.json", Seq(
      """{"job_id": 3, "text": "spark streams data"}"""))
    runOnce()
    // tick 2: a re-crawl lands doc 1's text again plus one new doc
    snapshot("scala", "s2.json", Seq(
      """{"job_id": 9, "text": "spark streams data"}""",
      """{"job_id": 4, "text": "fresh second tick"}"""))
    runOnce()

    // curated zone holds each distinct text once (min doc_id won), and
    // only committed epoch files are visible
    val out = spark.read.format("graft-keyword")
      .option("fields", "doc_id:long,content_hash").load(outZone)
    val ids = out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 4L), s"got $ids")
    assert(out.select("content_hash").distinct().count() == 3)
  }

  test("file-stream ingest -> windowed agg -> parquet sink (AvailableNow)") {
    import spark.implicits._
    val inDir = tmp("stream-in")
    val outDir = tmp("stream-out")
    val ckpt = tmp("stream-ckpt")

    // one "scroll" batch dropped into the watched directory
    val batch = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:05:00"), 7L, "click", 1.5, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:20:00"), 7L, "click", 2.5, "{}"),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 01:10:00"), 8L, "view", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    batch.write.mode("append").parquet(inDir)

    val q = EventStream.toParquetSink(
      EventStream.windowedCounts(EventStream.readEvents(spark, inDir)),
      outDir, ckpt).start()
    q.awaitTermination(60000)

    // append mode only emits windows the watermark has passed: watermark =
    // 01:10 - 10min = 01:00 finalizes exactly the [00:00, 01:00) window.
    val got = spark.read.parquet(outDir).collect()
    assert(got.length == 1)
    assert(got(0).getAs[String]("event_type") == "click")
    assert(got(0).getAs[Long]("n") == 2L)

    // a later tick advances the watermark and flushes the 01:00 window
    Seq((4L, java.sql.Timestamp.valueOf("2024-01-01 02:30:00"), 9L, "click", 4.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("append").parquet(inDir)
    val q2 = EventStream.toParquetSink(
      EventStream.windowedCounts(EventStream.readEvents(spark, inDir)),
      outDir, ckpt).start()
    q2.awaitTermination(60000)
    val after = spark.read.parquet(outDir).collect()
    assert(after.length == 2)
    assert(after.exists(r => r.getAs[String]("event_type") == "view"))
  }

  test("rate-micro-batch source drives a pipeline with exact per-batch values") {
    import org.apache.spark.sql.streaming.Trigger
    // batch 0 of rowsPerBatch=100 carries exactly values 0..99 —
    // deterministic, so the grouped output is exact, not timing-dependent
    val q = EventStream.syntheticRate(spark, rowsPerBatch = 100)
      .withColumn("bucket", pmod(col("value"), lit(10L)))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_v"))
      .writeStream.format("memory").queryName("rate_demo")
      .outputMode("complete").trigger(Trigger.Once()).start()
    q.awaitTermination(60000)
    val got = spark.table("rate_demo").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == (0L until 10L).toSet)
    // bucket b holds {b, b+10, ..., b+90}: n=10, sum = 10b + 450
    (0L until 10L).foreach { b =>
      assert(got(b) == ((10L, 10 * b + 450L)), s"bucket $b -> ${got(b)}")
    }
  }

  test("maxFilesPerTrigger bounds each micro-batch to one file (T4)") {
    import spark.implicits._
    val inDir = tmp("rate-in"); val ckpt = tmp("rate-ckpt")
    // three separate file drops
    (1 to 3).foreach { i =>
      Seq((i.toLong, java.sql.Timestamp.valueOf(s"2024-01-01 00:0$i:00"), 7L, "click", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .repartition(1).write.mode("append").parquet(inDir)
    }
    val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = EventStream.readEventsRateLimited(spark, inDir, maxFiles = 1)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        batchSizes.add(b.count()); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val sizes = batchSizes.toArray(Array.empty[java.lang.Long]).map(_.toLong)
    assert(sizes.sum == 3L)
    assert(sizes.length >= 3, s"expected >=3 rate-limited batches, got ${sizes.toSeq}")
    assert(sizes.forall(_ <= 1L))
  }

  test("streaming dedup within watermark drops re-crawled ids (T3)") {
    import spark.implicits._
    val inDir = tmp("dedup-in")
    val outDir = tmp("dedup-out")
    val ckpt = tmp("dedup-ckpt")

    Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 7L, "click", 1.0, "{}"),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), 7L, "click", 1.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:03"), 7L, "view", 2.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("append").parquet(inDir)

    val q = EventStream.toParquetSink(
      EventStream.dedupedEvents(EventStream.readEvents(spark, inDir)),
      outDir, ckpt).start()
    q.awaitTermination(60000)
    assert(spark.read.parquet(outDir).select("event_id").distinct().count() == 2)
    assert(spark.read.parquet(outDir).count() == 2)
  }

  test("stream-stream join: purchases attribute to views within the range") {
    import spark.implicits._
    val inDir = tmp("ssj-in"); val outDir = tmp("ssj-out"); val ckpt = tmp("ssj-ckpt")
    Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 7L, "view", 0.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), 7L, "purchase", 9.5, "{}"),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), 8L, "purchase", 3.0, "{}"),
      (4L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), 7L, "purchase", 4.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("append").parquet(inDir)

    val q = EventStream.toParquetSink(
      EventStream.attributionJoin(EventStream.readEvents(spark, inDir)),
      outDir, ckpt).start()
    q.awaitTermination(60000)

    // inner-join matches emit without waiting for the watermark: exactly
    // the purchase 10 minutes after the same user's view. The other-user
    // purchase and the 60-minutes-later purchase never match.
    val got = spark.read.parquet(outDir)
      .select("user_id", "view_id", "purchase_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((7L, 1L, 2L, 9.5)))
  }

  test("streaming session_window emits sessions once the watermark closes them") {
    import spark.implicits._
    val inDir = tmp("sess-in"); val outDir = tmp("sess-out"); val ckpt = tmp("sess-ckpt")
    Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 7L, "click", 1.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:05:00"), 7L, "click", 2.0, "{}"),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), 8L, "view", 4.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("append").parquet(inDir)

    val q = EventStream.toParquetSink(
      EventStream.sessionCounts(EventStream.readEvents(spark, inDir)),
      outDir, ckpt).start()
    q.awaitTermination(60000)
    // watermark = 00:05 - 10min — no session provably closed yet
    assert(spark.read.parquet(outDir).count() == 0)

    // flush tick: watermark jumps past every session close
    Seq((9L, java.sql.Timestamp.valueOf("2024-01-01 02:00:00"), 9L, "click", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("append").parquet(inDir)
    val q2 = EventStream.toParquetSink(
      EventStream.sessionCounts(EventStream.readEvents(spark, inDir)),
      outDir, ckpt).start()
    q2.awaitTermination(60000)

    val got = spark.read.parquet(outDir)
      .select("user_id", "n", "sum_value", "session_start", "session_end")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getTimestamp(3).toString, r.getTimestamp(4).toString)).sortBy(_._1)
    assert(got.length == 2)
    // user 7: two clicks 5 min apart merge into one session ending
    // last-event + 20min gap; user 8: singleton session
    assert(got(0) == (7L, 2L, 3.0, "2024-01-01 00:00:00.0", "2024-01-01 00:25:00.0"))
    assert(got(1) == (8L, 1L, 4.0, "2024-01-01 00:02:00.0", "2024-01-01 00:22:00.0"))
  }

  test("idempotent sink: a replayed micro-batch does not duplicate rows") {
    import spark.implicits._
    val inDir = tmp("idem-in"); val outDir = tmp("idem-out"); val ckpt = tmp("idem-ckpt")
    Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 7L, "click", 1.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), 8L, "view", 2.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("append").parquet(inDir)

    val q = EventStream.idempotentSink(
      EventStream.readEvents(spark, inDir), outDir, ckpt).start()
    q.awaitTermination(60000)
    assert(spark.read.parquet(outDir).count() == 2)

    // simulate the at-least-once failure mode: the same micro-batch is
    // delivered AGAIN (sink wrote, checkpoint commit lost) — the
    // batch_id-partition overwrite rewrites instead of appending
    val replay = spark.read.parquet(inDir)
    EventStream.writeBatchIdempotent(replay, 0L, outDir)
    EventStream.writeBatchIdempotent(replay, 0L, outDir)
    val after = spark.read.parquet(outDir)
    assert(after.count() == 2)
    assert(after.select("event_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))

    // a genuinely new batch lands beside it untouched
    EventStream.writeBatchIdempotent(replay.filter($"event_id" === 1L), 1L, outDir)
    assert(spark.read.parquet(outDir).count() == 3)
  }

  test("fan-out sink writes two tables from one cached micro-batch (S8)") {
    import spark.implicits._
    val inDir = tmp("fan-in")
    val outA = tmp("fan-a")
    val outB = tmp("fan-b")
    val ckpt = tmp("fan-ckpt")

    Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 7L, "click", 1.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), 8L, "view", 2.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("append").parquet(inDir)

    val q = EventStream.fanOutSink(
      EventStream.readEvents(spark, inDir), outA, outB, ckpt).start()
    q.awaitTermination(60000)
    assert(spark.read.parquet(outA).count() == 2)
    assert(spark.read.parquet(outB).as[String].collect().toSet == Set("click", "view"))
  }
}
