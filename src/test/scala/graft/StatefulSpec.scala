package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.EventRow

class StatefulSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("mapGroupsWithState counters survive a query restart via checkpoint") {
    import spark.implicits._
    val inDir = tmp("st-in"); val outDir = tmp("st-out"); val ckpt = tmp("st-ckpt")

    def drop(rows: Seq[EventRow]): Unit =
      rows.toDS().toDF().write.mode("append").parquet(inDir)

    def runOnce(): Unit = {
      val src = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[EventRow]].schema)
        .parquet(inDir).as[EventRow]
      // parquet sink is append-only; stateful update-mode output goes
      // through foreachBatch (the standard pattern for upsert-ish sinks)
      val q = StatefulOps.runningUserCounters(src)
        .toDF().writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.write.mode("append").parquet(outDir); ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }

    drop(Seq(
      EventRow(1, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 7, "click", 1.0),
      EventRow(2, java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), 7, "error", 0.0)))
    runOnce()
    // restart with new data for the same key: state must resume at n=2
    drop(Seq(
      EventRow(3, java.sql.Timestamp.valueOf("2024-01-01 00:00:03"), 7, "click", 2.0)))
    runOnce()

    val last = spark.read.parquet(outDir)
      .orderBy(col("last_event_id").desc).limit(1).collect()(0)
    assert(last.getAs[Long]("user_id") == 7L)
    assert(last.getAs[Long]("n_events") == 3L)  // 2 from run 1 + 1 from run 2
    assert(last.getAs[Long]("n_errors") == 1L)
    assert(last.getAs[Long]("last_event_id") == 3L)
  }

  test("streaming dedup drops copies across micro-batches and restarts") {
    import spark.implicits._
    import graft.streaming.StatefulOps.DocRow
    val inDir = tmp("dd-in"); val outDir = tmp("dd-out"); val ckpt = tmp("dd-ckpt")

    def drop(rows: Seq[DocRow]): Unit =
      rows.toDS().toDF().write.mode("append").parquet(inDir)

    def runOnce(): Unit = {
      val src = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[DocRow]].schema)
        .parquet(inDir).as[DocRow]
      val q = StatefulOps.streamingDedup(src)
        .toDF().writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.write.mode("append").parquet(outDir); ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }

    // batch 1: A duplicated within the batch (min id wins), B unique
    drop(Seq(DocRow(10, "alpha text"), DocRow(3, "alpha text"),
             DocRow(5, "beta text")))
    runOnce()
    // restart: a later copy of A must be dropped (state survived the
    // restart), new doc C emitted
    drop(Seq(DocRow(99, "alpha text"), DocRow(7, "gamma text")))
    runOnce()

    val got = spark.read.parquet(outDir)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got == Seq(3L, 5L, 7L), s"got $got")
  }

  test("flatMapGroupsWithState sessionizer closes sessions via watermark") {
    import spark.implicits._
    val inDir = tmp("sess-in"); val outDir = tmp("sess-out"); val ckpt = tmp("sess-ckpt")

    def drop(rows: Seq[EventRow]): Unit =
      rows.toDS().toDF().write.mode("append").parquet(inDir)
    def runOnce(): Unit = {
      val src = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[EventRow]].schema)
        .parquet(inDir).as[EventRow]
      val q = StatefulOps.sessionize(src, gapMs = 60000L) // 1-minute gap
        .toDF().writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(outDir); ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }

    // session A: two events 30s apart; then a 2nd session 5 min later,
    // then a far-future event that pushes the watermark past everything
    drop(Seq(
      EventRow(1, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 7, "click", 1.0),
      EventRow(2, java.sql.Timestamp.valueOf("2024-01-01 00:00:30"), 7, "click", 2.0),
      EventRow(3, java.sql.Timestamp.valueOf("2024-01-01 00:05:30"), 7, "view", 4.0)))
    runOnce()
    drop(Seq(
      EventRow(4, java.sql.Timestamp.valueOf("2024-01-01 03:00:00"), 8, "click", 0.5)))
    runOnce()

    val sessions = spark.read.parquet(outDir)
      .orderBy("session_start_ms").collect()
    // first session (2 events, sum 3.0) closed by the in-batch gap;
    // second (1 event) closed by the watermark timeout in tick 2
    assert(sessions.length >= 2)
    assert(sessions(0).getAs[Long]("n_events") == 2L)
    assert(sessions(0).getAs[Double]("sum_value") == 3.0)
    assert(sessions(1).getAs[Long]("n_events") == 1L)
    assert(sessions(1).getAs[Double]("sum_value") == 4.0)
  }

  test("streaming error-budget listener accumulates observed metrics (T5)") {
    import spark.implicits._
    val inDir = tmp("eb-in"); val outDir = tmp("eb-out"); val ckpt = tmp("eb-ckpt")
    Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 7L, "error", 0.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), 7L, "error", 0.0, "{}"),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 00:00:03"), 8L, "click", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("append").parquet(inDir)

    val listener = new StatefulOps.ErrorBudgetListener(spark, maxErrors = 1)
    spark.streams.addListener(listener)
    try {
      val src = graft.streaming.EventStream.readEvents(spark, inDir)
      val q = StatefulOps.withErrorMetric(src, col("event_type") === "error")
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).outputMode("append").start()
      q.awaitTermination(60000)
      // listener events are async; wait for delivery
      var waited = 0
      while (listener.totalErrors < 2 && waited < 100) { Thread.sleep(100); waited += 1 }
      assert(listener.totalErrors == 2L)
      assert(listener.budgetExceeded) // 2 errors > budget of 1
    } finally spark.streams.removeListener(listener)
  }

  test("observed error count rides the main pass (error budget, A8/T5)") {
    import spark.implicits._
    val df = Seq(("a", "ok"), ("b", "error"), ("c", "error"), ("d", "ok"))
      .toDF("id", "status")
    val (out, obs) = StatefulOps.observedErrorCount(df, col("status") === "error")
    assert(out.count() == 4)
    val row = obs.get
    assert(row("n_errors") == 2L)
    assert(row("n_rows") == 4L)
  }
}
