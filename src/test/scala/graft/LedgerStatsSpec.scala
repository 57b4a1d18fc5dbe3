package graft

import org.apache.spark.sql.functions._
import graft.ops.{DedupLedger, IndexStore}

/** Write-time arm statistics (round 17, VERDICT r16 #1): the shed
  * ladder's healthy-store decision must come from stats the PUBLISHER
  * maintained — zero Spark jobs at verdict time — and the stats must
  * stay SOUND across the store lifecycle:
  *   - rebuild computes the exact banded-bucket histogram (slack 0);
  *   - each delta bumps slack by the delta's max bucket count and rows
  *     by its banded row count (a crashed bump over-counts, never
  *     under-counts, because it lands before the manifest CAS);
  *   - a rebuild CLEARS stale stats before the new content publishes;
  *   - stats can only remove work: a hot store (maxBound above the
  *     shed floor) falls back to the runtime histogram and sheds
  *     byte-identically to a store with no stats at all.
  */
class LedgerStatsSpec extends SparkSpec {
  import spark.implicits._

  private val geom = DedupLedger.NarrowMarks
  private val statsKey = s"marks-hist-${geom.params}"
  private val mask42 = (1L << 42) - 1

  /** Distinct pseudo-random narrow fingerprints — 3x14 banding over
    * 40k of these stays far under the 200-row shed floor per bucket. */
  private def healthyMarks(n: Long) =
    spark.range(0, n, 1, 4)
      .select(col("id").as("media_id"),
        expr(s"array(cast(conv(substring(md5(cast(id as string)), 1, 11), " +
          s"16, 10) as bigint) & $mask42)").as("fp"))

  private def seedDoc =
    Seq((0L, "stats spec seed doc")).toDF("doc_id", "text")

  private def countJobs[A](f: => A): (A, Int) = {
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        n.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val a = f
      // listener events are async — drain the bus deterministically
      // (a fixed sleep can under-count either run on a loaded box and
      // flip the parity assertion both ways)
      org.apache.spark.sql.graftshim.Shim.waitForListenerBus(
        spark.sparkContext, 30000L)
      (a, n.get())
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("rebuild stamps exact stats; the healthy verdict consults them with " +
       "ZERO jobs and matches the uncapped verdict row for row") {
    val dir = java.nio.file.Files.createTempDirectory("stats-healthy").toString
    DedupLedger.buildMixedLedger(seedDoc, healthyMarks(40000), dir, geom)
    val st = IndexStore.armStats(dir, statsKey)
      .getOrElse(fail("rebuild of a corpus-scale store must stamp arm stats"))
    assert(st.slack == 0L, "a fresh rebuild's stats carry no slack")
    assert(st.rows == 40000L * geom.bands,
      s"stats rows must equal banded rows, got ${st.rows}")
    assert(st.maxBound <= graft.ops.DedupOps.BAND_CAP,
      "40k random fingerprints over 2^14-key bands must stay under the floor")

    val snap = IndexStore.snapshot(dir)
    // batch: 100 copies of stored marks + 400 novels
    val batch = spark.range(0, 500, 1, 4)
      .select((col("id") + 1000000L).as("media_id"),
        expr(s"""CASE WHEN id < 100 THEN
          |array(cast(conv(substring(md5(cast(id as string)), 1, 11), 16, 10)
          |      as bigint) & $mask42)
          |ELSE array(cast(conv(substring(md5(concat(id, '|novel')), 1, 11),
          |      16, 10) as bigint) & $mask42) END""".stripMargin).as("fp"))
      .localCheckpoint()
    // the uncapped (None) baseline pays only the scan-construction
    // jobs (parquet file listing past the parallel-discovery
    // threshold); the DEFAULT path must plan with EXACTLY the same
    // jobs — the ladder's histogram/occupancy measurements all elided
    // by the persisted stats
    DedupLedger.clearShedMemos()
    val (verdictDefault, jobs) = countJobs {
      DedupLedger.dedupMediaAgainstLedger(spark, batch, dir, snap, geom)
    }
    DedupLedger.clearShedMemos()
    val (verdictNone, jobsNone) = countJobs {
      DedupLedger.dedupMediaAgainstLedger(spark, batch, dir, snap, geom,
        pairBudgetPerItem = None)
    }
    // DEFAULT runs FIRST (cold file-listing cache), so <= proves the
    // ladder added nothing: in practice it plans CHEAPER than None,
    // which pays the saturation sentinel's footer count
    assert(jobs <= jobsNone,
      s"a healthy stats-carrying store must plan the default verdict with " +
      s"no auxiliary jobs beyond the uncapped path's ($jobsNone), ran $jobs")
    val got = verdictDefault.collect().map(r =>
      (r.getLong(0), r.isNullAt(1), r.isNullAt(2), r.getLong(3))).toSeq
    val want = verdictNone.collect().map(r =>
      (r.getLong(0), r.isNullAt(1), r.isNullAt(2), r.getLong(3))).toSeq
    assert(got == want, "stats fast path changed the verdict vs uncapped")
    assert(got.count(_._4 == 0L) == 100, "the 100 exact copies must drop")
  }

  test("delta commits bump slack and rows soundly; rebuild clears stale " +
       "stats before the new content publishes") {
    val dir = java.nio.file.Files.createTempDirectory("stats-bump").toString
    DedupLedger.buildMixedLedger(seedDoc, healthyMarks(40000), dir, geom)
    val st0 = IndexStore.armStats(dir, statsKey).get
    // a 200-item delta: every fingerprint lands in some bucket, so the
    // bump must record max-per-bucket slack >= 1 and exactly the
    // delta's banded rows
    val delta = spark.range(50000, 50200, 1, 4)
      .select(col("id").as("media_id"),
        expr(s"array(cast(conv(substring(md5(cast(id as string)), 1, 11), " +
          s"16, 10) as bigint) & $mask42)").as("fp"))
    DedupLedger.appendMediaSurvivors(delta, dir, tag = "bump-1", geom)
    val st1 = IndexStore.armStats(dir, statsKey).get
    assert(st1.slack >= 1L, "a non-empty delta must bump slack")
    assert(st1.rows == st0.rows + 200L * geom.bands,
      s"rows must grow by the delta's banded rows, got ${st1.rows}")
    assert(st1.maxBound >= st0.maxBound, "maxBound must be monotone under appends")
    // idempotent replay: the same tag must not double-bump
    DedupLedger.appendMediaSurvivors(delta, dir, tag = "bump-1", geom)
    val st1r = IndexStore.armStats(dir, statsKey).get
    assert((st1r.version, st1r.slack, st1r.rows, st1r.hist.toSeq) ==
      ((st1.version, st1.slack, st1.rows, st1.hist.toSeq)),
      "a replayed tagged delta must not bump stats twice")
    // rebuild: stale stats cleared, fresh exact stats stamped
    DedupLedger.buildMixedLedger(seedDoc, healthyMarks(35000), dir, geom)
    val st2 = IndexStore.armStats(dir, statsKey).get
    assert(st2.slack == 0L && st2.rows == 35000L * geom.bands,
      s"rebuild must restamp exact stats, got $st2")
  }

  test("a hot store falls back to the runtime histogram and sheds " +
       "byte-identically to a store with no stats at all") {
    // 40k marks where 1000 share band-0 AND band-2 keys (fp = i << 14:
    // the blank-thumbnail shape) — a 1000-row bucket far above the
    // 200-row floor, so maxBound blocks the stats fast path
    val dir = java.nio.file.Files.createTempDirectory("stats-hot").toString
    val marks = spark.range(0, 40000, 1, 4)
      .select(col("id").as("media_id"),
        expr(s"""array(CASE WHEN id < 1000 THEN shiftleft(id, 14)
          |ELSE cast(conv(substring(md5(cast(id as string)), 1, 11), 16, 10)
          |     as bigint) & $mask42 END)""".stripMargin).as("fp"))
    DedupLedger.buildMixedLedger(seedDoc, marks, dir, geom)
    val st = IndexStore.armStats(dir, statsKey).get
    assert(st.maxBound > graft.ops.DedupOps.BAND_CAP,
      s"the planted hot bucket must push maxBound past the floor, got $st")
    val snap = IndexStore.snapshot(dir)
    // probes fanning into the hot bucket: hamming-1 neighbors of hot
    // members (differing bit inside band 2), plus novels
    val batch = spark.range(0, 500, 1, 4)
      .select((col("id") + 1000000L).as("media_id"),
        expr("""array(CASE WHEN id < 100 THEN shiftleft(id, 14)
          |ELSE shiftleft(id + 5000, 14) END)""".stripMargin).as("fp"))
      .localCheckpoint()
    DedupLedger.clearShedMemos()
    val withStats = DedupLedger.dedupMediaAgainstLedger(
      spark, batch, dir, snap, geom).collect().toSeq
    // delete the stats file, clear memos: the pure runtime path
    val f = new java.io.File(s"$dir/_manifest").listFiles()
      .find(_.getName.startsWith("stats.")).get
    assert(f.delete())
    DedupLedger.clearShedMemos()
    val without = DedupLedger.dedupMediaAgainstLedger(
      spark, batch, dir, snap, geom).collect().toSeq
    assert(withStats == without,
      "stats presence changed a hot store's shed verdict")
  }

  private def deleteStats(dir: String): Unit =
    Option(new java.io.File(s"$dir/_manifest").listFiles()).toSeq.flatten
      .filter(_.getName.startsWith("stats."))
      .foreach { f => assert(f.delete()); () }

  test("ESCALATED convergence (VERDICT r17 #4): a corpus-scale stats-less " +
       "store converges to stats-present within ONE append tick — the " +
       "write side pays one exact full-arm refresh inside the commit it " +
       "already holds the lock for") {
    val dir = java.nio.file.Files.createTempDirectory("stats-escal").toString
    DedupLedger.buildMixedLedger(seedDoc, healthyMarks(400000), dir, geom)
    // the legacy / starved store: corpus-scale content, NO stats
    deleteStats(dir)
    assert(IndexStore.armStats(dir, statsKey).isEmpty)
    val snap0 = IndexStore.snapshot(dir)
    val bytes = snap0.marks.map(rel =>
      new java.io.File(s"$dir/marks/$rel").length()).sum
    assert(bytes >= (4L << 20),
      s"fixture must exceed the 4 MiB escalation proxy, got $bytes")
    // ONE tick: a small append — the escalation computes the exact
    // full-arm histogram inside this commit and persists it
    val delta = spark.range(500000, 500200, 1, 4)
      .select(col("id").as("media_id"),
        expr(s"array(cast(conv(substring(md5(cast(id as string)), 1, 11), " +
          s"16, 10) as bigint) & $mask42)").as("fp"))
    DedupLedger.appendMediaSurvivors(delta, dir, tag = "escal-1", geom)
    val st = IndexStore.armStats(dir, statsKey)
    assert(st.isDefined, "one tick must converge a stats-less corpus store")
    assert(st.get.slack == 0L &&
      st.get.rows == (400000L + 200L) * geom.bands,
      s"the escalated refresh must be EXACT over arm+delta, got ${st.get}")
    assert(st.get.version == IndexStore.headVersion(dir).get,
      "the refresh must stamp the version this commit publishes")
    // subsequent deltas take the cheap bump branch (no more full scans)
    DedupLedger.appendMediaSurvivors(
      delta.withColumn("media_id", col("media_id") + 1000L),
      dir, tag = "escal-2", geom)
    val st2 = IndexStore.armStats(dir, statsKey).get
    assert(st2.rows == st.get.rows + 200L * geom.bands && st2.slack >= 1L)
    // and fixture-scale stores stay stats-less (the byte gate holds):
    val small = java.nio.file.Files.createTempDirectory("stats-small").toString
    DedupLedger.buildMixedLedger(seedDoc, healthyMarks(2000), small, geom)
    deleteStats(small)
    DedupLedger.appendMediaSurvivors(delta, small, tag = "s-1", geom)
    assert(IndexStore.armStats(small, statsKey).isEmpty,
      "a fixture-scale store must not pay the escalated refresh")
  }

  test("verdict-side self-heal escalates to a BLOCKING stats write after " +
       "3 consecutive skipped opportunistic attempts (contended lock)") {
    val dir = java.nio.file.Files.createTempDirectory("stats-block").toString
    DedupLedger.buildMixedLedger(seedDoc, healthyMarks(400000), dir, geom)
    deleteStats(dir)
    val snap = IndexStore.snapshot(dir)
    val batch = spark.range(0, 50, 1, 2)
      .select((col("id") + 9000000L).as("media_id"),
        expr(s"array(cast(conv(substring(md5(cast(id + 77 as string)), 1, " +
          s"11), 16, 10) as bigint) & $mask42)").as("fp"))
      .localCheckpoint()
    // a holder thread keeps the writer lock for the first two verdicts:
    // their opportunistic tryWithWriterLock self-heals must SKIP
    val release = new java.util.concurrent.CountDownLatch(1)
    val held = new java.util.concurrent.CountDownLatch(1)
    val holder = new Thread(() => {
      IndexStore.withWriterLock(dir) { held.countDown(); release.await() }
      ()
    })
    holder.start(); held.await()
    def verdict(): Unit = {
      DedupLedger.clearShedMemos() // force the histogram + heal attempt
      DedupLedger.dedupMediaAgainstLedger(spark, batch, dir, snap, geom)
        .collect()
      ()
    }
    try {
      verdict(); verdict()
      assert(IndexStore.armStats(dir, statsKey).isEmpty,
        "skipped opportunistic heals must not have written stats")
      // third consecutive miss crosses the threshold while the lock is
      // STILL held: the opportunistic try skips again, the escalation
      // fires and BLOCKS; the releaser frees the lock while it waits.
      // (Benign race: if this verdict's histogram outlives the release
      // delay, the opportunistic path writes instead — the asserted
      // outcome is identical, and the 2-consecutive-skip prefix above
      // already pinned the counter behavior deterministically.)
      val releaser = new Thread(() => {
        Thread.sleep(2000); release.countDown()
      })
      releaser.start()
      verdict()
      releaser.join()
    } finally { release.countDown(); holder.join() }
    val st = IndexStore.armStats(dir, statsKey)
    assert(st.isDefined && st.get.slack == 0L &&
      st.get.version == snap.version,
      s"the escalated blocking self-heal must persist exact stats: $st")
  }
}
