package graft

import org.apache.spark.sql.functions._
import graft.ops.{DedupLedger, IndexStore}

/** Throwaway profiling main for the video-ledger family (round 18,
  * VERDICT r17 Next #1): times each phase of q171's runtime shape —
  * clone, per-generation verdict/append, manifest diff — so the A/B
  * recovery targets measured cost. Not part of the catalog. */
object VidProfile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def t[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $what%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    // per-job ledger: callsite + wall duration, to localize which jobs
    // a phase regression hides in
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val cs = j.stageInfos.map(si => si.name.takeWhile(_ != '\n'))
          .mkString(" | ").take(120)
        starts.put(j.jobId, (j.time, cs)); ()
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(starts.remove(j.jobId)).foreach { case (t0, cs) =>
          println(f"  JOB ${j.jobId}%4d ${(j.time - t0) / 1e3}%8.3f s  $cs")
        }
      }
    })
    s.read.parquet(s"$d/region.parquet").count()
    t("ensureVideoHistoryLedger") {
      DedupLedger.ensureVideoHistoryLedger(s, d) }
    (1 to 3).foreach { round =>
      println(s"-- round $round")
      val zone = graft.jobs.JobRecordGate.freshZone("graft-vidprof-", d)
      val dir = new java.io.File(zone, "ledger").getAbsolutePath
      t("cloneStore") { DedupLedger.cloneStore(
        DedupLedger.ensureVideoHistoryLedger(s, d), dir) }
      val v0 = t("snapshot v0") { IndexStore.snapshot(dir) }
      for ((lo, hi, tag) <- Seq((100L, 150L, "vgen-a"), (150L, 200L, "vgen-b"))) {
        val fr = t(s"frames($lo,$hi) ckpt") {
          DedupLedger.q169FramesFor(s, d, lo, hi).localCheckpoint() }
        // mirror ingestVideoGenerations exactly: the verdict plan is a
        // lazy input to the append's semi-join (evaluated inside it)
        val v = DedupLedger.dedupVideoAgainstLedger(s, fr, dir,
          IndexStore.snapshot(dir))
        t(s"verdict+append $tag") {
          DedupLedger.appendVideoSurvivors(
            fr.join(v.filter(col("keep") === 1L).select(col("media_id")),
              Seq("media_id"), "left_semi"),
            dir, tag)
        }
      }
      t("diffSeqs collect") {
        IndexStore.diffSeqs(s, dir, v0, IndexStore.snapshot(dir))
          .select(col("owner").as("media_id"), col("f"),
                  expr("element_at(fp, 1)").as("fp"))
          .orderBy(col("media_id"), col("f"))
          .collect().length
      }
    }
    // commit-machinery microbench: 20 tiny appends isolate the fixed
    // per-commit cost (listing + manifest publish + tag bookkeeping)
    // from the verdict/write jobs the gate phases mix in
    locally {
      val zone = graft.jobs.JobRecordGate.freshZone("graft-vidprof-c-", d)
      val dir = new java.io.File(zone, "ledger").getAbsolutePath
      DedupLedger.cloneStore(DedupLedger.ensureVideoHistoryLedger(s, d), dir)
      val tiny = DedupLedger.q169FramesFor(s, d, 100L, 102L).localCheckpoint()
      DedupLedger.appendVideoSurvivors(tiny, dir, "warm") // warm the path
      val t0 = System.nanoTime()
      (0 until 20).foreach { i =>
        DedupLedger.appendVideoSurvivors(tiny, dir, s"micro-$i") }
      println(f"PROFILE 20x tiny append          ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    s.stop()
  }
}
