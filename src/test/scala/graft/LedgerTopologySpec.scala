package graft

import org.apache.spark.sql.functions._
import graft.ops.{DedupLedger, IndexStore}

/** Round-12 VERDICT #1: the ledger verdict's batch side must BROADCAST
  * only while measurably small — the increment scales with ingest rate,
  * not corpus size, so a hard broadcast() hint is a latent driver OOM at
  * production ingest volumes. This spec is the q103 salted-join
  * discipline applied to the ledger: force the size gate shut
  * (maxBroadcast = 0 AND autoBroadcastJoinThreshold = -1, so neither the
  * hint nor Catalyst's own stats can pick a broadcast), assert the
  * executed plan really runs shuffle joins, and assert the verdict is
  * bit-identical — the topology is oracle-invisible.
  */
class LedgerTopologySpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")
  private def words(n: Int, seed: String) =
    (0 until n).map(i => s"$seed$i").mkString(" ")

  test("forced-shuffle ledger verdict: no broadcast in the plan, identical verdict") {
    val dir = java.nio.file.Files.createTempDirectory("ledger-topo").toString
    val history = docs(
      0L -> words(30, "h"),
      1L -> words(30, "x"),
      2L -> words(40, "y"))
    val batch = docs(
      10L -> words(30, "h"),              // exact hit
      11L -> (words(30, "x") + " tail"),  // near hit via signature
      12L -> words(35, "z"))              // clean keep
    DedupLedger.buildLedger(history, dir)
    val snap = IndexStore.snapshot(dir)

    val broadcastRun = DedupLedger
      .dedupAgainstLedger(spark, batch, dir, snap)
      .collect().map(_.toSeq).toSeq

    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val gated = DedupLedger
        .dedupAgainstLedger(spark, batch, dir, snap, maxBroadcast = 0L)
      val shuffleRun = gated.collect().map(_.toSeq).toSeq
      // materialize first, then read the ADAPTIVE final plan
      val plan = gated.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin") &&
             !plan.contains("BroadcastExchange"),
        s"size-gated verdict must not broadcast when the gate is shut:\n$plan")
      assert(plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"),
        s"expected shuffle joins in the forced plan:\n$plan")
      assert(shuffleRun == broadcastRun,
        "verdict must be identical under shuffle-join topology")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("forced-shuffle MEDIA verdict: the marks-table hamming arm is " +
       "topology-invariant too") {
    // the same discipline on the q158 media arm: history marks 0-2,
    // batch with an exact hit (same fp), a near hit (2 bits off), and
    // a clean keep (far fingerprint)
    val dir = java.nio.file.Files.createTempDirectory("ledger-topo-m").toString
    val histFps = Seq((0L, 0x1234567890aL), (1L, 0x0fedcba9876L),
                      (2L, 0x24680ace135L)).toDF("media_id", "fp")
    DedupLedger.buildMixedLedger(docs(0L -> words(30, "h")), histFps, dir)
    val snap = IndexStore.snapshot(dir)
    val batch = Seq(
      (10L, 0x1234567890aL),               // exact
      (11L, 0x0fedcba9876L ^ (3L << 20)),  // hamming 2
      (12L, 0x3b3b3b3b3b3L)                // keep
    ).toDF("media_id", "fp")

    val broadcastRun = DedupLedger
      .dedupMediaAgainstLedger(spark, batch, dir, snap)
      .collect().map(_.toSeq).toSeq
    assert(broadcastRun.map(r => (r.head, r.last)) ==
      Seq((10L, 0L), (11L, 0L), (12L, 1L)), s"fixture truth drifted: $broadcastRun")

    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val gated = DedupLedger
        .dedupMediaAgainstLedger(spark, batch, dir, snap, maxBroadcast = 0L)
      val shuffleRun = gated.collect().map(_.toSeq).toSeq
      val plan = gated.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin") &&
             !plan.contains("BroadcastExchange"),
        s"size-gated media verdict must not broadcast when the gate is shut:\n$plan")
      assert(plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"),
        s"expected shuffle joins in the forced plan:\n$plan")
      assert(shuffleRun == broadcastRun,
        "media verdict must be identical under shuffle-join topology")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }
}
