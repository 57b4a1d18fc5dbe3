package graft.ops

import org.apache.spark.sql.functions._
import graft.ops.{DedupLedger, IndexStore}

/** Scratch phase profiler for the q158 mixed tick (round 17) — same
  * body as the gate, t() around each phase. Lives in graft.ops to
  * reach the private fixture helpers. Not part of the catalog. */
object TickProfile2 {
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
      println(f"PROFILE2 $what%-26s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    s.read.parquet(s"$d/region.parquet").count()
    t("ensureMixedHistoryLedger") { DedupLedger.ensureMixedHistoryLedger(s, d) }
    (1 to 2).foreach { round =>
      println(s"-- round $round")
      val docs = graft.Tables.rebalance(graft.Tables.documents(s, d))
      val mx = docs.agg(max(col("doc_id"))).head.getLong(0)
      val c9 = mx * 9L / 10L
      val cMid = mx * 19L / 20L
      val zone = graft.jobs.JobRecordGate.freshZone("graft-prof158-", d)
      val dir = new java.io.File(zone, "ledger").getAbsolutePath
      t("clone") { DedupLedger.cloneStore(
        DedupLedger.ensureMixedHistoryLedger(s, d), dir) }
      val landing = new java.io.File(zone, "in").getAbsolutePath
      val ckpt = new java.io.File(zone, "ck").getAbsolutePath
      val ss = graft.streaming.StreamConf.stateSession(s, 8)
      def stream = ss.readStream
        .schema("kind STRING, doc_id LONG, text STRING, payload BINARY")
        .json(landing)
      def textRows(lo: Long, hi: Long) =
        docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
          .select(lit("text").as("kind"), col("doc_id"), col("text"),
                  lit(null).cast("binary").as("payload"))
      def mediaRows(lo: Long, hi: Long) =
        DedupLedger.q158Payloads(s, d, lo, hi)
          .select(lit("image").as("kind"), col("media_id").as("doc_id"),
                  lit(null).cast("string").as("text"), col("payload"))
      t("land tick1") {
        textRows(c9, cMid).unionByName(mediaRows(100L, 150L))
          .repartition(1).write.mode("overwrite").json(landing) }
      t("drain tick1") {
        graft.streaming.DedupMaintenance.mixedSink(stream, dir, ckpt)
          .start().awaitTermination() }
      t("land tick2") {
        textRows(cMid, mx + 1L).unionByName(mediaRows(150L, 200L))
          .repartition(1).write.mode("append").json(landing) }
      t("drain tick2") {
        graft.streaming.DedupMaintenance.mixedSink(stream, dir, ckpt)
          .start().awaitTermination() }
      val snap = IndexStore.snapshot(dir)
      t("final text verdict") {
        DedupLedger.dedupAgainstLedger(s, docs.filter(col("doc_id") >= c9),
          dir, snap).count() }
      t("final media verdict") {
        DedupLedger.dedupMediaAgainstLedger(s,
          DedupLedger.q158Fps(s, d, 100L, 200L), dir, snap).count() }
    }
    s.stop()
  }
}
