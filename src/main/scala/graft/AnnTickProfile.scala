package graft

import org.apache.spark.sql.functions._
import graft.ops.{DedupLedger, IndexStore, VectorOps}

/** Throwaway profiling main for q176's runtime shape (round 18,
  * VERDICT r17 Next #3): times each phase — clone, the three streamed
  * drains, the serve, the audits — so the trim targets measured cost.
  * Not part of the catalog. */
object AnnTickProfile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    org.apache.log4j.Logger.getLogger("graft.ops").setLevel(org.apache.log4j.Level.INFO)
    def t[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $what%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    s.read.parquet(s"$d/region.parquet").count()
    t("ensureIvfPq90Index") { VectorOps.ensureIvfPq90Index(s, d, VectorOps.GATED_K) }
    (1 to 2).foreach { round =>
      println(s"-- round $round")
      val emb = Tables.rebalance(Tables.embeddings(s, d))
      val mx = emb.agg(max(col("vec_id"))).head.getLong(0)
      val c9 = mx * 9L / 10L
      val cMid = mx * 19L / 20L
      val half = mx / 2L
      val blobOff = mx + 1L // derived (ADVICE r18 #4): never collide with seed ids
      val zone = graft.jobs.JobRecordGate.freshZone("graft-dtprof-", d)
      val dir = new java.io.File(zone, "index").getAbsolutePath
      t("clone") { DedupLedger.cloneStore(
        VectorOps.ensureIvfPq90Index(s, d, VectorOps.GATED_K), dir) }
      val landing = new java.io.File(zone, "in").getAbsolutePath
      val ckpt = new java.io.File(zone, "ck").getAbsolutePath
      val ss = graft.streaming.StreamConf.stateSession(s, 8)
      def stream = ss.readStream
        .schema("vec_id LONG, embedding ARRAY<FLOAT>, label INT")
        .parquet(landing)
      def drainTick(): Unit =
        graft.streaming.IndexMaintenance.driftSink(stream, dir, ckpt,
          minCellMass = 20L, refineIters = 1, maxRefineFraction = 0.75)
          .start().awaitTermination()
      def shifted(lo: Long, hi: Long) =
        emb.filter(col("vec_id") >= lo && col("vec_id") < hi)
          .select((col("vec_id") + lit(blobOff)).as("vec_id"),
            expr("transform(embedding, x -> x + CAST(2.0 AS FLOAT))")
              .as("embedding"),
            col("label"))
      t("land tick1") {
        emb.filter(col("vec_id") >= c9 && col("vec_id") < cMid)
          .repartition(1).write.mode("overwrite").parquet(landing) }
      t("drain tick1") { drainTick() }
      t("land tick2") {
        shifted(0L, half).repartition(1).write.mode("append").parquet(landing) }
      t("drain tick2 (refine)") { drainTick() }
      t("land tick3") {
        shifted(half, c9).repartition(1).write.mode("append").parquet(landing) }
      t("drain tick3") { drainTick() }
      val qRows = t("qRows collect") {
        emb.filter(col("vec_id") >= c9 && col("vec_id") < c9 + 5L)
          .select((col("vec_id") + lit(blobOff)).as("vec_id"),
            expr("transform(embedding, x -> x + CAST(2.0 AS FLOAT))")
              .as("embedding"))
          .withColumn("q", expr(VectorOps.quantExpr))
          .select(col("vec_id"), col("q")).collect()
          .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).sortBy(_._1) }
      t("serve") {
        VectorOps.serveIvfPqStoredRows(s, dir, qRows, VectorOps.IVFPQ_PROBES, VectorOps.IVFPQ_RERANK, 5).count() }
      t("audits") {
        val (codesF, vecsF) = IndexStore.frames(s, dir, IndexStore.snapshot(dir))
        vecsF.select(col("vec_id")).unionByName(codesF.select(col("vec_id")))
          .orderBy(col("vec_id")).collect().length }
    }
    // batch-mode decomposition of drain 2: ingest vs policy vs refine
    locally {
      println("-- batch decomposition")
      val emb = Tables.rebalance(Tables.embeddings(s, d))
      val mx = emb.agg(max(col("vec_id"))).head.getLong(0)
      val half = mx / 2L
      val blobOff = mx + 1L // derived (ADVICE r18 #4): never collide with seed ids
      val zone = graft.jobs.JobRecordGate.freshZone("graft-dtprof-b-", d)
      val dir = new java.io.File(zone, "index").getAbsolutePath
      DedupLedger.cloneStore(
        VectorOps.ensureIvfPq90Index(s, d, VectorOps.GATED_K), dir)
      def shifted(lo: Long, hi: Long) =
        emb.filter(col("vec_id") >= lo && col("vec_id") < hi)
          .select((col("vec_id") + lit(blobOff)).as("vec_id"),
            expr("transform(embedding, x -> x + CAST(2.0 AS FLOAT))")
              .as("embedding"),
            col("label"))
      t("batch append blob") {
        VectorOps.appendToIvfPqIndex(s, shifted(0L, half), dir, Some("b1")) }
      t("needsRetrain") { VectorOps.needsRetrain(s, dir) }
      t("refineDriftedCells") {
        VectorOps.refineDriftedCells(s, dir, minCellMass = 20L,
          refineIters = 1, maxRefineFraction = 0.75) }
      t("needsRetrain after") { VectorOps.needsRetrain(s, dir) }
    }
    s.stop()
  }
}
