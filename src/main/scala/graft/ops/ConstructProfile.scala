package graft.ops

import org.apache.spark.sql.functions._

/** Scratch profiler (round 20): decompose dedupAgainstLedger's DRIVER-
  * side construct cost (TickProfile reads ~0.6 s per verdict, 3x per
  * q152). Not part of the catalog; deleted or kept as a study main. */
object ConstructProfile {
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
      println(f"CPROF $what%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    s.read.parquet(s"$d/region.parquet").count()
    val seed = DedupLedger.ensureHistoryLedger(s, d)
    val docs = graft.Tables.rebalance(graft.Tables.documents(s, d))
    val mx = docs.agg(max(col("doc_id"))).head.getLong(0)
    val c9 = mx * 9L / 10L
    val batch = docs.filter(col("doc_id") >= c9).localCheckpoint()
    (1 to 3).foreach { round =>
      println(s"-- round $round")
      val snap = t("snapshot") { IndexStore.snapshot(seed) }
      println(s"   codes files=${snap.codes.size} vectors files=${snap.vectors.size}")
      t("frames construct") {
        IndexStore.frames(s, seed, snap,
          Some(IndexStore.CODES_DDL), Some(IndexStore.VECTORS_DDL))
      }
      t("batch stats force") {
        batch.queryExecution.optimizedPlan.stats.sizeInBytes
      }
      t("armStats read") { IndexStore.armStats(seed, "vectors-hist") }
      val v = t("full verdict construct") {
        DedupLedger.dedupAgainstLedger(s, batch, seed, snap)
      }
      t("verdict execute") { v.count() }
      t("raw read inferred") {
        s.read.option("basePath", s"$seed/vectors")
          .parquet(snap.vectors.map(f => s"$seed/vectors/$f"): _*)
      }
      t("raw read with schema") {
        s.read.schema(
            "cell INT, doc_id BIGINT, sig ARRAY<BIGINT>")
          .option("basePath", s"$seed/vectors")
          .parquet(snap.vectors.map(f => s"$seed/vectors/$f"): _*)
      }
    }
    s.stop()
  }
}
