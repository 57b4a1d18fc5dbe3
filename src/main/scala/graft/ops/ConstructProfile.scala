package graft.ops

import org.apache.spark.sql.functions._

/** Scratch profiler (rounds 20/21): decompose dedupAgainstLedger's
  * DRIVER-side construct cost (TickProfile reads ~0.6 s per verdict,
  * 3x per q152). Round 21 adds the sub-reader decomposition: how much
  * of a warm `spark.read.schema(...).parquet(files)` is file-listing
  * machinery (DataSource resolution / InMemoryFileIndex) vs Dataset
  * analysis, and what a memoized-relation read would save. Not part
  * of the catalog; a study main. */
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
          Some(IndexStore.CODES_DDL), Some(IndexStore.VECTORS_DDL),
          declaredSchema = true)
      }
      t("batch stats force") {
        batch.queryExecution.optimizedPlan.stats.sizeInBytes
      }
      t("armStats read") { IndexStore.armStats(seed, "vectors-hist") }
      val v = t("full verdict construct") {
        DedupLedger.dedupAgainstLedger(s, batch, seed, snap)
      }
      t("verdict execute") { v.count() }
      val vecSchema = "cell INT, doc_id BIGINT, sig ARRAY<BIGINT>"
      t("raw read inferred") {
        s.read.option("basePath", s"$seed/vectors")
          .parquet(snap.vectors.map(f => s"$seed/vectors/$f"): _*)
      }
      t("raw read with schema") {
        s.read.schema(vecSchema)
          .option("basePath", s"$seed/vectors")
          .parquet(snap.vectors.map(f => s"$seed/vectors/$f"): _*)
      }
      // ---- round-21 sub-reader decomposition ----
      // (a) file-listing machinery alone: InMemoryFileIndex over the
      // explicit file list (what DataSource.resolveRelation builds)
      val paths = snap.vectors.map(f =>
        new org.apache.hadoop.fs.Path(s"$seed/vectors/$f"))
      val idx = t("InMemoryFileIndex") {
        new org.apache.spark.sql.execution.datasources.InMemoryFileIndex(
          s, paths, Map("basePath" -> s"$seed/vectors"),
          Some(org.apache.spark.sql.types.StructType.fromDDL(vecSchema)))
      }
      // (b) relation + Dataset analysis over the ALREADY-built index
      t("relation+analysis (cached idx)") {
        val ps = idx.partitionSchema
        val dataSchema = org.apache.spark.sql.types.StructType(
          org.apache.spark.sql.types.StructType.fromDDL(vecSchema)
            .filterNot(f => ps.exists(_.name == f.name)))
        val rel = org.apache.spark.sql.execution.datasources.HadoopFsRelation(
          idx, ps, dataSchema, None,
          new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat(),
          Map.empty)(s)
        s.baseRelationToDataFrame(rel)
      }
      // (c) what the VERDICT JOIN TREE costs to analyze, with frames
      // pre-built: construct over the same snapshot twice and reuse
      t("verdict re-construct") {
        DedupLedger.dedupAgainstLedger(s, batch, seed, snap)
      }
      // (d) batch-side derivation alone (shingle->minhash plan build)
      t("signatureRows construct") { DedupLedger.signatureRows(batch) }
    }
    s.stop()
  }
}
