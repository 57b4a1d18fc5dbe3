package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.ldot
import graft.ops.{IndexStore, VectorOps}

/** ANN RECALL DECAY under appends (round 16, VERDICT r15 Next #6):
  * q129/q130 prove append/compact mechanics; this study measures what
  * they deliberately do not — serve recall drifting as appended
  * vectors diverge from the trained codebook — and validates the
  * [[VectorOps.needsRetrain]] quantization-error trigger against the
  * measured decay curve. Results land in SCALING.md (round-16
  * addendum).
  *
  * Setup: the coarse router + PQ codebook train on 2000 clustered base
  * vectors. The APPEND population is the same cluster generator with
  * its coordinates cyclically rotated by dim/2 — tight clusters the
  * trained centroids know nothing about (real-world analog: a new
  * embedding-model version, a new language, a new modality). Queries
  * are 10 held-out vectors FROM THE DIVERGED distribution, so their
  * true neighbors are appended vectors the index must route + encode
  * with yesterday's codebook. At each append fraction we measure
  * recall@10 of the stored serve against exact quantized-cosine truth
  * over the full current corpus, plus [[VectorOps.appendedDriftRatio]].
  */
object AnnDriftStudy {

  private def rotate(emb: DataFrame): DataFrame = {
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    val half = dim / 2
    emb.withColumn("embedding", expr(
      s"concat(slice(embedding, ${half + 1}, ${dim - half}), " +
        s"slice(embedding, 1, $half))"))
  }

  private def recallAt10(spark: SparkSession, dir: String,
                         queries: DataFrame, corpus: DataFrame): Double = {
    import graft.ops.VectorOps.quantExpr
    val q = queries.withColumn("q", expr(quantExpr))
      .select(col("vec_id").as("qid"), col("q").as("qv"))
      .withColumn("qnorm", ldot(col("qv"), col("qv")))
    val c = corpus.withColumn("q", expr(quantExpr))
      .select(col("vec_id"), col("q"))
      .withColumn("norm", ldot(col("q"), col("q")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    val truth = c.crossJoin(broadcast(q))
      .withColumn("cos", ldot(col("q"), col("qv")).cast("double") /
        sqrt(col("norm").cast("double")) / sqrt(col("qnorm").cast("double")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select(col("qid"), col("vec_id"))
    val served = VectorOps.servedIvfPqTopK(spark, dir, queries,
        numQueries = 10, probes = 4, rerank = 50, topK = 10)
      .select(col("qid"), col("vec_id"))
    val hit = truth.join(served, Seq("qid", "vec_id"), "left_semi").count()
    hit.toDouble / (10.0 * 10.0)
  }

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // `scale` arm (round 17): the localized-drift scenario at a corpus
    // size where DATA dominates fixed job overhead — the wall-clock
    // crossover the fixture-scale arm cannot show (there, refine's ~25
    // bounded jobs outweigh the rebuild's corpus-proportional ~10).
    if (args.headOption.contains("scale")) {
      // sized INSIDE the exact-int distance envelope (VectorOps doc:
      // dim x (value x n_cell)^2 < 2^63): shift +1.5 keeps quant
      // values ~5e4 and 100k/16 ~ 6.25k-member cells, product ~6e18
      val allS = GenFixtures.clusteredEmbeddings(spark, 110100L)
        .localCheckpoint()
      def shiftS(emb: org.apache.spark.sql.DataFrame) =
        emb.withColumn("embedding",
          expr("transform(embedding, x -> x + cast(1.5 AS float))"))
      val baseS = allS.filter(col("vec_id") >= 100 && col("vec_id") < 100100)
        .withColumn("vec_id", col("vec_id") - 100)
        .select(col("vec_id"), col("embedding")).localCheckpoint()
      val blobS = shiftS(allS.filter(col("vec_id") >= 100100))
        .select(col("vec_id"), col("embedding")).localCheckpoint()
      val qS = shiftS(allS.filter(col("vec_id") < 10))
        .select(col("vec_id"), col("embedding")).localCheckpoint()
      val dirS = java.nio.file.Files.createTempDirectory("ann-scale").toString
      val (_, tBuild) = timed(VectorOps.buildIvfPqIndex(baseS, dirS, k = 16))
      VectorOps.appendToIvfPqIndex(spark, blobS, dirS, Some("blob"))
      val corpusS = baseS.unionByName(blobS).localCheckpoint()
      println(f"STUDY-SCALE base=100000 blob=10000 build=$tBuild%.1fs " +
        f"pre-refine blob-recall@10=${recallAt10(spark, dirS, qS, corpusS)}%.3f " +
        f"retrain=${VectorOps.needsRetrain(spark, dirS)}")
      val dirS2 = java.nio.file.Files.createTempDirectory("ann-scale2").toString
      graft.ops.DedupLedger.cloneStore(dirS, dirS2)
      val iters = args.lift(1).map(_.toInt).getOrElse(3)
      val (splitS, tRef) = timed(
        VectorOps.refineDriftedCells(spark, dirS2, splitFactor = 4,
          refineIters = iters))
      println(f"STUDY-SCALE refined cells=${splitS.mkString(",")} " +
        f"t=$tRef%.1fs " +
        f"blob-recall@10=${recallAt10(spark, dirS2, qS, corpusS)}%.3f " +
        f"retrain=${VectorOps.needsRetrain(spark, dirS2)}")
      val (_, tReb) = timed(VectorOps.buildIvfPqIndex(corpusS, dirS, k = 16))
      println(f"STUDY-SCALE rebuilt t=$tReb%.1fs " +
        f"blob-recall@10=${recallAt10(spark, dirS, qS, corpusS)}%.3f")
      spark.stop()
      return
    }

    val all = GenFixtures.clusteredEmbeddings(spark, 5100).localCheckpoint()
    // queries: 10 DIVERGED held-out vectors (ids < 10 — the serve
    // contract caps held-out queries at SEED_FROM); base corpus: 2000 in-distribution; append pool: 3000
    // diverged, fed in fractions
    val queries = rotate(all.filter(col("vec_id") < 10))
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    // base ids remap to [0, 2000): the deterministic PQ init requires
    // its seed vec_ids present in the build input
    val base = all.filter(col("vec_id") >= 100 && col("vec_id") < 2100)
      .withColumn("vec_id", col("vec_id") - 100)
      .localCheckpoint()
    val pool = rotate(all.filter(col("vec_id") >= 2100))
      .select(col("vec_id"), col("embedding"), col("label"))
      .localCheckpoint()

    val dir = java.nio.file.Files.createTempDirectory("ann-drift").toString
    VectorOps.buildIvfPqIndex(base, dir, k = 16)
    println(f"STUDY f=0.00 corpus=2000 drift=--    " +
      f"recall@10=${recallAt10(spark, dir, queries, base)}%.3f")

    var appended = base.limit(0).select(col("vec_id"), col("embedding"))
    var lo = 2100L
    for (frac <- Seq(0.25, 0.50, 1.00, 1.50)) {
      val hi = 2100L + (2000 * frac).toLong
      val delta = pool.filter(col("vec_id") >= lo && col("vec_id") < hi)
      lo = hi
      VectorOps.appendToIvfPqIndex(spark, delta, dir, Some(s"drift-$frac"))
      appended = appended.unionByName(
        delta.select(col("vec_id"), col("embedding"))).localCheckpoint()
      val corpus = base.select(col("vec_id"), col("embedding"))
        .unionByName(appended)
      val ratio = VectorOps.appendedDriftRatio(spark, dir).get
      val rec = recallAt10(spark, dir, queries, corpus)
      println(f"STUDY f=$frac%.2f corpus=${2000 + (2000 * frac).toInt}%d " +
        f"drift=$ratio%.2f recall@10=$rec%.3f " +
        f"retrain=${VectorOps.needsRetrain(spark, dir)}")
    }

    // control: the same append fractions IN-distribution — recall and
    // drift must both hold (a policy that fires here is useless)
    val dir2 = java.nio.file.Files.createTempDirectory("ann-drift2").toString
    VectorOps.buildIvfPqIndex(base, dir2, k = 16)
    val inPool = all.filter(col("vec_id") >= 2100).localCheckpoint()
    VectorOps.appendToIvfPqIndex(spark,
      inPool.filter(col("vec_id") < 4100), dir2, Some("indist"))
    val corpus2 = base.select(col("vec_id"), col("embedding"))
      .unionByName(inPool.filter(col("vec_id") < 4100)
        .select(col("vec_id"), col("embedding")))
    val inQ = all.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"))
    println(f"STUDY control in-dist f=1.00 " +
      f"drift=${VectorOps.appendedDriftRatio(spark, dir2).get}%.2f " +
      f"recall@10=${recallAt10(spark, dir2, inQ, corpus2)}%.3f " +
      f"retrain=${VectorOps.needsRetrain(spark, dir2)}")


    // INCREMENTAL response (round 17, VERDICT r16 #3), GLOBAL arm: on
    // the fully-diverged store 13 of 16 cells drift (81% of stored
    // rows) — the DEFAULT policy must DECLINE (refining most of a
    // store is a worse rebuild); forced past the guard, the refine
    // still recovers most of the decay, which bounds what
    // cell-by-cell response can do when the damage is total
    val corpusGrown = base.select(col("vec_id"), col("embedding"))
      .unionByName(appended)
    val dirR = java.nio.file.Files.createTempDirectory("ann-refine").toString
    graft.ops.DedupLedger.cloneStore(dir, dirR)
    val declined = VectorOps.refineDriftedCells(spark, dirR, splitFactor = 4)
    println(s"STUDY global-arm default policy refined=" +
      s"${declined.nonEmpty} (expect false: declines to rebuild)")
    val (split, tRefine) = timed(VectorOps.refineDriftedCells(
      spark, dirR, splitFactor = 4, maxRefineFraction = 1.0))
    println(f"STUDY global-arm FORCED refine cells=${split.size} " +
      f"t=$tRefine%.1fs " +
      f"recall@10=${recallAt10(spark, dirR, queries, corpusGrown)}%.3f " +
      f"retrain=${VectorOps.needsRetrain(spark, dirR)}")

    // and after the documented FULL response (retrain over the grown
    // corpus), the diverged store's recall recovers — the cost bar the
    // incremental response is measured against
    val grown = base.unionByName(
      pool.filter(col("vec_id") < 5100))
    val (_, tRebuild) = timed(VectorOps.buildIvfPqIndex(grown, dir, k = 16))
    val corpusAll = grown.select(col("vec_id"), col("embedding"))
    println(f"STUDY retrained t=$tRebuild%.1fs " +
      f"recall@10=${recallAt10(spark, dir, queries, corpusAll)}%.3f")

    // LOCALIZED arm — the scenario the incremental response exists
    // for: a larger in-distribution corpus plus one far diverged blob
    // (every vector shifted by a constant — a new domain appearing in
    // the feed), which lands in 1-2 cells. Refine touches only those
    // cells' content; recall on blob queries must land within ~2
    // points of a full rebuild AT THE SAME serve config, for a
    // fraction of the rewritten rows.
    val allL = GenFixtures.clusteredEmbeddings(spark, 12100).localCheckpoint()
    def shift(emb: DataFrame): DataFrame = emb.withColumn("embedding",
      expr("transform(embedding, x -> x + cast(2.5 AS float))"))
    val baseL = allL.filter(col("vec_id") >= 100 && col("vec_id") < 10100)
      .withColumn("vec_id", col("vec_id") - 100)
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val blob = shift(allL.filter(col("vec_id") >= 10100))
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val qBlob = shift(allL.filter(col("vec_id") < 10))
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val qIn = allL.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"))
    val dirL = java.nio.file.Files.createTempDirectory("ann-local").toString
    VectorOps.buildIvfPqIndex(baseL, dirL, k = 16)
    VectorOps.appendToIvfPqIndex(spark, blob, dirL, Some("blob"))
    val corpusL = baseL.unionByName(blob)
    println(f"STUDY localized pre-refine " +
      f"blob-recall@10=${recallAt10(spark, dirL, qBlob, corpusL)}%.3f " +
      f"indist-recall@10=${recallAt10(spark, dirL, qIn, corpusL)}%.3f " +
      f"drift=${VectorOps.appendedDriftRatio(spark, dirL).get}%.2f " +
      f"retrain=${VectorOps.needsRetrain(spark, dirL)}")
    val dirL2 = java.nio.file.Files.createTempDirectory("ann-local2").toString
    graft.ops.DedupLedger.cloneStore(dirL, dirL2)
    val (splitL, tRefineL) = timed(
      VectorOps.refineDriftedCells(spark, dirL2, splitFactor = 4))
    val refinedRows = spark.read.parquet(s"$dirL2/codes").count() // raw incl. replaced
    println(f"STUDY localized refined cells=${splitL.mkString(",")} " +
      f"t=$tRefineL%.1fs rewrittenRows=${refinedRows - 12000} " +
      f"blob-recall@10=${recallAt10(spark, dirL2, qBlob, corpusL)}%.3f " +
      f"indist-recall@10=${recallAt10(spark, dirL2, qIn, corpusL)}%.3f " +
      f"retrain=${VectorOps.needsRetrain(spark, dirL2)}")
    val (_, tRebuildL) = timed(
      VectorOps.buildIvfPqIndex(corpusL, dirL, k = 16))
    println(f"STUDY localized rebuilt t=$tRebuildL%.1fs totalRows=12000 " +
      f"blob-recall@10=${recallAt10(spark, dirL, qBlob, corpusL)}%.3f " +
      f"indist-recall@10=${recallAt10(spark, dirL, qIn, corpusL)}%.3f")

    spark.stop()
  }
}
