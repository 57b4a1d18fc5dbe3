package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness behind SCALING.md's recall-at-scale table: measures each
  * near-dup family's planted-pair recall against the `planted_pairs`
  * ground truth GenFixtures emits beside the corpus. The cross-engine
  * hash gate proves PARITY (both engines agree), not recall — on a
  * corpus with no rare shingle tail both engines agree on an EMPTY
  * answer, which only a ground-truth join can expose (the round-6
  * study's fourth find: q50/q50b 0% at sf1 while q49's corpus-relative
  * banding holds 98.8%). Run:
  *
  *   sbt "runMain graft.MeasureRecall fixtures/sf1"
  *
  * Truth = planted pairs whose EXACT trigram Jaccard clears the 0.5
  * operator threshold (recomputed here pairwise — linear in planted
  * pairs, not all-pairs). q49/q50 are scored on direct pair membership;
  * q50b in representative space (exact-kind pairs are recovered by the
  * sha2 collapse itself, near pairs must surface between the
  * representatives); q79 against its own contract (planted pairs at
  * exact signature hamming <= 2 — the measurement that exposed the
  * static-cap recall loss the budget-derived cap now fixes). Prints
  * the rare-tail diagnostic alongside, so the routing decision
  * (`TextOps.rareTailDiagnostic`) can be checked against the measured
  * recall it predicts.
  */
object MeasureRecall {

  private def norm(df: DataFrame): DataFrame =
    df.select(least(col("d1"), col("d2")).as("d1"),
              greatest(col("d1"), col("d2")).as("d2"))

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val planted = spark.read.parquet(s"$dir/planted_pairs.parquet")
      .select(least(col("d1"), col("d2")).as("d1"),
              greatest(col("d1"), col("d2")).as("d2"), col("kind"))
    val g = ops.TextOps.shingled(docs).localCheckpoint()

    val truth = planted
      .join(g.select(col("doc_id").as("d1"), col("grams").as("g1")), "d1")
      .join(g.select(col("doc_id").as("d2"), col("grams").as("g2")), "d2")
      .withColumn("jac",
        size(array_intersect(col("g1"), col("g2"))).cast("double") /
        size(array_union(col("g1"), col("g2"))))
      .filter(col("jac") >= 0.5)
      .select("d1", "d2", "kind").localCheckpoint()
    val nTruth = truth.count()
    println(s"ground truth: $nTruth planted pairs at exact Jaccard >= 0.5")

    // one formatter for every family row: label, pairs frame, optional
    // annotation — q122's route tag rides through `suffix` instead of a
    // hand-aligned duplicate of the format string (round-7 ADVICE)
    def report(name: String, found: DataFrame, suffix: String = ""): Long = {
      val n = truth.join(norm(found), Seq("d1", "d2"), "left_semi").count()
      println(f"$name%-28s $n/$nTruth = " +
        f"${100.0 * n / math.max(1L, nTruth)}%5.1f%%$suffix")
      n
    }
    report("q49_minhash_lsh", SparkEntry.queries("q49_minhash_lsh")(spark, dir))
    report("q50_jaccard_neardup", SparkEntry.queries("q50_jaccard_neardup")(spark, dir))
    // q122: the routed operator — must hold recall on EVERY corpus
    // shape (fixtures/sf1 routes to minhash, fixtures/sf1tail to the
    // index, fixtures/sf1mid to the union band; the printed route pins
    // which branch served this corpus)
    val routed = ops.TextOps.routedNearDupPairs(docs).localCheckpoint()
    val route = routed.select("route").limit(1).collect()
      .headOption.map(_.getString(0)).getOrElse("(empty)")
    report("q122_routed_neardup", routed, s" (route: $route)")

    // q50b in representative space: the sha2 collapse recovers
    // exact-kind pairs by construction; near pairs must appear between
    // the group representatives.
    val rep = docs.select(col("doc_id"), sha2(col("text"), 256).as("h"))
    val docRep = rep.join(rep.groupBy("h").agg(min("doc_id").as("rep")), "h")
      .select(col("doc_id"), col("rep")).localCheckpoint()
    val mapped = truth
      .join(docRep.select(col("doc_id").as("d1"), col("rep").as("r1")), "d1")
      .join(docRep.select(col("doc_id").as("d2"), col("rep").as("r2")), "d2")
    val viaCollapse = mapped.filter(col("r1") === col("r2")).count()
    val viaIndex = mapped.filter(col("r1") =!= col("r2"))
      .select(least(col("r1"), col("r2")).as("d1"),
              greatest(col("r1"), col("r2")).as("d2"))
      .join(norm(SparkEntry.queries("q50b_dedup_first_jaccard")(spark, dir)),
            Seq("d1", "d2"), "left_semi").count()
    val n50b = viaCollapse + viaIndex
    println(f"q50b_dedup_first_jaccard     $n50b/$nTruth = " +
      f"${100.0 * n50b / math.max(1L, nTruth)}%5.1f%% " +
      s"(collapse $viaCollapse + index $viaIndex)")

    // q79: SimHash family — its contract is Hamming proximity, not
    // Jaccard, so ground truth is the planted pairs whose EXACT
    // signatures sit within the operator's threshold (<= 2). The
    // pigeonhole 3-band LSH guarantees recall of every such pair unless
    // a band bucket overflows its cap.
    val sig = ops.TextOps.simhashSignaturesOf(docs).localCheckpoint()
    val hamTruth = planted
      .join(sig.select(col("doc_id").as("d1"), col("simhash").as("s1")), "d1")
      .join(sig.select(col("doc_id").as("d2"), col("simhash").as("s2")), "d2")
      .filter(expr("bit_count(s1 ^ s2)") <= 2)
      .select("d1", "d2").localCheckpoint()
    val nHam = hamTruth.count()
    val n79 = hamTruth.join(
      norm(SparkEntry.queries("q79_simhash_hamming")(spark, dir)),
      Seq("d1", "d2"), "left_semi").count()
    println(f"q79_simhash_hamming          $n79/$nHam = " +
      f"${100.0 * n79 / math.max(1L, nHam)}%5.1f%% (of planted pairs at exact hamming <= 2)")

    val (retained, total) = ops.TextOps.rareTailDiagnostic(g)
    println(s"rare-tail diagnostic: retained=$retained of $total distinct grams " +
      "(0 => df-capped index cannot serve this corpus; route to minhash)")
    val (ret2, wit) = ops.TextOps.pairWitnessDiagnostic(g)
    println(s"pair-witness diagnostic: retained=$ret2 of $wit df>=2 grams " +
      f"(ratio ${ret2.toDouble / math.max(1L, wit)}%.4f; >=0.75 index, <0.05 minhash, else both)")
    spark.stop()
  }
}

/** Embedding-family recall study (VERDICT r8 #3 — the oldest carried
  * item): runs against the CLUSTERED vector fixture
  * (`GenFixtures <dir> <mult> vecs` — embeddings + planted_vec_pairs),
  * the first corpus where the embedding families have ground truth.
  *
  *   sbt "runMain graft.MeasureVecRecall fixtures/sf1vec"
  *
  * Three measurements:
  *  - q55 / q97 planted-pair recall, truth = planted pairs whose EXACT
  *    integer-quantized cosine (the operators' own verify arithmetic)
  *    clears COS_T. q55's label blocking should be lossless here (a
  *    near-dup inherits its partner's cell); q97 is stratified by
  *    cosine against the closed-form SRP curve
  *    p = 1 - (1 - (1 - theta/pi)^bits)^bands — measured ~= predicted
  *    means the banding + caps lose nothing beyond the LSH physics;
  *    measured << predicted means a cap or bucket overflow is eating
  *    recall (the q79 static-cap story, never before checked here).
  *  - q52 / q64 IVF recall@5 vs the brute-force q51 top-5 — the
  *    standard ANN quality metric, meaningful only on this fixture
  *    (the driver corpus has no geometry, so IVF recall on it is the
  *    trivial cells-probed/cells).
  */
object MeasureVecRecall {

  private def norm(df: DataFrame, a: String, b: String): DataFrame =
    df.select(least(col(a), col(b)).as("v1"), greatest(col(a), col(b)).as("v2"))

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val quant = Tables.embeddings(spark, dir)
      .withColumn("q", expr(ops.VectorOps.quantExpr))
      .withColumn("nrm", graft.functions.VectorFunctions.ldot(col("q"), col("q")))
      .select(col("vec_id"), col("q"), col("nrm")).localCheckpoint()
    val planted = spark.read.parquet(s"$dir/planted_vec_pairs.parquet")

    // truth in the operators' own arithmetic: exact quantized cosine
    val truth = planted
      .join(quant.select(col("vec_id").as("v1"), col("q").as("q1"), col("nrm").as("n1")), "v1")
      .join(quant.select(col("vec_id").as("v2"), col("q").as("q2"), col("nrm").as("n2")), "v2")
      .withColumn("qcos",
        graft.functions.VectorFunctions.ldot(col("q1"), col("q2")).cast("double") /
        sqrt(col("n1").cast("double")) / sqrt(col("n2").cast("double")))
      .filter(col("qcos") >= ops.DedupOps.COS_T)
      .select("v1", "v2", "qcos").localCheckpoint()
    val nTruth = truth.count()
    println(s"ground truth: $nTruth planted pairs at quantized cosine >= ${ops.DedupOps.COS_T}")

    def report(name: String, found: DataFrame): Unit = {
      val n = truth.join(norm(found, "v1", "v2"), Seq("v1", "v2"), "left_semi").count()
      println(f"$name%-24s $n/$nTruth = ${100.0 * n / math.max(1L, nTruth)}%5.1f%%")
    }
    report("q55_embedding_neardup",
      SparkEntry.queries("q55_embedding_neardup")(spark, dir))

    // q97 stratified against the SRP collision curve
    val q97 = norm(SparkEntry.queries("q97_srp_lsh")(spark, dir), "v1", "v2")
      .localCheckpoint()
    val strata = truth.join(q97.withColumn("hit", lit(1)), Seq("v1", "v2"), "left")
      .withColumn("bucket", floor(col("qcos") * 10) / 10.0)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum(coalesce(col("hit"), lit(0))).as("hits"),
           avg(col("qcos")).as("mcos"))
      .orderBy("bucket")
      .collect()
    println("q97_srp_lsh by cosine stratum (measured vs SRP physics):")
    var wPred = 0.0; var wN = 0L; var hitsAll = 0L
    strata.foreach { r =>
      val (b, n, hits, mcos) =
        (r.getDouble(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      val pBit = 1.0 - math.acos(math.min(1.0, mcos)) / math.Pi
      val pred = 1.0 - math.pow(1.0 - math.pow(pBit, ops.DedupOps.SRP_BITS),
                                ops.DedupOps.SRP_BANDS)
      wPred += pred * n; wN += n; hitsAll += hits
      println(f"  [$b%.1f,${b + 0.1}%.1f) $hits%4d/$n%-4d = ${100.0 * hits / n}%5.1f%%  predicted ${100 * pred}%5.1f%%")
    }
    println(f"q97_srp_lsh overall          $hitsAll/$wN = ${100.0 * hitsAll / math.max(1L, wN)}%5.1f%%" +
      f"  predicted ${100.0 * wPred / math.max(1L, wN)}%5.1f%%")

    // IVF recall@5 vs brute force: |top5(ann) intersect top5(brute)| / 5
    val brute = SparkEntry.queries("q51_cosine_topk")(spark, dir)
      .filter(col("rn") <= 5).select(col("qid"), col("vec_id")).localCheckpoint()
    val nq = brute.select("qid").distinct().count()
    def recallAt5(name: String): Unit = {
      val hits = SparkEntry.queries(name)(spark, dir)
        .select(col("qid"), col("vec_id"))
        .join(brute, Seq("qid", "vec_id"), "left_semi").count()
      println(f"$name%-24s recall@5 = $hits/${5 * nq} = ${100.0 * hits / (5 * nq)}%5.1f%%")
    }
    recallAt5("q52_ann_ivf")
    recallAt5("q64_ann_multiprobe")

    // the LEARNED index (q124 build -> q125 probe): same recall@5
    // metric, but the cells come from the engine's own Lloyd build
    // instead of the fixture's label column — the end-to-end ANN
    // lifecycle quality number. Swept over k: the fixture has 10 true
    // clusters, so k=8 undersplits (merged cells, neighbors leak out of
    // probe range), k=10 matches, k=16 oversplits (smaller cells,
    // single probe misses boundary neighbors) — the standard
    // k-vs-recall trade the operator's k knob controls (q125 gates the
    // k=8 point).
    for (k <- Seq(8, 10, 16)) {
      val learned = ops.VectorOps
        .learnedCellTopK(Tables.embeddings(spark, dir), k = k,
                         numQueries = 10, topK = 5)
        .select(col("qid"), col("vec_id"))
        .join(brute, Seq("qid", "vec_id"), "left_semi").count()
      println(f"q125_learned_cells k=$k%-3d recall@5 = $learned/${5 * nq} = " +
        f"${100.0 * learned / (5 * nq)}%5.1f%%")
    }

    // the PQ family (q126 ADC over the FULL corpus, q127 IVFADC+R):
    // q126 isolates pure quantization loss (no routing — every miss is
    // the codebook's fault); the q127 sweep separates the two loss
    // sources the composed stack has: probes bounds what routing can
    // see, rerank bounds what ADC ordering error can hide. rerank=5 is
    // "trust ADC order within probed cells"; widening rerank buys back
    // exactly the neighbors ADC misranked — the measured gap IS the
    // value of the re-rank stage.
    val adcHits = ops.VectorOps
      .pqAdcTopK(Tables.embeddings(spark, dir), numQueries = 10, topK = 5)
      .select(col("qid"), col("vec_id"))
      .join(brute, Seq("qid", "vec_id"), "left_semi").count()
    println(f"q126_pq_adc full-corpus  recall@5 = $adcHits/${5 * nq} = " +
      f"${100.0 * adcHits / (5 * nq)}%5.1f%%")
    // the JOINT probes × rerank calibration grid (VERDICT r11 #2): the
    // round-11 1-D sweeps discovered "widen probes and rerank together
    // or not at all" from two slices; this commits the full surface so
    // the knee is read off one table per corpus shape
    val joint = Seq((1, 5), (2, 5)) ++
      (for (p <- 2 to 5; r <- Seq(20, 50, 100)) yield (p, r))
    for ((p, r) <- joint) {
      val hits = ops.VectorOps
        .ivfPqRerankTopK(Tables.embeddings(spark, dir), k = 10,
                         numQueries = 10, probes = p, rerank = r, topK = 5)
        .select(col("qid"), col("vec_id"))
        .join(brute, Seq("qid", "vec_id"), "left_semi").count()
      println(f"q127_ivfpq p=$p r=$r%-3d       recall@5 = $hits/${5 * nq} = " +
        f"${100.0 * hits / (5 * nq)}%5.1f%%")
    }

    // coarse-iterations sweep: with the held-out init the coarse
    // quantizer (ONE Lloyd update in the gated trajectory) is plausibly
    // the binding loss — does more training buy serving recall at the
    // gated probes/rerank? (PQ codebook rounds were already measured
    // NEGATIVE — singleton seeds collapse — this sweeps the coarse side
    // only.)
    for (it <- Seq(1, 2, 4, 8)) {
      val hits = ops.VectorOps
        .ivfPqRerankTopK(Tables.embeddings(spark, dir), k = 10,
                         numQueries = 10, probes = ops.VectorOps.IVFPQ_PROBES,
                         rerank = ops.VectorOps.IVFPQ_RERANK, topK = 5,
                         coarseIters = it)
        .select(col("qid"), col("vec_id"))
        .join(brute, Seq("qid", "vec_id"), "left_semi").count()
      println(f"q127_ivfpq coarseIters=$it%-2d   recall@5 = $hits/${5 * nq} = " +
        f"${100.0 * hits / (5 * nq)}%5.1f%%")
    }
    spark.stop()
  }
}
