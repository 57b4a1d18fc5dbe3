package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions.ldot

/** Embedding-space corpus curation (SURVEY.md §2.9 extension surface):
  * semantic deduplication and cluster-balanced selection — the two
  * embedding-driven pruning passes a large-scale training-data pipeline
  * runs AFTER lexical dedup (q47–q50b) has removed the literal copies.
  *
  * q131 is the SemDeDup shape (Abbas et al., "SemDeDup: Data-efficient
  * learning at web-scale through semantic deduplication", 2023): cluster
  * the corpus with k-means, compare pairs ONLY within a cluster, and for
  * every pair above the cosine threshold keep the member FARTHER from
  * its centroid (the cluster's "edge" representative carries more
  * information than its redundant center mass). The within-cluster
  * restriction is the entire scale story — the quadratic pair space is
  * bounded per cluster instead of corpus-wide, which is what makes
  * semantic dedup tractable at web scale (the paper runs it on LAION/
  * C4 with k in the tens of thousands; k scales with corpus size so
  * cluster width stays roughly constant).
  *
  * q133 is cluster-balanced selection: a deterministic per-cluster
  * sample (fixed quota per learned cell, md5-ordered) — the standard
  * counter to a web corpus's head-heavy topic skew: uniform sampling
  * reproduces the skew, cluster-balanced sampling flattens it.
  *
  * Both reuse the q124 coarse-quantizer machinery ([[VectorOps.kmeansFit]]
  * / [[VectorOps.kmeansAssign]]) at the gated config, so the learned
  * clustering these ops prune against is the SAME artifact the ANN
  * index routes with — one clustering pass feeds index build, dedup,
  * and selection, exactly how a production pipeline amortizes it.
  *
  * Scale notes: the corpus never shuffles during clustering (broadcast
  * assign, k×dim partial-sum update); the pair stage shuffles once on
  * the chunk-pair key ([[DedupOps.chunkedBlockPairs]] bounds every task
  * at ~chunk² pairs, so one giant cluster cannot become a straggler);
  * the verdict join back to the corpus is a broadcast of the dropped-id
  * set (bounded by the duplicate count, not the corpus). Cross-engine
  * determinism is the embedding-family standard: exact int64 dots and
  * distance numerators, one IEEE division, ties on vec_id.
  */
object SemanticOps {

  /** Pair threshold for q131. Deliberately BELOW the near-dup gate
    * (q55's 0.4): semantic dedup targets REDUNDANCY (same content,
    * different words), not just near-copies — the paper prunes at
    * similarity levels lexical dedup never touches. On the fixture the
    * within-cluster cosine mass sits in [-0.5, 0.5] (measured
    * histogram: 111 label-blocked pairs ≥ 0.3, 5 ≥ 0.4), so 0.3
    * exercises a real prune set (~37% of the sf0.01 corpus through the
    * LEARNED cells — within the paper's reported 3–50% range) instead
    * of a degenerate handful; a production run tunes this against a
    * dedup-rate target exactly as the paper does.
    */
  private[graft] val SEMDEDUP_T = 0.3

  /** q133's per-cluster quota. */
  private[graft] val SAMPLE_PER_CELL = 20

  // q135 hybrid retrieval: query count (the catalog's held-out
  // convention), per-modality candidate pool, and the standard RRF
  // smoothing constant (Cormack & Clarke's k=60).
  private[graft] val HYBRID_QUERIES = 10
  private[graft] val HYBRID_POOL = 50
  private[graft] val RRF_K = 60

  /** The fitted coarse clustering as a driver-cached artifact — moved
    * to [[VectorOps.fittedCents]] (round-12 VERDICT #8: q125 joins
    * q131/q133 as a consumer, and the cache belongs with the trainer). */
  private def fittedCents(spark: SparkSession, d: String,
                          k: Int, iters: Int): DataFrame =
    VectorOps.fittedCents(spark, d, k, iters)

  /** SemDeDup over `emb` (vec_id, embedding): returns one row per
    * vector — (vec_id, cell, keep) — where keep=0 marks vectors pruned
    * because some same-cell neighbor exceeds `cosT` and ranks ahead of
    * them under the keep policy (centroid distance DESC, vec_id ASC:
    * keep the edge point, drop the redundant center mass; ties keep the
    * lower id). Pair semantics are per-pair independent (the paper's
    * formulation), so the pass is one shuffle + one broadcast join —
    * no iteration, no driver-side graph.
    */
  def semanticDedup(emb: DataFrame, k: Int, iters: Int, cosT: Double,
                    fitted: Option[DataFrame] = None,
                    probes: Int = 1): DataFrame = {
    val quant = emb.withColumn("q", expr(VectorOps.quantExpr))
      .select(col("vec_id"), col("q"))
    val cents = fitted.getOrElse(VectorOps.kmeansFit(quant, k, iters, None))
    // (vec_id, q, cell, dist): dist = exact-int numerator / n² to the
    // ASSIGNED centroid — the keep policy's ranking key, computed once
    // here and never re-derived
    val assigned = VectorOps.kmeansAssign(quant, cents)
      .withColumn("norm", ldot(col("q"), col("q")))
      .localCheckpoint() // shared by the pair stage and the verdict join
    // pair candidates: vectors sharing a probed cell. probes=1 is the
    // paper's within-cluster restriction; probes>1 multi-assigns each
    // vector to its p nearest cells — the measured mitigation for
    // blurred cluster boundaries (SCALING.md r12 addendum 4: blocking
    // recall on the blurred fixture 74% @0.8 single-probe), bounding
    // the extra pair work at ≤ p² per pair instead of widening k. The
    // keep-policy distance stays the PRIMARY assignment's.
    val blockSrc =
      if (probes <= 1) assigned
      else VectorOps.kmeansAssignTopP(quant, cents, probes)
        .withColumn("norm", ldot(col("q"), col("q")))
    // within-cell pairs, skew-safe: cell plays the block label. With
    // probes>1 a pair sharing several probed cells scores more than
    // once — harmless: the verdict is DISTINCT and cos is pair-local.
    val pairs = DedupOps.chunkedBlockPairs(
      blockSrc.select(col("vec_id"), col("cell").as("label"),
                      col("q"), col("norm"), col("dist")))
    // cos divides by the ASCENDING-id norm first (the q55 ulp rule)
    val n1 = when(col("a_vec") === col("v1"), col("a_norm")).otherwise(col("b_norm"))
    val n2 = when(col("a_vec") === col("v1"), col("b_norm")).otherwise(col("a_norm"))
    val d1 = when(col("a_vec") === col("v1"), col("a_dist")).otherwise(col("b_dist"))
    val d2 = when(col("a_vec") === col("v1"), col("b_dist")).otherwise(col("a_dist"))
    val dropped = pairs
      .withColumn("dot", ldot(col("a_q"), col("b_q")))
      .withColumn("cos", col("dot").cast("double") /
        sqrt(n1.cast("double")) / sqrt(n2.cast("double")))
      .filter(col("cos") >= cosT)
      // loser = the pair member the keep policy ranks second
      .select(when(d1 > d2, col("v2")).when(d2 > d1, col("v1"))
        .otherwise(col("v2")).as("vec_id"))
      .distinct()
      .withColumn("is_dropped", lit(1L))
    assigned
      .join(broadcast(dropped), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
              when(col("is_dropped").isNotNull, 0L).otherwise(1L).as("keep"))
      .orderBy(col("vec_id"))
  }

  /** Cluster-balanced selection: up to `perCell` vectors per learned
    * cell, chosen by md5(vec_id) order — a deterministic uniform draw
    * WITHIN each cluster that both engines replay exactly. Output is
    * (cell, vec_id, rnk). One shuffle (the per-cell window); the md5
    * rank is row-local.
    */
  def clusterBalancedSample(emb: DataFrame, k: Int, iters: Int,
                            perCell: Int,
                            fitted: Option[DataFrame] = None): DataFrame = {
    val quant = emb.withColumn("q", expr(VectorOps.quantExpr))
      .select(col("vec_id"), col("q"))
    val assigned = VectorOps.kmeansAssign(quant,
      fitted.getOrElse(VectorOps.kmeansFit(quant, k, iters, None)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cell"))
      .orderBy(col("h"), col("vec_id"))
    assigned
      .withColumn("h", md5(col("vec_id").cast("string").cast("binary")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= perCell)
      .select(col("cell"), col("vec_id"), col("rnk"))
      .orderBy(col("cell"), col("rnk"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- q131: SemDeDup — k-means blocking + within-cluster cosine +
    // keep-the-edge policy. The hash covers the learned clustering (a
    // re-celled vector changes its pair set), every pairwise cosine
    // crossing the threshold, and the keep ranking.
    "q131_semantic_dedup" -> ((s, d) =>
      semanticDedup(Tables.rebalance(Tables.embeddings(s, d)),
        k = VectorOps.GATED_K, iters = VectorOps.IVF_COARSE_ITERS,
        cosT = SEMDEDUP_T,
        fitted = Some(fittedCents(s, d,
          VectorOps.GATED_K, VectorOps.IVF_COARSE_ITERS)))),

    // ---- q137: multi-probe SemDeDup — the q131 prune with each vector
    // multi-assigned to its 2 nearest cells for the PAIR stage (the
    // keep policy still ranks by the primary-cell distance). This is
    // the measured mitigation for near-dup pairs straddling a cell
    // boundary (SCALING.md r12 addendum 4): on the blurred fixture
    // single-probe blocking misses a quarter of the 0.8-band planted
    // pairs; probing the runner-up cell recovers the straddlers at
    // ≤ 4× pair work, without coarsening k.
    "q137_semantic_dedup_probes" -> ((s, d) =>
      semanticDedup(Tables.rebalance(Tables.embeddings(s, d)),
        k = VectorOps.GATED_K, iters = VectorOps.IVF_COARSE_ITERS,
        cosT = SEMDEDUP_T,
        fitted = Some(fittedCents(s, d,
          VectorOps.GATED_K, VectorOps.IVF_COARSE_ITERS)),
        probes = 2)),

    // ---- q133: cluster-balanced selection over the same learned cells.
    "q133_cluster_sample" -> ((s, d) =>
      clusterBalancedSample(Tables.rebalance(Tables.embeddings(s, d)),
        k = VectorOps.GATED_K, iters = VectorOps.IVF_COARSE_ITERS,
        perCell = SAMPLE_PER_CELL,
        fitted = Some(fittedCents(s, d,
          VectorOps.GATED_K, VectorOps.IVF_COARSE_ITERS)))),

    // ---- q135: HYBRID retrieval — lexical token-overlap ranking fused
    // with exact-cosine vector ranking by Reciprocal Rank Fusion
    // (rrf = Σ 1/(k + rank), k=60), the standard way a retrieval stack
    // combines a keyword index with a vector index without score
    // calibration. `doc_id` and `vec_id` are the shared document key
    // (the fixture's embeddings are the documents' vectors). Topology:
    // the lexical arm is one inverted-index shuffle on the token
    // (postings join against the broadcast query tokens — 100 TB
    // shape); the vector arm is q51's corpus-streams/queries-broadcast
    // scan; the fusion joins two ≤ queries×pool frames — driver-scale.
    // Both ranks tie-break on doc_id, so the fused ordering — and the
    // hash — is deterministic cross-engine.
    "q135_hybrid_rrf" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
      val toks = Tables.documents(s, d)
        .select(col("doc_id"),
                explode(array_distinct(split(col("text"), " "))).as("tok"))
      val qToks = toks.filter(col("doc_id") < HYBRID_QUERIES)
        .select(col("doc_id").as("qid"), col("tok"))
      val wLex = w.partitionBy(col("qid"))
        .orderBy(col("shared").desc, col("doc_id"))
      val lex = toks.join(broadcast(qToks), Seq("tok"))
        .filter(col("doc_id") =!= col("qid"))
        .groupBy(col("qid"), col("doc_id"))
        .agg(count(lit(1)).as("shared")) // both sides distinct → |∩|
        .withColumn("lrn", row_number().over(wLex).cast("long"))
        .filter(col("lrn") <= HYBRID_POOL)
        .select(col("qid"), col("doc_id"), col("lrn"))
      val emb = Tables.rebalance(Tables.embeddings(s, d))
        .withColumn("q", expr(VectorOps.quantExpr))
        .withColumn("norm", ldot(col("q"), col("q")))
        .select(col("vec_id"), col("q"), col("norm"))
      val qVecs = emb.filter(col("vec_id") < HYBRID_QUERIES)
        .select(col("vec_id").as("qid"), col("q").as("qv"),
                col("norm").as("qnorm"))
      val wVec = w.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("vec_id"))
      val vec = emb.join(broadcast(qVecs), col("vec_id") =!= col("qid"))
        .withColumn("dot", ldot(col("q"), col("qv")))
        .withColumn("cos", col("dot").cast("double") /
          sqrt(col("norm").cast("double")) / sqrt(col("qnorm").cast("double")))
        .withColumn("vrn", row_number().over(wVec).cast("long"))
        .filter(col("vrn") <= HYBRID_POOL)
        .select(col("qid"), col("vec_id").as("doc_id"), col("vrn"))
      val wTop = w.partitionBy(col("qid"))
        .orderBy(col("rrf").desc, col("doc_id"))
      lex.join(vec, Seq("qid", "doc_id"), "full_outer")
        .withColumn("rrf",
          coalesce(lit(1.0) / (lit(RRF_K) + col("lrn")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RRF_K) + col("vrn")), lit(0.0)))
        .withColumn("rn", row_number().over(wTop).cast("long"))
        .filter(col("rn") <= 5)
        .select(col("qid"), col("doc_id"), col("rrf"), col("rn"))
        .orderBy(col("qid"), col("rn"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q131_semantic_dedup" ->
      s"""WITH ${VectorOps.embCteDuck},
        |kin AS (SELECT vec_id, q FROM e),
        |${VectorOps.kmeansCteDuck(VectorOps.GATED_K, VectorOps.IVF_COARSE_ITERS)},
        |av AS MATERIALIZED (
        |  SELECT a.vec_id, a.cell, a.dist, e.q,
        |         ${VectorOps.dotDuck("e.q", "e.q")} AS norm
        |  FROM a2full a JOIN e USING (vec_id)),
        |hits AS (
        |  SELECT a.vec_id AS v1, b.vec_id AS v2, a.dist AS d1, b.dist AS d2
        |  FROM av a JOIN av b ON a.cell = b.cell AND a.vec_id < b.vec_id
        |  WHERE ${VectorOps.dotDuck("a.q", "b.q")}::DOUBLE
        |          / sqrt(a.norm::DOUBLE) / sqrt(b.norm::DOUBLE) >= $SEMDEDUP_T),
        |dropped AS (
        |  SELECT DISTINCT CASE WHEN d1 > d2 THEN v2
        |                       WHEN d2 > d1 THEN v1
        |                       ELSE v2 END AS vec_id
        |  FROM hits)
        |SELECT av.vec_id, av.cell,
        |       CASE WHEN dr.vec_id IS NULL THEN 1 ELSE 0 END::BIGINT AS keep
        |FROM av LEFT JOIN dropped dr USING (vec_id)
        |ORDER BY av.vec_id""".stripMargin,

    // q131's body with the pair source widened to the 2 nearest cells
    // per vector (rn <= 2 instead of the primary-only a2); keep policy
    // unchanged (primary-cell distance from a2full)
    "q137_semantic_dedup_probes" ->
      s"""WITH ${VectorOps.embCteDuck},
        |kin AS (SELECT vec_id, q FROM e),
        |${VectorOps.kmeansCteDuck(VectorOps.GATED_K, VectorOps.IVF_COARSE_ITERS)},
        |av AS MATERIALIZED (
        |  SELECT a.vec_id, a.cell, a.dist, e.q,
        |         ${VectorOps.dotDuck("e.q", "e.q")} AS norm
        |  FROM a2full a JOIN e USING (vec_id)),
        |probe AS MATERIALIZED (
        |  SELECT vec_id, cell FROM (
        |    SELECT vec_id, cell, row_number() OVER (
        |      PARTITION BY vec_id ORDER BY dist, cell) AS rn FROM (
        |      SELECT e.vec_id, c.cell,
        |        list_sum(list_transform(list_zip(e.q, c.s),
        |          p -> (p[1] * c.n - p[2]) * (p[1] * c.n - p[2])))::BIGINT::DOUBLE
        |          / (c.n * c.n)::DOUBLE AS dist
        |      FROM e CROSS JOIN c1n c))
        |  WHERE rn <= 2),
        |hits AS (
        |  SELECT DISTINCT a.vec_id AS v1, b.vec_id AS v2,
        |         a.dist AS d1, b.dist AS d2
        |  FROM probe pa JOIN probe pb
        |    ON pa.cell = pb.cell AND pa.vec_id < pb.vec_id
        |  JOIN av a ON a.vec_id = pa.vec_id
        |  JOIN av b ON b.vec_id = pb.vec_id
        |  WHERE ${VectorOps.dotDuck("a.q", "b.q")}::DOUBLE
        |          / sqrt(a.norm::DOUBLE) / sqrt(b.norm::DOUBLE) >= $SEMDEDUP_T),
        |dropped AS (
        |  SELECT DISTINCT CASE WHEN d1 > d2 THEN v2
        |                       WHEN d2 > d1 THEN v1
        |                       ELSE v2 END AS vec_id
        |  FROM hits)
        |SELECT av.vec_id, av.cell,
        |       CASE WHEN dr.vec_id IS NULL THEN 1 ELSE 0 END::BIGINT AS keep
        |FROM av LEFT JOIN dropped dr USING (vec_id)
        |ORDER BY av.vec_id""".stripMargin,

    "q133_cluster_sample" ->
      s"""WITH ${VectorOps.embCteDuck},
        |kin AS (SELECT vec_id, q FROM e),
        |${VectorOps.kmeansCteDuck(VectorOps.GATED_K, VectorOps.IVF_COARSE_ITERS)}
        |SELECT cell, vec_id, rnk FROM (
        |  SELECT cell, vec_id, row_number() OVER (
        |    PARTITION BY cell ORDER BY md5(vec_id::VARCHAR), vec_id)::BIGINT AS rnk
        |  FROM a2)
        |WHERE rnk <= $SAMPLE_PER_CELL
        |ORDER BY cell, rnk""".stripMargin,

    "q135_hybrid_rrf" ->
      s"""WITH toks AS (
        |  SELECT doc_id, unnest(list_distinct(str_split(text, ' '))) AS tok
        |  FROM documents),
        |qt AS (SELECT doc_id AS qid, tok FROM toks
        |       WHERE doc_id < $HYBRID_QUERIES),
        |lexs AS (
        |  SELECT qt.qid, t.doc_id, count(*) AS shared
        |  FROM toks t JOIN qt ON t.tok = qt.tok AND t.doc_id <> qt.qid
        |  GROUP BY qt.qid, t.doc_id),
        |lex AS (
        |  SELECT qid, doc_id, lrn FROM (
        |    SELECT qid, doc_id, row_number() OVER (
        |      PARTITION BY qid ORDER BY shared DESC, doc_id)::BIGINT AS lrn
        |    FROM lexs)
        |  WHERE lrn <= $HYBRID_POOL),
        |${VectorOps.embCteDuck},
        |n AS (SELECT vec_id, q, ${VectorOps.dotDuck("q", "q")} AS norm FROM e),
        |qs AS (SELECT vec_id AS qid, q AS qv, norm AS qnorm FROM n
        |       WHERE vec_id < $HYBRID_QUERIES),
        |scored AS (
        |  SELECT qid, vec_id,
        |    ${VectorOps.dotDuck("q", "qv")}::DOUBLE
        |      / sqrt(norm::DOUBLE) / sqrt(qnorm::DOUBLE) AS cos
        |  FROM n CROSS JOIN qs WHERE vec_id <> qid),
        |vec AS (
        |  SELECT qid, doc_id, vrn FROM (
        |    SELECT qid, vec_id AS doc_id, row_number() OVER (
        |      PARTITION BY qid ORDER BY cos DESC, vec_id)::BIGINT AS vrn
        |    FROM scored)
        |  WHERE vrn <= $HYBRID_POOL),
        |fused AS (
        |  SELECT qid, doc_id,
        |    coalesce(1.0::DOUBLE / ($RRF_K + lrn), 0.0)
        |      + coalesce(1.0::DOUBLE / ($RRF_K + vrn), 0.0) AS rrf
        |  FROM lex FULL JOIN vec USING (qid, doc_id))
        |SELECT qid, doc_id, rrf, rn FROM (
        |  SELECT qid, doc_id, rrf, row_number() OVER (
        |    PARTITION BY qid ORDER BY rrf DESC, doc_id)::BIGINT AS rn
        |  FROM fused)
        |WHERE rn <= 5 ORDER BY qid, rn""".stripMargin
  )
}
