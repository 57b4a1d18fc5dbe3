package graft

import org.apache.spark.sql.functions._

/** Plan-shape regression guard: the performance-critical plan properties
  * PLANS.md documents, asserted so a future refactor can't silently
  * regress them. Assertions are deliberately coarse (presence of the
  * load-bearing node/property, not full plan text).
  */
class PlanGuardSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  test("q01: filter reaches the parquet scan and aggregation is partial+final") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    assert(p.contains("partial_sum"), p)
  }

  test("q05: star join never shuffles lineitem before aggregation") {
    val p = plan("q05_region_revenue")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the only exchanges are broadcast builds + the final group-by/sort
    val shuffles = "Exchange (hash|range)partitioning".r.findAllIn(p).size
    assert(shuffles <= 2, s"$shuffles data shuffles in\n$p")
  }

  test("q54: the dim cut happens inside the Generate (slice before explode)") {
    val p = plan("q54_label_centroid")
    assert(p.contains("slice(embedding"), p)
    // dim is a legitimate agg key; what must NOT exist is a Filter on it
    // (the old shape exploded 64 dims and filtered after the Generate)
    assert(p.linesIterator.forall(l => !(l.contains("Filter") && l.contains("dim"))), p)
  }

  test("q51: query side broadcasts; corpus side is never shuffled pre-score") {
    val p = plan("q51_cosine_topk")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q55: candidate join keys include the chunk ids (skew spread)") {
    val p = SparkEntry.queries("q55_embedding_neardup")(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(p.contains("_i") && p.contains("_j"), p)
  }

  test("q18: dim still broadcasts at fixture scale through the size gate") {
    // broadcastIfSmall must resolve to a broadcast here (part is tiny at
    // sf0.001); at 100x the gate drops the hint instead of OOMing the driver.
    val p = plan("q18_broadcast_join")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q50/q49/q66: verify joins read the checkpointed shingle table, not a recompute") {
    // The tokenize→trigram pipeline must run ONCE: final plan reads the
    // materialized RDD everywhere — zero parquet scans, zero re-derived
    // trigram constructions (Catalyst has no common-subplan reuse, so a
    // non-checkpointed g0 would appear 3x).
    for (q <- Seq("q50_jaccard_neardup", "q49_minhash_lsh", "q66_fuzzy_neardup")) {
      val p = plan(q)
      assert(!p.contains("Scan parquet"), s"$q re-scans the corpus:\n$p")
      assert(p.contains("Scan ExistingRDD"), s"$q missing checkpoint scan:\n$p")
      assert(!p.contains("concat_ws( , element_at"),
        s"$q re-derives trigrams in the final plan:\n$p")
    }
  }

  test("q122: the routed path's winning branch reads the checkpointed shingle " +
       "table the witness diagnostic already materialized") {
    // routedNearDupPairs runs the witness-ratio diagnostic EAGERLY over
    // one shingle checkpoint, then the winning branch must re-read THAT
    // materialized RDD — a drift that re-derives the tokenize→trigram
    // pipeline (or re-scans parquet) pays a second corpus pass per
    // branch at 100 TB (VERDICT r13 What's-wrong #3: verify before
    // touching anything)
    val p = plan("q122_routed_neardup")
    assert(!p.contains("Scan parquet"), s"q122 re-scans the corpus:\n$p")
    assert(p.contains("Scan ExistingRDD"), s"q122 missing checkpoint scan:\n$p")
    assert(!p.contains("concat_ws( , element_at"),
      s"q122 re-derives trigrams in the final plan:\n$p")
  }

  test("q84: the verdict chain is one scan-shaped pass (no extra shuffle)") {
    val p = plan("q84_filter_pipeline")
    // exactly one parquet scan of two columns, partial+final agg, and the
    // only exchanges are the group-by hash + the final sort
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
    assert(p.contains("ReadSchema: struct<text:string,lang:string>"), p)
    val shuffles = "Exchange (hash|range)partitioning".r.findAllIn(p).size
    assert(shuffles <= 2, s"$shuffles shuffles in\n$p")
  }

  test("q120: winnowing is one scan-shaped pass; the orderBy is the only shuffle") {
    val p = plan("q120_winnow_fingerprint")
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
    // doc_id + text only — the winnow projection prunes the rest
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
    val shuffles = "Exchange (hash|range)partitioning".r.findAllIn(p).size
    assert(shuffles <= 1, s"$shuffles shuffles in\n$p")
    assert(!p.contains("BatchEvalPython") && !p.toLowerCase.contains("udf"), p)
  }

  test("q118/q119: media pipelines are scan-shaped; orderBy is the only keyed exchange") {
    for (q <- Seq("q118_image_resize", "q119_gif_frame_sample")) {
      val p = plan(q)
      val shuffles = "Exchange (hash|range)partitioning".r.findAllIn(p).size
      assert(shuffles <= 1, s"$shuffles keyed shuffles in $q:\n$p")
      // encode -> resample/sample -> featurize all chain inside the
      // scan stage; no join, no aggregation pre-sort
      assert(!p.contains("Join"), s"unexpected join in $q:\n$p")
    }
  }

  test("q50/q49: non-overlapping candidates short-circuit before the intersection") {
    // the verify join must filter on arrays_overlap (first-shared-element
    // exit) before paying the full array_intersect + sizes
    for (q <- Seq("q50_jaccard_neardup", "q49_minhash_lsh")) {
      val p = plan(q)
      assert(p.contains("arrays_overlap"), s"$q missing overlap short-circuit:\n$p")
    }
  }

  test("q79: no join back onto the signature pipeline (pairs carry simhashes)") {
    val p = plan("q79_simhash_hamming")
    assert(!p.contains("Join"), p) // single linear pipeline, no joins at all
  }

  test("q17b: the NATIVE as-of operator is in the plan (not the window form)") {
    val p = plan("q17b_asof_native")
    // AsOfJoinExec renders as "AsOfJoin" (nodeName strips Exec); both
    // children arrive sorted on (key, ts) via EnsureRequirements
    assert(p.contains("AsOfJoin "), p)
    assert(!p.contains("Window"), p)
  }

  test("q103: the salt is part of the join key on BOTH sides, and the join is sort-merge") {
    val p = plan("q103_salted_join")
    // the shuffle spreads each hot okey over `salts` reducers
    assert("\\[okey#\\d+L?, _salt#\\d+\\], \\[okey#\\d+L?, _salt#\\d+\\]"
      .r.findFirstIn(p).isDefined, p)
    // pinned sort-merge: Generate's size estimate ignores the explode
    // factor, so without the hint Catalyst broadcasts the REPLICATED dim
    // (measured at sf1: 12M rows shipped off a 1.5M-row estimate) —
    // exactly the regime salting exists to avoid
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("BroadcastHashJoin"), p)
  }

  test("q101: flagship pivot is direct per-key aggregation; no build-map-then-probe") {
    // RewriteMapPivot's target idiom — element_at over
    // map_from_entries(sort_array(collect_list(...))) — must not exist
    // anywhere in the flagship record pipeline, because kvPivotFirst is
    // WRITTEN in the shape the rule produces (one pivot shuffle,
    // min_by/CASE per label). The rule can't even fire here: the
    // first-match-by-pos and '、'-join semantics aren't expressible as a
    // last-win map probe, which is exactly why the direct form is used.
    // This guard pins that: reintroducing the reference's
    // build-dict-then-probe shape (unbounded per-group buffers feeding a
    // throwaway map) fails loudly.
    // (q101 DOES build maps from collected entries — A3/A5/A6, where the
    // map IS the product, bounded per group and serialized downstream;
    // the anti-pattern is specifically building one and then PROBING it
    // by literal key.)
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, ElementAt, ExprId, Literal, MapFromEntries}
    import org.apache.spark.sql.catalyst.expressions.aggregate.CollectList
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    val opt = SparkEntry.queries("q101_job_record")(spark, sf)
      .queryExecution.optimizedPlan
    def isCollectMap(e: org.apache.spark.sql.catalyst.expressions.Expression) =
      e.isInstanceOf[MapFromEntries] &&
        e.exists { case _: CollectList => true; case _ => false }
    // aliases that carry a collected map out of an Aggregate
    val mapAliases = scala.collection.mutable.Set[ExprId]()
    opt.foreach {
      case a: Aggregate => a.aggregateExpressions.foreach {
        case al @ Alias(child, _) if isCollectMap(child) => mapAliases += al.exprId
        case _ => ()
      }
      case _ => ()
    }
    var probes = 0
    opt.foreach(_.expressions.foreach(_.foreach {
      case ElementAt(m, _: Literal, _, _) =>
        m match {
          case ar: AttributeReference if mapAliases(ar.exprId) => probes += 1
          case other if isCollectMap(other) => probes += 1
          case _ => ()
        }
      case _ => ()
    }))
    assert(probes == 0,
      s"$probes literal-key probes into collected maps in q101's plan — " +
        "the build-map-then-probe idiom is back; use the pivot form")
    // the pivot itself is present as per-label aggregates in ONE Aggregate
    val txt = opt.toString
    assert(txt.contains("min_by") || txt.contains("CASE WHEN (label"), txt.take(2000))
  }

  test("q124-q127: ANN family joins are all broadcast — no sort-merge, no cartesian") {
    // Every join left in the k-means/PQ/IVFADC stack has a documented
    // small side (codebook ≤ M×kSub, routed queries ≤ numQueries×probes,
    // ADC tables, candidate sets): a lost broadcast() degrades to a
    // corpus-wide shuffle that would surface only as a mysteriously slow
    // bench (VERDICT r10 #1).
    for (q <- Seq("q124_kmeans_ivf_build", "q125_ann_learned_cells",
                  "q126_ann_pq_adc", "q127_ann_ivf_pq_rerank")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian:\n$p")
      assert(!p.contains("SortMergeJoin"), s"$q fell to sort-merge:\n$p")
    }
    // round 12: centroid ASSIGNMENT is a row-local projection against a
    // driver-held literal — q124's whole build+summary plan must contain
    // NO join operator of any kind (the one exchange is the per-cell
    // aggregation), the strongest possible form of "the corpus never
    // joins during training"
    val p124 = plan("q124_kmeans_ivf_build")
    assert(!p124.contains("Join"), s"a join crept back into the " +
      s"row-local assignment build:\n$p124")
    // the serving-side queries still need their broadcasts
    for (q <- Seq("q125_ann_learned_cells", "q126_ann_pq_adc",
                  "q127_ann_ivf_pq_rerank")) {
      val p = plan(q)
      assert(p.contains("BroadcastExchange"), s"$q lost its broadcasts:\n$p")
    }
  }

  test("q128: serve plan prunes to probed-cell partitions; no build stage present") {
    // stage 1+2 (route + ADC scan — executes eagerly inside the full
    // serve, so pin its plan separately): the stored codes scan must
    // carry a LITERAL partition filter on cell — whole cell=...
    // directories pruned before any IO
    val idx = graft.ops.VectorOps.ensureIvfPqIndex(spark, sf, k = 8)
    val candPlan = graft.ops.VectorOps.servedIvfPqCandidates(
        spark, idx, Tables.rebalance(Tables.embeddings(spark, sf)),
        numQueries = 10, probes = 3, rerank = 20)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[cell#\\d+ IN \\(".r.findFirstIn(candPlan).isDefined,
      s"codes scan not partition-pruned:\n$candPlan")
    assert(!candPlan.contains("SortMergeJoin") &&
           !candPlan.contains("CartesianProduct"), candPlan)
    // the full serve frame: ONE lazy plan — pruned ADC scan broadcast
    // into the re-rank against the index's own inverted lists (vectors
    // partitioned by cell), both scans partition-pruned
    val df = SparkEntry.queries("q128_ann_serve_stored")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    assert("PartitionFilters: \\[cell#\\d+ IN \\(".r.findAllIn(p).size >= 2,
      s"expected BOTH the codes scan and the vectors (inverted-list) scan " +
        s"to carry literal cell partition filters:\n$p")
    // the corpus itself appears NOWHERE in the serve plan: queries are
    // driver state (cached collect), candidates re-rank against the
    // stored inverted lists — zero embeddings scans of any kind
    val corpusScans = p.linesIterator
      .filter(l => l.contains("embeddings.parquet")).size
    assert(corpusScans == 0, s"$corpusScans corpus scans in serve plan:\n$p")
    // and nothing in the plan recomputes the index: no k-means update
    // aggregation (posexplode of corpus vectors) may appear at serve time
    assert(!p.contains("posexplode"), s"build stage leaked into serve plan:\n$p")
  }

  test("q130: compacted-store serve keeps the pruned single-job plan shape") {
    // compaction rewrites the cell directories through the manifest
    // layer; the serve plan over the compacted+vacuumed store must be
    // indistinguishable in SHAPE from q128's: literal cell partition
    // filters on both the codes scan and the inverted-list scan, no
    // sort-merge/cartesian, zero corpus scans, no build stage — a
    // compaction that dropped the cell= layout (or a reader that fell
    // back to a directory listing) would surface here
    val df = SparkEntry.queries("q130_ann_index_compact")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    assert("PartitionFilters: \\[cell#\\d+ IN \\(".r.findAllIn(p).size >= 2,
      s"compacted store lost its literal cell partition pruning:\n$p")
    assert(p.linesIterator.count(_.contains("embeddings.parquet")) == 0,
      s"corpus scan leaked into the compacted-store serve plan:\n$p")
    assert(!p.contains("posexplode"), s"build stage leaked into serve plan:\n$p")
  }

  test("q134: metadata predicate reaches the code-table scan (pre-filtered search)") {
    // the filter must evaluate in the compressed domain — on the stored
    // code rows, next to the cell partition pruning — not as a
    // post-filter on the finished top-k (which can go empty under a
    // selective predicate)
    val df = SparkEntry.queries("q134_ann_filtered_serve")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[cell#\\d+ IN \\(".r.findFirstIn(p).isDefined,
      s"filtered serve lost the cell partition pruning:\n$p")
    assert("PushedFilters: \\[.*label".r.findFirstIn(p).isDefined ||
           p.contains("(label"),
      s"label predicate did not reach the code scan:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    assert(p.linesIterator.count(_.contains("embeddings.parquet")) == 0,
      s"corpus scan leaked into the filtered serve plan:\n$p")
  }

  test("q139: ledger verdict is broadcast-only; ledger streams, batch pushes down") {
    // the increment-vs-ledger topology (PLANS.md round-12 second half):
    // the ledger-side tables are the streamed big side, every join
    // builds on a batch-derived broadcast, and the batch spine carries
    // its doc_id range into the documents scan. No sort-merge join, no
    // cartesian, anywhere in the verdict plan.
    val p = plan("q139_ledger_dedup")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("GreaterThanOrEqual(doc_id"),
      s"batch cutoff not pushed into the documents scan:\n$p")
    // the ledger build never runs at verdict time: no sha2-groupBy of
    // HISTORY (the only aggregations are batch-derived signature minima
    // and the per-batch-doc verdict groupings)
    assert(!p.contains("LessThan(doc_id"),
      s"a history scan leaked into the serve-side verdict plan:\n$p")
  }

  test("q96b: partial sketch buffers cross the shuffle, not the chunk stream") {
    val p = plan("q96b_chunk_topk_sketch")
    assert(p.contains("partial_spacesavingtopk")
      || p.toLowerCase.contains("spacesavingtopk"), p)
    // single-row global agg: no vocabulary-sized hashpartitioning exchange
    assert(!"hashpartitioning\\(chunk".r.findFirstIn(p).isDefined, p)
  }

  test("q154/q155: perceptual dedup joins are banded equi-joins, never cartesian") {
    // the LSH discipline: the candidate self-join must key on the
    // (band, key) pair — a missing equi-key degrades to a cartesian /
    // broadcast-nested-loop over the corpus, the exact all-pairs
    // topology the banding exists to ban. The hamming predicate is a
    // post-join filter, not the join's only condition.
    for (q <- Seq("q154_image_phash_dedup", "q155_audio_phash_dedup",
                  "q157_video_temporal_dedup", "q160_image_wide_dedup",
                  "q161_audio_wide_dedup", "q167_video_temporal_wide")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
             !p.contains("BroadcastNestedLoopJoin"),
        s"$q candidate join lost its band equi-keys:\n$p")
      assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
        s"$q expected an equi-join for the band stage:\n$p")
    }
  }

  test("video ledger verdict: the sequence exact arm and the vote arm are " +
       "equi-joins (complex-typed seq key included), never nested-loop") {
    // the exact arm joins on the stored sequence DIGEST (a string —
    // plain equi-key) and the vote arm on (f, band, bkey): neither may
    // degrade to a nested-loop over the corpus-sized seqs table (the
    // risk case is the vote arm's constant-folded band-key expressions
    // — a wrapper Catalyst can't recognize as an equi-condition)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.ops.{DedupLedger, IndexStore}
    val dir = java.nio.file.Files.createTempDirectory("planguard-vid").toString
    val hist = (0L until 20L)
      .flatMap(o => (0L until 4L).map(f => (o, f, Seq(o * 1000 + f))))
      .toDF("media_id", "f", "fp")
    DedupLedger.appendVideoSurvivors(hist, dir, tag = "seed")
    val batch = (0L until 4L).map(f => (100L, f, Seq(3000 + f)))
      .toDF("media_id", "f", "fp")
    val v = DedupLedger.dedupVideoAgainstLedger(spark, batch, dir,
      IndexStore.snapshot(dir))
    v.collect() // materialize so the adaptive plan finalizes
    val p = v.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
           !p.contains("BroadcastNestedLoopJoin"),
      s"video verdict lost an equi-key:\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"video verdict expected equi-joins:\n$p")
  }
}
