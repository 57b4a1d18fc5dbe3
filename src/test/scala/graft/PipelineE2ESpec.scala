package graft

import org.apache.spark.sql.functions._
import graft.ops.{GraphOps, PipelineOps, TextOps}

/** The operators compose into the full training-data preparation
  * pipeline a user of this engine would actually run:
  *
  *   raw corpus -> exact dedup -> near-dup pair mining -> connected
  *   components -> canonical doc per cluster -> deterministic stratified
  *   sample -> quality/token stats
  *
  * Run end-to-end on the sf0.001 fixture with invariants checked at
  * every stage (monotone shrinkage, cluster collapse, rerun determinism).
  */
class PipelineE2ESpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("curate: filter -> mix -> decontaminate -> pack composes deterministically") {
    val docs = Tables.documents(spark, dir).select($"doc_id", $"text", $"lang")
    val nDocs = docs.count()

    // 1. quality filter (q84 signals): keep only verdict == keep
    val toks = docs.withColumn("toks", split($"text", " "))
      .withColumn("n_toks", size($"toks").cast("long"))
      .withColumn("n_distinct", size(array_distinct($"toks")).cast("long"))
      .withColumn("sum_len", expr("aggregate(toks, 0L, (a, t) -> a + length(t))"))
    val kept = toks.filter(
      $"n_toks" >= 25 &&
      $"n_distinct" * 100 >= $"n_toks" * 35 &&
      $"sum_len" * 10 <= $"n_toks" * 52)
      .select($"doc_id", $"text", $"lang", $"n_toks")
    val nKept = kept.count()
    assert(nKept > 0 && nKept < nDocs, s"filter must drop some docs ($nKept/$nDocs)")

    // 2. temperature mix (q85): downsample dominant languages
    val counts = kept.groupBy($"lang").agg(count(lit(1)).as("n_l"))
    val minN = counts.agg(min($"n_l").as("n_min"))
    val rates = counts.crossJoin(broadcast(minN))
      .withColumn("rate_milli",
        floor(sqrt($"n_min".cast("double") / $"n_l") * 1000).cast("long"))
    val mixed = kept.join(broadcast(rates), "lang")
      .filter(PipelineOps.contentBucket($"text") < $"rate_milli")
      .select($"doc_id", $"text", $"lang", $"n_toks")
    assert(mixed.count() <= nKept)

    // 3. decontaminate (q86 topology): drop docs sharing a 4-gram with
    // the held-out slice
    val g0 = mixed.withColumn("toks", split($"text", " "))
      .select($"doc_id", $"lang", $"n_toks", expr(
        """CASE WHEN size(toks) >= 4 THEN
          |  transform(sequence(1, size(toks) - 3),
          |    i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1),
          |                        element_at(toks, i + 2), element_at(toks, i + 3)))
          |ELSE array() END""".stripMargin).as("grams"))
      .localCheckpoint()
    val benchGrams = g0.filter($"doc_id" % 7 === 0)
      .select(explode($"grams").as("gram")).distinct()
    val corpus = g0.filter($"doc_id" % 7 =!= 0)
    val contaminated = corpus
      .select($"doc_id", explode($"grams").as("gram"))
      .join(benchGrams, Seq("gram"), "left_semi")
      .select($"doc_id").distinct()
    val cleanIds = corpus.join(contaminated, Seq("doc_id"), "left_anti")
      .select($"doc_id", $"n_toks")
    val nClean = cleanIds.count()
    assert(nClean <= mixed.count())

    // 4. pack into token-budget shards (q81 machinery)
    val shards = PipelineOps.withRunningTotal(
        cleanIds.select($"doc_id", $"n_toks"), "doc_id", "n_toks")
      .withColumn("shard",
        floor(($"cum_n_toks" - $"n_toks") / lit(4096L)).cast("long"))
    val shardStats = shards.groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"), sum($"n_toks").as("toks"))
      .orderBy($"shard").collect()
    assert(shardStats.nonEmpty)
    // every shard except possibly the last holds >= 4096 tokens worth of
    // doc starts; totals add up to the clean corpus exactly
    val totalToks = shards.agg(sum($"n_toks")).collect()(0).getLong(0)
    assert(shardStats.map(_.getLong(2)).sum == totalToks)
  }

  test("curate: boilerplate-strip -> chunk -> training order composes deterministically") {
    val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
    val nDocs = docs.count()

    // 1. cross-doc boilerplate detection (q95 topology, width-2 segments)
    val segs = docs.withColumn("toks", split($"text", " "))
      .filter(size($"toks") >= 2)
      .select($"doc_id", expr(
        """transform(sequence(1, size(toks) DIV 2),
          |  i -> concat_ws(' ', element_at(toks, CAST(2 * i - 1 AS INT)),
          |                      element_at(toks, CAST(2 * i AS INT))))""".stripMargin)
        .as("segs"))
      .localCheckpoint()
    val docseg = segs.select($"doc_id", explode(array_distinct($"segs")).as("seg"))
    val boiler = docseg.groupBy($"seg").agg(count(lit(1)).as("df"))
      .filter($"df" * 20 >= lit(nDocs))
      .select($"seg")
    val nBoiler = boiler.count()
    assert(nBoiler > 0, "small corpus + small vocab must produce boilerplate")
    // bound proved in PLANS.md: sum(df) caps the >=5% set at 20x avg segs/doc
    val avgSegs = segs.agg(avg(size($"segs"))).collect()(0).getDouble(0)
    assert(nBoiler <= 20 * avgSegs + 1)

    // 2. strip boilerplate segments, rebuild texts (monotone shrinkage)
    val boilerSet = broadcast(boiler.withColumn("is_b", lit(true)))
    val cleaned = segs.select($"doc_id", explode($"segs").as("seg"))
      .join(boilerSet, Seq("seg"), "left")
      .filter($"is_b".isNull)
      .groupBy($"doc_id")
      .agg(concat_ws(" ", collect_list($"seg")).as("clean_text"),
           count(lit(1)).as("n_clean_segs"))
    val shrunk = cleaned.join(
        segs.select($"doc_id", size($"segs").as("n_segs")), "doc_id")
      .filter($"n_clean_segs" > $"n_segs")
    assert(shrunk.count() == 0, "stripping can only shrink")
    assert(cleaned.count() <= nDocs)

    // 3. chunk the cleaned corpus (q96 topology: W=4, S=2) and check the
    // count law: chunks = (n - 4) DIV 2 + 1 for n >= 4
    val chunked = cleaned.withColumn("toks", split($"clean_text", " "))
      .filter(size($"toks") >= 4)
      .withColumn("n_chunks_law",
        (size($"toks") - 4).cast("long") / 2L + 1L)
      .withColumn("chunks", expr(
        """transform(sequence(0, (size(toks) - 4) DIV 2),
          |  i -> concat_ws(' ', slice(toks, i * 2 + 1, 4)))""".stripMargin))
    assert(chunked.filter(size($"chunks").cast("long") =!=
      floor($"n_chunks_law")).count() == 0)
    // every chunk holds exactly 4 tokens
    val badChunk = chunked.select(explode($"chunks").as("c"))
      .filter(size(split($"c", " ")) =!= 4)
    assert(badChunk.count() == 0)

    // 4. deterministic training order (q94): same seed => same order,
    // different seed => different order
    def order(seed: String) = chunked
      .select($"doc_id", explode($"chunks").as("chunk"))
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(
          md5(concat_ws("|", lit(seed), $"doc_id", $"chunk")))))
      .orderBy($"pos")
      .select($"doc_id", $"chunk").collect().toSeq
    val o1 = order("epoch1"); val o1b = order("epoch1"); val o2 = order("epoch2")
    assert(o1 == o1b, "same seed must replay the identical order")
    assert(o1 != o2, "different seed must permute differently")
    assert(o1.toSet == o2.toSet, "reordering must not add or drop chunks")

    info(s"docs=$nDocs boilerSegs=$nBoiler chunks=${o1.size}")
  }

  test("dedup -> cluster -> canonicalize -> sample -> stats composes") {
    val docs = Tables.documents(spark, dir).select($"doc_id", $"text", $"lang")
    val nDocs = docs.count()

    // 1. exact dedup: one representative per sha2(text)
    val reps = docs
      .withColumn("h", sha2($"text", 256))
      .groupBy($"h").agg(min($"doc_id").as("doc_id"))
      .drop("h")
      .join(docs, "doc_id")
    val nReps = reps.count()
    assert(nReps <= nDocs)

    // 2. near-dup pairs among representatives (rare-shingle index)
    val pairs = TextOps.jaccardNearDupPairs(TextOps.shingled(reps))
      .select($"d1".as("src"), $"d2".as("dst"))
    val nPairs = pairs.count()
    assert(nPairs > 0, "fixture plants near-dup pairs; none found")

    // 3. near-dup clusters -> canonical (min) doc per cluster
    val cc = GraphOps.connectedComponents(
      reps.select($"doc_id".as("id")), pairs)
    val canonical = cc.filter($"id" === $"root").select($"id".as("doc_id"))
    val nCanon = canonical.count()
    assert(nCanon < nReps, "clusters must collapse at least the planted pairs")
    // every non-root doc folds into exactly one cluster representative
    assert(nCanon == nReps - cc.filter($"id" =!= $"root").count())

    // 4. deterministic stratified sample of the canonical corpus
    val sampled = canonical.join(docs, "doc_id")
      .withColumn("bucket", PipelineOps.hashBucket($"doc_id"))
      .filter($"bucket" < when($"lang" === "en", 200L).otherwise(500L))
    val nSample = sampled.count()
    assert(nSample > 0 && nSample < nCanon)

    // 5. stats over the final corpus: every surviving doc tokenizes
    val stats = sampled
      .withColumn("toks", split($"text", " "))
      .select($"doc_id", size($"toks").as("n_toks"))
    assert(stats.filter($"n_toks" <= 0).count() == 0)

    // rerun determinism: the whole chain reproduces itself exactly
    val again = canonical.join(docs, "doc_id")
      .withColumn("bucket", PipelineOps.hashBucket($"doc_id"))
      .filter($"bucket" < when($"lang" === "en", 200L).otherwise(500L))
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(again == sampled.select($"doc_id").as[Long].collect().sorted.toSeq)

    info(s"docs=$nDocs reps=$nReps pairs=$nPairs canonical=$nCanon sample=$nSample")
  }
}
