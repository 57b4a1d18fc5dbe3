package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{min, sha2}
import graft.ops.{DedupOps, TextOps}

/** Regression for the df-cap recall collapse measured in SCALING.md: on a
  * corpus where every document is exactly duplicated 10x, the inverted
  * shingle index alone (q50) finds nothing — every shingle's document
  * frequency exceeds the cap — while the dedup-first composition (q50b)
  * recovers all planted near-dup pairs.
  */
class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  // 30 docs with per-doc vocabularies (shingles shared ONLY between
  // planted pairs); near-dups differ in the final token, which keeps
  // trigram jaccard at 7/13 ~ 0.538 >= 0.5
  private val planted = Seq((0L, 15L), (7L, 22L))
  private def baseCorpus: DataFrame = {
    val rows = (0 until 30).map { i =>
      val src = planted.collectFirst { case (a, b) if b == i.toLong => a }
      src match {
        case Some(a) =>
          val toks = (0 until 11).map(j => s"w${a}_$j") :+ s"CHANGED_$i"
          (i.toLong, toks.mkString(" "))
        case None =>
          (i.toLong, (0 until 12).map(j => s"w${i}_$j").mkString(" "))
      }
    }
    rows.toDF("doc_id", "text")
  }

  private def duplicated(times: Int): DataFrame =
    (1 until times).foldLeft(baseCorpus) { (df, r) =>
      df.unionByName(baseCorpus.select(($"doc_id" + r * 1000L).as("doc_id"), $"text"))
    }

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("baseline: inverted index finds the planted pairs on the clean corpus") {
    val found = pairs(TextOps.jaccardNearDupPairs(TextOps.shingled(baseCorpus)))
    assert(found == planted.toSet)
  }

  test("10x duplication collapses df-capped recall to zero (the failure mode)") {
    val found = TextOps.jaccardNearDupPairs(TextOps.shingled(duplicated(10)))
    assert(found.count() == 0)
  }

  test("rareTailDiagnostic separates the regimes the index can and cannot serve") {
    // clean per-doc vocabularies: planted pairs share rare shingles,
    // the diagnostic sees a tail under the cap
    val (retained, total) = TextOps.rareTailDiagnostic(TextOps.shingled(baseCorpus))
    assert(retained > 0 && total >= retained)

    // no-rare-tail corpus (every doc drawn from ONE tiny shared
    // vocabulary, the sf1-study shape): every shingle's df exceeds the
    // cap, the diagnostic reads 0 retained, and the index emits nothing
    // — the named precondition for routing to minhash instead
    val tiny = (0 until 60).map { i =>
      (i.toLong, (0 until 12).map(j => s"v${(i + j) % 4}").mkString(" "))
    }.toDF("doc_id", "text")
    val (retainedTiny, totalTiny) = TextOps.rareTailDiagnostic(TextOps.shingled(tiny))
    assert(retainedTiny == 0L && totalTiny > 0L)
    assert(TextOps.jaccardNearDupPairs(TextOps.shingled(tiny)).count() == 0)
  }

  test("winnowFingerprint: shift-invariant overlap, locality, empty below k+w-1") {
    val share = "the quick brown fox jumps over the lazy dog"
    val docs = Seq(
      (0L, s"AAAA $share BBBB"),
      (1L, s"CCCCCCCCCC $share DDD"), // same run at a DIFFERENT offset
      (2L, "tiny"),                   // < k+w-1 = 11 chars -> no fingerprints
      (3L, "completely unrelated text with other words entirely"),
      (4L, s"AAAA $share BEBB")       // one-char edit of doc 0
    ).toDF("doc_id", "text")
    val fps = TextOps.winnowFingerprintSets(docs)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    // Karp-Rabin is position-free: the shared 43-char run (> k+w-1)
    // guarantees common fingerprints at ANY offset
    assert((fps(0) & fps(1)).nonEmpty)
    assert(fps(2).isEmpty)
    assert((fps(0) & fps(3)).isEmpty)
    // locality: a one-char edit preserves most fingerprints (q46's
    // whole-bag hash flips entirely on the same edit)
    val overlap = (fps(0) & fps(4)).size.toDouble / fps(0).size
    assert(overlap > 0.5, s"one-char edit kept only $overlap")
  }

  test("dedup-first composition recovers planted pairs on the 10x corpus") {
    val out = TextOps.dedupFirstJaccardPairs(duplicated(10))
    assert(pairs(out) == planted.toSet)
    // every representative carries its full duplication count
    val dups = out.select("d1_dups", "d2_dups").collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(dups == Set(10L))
  }

  test("simhash hamming-join: bucket cap fails on mass duplication; dedup-first recovers") {
    // simhash is order-insensitive (distinct token SETS), so a reordered
    // doc is the deterministic near-dup class: hamming 0, yet a distinct
    // text (distinct sha2). Token-substitution pairs are NOT reliably
    // simhash-near at 12 tokens — vote margins are too tight.
    val reordered = Seq((0L, 40L), (7L, 47L))
    def corpus(times: Int): DataFrame = {
      val base = (0 until 30).map(i =>
        (i.toLong, (0 until 12).map(j => s"w${i}_$j").mkString(" ")))
      val pairs = reordered.map { case (src, id) =>
        (id, (0 until 12).reverse.map(j => s"w${src}_$j").mkString(" "))
      }
      val rows = (0 until times).flatMap { r =>
        (base ++ pairs).map { case (id, t) => (id + r * 1000L, t) }
      }
      rows.toDF("doc_id", "text")
    }

    // clean corpus: reorder pairs found at hamming 0
    val clean = TextOps.simhashHammingPairs(corpus(1))
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(reordered.toSet.subsetOf(clean), s"clean corpus missed pairs: $clean")

    // 10x duplication with a tight bucket cap: every signature's bucket
    // exceeds the cap, candidates vanish — same failure mode as q50
    val flooded = TextOps.simhashHammingPairs(corpus(10), cap = 8)
    assert(flooded.count() == 0)

    // composition: sha2-dedup to representatives first, then hamming-join
    val docs = corpus(10)
    val reps = docs.withColumn("h", sha2($"text", 256))
      .groupBy($"h").agg(min($"doc_id").as("doc_id")).drop("h")
      .join(docs, "doc_id")
    val recovered = TextOps.simhashHammingPairs(reps, cap = 8)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(reordered.toSet.subsetOf(recovered), s"composition missed pairs: $recovered")
  }

  test("dedup-first equals plain pipeline on a duplicate-free corpus") {
    val plain = pairs(TextOps.jaccardNearDupPairs(TextOps.shingled(baseCorpus)))
    val composed = pairs(TextOps.dedupFirstJaccardPairs(baseCorpus))
    assert(composed == plain)
  }

  test("minhash LSH: band cap bounds the hot bucket; dedup-first recovers (VERDICT r3 #2)") {
    // 10x exact duplication: every copy group shares ALL band keys, so
    // each bucket holds >= 10 ids. Uncapped, one aggregation row explodes
    // C(10,2) pairs per group x 30 groups — the O(n²) shape the cap closes.
    val uncapped = DedupOps.minhashLshPairs(
      TextOps.shingled(duplicated(10)), bandCap = Int.MaxValue)
    assert(uncapped.count() >= 30L * 45, "exact-dup pairs expected uncapped")
    // with a tight cap every flooded bucket is suppressed — zero pairs,
    // bounded work (same failure-mode shape as the df-cap / simhash cap)
    val capped = DedupOps.minhashLshPairs(
      TextOps.shingled(duplicated(10)), bandCap = 8)
    assert(capped.count() == 0)
    // composition: sha2-dedup to representatives first, then LSH with the
    // cap — buckets are small again and the planted near-dups come back
    val docs = duplicated(10)
    val reps = docs.withColumn("h", sha2($"text", 256))
      .groupBy($"h").agg(min($"doc_id").as("doc_id")).drop("h")
      .join(docs, "doc_id")
    val recovered = pairs(DedupOps.minhashLshPairs(TextOps.shingled(reps), bandCap = 8))
    assert(recovered == planted.toSet, s"composition found: $recovered")
  }

  test("q122 routing: tailed corpus -> index branch, planted pairs recovered") {
    // baseCorpus has per-doc vocabularies: every pair-witnessing gram
    // (df >= 2) is also retained (df <= cap), so the ratio reads 100%
    // and the router must pick the cheap exact index branch
    val (retained, witnesses) =
      TextOps.pairWitnessDiagnostic(TextOps.shingled(baseCorpus))
    assert(witnesses > 0 && retained == witnesses)
    val out = TextOps.routedNearDupPairs(baseCorpus)
    assert(out.select("route").distinct().collect().map(_.getString(0)).toSeq
      == Seq("index"))
    assert(pairs(out) == planted.toSet)
    // and the index branch's answer is exactly q50's
    assert(pairs(out) == pairs(TextOps.jaccardNearDupPairs(TextOps.shingled(baseCorpus))))
  }

  test("q122 routing: gray band -> BOTH branches, union holds recall (VERDICT r7 #1)") {
    // baseCorpus (whose witnesses are all retained) + 10 filler docs
    // duplicated 6x: each filler gram has df = 6 > cap, inflating the
    // witness count without adding retained grams — the mid-diversity
    // regime where round 7's `retained > 0` dispatch picked an index
    // that cannot see most of the corpus. The ratio lands between the
    // thresholds and the router must take the union.
    val filler = (0 until 10).map { i =>
      (100L + i, (0 until 12).map(j => s"f${i}_$j").mkString(" "))
    }
    val flood = (0 until 6).flatMap { r =>
      filler.map { case (id, t) => (id + r * 1000L, t) }
    }.toDF("doc_id", "text")
    val corpus = baseCorpus.unionByName(flood)

    val (retained, witnesses) =
      TextOps.pairWitnessDiagnostic(TextOps.shingled(corpus))
    assert(retained > 0 && retained * 100 < 75L * witnesses &&
           retained * 100 >= 5L * witnesses,
      s"fixture drifted out of the gray band: $retained/$witnesses")

    val out = TextOps.routedNearDupPairs(corpus).localCheckpoint()
    assert(out.select("route").distinct().collect().map(_.getString(0)).toSeq
      == Seq("both"))
    // union >= each branch: the planted pairs (index-visible here) must
    // survive, and so must everything minhash finds (the exact dups in
    // the flood share all grams -> jaccard 1.0)
    val found = pairs(out)
    assert(planted.toSet.subsetOf(found), s"union lost planted pairs: $found")
    val viaIndex = pairs(TextOps.jaccardNearDupPairs(TextOps.shingled(corpus)))
    val viaMinhash = pairs(DedupOps.minhashLshPairs(
      TextOps.shingled(corpus), pairBudgetPerDoc = Some(1000)))
    assert(found == (viaIndex ++ viaMinhash), "union must equal index | minhash")
  }

  test("q122 route sentinel: the decision is a hashed row even with zero pairs") {
    // a corpus with no near-dups at all: every branch is empty, but the
    // sentinel row still carries the routing decision into the gate
    // (round-7 ADVICE: an empty result hid a wrong route from the hash)
    val loners = (0 until 20).map { i =>
      (i.toLong, (0 until 12).map(j => s"u${i}_$j").mkString(" "))
    }.toDF("doc_id", "text")
    val out = TextOps.routedNearDupPairs(loners, routeSentinel = true).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == -1L && r.getLong(1) == -1L &&
           r.getDouble(2) == -1.0 && r.getString(3) == "index")
    // without the sentinel the same corpus is (correctly) all-empty
    assert(TextOps.routedNearDupPairs(loners).count() == 0)
  }

  test("q122 routing: collapsed corpus -> minhash branch, recall restored") {
    // duplicated(10): every shingle's df >= 10 > DF_CAP, retained == 0 —
    // the regime where q50 alone returns the silently-empty answer
    val docs = duplicated(10)
    assert(TextOps.jaccardNearDupPairs(TextOps.shingled(docs)).count() == 0)
    val out = TextOps.routedNearDupPairs(docs).localCheckpoint()
    assert(out.select("route").distinct().collect().map(_.getString(0)).toSeq
      == Seq("minhash"))
    // the budget-derived cap follows the 10-wide duplicate buckets, so
    // every planted near-dup pair (in every replica's id space) surfaces
    val found = pairs(out)
    val expected = for (r <- 0 until 10; (a, b) <- planted)
      yield (a + r * 1000L, b + r * 1000L)
    assert(expected.toSet.subsetOf(found),
      s"missing: ${expected.toSet -- found}")
    // routed == the minhash operator run directly (the dispatch adds
    // nothing but the route column)
    assert(found == pairs(DedupOps.minhashLshPairs(
      TextOps.shingled(docs), pairBudgetPerDoc = Some(1000))))
  }

  test("reliable-checkpoint path is result-identical to the local path") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val localJ = pairs(TextOps.jaccardNearDupPairs(TextOps.shingled(baseCorpus)))
    val reliableJ = pairs(TextOps.jaccardNearDupPairs(
      TextOps.shingled(baseCorpus), checkpointDir = Some(dir)))
    assert(reliableJ == localJ)
    val localM = pairs(DedupOps.minhashLshPairs(TextOps.shingled(baseCorpus)))
    val reliableM = pairs(DedupOps.minhashLshPairs(
      TextOps.shingled(baseCorpus), checkpointDir = Some(dir)))
    assert(reliableM == localM)
    val localD = pairs(TextOps.dedupFirstJaccardPairs(duplicated(3)))
    val reliableD = pairs(TextOps.dedupFirstJaccardPairs(
      duplicated(3), checkpointDir = Some(dir)))
    assert(reliableD == localD)
    // the embedding family too: srpLshPairs carries the same contract
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    def vpairs(df: org.apache.spark.sql.DataFrame) =
      df.select("v1", "v2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val localS = vpairs(DedupOps.srpLshPairs(emb))
    val reliableS = vpairs(DedupOps.srpLshPairs(emb, checkpointDir = Some(dir)))
    assert(reliableS == localS)
  }
}
