package graft

import org.apache.spark.sql.functions._
import graft.ops.BpeOps

/** The production-vocabulary rank-loop encoder (bpeEncodeRanked) must be
  * BIT-faithful to the gated replace-chain form (bpeEncode) — q150 pins
  * the trained-list case per document through the DuckDB gate; this spec
  * pins the cases the gate cannot reach: adversarial merge lists a
  * trained list never produces, and the structural edges (empty text,
  * runs of spaces, multi-code-point characters).
  */
class BpeRankedSpec extends SparkSpec {
  import spark.implicits._

  private def encodeBoth(docs: Seq[(Long, String)],
                         merges: Seq[(String, String)]): (Map[Long, String], Map[Long, String]) = {
    val df = docs.toDF("doc_id", "text")
    val chain = BpeOps.bpeEncode(df, merges)
      .select(col("doc_id"), col("s")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val ranked = BpeOps.bpeEncodeRanked(df, merges)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (chain, ranked)
  }

  test("ranked == chain on a trained merge list over a mixed corpus") {
    val docs = Seq(
      0L -> "the quick brown fox jumps over the lazy dog",
      1L -> "the the the quick quick brown",
      2L -> "aaaa aaa aa a",
      3L -> "",
      4L -> "  double  spaces   everywhere ",
      5L -> "the quick brown fox the quick brown fox")
    val merges = BpeOps.bpeTrain(docs.toDF("doc_id", "text"), nMerges = 20)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.nonEmpty)
    val (chain, ranked) = encodeBoth(docs, merges)
    assert(ranked == chain)
  }

  test("a later merge re-creating an earlier pair is SKIPPED, like the chain") {
    // rank1 (ab,c) before rank2 (a,b) cannot come out of training ("ab"
    // must exist before (ab,c) is learnable) — but a hand-rolled list
    // can say it, and the HF-style min-rank loop WITHOUT the
    // strictly-increasing guard would merge "abc": after (a,b) fires,
    // pair (ab,c) appears at rank 1 < 2. The chain never revisits rank
    // 1, so the faithful answer is ab|c.
    val merges = Seq(("ab", "c"), ("a", "b"))
    val (chain, ranked) = encodeBoth(Seq(0L -> "abc"), merges)
    assert(chain == ranked)
    // and pin the actual value so BOTH encoders drifting together fails
    // (wrapped form: \u0001sym\u0002 per symbol - ab | c | </w>)
    assert(ranked(0L) ==
      "\u0001ab\u0002\u0001c\u0002\u0001</w>\u0002")
  }

  test("duplicate merge entries: first rank wins in both forms") {
    val merges = Seq(("a", "b"), ("b", "c"), ("a", "b"))
    val (chain, ranked) = encodeBoth(Seq(0L -> "abc ab bc"), merges)
    assert(chain == ranked)
  }

  test("a duplicate entry RE-FIRES when an intervening merge creates its pattern") {
    // rank 1 (ab,c) fires on nothing ("ab" doesn't exist yet), rank 2
    // (a,b) creates it, rank 3 — the DUPLICATE of rank 1 — must fire:
    // the chain's third replace() pass sees ab|c and merges it. A
    // first-rank-only map would look up (ab,c) -> rank 1 <= lastApplied
    // and skip, yielding ab|c instead of abc.
    val merges = Seq(("ab", "c"), ("a", "b"), ("ab", "c"))
    val (chain, ranked) = encodeBoth(Seq(0L -> "abc"), merges)
    assert(chain == ranked)
    assert(ranked(0L) == "abc</w>",
      s"duplicate must re-fire at its later rank, got ${ranked(0L)}")
  }

  test("multi-code-point characters split like Spark substring (code points)") {
    // 😀 is a surrogate pair; a UTF-16 char-wise split would tear it
    val docs = Seq(0L -> "a😀b a😀b 資料 資料")
    val merges = BpeOps.bpeTrain(docs.toDF("doc_id", "text"), nMerges = 6)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val (chain, ranked) = encodeBoth(docs, merges)
    assert(ranked == chain)
  }

  test("plan size is merge-count independent (no per-merge plan nodes)") {
    val docs = Seq(0L -> "a b c").toDF("doc_id", "text")
    val big = (1 to 5000).map(i => (s"x$i", s"y$i")) // none ever fires
    val plan = BpeOps.bpeEncodeRanked(docs, big)
      .queryExecution.optimizedPlan.toString
    // the chain form would carry 5000 nested replace() calls here
    assert(!plan.contains("replace"), "rank encoder must not fold replaces")
    assert(plan.length < 10000, s"plan grew with merge count: ${plan.length}")
  }
}
