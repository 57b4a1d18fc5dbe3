package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import graft.ops.CurationOps

/** Semantics specs for the curation query family (q90-q98) on
  * hand-computable fixtures. The queries read `documents.parquet` from a
  * scale-factor directory, so each case writes its fixture corpus to a
  * temp dir and runs the catalog entry against it — the same code path
  * the driver gate exercises, with outcomes small enough to verify by
  * hand.
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Write (doc_id, text) rows as a documents table in a fresh temp dir. */
  private def corpusDir(rows: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("curation_fixture").toFile
    dir.deleteOnExit()
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'fix' AS source",
                  "length(text) AS n_chars")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/documents.parquet")
    dir.getAbsolutePath
  }

  private def run(name: String, dir: String): DataFrame =
    CurationOps.queries(name)(spark, dir)

  test("q90 clusters a token-reordered copy with its source and elects by quality") {
    // doc 0 (id % 97 == 0) gains a planted reversed copy inside the query;
    // docs 1 and 2 share the same token MULTISET in different orders, so
    // the orderless fingerprint must cluster them while exact sha2 would not
    val dir = corpusDir(Seq(
      0L -> "x y z w",
      1L -> "a a b c",
      2L -> "c a b a",
      3L -> "solo p q r"))
    val rows = run("q90_cluster_representative", dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // cluster A: doc 0 + its planted copy (id 1000000): same quality, tie
    // breaks to the smaller doc_id; cluster B: docs 1,2 (quality 75 each)
    assert(rows.toSet == Set((0L, 2L, 100L), (1L, 2L, 75L)))
  }

  test("q91 caps per-domain membership and counts canonical urls") {
    // doc_ids 0..9: domain = example{id % 5}.com — two docs per domain,
    // all under the cap, canonical urls distinct per doc
    val dir = corpusDir((0L until 10L).map(i => i -> s"doc $i"))
    val rows = run("q91_url_domain_cap", dir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(1) == 2L)   // n_docs
      assert(r.getLong(2) == 2L)   // n_kept (cap is 5)
      assert(r.getLong(3) == 2L)   // n_canonical
    }
  }

  test("q92 counts repeated fixed-width segments within a doc") {
    // width-2 segments: doc 10 -> [a b, a b, c d]: one repeat;
    // doc 11 -> [e f, g h]: none; doc 12 (<2 tokens) filtered out
    val dir = corpusDir(Seq(
      10L -> "a b a b c d",
      11L -> "e f g h",
      12L -> "tiny"))
    val rows = run("q92_segment_dedup", dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows == Set((0L, 1L), (1L, 1L)))
  }

  test("q93 scores docs by mean corpus token frequency") {
    // 'the' appears 4x, every other token once: the all-'the' doc must
    // outrank the all-rare doc, with exact integer scores
    val dir = corpusDir(Seq(
      0L -> "the the the",
      1L -> "rare1 rare2 the",
      2L -> "only once"))
    val rows = run("q93_commonness_score", dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // doc 0: mean freq 4 -> 4000; doc 1: (1+1+4)/3 -> 2000; doc 2: 1000
    assert(rows.toSeq == Seq((0L, 4000L), (1L, 2000L), (2L, 1000L)))
  }

  test("q98 assigns epoch factors from histogram-derived decile thresholds") {
    // qualities: one 100 (distinct 4/4), four 50 (2/4), five 25 (1/4):
    // t90 = 100 (cum 1 <= 1), t50 = 50 (cum 5 <= 5)
    val hi = Seq(0L -> "a b c d")
    val mid = (1L to 4L).map(i => i -> s"m$i m$i n$i n$i")
    val lo = (5L to 9L).map(i => i -> s"z$i z$i z$i z$i")
    val dir = corpusDir(hi ++ mid ++ lo)
    val rows = run("q98_quality_epochs", dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every doc is 4 tokens: factor 3 -> 1 doc, 12 post-epoch tokens;
    // factor 2 -> 4 docs, 32; factor 1 -> 5 docs, 20
    assert(rows.toSeq == Seq((1L, 5L, 20L), (2L, 4L, 32L), (3L, 1L, 12L)))
  }

  test("q121 pipeline: quality gate, exact collapse, near-dup prune, sample, rollup") {
    // corpusDir langs everything 'en' (sample keeps bucket < 200);
    // bucket(id) = (id*48271 % 2147483647) % 1000: 4 -> 84, 8 -> 168
    val t2 = (1 to 12).map(i => s"tok$i").mkString(" ")
    val dir = corpusDir(Seq(
      0L -> "x x x x",                        // quality 25 < 35: dropped first
      4L -> "alpha beta gamma delta",         // rep of the exact-dup group
      104L -> "alpha beta gamma delta",       // exact dup, collapses into 4
      8L -> t2,                               // survives everything
      37L -> ((1 to 11).map(i => s"tok$i").mkString(" ") + " zz")
    ))                                        // near-dup of 8 (trigram j=9/11): d2 drops
    val rows = run("q121_curation_pipeline", dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5)))
    // survivors sampled: 4 (n_dups 2, 4 toks) and 8 (12 toks)
    assert(rows.toSeq == Seq(("en", 2L, 16L, 3L, 1L, 1L)))
  }

  test("q95 flags segments shared by >= 5% of docs as boilerplate") {
    // 'FOO BAR' opens every doc (df 40/40); each doc's second segment is
    // unique (df 1, and 1*20 < 40 keeps it below the 5% bar — the corpus
    // must exceed 20 docs or EVERY segment clears the threshold)
    val dir = corpusDir((0L until 40L).map(i => i -> s"FOO BAR u$i v$i"))
    val rows = run("q95_boilerplate_segments", dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq((50L, 40L))) // 1 of 2 segments boiler, all docs
  }
}
