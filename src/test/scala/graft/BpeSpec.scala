package graft

import graft.ops.BpeOps

/** BPE trainer (q141) semantics on planted corpora — the properties the
  * fixture hash can't isolate: greedy left-to-right non-overlap inside
  * symbol runs, merged symbols participating in later merges, and the
  * deterministic argmax tiebreak.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def train(texts: Seq[String], n: Int) =
    BpeOps.bpeTrain(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"), n)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getString(4))).toSeq

  test("greedy left-to-right: 'aaa' under (a,a) yields ONE pair, not two") {
    // one word "aaa" x10, one "ab" x1: step 1 must merge (a,a) with
    // count 20 — NOT 20+overlap — because "aaa" = [a,a,a,</w>] has two
    // (a,a) positions per occurrence... both countable as candidates
    // (pair COUNTING counts positions), but after the merge the word
    // must become [aa,a,</w>] (non-overlapping application), so step 2
    // sees (aa,a) — never (a,aa)
    val m = train(Seq.fill(10)("aaa").mkString(" ") :: "ab" :: Nil, 2)
    assert(m.head._2 == "a" && m.head._3 == "a", s"step1: ${m.head}")
    // step 2's candidates from "aaa"=[aa,a,</w>]: (aa,a) cnt 10 and
    // (a,</w>) cnt 10+... "ab"=[a,b,</w>] contributes (a,b),(b,</w>) x1.
    // (a,</w>) appears in [aa,a,</w>] x10 → tie between (a,</w>) 10 and
    // (aa,a) 10 → tiebreak lhs ASC: "a" < "aa" → (a,</w>) wins
    assert(m(1)._2 == "a" && m(1)._3 == "</w>", s"step2: ${m(1)}")
  }

  test("merged symbols feed later merges (chained subwords)") {
    // "abab" x5: [a,b,a,b,</w>] → step1 (a,b) cnt 10 → [ab,ab,</w>].
    // step2 ties (ab,ab)=5 with (ab,</w>)=5; rhs tiebreak: "</w>" <
    // "ab" ('<' is 0x3C) → (ab,</w>) → [ab,ab</w>] → step3 merges the
    // two MERGED symbols (ab,ab</w>) → [abab</w>]
    val m = train(Seq(Seq.fill(5)("abab").mkString(" ")), 3)
    assert(m.map(x => (x._2, x._3)) ==
      Seq(("a", "b"), ("ab", "</w>"), ("ab", "ab</w>")), s"got $m")
    assert(m.map(_._4) == Seq(10L, 5L, 5L))
  }

  test("encode applies merges in order and never crosses word boundaries") {
    import org.apache.spark.sql.functions._
    // merges learned from "er er": (e,r) then (er,</w>). Encoding
    // "re er" must yield [r,e,</w>] [er</w>] — the (e,r) pattern may
    // NOT match the e|r spanning the word boundary in "...e</w> r..."
    val docs = Seq((0L, "re er")).toDF("doc_id", "text")
    val enc = BpeOps.bpeEncode(docs, Seq(("e", "r"), ("er", "</w>")))
      .select(col("s")).head.getString(0)
    val syms = enc.substring(1, enc.length - 1).split("").toSeq
    assert(syms == Seq("r", "e", "</w>", "er</w>"), s"got $syms")
  }

  test("argmax tiebreak is (count desc, lhs asc, rhs asc)") {
    // "xy" and "xz" same count: (x,y) vs (x,z) vs (y,</w>) vs (z,</w>)
    // all count 3 → lhs asc picks (x,y)... wait: "</w>"-pairs have lhs
    // y/z; '<' (0x3c) sorts before lowercase letters, so lhs "x" vs
    // "y" vs "z" → x first; rhs "y" < "z"
    val m = train(Seq(Seq.fill(3)("xy").mkString(" "),
                      Seq.fill(3)("xz").mkString(" ")), 1)
    assert(m.head._2 == "x" && m.head._3 == "y", s"got ${m.head}")
  }
}
