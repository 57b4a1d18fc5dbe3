package graft

import scala.util.Random
import org.apache.spark.sql.functions._
import graft.ops.{BpeOps, TextOps}

/** Property laws for the round-12 second-half operators, over seeded
  * random corpora (fixed seed → reproducible). These are the
  * invariants the fixed-fixture oracle hashes cannot state:
  *
  *   - BPE encode is LOSSLESS: splitting the encoded symbol stream on
  *     EOW markers reconstructs the original text exactly, for ANY
  *     corpus and ANY trained merge list (a merge that dropped,
  *     duplicated, or reordered a character would break this).
  *   - dupSpanMap is a sound and complete cover: every duplicated-gram
  *     position lies inside a reported span, every span is covered by
  *     duplicated grams end to end, and spans per doc are disjoint,
  *     sorted, and non-adjacent (maximal merge).
  */
class NewOpsPropertySpec extends SparkSpec {
  import spark.implicits._

  private def randDocs(r: Random, nDocs: Int, vocab: Int,
                       minLen: Int, maxLen: Int): Seq[(Long, String)] =
    (0 until nDocs).map { i =>
      val n = minLen + r.nextInt(maxLen - minLen + 1)
      (i.toLong, (0 until n).map(_ => s"w${r.nextInt(vocab)}").mkString(" "))
    }

  test("BPE encode is lossless: symbols reconstruct every document") {
    val r = new Random(7)
    for (round <- 1 to 3) {
      // small vocab forces heavy merging; varied lengths hit 1-token docs
      val docs = randDocs(r, nDocs = 30, vocab = 4 + round, minLen = 1, maxLen = 30)
      val df = docs.toDF("doc_id", "text")
      val merges = BpeOps.bpeTrain(df, nMerges = 10).collect()
        .map(x => (x.getString(1), x.getString(2))).toSeq
      val enc = BpeOps.bpeEncode(df, merges)
        .select(col("doc_id"), col("s")).collect()
        .map(x => x.getLong(0) -> x.getString(1)).toMap
      for ((id, text) <- docs) {
        val s = enc(id)
        val syms = s.substring(1, s.length - 1).split("").toSeq
        // rebuild: symbols concatenate; "</w>" closes a word
        val rebuilt = syms.mkString("").replace("</w>", " ").trim
          .replaceAll(" +", " ")
        assert(rebuilt == text.trim.replaceAll(" +", " "),
          s"doc $id: '$rebuilt' != '$text' (merges=$merges, syms=$syms)")
      }
    }
  }

  test("dupSpanMap is a sound, complete, maximal cover of duplicated grams") {
    val k = TextOps.SPAN_K
    val r = new Random(11)
    for (round <- 1 to 3) {
      // small vocab at K=8 makes incidental duplicated runs likely
      val docs = randDocs(r, nDocs = 25, vocab = 3, minLen = 5, maxLen = 40)
      val df = docs.toDF("doc_id", "text")
      val spans = TextOps.dupSpanMap(df, k).collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(s => (s._3, s._4)).toSeq)
        .toMap.withDefaultValue(Seq.empty)
      // reference: duplicated gram positions per doc, computed directly
      val grams = docs.flatMap { case (id, t) =>
        val toks = t.split(" ")
        (0 to toks.length - k).map(p => (id, p.toLong, toks.slice(p, p + k).mkString(" ")))
      }
      val counts = grams.groupBy(_._3).view.mapValues(_.size).toMap
      val dupPos = grams.filter(g => counts(g._3) >= 2)
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        .withDefaultValue(Set.empty[Long])
      for ((id, _) <- docs) {
        val sp = spans(id)
        // disjoint, sorted, non-adjacent (gap > 0 between spans)
        sp.sliding(2).foreach {
          case Seq((s1, l1), (s2, _)) => assert(s1 + l1 < s2,
            s"doc $id spans not maximal/disjoint: $sp")
          case _ =>
        }
        val covered = sp.flatMap { case (s, l) => s until (s + l) }.toSet
        val expected = dupPos(id).flatMap(p => p until (p + k))
        assert(covered == expected,
          s"doc $id cover mismatch: spans=$sp dupPos=${dupPos(id).toSeq.sorted}")
      }
    }
  }
}
