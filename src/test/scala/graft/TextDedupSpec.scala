package graft

import org.apache.spark.sql.DataFrame
import graft.ops.TextOps

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

  test("dedup-first composition recovers planted pairs on the 10x corpus") {
    val out = TextOps.dedupFirstJaccardPairs(duplicated(10))
    assert(pairs(out) == planted.toSet)
    // every representative carries its full duplication count
    val dups = out.select("d1_dups", "d2_dups").collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(dups == Set(10L))
  }

  test("dedup-first equals plain pipeline on a duplicate-free corpus") {
    val plain = pairs(TextOps.jaccardNearDupPairs(TextOps.shingled(baseCorpus)))
    val composed = pairs(TextOps.dedupFirstJaccardPairs(baseCorpus))
    assert(composed == plain)
  }
}
