package graft

import org.apache.spark.sql.functions._
import graft.ops.{DedupLedger, IndexStore, VectorOps}

/** TOMBSTONE deletes — the takedown lifecycle (round 17). A takedown
  * at 100 TB must cost O(deleted), not O(corpus): [[IndexStore.forget]]
  * commits `(modality, id)` rows as a normal tombstone DELTA, every
  * reader subtracts them merge-on-read (zero plan change for stores no
  * takedown has touched), the next compaction makes the drop physical,
  * and vacuum removes the bytes. This spec pins the whole arc plus the
  * contracts around it: id-namespace isolation across a mixed store's
  * modalities, time-travel to pre-forget versions, idempotent tags,
  * concurrent-forget survival across a replacement commit, ledger
  * re-admission semantics, and the modality-stamp guard. */
class TombstoneSpec extends SparkSpec {
  import spark.implicits._

  private def words(n: Int, seed: String) =
    (0 until n).map(i => s"$seed$i").mkString(" ")

  test("ANN store: forget is merge-on-read (serve excludes, next-nearest " +
       "promotes, time travel still sees the rows), compact makes it " +
       "physical, vacuum removes the bytes") {
    val emb = GenFixtures.clusteredEmbeddings(spark, 700).localCheckpoint()
    val dir = java.nio.file.Files.createTempDirectory("idx-tomb").toString
    VectorOps.buildIvfPqIndex(emb, dir, k = 8)
    val vBuilt = IndexStore.headVersion(dir).get

    // take down each query's MEASURED top-1: after the forget it must
    // never be served again and the previous rank-2 must promote
    def serve() = VectorOps.servedIvfPqTopK(spark, dir, emb,
      numQueries = 5, probes = 2, rerank = 10, topK = 3)
    val before = serve().collect()
    val top1 = before.filter(_.getAs[Long]("rn") == 1L)
      .map(r => r.getAs[Long]("qid") -> r.getAs[Long]("vec_id")).toMap
    val top2 = before.filter(_.getAs[Long]("rn") == 2L)
      .map(r => r.getAs[Long]("qid") -> r.getAs[Long]("vec_id")).toMap
    val doomed = top1.values.toSet

    val vForget = IndexStore.forget(spark, dir, "vector",
      doomed.toSeq.toDF("vec_id"), tag = Some("takedown-1"))
    assert(vForget == vBuilt + 1, "forget publishes one delta version")
    // the tombstone delta touched NO data arm
    val snapF = IndexStore.snapshot(dir)
    assert(snapF.tombs.nonEmpty &&
      snapF.codes == IndexStore.snapshotAt(dir, vBuilt).codes,
      "forget must add only tombstone files")

    // merge-on-read: the forgotten rows stop being served, the
    // next-nearest candidates promote (still topK rows per query)
    val after = serve().collect()
    assert(after.length == 15, "forget must not shrink the result set")
    assert(after.forall(r => !doomed.contains(r.getAs[Long]("vec_id"))),
      "a forgotten vector must never be served")
    after.filter(_.getAs[Long]("rn") == 1L).foreach { r =>
      val q = r.getAs[Long]("qid")
      // the old rank-2 promotes unless it was itself taken down (it
      // can be another query's top-1)
      if (!doomed.contains(top2(q)))
        assert(r.getAs[Long]("vec_id") == top2(q),
          s"query $q: expected old rank-2 ${top2(q)} to promote, " +
          s"got ${r.getAs[Long]("vec_id")}")
    }
    val nStored = 700 - doomed.size
    val (codesF, vecsF) = IndexStore.frames(spark, dir, snapF)
    assert(codesF.count() == nStored && vecsF.count() == nStored)

    // time travel: the pre-forget version still reads the full store —
    // pinned readers inside the retention window are isolated
    val (codesOld, _) = IndexStore.frames(spark, dir,
      IndexStore.snapshotAt(dir, vBuilt))
    assert(codesOld.count() == 700)

    // idempotent tag: a replayed takedown publishes nothing
    assert(IndexStore.forget(spark, dir, "vector",
      (0L until 5L).toDF("vec_id"), tag = Some("takedown-1")) == vForget)

    // compact folds the tombstones into a physical drop: the rewritten
    // files no longer CONTAIN the rows and the new snapshot carries no
    // tombstones
    VectorOps.compactIvfPqIndex(spark, dir)
    val snapC = IndexStore.snapshot(dir)
    assert(snapC.tombs.isEmpty,
      "compaction must fold applied tombstones away")
    val raw = spark.read.option("basePath", s"$dir/codes")
      .parquet(snapC.codes.map(f => s"$dir/codes/$f"): _*)
    assert(raw.count() == nStored &&
      raw.filter($"vec_id".isin(doomed.toSeq: _*)).count() == 0,
      "compaction must physically drop forgotten rows")
    // serve is bit-stable across the physical drop
    assert(serve().collect().toSeq == after.toSeq,
      "compaction changed serve results")
    // vacuum removes the tombstone bytes with the old data files
    VectorOps.vacuumIvfPqIndex(dir)
    assert(new java.io.File(dir, "tombs").listFiles() == null ||
      !new java.io.File(dir, "tombs").listFiles()
        .exists(_.getName.endsWith(".parquet")),
      "vacuum must delete unreferenced tombstone files")
  }

  test("text ledger: a forgotten owner stops suppressing re-submissions " +
       "— its content is re-admissible as novel under a new owner") {
    val dir = java.nio.file.Files.createTempDirectory("led-tomb").toString
    DedupLedger.buildLedger(Seq(
      0L -> words(30, "h"), 1L -> words(30, "x")).toDF("doc_id", "text"),
      dir)
    // premise: a verbatim copy of doc 0 exact-drops against the ledger
    val batch = Seq(10L -> words(30, "h")).toDF("doc_id", "text")
    val pre = DedupLedger.dedupAgainstLedger(spark, batch, dir,
      IndexStore.snapshot(dir)).collect()
    assert(pre.length == 1 && pre(0).getAs[Long]("keep") == 0L &&
      pre(0).getAs[Long]("exact_of") == 0L)

    IndexStore.forget(spark, dir, "text", Seq(0L).toDF("owner"))
    val post = DedupLedger.dedupAgainstLedger(spark, batch, dir,
      IndexStore.snapshot(dir)).collect()
    assert(post.length == 1 && post(0).getAs[Long]("keep") == 1,
      s"content whose only owner was forgotten must re-admit: ${post.toSeq}")
    // and the re-admission appends under the NEW owner
    DedupLedger.appendSurvivors(batch, dir, tag = "readmit")
    val re = DedupLedger.dedupAgainstLedger(spark, batch, dir,
      IndexStore.snapshot(dir)).collect()
    assert(re(0).getAs[Long]("keep") == 0 &&
      re(0).getAs[Long]("exact_of") == 10L,
      "the re-admitted copy owns its content now")
    // the untouched owner still suppresses
    val other = DedupLedger.dedupAgainstLedger(spark,
      Seq(20L -> words(30, "x")).toDF("doc_id", "text"), dir,
      IndexStore.snapshot(dir)).collect()
    assert(other(0).getAs[Long]("keep") == 0 &&
      other(0).getAs[Long]("exact_of") == 1L)
  }

  test("mixed store: modality id namespaces are isolated (forgetting " +
       "video owner 5 keeps media owner 5); stamp guard rejects a " +
       "takedown for a modality the store never ingested") {
    val dir = java.nio.file.Files.createTempDirectory("mix-tomb").toString
    IndexStore.setProps(dir, Map("modalities" -> "media,video"))
    DedupLedger.appendMediaSurvivors(
      Seq((5L, Array(100L)), (6L, Array(200L)))
        .toDF("media_id", "fp"), dir, tag = "m1")
    DedupLedger.appendVideoSurvivors(
      Seq((5L, 0L, Array(300L)), (5L, 1L, Array(301L)),
          (7L, 0L, Array(400L)), (7L, 1L, Array(401L)))
        .toDF("media_id", "f", "fp"), dir, tag = "v1")

    IndexStore.forget(spark, dir, "video", Seq(5L).toDF("owner"))
    val snap = IndexStore.snapshot(dir)
    val marks = IndexStore.marksFrame(spark, dir, snap, IndexStore.MARKS_DDL)
    val seqs = IndexStore.seqsFrame(spark, dir, snap)
    assert(marks.filter($"owner" === 5L).count() == 1,
      "media owner 5 must survive a VIDEO takedown of id 5")
    assert(seqs.filter($"owner" === 5L).count() == 0 &&
      seqs.filter($"owner" === 7L).count() == 2,
      "video owner 5 must be gone, owner 7 untouched")

    // the stamp guard: this store never ingested text
    val err = intercept[IllegalArgumentException] {
      IndexStore.forget(spark, dir, "text", Seq(1L).toDF("owner"))
    }
    assert(err.getMessage.contains("modalities"),
      s"guard must fail by name: ${err.getMessage}")
    // and unknown modalities fail regardless of stamps
    intercept[IllegalArgumentException] {
      IndexStore.forget(spark, dir, "audio", Seq(1L).toDF("owner"))
    }
  }

  test("a rebuild replaces content outright: tombstones do not survive " +
       "it — the rebuild input defines the content, so takedowns " +
       "re-apply against it") {
    val dir = java.nio.file.Files.createTempDirectory("rb-tomb").toString
    val corpus = Seq(
      0L -> words(30, "h"), 1L -> words(30, "x")).toDF("doc_id", "text")
    DedupLedger.buildLedger(corpus, dir)
    IndexStore.forget(spark, dir, "text", Seq(0L).toDF("owner"))
    assert(IndexStore.snapshot(dir).tombs.nonEmpty)
    val (gone, _) = IndexStore.frames(spark, dir, IndexStore.snapshot(dir),
      Some(IndexStore.CODES_DDL), Some(IndexStore.VECTORS_DDL))
    assert(gone.filter($"owner" === 0L).count() == 0)
    // rebuild from the RAW corpus (which still carries the content)
    DedupLedger.buildLedger(corpus, dir)
    assert(IndexStore.snapshot(dir).tombs.isEmpty,
      "a rebuild's snapshot is exactly its input — no tombstone carry")
    val (back, _) = IndexStore.frames(spark, dir, IndexStore.snapshot(dir),
      Some(IndexStore.CODES_DDL), Some(IndexStore.VECTORS_DDL))
    assert(back.filter($"owner" === 0L).count() == 1,
      "content re-introduced by the rebuild input is served again — " +
      "the documented re-apply contract")
  }

  test("a forget landing inside a compaction window survives the " +
       "replacement commit merge-on-read (it targets rows the rewrite " +
       "already copied — only the NEXT compaction drops them)") {
    val dir = java.nio.file.Files.createTempDirectory("race-tomb").toString
    DedupLedger.buildLedger(Seq(
      0L -> words(30, "h"), 1L -> words(30, "x")).toDF("doc_id", "text"),
      dir)
    val base = IndexStore.snapshot(dir)
    // the takedown lands while a compaction (replacement over `base`)
    // is in flight
    IndexStore.forget(spark, dir, "text", Seq(1L).toDF("owner"))
    IndexStore.commitReplace(dir, base) {
      // rewrite that adds nothing: the interesting part is the carry
    }
    val head = IndexStore.snapshot(dir)
    assert(head.tombs.nonEmpty,
      "a forget concurrent with a replacement must carry forward")
    val (exact, _) = IndexStore.frames(spark, dir, head,
      Some(IndexStore.CODES_DDL), Some(IndexStore.VECTORS_DDL))
    assert(exact.filter($"owner" === 1L).count() == 0,
      "the carried tombstone must still subtract merge-on-read")
  }
}
