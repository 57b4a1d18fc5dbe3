package graft

import org.apache.spark.sql.functions._
import graft.ops.{IndexStore, VectorOps}

/** The ANN store's RETRAIN-TRIGGER policy (round 16, VERDICT r15 Next
  * #6): q129/q130 prove append/compact mechanics, but a codebook
  * trained on yesterday's distribution quietly loses recall as
  * appended vectors diverge from it. The policy is quantization-error
  * drift: the build stamps its training-time mean coarse error
  * (`qe_base`) and snapshot version; `appendedDriftRatio` reads ONLY
  * the appended rows (manifest diff) and compares their error against
  * the stamp; `needsRetrain` fires past a threshold. This spec pins
  * the polarity on both sides: in-distribution appends must NOT fire
  * (a policy that always retrains is as useless as one that never
  * does), diverged appends MUST. */
class RetrainSpec extends SparkSpec {
  import spark.implicits._

  test("drift policy: in-distribution appends hold ratio ~1, a diverged " +
       "append population fires needsRetrain") {
    val emb = GenFixtures.clusteredEmbeddings(spark, 700).localCheckpoint()
    val dir = java.nio.file.Files.createTempDirectory("idx-drift").toString
    VectorOps.buildIvfPqIndex(emb.filter($"vec_id" < 500), dir, k = 8)
    assert(IndexStore.props(dir).contains("qe_base"),
      "build must stamp the training-time quantization error")
    assert(VectorOps.appendedDriftRatio(spark, dir).isEmpty,
      "no appends yet -> no ratio")
    assert(!VectorOps.needsRetrain(spark, dir))

    // append 200 vectors from the SAME generator: drift ≈ 1
    VectorOps.appendToIvfPqIndex(spark,
      emb.filter($"vec_id" >= 500), dir, Some("in-dist"))
    val inDist = VectorOps.appendedDriftRatio(spark, dir).get
    assert(inDist > 0.5 && inDist < 1.5,
      s"in-distribution appends must read ~1x the training error: $inDist")
    assert(!VectorOps.needsRetrain(spark, dir),
      "the policy must not fire on in-distribution appends")

    // a second store from the same build, appended ONLY with a DIVERGED
    // population: deterministic seeded random unit vectors, nowhere
    // near the trained clusters (random directions in d dims sit at
    // near-orthogonal distance from every centroid; the trained points
    // sit within their cluster spread)
    val dir2 = java.nio.file.Files.createTempDirectory("idx-drift2").toString
    VectorOps.buildIvfPqIndex(emb.filter($"vec_id" < 500), dir2, k = 8)
    val dim = emb.select(size($"embedding")).head.getInt(0)
    val shifted = spark.range(10000, 10200).map { id =>
      val rng = new java.util.Random(id)
      val v = Array.fill(dim)(rng.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      (id, v.map(_ / n))
    }.toDF("vec_id", "embedding")
    VectorOps.appendToIvfPqIndex(spark, shifted, dir2, Some("diverged"))
    val drifted = VectorOps.appendedDriftRatio(spark, dir2).get
    assert(drifted > 1.5,
      s"a diverged append population must exceed the 1.5x threshold: $drifted")
    assert(VectorOps.needsRetrain(spark, dir2),
      "the policy must fire once appended vectors outgrow the codebook")

    // and the documented response — a full rebuild over the grown
    // corpus — resets the stamp and clears the trigger
    VectorOps.buildIvfPqIndex(
      emb.filter($"vec_id" < 500)
        .unionByName(shifted.withColumn("label", lit(0))), dir2, k = 8)
    assert(VectorOps.appendedDriftRatio(spark, dir2).isEmpty,
      "a rebuild re-stamps built_version at HEAD: nothing appended since")
    assert(!VectorOps.needsRetrain(spark, dir2))
  }

  test("drift policy degrades HONESTLY under the store's own lifecycle: " +
       "compaction yields None (never a diluted ~1), vacuum yields None " +
       "(never a crash)") {
    val emb = GenFixtures.clusteredEmbeddings(spark, 700).localCheckpoint()
    // compaction rewrites every file: a manifest diff across it would
    // read the WHOLE corpus as appended and dilute a real divergence
    // toward 1.0 — the policy must say "signal unavailable", not "fine"
    val dir = java.nio.file.Files.createTempDirectory("idx-drift-c").toString
    VectorOps.buildIvfPqIndex(emb.filter($"vec_id" < 500), dir, k = 8)
    VectorOps.appendToIvfPqIndex(spark,
      emb.filter($"vec_id" >= 500), dir, Some("a1"))
    assert(VectorOps.appendedDriftRatio(spark, dir).isDefined)
    VectorOps.compactIvfPqIndex(spark, dir)
    assert(VectorOps.appendedDriftRatio(spark, dir).isEmpty,
      "a compaction inside the policy window must surface as no-signal")
    assert(!VectorOps.needsRetrain(spark, dir))

    // vacuum past the build manifest: the incremental read is gone —
    // None, not an exception from snapshotAt
    val dir2 = java.nio.file.Files.createTempDirectory("idx-drift-v").toString
    VectorOps.buildIvfPqIndex(emb.filter($"vec_id" < 500), dir2, k = 8)
    VectorOps.appendToIvfPqIndex(spark,
      emb.filter($"vec_id" >= 500), dir2, Some("a1"))
    VectorOps.vacuumIvfPqIndex(dir2) // keepLast=1 prunes the build manifest
    assert(VectorOps.appendedDriftRatio(spark, dir2).isEmpty,
      "a vacuumed build manifest must read as no-signal, not crash")
    assert(!VectorOps.needsRetrain(spark, dir2))

    // and a rebuild restores the signal from a clean window
    VectorOps.buildIvfPqIndex(emb, dir, k = 8)
    VectorOps.appendToIvfPqIndex(spark,
      emb.filter($"vec_id" >= 500).withColumn("vec_id", $"vec_id" + 10000),
      dir, Some("a2"))
    assert(VectorOps.appendedDriftRatio(spark, dir).isDefined,
      "a rebuild clears last_replace_version and restores the signal")
  }
}
