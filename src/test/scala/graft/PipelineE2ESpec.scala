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
