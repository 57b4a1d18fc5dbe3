package graft

import org.apache.spark.sql.functions._
import graft.ops.PipelineOps

class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii replaces emails, phones and SSN-style ids, all occurrences") {
    val rows = Seq(
      "contact alice.smith+hr@example.co.uk or bob@test.io today",
      "call +1 (555) 123-4567 or 0911-222-333 now",
      "ssn 123-45-6789 on file",
      "no pii here at all"
    ).toDF("text")
    val got = rows.select(PipelineOps.redactPii($"text").as("t"))
      .as[String].collect().toSeq
    assert(got(0) == "contact [EMAIL] or [EMAIL] today")
    assert(got(1) == "call [PHONE] or [PHONE] now")
    assert(!got(2).contains("123-45-6789"))
    assert(got(3) == "no pii here at all")
  }

  test("hashBucket is deterministic, uniform-ish, and rerun-stable") {
    val df = spark.range(10000).select($"id".as("doc_id"))
    val b1 = df.select(PipelineOps.hashBucket($"doc_id").as("b"))
    val b2 = df.select(PipelineOps.hashBucket($"doc_id").as("b"))
    assert(b1.collect().map(_.getLong(0)).toSeq ==
           b2.collect().map(_.getLong(0)).toSeq)
    // all buckets in range; every bucket hit, occupancy near-uniform
    // (sequential ids are the adversarial case for a multiplicative step)
    val counts = b1.groupBy("b").count().collect().map(_.getLong(1))
    assert(b1.filter($"b" < 0 || $"b" >= 1000).count() == 0)
    assert(counts.length == 1000, s"only ${counts.length}/1000 buckets hit")
    assert(counts.max <= 20 && counts.min >= 5, s"min ${counts.min} max ${counts.max}")
  }

  test("contentBucket: id-independent, duplicate-consistent, near-uniform") {
    val docs = (0 until 5000).map(i => (i.toLong, s"document body number ${i / 2}"))
      .toDF("doc_id", "text") // every text appears under TWO different ids
    val b = docs.select($"doc_id", $"text",
      PipelineOps.contentBucket($"text").as("bucket"))
    // exact duplicates always share a bucket regardless of their ids
    assert(b.groupBy("text").agg(countDistinct($"bucket").as("nb"))
      .filter($"nb" =!= 1).count() == 0)
    // and distinct texts spread near-uniformly
    val counts = b.select("text", "bucket").distinct()
      .groupBy("bucket").count().select("count").as[Long].collect()
    assert(counts.sum == 2500)
    assert(counts.max <= 15, s"max bucket ${counts.max}")
  }

  test("withRunningTotal matches the single-partition global window exactly") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(5)
    val df = (0 until 5000).map(_ => (rnd.nextInt(1000000).toLong, rnd.nextInt(100).toLong))
      .distinctBy(_._1).map { case (k, v) => (k, v) }
      .toDF("k", "v")
    val w = Window.orderBy($"k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val reference = df.withColumn("cum_v", sum($"v").over(w))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(2)))
    // arbitrary partition counts (incl. an odd 257 — more partitions than
    // distinct keys per partition bucket stays correct) and the
    // defaultParallelism-derived default must all match the global window
    for (parts <- Seq(8, 257, 0)) {
      val distributed = graft.ops.PipelineOps.withRunningTotal(df, "k", "v", parts)
        .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(2)))
      assert(distributed.toSeq == reference.toSeq, s"partitions=$parts")
    }
    // and the window is keyed on the range-partition id — no global
    // single-partition Exchange feeding a Sort+Window
    val plan = graft.ops.PipelineOps.withRunningTotal(df, "k", "v", 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("_pid"), plan)
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }

  test("stratified sample keeps strata rates within tolerance") {
    val docs = spark.range(20000).select(
      $"id".as("doc_id"),
      when($"id" % 4 === 0, "en").otherwise("zh").as("lang"))
    val rate = when($"lang" === "en", lit(200L)).otherwise(lit(500L))
    val sampled = docs
      .withColumn("bucket", PipelineOps.hashBucket($"doc_id"))
      .filter($"bucket" < rate)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // en: 5000 ids at 20% => ~1000; zh: 15000 at 50% => ~7500
    assert(math.abs(sampled("en") - 1000) < 150, sampled)
    assert(math.abs(sampled("zh") - 7500) < 700, sampled)
  }
}
