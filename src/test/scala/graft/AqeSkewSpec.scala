package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling: with a heavily skewed build of the left side,
  * adaptive execution splits the oversized partition at runtime
  * (spark.sql.adaptive.skewJoin). Complements the explicit salting in
  * ScaleOps — this is the "let the engine re-plan" path.
  */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed sort-merge join partition at runtime") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 100k rows on ONE key + a sprinkle of others vs a small-but-not-
      // broadcast dim: the hot key concentrates in one shuffle partition
      val fact = spark.range(100000)
        .select(when($"id" % 100 === 0, $"id" % 50).otherwise(lit(7L)).as("k"),
                concat(lit("payload_payload_payload_"), $"id").as("v"))
      val dim = spark.range(50).select($"id".as("k"), concat(lit("d"), $"id").as("attr"))
      val joined = fact.join(dim, "k")
      // collect() executes THIS dataset's queryExecution — count() would
      // spawn a separate one and the inspected plan would never finalize
      val n = joined.collect().length
      assert(n == 100000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"))
      assert(plan.contains("skew=true"), s"no skew split in:\n${plan.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
