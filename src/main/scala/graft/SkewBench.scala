package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.DedupOps
import graft.functions.VectorFunctions.ldot

/** One-off measurement harness: naive within-label self-join vs the
  * chunk-pair decomposition on a skewed cluster (one label holding half
  * the corpus). Results recorded in SCALING.md.
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 12000
    val skewFrac = 0.5
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      // the regime chunking targets: block table too big to broadcast, so
      // the candidate join is a SHUFFLE join and key skew concentrates on
      // one task (with a broadcastable side, skew is moot — every a-side
      // partition pairs locally and the hot label spreads for free)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      // fixture-scale artifact: these shuffles are MBs, so AQE's 64 MB
      // advisory size would coalesce the spread chunk groups back into
      // one task; at 100 TB the groups are advisory-sized on their own.
      // Emulate the production byte ratio instead of disabling AQE.
      // second fixture-scale artifact: AQE coalesces reduce partitions by
      // INPUT bytes and cannot see pair-generation output amplification —
      // a few MB of vectors collapse to one partition locally, where the
      // same clusters at 100 TB are GBs of input each. Disable coalescing
      // to measure the layout the plan has at scale.
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val hot = (n * skewFrac).toInt
    val emb = spark.range(n).select(
        $"id".as("vec_id"),
        when($"id" < hot, lit(0)).otherwise(pmod($"id", lit(40)) + 1).as("label"),
        transform(sequence(lit(1), lit(64)),
          i => pmod($"id" * i * lit(2654435761L) % lit(1000000007L), lit(2000)) - 1000)
          .as("q"))
      .withColumn("norm", ldot(col("q"), col("q")))
      .repartition(32).cache()
    emb.count()

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"$tag%-10s ${(System.nanoTime() - t0) / 1e9}%8.2f s   pairs=$rows")
    }
    def scored(pairs: org.apache.spark.sql.DataFrame) =
      pairs.withColumn("dot", ldot(col("a_q"), col("b_q")))
        .filter(col("dot") > lit(Long.MaxValue - 1)) // keep all work, tiny output
        .count()

    def naivePairs = {
      val a = emb.select($"label", $"vec_id".as("a_vec"), $"q".as("a_q"))
      val b = emb.select($"label", $"vec_id".as("b_vec"), $"q".as("b_q"))
      a.join(b, Seq("label")).filter($"a_vec" < $"b_vec")
    }
    time("chunk-cand") { DedupOps.chunkedBlockPairs(emb, chunk = 1000).count() }
    time("naive-cand") { naivePairs.count() }
    time("chunked") { scored(DedupOps.chunkedBlockPairs(emb, chunk = 1000)) }
    time("naive") { scored(naivePairs) }
    // task spread of the scoring stage
    val spread = DedupOps.chunkedBlockPairs(emb, chunk = 1000)
      .groupBy(spark_partition_id().as("p")).count()
      .agg(count(lit(1)), max("count")).collect()(0)
    println(s"chunked scoring partitions=${spread.getLong(0)} maxRows=${spread.getLong(1)}")
    val spreadN = naivePairs
      .groupBy(spark_partition_id().as("p")).count()
      .agg(count(lit(1)), max("count")).collect()(0)
    println(s"naive scoring partitions=${spreadN.getLong(0)} maxRows=${spreadN.getLong(1)}")
    spark.stop()
  }
}
