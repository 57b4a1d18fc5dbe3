package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — DPP's sibling for NON-partition
  * join keys: the selective (filtered) side's keys build a bloom filter
  * that is injected as a `might_contain` semi-filter on the big side's
  * scan, cutting shuffle input before the join. At 100 TB this is the
  * difference between shuffling the whole fact table and shuffling the
  * ~selectivity fraction that can possibly match.
  */
class BloomFilterJoinSpec extends SparkSpec {
  import spark.implicits._

  test("selective dim filter injects a bloom might_contain on the fact scan") {
    val factDir = Files.createTempDirectory("bloom-fact").toString
    val dimDir = Files.createTempDirectory("bloom-dim").toString
    (0 until 100000).map(i => (i.toLong % 1000, i.toLong))
      .toDF("k", "payload").write.mode("overwrite").parquet(factDir)
    (0 until 1000).map(i => (i.toLong, if (i < 10) "keep" else "drop"))
      .toDF("r_k", "tag").write.mode("overwrite").parquet(dimDir)

    try {
      // thresholds sized down to fire on a KB-scale test fixture; the
      // defaults (10 MB creation side) are tuned for real tables
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // force a shuffle join: a broadcast join already prunes via the
      // build side, so Spark skips bloom injection there
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      val fact = spark.read.parquet(factDir)
      val dim = spark.read.parquet(dimDir).filter($"tag" === "keep")
      val q = fact.join(dim, fact("k") === dim("r_k"))
        .agg(count(lit(1)).as("n"))
      assert(q.collect()(0).getLong(0) == 1000L) // 10 keys x 100 rows each

      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"), plan)
      assert(plan.contains("bloom_filter_agg") || plan.contains("BloomFilter"), plan)
    } finally {
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
      spark.conf.unset(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
