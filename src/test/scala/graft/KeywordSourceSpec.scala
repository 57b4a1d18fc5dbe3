package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.KeywordSource

class KeywordSourceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  test("per-keyword scans union with keyword tags (S1)") {
    val d1 = tmp("kw-a"); val d2 = tmp("kw-b")
    Seq(("j1", 10)).toDF("job", "n").write.mode("overwrite").parquet(d1)
    Seq(("j2", 20), ("j3", 30)).toDF("job", "n").write.mode("overwrite").parquet(d2)
    val df = KeywordSource.read(spark, Map("區塊鏈工程師" -> d1, "資料工程師" -> d2))
    assert(df.count() == 3)
    val byKw = df.groupBy("keyword").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKw == Map("區塊鏈工程師" -> 1L, "資料工程師" -> 2L))
  }

  test("partitioned layout prunes to the filtered keyword") {
    val base = tmp("kw-part")
    Seq(("j1", 10)).toDF("job", "n")
      .withColumn("keyword", lit("kw_a"))
      .write.partitionBy("keyword").mode("overwrite").parquet(base)
    Seq(("j2", 20)).toDF("job", "n")
      .withColumn("keyword", lit("kw_b"))
      .write.partitionBy("keyword").mode("append").parquet(base)
    val pruned = KeywordSource.readPartitioned(spark, base)
      .filter(col("keyword") === "kw_a")
    assert(pruned.count() == 1)
    // partition pruning is visible in the scan's partition filters
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || plan.contains("keyword"), plan)
  }
}
