package graft

import org.apache.spark.sql.functions._

/** Cost-based optimization: ANALYZE TABLE column statistics feed the
  * optimizer's cardinality estimates. At 100 TB the difference between
  * "size = file bytes x default selectivity" and real column histograms
  * is the difference between a broadcast plan and a driver OOM — this is
  * the stats path `ScaleOps.broadcastIfSmall` leans on.
  */
class CboSpec extends SparkSpec {
  import spark.implicits._

  test("ANALYZE column stats sharpen filter cardinality estimates under CBO") {
    // stats are computed lazily with SQLConf.get, which falls back to the
    // GLOBAL default session when the thread-local active one is unset —
    // pin ours so a concurrently-swapped default (ExtensionsSpec) can't
    // shadow cbo.enabled
    org.apache.spark.sql.SparkSession.setActiveSession(spark)
    try {
      (0 until 10000).map(i => (i.toLong, i % 100, s"v$i"))
        .toDF("id", "bucket", "payload")
        .write.mode("overwrite").saveAsTable("cbo_t")

      spark.conf.set("spark.sql.cbo.enabled", "true")

      // before stats: the filter estimate has no rowCount to work from
      val before = spark.table("cbo_t").filter($"bucket" < 10)
        .queryExecution.optimizedPlan.stats
      assert(before.rowCount.isEmpty)

      spark.sql("ANALYZE TABLE cbo_t COMPUTE STATISTICS FOR ALL COLUMNS")

      // catalog carries the stats...
      val described = spark.sql("DESCRIBE EXTENDED cbo_t").collect().map(_.toString)
      assert(described.exists(r => r.contains("Statistics") && r.contains("10000 rows")),
        described.mkString("\n"))

      // ...and the optimizer's estimate for bucket < 10 lands near the
      // true 10% selectivity (min/max-based interpolation), instead of
      // no estimate at all
      val after = spark.table("cbo_t").filter($"bucket" < 10)
        .queryExecution.optimizedPlan.stats
      assert(after.rowCount.isDefined)
      val est = after.rowCount.get.toLong
      assert(est > 500 && est < 2000, s"estimate $est not near the true 1000")
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.sql("DROP TABLE IF EXISTS cbo_t")
    }
  }
}
