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

  test("CBO join reorder: stats flip a written-order chain to cheapest-first") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    org.apache.spark.sql.SparkSession.setActiveSession(spark)
    def innermostJoinTables(q: org.apache.spark.sql.DataFrame): Set[String] = {
      val joins = q.queryExecution.optimizedPlan.collect { case j: Join => j }
      joins.last.children.flatMap(_.collectLeaves()).map(_.toString)
        .flatMap(l => Seq("cbo_big", "cbo_med", "cbo_small").filter(l.contains))
        .toSet
    }
    try {
      (0 until 200000).map(i => (i.toLong % 20000, i.toLong))
        .toDF("k1", "pay").write.mode("overwrite").saveAsTable("cbo_big")
      (0 until 20000).map(i => (i.toLong, i.toLong % 50))
        .toDF("k1", "k2").write.mode("overwrite").saveAsTable("cbo_med")
      (0 until 50).map(i => (i.toLong, s"s$i"))
        .toDF("k2", "tag").write.mode("overwrite").saveAsTable("cbo_small")
      Seq("cbo_big", "cbo_med", "cbo_small").foreach(t =>
        spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS"))

      def query = spark.table("cbo_big")
        .join(spark.table("cbo_med"), "k1")
        .join(spark.table("cbo_small"), "k2")
        .groupBy().count()

      // written order: the innermost join is big x med
      assert(innermostJoinTables(query) == Set("cbo_big", "cbo_med"))

      // with CBO + join reorder, stats say med x small is the cheaper
      // inner pair (tiny intermediate), and the optimizer rewrites to it
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      val reordered = innermostJoinTables(query)
      assert(reordered == Set("cbo_med", "cbo_small"), reordered)
      assert(query.collect()(0).getLong(0) == 200000L)
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.conf.unset("spark.sql.cbo.joinReorder.enabled")
      Seq("cbo_big", "cbo_med", "cbo_small").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
