package graft

import org.apache.spark.sql.SparkSession

/** Dev CLI: run one catalog query, print timing and optionally the plan.
  * Usage: sbt "runMain graft.RunQuery <name> <sfDir> [explain]"
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val doExplain = args.contains("explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    spark.range(1).count() // session warmup so timings are query-only
    if (doExplain) fn(spark, sfDir).explain("formatted")
    var last = 0L
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      last = fn(spark, sfDir).count()
      println(f"[$name] run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $last rows")
    }
    spark.stop()
  }
}
