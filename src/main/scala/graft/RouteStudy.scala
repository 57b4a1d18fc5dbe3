package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.ldot

/** Routing-only calibration (round 12, VERDICT r11 #1): isolates the
  * COARSE ROUTER's recall from the PQ codebook's — the round-11 tables
  * measured the composed stack, where ADC ordering error hides routing
  * gains. For each (k, iters, probes) this measures: of the brute-force
  * top-5 neighbors, how many live in the query's `probes` nearest
  * learned cells — the ceiling any serve over that router can reach.
  * Compared against the same metric for the fixture's true labels
  * (single-probe = q52's routing, 2-probe = q64's).
  *
  *   sbt "runMain graft.RouteStudy fixtures/sf1vecwide"
  */
object RouteStudy {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nq = 10
    val quant = Tables.embeddings(spark, dir)
      .withColumn("q", expr(ops.VectorOps.quantExpr))
      .select(col("vec_id"), col("label"), col("q")).localCheckpoint()
    val brute = SparkEntry.queries("q51_cosine_topk")(spark, dir)
      .filter(col("rn") <= 5).select(col("qid"), col("vec_id"))
      .localCheckpoint()
    val denom = 5 * nq

    // routing ceiling for an arbitrary (vec_id -> cell) map at `probes`
    // nearest cells by exact rational-centroid distance
    def ceiling(assigned: DataFrame, cents: DataFrame, probes: Int): Long = {
      val wCell = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("dist"), col("cell"))
      val qcells = quant.filter(col("vec_id") < nq)
        .select(col("vec_id").as("qid"), col("q"))
        .crossJoin(broadcast(cents))
        .withColumn("dn", expr(
          """aggregate(zip_with(q, s, (x, sc) -> (x * n - sc) * (x * n - sc)),
            |          cast(0 AS bigint), (a, t) -> a + t)""".stripMargin))
        .withColumn("dist", col("dn").cast("double") /
                            (col("n") * col("n")).cast("double"))
        .withColumn("crn", row_number().over(wCell))
        .filter(col("crn") <= probes)
        .select(col("qid"), col("cell"))
      brute.join(assigned.select(col("vec_id"), col("cell")), "vec_id")
        .join(qcells, Seq("qid", "cell"), "left_semi").count()
    }

    // true-label baselines: cells = labels, centroids = label means
    val labelCents = quant
      .select(col("label").as("cell"), posexplode(col("q")).as(Seq("pos", "x")))
      .groupBy(col("cell"), col("pos")).agg(sum(col("x")).as("sd"))
      .groupBy(col("cell"))
      .agg(expr("transform(sort_array(collect_list(struct(pos, sd))), t -> t.sd)").as("s"))
      .join(quant.groupBy(col("label").as("cell")).agg(count(lit(1)).as("n")), "cell")
    val labelAssign = quant.select(col("vec_id"), col("label").as("cell"))
    for (p <- Seq(1, 2, 3)) {
      val c = ceiling(labelAssign, labelCents, p)
      println(f"true-label probes=$p      ceiling@5 = $c/$denom = ${100.0 * c / denom}%5.1f%%")
    }

    for (k <- Seq(8, 10, 16); iters <- Seq(1, 2, 4, 8, 16)) {
      val cents = ops.VectorOps.kmeansFit(quant.select(col("vec_id"), col("q")),
        k, iters).localCheckpoint()
      val assigned = ops.VectorOps.kmeansAssign(
        quant.select(col("vec_id"), col("q")), cents)
        .select(col("vec_id"), col("cell")).localCheckpoint()
      val live = cents.count()
      for (p <- Seq(1, 2, 3)) {
        val c = ceiling(assigned, cents, p)
        println(f"learned k=$k%-3d iters=$iters%-3d probes=$p  " +
          f"ceiling@5 = $c/$denom = ${100.0 * c / denom}%5.1f%%  (live cells $live)")
      }
    }
    spark.stop()
  }
}
