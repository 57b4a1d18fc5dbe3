package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{SemanticOps, VectorOps}

/** Measurement harness for q131's cluster-blocking approximation (the
  * SemDeDup trade): of the PLANTED near-duplicate pairs (ground truth
  * with exact realized cosines), what fraction lands inside one learned
  * cell — the only place the within-cluster pair scan can see them —
  * reported by cosine band, plus the end-to-end semanticDedup wall time
  * and prune count at the fixture scale.
  *
  *   sbt "runMain graft.SemStudy fixtures/sf1vec"
  *
  * Not part of the correctness gate; numbers land in SCALING.md.
  */
object SemStudy {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "fixtures/sf1vec"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.rebalance(Tables.embeddings(spark, dir)).localCheckpoint()
    val quant = emb.withColumn("q", expr(VectorOps.quantExpr))
      .select(col("vec_id"), col("q"))
    val planted = spark.read.parquet(s"$dir/planted_vec_pairs.parquet")
    val cents = VectorOps.kmeansFit(quant, VectorOps.GATED_K,
      VectorOps.IVF_COARSE_ITERS, None)
    for (p <- Seq(1, 2)) {
      val probed = VectorOps.kmeansAssignTopP(quant, cents, p)
        .select(col("vec_id"), col("cell")).localCheckpoint()
      val p1 = probed.select(col("vec_id").as("v1"), col("cell"))
      val p2 = probed.select(col("vec_id").as("v2"), col("cell"))
      val covered = p1.join(p2, "cell")
        .select(col("v1"), col("v2")).distinct()
        .withColumn("cov", lit(1L))
      val joined = planted.join(covered, Seq("v1", "v2"), "left")
        .withColumn("band", floor(col("cos_exact") * 10) / 10)
        .withColumn("same", coalesce(col("cov"), lit(0L)))
      println(s"== blocking recall on planted pairs, probes=$p ==")
      joined.groupBy(col("band"))
        .agg(count(lit(1)).as("pairs"), sum(col("same")).as("same_cell"),
             round(sum(col("same")) / count(lit(1)).cast("double"), 3).as("recall"))
        .orderBy(col("band").desc)
        .show(50, truncate = false)
    }

    // end-to-end prune pass at this scale, across thresholds — the
    // prune RATE is corpus-dependent (a tight-cluster corpus saturates
    // at low τ), the wall time is not
    val taus =
      if (args.length > 1) args.drop(1).map(_.toDouble).toSeq
      else Seq(SemanticOps.SEMDEDUP_T, 0.5, 0.7, 0.9)
    for (tau <- taus; i <- 1 to 2) {
      val t0 = System.nanoTime()
      val out = SemanticOps.semanticDedup(emb, k = VectorOps.GATED_K,
        iters = VectorOps.IVF_COARSE_ITERS, cosT = tau)
      val dropped = out.filter(col("keep") === 0L).count()
      val n = out.count()
      println(f"[semdedup $dir tau=$tau] run $i: " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s, dropped $dropped of $n")
    }
    spark.stop()
  }
}
