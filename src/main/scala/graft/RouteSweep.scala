package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness behind the q122 routing-threshold choice (SCALING.md):
  * sweeps corpus DIVERSITY (GenFixtures vocabulary size) at a fixed doc
  * count and, for each shape, prints the routing statistics
  * (rare-tail retained count, doc-coverage fraction) next to the
  * MEASURED planted-pair recall of both candidate generators — the
  * df-capped inverted index and corpus-relative minhash LSH. The
  * round-7 router dispatched on `retained > 0`, whose gray band
  * (retained tiny-but-nonzero) this sweep is designed to expose: the
  * thresholds in TextOps.routedNearDupPairs must be set so every
  * measured point routes to a branch (or the union band) whose recall
  * holds. Run:
  *
  *   sbt "runMain graft.RouteSweep [nDocs] [vocab,vocab,...]"
  *
  * defaults: 50000 docs (the sf1 scale), the vocab ladder below.
  */
object RouteSweep {

  private def norm(df: DataFrame): DataFrame =
    df.select(least(col("d1"), col("d2")).as("d1"),
              greatest(col("d1"), col("d2")).as("d2"))

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(50000L)
    val vocabs: Seq[Int] =
      if (args.length > 1) args(1).split(",").toSeq.map(_.trim.toInt)
      else Seq(0, 40, 60, 80, 100, 150, 300, 1000, 20000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    println(f"${"vocab"}%7s ${"retained"}%9s ${"witness"}%9s ${"w_ratio"}%8s " +
      f"${"cov_frac"}%8s ${"truth"}%6s ${"idx_rec"}%7s ${"mh_rec"}%7s " +
      f"${"route"}%8s ${"routed"}%7s")
    for (v <- vocabs) {
      val docs = GenFixtures.documents(spark, n, v)
        .select(col("doc_id"), col("text"))
      val planted = GenFixtures.plantedPairs(spark, n)
        .select(least(col("d1"), col("d2")).as("d1"),
                greatest(col("d1"), col("d2")).as("d2"))
      val g = ops.TextOps.shingled(docs).localCheckpoint()

      val (retained, witnesses) = ops.TextOps.pairWitnessDiagnostic(g)
      val (covered, totalDocs) = ops.TextOps.coverageDiagnostic(g)

      // truth: planted pairs that clear the operator's exact-Jaccard bar
      val truth = planted
        .join(g.select(col("doc_id").as("d1"), col("grams").as("g1")), "d1")
        .join(g.select(col("doc_id").as("d2"), col("grams").as("g2")), "d2")
        .withColumn("jac",
          size(array_intersect(col("g1"), col("g2"))).cast("double") /
          size(array_union(col("g1"), col("g2"))))
        .filter(col("jac") >= 0.5)
        .select("d1", "d2").localCheckpoint()
      val nTruth = truth.count()

      // the operator's OWN constants — a hardcoded copy here could
      // silently calibrate against a different index than the router
      // ships (ADVICE r8)
      val idx = truth.join(
        norm(ops.TextOps.jaccardPairsOn(g, ops.TextOps.DF_CAP)),
        Seq("d1", "d2"), "left_semi").count()
      val mh = truth.join(
        norm(ops.DedupOps.minhashPairsOn(g,
          pairBudgetPerDoc = Some(ops.TextOps.PAIR_BUDGET_PER_DOC))),
        Seq("d1", "d2"), "left_semi").count()

      // the routed operator end-to-end (re-shingles internally — the
      // sweep is a measurement harness, not a bench)
      val routed = ops.TextOps.routedNearDupPairs(docs).localCheckpoint()
      val route = routed.select("route").limit(1).collect()
        .headOption.map(_.getString(0)).getOrElse("(empty)")
      val nRouted = truth.join(norm(routed.filter(col("d1") >= 0)),
        Seq("d1", "d2"), "left_semi").count()

      println(f"$v%7d $retained%9d $witnesses%9d " +
        f"${retained.toDouble / math.max(1L, witnesses)}%8.4f " +
        f"${covered.toDouble / totalDocs}%8.4f $nTruth%6d " +
        f"${100.0 * idx / math.max(1L, nTruth)}%6.1f%% " +
        f"${100.0 * mh / math.max(1L, nTruth)}%6.1f%% " +
        f"$route%8s ${100.0 * nRouted / math.max(1L, nTruth)}%6.1f%%")
    }
    spark.stop()
  }
}
