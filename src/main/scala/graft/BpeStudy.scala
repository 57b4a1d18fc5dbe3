package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import graft.ops.BpeOps

/** Measurement harness for the production-vocabulary BPE encoder
  * (round-12 VERDICT "What's missing #1"): the gated replace-chain
  * encode folds one plan node per merge, so its PLAN cost grows with
  * the merge count — fine at the gated N_MERGES=12, fatal at a
  * production 30k–50k. The rank-loop encoder (bpeEncodeRanked) is one
  * mapPartitions regardless. This study measures both forms' plan-build
  * and execution time as the merge count grows, over a tailed-vocabulary
  * corpus (20k distinct words — the Heaps-law regime where thousands of
  * merges are actually learnable).
  *
  * Training for the sweep runs DRIVER-SIDE over the collected
  * distinct-word table (20k rows — exactly the table bpeTrain's
  * distributed loop aggregates; at this size the driver loop is the
  * same algorithm minus job-scheduling overhead). Fidelity is pinned by
  * comparing its first merges against the distributed bpeTrain before
  * the sweep; the distributed form stays the production trainer.
  *
  *   sbt "runMain graft.BpeStudy"
  *
  * Not part of the correctness gate; numbers land in SCALING.md.
  */
object BpeStudy {

  /** Driver-side BPE trainer: same greedy argmax + tiebreak (count
    * DESC, lhs ASC, rhs ASC) as bpeTrain, over an in-memory
    * (word, cnt) table. */
  private def trainDriver(wordCnt: Seq[(String, Long)],
                          nMerges: Int): Seq[(String, String)] = {
    // symbols per word: code points + the EOW marker
    val words = wordCnt.map { case (w, c) =>
      val syms = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        syms += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      syms += "</w>"
      (syms, c)
    }
    val merges = Seq.newBuilder[(String, String)]
    var step = 0
    var exhausted = false
    while (step < nMerges && !exhausted) {
      val counts = new java.util.HashMap[(String, String), Long]()
      words.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length - 1) {
          counts.merge((syms(j), syms(j + 1)), c, Long.box(_) + Long.box(_))
          j += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        var best: ((String, String), Long) = null
        counts.forEach { (k, v) =>
          if (best == null || v > best._2 ||
              (v == best._2 && (k._1 < best._1._1 ||
                (k._1 == best._1._1 && k._2 < best._1._2)))) best = (k, v)
        }
        val (l, r) = best._1
        merges += ((l, r))
        words.foreach { case (syms, _) =>
          var p = 0
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          while (p < syms.length) {
            if (p < syms.length - 1 && syms(p) == l && syms(p + 1) == r) {
              out += l + r; p += 2
            } else { out += syms(p); p += 1 }
          }
          syms.clear(); syms ++= out
        }
        step += 1
      }
    }
    merges.result()
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // tailed shape: 20k-word vocabulary over 50k docs — thousands of
    // learnable merges (the 31-word default exhausts at ~200)
    val docs = Tables.rebalance(
      GenFixtures.documents(spark, 50000L, 20000)).localCheckpoint()
    println(s"== corpus: ${docs.count()} docs, tailed 20k vocab ==")

    val wordCnt = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    println(s"distinct words: ${wordCnt.size}")

    // fidelity: driver trainer == distributed trainer on the prefix
    val nCheck = 40
    val (distMerges, tDist) = timed {
      BpeOps.bpeTrain(docs, nMerges = nCheck).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
    }
    val (drvAll, tDrv) = timed(trainDriver(wordCnt, 2000))
    require(drvAll.take(nCheck) == distMerges,
      s"driver trainer diverged from bpeTrain in the first $nCheck merges")
    println(f"trainer fidelity: first $nCheck merges identical " +
      f"(distributed $tDist%.1f s for $nCheck; driver $tDrv%.1f s for ${drvAll.size})")

    // the sweep: chain cost grows with M until the nested StringReplace
    // tree is FATAL — measured at M=500: codegen collapses (method >64KB),
    // the interpreted fallback's per-row eval() recursion overflows the
    // executor thread stacks, and SparkUncaughtExceptionHandler treats
    // StackOverflowError as fatal and SHUTS DOWN the local container
    // (uncatchable at job level; two prior runs died exactly there). So
    // the chain is executed only to a safe 200 here; past that the
    // recorded result is the measured fatality, not a timing.
    val chainCap = 200
    println("%-6s %-12s %-12s %-12s %-12s %-8s"
      .format("M", "chain_plan", "chain_run", "ranked_plan", "ranked_run", "match"))
    for (m <- Seq(12, 100, 200, 500, 1000, 2000)) {
      val merges = drvAll.take(m)
      val chain =
        if (m > chainCap) None
        else {
          val df = BpeOps.bpeEncode(docs, merges)
          val (_, tp) = timed(df.queryExecution.executedPlan)
          val (sum0, tr) = timed(
            df.agg(sum(crc32(col("s").cast("binary")))).head.getLong(0))
          Some((sum0, tp, tr))
        }
      val rdf = BpeOps.bpeEncodeRanked(docs, merges)
      val (_, rp) = timed(rdf.queryExecution.executedPlan)
      val (rsum, rr) = timed(
        rdf.agg(sum(crc32(col("s").cast("binary")))).head.getLong(0))
      chain match {
        case Some((csum, cp, cr)) =>
          val eq = if (csum == rsum) "yes" else "NO"
          println(f"$m%-6d $cp%-12.2f $cr%-12.2f $rp%-12.2f $rr%-12.2f $eq%-8s")
        case None =>
          println(f"$m%-6d FATAL(StackOverflow@500, measured)   " +
            f"$rp%-12.2f $rr%-12.2f -")
      }
    }
    spark.stop()
  }
}
