package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import graft.ops.{DedupLedger, IndexStore}

/** Measurement harness for the TOMBSTONE takedown's ECONOMICS claim
  * (q177/q178): a forget costs O(deleted) regardless of corpus size
  * (it writes tombstone rows and publishes one manifest — no corpus
  * IO), the merge-on-read subtraction prices as one broadcast anti-join
  * on every subsequent verdict (flat in history size, zero on stores
  * without tombstones), and the physical drop rides the compaction the
  * store runs anyway. The study builds ledgers at three history scales,
  * takes down 500 owners at each, and times: the forget itself, the
  * batch verdict before/with/after-compaction tombstones, and the
  * folding compaction.
  *
  *   sbt "runMain graft.TombStudy fixtures/sf1"
  *
  * Not part of the correctness gate; numbers land in SCALING.md.
  */
object TombStudy {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "fixtures/sf1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.rebalance(Tables.documents(spark, dir)).localCheckpoint()
    val mx = docs.agg(max(col("doc_id"))).head.getLong(0)
    val batch = docs.filter(col("doc_id") >= mx - 999L).localCheckpoint()
    println(s"== corpus $dir: ${docs.count()} docs; batch = last 1000 ==")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // untimed warm-up: codegen, parquet writer, manifest paths
    locally {
      val wdir = java.nio.file.Files.createTempDirectory("tomb-warm").toString
      DedupLedger.buildLedger(docs.filter(col("doc_id") < 2000), wdir)
      IndexStore.forget(spark, wdir, "text",
        docs.filter(col("doc_id") < 100).select(col("doc_id")))
      DedupLedger.dedupAgainstLedger(spark, batch, wdir,
        IndexStore.snapshot(wdir)).count()
      IndexStore.compact(spark, wdir)
      ()
    }

    val histLo = mx - 999L
    for (h <- Seq(histLo / 4, histLo / 2, histLo)) {
      val hist = docs.filter(col("doc_id") < h)
      val ldir =
        java.nio.file.Files.createTempDirectory(s"tomb-study-$h").toString
      DedupLedger.buildLedger(hist, ldir)
      val nHist = IndexStore
        .frames(spark, ldir, IndexStore.snapshot(ldir),
          Some(IndexStore.CODES_DDL), Some(IndexStore.VECTORS_DDL))
        ._1.count()
      // verdict against the clean store (min of 3)
      def verdict(): Long =
        DedupLedger.dedupAgainstLedger(spark, batch, ldir,
          IndexStore.snapshot(ldir)).count()
      verdict() // footer warm
      val tClean = (1 to 3).map(_ => timed(verdict())._2).min
      // the takedown: 500 owners, spread across the exact arm
      val doomed = IndexStore
        .frames(spark, ldir, IndexStore.snapshot(ldir),
          Some(IndexStore.CODES_DDL), Some(IndexStore.VECTORS_DDL))
        ._1.select(col("owner")).orderBy(col("owner")).limit(500)
      val (_, tForget) = timed {
        IndexStore.forget(spark, ldir, "text", doomed, Some("study"))
      }
      // verdict THROUGH the tombstones (merge-on-read)
      verdict() // warm the tombs footer
      val tTomb = (1 to 3).map(_ => timed(verdict())._2).min
      // the folding compaction, then the post-fold verdict
      val (_, tCompact) = timed {
        IndexStore.compact(spark, ldir); IndexStore.vacuum(ldir); ()
      }
      verdict()
      val tAfter = (1 to 3).map(_ => timed(verdict())._2).min
      println(f"hist=$nHist%7d  forget(500)=$tForget%6.3f s  " +
        f"verdict clean=$tClean%6.3f s  with-tombs=$tTomb%6.3f s  " +
        f"post-fold=$tAfter%6.3f s  compact=$tCompact%6.3f s")
    }
    spark.stop()
  }
}
