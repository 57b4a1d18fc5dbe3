package graft

import graft.ops.{DedupLedger, IndexStore, VectorOps}

/** Study main (round 21, VERDICT r20 Next #5): PROVE the round-20
  * change 1b — ANN builder-stamped `ddl.*` table schemas — with a
  * measured construct-cost A/B. Clones the stored IVF-PQ index N
  * times; half the clones keep the builder's stamps, half have them
  * stripped; each clone's FIRST `IndexStore.frames` construct (the
  * fresh-read path a new session/tailer pays — no caller DDL, so
  * stamped clones resolve schemas from the stamp, stripped clones run
  * parquet footer inference) is timed in isolation. Not part of the
  * catalog. */
object AnnStampProfile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.read.parquet(s"$d/region.parquet").count()
    val src = VectorOps.ensureIvfPqIndex(s, d, k = VectorOps.GATED_K)
    val snapSrc = IndexStore.snapshot(src)
    println(s"SPROF store: codes files=${snapSrc.codes.size} " +
      s"vectors files=${snapSrc.vectors.size} " +
      s"stamped=${IndexStore.props(src).contains("ddl.version")}")
    def construct(dir: String): Double = {
      val snap = IndexStore.snapshot(dir)
      val t0 = System.nanoTime()
      IndexStore.frames(s, dir, snap) // no caller DDL: stamp-or-inference
      (System.nanoTime() - t0) / 1e9
    }
    val zone = graft.jobs.JobRecordGate.freshZone("graft-stampprof-", d)
    val out = Seq(true, false).map { stamped =>
      val times = (1 to reps).map { i =>
        val dir = new java.io.File(zone,
          s"idx-${if (stamped) "st" else "un"}-$i").getAbsolutePath
        DedupLedger.cloneStore(src, dir)
        if (!stamped)
          IndexStore.setProps(dir, Map(
            "ddl.version" -> "", "ddl.codes" -> "", "ddl.vectors" -> ""))
        construct(dir)
      }
      val mean = times.sum / times.size
      println(f"SPROF ${if (stamped) "stamped " else "stripped"} " +
        f"first-construct mean ${mean}%.4f s  " +
        times.map(t => f"$t%.3f").mkString("[", " ", "]"))
      mean
    }
    println(f"SPROF stamp saving per fresh frames() construct: " +
      f"${out(1) - out(0)}%.4f s (${out(1) / out(0)}%.1fx)")
    s.stop()
  }
}
