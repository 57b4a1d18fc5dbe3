package graft

import graft.ops.IndexStore

/** OCC contention economics (round 18, VERDICT r17 Next #5): W unfenced
  * writers race D delta commits each onto ONE store through the
  * manifest-CAS protocol — the object-store condition (no advisory
  * lock; optionally the put-if-absent primitive). Reports commits/sec,
  * the CAS-retry distribution, per-writer latency percentiles, and the
  * starvation spread (slowest vs fastest writer finish). Pure protocol:
  * the "data" written per delta is one tiny raw file, so every measured
  * cost is manifest listing + carry re-derivation + the conditional
  * create itself — no Spark jobs anywhere. Not part of the catalog.
  *
  * Usage: runMain graft.OccStudy [writers] [deltas] [primitive]
  *   primitive: link (default) | putifabsent
  */
object OccStudy {
  def main(args: Array[String]): Unit = {
    val writers = args.headOption.map(_.toInt).getOrElse(8)
    val deltas = args.lift(1).map(_.toInt).getOrElse(100)
    val prim: IndexStore.CommitPrimitive =
      if (args.lift(2).contains("putifabsent"))
        IndexStore.CommitPrimitive.SimulatedPutIfAbsent
      else IndexStore.CommitPrimitive.HardLink
    val dir = java.nio.file.Files.createTempDirectory("occ-study").toString
    // seed: one published version so every writer starts on a delta
    new java.io.File(s"$dir/codes").mkdirs()
    java.nio.file.Files.write(
      new java.io.File(s"$dir/codes/seed.parquet").toPath, Array[Byte](1))
    IndexStore.withCommitPrimitive(prim) {
      // publish v1 through the raw protocol (no Spark): commitDelta on
      // the pre-listed seed file
      IndexStore.commitDelta(dir, Some("seed")) { () }
      IndexStore.fenceDisabledForTest = true
      val lat = Array.fill(writers)(
        scala.collection.mutable.ArrayBuffer.empty[Long])
      val finish = new Array[Long](writers)
      val retries0 = IndexStore.casRetries.get()
      val t0 = System.nanoTime()
      try {
        val ths = (0 until writers).map { w =>
          new Thread(() => {
            val sub = new java.io.File(s"$dir/codes/w$w")
            sub.mkdirs()
            (0 until deltas).foreach { n =>
              val c0 = System.nanoTime()
              IndexStore.commitDelta(dir, Some(s"w$w-$n")) {
                java.nio.file.Files.write(
                  new java.io.File(sub, f"f$n%04d.parquet").toPath,
                  Array[Byte](1))
                ()
              }
              lat(w) += System.nanoTime() - c0
            }
            finish(w) = System.nanoTime() - t0
          })
        }
        ths.foreach(_.start()); ths.foreach(_.join())
      } finally IndexStore.fenceDisabledForTest = false
      val wall = (System.nanoTime() - t0) / 1e9
      val retries = IndexStore.casRetries.get() - retries0
      val total = writers * deltas
      val all = lat.flatten.sorted
      def pct(p: Double) = all((all.length * p).toInt.min(all.length - 1)) / 1e6
      val head = IndexStore.headVersion(dir).getOrElse(-1)
      // completeness: every (writer, delta) file must be in HEAD
      val snap = IndexStore.snapshot(dir)
      val missing = (0 until writers).flatMap(w => (0 until deltas).map(n =>
        f"w$w/f$n%04d.parquet")).filterNot(snap.codes.contains)
      println(f"OCC $writers writers x $deltas deltas  prim=${prim.name}")
      println(f"  wall ${wall}%.2f s  commits/sec ${total / wall}%.1f  " +
        f"casRetries $retries (${retries.toDouble / total}%.2f/commit)")
      println(f"  latency ms p50 ${pct(0.5)}%.1f  p90 ${pct(0.9)}%.1f  " +
        f"p99 ${pct(0.99)}%.1f  max ${all.last / 1e6}%.1f")
      println(f"  writer finish spread ${finish.min / 1e9}%.2f .. " +
        f"${finish.max / 1e9}%.2f s (starvation ratio " +
        f"${finish.max.toDouble / finish.min}%.2f)")
      println(s"  head v$head (expect ${total + 1})  missing ${missing.size}")
      require(missing.isEmpty, s"LOST DELTAS: ${missing.take(5)}")
      require(head == total + 1, s"non-sequential publish: head $head")
    }
  }
}
