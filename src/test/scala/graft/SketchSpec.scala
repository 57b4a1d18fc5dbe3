package graft

import org.apache.spark.sql.functions._
import graft.functions.{SketchFunctions, SpaceSavingBuffer}

class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("exact regime (capacity >= distinct): matches groupBy counts") {
    val words = (0 until 3000).map(i => s"w${i % 17}").toDF("w").repartition(8)
    val viaSketch = words
      .agg(SketchFunctions.spaceSavingTopK($"w", 64, 17).as("top"))
      .select(explode($"top").as("t")).select($"t.item", $"t.cnt")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = words.groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaSketch == exact)
  }

  test("approximate regime: overestimates bounded by n/capacity, heavy hitter kept") {
    // 5000 items, one heavy hitter (40%), long tail of 500 distinct
    val data = (0 until 5000).map { i =>
      if (i % 5 < 2) "HEAVY" else s"tail${i % 500}"
    }
    val buf = new SpaceSavingBuffer(32)
    data.foreach(buf.add(_))
    val (heavyCount, heavyErr) = buf.counters("HEAVY")
    val trueHeavy = data.count(_ == "HEAVY")
    assert(heavyCount >= trueHeavy)                 // never undercounts
    assert(heavyCount - heavyErr <= trueHeavy)      // guaranteed lower bound
    assert(heavyCount - trueHeavy <= 5000 / 32)     // classic error bound
    assert(buf.counters.size <= 32)                 // bounded memory
  }

  test("saturation is surfaced, not silent: sat flag + err field per entry") {
    // exact regime: capacity > distinct -> sat false, err 0 on every entry
    val exact = (0 until 900).map(i => s"w${i % 9}").toDF("w").repartition(4)
      .agg(SketchFunctions.spaceSavingTopK($"w", 64, 9).as("top"))
      .select(explode($"top").as("t"))
      .select($"t.sat", $"t.err").collect()
    assert(exact.forall(r => !r.getBoolean(0) && r.getLong(1) == 0L))

    // approximate regime: capacity << distinct -> every entry carries
    // sat=true, so a gate column like q96b's exact_regime flips FALSE
    // with a named cause instead of an unexplained hash mismatch
    val approx = (0 until 5000).map(i => s"tail${i % 500}").toDF("w").repartition(4)
      .agg(SketchFunctions.spaceSavingTopK($"w", 32, 5).as("top"))
      .select(explode($"top").as("t")).select($"t.sat").collect()
    assert(approx.forall(_.getBoolean(0)))
  }

  test("eviction is O(log capacity): 500k distinct adds at 2^17 capacity stay fast") {
    // regression guard for the sf1 scaling find: the old minBy eviction
    // was O(capacity) per add past saturation — this exact workload took
    // tens of minutes; the ordered index does it in well under a second
    val buf = new SpaceSavingBuffer(1 << 17)
    val t0 = System.nanoTime()
    var i = 0
    while (i < 500000) { buf.add("item" + i); i += 1 }
    val ms = (System.nanoTime() - t0) / 1e6
    assert(buf.evicted)
    assert(buf.counters.size == (1 << 17))
    assert(ms < 5000, s"500k adds took $ms ms — eviction degenerated")
  }

  test("merge propagates the other buffer's per-entry error (VERDICT r7 #3)") {
    // buf B runs in the approximate regime: its survivors carry
    // inherited eviction error. Merging B into an EMPTY-overlap A must
    // keep those bounds — the old absent-item path re-inserted with
    // err=0, claiming exactness for counts that are upper bounds.
    val b = new SpaceSavingBuffer(4)
    Seq("x1", "x2", "x3", "x4", "y", "y", "y").foreach(b.add(_))
    // y evicted one of the x's: cnt 1(min)+3, err 1
    val (yc, ye) = b.counters("y")
    assert(yc == 4L && ye == 1L)

    val a = new SpaceSavingBuffer(4)
    Seq("z1", "z1", "z2", "z2").foreach(a.add(_))
    a.merge(b)
    // y survives the prune (cnt 4+off > 2); its error must still say
    // "cnt is NOT exact" — and absent-side offsets widen it honestly
    val (myc, mye) = a.counters("y")
    assert(mye >= 1L, s"merge dropped y's eviction error (err=$mye)")
    assert(myc - mye <= 3L, s"lower bound ${myc - mye} exceeds true count 3")
    assert(myc >= 3L, "upper bound must cover the true count")
    // both per-entry invariants hold for every survivor: cnt >= err >= 0
    a.counters.foreach { case (item, (c, e)) =>
      assert(e >= 0 && c >= e, s"$item: ($c, $e)")
    }
  }

  test("merged exact-regime buffers with overflow prune deterministically") {
    // two non-evicted buffers whose union exceeds capacity: the prune
    // keeps top-capacity by (cnt desc, item asc) and flips the
    // saturation flag (exactness is gone even though no ADD evicted)
    val a = new SpaceSavingBuffer(3)
    Seq("a", "a", "a", "b", "b", "c").foreach(a.add(_))
    val bb = new SpaceSavingBuffer(3)
    Seq("d", "d", "d", "d", "e", "f").foreach(bb.add(_))
    assert(!a.evicted && !bb.evicted)
    a.merge(bb)
    assert(a.evicted)
    assert(a.counters.size == 3)
    assert(a.counters.keySet == Set("d", "a", "b")) // 4, 3, 2
    // no offsets in play (neither side evicted): counts stay exact sums
    assert(a.counters("d") == (4L, 0L) && a.counters("a") == (3L, 0L))
  }

  test("chain merge (32 adversarial buffers) keeps the provable S-contract") {
    // ADVICE r8: across a deep chain of offset merges the classic eps*n
    // bound is NOT a theorem of the merge — err*cap <= S (the sketch's
    // own observable mass, S = sum of counters) is, for ANY merge tree,
    // alongside presence of S-heavy items, per-entry brackets, and
    // err <= min counter. This pins exactly what q123 now gates on.
    val cap = 64
    val truth = scala.collection.mutable.HashMap.empty[String, Long]
      .withDefaultValue(0L)
    val acc = new SpaceSavingBuffer(cap)
    val rnd = new scala.util.Random(9)
    for (p <- 0 until 32) {
      val b = new SpaceSavingBuffer(cap)
      // each partition: shared hot items + a disjoint tail wider than
      // capacity, so every buffer evicts and every merge pays offsets
      for (_ <- 0 until 2000) {
        val item =
          if (rnd.nextInt(100) < 30) "hot" + rnd.nextInt(5)
          else "p" + p + "t" + rnd.nextInt(300)
        b.add(item); truth(item) += 1L
      }
      assert(b.evicted)
      acc.merge(b)
    }
    val s = acc.counters.valuesIterator.map(_._1).sum
    val minCnt = acc.counters.valuesIterator.map(_._1).min
    acc.counters.foreach { case (item, (c, e)) =>
      assert(e <= minCnt, s"$item err $e > min $minCnt")
      assert(e * cap <= s, s"$item err $e breaks err*cap <= S (S=$s)")
      val f = truth(item)
      assert(c >= f && c - e <= f, s"$item bracket ($c,$e) vs true $f")
    }
    truth.foreach { case (item, f) =>
      if (f * cap > s)
        assert(acc.counters.contains(item), s"S-heavy $item (f=$f) absent")
      if (!acc.counters.contains(item))
        assert(f <= minCnt, s"absent $item true $f > min $minCnt")
    }
  }

  test("distributed merge across partitions stays exact in exact regime") {
    val words = (0 until 10000).map(i => (i % 32, s"t${i % 7}")).toDF("p", "w")
      .repartition(32, $"p")
    val got = words.agg(SketchFunctions.spaceSavingTopK($"w", 16, 7).as("top"))
      .select(explode($"top").as("t")).select($"t.cnt")
      .collect().map(_.getLong(0)).sorted
    // 10000 / 7 distinct tokens: 4 tokens x 1429, 3 x 1428
    assert(got.toSeq == Seq(1428L, 1428L, 1428L, 1429L, 1429L, 1429L, 1429L).sorted)
  }
}
