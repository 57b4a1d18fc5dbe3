package graft

import org.apache.spark.sql.functions._
import graft.ops.DedupOps

/** Skew-safety of the q55 candidate generator: the chunk-pair
  * decomposition must produce exactly the naive block-join pairs while
  * spreading an oversized label over bounded join groups (VERDICT r1 #3).
  */
class DedupOpsSpec extends SparkSpec {
  import spark.implicits._

  // ids deliberately non-contiguous so pmod chunking isn't trivially even
  private def block(label: String, n: Int, seed: Int) =
    (0 until n).map(i => (label, (i.toLong * 7 + seed) % 100000 + seed * 100000L,
                          (i * 31 + seed) % 97))

  test("chunkedBlockPairs emits exactly the naive block-join pairs") {
    val df = (block("big", 1200, 1) ++ block("small", 3, 2) ++
              block("one", 1, 3)).toDF("label", "vec_id", "score")
    val naive = df.as("a").join(df.as("b"),
        $"a.label" === $"b.label" && $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("v1"), $"b.vec_id".as("v2"), $"a.label")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val chunked = DedupOps.chunkedBlockPairs(df, chunk = 100)
      .select($"v1", $"v2", $"label")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(chunked == naive)
    assert(chunked.size == 1200 * 1199 / 2 + 3)
    // value columns ride along on both sides
    val cols = DedupOps.chunkedBlockPairs(df, chunk = 100).columns.toSet
    assert(Set("a_score", "b_score", "a_vec", "b_vec").subsetOf(cols))
  }

  test("oversized label spreads over bounded chunk-pair groups, not one task") {
    val n = 2000
    val chunk = 200
    val k = n / chunk // 10 chunks -> 55 unordered chunk pairs
    val df = block("giant", n, 5).toDF("label", "vec_id", "score")
    val pairs = DedupOps.chunkedBlockPairs(df, chunk = chunk)

    // the join key includes the chunk ids -> shuffle spreads the block
    val plan = pairs.queryExecution.optimizedPlan.toString
    assert(plan.contains("_i") && plan.contains("_j"), plan)

    // row-count bound per join group: recompute each pair's group from the
    // chunk assignment and assert no group exceeds ~chunk^2 (the naive
    // join would put all n(n-1)/2 pairs in ONE group)
    val total = n.toLong * (n - 1) / 2
    val groups = pairs
      .withColumn("c1", pmod($"v1", lit(k.toLong)))
      .withColumn("c2", pmod($"v2", lit(k.toLong)))
      .groupBy(least($"c1", $"c2"), greatest($"c1", $"c2"))
      .count().select("count").as[Long].collect()
    assert(groups.sum == total)
    assert(groups.length == k * (k + 1) / 2)
    assert(groups.max <= chunk.toLong * chunk,
      s"largest group ${groups.max} exceeds chunk^2 bound")
  }

  test("chunk width >= block size degenerates to the plain single-group join") {
    val df = block("lbl", 50, 9).toDF("label", "vec_id", "score")
    val pairs = DedupOps.chunkedBlockPairs(df, chunk = 1000)
    assert(pairs.count() == 50L * 49 / 2)
  }

  test("property: chunk decomposition is pair-exact for random sizes/chunks") {
    val r = new scala.util.Random(11)
    (1 to 5).foreach { _ =>
      val blocks = (0 until (1 + r.nextInt(3))).map(b =>
        block(s"L$b", 1 + r.nextInt(120), b * 17 + r.nextInt(5)))
      val df = blocks.reduce(_ ++ _).toDF("label", "vec_id", "score")
        // random duplicate ids across labels must not cross-contaminate
      val chunk = 1 + r.nextInt(60)
      val naive = df.as("a").join(df.as("b"),
          $"a.label" === $"b.label" && $"a.vec_id" < $"b.vec_id")
        .select($"a.vec_id", $"b.vec_id", $"a.label")
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2))).toSet
      val got = DedupOps.chunkedBlockPairs(df, chunk = chunk)
        .select($"v1", $"v2", $"label")
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2))).toSet
      assert(got == naive, s"chunk=$chunk sizes=${blocks.map(_.size)}")
    }
  }

  test("hammingPairs: dedup-first banding emits exactly the naive pair set, " +
       "including identical-fingerprint groups") {
    import spark.implicits._
    // 5 identical copies (the blank-thumbnail mass), one 1-bit neighbor,
    // one 2-bit neighbor of THAT (3 bits from the group — out of reach
    // of the group, in reach of the first neighbor), one far fingerprint
    val rows = Seq(
      0L -> 0xF0F0L, 1L -> 0xF0F0L, 2L -> 0xF0F0L, 3L -> 0xF0F0L,
      4L -> 0xF0F0L,
      10L -> 0xF0F1L,               // hamming 1 from the group
      11L -> 0xF0F1L,               // second copy of the neighbor
      20L -> (0xF0F1L ^ 0x600L),    // hamming 2 from 10/11, 3 from group
      30L -> 0x0A0A0A0AL)           // far from everything
    val df = rows.toDF("id", "h")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val naive = (for {
      (i1, h1) <- rows; (i2, h2) <- rows
      if i1 < i2 && ham(h1, h2) <= 2
    } yield (i1, i2, ham(h1, h2).toLong)).toSet
    val got = DedupOps.hammingPairs(df, "id", "h",
        bands = 3, bandBits = 14, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == naive, s"got ${got.toSeq.sorted}\nexp ${naive.toSeq.sorted}")
    // the pathology guard: the identical group enters the BAND JOIN as
    // one representative row, not five
    val plan = DedupOps.hammingPairs(df, "id", "h", 3, 14, 2)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("bit_count"), plan) // sanity: right pipeline
  }
}
