package graft

import graft.ops.GraphOps

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  // local union-find reference implementation
  private def ufComponents(n: Long, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map((0L until n).map(i => i -> i): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0L until n).map(i => i -> find(i)).toMap
  }

  private def ccMap(n: Long, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val verts = spark.range(n).select($"id")
    val e = edges.toDF("src", "dst")
    GraphOps.connectedComponents(verts, e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain graph: multi-hop propagation reaches the chain head") {
    // a 100-node path — pointer jumping must cover diameter 99 in O(log n)
    val edges = (0L until 99L).map(i => (i, i + 1))
    val got = ccMap(100, edges)
    assert(got == (0L until 100L).map(_ -> 0L).toMap)
  }

  test("mixed graph matches union-find (stars, cycles, isolated vertices)") {
    val edges = Seq(
      (5L, 3L), (3L, 9L), (9L, 5L),          // cycle
      (20L, 21L), (20L, 22L), (20L, 23L),    // star
      (40L, 41L), (41L, 42L), (42L, 40L), (42L, 43L), // cycle + tail
      (11L, 2L)                              // cross pair
    )                                        // 0,1,4,... isolated
    val got = ccMap(50, edges)
    assert(got == ufComponents(50, edges))
    assert(got(0L) == 0L && got(1L) == 1L)   // isolated stay their own root
    assert(got(23L) == 20L && got(43L) == 40L && got(9L) == 3L)
  }

  test("random graph matches union-find") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(300)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
    assert(ccMap(200, edges) == ufComponents(200, edges))
  }

  test("reliable-checkpoint mode produces identical roots") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
    val edges = ((0L until 40L).map(i => (i, i + 1)) ++
      Seq((60L, 70L), (70L, 80L), (55L, 56L))).toSeq
    val verts = spark.range(100).select($"id")
    val e = edges.toDF("src", "dst")
    val local = GraphOps.connectedComponents(verts, e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val reliable = GraphOps.connectedComponents(verts, e, checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reliable == local)
    assert(reliable == ufComponents(100, edges))
    // reliable mode actually wrote checkpoint files to the dir
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(java.nio.file.Files.isRegularFile(_)).count()
    assert(wrote > 0, s"no checkpoint files under $dir")
  }
}
