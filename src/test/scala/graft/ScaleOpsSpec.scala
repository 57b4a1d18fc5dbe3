package graft

import org.apache.spark.sql.functions._
import graft.ops.ScaleOps

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  private def skewed = {
    // 90% of rows share one hot key
    val rows = (0 until 2000).map { i =>
      val k = if (i % 10 == 0) s"k${i % 50}" else "HOT"
      (k, i.toLong, s"v$i")
    }
    rows.toDF("key", "uid", "payload")
  }

  test("saltedEquiJoin equals the plain join on skewed data") {
    val dim = (0 until 50).map(i => (s"k$i", s"dim$i")).toDF("key", "attr")
      .union(Seq(("HOT", "dimHOT")).toDF("key", "attr"))
    val plain = skewed.join(dim, "key")
      .select("key", "uid", "attr").orderBy("uid").collect()
    val salted = ScaleOps.saltedEquiJoin(skewed, dim, "key", "uid", 8)
      .select("key", "uid", "attr").orderBy("uid").collect()
    assert(salted.toSeq == plain.toSeq)
    assert(salted.length == 2000)
  }

  test("saltedCollectList matches direct collect_list content") {
    val direct = skewed.groupBy("key")
      .agg(sort_array(collect_list($"payload")).as("payloads"))
      .orderBy("key").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val salted = ScaleOps.saltedCollectList(skewed, "key", "payload", "uid", 8)
      .orderBy("key").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(salted == direct)
    assert(salted("HOT").length == 1800)
  }

  test("bucketed tables join without any Exchange (co-located)") {
    val a = (0 until 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (0 until 1000).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
    try {
      ScaleOps.writeBucketed(a, "bkt_a", "k", 8)
      ScaleOps.writeBucketed(b, "bkt_b", "k", 8)
      // disable broadcast so the join actually exercises bucket co-location
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(joined.count() == 1000)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }

  test("writeSized controls output file count and max rows per file") {
    val dir = java.nio.file.Files.createTempDirectory("sized").toString
    val df = (0 until 10000).map(i => (i.toLong, s"p$i")).toDF("id", "payload")
    ScaleOps.writeSized(df, dir, files = 4, maxRecordsPerFile = 1500)
    val parts = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    // 4 partitions x 2500 rows, split at 1500 rows/file => 2 files each
    assert(parts.length == 8, parts.map(_.getName).toSeq)
    val back = spark.read.parquet(dir)
    assert(back.count() == 10000)
    // no file exceeds the record cap
    parts.foreach { f =>
      assert(spark.read.parquet(f.getAbsolutePath).count() <= 1500)
    }
  }

  test("writeRangeSorted yields near-disjoint per-file ranges that prune scans") {
    val dir = java.nio.file.Files.createTempDirectory("rangesorted").toString
    val rnd = new scala.util.Random(3)
    val df = (0 until 20000).map(_ => (rnd.nextInt(100000).toLong, rnd.nextInt()))
      .toDF("k", "v")
    ScaleOps.writeRangeSorted(df, dir, "k", files = 8)
    val parts = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(parts.length == 8)
    // per-file [min,max] ranges must not overlap (range partitioning) —
    // this is what lets parquet footer stats prune whole files
    val ranges = parts.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min($"k"), max($"k")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi <= lo2, ranges.toSeq)
      case _ =>
    }
    // and a selective filter reads back correctly through the layout
    val cnt = spark.read.parquet(dir).filter($"k" < 1000).count()
    assert(cnt == df.filter($"k" < 1000).count())
  }

  test("broadcastIfSmall hints under the threshold, abstains over it") {
    val dim = (0 until 100).map(i => (i.toLong, s"d$i")).toDF("k", "attr")
    val fact = (0 until 1000).map(i => (i.toLong % 100, i)).toDF("k", "x")

    // under the threshold: the hint sticks -> BroadcastHashJoin even with
    // auto-broadcast disabled
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val hinted = fact.join(ScaleOps.broadcastIfSmall(dim), "k")
      assert(hinted.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))
      assert(hinted.count() == 1000)

      // over the threshold: frame returned unhinted (same reference), so
      // the planner is free to pick a non-broadcast join
      assert(ScaleOps.broadcastIfSmall(dim, maxBytes = 0L) eq dim)
      val unhinted = fact.join(ScaleOps.broadcastIfSmall(dim, 0L), "k")
      assert(!unhinted.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("boundedCollect: under the bound passes rows through, over the " +
       "bound fails by name without materializing the frame") {
    import spark.implicits._
    val small = (1 to 5).toDF("x")
    assert(graft.ops.ScaleOps.boundedCollect(small, 10L, "five rows")
      .map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3, 4, 5))
    val big = spark.range(0, 1000).toDF("x")
    val ex = intercept[IllegalArgumentException] {
      graft.ops.ScaleOps.boundedCollect(big, 100L, "too many")
    }
    assert(ex.getMessage.contains("bounded-collect contract"),
      s"expected the contract message, got: ${ex.getMessage}")
  }
}
