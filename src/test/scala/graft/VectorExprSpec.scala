package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.ldot

class VectorExprSpec extends SparkSpec {
  import spark.implicits._

  test("ldot matches the higher-order-function formulation exactly") {
    val rows = (0 until 500).map { i =>
      (Seq.tabulate(64)(j => ((i * 31 + j * 7) % 2001 - 1000).toLong),
       Seq.tabulate(64)(j => ((i * 17 + j * 13) % 2001 - 1000).toLong))
    }
    val df = rows.toDF("a", "b")
    val got = df.select(
      ldot($"a", $"b").as("fast"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), cast(0 AS bigint), (acc, v) -> acc + v)")
        .as("ref"))
    assert(got.filter($"fast" =!= $"ref").count() == 0)
  }

  test("ldot codegen and interpreted paths agree") {
    val df = Seq((Seq(1L, 2L, 3L), Seq(4L, 5L, 6L))).toDF("a", "b")
    val on = df.select(ldot($"a", $"b")).head.getLong(0)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val off = df.select(ldot($"a", $"b")).head.getLong(0)
      assert(on == 32L && off == 32L)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("ldot null array yields null") {
    val df = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
    assert(df.select(ldot($"a", $"b")).head.isNullAt(0))
  }

  test("srpCodes matches the higher-order-function formulation exactly") {
    import graft.functions.VectorFunctions.srpCodes
    val rows = (0 until 300).map { i =>
      Tuple1(Seq.tabulate(64)(j => ((i * 131 + j * 37) % 20001 - 10000).toLong))
    }
    val df = rows.toDF("q")
    val got = df.select(
      srpCodes($"q", 4, 8).as("fast"),
      expr(graft.ops.DedupOps.srpCodesHof).as("ref"))
    assert(got.filter(expr("fast != ref")).count() == 0)
    // codes actually vary across vectors (banding is not degenerate)
    assert(got.select($"fast").distinct().count() > 1)
  }

  test("srpCodes codegen and interpreted paths agree") {
    import graft.functions.VectorFunctions.srpCodes
    val df = Seq(Tuple1(Seq.tabulate(64)(j => (j * 97 % 2001 - 1000).toLong))).toDF("q")
    val on = df.select(srpCodes($"q", 4, 8)).head.getSeq[Long](0)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val off = df.select(srpCodes($"q", 4, 8)).head.getSeq[Long](0)
      assert(on == off && on.length == 4)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
