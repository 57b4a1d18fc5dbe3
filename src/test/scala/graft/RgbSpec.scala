package graft

import org.apache.spark.sql.functions._
import graft.functions.{RgbFunctions, RgbUtil}
import org.apache.spark.unsafe.types.UTF8String

class RgbSpec extends SparkSpec {
  import spark.implicits._

  private def u(s: String) = UTF8String.fromString(s)

  test("RgbUtil.parse handles spacing and rejects malformed input") {
    assert(RgbUtil.parse(u("rgb(78, 145, 255)")).toSeq == Seq(78, 145, 255))
    assert(RgbUtil.parse(u("rgb(78,145,255)")).toSeq == Seq(78, 145, 255))
    assert(RgbUtil.parse(u("rgba(1,2,3)")) == null)
    assert(RgbUtil.parse(u("rgb(1,2)")) == null)
    assert(RgbUtil.parse(u("rgb(a,b,c)")) == null)
    assert(RgbUtil.parse(null) == null)
  }

  test("isSimilarRgb: ±5 per-channel tolerance boundary (test.py:36-39)") {
    val df = Seq(
      ("rgb(78, 145, 255)", true),   // exact
      ("rgb(83, 150, 250)", true),   // +5/+5/-5 boundary in
      ("rgb(84, 145, 255)", false),  // +6 one channel out
      ("rgb(72, 145, 255)", false),  // -6 out
      ("not-a-color", false)
    ).toDF("c", "expected")
    val got = df.select(
      RgbFunctions.isSimilarRgb($"c", lit("rgb(78, 145, 255)"), 5).as("got"),
      $"expected").collect()
    got.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1), r.toString))
  }

  test("isSimilarRgb null input yields false, not null") {
    val df = Seq[Option[String]](None).toDF("c")
    val r = df.select(RgbFunctions.isSimilarRgb($"c", lit("rgb(1,2,3)"), 5).as("x")).head
    assert(!r.isNullAt(0) && !r.getBoolean(0))
  }

  test("expression participates in codegen (no fallback exception) and matches interpreted eval") {
    // force both paths: wholeStage on (default) vs off
    val data = (0 to 255 by 5).map(i => s"rgb($i, $i, $i)").toDF("c")
    val expr = RgbFunctions.isSimilarRgb(col("c"), lit("rgb(100, 100, 100)"), 5)
    val on = data.select(expr.as("x")).collect().map(_.getBoolean(0)).toSeq
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val off = data.select(expr.as("x")).collect().map(_.getBoolean(0)).toSeq
      assert(on == off)
      assert(on.count(identity) == 3) // 95, 100, 105 are within ±5 of 100
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("custom expressions are callable from plain SQL after registration") {
    graft.functions.GraftFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT is_similar_rgb('rgb(10, 10, 10)', 'rgb(12, 8, 10)', 5) AS a,
        |       is_similar_rgb('rgb(10, 10, 10)', 'rgb(99, 8, 10)', 5) AS b,
        |       ldot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d""".stripMargin).head
    assert(r.getBoolean(0) && !r.getBoolean(1) && r.getLong(2) == 32L)
  }

  test("legendLevel decodes exact colors with 未知 default (test.py:471-482)") {
    val df = Seq("rgb(41, 128, 255)", "rgb(200, 200, 200)", "rgb(9, 9, 9)").toDF("bg")
    val got = df.select(RgbFunctions.legendLevel($"bg").as("l")).collect().map(_.getString(0))
    assert(got.toSeq == Seq("精通", "不會", "未知"))
  }
}
