package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.RobustIngest

class RobustIngestSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("job", StringType),
    StructField("salary", LongType)))

  test("permissive parse splits good rows from quarantined raw payloads") {
    val raw = Seq(
      (1L, """{"job": "eng", "salary": 100}"""),
      (2L, """{"job": "pm"}"""),                    // missing field -> null, still good
      (3L, """{"job": "qa", "salary": "NaN"}"""),   // type mismatch -> corrupt
      (4L, """not json at all"""),                  // garbage -> corrupt
      (5L, """{"job": "ds", "salary": 200, "extra": true}""") // extra field ok
    ).toDF("id", "payload")

    val parsed = RobustIngest.parseJson(raw, $"payload", schema)

    val good = RobustIngest.good(parsed)
      .select($"id", $"parsed.job", $"parsed.salary").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(good.toSeq == Seq(
      (1L, "eng", Some(100L)), (2L, "pm", None), (5L, "ds", Some(200L))))

    // quarantined rows keep the ORIGINAL payload byte-for-byte for replay
    val bad = RobustIngest.quarantine(parsed)
      .select($"id", col(RobustIngest.CorruptCol)).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(bad.toSeq == Seq(
      (3L, """{"job": "qa", "salary": "NaN"}"""),
      (4L, """not json at all""")))

    // nothing lost: good + quarantine partition the input
    assert(good.length + bad.length == 5)
  }
}
