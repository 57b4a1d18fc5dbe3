package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixture-schema drift tolerance for `Tables.events`.
  *
  * The driver-generated `events.parquet` has shipped `ts` as
  * TIMESTAMP(NANOS) (reads as LONG under the legacy flag) in some
  * generations and TIMESTAMP(MICROS) without UTC adjustment (reads as
  * TIMESTAMP_NTZ) in others. A generation flip once broke every
  * events-consuming query in the catalog (21 of them) because the loader
  * hard-coded the nanos path. Pin: all encodings normalize to TIMESTAMP
  * (LTZ) with the same instant, so downstream `unix_millis` / window /
  * session_window functions work against any generation.
  */
class TablesDriftSpec extends SparkSpec {
  import spark.implicits._

  // 2021-03-04T05:06:07.123456Z as epoch micros
  private val micros = 1614834367123456L

  private def writeEvents(dir: String)(mkTs: org.apache.spark.sql.Column,
                                       tsType: DataType): Unit = {
    Seq((1L, 7L, "signup", 1.0, "{}"))
      .toDF("event_id", "user_id", "event_type", "value", "props")
      .withColumn("ts", mkTs.cast(tsType))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def loadedMicros(dir: String): Long = {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType,
      s"ts must normalize to TIMESTAMP, got ${df.schema("ts").dataType}")
    df.select(unix_micros(col("ts"))).as[Long].head()
  }

  test("long-nanos generation normalizes to a µs timestamp") {
    val dir = Files.createTempDirectory("drift-ns").toString
    writeEvents(dir)(lit(micros * 1000L), LongType)
    assert(loadedMicros(dir) == micros)
  }

  test("TIMESTAMP_NTZ micros generation normalizes to the same instant") {
    val dir = Files.createTempDirectory("drift-ntz").toString
    writeEvents(dir)(lit(new Timestamp(micros / 1000L))
      .cast(TimestampType), TimestampNTZType)
    // session tz is UTC, so the NTZ wall-clock IS the instant
    assert(loadedMicros(dir) == (micros / 1000L) * 1000L)
  }

  test("TIMESTAMP (LTZ) generation passes through unchanged") {
    val dir = Files.createTempDirectory("drift-ltz").toString
    writeEvents(dir)(timestamp_micros(lit(micros)), TimestampType)
    assert(loadedMicros(dir) == micros)
  }

  test("a GENUINE parquet TIMESTAMP(NANOS) file decodes end-to-end") {
    // pyarrow-written Timestamp(isAdjustedToUTC=false, NANOS) resource
    // (tools/gen_nanos_fixture.py): exercises the real legacy-flag decode
    // (nanosAsLong) that produces the LongType branch, not just the branch
    // itself. 2021-03-04T05:06:07.123456789Z floors to .123456 µs.
    val dir = getClass.getResource("/events_nanos").getPath
    assert(loadedMicros(dir) == micros)
  }

  test("an unrecognized ts generation fails FAST at the loader, by name") {
    val dir = Files.createTempDirectory("drift-bad").toString
    writeEvents(dir)(lit("2021-03-04"), StringType)
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("events.ts") &&
           e.getMessage.contains("StringType"), e.getMessage)
  }

  // ---- the same drift class for the other two driver-generated tables
  // (VERDICT r10 #7): pin that a parquet regeneration is either a no-op
  // at the loader or an immediate named failure — never 30 obscure
  // per-query errors.

  test("embeddings: float and double element generations both load") {
    for ((t, tag) <- Seq(FloatType -> "f", DoubleType -> "d")) {
      val dir = Files.createTempDirectory(s"drift-emb-$tag").toString
      Seq((0L, Seq(0.1, 0.2), 1)).toDF("vec_id", "embedding", "label")
        .withColumn("embedding", col("embedding").cast(ArrayType(t)))
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val df = Tables.embeddings(spark, dir)
      // the one quantization formula must give identical int64s either way
      val q = df.selectExpr(ops.VectorOps.quantExpr).as[Seq[Long]].head()
      assert(q == Seq(1000L, 2000L), q)
    }
  }

  test("embeddings: a non-numeric element generation fails fast, by name") {
    val dir = Files.createTempDirectory("drift-emb-bad").toString
    Seq((0L, Seq("0.1"), 1)).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val e = intercept[IllegalStateException](Tables.embeddings(spark, dir))
    assert(e.getMessage.contains("embeddings.embedding"), e.getMessage)
  }

  test("documents: doc_id/text retype or rename fails fast, by name") {
    val dir = Files.createTempDirectory("drift-doc").toString
    Seq(("a", "some text")).toDF("doc_id", "text") // doc_id as STRING
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val e = intercept[IllegalStateException](Tables.documents(spark, dir))
    assert(e.getMessage.contains("documents") &&
           e.getMessage.contains("doc_id"), e.getMessage)
    // and the healthy shape (extra columns welcome) passes through
    val ok = Files.createTempDirectory("drift-doc-ok").toString
    Seq((1L, "text", "en")).toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$ok/documents.parquet")
    assert(Tables.documents(spark, ok).count() == 1L)
  }
}
