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
}
