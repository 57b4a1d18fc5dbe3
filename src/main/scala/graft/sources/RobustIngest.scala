package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Corrupt-tolerant semi-structured ingest. Crawl payloads are dirty by
  * construction (truncated fetches, encoding damage, schema drift); at
  * 100 TB a single malformed record must neither kill the job
  * (FAILFAST) nor silently disappear (DROPMALFORMED). The PERMISSIVE +
  * quarantine-column pattern keeps every byte: parsable records get the
  * typed struct, unparsable ones carry their raw payload into a
  * quarantine sink for replay after the parser is fixed.
  */
object RobustIngest {

  val CorruptCol = "_corrupt"

  /** Parse `jsonCol` against `schema` permissively; adds the typed
    * `parsed` struct plus a `_corrupt` column holding the raw text of
    * unparsable records (null for good ones).
    */
  def parseJson(df: DataFrame, jsonCol: Column, schema: StructType): DataFrame = {
    val withCorrupt = schema.add(CorruptCol, StringType)
    df.withColumn("parsed",
        from_json(jsonCol, withCorrupt,
          Map("mode" -> "PERMISSIVE",
              "columnNameOfCorruptRecord" -> CorruptCol)))
      .withColumn(CorruptCol, col(s"parsed.$CorruptCol"))
      .withColumn("parsed", col("parsed").dropFields(CorruptCol))
  }

  /** Rows that parsed cleanly (typed struct usable). */
  def good(parsed: DataFrame): DataFrame =
    parsed.filter(col(CorruptCol).isNull).drop(CorruptCol)

  /** Rows needing replay: the ORIGINAL payload, untouched. */
  def quarantine(parsed: DataFrame): DataFrame =
    parsed.filter(col(CorruptCol).isNotNull)
}
