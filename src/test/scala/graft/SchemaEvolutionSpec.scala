package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Schema evolution on the landing zone: crawl snapshots gain fields over
  * time (the reference's job records did exactly this); readers must see
  * one unified schema with nulls for the old files' missing columns.
  */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("mergeSchema unifies old and new snapshot generations") {
    val dir = Files.createTempDirectory("evolve").toString
    // generation 1: two columns
    Seq((1L, "eng")).toDF("id", "job")
      .write.mode("append").parquet(dir)
    // generation 2: adds salary
    Seq((2L, "pm", 900L)).toDF("id", "job", "salary")
      .write.mode("append").parquet(dir)

    // plain read may resolve to a single footer's schema; mergeSchema
    // reconciles all footers
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.schema.fieldNames.sorted.toSeq == Seq("id", "job", "salary"))
    val rows = merged.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(rows.toSeq == Seq((1L, "eng", None), (2L, "pm", Some(900L))))

    // downstream default-on-missing (P6) composes on top
    val defaulted = merged.withColumn("salary", coalesce($"salary", lit(0L)))
    assert(defaulted.filter($"salary" === 0L).count() == 1)
  }
}
