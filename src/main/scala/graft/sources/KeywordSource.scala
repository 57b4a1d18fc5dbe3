package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1 — keyword-parameterized scan (SURVEY.md §2.1, test.py:129-144):
  * the reference builds one search URL per keyword and crawls each; here
  * each keyword maps to an input directory of snapshots, unioned into a
  * single DataFrame tagged with its keyword. In a live system the
  * per-keyword directory becomes a DataSource V2 TableProvider wrapping
  * the fetcher; the downstream plan is identical.
  */
object KeywordSource {

  /** Batch: one tagged scan per keyword, unioned lazily (no data moves
    * until an action; each branch keeps its own pushdown).
    */
  def read(spark: SparkSession, keywordDirs: Map[String, String],
           format: String = "parquet"): DataFrame = {
    require(keywordDirs.nonEmpty, "at least one keyword source required")
    keywordDirs.toSeq.sortBy(_._1).map { case (kw, dir) =>
      spark.read.format(format).load(dir).withColumn("keyword", lit(kw))
    }.reduce(_ unionByName _)
  }

  /** Partition-pruned layout variant: keyword as a partition column
    * (`base/keyword=x/`), so a keyword filter prunes directories at
    * planning time instead of unioning scans.
    */
  def readPartitioned(spark: SparkSession, baseDir: String,
                      format: String = "parquet"): DataFrame =
    spark.read.format(format).load(baseDir)
}
