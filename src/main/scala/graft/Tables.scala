package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet fixture tables
  * (/root/repo/TESTDATA.md). One parquet file per table under the
  * scale-factor directory passed to every query.
  *
  * All operators read through these so that scans stay plain parquet
  * relations — Catalyst pushes filters/column pruning into the scan
  * (verify with .explain: PushedFilters / ReadSchema).
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Spread a small scan across the cluster before compute-heavy /
    * row-amplifying operators (explode, per-row hashing, vector math).
    * The fixture tables are single parquet files with one row group, so
    * without this the entire pre-shuffle pipeline runs in ONE task —
    * exactly the "input partitioning defines your parallelism" trap at
    * any scale. The shuffled bytes are tiny; the unlocked parallelism is
    * the whole machine.
    */
  def rebalance(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` is TIMESTAMP(NANOS) in parquet, which Spark 4 rejects by
    * default. Read nanos as long and floor-convert to a µs timestamp —
    * DuckDB applies the same ns→µs truncation, so instants agree.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      // integer DIV, not `/`: double division loses microseconds at 1e18 ns
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts DIV 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
