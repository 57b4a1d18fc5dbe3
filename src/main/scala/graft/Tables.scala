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
  /** `events.ts` has shipped as both TIMESTAMP(NANOS) and TIMESTAMP(MICROS)
    * across fixture generations. Spark 4 rejects nanos by default; with the
    * legacy flag it reads them as LONG. Branch on the materialized type:
    * a long is nanos → floor-convert to a µs timestamp (DuckDB applies the
    * same ns→µs truncation, so instants agree); a timestamp is already µs.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer DIV, not `/`: double division loses microseconds at 1e18 ns
        df.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts DIV 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // parquet micros with isAdjustedToUTC=false reads as TIMESTAMP_NTZ;
        // the catalog runs with session tz UTC, so the NTZ→LTZ cast keeps
        // the instant and restores the TIMESTAMP type unix_millis/window
        // functions expect (DuckDB reads the same value as a naive ts).
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast(
          org.apache.spark.sql.types.TimestampType))
      case org.apache.spark.sql.types.TimestampType => df // µs LTZ: native
      case other =>
        // fail FAST at the loader with the observed type — a silent
        // pass-through would instead surface as obscure per-query analysis
        // errors across the 21 events consumers (the round-9 outage class)
        throw new IllegalStateException(
          s"events.ts materialized as unsupported $other in $d/events.parquet; " +
          "known generations: TIMESTAMP(NANOS)→long (legacy flag), " +
          "TIMESTAMP_NTZ(µs), TIMESTAMP(µs LTZ). Add a normalization branch.")
    }
  }
  /** Fail fast on `documents` drift: every downstream text operator keys on
    * (doc_id: integral, text: string) — a renamed/retyped column should die
    * here with the observed schema, not as 30 obscure per-query errors. */
  def documents(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types._
    val df = load(s, d, "documents")
    def has(n: String, ok: DataType => Boolean) =
      df.schema.fields.exists(f => f.name == n && ok(f.dataType))
    if (!has("doc_id", t => t == LongType || t == IntegerType) ||
        !has("text", _ == StringType))
      throw new IllegalStateException(
        s"documents drifted in $d: need doc_id(int/long) + text(string), got " +
        df.schema.simpleString)
    df
  }
  /** Normalize `embeddings.embedding` across fixture generations: every
    * vector op quantizes via cast-to-double, so float and double elements
    * are both fine — anything else (decimal, string re-materialization)
    * fails fast with the observed type. */
  def embeddings(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types._
    val df = load(s, d, "embeddings")
    df.schema("embedding").dataType match {
      case ArrayType(FloatType | DoubleType, _) => df
      case other =>
        throw new IllegalStateException(
          s"embeddings.embedding materialized as $other in $d; quantExpr " +
          "needs array<float|double>. Add a normalization branch.")
    }
  }
}
