package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Training-data pipeline operators beyond the reference surface
  * (SURVEY.md §2.9 extension tier): corpus quality signals, deterministic
  * sampling/splitting, and quantization stats — the pieces a 100 TB
  * pretraining-mix pipeline runs between dedup and tokenization.
  *
  * Everything is one or two map-side-combined aggregations; the sampling
  * predicate is pure row-local arithmetic (no rand(), no driver state),
  * so it pushes into the scan and re-runs identically on retry — which is
  * what makes it usable for reproducible train/val splits.
  */
object PipelineOps {

  /** Word bigrams (order-preserving); empty below 2 tokens. */
  private val bigramExpr =
    """CASE WHEN size(toks) >= 2 THEN
      |  transform(sequence(1, size(toks) - 1),
      |            i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1)))
      |ELSE array() END""".stripMargin

  private val bigramSqlDuck =
    "[toks[i] || ' ' || toks[i+1] FOR i IN range(1, len(toks))]"

  /** Deterministic permille bucket from an id: a Lehmer/MinSTD step
    * (x -> 48271·x mod 2^31-1), NOT rand() — reproducible across runs,
    * engines and retries, and 48271 is coprime to every bucket count, so
    * even dense sequential ids spread over all buckets. Non-negative ids
    * only (% and pmod agree there); 48271·id stays inside a long for ids
    * < 1.9e14, comfortably past any per-table row count.
    */
  def hashBucket(id: Column, buckets: Int = 1000): Column =
    pmod(pmod(id * lit(48271L), lit(2147483647L)), lit(buckets.toLong))

  /** Content-stable variant: bucket from the TEXT itself (md5 prefix), so
    * membership survives id reassignment across pipeline versions and
    * exact duplicates always land in the same bucket (sampling before or
    * after dedup picks consistent representatives). Engine-portable: the
    * DuckDB mirror is ('0x' || substr(md5(text), 1, 8))::BIGINT % n.
    */
  def contentBucket(text: Column, buckets: Int = 1000): Column =
    pmod(conv(substring(md5(text), 1, 8), 16, 10).cast("long"),
         lit(buckets.toLong))

  /** Redact common PII shapes (emails, international-ish phone numbers,
    * SSN-style ids) with typed placeholders. regexp_replace is codegen'd
    * and replaces ALL occurrences; order matters (phone before bare-id so
    * a formatted number isn't half-eaten by the id rule).
    */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]")
    val phone = regexp_replace(email,
      "\\+?\\d{1,3}[ .-]?\\(?\\d{2,4}\\)?[ .-]?\\d{3,4}[ .-]?\\d{3,4}", "[PHONE]")
    regexp_replace(phone, "\\b\\d{3}-\\d{2}-\\d{4}\\b", "[ID]")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- q72: Gopher-style repetition quality signals — fraction of
    // bigram mass taken by the single most frequent bigram, and by all
    // repeated bigrams. One explode + two hash-aggs (both map-side
    // combined); no per-doc collect.
    "q72_repetition_quality" -> ((s, d) => {
      Tables.rebalance(Tables.documents(s, d))
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 2)
        .select(col("doc_id"), explode(expr(bigramExpr)).as("gram"))
        .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_bigrams"),
             max(col("c")).as("top_c"),
             sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup_c"))
        .select(col("doc_id"), col("n_bigrams"),
          round(col("top_c").cast("double") / col("n_bigrams"), 6).as("top2_frac"),
          round(col("dup_c").cast("double") / col("n_bigrams"), 6).as("dup2_frac"))
        .orderBy(col("doc_id"))
    }),

    // ---- q73: deterministic stratified sampling + train/val split.
    // Dominant language downsampled (en: 20%), the rest kept at 50%;
    // within the sample, bucket%10 assigns 80/20 train/val. The bucket is
    // id arithmetic, so the "sample" is a pushable filter — at 100 TB
    // this is a scan-time row filter, not a shuffle, and the same rows
    // are selected on every rerun. id_sum is a membership checksum.
    "q73_stratified_sample" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val rate = when(col("lang") === "en", lit(200L)).otherwise(lit(500L))
      docs.withColumn("bucket", hashBucket(col("doc_id")))
        .filter(col("bucket") < rate)
        .withColumn("split",
          when(pmod(col("bucket"), lit(10L)) < 8, lit("train")).otherwise(lit("val")))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"))
        .orderBy(col("lang"), col("split"))
    }),

    // ---- q74: int8-style quantization audit over the embedding table —
    // integer-quantized components (the cross-engine-deterministic
    // domain), per-label vector counts, summed abs-max (the scale a
    // quantizer would pick per vector) and the fraction of components
    // that would clip at |q| > 4000. All-integer sums, one explode-free
    // pass: higher-order functions inside the row, agg across rows.
    "q74_embedding_quant" -> ((s, d) => {
      Tables.rebalance(Tables.embeddings(s, d))
        .withColumn("q", expr(
          "transform(embedding, x -> cast(round(cast(x AS double) * 10000, 0) AS bigint))"))
        .select(col("label"),
          expr("array_max(transform(q, v -> abs(v)))").as("absmax"),
          size(col("q")).cast("long").as("n_dims"),
          expr("size(filter(q, v -> abs(v) > 4000))").cast("long").as("n_clip"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
             sum(col("absmax")).as("sum_absmax"),
             round(sum(col("n_clip")).cast("double") / sum(col("n_dims")), 6)
               .as("clipped_frac"))
        .orderBy(col("label"))
    })
  )

  /** Distributed prefix sum: `cum_<valueCol>` = running total of
    * `valueCol` in `orderCol` order, WITHOUT a global single-partition
    * window (`Window.orderBy(x)` alone collapses the whole table into
    * one task — the classic prefix-sum scale trap). Two phases:
    * range-partition on the order column, per-partition running sums,
    * then add each partition's starting offset (one tiny driver-side
    * collect of numPartitions subtotals — aggregates, not data).
    *
    * `partitions <= 0` (the default) sizes the range partitioning from
    * `spark.defaultParallelism`. Offsets rejoin via a broadcast hash
    * join on `_pid` — constant-depth regardless of partition count; the
    * earlier when-chain fold built an O(numPartitions)-deep expression
    * tree, fine at 32 but codegen-hostile at 10k partitions.
    */
  def withRunningTotal(df: DataFrame, orderCol: String, valueCol: String,
                       partitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val nParts =
      if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    // eager checkpoint: repartitionByRange SAMPLES its bounds per job, so
    // the subtotal pass and the result pass could otherwise see different
    // partition assignments — pin one materialization for both
    val parted = df.repartitionByRange(nParts, col(orderCol))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(true)
    val w = Window.partitionBy(col("_pid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = parted.withColumn("_local_cum", sum(col(valueCol)).over(w))
    val totals = withLocal.groupBy(col("_pid"))
      .agg(sum(col(valueCol)).as("_total"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.scanLeft(0L)(_ + _._2).init
    import spark.implicits._
    val offsetDf = totals.map(_._1).zip(offsets).toSeq.toDF("_pid", "_offset")
    withLocal.join(broadcast(offsetDf), "_pid")
      .withColumn(s"cum_$valueCol", col("_local_cum") + col("_offset"))
      .drop("_pid", "_local_cum", "_offset")
  }

  val queries2: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- q81: token-budget shard assignment (sequence packing for
    // training shards): docs in a stable order, running token total,
    // shard = which 4096-token budget window the doc STARTS in. The
    // prefix sum is the two-phase range-partitioned form above — no
    // global single-partition sort anywhere in the plan.
    "q81_token_budget_shards" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_toks"))
      withRunningTotal(toks, "doc_id", "n_toks")
        .withColumn("shard", floor((col("cum_n_toks") - col("n_toks"))
          / lit(4096L)).cast("long"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("shard_toks"),
             min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .orderBy(col("shard"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q81_token_budget_shards" ->
      """WITH toks AS (
        |  SELECT doc_id, len(str_split(text, ' '))::BIGINT AS n_toks
        |  FROM documents),
        |cum AS (
        |  SELECT doc_id, n_toks,
        |    sum(n_toks) OVER (ORDER BY doc_id
        |                      ROWS UNBOUNDED PRECEDING) AS cum_toks
        |  FROM toks)
        |SELECT floor((cum_toks - n_toks) / 4096)::BIGINT AS shard,
        |  count(*) AS n_docs, sum(n_toks)::BIGINT AS shard_toks,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM cum GROUP BY 1 ORDER BY shard""".stripMargin,
    "q72_repetition_quality" ->
      s"""WITH per_gram AS (
        |  SELECT doc_id, gram, count(*) AS c FROM (
        |    SELECT doc_id, unnest($bigramSqlDuck) AS gram
        |    FROM (SELECT doc_id, str_split(text, ' ') AS toks FROM documents)
        |    WHERE len(toks) >= 2)
        |  GROUP BY doc_id, gram)
        |SELECT doc_id, sum(c)::BIGINT AS n_bigrams,
        |  round(max(c)::DOUBLE / sum(c), 6) AS top2_frac,
        |  round(sum(CASE WHEN c > 1 THEN c ELSE 0 END)::DOUBLE / sum(c), 6) AS dup2_frac
        |FROM per_gram GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q73_stratified_sample" ->
      """SELECT lang,
        |  CASE WHEN bucket % 10 < 8 THEN 'train' ELSE 'val' END AS split,
        |  count(*) AS n, sum(doc_id)::BIGINT AS id_sum
        |FROM (SELECT lang, doc_id, (doc_id * 48271 % 2147483647) % 1000 AS bucket
        |      FROM documents)
        |WHERE bucket < (CASE WHEN lang = 'en' THEN 200 ELSE 500 END)
        |GROUP BY 1, 2 ORDER BY lang, split""".stripMargin,

    "q74_embedding_quant" ->
      """SELECT label, count(*) AS n_vecs, sum(absmax)::BIGINT AS sum_absmax,
        |  round(sum(n_clip)::DOUBLE / sum(n_dims), 6) AS clipped_frac
        |FROM (
        |  SELECT label,
        |    list_max(list_transform(q, v -> abs(v))) AS absmax,
        |    len(q) AS n_dims,
        |    len(list_filter(q, v -> abs(v) > 4000)) AS n_clip
        |  FROM (SELECT label,
        |          list_transform(embedding, x -> round(x::DOUBLE * 10000, 0)::BIGINT) AS q
        |        FROM embeddings))
        |GROUP BY label ORDER BY label""".stripMargin
  )
}
