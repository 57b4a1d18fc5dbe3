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

  /** Word n-gram shingles of width `n` (order-preserving). */
  private def ngramExpr(n: Int): String =
    s"""CASE WHEN size(toks) >= $n THEN
       |  transform(sequence(1, size(toks) - ${n - 1}),
       |            i -> concat_ws(' ', ${(0 until n).map(j =>
                        s"element_at(toks, i + $j)").mkString(", ")}))
       |ELSE array() END""".stripMargin

  private def ngramSqlDuck(n: Int): String =
    s"[${(0 until n).map(j => s"toks[i+$j]").mkString(" || ' ' || ")} " +
      s"FOR i IN range(1, len(toks) - ${n - 2})]"

  private val CONTAM_N = 4  // contamination shingle width (tokens)
  private val BENCH_MOD = 7 // every BENCH_MOD-th doc is the held-out slice

  val queries2: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- q104: the batch file sinks inside the oracle gate (q88's
    // runtime-surface pattern, applied to sink/JobSinks): S5 overwrite
    // writes a JSON snapshot, S6 append-merges an OVERLAPPING second
    // batch into the same dir (docs 100-199 land twice — UNION ALL
    // semantics, duplicates retained, exactly the reference's
    // read-concat-rewrite behavior at O(delta) cost), S7 writes the
    // ingest-date-partitioned parquet zone. Reading every sink back and
    // aggregating proves round-trip fidelity — UTF-8 Chinese with the
    // reference's '、' delimiter survives JSON escape/unescape, append
    // keeps both copies, partition columns stay out of the data — or
    // the hash breaks. Wall-clock-dependent ingest_ts/ingest_date are
    // dropped before aggregation (content columns only).
    "q104_sink_roundtrip" -> ((s, d) => {
      import org.apache.spark.sql.types._
      val zone = graft.jobs.JobRecordGate.freshZone("graft-sink-", d)
      val jsonDir = new java.io.File(zone, "json").getAbsolutePath
      val pqDir = new java.io.File(zone, "pq").getAbsolutePath
      val base = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
                concat(lit("標籤、"), col("lang"), lit("#"), col("doc_id")).as("tag"))
      graft.sink.JobSinks.writeJsonSnapshot(base.filter(col("doc_id") < 200), jsonDir)
      graft.sink.JobSinks.appendJson(
        base.filter(col("doc_id") >= 100 && col("doc_id") < 300), jsonDir)
      graft.sink.JobSinks.writePartitionedParquet(
        base.filter(col("doc_id") < 150), pqDir)
      val jsonSchema = StructType(Seq(
        StructField("doc_id", LongType), StructField("lang", StringType),
        StructField("tag", StringType)))
      def agg(df: DataFrame, stage: String) = df
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"),
             min(col("tag")).as("min_tag"), max(col("tag")).as("max_tag"))
        .withColumn("stage", lit(stage))
      agg(s.read.schema(jsonSchema).json(jsonDir), "json")
        .unionByName(agg(
          s.read.parquet(pqDir).select(col("doc_id"), col("lang"), col("tag")),
          "parquet"))
        .orderBy(col("stage"), col("lang"))
    }),

    // ---- q111: the S8 two-table fan-out sink (test.py:577-580 writes
    // job_list AND com_url from ONE crawl pass) in the gate: fanOut
    // persists once, writes the jobs table and the derived distinct
    // company-URL projection, and both read-backs aggregate — the
    // oracle recomputes the projection (incl. its DISTINCT and
    // null-filter semantics) from the same source. Stages tagged like
    // q104.
    "q111_fanout_roundtrip" -> ((s, d) => {
      val zone = graft.jobs.JobRecordGate.freshZone("graft-fanout-", d)
      val jobsPath = new java.io.File(zone, "jobs").getAbsolutePath
      val comPath = new java.io.File(zone, "com").getAbsolutePath
      val jobs = Tables.documents(s, d).filter(col("doc_id") < 400)
        .select(col("doc_id"), col("lang"),
          // every 4th job shares a company page; every 7th has none
          when(pmod(col("doc_id"), lit(7)) === 0, lit(null).cast("string"))
            .otherwise(concat(lit("https://co.example/c"),
              pmod(col("doc_id"), lit(40))))
            .as("company_url"))
      graft.sink.JobSinks.fanOut(jobs, jobsPath, "company_url", comPath)
      val fromJobs = s.read.parquet(jobsPath)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"),
             count(col("company_url")).as("n_with_url"))
        .withColumn("stage", lit("jobs"))
      val fromCom = s.read.parquet(comPath)
        .agg(count(lit(1)).as("n"),
             min(length(col("company_url"))).cast("long").as("id_sum"),
             count(col("company_url")).as("n_with_url"))
        .withColumn("lang", lit("*")).withColumn("stage", lit("com_url"))
      fromJobs.unionByName(fromCom).orderBy(col("stage"), col("lang"))
    }),

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
    }),

    // ---- q84: C4/Gopher-style document filter chain with REASONS —
    // first failing rule wins (too_short -> low_diversity ->
    // long_tokens -> keep), reported as per-(lang, verdict) counts so a
    // pipeline owner sees what each rule costs. Every signal is
    // row-local integer arithmetic (no floats, no shuffle before the
    // final count): at 100 TB this is a pure scan-shaped pass and the
    // verdict expression pushes into whole-stage codegen.
    "q84_filter_pipeline" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_toks", size(col("toks")).cast("long"))
        .withColumn("n_distinct", size(array_distinct(col("toks"))).cast("long"))
        .withColumn("sum_len",
          expr("aggregate(toks, 0L, (a, t) -> a + length(t))"))
        .withColumn("verdict",
          when(col("n_toks") < 25, "too_short")
            .when(col("n_distinct") * 100 < col("n_toks") * 35, "low_diversity")
            // avg token length > 5.2, as integers: 10*sum > 52*n
            .when(col("sum_len") * 10 > col("n_toks") * 52, "long_tokens")
            .otherwise("keep"))
        .groupBy(col("lang"), col("verdict"))
        .agg(count(lit(1)).as("n"), sum(col("n_toks")).as("toks_affected"))
        .orderBy(col("lang"), col("verdict"))
    }),

    // ---- q85: temperature-balanced language mix (α = 0.5): the
    // pretraining-mix rebalance — rare languages keep everything, the
    // dominant language is deterministically downsampled by
    // sqrt(n_min/n_l). Rates come from one tiny aggregation broadcast
    // back onto the scan; membership is the content-stable md5 bucket,
    // so the SAME documents survive on every rerun and engine. Only
    // correctly-rounded double ops (divide, sqrt, multiply, floor) —
    // no pow(), whose libm implementations differ across engines.
    "q85_temperature_mix" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_l"))
      val minN = counts.agg(min(col("n_l")).as("n_min"))
      val rates = counts.crossJoin(broadcast(minN))
        .withColumn("rate_milli",
          floor(sqrt(col("n_min").cast("double") / col("n_l")) * 1000)
            .cast("long"))
      docs.join(broadcast(rates), "lang")
        .filter(contentBucket(col("text")) < col("rate_milli"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"),
             first(col("n_l")).as("n_total"),
             first(col("rate_milli")).as("rate_milli"))
        .orderBy(col("lang"))
    }),

    // ---- q88: the DSv2 connector inside the correctness gate — write a
    // keyword landing zone THROUGH the connector's two-phase staged
    // commit (one JSON-lines dir per lang), read it back through the
    // connector's scan (directory pruning + typed column extraction),
    // aggregate. The oracle aggregates the original parquet directly, so
    // a bug anywhere in the write/read path (staging renames, JSON
    // serialization, type mapping, keyword tagging) breaks the hash.
    // The zone is rebuilt from scratch each run (deterministic content;
    // append-only sink, so stale files must go first).
    "q88_connector_roundtrip" -> ((s, d) => {
      val zone = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        "graft-zone-" + d.replaceAll("[^A-Za-z0-9.]", "_"))
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(zone)
      Tables.documents(s, d).filter(col("doc_id") < 300)
        .select(col("lang").as("keyword"), col("doc_id"),
                col("n_chars").cast("long").as("n_chars"))
        .write.format("graft-keyword")
        .option("fields", "doc_id:long,n_chars:long")
        .mode("append").save(zone.getAbsolutePath)
      s.read.format("graft-keyword")
        .option("fields", "doc_id:long,n_chars:long")
        .load(zone.getAbsolutePath)
        .groupBy(col("keyword"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"),
             sum(col("n_chars")).as("chars_sum"))
        .orderBy(col("keyword"))
    }),

    // ---- q87: PII redaction, oracle-checked end-to-end — deterministic
    // synthetic PII (doc_id-derived email, a phone, an SSN-style id) is
    // appended to each document, redactPii scrubs it, and the output is
    // per-doc marker counts + redacted length. Patterns are RE2-safe
    // (no lookarounds/backrefs), so the DuckDB mirror runs the SAME
    // regexes — the oracle verifies the actual redaction behavior, not
    // a reimplementation.
    "q87_pii_redaction" -> ((s, d) => {
      def markers(c: Column, m: String) =
        ((length(c) - length(expr(s"replace(clean, '$m', '')"))) / m.length)
          .cast("long")
      Tables.documents(s, d)
        .withColumn("dirty", concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com or +1 555-123-4567 ssn 123-45-"),
          lpad(pmod(col("doc_id"), lit(10000L)).cast("string"), 4, "0")))
        .select(col("doc_id"), redactPii(col("dirty")).as("clean"))
        .select(col("doc_id"),
          markers(col("clean"), "[EMAIL]").as("n_email"),
          markers(col("clean"), "[PHONE]").as("n_phone"),
          markers(col("clean"), "[ID]").as("n_id"),
          length(col("clean")).cast("long").as("len_clean"))
        .orderBy(col("doc_id"))
    }),

    // ---- q86: benchmark-contamination check — documents sharing any
    // 4-token shingle with the held-out "benchmark" slice (every 7th
    // doc_id, the deterministic eval set). The doc-level shingle frame
    // is materialized once (q50 lesson); the benchmark gram set is
    // size-gated broadcast (it grows with SF at 1/97 of the corpus).
    // At 100 TB this is THE decontamination topology: small-side gram
    // set joined against an exploded corpus, no self-join.
    // ---- q147: LEAKAGE-FREE train/val split — decontamination BETWEEN
    // the splits, the evaluation-integrity pass q86 (vs an external
    // benchmark) does not cover: a val document with a near-duplicate
    // in train inflates every eval metric. Split membership is the
    // content-stable bucket (exact duplicates land in the SAME split by
    // construction — only NEAR-dups can leak), leak pairs come from the
    // q49 minhash machinery, and each leaked val doc reports its
    // smallest train partner. At 100 TB this is the q49 pass plus one
    // split join — no new shuffle shape.
    "q147_split_decontam" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val sp = docs
        .withColumn("bucket", contentBucket(col("text")))
        .withColumn("split", when(pmod(col("bucket"), lit(10L)) < 8,
          lit("train")).otherwise(lit("val")))
        .select(col("doc_id"), col("split"))
        .localCheckpoint() // two joins + the val spine read it
      val pairs = graft.ops.DedupOps.minhashLshPairs(
        graft.ops.TextOps.shingled(docs),
        pairBudgetPerDoc = Some(graft.ops.TextOps.PAIR_BUDGET_PER_DOC))
      val leaks = pairs
        .join(sp.select(col("doc_id").as("d1"), col("split").as("s1")), "d1")
        .join(sp.select(col("doc_id").as("d2"), col("split").as("s2")), "d2")
        .filter(col("s1") =!= col("s2"))
        .select(
          when(col("s1") === "val", col("d1")).otherwise(col("d2")).as("doc_id"),
          when(col("s1") === "val", col("d2")).otherwise(col("d1")).as("partner"))
        .groupBy(col("doc_id")).agg(min(col("partner")).as("leaked_of"))
      sp.filter(col("split") === "val").select(col("doc_id"))
        .join(leaks, Seq("doc_id"), "left")
        .withColumn("keep",
          when(col("leaked_of").isNull, 1L).otherwise(0L))
        .orderBy(col("doc_id"))
    }),

    "q86_contamination" -> ((s, d) => {
      val g0 = Tables.rebalance(Tables.documents(s, d))
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"), col("lang"),
                expr(ngramExpr(CONTAM_N)).as("grams"))
        .localCheckpoint()
      val bench = g0.filter(col("doc_id") % BENCH_MOD === 0)
        .select(explode(col("grams")).as("gram")).distinct()
      g0.filter(col("doc_id") % BENCH_MOD =!= 0)
        .select(col("doc_id"), col("lang"), explode(col("grams")).as("gram"))
        .join(ScaleOps.broadcastIfSmall(bench), Seq("gram"), "left_semi")
        .select(col("doc_id"), col("lang")).distinct()
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_contaminated"))
        .orderBy(col("lang"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q104_sink_roundtrip" ->
      """WITH base AS (
        |  SELECT doc_id, lang, '標籤、' || lang || '#' || doc_id AS tag
        |  FROM documents),
        |j AS (
        |  SELECT * FROM base WHERE doc_id < 200
        |  UNION ALL
        |  SELECT * FROM base WHERE doc_id >= 100 AND doc_id < 300),
        |p AS (SELECT * FROM base WHERE doc_id < 150)
        |SELECT * FROM (
        |  SELECT lang, count(*) AS n, sum(doc_id)::BIGINT AS id_sum,
        |    min(tag) AS min_tag, max(tag) AS max_tag, 'json' AS stage
        |  FROM j GROUP BY lang
        |  UNION ALL
        |  SELECT lang, count(*) AS n, sum(doc_id)::BIGINT AS id_sum,
        |    min(tag) AS min_tag, max(tag) AS max_tag, 'parquet' AS stage
        |  FROM p GROUP BY lang)
        |ORDER BY stage, lang""".stripMargin,

    "q111_fanout_roundtrip" ->
      """WITH j AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN doc_id % 7 = 0 THEN NULL
        |         ELSE 'https://co.example/c' || (doc_id % 40) END AS company_url
        |  FROM documents WHERE doc_id < 400),
        |jb AS (
        |  SELECT lang, count(*) AS n, sum(doc_id)::BIGINT AS id_sum,
        |    count(company_url) AS n_with_url, 'jobs' AS stage
        |  FROM j GROUP BY lang),
        |cu AS (SELECT DISTINCT company_url FROM j WHERE company_url IS NOT NULL),
        |cb AS (
        |  SELECT '*' AS lang, count(*) AS n,
        |    min(length(company_url))::BIGINT AS id_sum,
        |    count(company_url) AS n_with_url, 'com_url' AS stage
        |  FROM cu)
        |SELECT * FROM (SELECT * FROM jb UNION ALL SELECT * FROM cb)
        |ORDER BY stage, lang""".stripMargin,

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
        |GROUP BY label ORDER BY label""".stripMargin,

    "q84_filter_pipeline" ->
      """SELECT lang, verdict, count(*) AS n, sum(n_toks)::BIGINT AS toks_affected
        |FROM (
        |  SELECT lang, n_toks,
        |    CASE WHEN n_toks < 25 THEN 'too_short'
        |         WHEN n_distinct * 100 < n_toks * 35 THEN 'low_diversity'
        |         WHEN sum_len * 10 > n_toks * 52 THEN 'long_tokens'
        |         ELSE 'keep' END AS verdict
        |  FROM (SELECT lang, len(toks)::BIGINT AS n_toks,
        |               len(list_distinct(toks))::BIGINT AS n_distinct,
        |               list_sum(list_transform(toks, t -> length(t)))::BIGINT AS sum_len
        |        FROM (SELECT lang, str_split(text, ' ') AS toks FROM documents)))
        |GROUP BY lang, verdict ORDER BY lang, verdict""".stripMargin,

    "q85_temperature_mix" ->
      """WITH counts AS (SELECT lang, count(*) AS n_l FROM documents GROUP BY lang),
        |mn AS (SELECT min(n_l) AS n_min FROM counts),
        |rates AS (
        |  SELECT lang, n_l,
        |    floor(sqrt(n_min::DOUBLE / n_l) * 1000)::BIGINT AS rate_milli
        |  FROM counts CROSS JOIN mn)
        |SELECT d.lang AS lang, count(*) AS n_kept,
        |  any_value(n_l) AS n_total, any_value(rate_milli) AS rate_milli
        |FROM documents d JOIN rates r ON d.lang = r.lang
        |WHERE ('0x' || substr(md5(d.text), 1, 8))::BIGINT % 1000 < rate_milli
        |GROUP BY d.lang ORDER BY lang""".stripMargin,

    "q88_connector_roundtrip" ->
      """SELECT lang AS keyword, count(*) AS n, sum(doc_id)::BIGINT AS id_sum,
        |  sum(n_chars)::BIGINT AS chars_sum
        |FROM documents WHERE doc_id < 300
        |GROUP BY lang ORDER BY keyword""".stripMargin,

    "q87_pii_redaction" ->
      """WITH dirty AS (
        |  SELECT doc_id,
        |    text || ' contact user' || doc_id ||
        |    '@example.com or +1 555-123-4567 ssn 123-45-' ||
        |    lpad((doc_id % 10000)::VARCHAR, 4, '0') AS dirty
        |  FROM documents),
        |clean AS (
        |  SELECT doc_id,
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(dirty,
        |          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |        '\+?\d{1,3}[ .-]?\(?\d{2,4}\)?[ .-]?\d{3,4}[ .-]?\d{3,4}', '[PHONE]', 'g'),
        |      '\b\d{3}-\d{2}-\d{4}\b', '[ID]', 'g') AS clean
        |  FROM dirty)
        |SELECT doc_id,
        |  ((length(clean) - length(replace(clean, '[EMAIL]', ''))) / 7)::BIGINT AS n_email,
        |  ((length(clean) - length(replace(clean, '[PHONE]', ''))) / 7)::BIGINT AS n_phone,
        |  ((length(clean) - length(replace(clean, '[ID]', ''))) / 4)::BIGINT AS n_id,
        |  length(clean)::BIGINT AS len_clean
        |FROM clean ORDER BY doc_id""".stripMargin,

    "q147_split_decontam" ->
      s"""WITH ${graft.ops.DedupOps.minhashPairsDuck("documents", 1000)},
        |sp AS (
        |  SELECT doc_id,
        |    CASE WHEN (('0x' || substr(md5(text), 1, 8))::BIGINT % 1000) % 10 < 8
        |         THEN 'train' ELSE 'val' END AS split
        |  FROM documents),
        |x AS (
        |  SELECT CASE WHEN sa.split = 'val' THEN p.d1 ELSE p.d2 END AS doc_id,
        |         CASE WHEN sa.split = 'val' THEN p.d2 ELSE p.d1 END AS partner
        |  FROM mh_pairs p
        |  JOIN sp sa ON sa.doc_id = p.d1
        |  JOIN sp sb ON sb.doc_id = p.d2
        |  WHERE sa.split <> sb.split),
        |lk AS (SELECT doc_id, min(partner) AS leaked_of FROM x GROUP BY doc_id)
        |SELECT s.doc_id, lk.leaked_of,
        |  CASE WHEN lk.leaked_of IS NULL THEN 1 ELSE 0 END::BIGINT AS keep
        |FROM sp s LEFT JOIN lk USING (doc_id)
        |WHERE s.split = 'val' ORDER BY s.doc_id""".stripMargin,

    "q86_contamination" ->
      s"""WITH t AS (SELECT doc_id, lang, str_split(text, ' ') AS toks FROM documents),
        |g AS (SELECT doc_id, lang, unnest(${ngramSqlDuck(CONTAM_N)}) AS gram
        |      FROM t WHERE len(toks) >= $CONTAM_N),
        |bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % $BENCH_MOD = 0),
        |hits AS (
        |  SELECT DISTINCT g.doc_id, g.lang
        |  FROM g JOIN bench USING (gram) WHERE doc_id % $BENCH_MOD <> 0)
        |SELECT lang, count(*) AS n_contaminated
        |FROM hits GROUP BY lang ORDER BY lang""".stripMargin
  )
}
