package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** q148 — the DAILY TICK: the engine's LLM-data subsystems composed
  * into the one pipeline a deployment actually runs when an increment
  * of crawl output lands, inside a single oracle hash:
  *
  *   1. INCREMENTAL DEDUP — the batch (last decile) verdicts against
  *      the persisted ledger's PINNED pre-append snapshot (q139's
  *      machinery: exact sha2 + signature-estimated near hits);
  *   2. QUALITY GATE — survivors score through q44's exact formula
  *      (length / diversity / token-count mix, identical IEEE op
  *      order both engines) and lows (< 0.5) drop;
  *   3. TOKENIZE — admitted docs encode with a BPE vocabulary trained
  *      on HISTORY ONLY (the production shape: the tokenizer is an
  *      artifact of yesterday's corpus, applied to today's increment —
  *      never retrained per tick);
  *   4. PACK — admitted subword counts drive the q132 layout (shard,
  *      concatenate, split at PACK_SEQ_LEN) → per-shard stats.
  *
  * Output: one row per pack shard plus a grp=-1 SENTINEL row (the
  * q122 precedent — decisions stay inside the hash even where a stage
  * empties) carrying the stage ledger: batch size, dedup drops,
  * quality drops, admitted count.
  *
  * Scale shape: stages 1–2 are the increment-sized verdict joins
  * (ledger streams, batch broadcasts), stage 3 is row-local over the
  * admitted set, stage 4 is one shard-key shuffle — the tick's cost is
  * proportional to the increment, never the corpus, which is the whole
  * point of the persisted-artifact design (ledger + tokenizer).
  */
object TickOps {

  /** q44's score, verbatim (same expression tree → bit-identical
    * doubles in both engines; proven by the q44 oracle). */
  private def qualityScore(df: DataFrame): DataFrame =
    df.withColumn("toks", split(col("text"), " "))
      .withColumn("n_toks", size(col("toks")))
      .withColumn("n_distinct", size(array_distinct(col("toks"))))
      .withColumn("score", round(
        lit(0.4) * least(col("n_chars") / lit(500.0), lit(1.0)) +
        lit(0.3) * (col("n_distinct") / col("n_toks").cast("double")) +
        lit(0.3) * least(col("n_toks") / lit(80.0), lit(1.0)), 6))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q148_daily_tick" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val cutoff = DedupLedger.cutoffOf(docs)
      val dir = DedupLedger.ensureLedger(s, d)
      val batch = docs.filter(col("doc_id") >= cutoff)
      val verdict = DedupLedger.dedupAgainstLedger(s, batch, dir,
        IndexStore.snapshotAt(dir, 1)).localCheckpoint()
      val keepIds = verdict.filter(col("keep") === 1L).select(col("doc_id"))
      val survivors = batch.join(keepIds, Seq("doc_id"), "left_semi")
      val scored = qualityScore(survivors).localCheckpoint()
      val admitted = scored.filter(col("score") >= 0.5)
        .select(col("doc_id"), col("text")).localCheckpoint()
      // tokenizer = yesterday's artifact: trained on history only
      val merges = BpeOps.trainedMerges(s, d, historyOnly = true)
        .map(m => (m._2, m._3))
      val counted = BpeOps.bpeEncode(admitted, merges)
        .withColumn("n_toks",
          when(expr("char_length(s) < 2"), 0L)
            .otherwise(expr(
              "size(split(substring(s, 2, char_length(s) - 2), ''))")
              .cast("long")))
        .select(col("doc_id"), col("n_toks"))
      val L = TextOps.PACK_SEQ_LEN
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("grp")).orderBy(col("doc_id"))
      val packed = counted
        .withColumn("grp", pmod(col("doc_id"), lit(TextOps.PACK_SHARDS.toLong)))
        .withColumn("fin", sum(col("n_toks")).over(w))
        .withColumn("seq_first", expr(s"(fin - n_toks) div $L"))
        // fin = 0 (a shard prefix of zero-token docs) must not emit
        // sequence -1: Spark's `div` truncates toward zero while
        // DuckDB's `//` floors, so (0-1) would diverge cross-engine
        .withColumn("seq_last",
          when(col("fin") === 0L, 0L).otherwise(expr(s"(fin - 1) div $L")))
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n_docs"),
             sum(col("n_toks")).as("n_tokens"),
             (max(col("seq_last")) + lit(1L)).as("n_seqs"),
             sum(when(col("seq_first") =!= col("seq_last"), 1L)
               .otherwise(0L)).as("n_straddles"),
             ((max(col("seq_last")) + lit(1L)) * L
               - sum(col("n_toks"))).as("pad_tokens"))
      // sentinel: the stage ledger (counts are increment-sized driver
      // reads — the numbers a tick reports to its scheduler)
      val nBatch = batch.count()
      val nSurv = scored.count() // = survivors (scored 1:1, checkpointed)
      val nAdmitted = admitted.count()
      import s.implicits._
      val sentinel = Seq((-1L, nBatch, nBatch - nSurv, nSurv - nAdmitted,
        nAdmitted)).toDF("grp", "n_docs", "n_tokens", "n_seqs", "n_straddles")
        .withColumn("pad_tokens", lit(0L))
      packed.unionByName(sentinel).orderBy(col("grp"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q148_daily_tick" -> {
      val L = TextOps.PACK_SEQ_LEN
      s"""WITH ${DedupLedger.baseDuck},
        |${DedupLedger.survivorsDuck},
        |scored AS (
        |  SELECT d.doc_id, d.text,
        |    round(0.4 * least(n_chars / 500.0, 1.0)
        |      + 0.3 * (len(list_distinct(str_split(text, ' ')))
        |               / len(str_split(text, ' '))::DOUBLE)
        |      + 0.3 * least(len(str_split(text, ' ')) / 80.0, 1.0),
        |      6) AS score
        |  FROM documents d JOIN survivors USING (doc_id)),
        |admitted AS (SELECT doc_id, text FROM scored WHERE score >= 0.5),
        |${BpeOps.trainChainDuck("doc_id < (SELECT c FROM cut)")},
        |${BpeOps.encBaseDuck("admitted")},
        |${BpeOps.encStepsDuck},
        |ntk AS (
        |  SELECT doc_id,
        |    CASE WHEN len(s) < 2 THEN 0
        |         ELSE len(str_split(s[2:len(s) - 1], chr(2) || chr(1)))
        |    END::BIGINT AS n_toks,
        |    doc_id % ${TextOps.PACK_SHARDS} AS grp
        |  FROM e${BpeOps.N_MERGES}),
        |o AS (
        |  SELECT grp, n_toks,
        |    sum(n_toks) OVER (PARTITION BY grp ORDER BY doc_id) AS fin
        |  FROM ntk),
        |packed AS (
        |  SELECT grp, count(*) AS n_docs, sum(n_toks)::BIGINT AS n_tokens,
        |    (max(sl) + 1)::BIGINT AS n_seqs,
        |    sum(CASE WHEN (fin - n_toks) // $L
        |               <> sl THEN 1 ELSE 0 END)::BIGINT
        |      AS n_straddles,
        |    ((max(sl) + 1) * $L - sum(n_toks))::BIGINT
        |      AS pad_tokens
        |  FROM (SELECT grp, n_toks, fin,
        |          CASE WHEN fin = 0 THEN 0 ELSE (fin - 1) // $L END AS sl
        |        FROM o)
        |  GROUP BY grp),
        |sentinel AS (
        |  SELECT -1::BIGINT AS grp,
        |    (SELECT count(*) FROM batch)::BIGINT AS n_docs,
        |    ((SELECT count(*) FROM batch)
        |      - (SELECT count(*) FROM survivors))::BIGINT AS n_tokens,
        |    ((SELECT count(*) FROM survivors)
        |      - (SELECT count(*) FROM admitted))::BIGINT AS n_seqs,
        |    (SELECT count(*) FROM admitted)::BIGINT AS n_straddles,
        |    0::BIGINT AS pad_tokens)
        |SELECT * FROM packed
        |UNION ALL SELECT * FROM sentinel
        |ORDER BY grp""".stripMargin
    }
  )
}
