package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Reference-parity projection / cleaning / pivot / map operators
  * (SURVEY.md §2.2 P1-P13, §2.3 kv-pivot, §2.4 A1-A7), re-expressed over
  * the driver fixture tables. Everything is built from codegen'd
  * built-ins (`functions._`) — no UDFs — so column pruning and predicate
  * pushdown stay effective and the whole stage compiles to one
  * WholeStageCodegen span.
  *
  * Reference citations are to /root/reference/test.py (see SURVEY.md).
  */
object Cleaning {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- q21: attribute projection + trim (P1/P2, test.py:168-173).
    "q21_project_trim" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
                length(trim(col("text"))).cast("long").as("text_len"),
                upper(substring(col("text"), 1, 12)).as("head_upper"))
        .orderBy(col("doc_id"))
    }),

    // ---- q22: literal strip via regexp_replace (P3, test.py:187,199).
    "q22_regex_replace" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
                length(regexp_replace(col("text"), "[aeiou]", "")).cast("long").as("consonant_len"),
                substring(regexp_replace(col("text"), "(table|row)", "T"), 1, 30).as("head_replaced"))
        .orderBy(col("doc_id"))
    }),

    // ---- q23: textual-range extraction "0~5" -> int bounds
    // (P4, test.py:196-199 — applicants "應徵人數 0~5 人").
    "q23_range_extract" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("raw", concat(lit("應徵人數 "), col("doc_id"),
                                  lit("~"), col("doc_id") + lit(5), lit(" 人")))
        .select(col("doc_id"),
                regexp_extract(col("raw"), "(\\d+)~(\\d+)", 0).as("range_text"),
                regexp_extract(col("raw"), "(\\d+)~(\\d+)", 1).cast("long").as("lo"),
                regexp_extract(col("raw"), "(\\d+)~(\\d+)", 2).cast("long").as("hi"))
        .orderBy(col("doc_id"))
    }),

    // ---- q24: existence -> "是"/"否" flag (P5, test.py:190-194).
    "q24_exists_flag" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("actively",
          when(col("event_type") === "purchase", "是").otherwise("否"))
        .groupBy(col("actively")).agg(count(lit(1)).as("n"))
        .orderBy(col("actively"))
    }),

    // ---- q25: default-on-missing via coalesce/nullif (P6, test.py:201-204).
    "q25_null_default" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("first_stream",
          coalesce(nullif(regexp_extract(col("text"), "(stream)", 1), lit("")),
                   lit("N/A")))
        .groupBy(col("first_stream")).agg(count(lit(1)).as("n"))
        .orderBy(col("first_stream"))
    }),

    // ---- q26: URL key extraction + URL construction (P7/P8,
    // test.py:417-419 — apply_code from job_url, analysis URL rebuild).
    "q26_url_key" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("job_url", concat(lit("https://jobs.example/job/j"),
                                      col("doc_id"), lit("?src="), col("source")))
        .withColumn("apply_code",
          regexp_extract(col("job_url"), "/([^/?]+)(\\?.*)?$", 1))
        .select(col("doc_id"), col("apply_code"),
                concat(lit("https://jobs.example/analysis/"), col("apply_code"))
                  .as("analysis_url"))
        .orderBy(col("doc_id"))
    }),

    // ---- q27: positional selection — nth / last token (element_at;
    // benefits nth-child selection, test.py:379,386).
    "q27_positional_token" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"),
                element_at(col("toks"), 3).as("third_tok"),
                element_at(col("toks"), -1).as("last_tok"),
                size(col("toks")).cast("long").as("n_toks"))
        .orderBy(col("doc_id"))
    }),

    // ---- q28: collect + delimiter-join (A1/A2, test.py:209,335,408) —
    // sorted for determinism, '、'-joined like the reference.
    "q28_collect_join" -> ((s, d) => {
      Tables.documents(s, d)
        .groupBy(col("lang"))
        .agg(array_join(array_sort(collect_set(col("source"))), "、").as("sources"),
             count(lit(1)).as("n_docs"))
        .orderBy(col("lang"))
    }),

    // ---- q100: A2's newline-join form (test.py:408 joins the welfare
    // list with '\n') — the same collect+join aggregation as q28 under
    // the reference's other delimiter, grouped the other way (langs per
    // source). Embedded newlines survive the gate: they live inside a
    // single VARCHAR value on both engines.
    "q100_newline_join" -> ((s, d) => {
      Tables.documents(s, d)
        .groupBy(col("source"))
        .agg(array_join(array_sort(collect_set(col("lang"))), "\n").as("langs"),
             count(lit(1)).as("n_docs"))
        .orderBy(col("source"))
    }),

    // ---- q29: the dominant reference pattern — key->value long-to-wide
    // pivot with first-match semantics (§2.3, test.py:217-374). One
    // shuffle computes all keys; first-match = min_by on a unique
    // ordering column (the reference's document order).
    "q29_kv_pivot_first" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(min_by(col("value"), col("event_id")))
        .orderBy(col("user_id"))
    }),

    // ---- q30: zip-to-map / map_from_entries roundtrip (A3, test.py:425-431):
    // build a source->count map per lang, then read it back via
    // element_at + size. Map keys sorted for hash stability (§7 risks).
    "q30_map_entries" -> ((s, d) => {
      Tables.documents(s, d)
        .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("n"))
        .groupBy(col("lang"))
        .agg(map_from_entries(sort_array(collect_list(struct(col("source"), col("n")))))
             .as("m"))
        .select(col("lang"),
                size(col("m")).cast("long").as("n_sources"),
                element_at(col("m"), "src0").as("src0_n"))
        .orderBy(col("lang"))
    }),

    // ---- q31: str_to_map line-split parsing (A4, test.py:42-50 — chart
    // line "25-29歲\n14%" ≙ compact JSON "{\"k\": 87}" here).
    "q31_str_to_map" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("m", expr("str_to_map(regexp_replace(props, '[{}\" ]', ''), ',', ':')"))
        .withColumn("k", element_at(col("m"), "k").cast("long"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n"))
        .orderBy(col("event_type"))
    }),

    // ---- q32: row-quality predicate — count "bad" field indicators per
    // row, flag > threshold (P12, test.py:548-549).
    "q32_row_quality" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_flags",
          when(col("n_chars") < 150, 1).otherwise(0) +
          when(size(col("toks")) < 25, 1).otherwise(0) +
          when(size(array_distinct(col("toks"))) * 100 < size(col("toks")) * 35, 1).otherwise(0))
        .withColumn("is_bad", when(col("n_flags") > 1, "error").otherwise("ok"))
        .groupBy(col("n_flags"), col("is_bad")).agg(count(lit(1)).as("n"))
        .orderBy(col("n_flags"))
    }),

    // ---- q33: JSON column ops — get_json_object over events.props
    // (§2.9 JSON ops; the reference's nested-dict parsing analog).
    "q33_json_extract" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"),
             min(col("k")).as("min_k"),
             max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    }),

    // ---- q34: deterministic LIMIT (P13, test.py:88-90,165 test-mode caps).
    "q34_limit_scan" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"))
        .orderBy(col("event_id"))
        .limit(5)
    }),

    // ---- q82: A5 gender map (test.py:436-449) — stacked-bar styles
    // classified male/female by the ±5-per-channel RGB tolerance
    // predicate, collected into a per-job map. Fixture bars derive
    // deterministically from doc_id: pos 0 perturbs the male target
    // color by dr ∈ [-6, 6], pos 1 the female target, pos 2 never
    // matches — |dr| = 6 falls outside the tolerance, so jobs carry
    // 0-2 map entries and the filter path is exercised. Map emitted as
    // sorted entries (SURVEY §5 map-hash rule).
    "q82_gender_map" -> ((s, d) => {
      val bars = Tables.documents(s, d).filter(col("doc_id") < 200)
        .select(col("doc_id").as("job_id"),
                explode(sequence(lit(0), lit(2))).as("pos"))
        .withColumn("dr", pmod(col("job_id") * 7 + col("pos") * 11, lit(13)) - 6)
        .withColumn("style", concat(lit("width: 30%; background-color: "),
          when(col("pos") === 0,
               concat(lit("rgb("), lit(78) + col("dr"), lit(", 145, 255)")))
          .when(col("pos") === 1,
               concat(lit("rgb(255, "), lit(144) + col("dr"), lit(", 199)")))
          .otherwise(lit("rgb(10, 20, 30)"))))
        .withColumn("text",
          concat(pmod(col("job_id") * 3 + col("pos") * 17, lit(100)), lit("%")))
      // Sorted entries serialized to ONE scalar string ("k=v|k=v"): the
      // driver's comparator hashes scalar cells only (array<struct> made
      // q82/q83 error in round 3 — VERDICT r3 #1). Map keys are unique,
      // so sorting by key is total and both engines agree byte-for-byte.
      graft.jobs.JobOps.genderMap(bars)
        .select(col("job_id"),
                expr("array_join(transform(sort_array(map_entries(gender)), " +
                     "e -> concat(e.key, '=', e.value)), '|')").as("gender_entries"))
        .orderBy(col("job_id"))
    }),

    // ---- q83: A6 language map (test.py:453-488) — per language, each
    // bar's background color decodes to a proficiency level (exact
    // legend lookup, 未知 default), "level+pct" strings join with commas
    // in bar order, languages fold into a per-job map. Fixture: two
    // languages x two bars per job; the legend index cycles through all
    // four known colors plus one unknown.
    "q83_language_map" -> ((s, d) => {
      val legend = array(lit("rgb(200, 200, 200)"), lit("rgb(151, 195, 255)"),
                         lit("rgb(102, 165, 255)"), lit("rgb(41, 128, 255)"),
                         lit("rgb(7, 7, 7)"))
      val bars = Tables.documents(s, d).filter(col("doc_id") < 100)
        .select(col("doc_id").as("job_id"),
                posexplode(array(lit("英文"), lit("日文"))).as(Seq("li", "lang")))
        .select(col("job_id"), col("li"), col("lang"),
                explode(sequence(lit(0), lit(1))).as("pos"))
        .withColumn("ci",
          pmod(col("job_id") * 5 + col("pos") * 3 + col("li") * 7, lit(5)))
        .withColumn("style",
          concat(lit("background-color: "),
                 element_at(legend, col("ci").cast("int") + 1)))
        .withColumn("text",
          concat(pmod(col("job_id") + col("pos") * 29, lit(100)), lit("%")))
      // Same scalar-string serialization as q82 (driver-gate hashability).
      graft.jobs.JobOps.languageMap(bars)
        .select(col("job_id"),
                expr("array_join(transform(sort_array(map_entries(language_skills)), " +
                     "e -> concat(e.key, '=', e.value)), '|')").as("skills_entries"))
        .orderBy(col("job_id"))
    }),

    // ---- q89: A7 title-dispatched chart extraction (test.py:491-512) —
    // the reference routes each analysis chart through ONE extractor by
    // its title; here two charts per job dispatch onto a 5-title legend,
    // each chart carrying three "bucket\npct" lines of which every third
    // is malformed (single part) and must be dropped (test.py:42-50,57).
    // Output: per (job, title), sorted chart-map entries serialized to a
    // scalar string (driver-gate hashability, same as q82/q83).
    "q89_chart_map" -> ((s, d) => {
      val titles = array(lit("年齡"), lit("學歷"), lit("工作經歷"),
                         lit("語言條件"), lit("科系"))
      val base = Tables.documents(s, d).filter(col("doc_id") < 150)
        .select(col("doc_id").as("job_id"),
                explode(sequence(lit(0), lit(1))).as("c"))
        .withColumn("ti", pmod(col("job_id") * 2 + col("c"), lit(5)))
        .withColumn("title", element_at(titles, col("ti").cast("int") + 1))
        .select(col("job_id"), col("c"), col("title"),
                explode(sequence(lit(0), lit(2))).as("pos"))
        .withColumn("line",
          when(pmod(col("job_id") + col("c") + col("pos"), lit(3)) === 0,
               concat(lit("bad"), col("pos")))
          .otherwise(concat(lit("b"), col("pos"), lit("歲"), lit("\n"),
                            pmod(col("job_id") * 7 + col("c") * 5 + col("pos") * 13,
                                 lit(100)),
                            lit("%"))))
      graft.jobs.JobOps.chartMap(base, "job_id", "title", "line")
        .select(col("job_id"), col("title"),
                expr("array_join(transform(sort_array(map_entries(m)), " +
                     "e -> concat(e.key, '=', e.value)), '|')").as("entries"))
        .orderBy(col("job_id"), col("title"))
    }),

    // ---- q35: timestamp part extraction (update-date handling analog,
    // test.py:185-188; emitted as ints, never raw timestamps).
    "q35_date_parts" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("h", hour(col("ts")))
        .withColumn("dom", dayofmonth(col("ts")))
        .groupBy(col("h")).agg(count(lit(1)).as("n"),
                               countDistinct(col("dom")).as("n_days"))
        .orderBy(col("h"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q21_project_trim" ->
      """SELECT doc_id, length(trim(text)) AS text_len,
        |  upper(substr(text, 1, 12)) AS head_upper
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q22_regex_replace" ->
      """SELECT doc_id,
        |  length(regexp_replace(text, '[aeiou]', '', 'g')) AS consonant_len,
        |  substr(regexp_replace(text, '(table|row)', 'T', 'g'), 1, 30) AS head_replaced
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q23_range_extract" ->
      """SELECT doc_id,
        |  regexp_extract(raw, '(\d+)~(\d+)', 0) AS range_text,
        |  regexp_extract(raw, '(\d+)~(\d+)', 1)::BIGINT AS lo,
        |  regexp_extract(raw, '(\d+)~(\d+)', 2)::BIGINT AS hi
        |FROM (SELECT doc_id, '應徵人數 ' || doc_id || '~' || (doc_id + 5) || ' 人' AS raw
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "q24_exists_flag" ->
      """SELECT CASE WHEN event_type = 'purchase' THEN '是' ELSE '否' END AS actively,
        |  count(*) AS n
        |FROM events GROUP BY 1 ORDER BY actively""".stripMargin,

    "q25_null_default" ->
      """SELECT coalesce(nullif(regexp_extract(text, '(stream)', 1), ''), 'N/A') AS first_stream,
        |  count(*) AS n
        |FROM documents GROUP BY 1 ORDER BY first_stream""".stripMargin,

    "q26_url_key" ->
      """SELECT doc_id,
        |  regexp_extract(job_url, '/([^/?]+)(\?.*)?$', 1) AS apply_code,
        |  'https://jobs.example/analysis/' || regexp_extract(job_url, '/([^/?]+)(\?.*)?$', 1) AS analysis_url
        |FROM (SELECT doc_id, 'https://jobs.example/job/j' || doc_id || '?src=' || source AS job_url
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "q27_positional_token" ->
      """SELECT doc_id, toks[3] AS third_tok, toks[-1] AS last_tok,
        |  len(toks) AS n_toks
        |FROM (SELECT doc_id, str_split(text, ' ') AS toks FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "q28_collect_join" ->
      """SELECT lang, string_agg(DISTINCT source, '、' ORDER BY source) AS sources,
        |  count(*) AS n_docs
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q100_newline_join" ->
      """SELECT source, string_agg(DISTINCT lang, chr(10) ORDER BY lang) AS langs,
        |  count(*) AS n_docs
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q29_kv_pivot_first" ->
      """SELECT user_id,
        |  arg_min(value, event_id) FILTER (WHERE event_type = 'click') AS click,
        |  arg_min(value, event_id) FILTER (WHERE event_type = 'error') AS error,
        |  arg_min(value, event_id) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  arg_min(value, event_id) FILTER (WHERE event_type = 'signup') AS signup,
        |  arg_min(value, event_id) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q30_map_entries" ->
      """SELECT lang, count(DISTINCT source) AS n_sources,
        |  nullif(count(*) FILTER (WHERE source = 'src0'), 0) AS src0_n
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q31_str_to_map" ->
      """SELECT event_type,
        |  sum(regexp_extract(props, '([0-9]+)', 1)::BIGINT)::BIGINT AS sum_k,
        |  count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q32_row_quality" ->
      """SELECT n_flags, CASE WHEN n_flags > 1 THEN 'error' ELSE 'ok' END AS is_bad,
        |  count(*) AS n
        |FROM (
        |  SELECT (CASE WHEN n_chars < 150 THEN 1 ELSE 0 END)
        |       + (CASE WHEN len(toks) < 25 THEN 1 ELSE 0 END)
        |       + (CASE WHEN len(list_distinct(toks)) * 100 < len(toks) * 35 THEN 1 ELSE 0 END) AS n_flags
        |  FROM (SELECT n_chars, str_split(text, ' ') AS toks FROM documents))
        |GROUP BY n_flags ORDER BY n_flags""".stripMargin,

    "q33_json_extract" ->
      """SELECT event_type, sum(k)::BIGINT AS sum_k, min(k) AS min_k, max(k) AS max_k
        |FROM (SELECT event_type, (props::JSON ->> 'k')::BIGINT AS k FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q34_limit_scan" ->
      """SELECT event_id, user_id, event_type FROM events
        |ORDER BY event_id LIMIT 5""".stripMargin,

    "q35_date_parts" ->
      """SELECT extract(hour FROM ts)::INT AS h, count(*) AS n,
        |  count(DISTINCT extract(day FROM ts)) AS n_days
        |FROM events GROUP BY 1 ORDER BY h""".stripMargin,

    "q82_gender_map" ->
      """WITH bars AS (
        |  SELECT doc_id AS job_id, pos,
        |    (doc_id * 7 + pos * 11) % 13 - 6 AS dr,
        |    ((doc_id * 3 + pos * 17) % 100) || '%' AS text
        |  FROM documents CROSS JOIN (SELECT unnest(range(0, 3)) AS pos) p
        |  WHERE doc_id < 200),
        |styled AS (
        |  SELECT job_id, text,
        |    CASE WHEN pos = 0 THEN 'rgb(' || (78 + dr) || ', 145, 255)'
        |         WHEN pos = 1 THEN 'rgb(255, ' || (144 + dr) || ', 199)'
        |         ELSE 'rgb(10, 20, 30)' END AS rgbs
        |  FROM bars),
        |parsed AS (
        |  SELECT job_id, text,
        |    regexp_extract(rgbs, 'rgb\((\d+), (\d+), (\d+)\)', 1)::INT AS r,
        |    regexp_extract(rgbs, 'rgb\((\d+), (\d+), (\d+)\)', 2)::INT AS g,
        |    regexp_extract(rgbs, 'rgb\((\d+), (\d+), (\d+)\)', 3)::INT AS b
        |  FROM styled),
        |keyed AS (
        |  SELECT job_id, text,
        |    CASE WHEN abs(r - 78) <= 5 AND abs(g - 145) <= 5 AND abs(b - 255) <= 5
        |           THEN '男性'
        |         WHEN abs(r - 255) <= 5 AND abs(g - 144) <= 5 AND abs(b - 199) <= 5
        |           THEN '女性' END AS gender_key
        |  FROM parsed)
        |SELECT job_id,
        |  string_agg(gender_key || '=' || text, '|' ORDER BY gender_key)
        |    AS gender_entries
        |FROM keyed WHERE gender_key IS NOT NULL
        |GROUP BY job_id ORDER BY job_id""".stripMargin,

    "q83_language_map" ->
      """WITH bars AS (
        |  SELECT doc_id AS job_id, l.lang AS bar_lang, li, pos,
        |    (doc_id * 5 + pos * 3 + li * 7) % 5 AS ci,
        |    ((doc_id + pos * 29) % 100) || '%' AS text
        |  FROM documents
        |  CROSS JOIN (SELECT unnest(['英文', '日文']) AS lang, unnest([0, 1]) AS li) l
        |  CROSS JOIN (SELECT unnest(range(0, 2)) AS pos) p
        |  WHERE doc_id < 100),
        |styled AS (
        |  SELECT job_id, bar_lang, pos, text,
        |    ['rgb(200, 200, 200)', 'rgb(151, 195, 255)', 'rgb(102, 165, 255)',
        |     'rgb(41, 128, 255)', 'rgb(7, 7, 7)'][(ci + 1)::INT] AS bg
        |  FROM bars),
        |lev AS (
        |  SELECT job_id, bar_lang, pos,
        |    CASE bg WHEN 'rgb(200, 200, 200)' THEN '不會'
        |            WHEN 'rgb(151, 195, 255)' THEN '略懂'
        |            WHEN 'rgb(102, 165, 255)' THEN '中等'
        |            WHEN 'rgb(41, 128, 255)' THEN '精通'
        |            ELSE '未知' END || text AS level_pct
        |  FROM styled),
        |per_lang AS (
        |  SELECT job_id, bar_lang, string_agg(level_pct, ',' ORDER BY pos) AS levels
        |  FROM lev GROUP BY job_id, bar_lang)
        |SELECT job_id,
        |  string_agg(bar_lang || '=' || levels, '|' ORDER BY bar_lang)
        |    AS skills_entries
        |FROM per_lang GROUP BY job_id ORDER BY job_id""".stripMargin,

    "q89_chart_map" ->
      """WITH base AS (
        |  SELECT doc_id AS job_id, c, pos,
        |    ['年齡', '學歷', '工作經歷', '語言條件', '科系']
        |      [((doc_id * 2 + c) % 5)::INT + 1] AS title,
        |    CASE WHEN (doc_id + c + pos) % 3 = 0 THEN 'bad' || pos
        |         ELSE 'b' || pos || '歲' || chr(10) ||
        |              ((doc_id * 7 + c * 5 + pos * 13) % 100) || '%' END AS line
        |  FROM documents
        |  CROSS JOIN (SELECT unnest(range(0, 2)) AS c) cc
        |  CROSS JOIN (SELECT unnest(range(0, 3)) AS pos) pp
        |  WHERE doc_id < 150),
        |parts AS (
        |  SELECT job_id, title, str_split(line, chr(10)) AS p FROM base),
        |valid AS (
        |  SELECT job_id, title, p[1] AS key, p[2] AS value
        |  FROM parts WHERE len(p) = 2)
        |SELECT job_id, title,
        |  string_agg(key || '=' || value, '|' ORDER BY key) AS entries
        |FROM valid GROUP BY job_id, title ORDER BY job_id, title""".stripMargin
  )
}
