package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Built-in function-family coverage (north-star "complete library"
  * breadth): date/time parts, string kernel, array kernel — each family
  * as one oracle-checked query over the fixtures.
  */
object FunctionFamilies {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- q146: Unicode normalization as NATIVE codegen Expressions
    // (functions/NormalizeExpressions.scala) — the fold a corpus
    // pipeline applies before any hash-based dedup (NFC: composed vs
    // combining byte sequences hash apart) and before lexical search
    // (accent strip). The fixture text is ASCII, so the gate binds the
    // IDENTITY regime (any corruption in the expressions moves h_strip);
    // the transform regime (planted combining marks / accents) is
    // pinned in ExtensionsSpec against java.text.Normalizer semantics.
    "q146_text_normalize" -> ((s, d) => {
      import graft.functions.TextNormFunctions.{nfcNormalize, stripAccents}
      graft.Tables.documents(s, d).select(col("doc_id"),
          when(nfcNormalize(col("text")) === col("text"), 1L).otherwise(0L)
            .as("nfc_stable"),
          md5(stripAccents(col("text")).cast("binary")).as("h_strip"))
        .orderBy(col("doc_id"))
    }),

    // ---- q69: date/time function family over o_orderdate.
    "q69_date_functions" -> ((s, d) => {
      Tables.orders(s, d)
        .withColumn("y", year(col("o_orderdate")))
        .withColumn("q", quarter(col("o_orderdate")))
        .withColumn("dom", dayofmonth(col("o_orderdate")))
        .withColumn("days_since_2000",
          datediff(col("o_orderdate"), to_date(lit("2000-01-01"))).cast("long"))
        .withColumn("month_len", dayofmonth(last_day(col("o_orderdate"))))
        .groupBy(col("y"), col("q"))
        .agg(count(lit(1)).as("n"),
             min(col("days_since_2000")).as("min_days"),
             max(col("days_since_2000")).as("max_days"),
             max(col("month_len")).as("max_month_len"),
             min(col("dom")).as("min_dom"))
        .orderBy(col("y"), col("q"))
    }),

    // ---- q70: string kernel — pad/pos/translate/reverse/repeat/slice.
    "q70_string_functions" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          lpad(col("source"), 8, "0").as("padded"),
          substring(col("source"), -2, 2).as("tail2"),
          instr(col("source"), "c").cast("long").as("pos_c"),
          translate(col("source"), "sr", "XY").as("translated"),
          reverse(col("source")).as("rev"),
          repeat(substring(col("source"), 1, 1), 3).as("rep"),
          concat(upper(col("lang")), lit("/"), lower(col("source"))).as("tagged"))
        .orderBy(col("doc_id"))
    }),

    // ---- q71: array kernel — slice/position/contains/union/sort.
    "q71_array_functions" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"),
          array_join(slice(col("toks"), 1, 5), ",").as("first5"),
          array_position(col("toks"), "the").as("pos_the"),
          array_contains(col("toks"), "data").as("has_data"),
          size(array_union(col("toks"), array(lit("zz1"), lit("zz2"))))
            .cast("long").as("n_union"),
          element_at(array_sort(col("toks")), 3).as("sorted3"))
        .orderBy(col("doc_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q146_text_normalize" ->
      """SELECT doc_id,
        |  CASE WHEN nfc_normalize(text) = text THEN 1 ELSE 0 END::BIGINT
        |    AS nfc_stable,
        |  md5(strip_accents(text)) AS h_strip
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q69_date_functions" ->
      """SELECT year(o_orderdate)::INT AS y, quarter(o_orderdate)::INT AS q,
        |  count(*) AS n,
        |  min(date_diff('day', DATE '2000-01-01', o_orderdate::DATE))::BIGINT AS min_days,
        |  max(date_diff('day', DATE '2000-01-01', o_orderdate::DATE))::BIGINT AS max_days,
        |  max(day(last_day(o_orderdate::DATE)))::INT AS max_month_len,
        |  min(day(o_orderdate))::INT AS min_dom
        |FROM orders GROUP BY 1, 2 ORDER BY y, q""".stripMargin,

    "q70_string_functions" ->
      """SELECT doc_id, lpad(source, 8, '0') AS padded,
        |  right(source, 2) AS tail2,
        |  strpos(source, 'c')::BIGINT AS pos_c,
        |  translate(source, 'sr', 'XY') AS translated,
        |  reverse(source) AS rev,
        |  repeat(left(source, 1), 3) AS rep,
        |  upper(lang) || '/' || lower(source) AS tagged
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q71_array_functions" ->
      """SELECT doc_id,
        |  array_to_string(toks[1:5], ',') AS first5,
        |  list_position(toks, 'the')::BIGINT AS pos_the,
        |  list_contains(toks, 'data') AS has_data,
        |  len(list_distinct(list_concat(toks, ['zz1', 'zz2'])))::BIGINT AS n_union,
        |  list_sort(toks)[3] AS sorted3
        |FROM (SELECT doc_id, str_split(text, ' ') AS toks FROM documents)
        |ORDER BY doc_id""".stripMargin
  )
}
