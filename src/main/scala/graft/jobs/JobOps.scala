package graft.jobs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.RgbFunctions

/** The reference crawler's transformations as reusable DataFrame
  * operators (SURVEY.md §2.2-§2.4). Each function is a pure plan
  * transformation — no actions, no driver-side loops — so pipelines
  * compose lazily and Catalyst optimizes across operator boundaries.
  */
object JobOps {

  // ---------- P2/P3: cleaning ----------

  /** "更新2025/03/01" -> "2025/03/01" (test.py:187). */
  def cleanUpdateDate(c: Column): Column = trim(regexp_replace(c, "更新", ""))

  /** "應徵人數 0~5 人" -> "0~5"; missing -> "N/A" (test.py:196-204). */
  def cleanApplicants(c: Column): Column =
    coalesce(nullif(trim(regexp_replace(c, "應徵人數|人", "")), lit("")), lit("N/A"))

  /** P4: split a textual range "0~5" into int bounds for queryability. */
  def rangeBounds(c: Column): (Column, Column) =
    (regexp_extract(c, "(\\d+)~(\\d+)", 1).cast("long"),
     regexp_extract(c, "(\\d+)~(\\d+)", 2).cast("long"))

  /** P5: presence flag — tag text equals the literal -> 是/否
    * (test.py:190-194), null-safe.
    */
  def activelyHiringFlag(tag: Column): Column =
    when(coalesce(tag, lit("")) === "積極徵才中", "是").otherwise("否")

  /** P7/P8: job URL -> apply code -> analysis URL (test.py:417-419). */
  def applyCode(jobUrl: Column): Column =
    regexp_extract(jobUrl, "/([^/?]+)(\\?.*)?$", 1)
  def analysisUrl(code: Column): Column =
    concat(lit("https://www.104.com.tw/jobs/apply/analysis/"), code)

  // ---------- §2.3: the kv-pivot ----------

  /** The dominant reference pattern: 14 sequential first-match scans over
    * label/value rows (test.py:217-374) collapsed into ONE grouped pivot —
    * one shuffle computes every label. First-match = min_by(value, pos)
    * (reference takes the first DOM-ordered hit and breaks); multi-valued
    * labels '、'-join their values in document order instead
    * (test.py:335,347,359).
    *
    * Input: long rows (id, pos, label, value); output: one wide row per id
    * with a column per label in [[JobSchema.detailLabels]].
    */
  def kvPivotFirst(long: DataFrame, idCol: String = "job_id"): DataFrame = {
    val firstAgg = min_by(col("value"), col("pos"))
    val joinedAgg = array_join(
      expr("transform(array_sort(collect_list(struct(pos, value))), x -> x.value)"),
      "、")
    // pivot computes both variants per label in the same single shuffle;
    // the projection below picks the right one for each label
    val pivoted = long
      .groupBy(col(idCol))
      .pivot("label", JobSchema.detailLabels.map(_._1))
      .agg(firstAgg.as("first"), joinedAgg.as("joined"))
    // select the right variant per label, renamed to engine column names
    val cols = col(idCol) +: JobSchema.detailLabels.map { case (label, name) =>
      val variant = if (JobSchema.multiValuedLabels(label)) "joined" else "first"
      col(s"`${label}_$variant`").as(name)
    }
    pivoted.select(cols: _*)
  }

  // ---------- §2.4: analysis-map constructors ----------

  /** A4: chart line "25-29歲\n14%" -> (bucket, pct); lines without exactly
    * two parts are dropped (test.py:42-50,57).
    */
  def chartLineEntry(line: Column): Column = {
    val parts = split(line, "\n")
    when(size(parts) === 2, struct(element_at(parts, 1).as("key"),
                                   element_at(parts, 2).as("value")))
  }

  /** A1/A2: order-preserving collect + delimiter join — the reference's
    * `'、'.join(...)` (categories/tools/skills, test.py:209,335,347) and
    * `'\n'.join(...)` (contact rows, test.py:404-412) as one operator:
    * values joined in `posCol` order per group.
    */
  def collectJoined(df: DataFrame, idCol: String, valueCol: String,
                    posCol: String, sep: String): DataFrame =
    df.groupBy(col(idCol))
      .agg(array_join(
        expr(s"transform(array_sort(collect_list(struct($posCol, $valueCol))), x -> x.$valueCol)"),
        sep).as(s"${valueCol}s"))

  /** J2/A3: positional zip join — two parallel arrays (legend texts /
    * legend values scraped separately, test.py:425-431) zipped by index
    * into one map. `map_from_arrays` is the vectorized form of the
    * reference's `zip(education_elements, education_values)` loop.
    */
  def zipToMap(keys: Column, values: Column): Column =
    map_from_arrays(keys, values)

  /** A3/A7: collect chart lines of one titled chart into a sorted map. */
  def chartMap(df: DataFrame, idCol: String, titleCol: String, lineCol: String): DataFrame =
    df.withColumn("_e", chartLineEntry(col(lineCol)))
      .filter(col("_e").isNotNull)
      .groupBy(col(idCol), col(titleCol))
      .agg(map_from_entries(sort_array(collect_list(col("_e")))).as("m"))

  /** A5: gender map — first two stacked bars classified male/female by RGB
    * tolerance (test.py:436-449). Input: (id, pos, style, text).
    */
  private val MALE_RGB = "rgb(78, 145, 255)"
  private val FEMALE_RGB = "rgb(255, 144, 199)"

  def genderMap(bars: DataFrame, idCol: String = "job_id"): DataFrame = {
    val rgb = regexp_extract(col("style"), "rgb\\([^)]*\\)", 0) // P11
    bars
      .withColumn("gender_key",
        when(RgbFunctions.isSimilarRgb(rgb, lit(MALE_RGB), 5), "男性")
          .when(RgbFunctions.isSimilarRgb(rgb, lit(FEMALE_RGB), 5), "女性"))
      .filter(col("gender_key").isNotNull)
      .groupBy(col(idCol))
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("gender_key"), col("text"))))).as("gender"))
  }

  /** A6: language map — per language, decode each bar's background color to
    * a proficiency level (P10), join "level+pct" strings with commas in bar
    * order (test.py:453-488). Input: (id, lang, pos, style, text).
    */
  def languageMap(bars: DataFrame, idCol: String = "job_id"): DataFrame = {
    val bg = regexp_extract(col("style"), "rgb\\([^)]*\\)", 0)
    bars
      .withColumn("level_pct", concat(RgbFunctions.legendLevel(bg), col("text")))
      .groupBy(col(idCol), col("lang"))
      .agg(array_join(
        expr("transform(array_sort(collect_list(struct(pos, level_pct))), x -> x.level_pct)"),
        ",").as("levels"))
      .groupBy(col(idCol))
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("lang"), col("levels"))))).as("language_skills"))
  }

  /** A9: the all-empty analysis default (test.py:515-524). */
  val emptyAnalysis: Column = {
    val e = typedLit(Map.empty[String, String])
    struct(e.as("education"), e.as("gender"), e.as("language_skills"),
           e.as("age"), e.as("experience"), e.as("major"),
           e.as("skills"), e.as("certificates"))
  }

  // ---------- P12: row quality ----------

  /** Count empty string fields across the given columns; > threshold flags
    * the row as an error (test.py:548-549). Expression-only (codegen'd).
    */
  def emptyFieldCount(cols: Seq[String]): Column =
    cols.map(c => when(coalesce(col(c), lit("")) === "", 1).otherwise(0))
      .reduce(_ + _)

  def rowQualityFlag(cols: Seq[String], threshold: Int = 6): Column =
    when(emptyFieldCount(cols) > threshold, lit("error")).otherwise(lit("ok"))
}
