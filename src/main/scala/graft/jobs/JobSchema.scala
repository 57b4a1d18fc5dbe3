package graft.jobs

import org.apache.spark.sql.types._

/** The reference's job-posting record re-expressed as one fixed Spark
  * schema (SURVEY.md §1.3; field list from /root/reference/test.py:527-534
  * via FIXTURES.md A1). All scalars are strings — the reference keeps
  * numerics-in-text ("0~5", salary free text, "14%") — with a single
  * nested `analysis` struct of 8 string->string maps (test.py:423-524).
  * Unlike the reference (which emits a positional LIST on error rows,
  * test.py:539-546), every row here is this one nullable StructType.
  */
/** Typed row for the public API (`Dataset[JobPosting]`) — the 8 analysis
  * distributions keep the reference's empty-map-on-failure defaults.
  */
case class Analysis(
    education: Map[String, String] = Map.empty,
    gender: Map[String, String] = Map.empty,
    language_skills: Map[String, String] = Map.empty,
    age: Map[String, String] = Map.empty,
    experience: Map[String, String] = Map.empty,
    major: Map[String, String] = Map.empty,
    skills: Map[String, String] = Map.empty,
    certificates: Map[String, String] = Map.empty)

case class JobPosting(
    job_name: String, job_url: String, company: String, update_date: String,
    actively_hiring: String, applicants: String, job_description: String,
    job_category: String, salary: String, job_type: String, location: String,
    management: String, business_trip: String, work_time: String,
    vacation: String, start_work: String, headcount: String, work_exp: String,
    education: String, major: String, language_req: String, tools: String,
    skills: String, certificates: String, legal_benefits: String,
    other_benefits: String, raw_benefits: String, contact_info: String,
    analysis: Analysis = Analysis())

object JobSchema {

  /** 應徵分析 — closed 8-key struct, each a string->string distribution
    * map; empty maps (not nulls) on extraction failure (test.py:515-524).
    */
  val analysisType: StructType = StructType(Seq(
    StructField("education", MapType(StringType, StringType), nullable = false),
    StructField("gender", MapType(StringType, StringType), nullable = false),
    StructField("language_skills", MapType(StringType, StringType), nullable = false),
    StructField("age", MapType(StringType, StringType), nullable = false),
    StructField("experience", MapType(StringType, StringType), nullable = false),
    StructField("major", MapType(StringType, StringType), nullable = false),
    StructField("skills", MapType(StringType, StringType), nullable = false),
    StructField("certificates", MapType(StringType, StringType), nullable = false)))

  /** The 14 kv-pivot detail labels in reference document order
    * (test.py:217-374; SURVEY.md §2.3). Chinese label -> column name.
    */
  val detailLabels: Seq[(String, String)] = Seq(
    "管理責任" -> "management",
    "出差外派" -> "business_trip",
    "上班時段" -> "work_time",
    "休假制度" -> "vacation",
    "可上班日" -> "start_work",
    "需求人數" -> "headcount",
    "工作經歷" -> "work_exp",
    "學歷要求" -> "education",
    "科系要求" -> "major",
    "語文條件" -> "language_req",
    "擅長工具" -> "tools",
    "工作技能" -> "skills",
    "具備證照" -> "certificates",
    "其他條件" -> "other_requirements")

  /** Labels whose repeated values are '、'-joined (test.py:335,347,359). */
  val multiValuedLabels: Set[String] = Set("擅長工具", "工作技能", "具備證照")

  val listFields: Seq[String] = Seq(
    "job_name", "job_url", "company", "update_date", "actively_hiring",
    "applicants", "job_description", "job_category", "salary", "job_type",
    "location")

  val jobType: StructType = StructType(
    listFields.map(StructField(_, StringType)) ++
    detailLabels.map { case (_, c) => StructField(c, StringType) } ++
    Seq("legal_benefits", "other_benefits", "raw_benefits", "contact_info")
      .map(StructField(_, StringType)) :+
    StructField("analysis", analysisType))
}
