package graft.jobs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end demo of the reference-parity pipeline: raw list rows +
  * detail kv rows + analysis chart fragments -> one wide job record with
  * the nested 8-map analysis struct (the reference's test.py:527-534
  * output shape). Run: sbt "runMain graft.jobs.JobPipelineDemo"
  */
object JobPipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // S2: the list scan (one row per div.job-summary)
    val list = Seq(
      (1L, "區塊鏈工程師 ", "https://www.104.com.tw/job/abc12?jobsource=x",
       " Acme 科技", "更新2025/03/01", "積極徵才中", "應徵人數 0~5 人"),
      (2L, "資料工程師", "https://www.104.com.tw/job/zz9",
       "Beta 資訊", "更新2025/02/02", null, "")
    ).toDF("job_id", "job_name", "job_url", "company", "update_date", "tag", "applicants")

    val cleaned = list.select(
      col("job_id"),
      trim(col("job_name")).as("job_name"),
      col("job_url"),
      trim(col("company")).as("company"),
      JobOps.cleanUpdateDate(col("update_date")).as("update_date"),
      JobOps.activelyHiringFlag(col("tag")).as("actively_hiring"),
      JobOps.cleanApplicants(col("applicants")).as("applicants"),
      JobOps.applyCode(col("job_url")).as("apply_code"))

    // §2.3: detail-page label/value rows -> wide columns (one pivot)
    val details = Seq(
      (1L, 1, "管理責任", "不需負擔管理責任"),
      (1L, 2, "擅長工具", "Python"),
      (1L, 3, "擅長工具", "Solidity"),
      (1L, 4, "學歷要求", "大學以上"),
      (2L, 1, "工作經歷", "3年以上")
    ).toDF("job_id", "pos", "label", "value")
    val wide = JobOps.kvPivotFirst(details)

    // A5/A6: analysis fragments
    val genderBars = Seq(
      (1L, 1, "background: rgb(78, 145, 255); width: 78%", "78%"),
      (1L, 2, "background: rgb(255, 144, 199); width: 22%", "22%"))
      .toDF("job_id", "pos", "style", "text")
    val langBars = Seq(
      (1L, "英文", 1, "background: rgb(41, 128, 255)", "12%"),
      (1L, "英文", 2, "background: rgb(102, 165, 255)", "30%"))
      .toDF("job_id", "lang", "pos", "style", "text")
    val charts = Seq(
      (1L, "年齡", "25-29歲\n14%"), (1L, "年齡", "30-34歲\n41%"))
      .toDF("job_id", "chart_title", "line")

    val gender = JobOps.genderMap(genderBars)
    val lang = JobOps.languageMap(langBars)
    val age = JobOps.chartMap(charts.filter($"chart_title" === "年齡"),
      "job_id", "chart_title", "line").select($"job_id", $"m".as("age"))

    // J1: attach analysis via the derived-key lookup join; A9 empty default
    val emptyMap = typedLit(Map.empty[String, String])
    val analysis = gender.join(lang, Seq("job_id"), "full_outer")
      .join(age, Seq("job_id"), "full_outer")
      .select(col("job_id"), struct(
        emptyMap.as("education"),
        coalesce(col("gender"), emptyMap).as("gender"),
        coalesce(col("language_skills"), emptyMap).as("language_skills"),
        coalesce(col("age"), emptyMap).as("age"),
        emptyMap.as("experience"), emptyMap.as("major"),
        emptyMap.as("skills"), emptyMap.as("certificates")).as("analysis"))

    val jobs = cleaned
      .join(wide, Seq("job_id"), "left_outer")
      .join(analysis, Seq("job_id"), "left_outer")
      .withColumn("analysis", coalesce(col("analysis"), JobOps.emptyAnalysis))
      .withColumn("quality", JobOps.rowQualityFlag(
        Seq("job_name", "company", "update_date", "applicants", "management",
            "business_trip", "work_time", "vacation", "start_work", "headcount",
            "work_exp", "education", "major", "language_req", "tools", "skills",
            "certificates", "other_requirements")))

    jobs.orderBy("job_id").show(truncate = false)
    println("=== physical plan ===")
    jobs.explain("formatted")
    spark.stop()
  }
}
