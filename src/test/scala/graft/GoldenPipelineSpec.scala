package graft

import org.apache.spark.sql.functions._
import graft.jobs.JobOps

/** Golden end-to-end test (SURVEY.md §5.4 / FIXTURES.md A6): one raw
  * crawl-snapshot JSON with deliberate defects — duplicate job_url
  * (re-crawl), a >6-empty-fields error row, missing optional fields —
  * through the full cleaning pipeline, checked against golden values.
  */
class GoldenPipelineSpec extends SparkSpec {

  private lazy val out = {
    val path = getClass.getResource("/raw_snapshot.jsonl").getPath
    val raw = spark.read.json(path)
    raw
      .select(
        trim(col("job_name")).as("job_name"),
        col("job_url"),
        trim(col("company")).as("company"),
        JobOps.cleanUpdateDate(col("update_date")).as("update_date"),
        JobOps.activelyHiringFlag(col("tag")).as("actively_hiring"),
        JobOps.cleanApplicants(col("applicants")).as("applicants"),
        JobOps.applyCode(col("job_url")).as("apply_code"),
        col("management"), col("tools"), col("education"), col("salary"))
      .withColumn("quality", JobOps.rowQualityFlag(
        Seq("job_name", "company", "update_date", "applicants", "management",
            "tools", "education", "salary"), threshold = 4))
      // re-crawl dedup on the natural key, first occurrence wins
      .dropDuplicates("job_url")
      .orderBy("job_url")
      .collect()
  }

  test("dedup: duplicate job_url collapses to one row") {
    assert(out.length == 3) // 4 raw rows, one duplicate
  }

  test("happy row: all cleaning ops applied (golden values)") {
    val r = out.find(_.getAs[String]("apply_code") == "abc12").get
    assert(r.getAs[String]("job_name") == "區塊鏈工程師")
    assert(r.getAs[String]("company") == "Acme 科技")
    assert(r.getAs[String]("update_date") == "2025/03/01")
    assert(r.getAs[String]("actively_hiring") == "是")
    assert(r.getAs[String]("applicants") == "0~5")
    assert(r.getAs[String]("tools") == "Python、Solidity")
    assert(r.getAs[String]("quality") == "ok")
  }

  test("sparse row: defaults fire but row is still ok") {
    val r = out.find(_.getAs[String]("apply_code") == "zz9").get
    assert(r.getAs[String]("actively_hiring") == "否") // missing tag -> 否
    assert(r.getAs[String]("applicants") == "N/A")     // empty -> N/A
    assert(r.getAs[String]("quality") == "ok")         // exactly 4 empties = at threshold, not over
  }

  test("error row: >threshold empty fields flagged (test.py:548-549)") {
    val r = out.find(_.getAs[String]("apply_code") == "err1").get
    assert(r.getAs[String]("quality") == "error")
  }
}
