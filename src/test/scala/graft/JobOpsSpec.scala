package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.jobs.{JobOps, JobRecordGate, JobSchema}

/** Reference-parity operator specs over FIXTURES.md-shaped inputs. */
class JobOpsSpec extends SparkSpec {
  import spark.implicits._

  test("kvPivotFirst: first-match wins, multi-valued labels join with 、") {
    // A3 fixture: duplicate 管理責任 (first wins), multi-valued 擅長工具
    val long = Seq(
      (1L, 1, "管理責任", "不需負擔管理責任"),
      (1L, 2, "管理責任", "DUPLICATE-IGNORED"),
      (1L, 3, "擅長工具", "Python"),
      (1L, 4, "擅長工具", "Solidity"),
      (1L, 5, "學歷要求", "大學以上"),
      (2L, 1, "出差外派", "無需出差外派")
    ).toDF("job_id", "pos", "label", "value")

    val wide = JobOps.kvPivotFirst(long).collect().sortBy(_.getLong(0))
    val r1 = wide(0)
    assert(r1.getAs[String]("management") == "不需負擔管理責任")
    assert(r1.getAs[String]("tools") == "Python、Solidity")
    assert(r1.getAs[String]("education") == "大學以上")
    assert(r1.getAs[String]("vacation") == null) // absent label -> null
    val r2 = wide(1)
    assert(r2.getAs[String]("business_trip") == "無需出差外派")
    assert(r2.getAs[String]("management") == null)
  }

  test("cleaning ops: update date, applicants, hiring flag, apply code") {
    val df = Seq(
      ("更新2025/03/01", "應徵人數 0~5 人", "積極徵才中",
       "https://www.104.com.tw/job/abc12?jobsource=x"),
      ("2025/02/02", "", null,
       "https://www.104.com.tw/job/zz9")
    ).toDF("update_date", "applicants", "tag", "job_url")

    val out = df.select(
      JobOps.cleanUpdateDate($"update_date").as("d"),
      JobOps.cleanApplicants($"applicants").as("a"),
      JobOps.activelyHiringFlag($"tag").as("h"),
      JobOps.applyCode($"job_url").as("code")).collect()

    assert(out(0) == Row("2025/03/01", "0~5", "是", "abc12"))
    assert(out(1) == Row("2025/02/02", "N/A", "否", "zz9"))
  }

  test("rangeBounds parses textual ranges") {
    val (lo, hi) = JobOps.rangeBounds(lit("0~5"))
    val r = spark.range(1).select(lo.as("lo"), hi.as("hi")).head
    assert(r == Row(0L, 5L))
  }

  test("genderMap classifies stacked bars by RGB tolerance (A5 fixture)") {
    val bars = Seq(
      (1L, 1, "background: rgb(80, 143, 253); width: 78%", "78%"),  // ~male ±5
      (1L, 2, "background: rgb(255, 144, 199); width: 22%", "22%"), // female exact
      (2L, 1, "background: rgb(0, 0, 0); width: 50%", "50%")        // unmatched
    ).toDF("job_id", "pos", "style", "text")

    val out = JobOps.genderMap(bars).collect()
    assert(out.length == 1)
    val m = out(0).getAs[Map[String, String]]("gender")
    assert(m == Map("男性" -> "78%", "女性" -> "22%"))
  }

  test("languageMap decodes legend colors and comma-joins levels (A6)") {
    val bars = Seq(
      (1L, "英文", 1, "background: rgb(41, 128, 255)", "12%"),
      (1L, "英文", 2, "background: rgb(102, 165, 255)", "30%"),
      (1L, "日文", 1, "background: rgb(1, 2, 3)", "9%") // unknown color
    ).toDF("job_id", "lang", "pos", "style", "text")

    val out = JobOps.languageMap(bars).collect()
    val m = out(0).getAs[Map[String, String]]("language_skills")
    assert(m("英文") == "精通12%,中等30%")
    assert(m("日文") == "未知9%")
  }

  test("typed Dataset[JobPosting] round-trips the 30-field record (§1.3)") {
    import graft.jobs.{Analysis, JobPosting}
    val posting = JobPosting(
      job_name = "區塊鏈工程師", job_url = "https://x/job/a1", company = "Acme",
      update_date = "2025/03/01", actively_hiring = "是", applicants = "0~5",
      job_description = "d", job_category = "軟體工程師", salary = "s",
      job_type = "全職", location = "台北", management = "無", business_trip = "無",
      work_time = "日班", vacation = "週休二日", start_work = "隨時",
      headcount = "1", work_exp = "3年", education = "大學", major = "資工",
      language_req = "英文", tools = "Python、Go", skills = "Spark",
      certificates = "", legal_benefits = "勞保", other_benefits = "獎金",
      raw_benefits = "r", contact_info = "hr@acme",
      analysis = Analysis(gender = Map("男性" -> "78%", "女性" -> "22%")))
    val ds = Seq(posting).toDS()
    // typed round-trip preserves the nested analysis struct exactly
    val back = ds.collect()(0)
    assert(back == posting)
    // and the encoder-derived schema is queryable relationally
    assert(ds.select($"analysis.gender").head
      .getAs[Map[String, String]](0)("男性") == "78%")
    assert(ds.schema.fieldNames.length == 29) // 28 scalars + analysis struct
  }

  test("emptyAnalysis default has all 8 keys as empty maps (A9)") {
    val r = spark.range(1).select(JobOps.emptyAnalysis.as("analysis"))
    assert(r.schema("analysis").dataType == JobSchema.analysisType ||
      r.select("analysis.*").columns.toSeq ==
        JobSchema.analysisType.fields.map(_.name).toSeq)
    val row = r.select("analysis.*").head
    (0 until 8).foreach(i => assert(row.getAs[Map[String, String]](i).isEmpty))
  }

  test("row quality flags rows with > 6 empty fields (P12)") {
    val cols = (1 to 8).map(i => s"c$i")
    val full = Seq(("v", "v", "", "", "", "", "", ""),
                   ("", "", "", "", "", "", "", ""))
      .toDF(cols: _*)
    val flags = full.select(JobOps.rowQualityFlag(cols).as("f")).collect().map(_.getString(0))
    assert(flags.toSeq == Seq("ok", "error"))
  }

  test("collectJoined preserves document order for 、 and newline joins (A1/A2)") {
    val contacts = Seq(
      (1L, 2, "Email：hr@acme.tw"),
      (1L, 1, "聯絡人：王先生"),
      (2L, 1, "聯絡人：李小姐")
    ).toDF("job_id", "pos", "contact")
    val out = JobOps.collectJoined(contacts, "job_id", "contact", "pos", "\n")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "聯絡人：王先生\nEmail：hr@acme.tw") // pos order, not input order
    assert(out(2L) == "聯絡人：李小姐")

    val tools = Seq((1L, 1, "Python"), (1L, 2, "Solidity")).toDF("job_id", "pos", "tool")
    val joined = JobOps.collectJoined(tools, "job_id", "tool", "pos", "、")
      .head.getString(1)
    assert(joined == "Python、Solidity")
  }

  test("zipToMap zips parallel arrays into a map (J2/A3 fixture)") {
    val df = Seq((Seq("大學", "碩士"), Seq("60%", "30%")))
      .toDF("edu_keys", "edu_values")
    val m = df.select(JobOps.zipToMap($"edu_keys", $"edu_values").as("m"))
      .head.getAs[Map[String, String]]("m")
    assert(m == Map("大學" -> "60%", "碩士" -> "30%"))
  }

  test("chartMap builds distribution maps, dropping malformed lines (A4/A7)") {
    val lines = Seq(
      (1L, "年齡", "25-29歲\n14%"),
      (1L, "年齡", "30-34歲\n41%"),
      (1L, "年齡", "malformed-no-newline"),
      (1L, "工作經驗", "1-3年\n50%")
    ).toDF("job_id", "chart_title", "line")
    val out = JobOps.chartMap(lines, "job_id", "chart_title", "line")
      .collect()
      .map(r => r.getAs[String]("chart_title") -> r.getAs[Map[String, String]]("m"))
      .toMap
    assert(out("年齡") == Map("25-29歲" -> "14%", "30-34歲" -> "41%"))
    assert(out("工作經驗") == Map("1-3年" -> "50%"))
  }

  test("orphan zone sweep: dead-PID zones removed, live and foreign dirs kept") {
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    val self = java.lang.ProcessHandle.current().pid()
    // beyond the Linux pid_max ceiling (2^22), so never a live process
    val deadPid = 4999999L
    assert(!java.lang.ProcessHandle.of(deadPid).isPresent)
    val dead = new java.io.File(tmp, s"graft-spec-zone_x-$deadPid")
    val live = new java.io.File(tmp, s"graft-spec-zone_y-$self")
    val foreign = new java.io.File(tmp, "graft-spec-not-a-zone")
    // zone-SHAPED name + dead PID but no marker: a user/tool dir that
    // merely looks like a zone must survive (ADVICE r8 — deletion is
    // opt-in via the sentinel freshZone stamps, not name-pattern-based)
    val lookalike = new java.io.File(tmp, s"graft-spec-lookalike-$deadPid")
    Seq(dead, live, foreign, lookalike).foreach { d =>
      d.mkdirs()
      java.nio.file.Files.writeString(d.toPath.resolve("state"), "x")
    }
    Seq(dead, live).foreach { d =>
      java.nio.file.Files.writeString(d.toPath.resolve(".graft-zone"), "")
    }
    try {
      JobRecordGate.sweepOrphanZones()
      assert(!dead.exists(), "dead-PID zone survived the sweep")
      assert(live.exists(), "live-PID zone was swept")
      assert(foreign.exists(), "non-zone-shaped dir was swept")
      assert(lookalike.exists(), "unmarked zone-shaped dir was swept")
    } finally Seq(dead, live, foreign, lookalike).foreach { d =>
      new java.io.File(d, "state").delete()
      new java.io.File(d, ".graft-zone").delete()
      d.delete()
    }
  }

  test("freshZone stamps the sweep marker inside every zone it creates") {
    val zone = JobRecordGate.freshZone("graft-spec-marker-", "specdir")
    assert(new java.io.File(zone, ".graft-zone").isFile,
      "freshZone did not stamp the opt-in sweep sentinel")
  }
}
