package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sink.JobSinks

class SinkSpec extends SparkSpec {

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  test("S6 append-merge: appends preserve prior rows (union-on-write)") {
    import spark.implicits._
    val dir = tmp("json-append")
    JobSinks.appendJson(Seq(("a", 1)).toDF("k", "v"), dir)
    JobSinks.appendJson(Seq(("b", 2)).toDF("k", "v"), dir)
    val got = spark.read.json(dir)
    assert(got.count() == 2)
    assert(got.select("k").as[String].collect().sorted.toSeq == Seq("a", "b"))
  }

  test("S5 overwrite replaces; UTF-8 round-trips Chinese values") {
    import spark.implicits._
    val dir = tmp("json-over")
    JobSinks.writeJsonSnapshot(Seq(("stale", "row")).toDF("k", "v"), dir)
    JobSinks.writeJsonSnapshot(Seq(("職缺", "區塊鏈工程師")).toDF("k", "v"), dir)
    val got = spark.read.json(dir).collect()
    assert(got.length == 1)
    assert(got(0).getAs[String]("v") == "區塊鏈工程師")
  }

  test("S7 partitioned sink creates ingest_date partitions") {
    import spark.implicits._
    val dir = tmp("part-sink")
    JobSinks.writePartitionedParquet(Seq(("a", 1)).toDF("k", "v"), dir)
    val dirs = new java.io.File(dir).listFiles().map(_.getName)
    assert(dirs.exists(_.startsWith("ingest_date=")))
    // partition column is prunable: filter compiles to partition pruning
    val got = spark.read.parquet(dir).filter(col("ingest_date") === current_date())
    assert(got.count() == 1)
  }

  test("S9: saveAsTable produces a catalog-queryable jobs table") {
    import spark.implicits._
    try {
      JobSinks.saveAsTable(Seq(("j1", "Acme"), ("j2", "Beta")).toDF("job", "company"),
        "jobs_test_table")
      val got = spark.sql("SELECT company FROM jobs_test_table ORDER BY job")
        .as[String].collect().toSeq
      assert(got == Seq("Acme", "Beta"))
    } finally spark.sql("DROP TABLE IF EXISTS jobs_test_table")
  }

  test("S9: real JDBC write + read-back round-trip (embedded Derby)") {
    import spark.implicits._
    // in-memory Derby DB: pure-Java embedded JDBC, same in-process shape
    // as the reference's sqlite jobs.db — exercises the actual
    // format("jdbc") write path (DriverManager, dialect DDL, batching)
    val url = "jdbc:derby:memory:graftjobs;create=true"
    val jobs = Seq(
      (1L, "j1", "Acme", "remote"),
      (2L, "j2", "Beta", "onsite"),
      (3L, "j3", "Acme", null.asInstanceOf[String])
    ).toDF("id", "job", "company", "mode")
    JobSinks.writeJdbc(jobs, url, "jobs")
    val back = JobSinks.readJdbc(spark, url, "jobs")
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), Option(r.getString(3))))
    assert(back.toSeq == Seq(
      (1L, "j1", "Acme", Some("remote")),
      (2L, "j2", "Beta", Some("onsite")),
      (3L, "j3", "Acme", None)))
    // overwrite really replaces, not appends
    JobSinks.writeJdbc(jobs.filter($"id" === 1L), url, "jobs")
    assert(JobSinks.readJdbc(spark, url, "jobs").count() == 1)
  }

  test("CSV and JSON source formats round-trip the fixture schema") {
    import spark.implicits._
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50)
    // CSV: quoted text with embedded delimiters must survive
    val csvDir = tmp("csv-rt")
    base.write.mode("overwrite").option("header", "true").csv(csvDir)
    val csvBack = spark.read.option("header", "true")
      .schema(base.schema).csv(csvDir)
    assert(csvBack.count() == 50)
    assert(csvBack.select("text").as[String].collect().sorted.toSeq ==
           base.select("text").as[String].collect().sorted.toSeq)
    // JSON lines
    val jsonDir = tmp("json-rt")
    base.write.mode("overwrite").json(jsonDir)
    val jsonBack = spark.read.schema(base.schema).json(jsonDir)
    assert(jsonBack.count() == 50)
    assert(jsonBack.agg(sum("n_chars")).head.getLong(0) ==
           base.agg(sum("n_chars")).head.getLong(0))
  }

  test("S8 fan-out writes both tables from one pass") {
    import spark.implicits._
    val a = tmp("fan-jobs"); val b = tmp("fan-com")
    val jobs = Seq(
      ("j1", "https://c/1"), ("j2", "https://c/1"), ("j3", null)
    ).toDF("job", "company_url")
    JobSinks.fanOut(jobs, a, "company_url", b)
    assert(spark.read.parquet(a).count() == 3)
    // dedup + null-filter on the com_url side (test.py:535 collects once per company)
    assert(spark.read.parquet(b).as[String].collect().toSeq == Seq("https://c/1"))
  }
}
