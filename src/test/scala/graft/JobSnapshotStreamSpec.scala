package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.streaming.JobSnapshotStream

/** E1 lifecycle end-to-end in streaming mode: two snapshot drops (with a
  * re-crawled duplicate) -> cleaning -> dedup -> parquet jobs table,
  * resuming from the checkpoint between drops.
  */
class JobSnapshotStreamSpec extends SparkSpec {

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  test("snapshot drops flow through cleaning + dedup into the jobs table") {
    val inDir = tmp("snap-in"); val outDir = tmp("snap-out"); val ckpt = tmp("snap-ckpt")

    def drop(name: String, lines: Seq[String]): Unit =
      Files.write(Paths.get(inDir, name), lines.mkString("\n").getBytes("UTF-8"))

    def tick(): Unit = {
      val q = JobSnapshotStream.toJobsTable(
        JobSnapshotStream.dedup(
          JobSnapshotStream.clean(
            JobSnapshotStream.readSnapshots(spark, inDir))),
        outDir, ckpt).start()
      q.awaitTermination(60000)
    }

    drop("scroll1.json", Seq(
      """{"job_name":"區塊鏈工程師 ","job_url":"https://x/job/abc12?s=1","company":" Acme","update_date":"更新2025/03/01","tag":"積極徵才中","applicants":"應徵人數 0~5 人","management":"m","tools":"Python、Go","education":"大學","salary":"s","crawl_ts":"2025-03-01T00:00:00.000Z"}"""))
    tick()

    // second tick: one re-crawl of abc12 (must dedup) + one new job
    drop("scroll2.json", Seq(
      """{"job_name":"區塊鏈工程師 ","job_url":"https://x/job/abc12?s=1","company":" Acme","update_date":"更新2025/03/01","tag":"積極徵才中","applicants":"應徵人數 0~5 人","management":"m","tools":"Python、Go","education":"大學","salary":"s","crawl_ts":"2025-03-01T00:10:00.000Z"}""",
      """{"job_name":"資料工程師","job_url":"https://x/job/zz9","company":"Beta","update_date":"2025/02/02","applicants":"","management":"","tools":"","education":"","salary":"","crawl_ts":"2025-03-01T00:11:00.000Z"}"""))
    tick()

    val jobs = spark.read.parquet(outDir)
    assert(jobs.count() == 2) // duplicate re-crawl dropped by state, not luck
    val abc = jobs.filter(col("apply_code") === "abc12").head
    assert(abc.getAs[String]("job_name") == "區塊鏈工程師")
    assert(abc.getAs[String]("actively_hiring") == "是")
    assert(abc.getAs[String]("applicants") == "0~5")
    val zz = jobs.filter(col("apply_code") === "zz9").head
    assert(zz.getAs[String]("applicants") == "N/A")
    assert(zz.getAs[String]("actively_hiring") == "否")
  }

  test("stateShufflePartitions knob is pinned into the stream checkpoint") {
    // the public sizing surface (VERDICT r8 #6): the dedup state store
    // must fan out into exactly the requested partition count, not the
    // session's batch shuffle default (32 here via SparkSpec)
    val inDir = tmp("knob-in"); val outDir = tmp("knob-out"); val ckpt = tmp("knob-ckpt")
    Files.write(Paths.get(inDir, "scroll1.json"),
      """{"job_name":"a","job_url":"https://x/job/k1","company":"c","update_date":"2025/01/01","applicants":"","management":"","tools":"","education":"","salary":"","crawl_ts":"2025-03-01T00:00:00.000Z"}"""
        .getBytes("UTF-8"))
    val q = JobSnapshotStream.toJobsTable(
      JobSnapshotStream.dedup(
        JobSnapshotStream.clean(
          JobSnapshotStream.readSnapshots(spark, inDir,
            stateShufflePartitions = Some(3)))),
      outDir, ckpt).start()
    q.awaitTermination(60000)
    // state store layout: <ckpt>/state/<operatorId>/<partitionId>/...
    val parts = new java.io.File(ckpt, "state/0").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.forall(_.isDigit))
      .map(_.toInt).sorted.toSeq
    assert(parts == Seq(0, 1, 2),
      s"state fanned out into $parts, expected exactly 3 partitions")
    assert(spark.read.parquet(outDir).count() == 1)
  }
}
