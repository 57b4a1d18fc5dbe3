package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import graft.sources.HttpCrawl
import graft.jobs.JobOps

/** S1/S4 live transport against a real HTTP server (localhost, JDK
  * com.sun.net.httpserver): search pages serve reference-shaped
  * job-summary markup, detail pages serve h3/list-row__data rows, and
  * the executor-side crawl must extract, budget errors, land the zone
  * through the DSv2 connector, and feed the kv-pivot — the full
  * fetch->zone->engine path the sandbox's no-egress waiver previously
  * left to documentation.
  */
class HttpCrawlSpec extends SparkSpec with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var base: String = _
  @volatile private var searchHits = 0

  private def jobArticle(kw: String, i: Int): String = {
    val hiring = if (i % 2 == 0)
      """<div class="actively-hiring-tag">積極徵才中</div>""" else ""
    val applicants = if (i % 3 == 0) ""
      else s"""<span class="applicants">應徵人數 $i~${i + 5} 人</span>"""
    s"""<article class="job-summary" data-idx="$i">
       |  <a class="js-job-link job-name" href="$base/job/$kw-$i?src=list"> 職位$kw$i </a>
       |  <a class="company-link company">公司$i</a>
       |  <span class="update date">更新2025/03/0${i % 9 + 1}</span>
       |  $hiring$applicants
       |</article>""".stripMargin
  }

  private def detailHtml(id: String): String = {
    // two single labels + one multi-valued (two list-row blocks share
    // the 擅長工具 label -> the pivot must '、'-join them in order)
    s"""<html><body><div class="detail">
       |<div class="list-row"><h3 class="h3">管理責任</h3>
       |  <div class="list-row__data">不需負擔管理責任($id)</div></div>
       |<div class="list-row"><h3 class="h3">擅長工具</h3>
       |  <div class="list-row__data">Python</div></div>
       |<div class="list-row"><h3 class="h3">擅長工具</h3>
       |  <div class="list-row__data">Solidity</div></div>
       |<div class="list-row"><h3 class="h3">學歷要求</h3>
       |  <div class="list-row__data">大學以上</div></div>
       |</div></body></html>""".stripMargin
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
    def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "text/html; charset=utf-8")
      ex.sendResponseHeaders(code, b.length)
      ex.getResponseBody.write(b); ex.close()
    }
    server.createContext("/search", (ex: HttpExchange) => {
      searchHits += 1
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      val kw = java.net.URLDecoder.decode(
        q.split("&").find(_.startsWith("keyword=")).map(_.drop(8)).getOrElse(""),
        "UTF-8")
      if (kw == "boom") respond(ex, 500, "internal error")
      else respond(ex, 200,
        s"<html><body>${(0 until 4).map(jobArticle(kw, _)).mkString("\n")}</body></html>")
    })
    server.createContext("/job", (ex: HttpExchange) =>
      respond(ex, 200, detailHtml(ex.getRequestURI.getPath.split("/").last)))
    server.start()
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    super.afterAll()
  }

  test("search crawl: fetch -> extract -> typed rows with P6 defaults") {
    val rows = HttpCrawl.crawlKeywords(spark, Seq("區塊鏈", "後端"),
      s"$base/search?keyword={keyword}").collect().sortBy(r => (r.keyword, r.job_url))
    assert(rows.length == 8)
    val r0 = rows.find(r => r.keyword == "區塊鏈" && r.job_url.endsWith("區塊鏈-0?src=list")).get
    assert(r0.job_name == "職位區塊鏈0")       // trimmed
    assert(r0.company == "公司0")
    assert(r0.update_date == "更新2025/03/01") // raw; cleaning is P3's job
    assert(r0.tag == "積極徵才中")
    assert(r0.applicants == "")                // i%3==0 -> absent -> "" default
    val r1 = rows.find(_.job_url.endsWith("區塊鏈-1?src=list")).get
    assert(r1.tag == "" && r1.applicants == "應徵人數 1~6 人")
  }

  test("error budget: failing keyword is skipped, budget exceeds -> abort") {
    // 1 failure <= budget: good keywords still crawl
    val ok = HttpCrawl.crawlKeywords(spark, Seq("a", "boom", "b"),
      s"$base/search?keyword={keyword}", maxErrors = 3).collect()
    assert(ok.length == 8)
    // budget 0 in one task: the query must FAIL, not silently skip
    val ex = intercept[org.apache.spark.SparkException] {
      HttpCrawl.crawlKeywords(spark, Seq("boom"),
        s"$base/search?keyword={keyword}", maxErrors = 0).collect()
    }
    assert(ex.getMessage.contains("error budget") ||
      Option(ex.getCause).exists(_.getMessage.contains("error budget")))
  }

  test("detail crawl feeds the kv-pivot (S4 -> §2.3)") {
    val jobs = HttpCrawl.crawlKeywords(spark, Seq("區塊鏈"),
      s"$base/search?keyword={keyword}")
    val details = HttpCrawl.crawlDetails(jobs).toDF()
      .withColumnRenamed("job_url", "job_id")
    val wide = JobOps.kvPivotFirst(details, idCol = "job_id")
      .orderBy(col("job_id"))
    val first = wide.filter(col("job_id").endsWith("區塊鏈-0?src=list")).head()
    assert(first.getAs[String]("management") == "不需負擔管理責任(區塊鏈-0)")
    assert(first.getAs[String]("tools") == "Python、Solidity") // doc-order join
    assert(first.getAs[String]("education") == "大學以上")
    assert(first.getAs[String]("vacation") == null)            // absent label
  }

  test("full path: crawl -> graft-keyword landing zone -> connector scan") {
    val zone = java.nio.file.Files.createTempDirectory("crawlzone").toString
    val df = HttpCrawl.crawlToZone(spark, Seq("區塊鏈", "後端"),
      s"$base/search?keyword={keyword}", zone)
    // connector semantics intact on crawled data: keyword pruning pushes
    // into the scan (only one directory read)
    val one = df.filter(col("keyword") === "後端")
    assert(one.count() == 4)
    assert(one.select("job_name").collect().map(_.getString(0)).toSet ==
      (0 until 4).map(i => s"職位後端$i").toSet)
    // rate pacing exists (T4): delayMs is applied between fetches
    val t0 = System.nanoTime()
    HttpCrawl.crawlKeywords(spark, Seq("x", "y"),
      s"$base/search?keyword={keyword}", delayMs = 120L)
      .repartition(1).collect()
    assert((System.nanoTime() - t0) / 1e6 >= 240L)
  }
}
