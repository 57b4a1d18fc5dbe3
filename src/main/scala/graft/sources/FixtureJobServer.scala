package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Deterministic reference-shaped job board on localhost (JDK
  * com.sun.net.httpserver): `/search?keyword=K` serves `jobsPerKeyword`
  * div.job-summary articles whose every field is a pure (keyword, index)
  * formula; `/job/K-i` serves the matching detail page's h3 +
  * list-row__data rows. Lets the HTTP transport (HttpCrawl) run inside
  * specs AND inside the oracle gate (q107) with no egress: the DuckDB
  * oracle recomputes the same formulas in SQL, so fetch, extraction,
  * and budget handling all sit inside the hash.
  */
object FixtureJobServer {

  val KEYWORDS: Seq[String] = Seq("區塊鏈", "後端", "資料")
  val JOBS_PER_KEYWORD: Int = 8

  def jobArticle(base: String, kw: String, i: Int): String = {
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

  def detailHtml(id: String): String =
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

  /** Start on an ephemeral port; returns (server, baseUrl). Caller
    * stops. `failKeywords` respond 500 (error-budget test hook).
    */
  def start(failKeywords: Set[String] = Set.empty): (HttpServer, String) = {
    val (server, _) = startLogged(failKeywords)
    (server, s"http://127.0.0.1:${server.getAddress.getPort}")
  }

  /** Like [[start]], but also returns a thread-safe arrival log of
    * (path, System.nanoTime) per request — the measurement surface for
    * the T4 politeness contract (HttpCrawlSpec asserts inter-arrival
    * gaps, not client-side sleeps).
    */
  def startLogged(failKeywords: Set[String] = Set.empty)
      : (HttpServer, java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]) = {
    val log = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val base = s"http://127.0.0.1:${server.getAddress.getPort}"
    def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "text/html; charset=utf-8")
      ex.sendResponseHeaders(code, b.length)
      ex.getResponseBody.write(b); ex.close()
    }
    server.createContext("/search", (ex: HttpExchange) => {
      log.add((ex.getRequestURI.getPath, System.nanoTime()))
      val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
      val kw = java.net.URLDecoder.decode(
        q.split("&").find(_.startsWith("keyword=")).map(_.drop(8)).getOrElse(""),
        "UTF-8")
      if (failKeywords(kw)) respond(ex, 500, "internal error")
      else respond(ex, 200, s"<html><body>${
        (0 until JOBS_PER_KEYWORD).map(jobArticle(base, kw, _)).mkString("\n")
      }</body></html>")
    })
    server.createContext("/job", (ex: HttpExchange) => {
      log.add((ex.getRequestURI.getPath, System.nanoTime()))
      respond(ex, 200, detailHtml(ex.getRequestURI.getPath.split("/").last))
    })
    server.start()
    (server, log)
  }
}
