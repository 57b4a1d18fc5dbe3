package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** S1/S4 live transport: the HTTP fetch + HTML extraction the reference
  * performs with Selenium/Chromium (test.py:84,129-144 search pages;
  * test.py:176-179 detail tabs), re-expressed as EXECUTOR-SIDE fetching —
  * keywords (or detail URLs) distribute across the cluster, each task
  * fetches its slice with the JDK's `java.net.http.HttpClient` and
  * extracts rows, and the result is a plain DataFrame that feeds the
  * existing pipeline (the `graft-keyword` landing zone, `kvPivotFirst`,
  * ...). No browser: the reference only reads server-rendered DOM
  * content, so plain GET + extraction covers the same surface; a
  * deployment facing a JS-rendered page would swap `fetchPage` for a
  * headless-browser call behind the same interface.
  *
  * Extraction is regex-over-markup mirroring the reference's selectors
  * (div.job-summary rows, h3 + div.list-row__data detail pairs) —
  * documented contract, tolerant of attribute noise; a production
  * deployment would swap in a real HTML parser (e.g. jsoup) behind
  * `extractJobRows`/`extractDetailRows` without touching the pipeline.
  *
  * Rate limiting (T4: the reference sleeps 5/3/3/2 s between requests,
  * single-browser-sequential — test.py:136,178): `delayMs` is a
  * PER-HOST minimum interval enforced by a JVM-global token slot
  * ([[hostThrottle]]), so N parallel tasks in an executor cannot
  * multiply the request rate against one host — aggregate rate within
  * an executor is <= 1/delayMs per host regardless of parallelism. On a
  * multi-executor cluster each executor throttles independently
  * (aggregate <= executors/delayMs); for the reference's literal
  * one-request-at-a-time mode, set `maxParallelism = 1` (both crawl
  * stages cap their partition count with it). The error budget (A8/T5,
  * `max_errors=3`) is enforced per task — the distributed form of the
  * reference's global counter — with failures also counted on a Spark
  * accumulator so the driver can report/stop like `ErrorBudgetListener`
  * does for streams.
  */
object HttpCrawl {

  /** Default fetch-task ceiling for both crawl stages. The reference is
    * single-browser SEQUENTIAL (test.py:178); a modest constant keeps
    * the default polite against the single host these crawls typically
    * target — 3 concurrent request streams, each still per-host
    * throttled by `delayMs` — while an explicit `maxParallelism` opts
    * into cluster-wide fan-out for genuinely multi-host crawls. The old
    * default (Int.MaxValue = defaultParallelism tasks) pointed every
    * core on the cluster at one host unless the caller knew to cap it
    * (round-7 ADVICE).
    */
  val DefaultCrawlParallelism = 3

  /** Per-host politeness gate: `acquire` reserves the next send slot
    * for `host` (CAS on a monotonically advancing deadline) and sleeps
    * until it arrives — successive acquisitions for one host are spaced
    * >= minIntervalMs apart across ALL threads of this JVM, while
    * distinct hosts never wait on each other.
    */
  private[graft] object hostThrottle {
    private val slots =
      new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
    def acquire(host: String, minIntervalMs: Long): Unit = {
      if (minIntervalMs <= 0) return
      val slot = slots.computeIfAbsent(host,
        _ => new java.util.concurrent.atomic.AtomicLong(Long.MinValue))
      var startNs = 0L
      var reserved = false
      while (!reserved) {
        val now = System.nanoTime()
        val prev = slot.get()
        startNs = math.max(now, prev)
        reserved = slot.compareAndSet(prev, startNs + minIntervalMs * 1000000L)
      }
      val waitMs = (startNs - System.nanoTime()) / 1000000L
      if (waitMs > 0) Thread.sleep(waitMs)
    }
    def acquireFor(url: String, minIntervalMs: Long): Unit =
      acquire(URI.create(url).getHost, minIntervalMs)
  }

  case class JobRow(keyword: String, job_name: String, job_url: String,
                    company: String, update_date: String, tag: String,
                    applicants: String)

  case class DetailRow(job_url: String, pos: Int, label: String, value: String)

  /** One shared client per JVM (executor): connection pool + TLS context
    * initialize once, not once per fetched URL — the same once-per-
    * partition-not-per-row rule the multimodal batch decode follows.
    */
  @transient private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10))
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  /** One GET; any non-200 throws (counted against the error budget). */
  def fetchPage(url: String, timeoutMs: Long = 10000L): String = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofMillis(timeoutMs))
      .header("User-Agent", "graft-crawler/1.0")
      .GET().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new java.io.IOException(s"HTTP ${resp.statusCode()} for $url")
    resp.body()
  }

  private val jobBlock =
    """(?s)<article[^>]*class="[^"]*job-summary[^"]*"[^>]*>(.*?)</article>""".r
  private val jobLink =
    """(?s)<a[^>]*class="[^"]*job-name[^"]*"[^>]*href="([^"]*)"[^>]*>(.*?)</a>""".r
  private val companyRe =
    """(?s)<a[^>]*class="[^"]*company[^"]*"[^>]*>(.*?)</a>""".r
  private val dateRe =
    """(?s)<span[^>]*class="[^"]*date[^"]*"[^>]*>(.*?)</span>""".r
  private val hiringRe =
    """(?s)<div[^>]*class="[^"]*actively-hiring-tag[^"]*"[^>]*>(.*?)</div>""".r
  private val applicantsRe =
    """(?s)<span[^>]*class="[^"]*applicants[^"]*"[^>]*>(.*?)</span>""".r
  private val detailRowRe =
    """(?s)<div[^>]*class="[^"]*list-row[^"]*"[^>]*>.*?<h3[^>]*>(.*?)</h3>.*?<div[^>]*class="[^"]*list-row__data[^"]*"[^>]*>(.*?)</div>""".r

  private def strip(s: String): String =
    s.replaceAll("<[^>]*>", "").trim

  /** The reference's list scan (S2 over S1's page): one row per
    * div.job-summary node; missing optional fields default to ""
    * (P6 semantics, test.py:190-204).
    */
  def extractJobRows(html: String): Seq[(String, String, String, String, String, String)] =
    jobBlock.findAllMatchIn(html).map(_.group(1)).map { b =>
      val (url, name) = jobLink.findFirstMatchIn(b)
        .map(m => (m.group(1), strip(m.group(2)))).getOrElse(("", ""))
      ( name, url,
        companyRe.findFirstMatchIn(b).map(m => strip(m.group(1))).getOrElse(""),
        dateRe.findFirstMatchIn(b).map(m => strip(m.group(1))).getOrElse(""),
        hiringRe.findFirstMatchIn(b).map(m => strip(m.group(1))).getOrElse(""),
        applicantsRe.findFirstMatchIn(b).map(m => strip(m.group(1))).getOrElse(""))
    }.toSeq

  /** The detail page's label/value rows (S4 -> the §2.3 kv-pivot long
    * table): document order preserved as `pos`.
    */
  def extractDetailRows(html: String): Seq[(Int, String, String)] =
    detailRowRe.findAllMatchIn(html).zipWithIndex.map { case (m, i) =>
      (i + 1, strip(m.group(1)), strip(m.group(2)))
    }.toSeq

  /** Fetch every keyword's search page and extract job rows,
    * distributed: keywords spread over tasks, each task fetches
    * sequentially with `delayMs` pacing and its own `maxErrors` budget.
    * Output feeds `.write.format("graft-keyword")` (the landing zone)
    * or the cleaning pipeline directly.
    */
  def crawlKeywords(spark: SparkSession, keywords: Seq[String],
                    urlTemplate: String, delayMs: Long = 0L,
                    maxErrors: Int = 3,
                    maxParallelism: Int = DefaultCrawlParallelism): Dataset[JobRow] = {
    import spark.implicits._
    val errs = spark.sparkContext.longAccumulator("graft.crawl.errors")
    spark.createDataset(keywords)
      // at least 1 (repartition(0) throws on an empty keyword list); cap
      // available for politeness ceilings against a single host
      .repartition(math.max(1, math.min(math.min(keywords.size, maxParallelism),
        spark.sparkContext.defaultParallelism)))
      .mapPartitions { kws =>
        var errors = 0
        kws.flatMap { kw =>
          try {
            val url = urlTemplate.replace("{keyword}",
              java.net.URLEncoder.encode(kw, "UTF-8"))
            hostThrottle.acquireFor(url, delayMs)
            extractJobRows(fetchPage(url)).map { case (n, u, c, d, t, a) =>
              JobRow(kw, n, u, c, d, t, a)
            }
          } catch {
            case e: Exception =>
              errors += 1; errs.add(1)
              if (errors > maxErrors)
                throw new java.io.IOException(
                  s"crawl error budget exceeded ($errors > $maxErrors)", e)
              Nil
          }
        }
      }
  }

  /** S4: fetch each job's detail page and extract the kv long table —
    * the distributed form of the reference's open-tab-per-job loop
    * (test.py:176-179): detail URLs spread over tasks instead of one
    * sequential browser. Feeds `JobOps.kvPivotFirst` keyed on job_url.
    */
  def crawlDetails(jobs: Dataset[JobRow], delayMs: Long = 0L,
                   maxErrors: Int = 3,
                   maxParallelism: Int = DefaultCrawlParallelism): Dataset[DetailRow] = {
    val spark = jobs.sparkSession
    import spark.implicits._
    val errs = spark.sparkContext.longAccumulator("graft.detail.errors")
    jobs.select(col("job_url")).as[String].distinct()
      // same politeness ceiling as crawlKeywords: without it the
      // distinct() spreads over defaultParallelism partitions and a
      // single host sees that many concurrent request streams
      .repartition(math.max(1,
        math.min(maxParallelism, spark.sparkContext.defaultParallelism)))
      .mapPartitions { urls =>
        var errors = 0
        urls.flatMap { u =>
          try {
            hostThrottle.acquireFor(u, delayMs)
            extractDetailRows(fetchPage(u)).map { case (p, l, v) =>
              DetailRow(u, p, l, v)
            }
          } catch {
            case e: Exception =>
              errors += 1; errs.add(1)
              if (errors > maxErrors)
                throw new java.io.IOException(
                  s"detail error budget exceeded ($errors > $maxErrors)", e)
              Nil
          }
        }
      }
  }

  /** The full transport path into the engine: crawl -> typed landing
    * zone through the DSv2 connector's two-phase commit -> connector
    * scan. After this, `spark.read.format("graft-keyword").load(zone)`
    * serves the crawled rows with pruning/pushdown like any table.
    */
  def crawlToZone(spark: SparkSession, keywords: Seq[String],
                  urlTemplate: String, zone: String,
                  delayMs: Long = 0L): DataFrame = {
    val fields = "job_name:string,job_url:string,company:string," +
      "update_date:string,tag:string,applicants:string"
    crawlKeywords(spark, keywords, urlTemplate, delayMs).toDF()
      .write.format("graft-keyword")
      .option("fields", fields)
      .mode("append").save(zone)
    spark.read.format("graft-keyword")
      .option("fields", fields)
      .load(zone)
  }
}
