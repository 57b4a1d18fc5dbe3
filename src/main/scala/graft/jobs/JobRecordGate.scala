package graft.jobs

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The flagship reference artifact inside the oracle gate: the ~30-field
  * job record with the nested 8-map analysis struct (test.py:527-534,
  * empty-map defaults test.py:515-524), assembled by the REAL operator
  * pipeline — P2-P8 cleaning, the §2.3 kv-pivot, A5/A6/A7 map
  * constructors, J1 analysis attach, A9 defaults, P12 row quality — over
  * deterministic fixture long tables derived from `documents`, and
  * hash-compared against a DuckDB oracle that re-derives every stage
  * from the same raw strings (not from precomputed answers).
  *
  * Fixture shape (job_id = doc_id < 120):
  *  - list rows carry raw crawler strings (padded name, 更新-prefixed
  *    date, 應徵人數 range, presence tag) that the P-series must clean;
  *  - detail rows are (job_id, pos, label, value) with per-(id,label)
  *    presence holes, duplicate first-match rows, and '、'-joined
  *    multi-value labels — jobs with id%11==0 lose all labels beyond
  *    the first three, forcing the >6-empty-fields error flag;
  *  - analysis fragments reuse the q82/q83/q89 bar/chart formulas, so
  *    jobs carry 0-2 gender entries, 2-language skill maps, and an age
  *    chart with malformed lines that must be dropped.
  * Maps are emitted as sorted "k=v|k=v" scalar strings (the q82/q83
  * driver-gate serialization); the five never-populated analysis maps
  * must serialize as '' — proving the A9 empty-map defaults actually
  * materialize (not nulls).
  */
object JobRecordGate {

  private val N_JOBS = 120

  private def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete()
  }

  /** Marker file [[freshZone]] drops inside every zone it creates: the
    * sweep only deletes directories carrying it, so deletion is opt-in
    * by construction — a user/tool directory in the shared tmpdir that
    * merely LOOKS like a zone (e.g. `graft-data-7`) is never touched
    * (ADVICE r8).
    */
  private val ZoneMarker = ".graft-zone"

  /** Sweep ORPHANED sibling zones: a hard-killed driver never runs its
    * shutdown hook, so its graft-*-<pid> scratch zones outlive it
    * (round-7 VERDICT #4 — nothing ever deleted them). Any tmpdir
    * DIRECTORY matching the zone naming AND carrying the [[ZoneMarker]]
    * sentinel whose embedded PID is no longer alive is removed; live
    * PIDs (a concurrent driver on the same box) are left alone, as is
    * anything not shaped like a zone or not marker-stamped as one. Runs
    * once per JVM via [[freshZone]]; callable directly for tests.
    */
  private[graft] def sweepOrphanZones(): Unit = {
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    val self = java.lang.ProcessHandle.current().pid()
    val zoneName = "^graft-.*-(\\d+)$".r
    def alive(pid: Long): Boolean = {
      val h = java.lang.ProcessHandle.of(pid)
      h.isPresent && h.get().isAlive()
    }
    Option(tmp.listFiles()).foreach(_.foreach { f =>
      if (f.isDirectory && new java.io.File(f, ZoneMarker).isFile)
        f.getName match {
          case zoneName(pid) =>
            scala.util.Try(pid.toLong).toOption
              .filter(p => p != self && !alive(p))
              .foreach(_ => rmTree(f))
          case _ => ()
        }
    })
  }
  private lazy val sweepOnce: Unit = sweepOrphanZones()

  /** Scratch zone for a gate query's stream/sink dirs. Keyed by dataset
    * dir AND process (PID@host) so two concurrent drivers on the same SF
    * (bench next to verify) can never rm -rf each other's in-flight
    * zones; re-running a query in the SAME process still gets the
    * pre-delete it needs for a fresh checkpoint. Zones are registered
    * for deletion on JVM exit, and the first zone of a process sweeps
    * any dead-PID leftovers from hard-killed predecessors.
    */
  private[graft] def freshZone(prefix: String, d: String): java.io.File = {
    sweepOnce
    val zone = new java.io.File(
      System.getProperty("java.io.tmpdir"),
      prefix + d.replaceAll("[^A-Za-z0-9.]", "_") + "-" +
        java.lang.ProcessHandle.current().pid())
    rmTree(zone)
    // stamp the marker the orphan sweep requires before it will delete
    zone.mkdirs()
    new java.io.FileOutputStream(new java.io.File(zone, ZoneMarker)).close()
    exitZones.synchronized { exitZones += zone }
    zone
  }

  private lazy val exitZones: scala.collection.mutable.Set[java.io.File] = {
    val zones = scala.collection.mutable.Set[java.io.File]()
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      zones.synchronized { zones.foreach(rm) }
    }))
    zones
  }

  /** One crawler tick's raw snapshot (JobSnapshotStream.rawSchema fields,
    * all derived from doc_id so duplicates across ticks are
    * content-identical except crawl_ts).
    */
  private def snapshot(s: SparkSession, d: String, tick: Int,
                       lo: Int, hi: Int): DataFrame =
    Tables.documents(s, d)
      .filter(col("doc_id") >= lo && col("doc_id") < hi)
      .select(
        concat(lit(" 職"), col("doc_id"), lit(" ")).as("job_name"),
        concat(lit("https://www.104.com.tw/job/j"), col("doc_id")).as("job_url"),
        when(pmod(col("doc_id"), lit(10)) === 0, "")
          .otherwise(concat(lit("公司"), pmod(col("doc_id"), lit(30)))).as("company"),
        when(pmod(col("doc_id"), lit(7)) === 3, "")
          .otherwise(lit("更新2025/03/01")).as("update_date"),
        when(pmod(col("doc_id"), lit(4)) === 0, "積極徵才中").as("tag"),
        when(pmod(col("doc_id"), lit(5)) === 0, "")
          .otherwise(lit("應徵人數 3~8 人")).as("applicants"),
        when(pmod(col("doc_id"), lit(2)) === 0, "")
          .otherwise(lit("需負擔管理責任")).as("management"),
        when(pmod(col("doc_id"), lit(3)) === 0, "Python、SQL")
          .otherwise(lit("")).as("tools"),
        lit("大學").as("education"),
        when(pmod(col("doc_id"), lit(6)) === 5, "月薪40000")
          .otherwise(lit("")).as("salary"),
        timestamp_millis(lit(1735689600000L) + col("doc_id") * 1000 +
          lit(tick * 600000L)).as("crawl_ts"))

  /** Drain the checkpointed snapshot stream to the jobs table. */
  private def drain(s: SparkSession, inDir: String, outDir: String,
                    ckDir: String): Unit = {
    val cleaned = graft.streaming.JobSnapshotStream.clean(
      graft.streaming.JobSnapshotStream.readSnapshots(s, inDir))
    val q = graft.streaming.JobSnapshotStream.toJobsTable(
      graft.streaming.JobSnapshotStream.dedup(cleaned), outDir, ckDir).start()
    q.awaitTermination()
  }

  /** Gate streams run on a session clone with `spark.sql.shuffle.partitions`
    * sized to the stream's STATE key cardinality (hundreds of job_urls /
    * user_ids here), not the batch shuffle default: every stateful
    * micro-batch writes one state-store delta + commit set PER PARTITION
    * per trigger, so partitions beyond the concurrent-key scale are pure
    * checkpoint I/O at any data size — 11 micro-batches x 32 partitions
    * was ~4x the file traffic of the same stream at 8. Production sizes
    * this the same way: state partition count follows expected concurrent
    * keys (it is pinned into the checkpoint at first start and cannot be
    * changed later), while batch queries keep the cluster-wide default.
    * `newSession` shares the SparkContext, catalog, and cache; only the
    * conf diverges. Delegates to the PUBLIC knob
    * ([[graft.streaming.StreamConf.stateSession]]) so production users
    * of the streaming entry points get the same sizing surface the gate
    * harness uses (VERDICT r8 #6).
    */
  private def streamSession(s: SparkSession): SparkSession =
    graft.streaming.StreamConf.stateSession(s, 8)

  /** The content aggregate both streaming gates end in (crawl_ts-free, so
    * which duplicate copy survived dedup cannot affect the hash).
    */
  private def jobsTableAgg(df: DataFrame): DataFrame = df
    .groupBy(col("quality"), col("actively_hiring"))
    .agg(count(lit(1)).as("n"),
         sum(length(col("job_name"))).cast("long").as("name_chars"),
         countDistinct(col("apply_code")).as("n_codes"),
         min(col("job_url")).as("first_url"),
         max(col("company")).as("last_company"))
    .orderBy(col("quality"), col("actively_hiring"))

  /** Sorted map entries -> one scalar string (driver-gate hashability). */
  /** The q114/q119 animated-GIF fixture table: per id, 1 + id%3
    * solid-color 7x3 frames (color = pure (id, frame) formula) encoded
    * through the JDK's own GIF writer on executors. Shared so the
    * whole-payload decode gate (q114) and the frame-sampling gate
    * (q119) run over byte-identical fixtures.
    */
  private def gifMedia(s: SparkSession, d: String)
      : org.apache.spark.sql.Dataset[graft.multimodal.MediaOps.MediaRecord] = {
    import s.implicits._
    val W = 7; val H = 3
    val encode = udf((id: Long) => {
      import javax.imageio.{IIOImage, ImageIO}
      val writer = ImageIO.getImageWritersBySuffix("gif").next()
      val out = new java.io.ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(out)
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      (0 until (1 + (id % 3)).toInt).foreach { f =>
        val r = ((id * 53 + f * 71) % 256).toInt
        val g = ((id * 59 + f * 37) % 256).toInt
        val b = ((id * 61 + f * 29) % 256).toInt
        val img = new java.awt.image.BufferedImage(
          W, H, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var p = 0
        while (p < W * H) { img.setRGB(p % W, p / W, (r << 16) | (g << 8) | b); p += 1 }
        writer.writeToSequence(new IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
      writer.dispose(); ios.close()
      out.toByteArray
    })
    Tables.rebalance(
        Tables.documents(s, d).filter(col("doc_id") < 200)
          .select(col("doc_id").as("media_id")))
      .withColumn("payload", encode(col("media_id")))
      .select(col("media_id"),
        struct(lit("video").as("kind"), lit(W).as("declaredWidth"),
               lit(H).as("declaredHeight"), lit(0).as("sampleRate")).as("meta"),
        col("payload"))
      .as[graft.multimodal.MediaOps.MediaRecord]
  }

  private def entries(m: Column): Column = {
    // expr-free form of the q82/q83 serialization, reusable on any map col
    array_join(transform(sort_array(map_entries(m)),
      e => concat(e.getField("key"), lit("="), e.getField("value"))), "|")
  }

  /** The temporal-gate GIF fixture encoder shared by q157 (8×6 grid)
    * and q167 (16×8): F frames of md5-derived per-(base, frame, pixel,
    * channel) colors written through the JDK GIF writer with an
    * EXPLICIT exact indexed palette (≤ W·H distinct colors per frame,
    * so the round-trip is lossless by construction — setRGB resolves
    * each pixel to its own entry, no quantization anywhere); ids ≥ 100
    * re-encode base id−100 with a +40 bump at pixel (3, 2) of frame
    * id % F. */
  private def encodeTemporalGif(id: Long, W: Int, H: Int,
                                F: Int): Array[Byte] =
    encodeTemporalGifKeyed(id % 100, if (id >= 100) (id % F).toInt else -1,
      W, H, F)

  /** The SAME temporal fixture as raw-DIB AVI (round 16, q172): the
    * identical md5 per-(base, frame, pixel, channel) color formula —
    * so the DuckDB oracle derivation is container-agnostic by
    * construction — written through [[graft.multimodal.AviParser
    * .encode]] instead of the JDK GIF writer. Raw 24-bit BGR frames
    * round-trip losslessly with no palette at all, so unlike the GIF
    * fixture this form has no distinct-color ceiling. */
  private[graft] def encodeTemporalAviKeyed(key: Long, bumpFrame: Int,
                                            W: Int, H: Int,
                                            F: Int): Array[Byte] =
    graft.multimodal.AviParser.encode(W, H,
      temporalAviFrames(key, bumpFrame, W, H, F))

  private def temporalAviFrames(key: Long, bumpFrame: Int, W: Int,
                                H: Int, F: Int): Seq[Array[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until F).map { f =>
      def ch(x: Int, y: Int, c: Int): Int = {
        val b = md.digest(s"$key|$f|$x|$y|$c".getBytes("UTF-8"))(0) & 0xff
        val bump = if (f == bumpFrame && x == 3 && y == 2) 40 else 0
        (b + bump) % 256
      }
      Array.tabulate(W * H) { p =>
        val x = p % W; val y = p / W
        (ch(x, y, 0) << 16) | (ch(x, y, 1) << 8) | ch(x, y, 2)
      }
    }
  }

  /** The q172 temporal AVI fixture with an INTERLEAVED PCM audio
    * stream (round 17, q175): frames from the SAME md5 pixel formula
    * under (`key`, `bumpFrame`), audio samples from q174/q155's
    * formula under an INDEPENDENT (`audioKey`, `click`) — one
    * container whose two fingerprint modalities relate to history
    * DIFFERENTLY, which is the whole point of a joint A/V verdict. */
  private[graft] def encodeTemporalAviKeyedAV(key: Long, bumpFrame: Int,
      W: Int, H: Int, F: Int, audioKey: Long, click: Boolean,
      nSamples: Int = 800, sampleRate: Int = 16000): Array[Byte] =
    graft.multimodal.AviParser.encodeWithAudio(W, H,
      temporalAviFrames(key, bumpFrame, W, H, F), sampleRate,
      audioSamples(audioKey, click, 400, nSamples))

  /** The ONE audio-sample formula behind q155/q161/q174/q175 (the
    * mediaFixtureBmp rule applied to the time axis): md5-derived
    * signed samples per (key, index), an optional +1500 click at
    * `clickAt`. A tuning change lands here once or the fixture
    * family silently diverges from its SQL twins. */
  private[graft] def audioSamples(key: Long, click: Boolean,
                                  clickAt: Int, n: Int): Array[Short] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate[Short](n) { i =>
      val h = md.digest(s"$key|$i".getBytes("UTF-8"))
      val v = (((h(0) & 0xff) << 8) | (h(1) & 0xff)) % 4001 - 2000
      (v + (if (click && i == clickAt) 1500 else 0)).toShort
    }
  }

  /** The v-LEVEL grid behind the MJPEG temporal fixture: five gray
    * levels (40 + 36·v, r=g=b) with a closed-form walk that makes
    * horizontally-adjacent levels ALWAYS distinct —
    * v(x) = (v0 + x + Σ_{i≤x} (h_i % 4)) % 5, steps 1..4 mod 5 — so
    * every dHash comparison carries a ≥ 108-unit summed-gray margin,
    * far past the JDK JPEG codec's error, and the fingerprint is
    * EXACTLY derivable from this formula with no codec in the loop
    * (AviSpec pins decode-vs-formula equality; the q173 oracle replays
    * the same closed form in SQL). The bump (frame `bumpFrame`, row 2,
    * column 3) re-levels one cell to the smallest value distinct from
    * itself and both horizontal neighbors — no ties introduced, at
    * most 2 comparisons flip, both sides of the gate compute the same
    * flips. */
  private[graft] def mjpegLevels(key: Long, f: Int, bumpFrame: Int,
                                 w: Int, h: Int): Array[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def hb(x: Int, y: Int): Int =
      md.digest(s"$key|$f|$x|$y".getBytes("UTF-8"))(0) & 0xff
    val v = Array.tabulate(h) { y =>
      val row = new Array[Int](w)
      var acc = hb(0, y) % 5
      row(0) = acc
      var x = 1
      while (x < w) { acc = (acc + 1 + hb(x, y) % 4) % 5; row(x) = acc; x += 1 }
      row
    }
    if (f == bumpFrame) {
      val r = v(2)
      val excl = Set(r(2), r(3), r(4))
      r(3) = (0 to 4).find(c => !excl.contains(c)).get
    }
    v.flatten
  }

  /** The temporal fixture as MJPEG-in-AVI (round 16): real JPEG frames
    * inside a RIFF container, decoded by the JDK — the lossy-codec
    * tier of the video family. Pixels realize [[mjpegLevels]]. */
  private[graft] def encodeTemporalMjpegKeyed(key: Long, bumpFrame: Int,
                                              W: Int, H: Int,
                                              F: Int): Array[Byte] = {
    val frames = (0 until F).map { f =>
      mjpegLevels(key, f, bumpFrame, W, H).map { v =>
        val g = 40 + 36 * v
        (g << 16) | (g << 8) | g
      }
    }
    graft.multimodal.AviParser.encodeMjpeg(W, H, frames, quality = 1.0f)
  }

  /** The keyed form: `key` selects the base pixel sequence, `bumpFrame`
    * (−1 = none) the single edited frame — lets ledger-family fixtures
    * (q169's key/bump map) share the one GIF construction. */
  private[graft] def encodeTemporalGifKeyed(key: Long, bumpFrame: Int,
                                            W: Int, H: Int,
                                            F: Int): Array[Byte] = {
    import javax.imageio.{IIOImage, ImageIO}
    val base = key
    val editF = bumpFrame
    val md = java.security.MessageDigest.getInstance("MD5")
    val writer = ImageIO.getImageWritersBySuffix("gif").next()
    val out = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until F).foreach { f =>
      def ch(x: Int, y: Int, c: Int): Int = {
        val b = md.digest(s"$base|$f|$x|$y|$c".getBytes("UTF-8"))(0) & 0xff
        val bump = if (f == editF && x == 3 && y == 2) 40 else 0
        (b + bump) % 256
      }
      val colors = Array.tabulate(W * H) { p =>
        val x = p % W; val y = p / W
        (ch(x, y, 0) << 16) | (ch(x, y, 1) << 8) | ch(x, y, 2)
      }
      val pal = colors.distinct
      val cm = new java.awt.image.IndexColorModel(8, pal.length,
        pal.map(v => ((v >> 16) & 0xff).toByte),
        pal.map(v => ((v >> 8) & 0xff).toByte),
        pal.map(v => (v & 0xff).toByte))
      val img = new java.awt.image.BufferedImage(W, H,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
      var p = 0
      while (p < W * H) { img.setRGB(p % W, p / W, colors(p)); p += 1 }
      writer.writeToSequence(new IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    writer.dispose(); ios.close()
    out.toByteArray
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q101_job_record" -> ((s, d) => {
      val ids = Tables.documents(s, d).filter(col("doc_id") < N_JOBS)
        .select(col("doc_id").as("job_id"))

      // ---- S2 list scan: raw crawler strings, cleaned by P2-P8
      val cleaned = ids
        .withColumn("raw_name", concat(lit(" 職位"), col("job_id"), lit(" ")))
        .withColumn("job_url", concat(lit("https://www.104.com.tw/job/j"),
          col("job_id"), lit("?jobsource=x")))
        .withColumn("raw_update",
          concat(lit("更新2025/0"), pmod(col("job_id"), lit(9)) + 1, lit("/15")))
        .withColumn("tag", when(pmod(col("job_id"), lit(3)) === 0, "積極徵才中")
          .when(pmod(col("job_id"), lit(3)) === 1, ""))
        .withColumn("raw_apct", when(pmod(col("job_id"), lit(5)) === 0, "")
          .otherwise(concat(lit("應徵人數 "), pmod(col("job_id"), lit(7)),
            lit("~"), pmod(col("job_id"), lit(7)) + 5, lit(" 人"))))
        .select(col("job_id"),
          trim(col("raw_name")).as("job_name"),
          concat(lit("公司"), pmod(col("job_id"), lit(40))).as("company"),
          JobOps.cleanUpdateDate(col("raw_update")).as("update_date"),
          JobOps.activelyHiringFlag(col("tag")).as("actively_hiring"),
          JobOps.cleanApplicants(col("raw_apct")).as("applicants"),
          JobOps.applyCode(col("job_url")).as("apply_code"))
        .withColumn("analysis_url", JobOps.analysisUrl(col("apply_code")))

      // ---- §2.3 detail rows -> ONE pivot (kvPivotFirst)
      val labels = JobSchema.detailLabels.map(_._1)
      val details = ids
        .select(col("job_id"), posexplode(typedLit(labels)).as(Seq("li", "label")))
        .select(col("job_id"), col("li"), col("label"),
          explode(sequence(lit(0), lit(1))).as("rep"))
        // presence holes: 2 labels per job vanish; id%11 jobs lose all but
        // the first 3 labels (the error-row regime); rep=1 rows exist for
        // the multi-valued labels and the (id+li)%5 first-match duplicates
        .filter(pmod(col("job_id") + col("li"), lit(7)) =!= 0 &&
          !(pmod(col("job_id"), lit(11)) === 0 && col("li") >= 3) &&
          (col("rep") === 0 || col("li").isin(10, 11, 12) ||
            pmod(col("job_id") + col("li"), lit(5)) === 0))
        .select(col("job_id"),
          (col("li") * 2 + col("rep") + 1).as("pos"),
          col("label"),
          concat(lit("v"), pmod(col("job_id") * 13 + col("li") * 7 + col("rep") * 3,
            lit(97))).as("value"))
      val wide = JobOps.kvPivotFirst(details)

      // ---- A5 gender bars (q82 formulas), A6 language bars (q83), A7 age
      // chart (q89's single-chart form with malformed-line drops)
      val genderBars = ids
        .select(col("job_id"), explode(sequence(lit(0), lit(2))).as("pos"))
        .withColumn("dr", pmod(col("job_id") * 7 + col("pos") * 11, lit(13)) - 6)
        .withColumn("style", concat(lit("width: 30%; background-color: "),
          when(col("pos") === 0,
            concat(lit("rgb("), lit(78) + col("dr"), lit(", 145, 255)")))
          .when(col("pos") === 1,
            concat(lit("rgb(255, "), lit(144) + col("dr"), lit(", 199)")))
          .otherwise(lit("rgb(10, 20, 30)"))))
        .withColumn("text",
          concat(pmod(col("job_id") * 3 + col("pos") * 17, lit(100)), lit("%")))
      val gender = JobOps.genderMap(genderBars)

      val legend = array(lit("rgb(200, 200, 200)"), lit("rgb(151, 195, 255)"),
        lit("rgb(102, 165, 255)"), lit("rgb(41, 128, 255)"), lit("rgb(7, 7, 7)"))
      val langBars = ids
        .select(col("job_id"), posexplode(array(lit("英文"), lit("日文")))
          .as(Seq("lgi", "lang")))
        .select(col("job_id"), col("lgi"), col("lang"),
          explode(sequence(lit(0), lit(1))).as("pos"))
        .withColumn("ci",
          pmod(col("job_id") * 5 + col("pos") * 3 + col("lgi") * 7, lit(5)))
        .withColumn("style", concat(lit("background-color: "),
          element_at(legend, col("ci").cast("int") + 1)))
        .withColumn("text",
          concat(pmod(col("job_id") + col("pos") * 29, lit(100)), lit("%")))
      val lang = JobOps.languageMap(langBars)

      val ageLines = ids
        .withColumn("title", lit("年齡"))
        .select(col("job_id"), col("title"),
          explode(sequence(lit(0), lit(2))).as("pos"))
        .withColumn("line",
          when(pmod(col("job_id") + col("pos"), lit(3)) === 0,
            concat(lit("bad"), col("pos")))
          .otherwise(concat(lit("b"), col("pos"), lit("歲"), lit("\n"),
            pmod(col("job_id") * 7 + col("pos") * 13, lit(100)), lit("%"))))
      val age = JobOps.chartMap(ageLines, "job_id", "title", "line")
        .select(col("job_id"), col("m").as("age"))

      // ---- J1 attach + A9 defaults: the 8-map struct, empty maps where
      // no fragment produced an entry (NEVER null)
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

      val qualityCols = Seq("job_name", "company", "update_date", "applicants") ++
        JobSchema.detailLabels.map(_._2)

      cleaned
        .join(wide, Seq("job_id"), "left_outer")
        .join(analysis, Seq("job_id"), "left_outer")
        .withColumn("analysis", coalesce(col("analysis"), JobOps.emptyAnalysis))
        .withColumn("quality", JobOps.rowQualityFlag(qualityCols))
        .select(
          Seq(col("job_id"), col("job_name"), col("company"), col("update_date"),
            col("actively_hiring"), col("applicants"), col("apply_code"),
            col("analysis_url")) ++
          JobSchema.detailLabels.map { case (_, n) => col(n) } ++
          Seq("education", "gender", "language_skills", "age", "experience",
            "major", "skills", "certificates").map(m =>
            entries(col(s"analysis.$m")).as(s"a_$m")) :+
          col("quality"): _*)
        .orderBy(col("job_id"))
    }),

    // ---- q102: the PRODUCTION streaming lifecycle (S3/T1-T3) inside the
    // oracle gate, via q88's drain-a-runtime-surface pattern: two crawl
    // snapshot "ticks" (overlapping doc ranges — a re-crawl) land as JSON
    // drops, the checkpointed JobSnapshotStream pipeline (readStream ->
    // JobOps cleaning -> watermarked dropDuplicatesWithinWatermark ->
    // parquet jobs table, Trigger.AvailableNow) drains them, and the
    // RESULTING jobs table is aggregated. The oracle aggregates the
    // deduped union of the same synthetic snapshots directly — so offset
    // handling, schema-on-stream JSON parsing, the shared batch/stream
    // cleaning operators, cross-tick dedup, and the parquet sink are all
    // inside the hash. Duplicate rows differ only in crawl_ts and every
    // output aggregate is content-derived, so which copy survives dedup
    // cannot affect the hash.
    "q102_stream_lifecycle" -> ((s, d) => {
      val zone = freshZone("graft-stream-", d)
      val inDir = new java.io.File(zone, "in").getAbsolutePath
      val outDir = new java.io.File(zone, "jobs").getAbsolutePath
      val ckDir = new java.io.File(zone, "ck").getAbsolutePath
      val ss = streamSession(s)
      snapshot(s, d, 1, 0, 150).write.mode("overwrite").json(inDir)
      snapshot(s, d, 2, 100, 250).write.mode("append").json(inDir)
      drain(ss, inDir, outDir, ckDir)
      jobsTableAgg(ss.read.parquet(outDir))
    }),

    // ---- q105: checkpointed RESUME in the gate (T3 exactly-once): the
    // stream drains tick 1 to completion, STOPS, tick 2 (including
    // re-crawls of docs 100-149) lands, and a SECOND start() from the
    // same checkpoint resumes — the offset log must skip tick-1 files
    // (no reprocessing => no duplicate rows from run 1) and the restored
    // dropDuplicatesWithinWatermark state must discard the re-crawled
    // overlap (cross-RUN dedup, not just cross-batch). Same oracle as
    // q102: two runs over split input must equal one run over all of it.
    "q105_stream_resume" -> ((s, d) => {
      val zone = freshZone("graft-resume-", d)
      val inDir = new java.io.File(zone, "in").getAbsolutePath
      val outDir = new java.io.File(zone, "jobs").getAbsolutePath
      val ckDir = new java.io.File(zone, "ck").getAbsolutePath
      val ss = streamSession(s)
      snapshot(s, d, 1, 0, 150).write.mode("overwrite").json(inDir)
      drain(ss, inDir, outDir, ckDir)
      snapshot(s, d, 2, 100, 250).write.mode("append").json(inDir)
      drain(ss, inDir, outDir, ckDir) // resume: same checkpoint, new files only
      jobsTableAgg(ss.read.parquet(outDir))
    }),

    // ---- q106: the error counter / bounded error budget (A8/T5,
    // test.py:129-144 `max_errors=3`) through Spark's Observation API —
    // the engine's form of the reference's `crawler_error` accumulator:
    // metrics ride the SAME pass as the query (one scan, no second job),
    // collected on the driver after the action, and the stop/continue
    // decision is made there (exactly where the reference breaks its
    // crawl loop). The observed counts re-enter the gate as a one-row
    // frame the oracle recomputes in SQL — so the observe() plumbing
    // must count precisely.
    "q106_error_budget" -> ((s, d) => {
      val obs = org.apache.spark.sql.Observation("budget")
      val flagged = Tables.events(s, d)
        .observe(obs,
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_errors"),
          count(lit(1)).as("n_rows"))
      flagged.write.format("noop").mode("overwrite").save() // drive the pass
      val m = obs.get
      val nErrors = m("n_errors").asInstanceOf[Long]
      val nRows = m("n_rows").asInstanceOf[Long]
      import s.implicits._
      Seq((nErrors, nRows,
        if (nErrors > 3L) "stop" else "continue"))
        .toDF("n_errors", "n_rows", "decision")
    }),

    // ---- q115: the streaming ERROR-BUDGET STOP (T5, test.py:129-144
    // `max_errors=3` abort) driver-gated, not just spec'd: crawl ticks
    // land one file per micro-batch (maxFilesPerTrigger=1, mtime-ordered),
    // ticks 0-3 carry 20 extractable rows + ONE corrupt row each, ticks
    // 4-10 are wholly corrupt. The stream observes the corrupt count
    // ("budget"), filters corrupt rows before the sink, and
    // ErrorBudgetListener STOPS the otherwise-unbounded ProcessingTime
    // query once cumulative errors exceed 3 — which by construction can
    // only happen after every extractable row is committed, so the
    // partial output is exactly ticks 0-3's good rows no matter where in
    // the corrupt tail the async stop lands. `stopped_by_budget` is
    // awaitTermination's verdict on a query that ONLY the listener can
    // terminate (a broken listener times out -> FALSE -> hash mismatch),
    // and the row aggregate re-enters the same oracle as q102.
    "q115_stream_error_budget" -> ((s, d) => {
      val zone = freshZone("graft-budget-", d)
      val inDir = new java.io.File(zone, "in"); inDir.mkdirs()
      val outDir = new java.io.File(zone, "jobs").getAbsolutePath
      val ckDir = new java.io.File(zone, "ck").getAbsolutePath
      val t0 = System.currentTimeMillis() - 7200000L
      val corruptLine =
        """{"job_name":"壞","job_url":"bad://dropped","crawl_ts":"2025-01-01T00:00:00.000Z"}"""
      (0 until 4).foreach { i =>
        val stage = new java.io.File(zone, s"stage$i")
        snapshot(s, d, 1, i * 20, (i + 1) * 20).coalesce(1)
          .write.mode("overwrite").json(stage.getAbsolutePath)
        val part = stage.listFiles().find(_.getName.startsWith("part-")).get
        val dest = new java.io.File(inDir, f"tick$i%02d.json")
        java.nio.file.Files.move(part.toPath, dest.toPath)
        java.nio.file.Files.write(dest.toPath,
          (corruptLine + "\n").getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.APPEND)
        dest.setLastModified(t0 + i * 1000L)
      }
      (4 until 11).foreach { i =>
        val dest = new java.io.File(inDir, f"tick$i%02d.json")
        java.nio.file.Files.write(dest.toPath,
          ((corruptLine + "\n") * 5).getBytes("UTF-8"))
        dest.setLastModified(t0 + i * 1000L)
      }
      import graft.streaming.{JobSnapshotStream => JS, StatefulOps}
      val ss = streamSession(s)
      val raw = JS.readSnapshotsPaced(ss, inDir.getAbsolutePath)
      val metered = StatefulOps.withErrorMetric(raw, JS.isCorrupt, "budget")
      val cleaned = JS.clean(metered.filter(!JS.isCorrupt))
      val listener = new StatefulOps.ErrorBudgetListener(ss, 3, "budget")
      ss.streams.addListener(listener)
      val q = JS.toJobsTable(JS.dedup(cleaned), outDir, ckDir,
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0)).start()
      val stopped =
        try q.awaitTermination(120000)
        finally { if (q.isActive) q.stop(); ss.streams.removeListener(listener) }
      jobsTableAgg(ss.read.parquet(outDir))
        .withColumn("stopped_by_budget", lit(stopped))
        .withColumn("budget_exceeded", lit(listener.budgetExceeded))
    }),

    // ---- q116: JPEG decode in the gate — the last decode modality out
    // of spec-only. JPEG is LOSSY, so the q60/q63 bounded-error pattern
    // applies instead of exact pixel sums: solid-color images (one
    // 8x8-block-aligned color field per id, colors kept in [32,224) so
    // chroma subsampling can't clip) encode through the JDK JPEG writer
    // on executors, ImageIoDecoder decodes them back inside featurize,
    // and the gate hashes exact dimensions plus per-channel
    // |decoded mean - formula color| <= 8 booleans the oracle states as
    // TRUE. A decoder that misparses SOF dimensions, channel order, or
    // the color transform fails the hash; codec-version noise cannot.
    "q116_jpeg_decode" -> ((s, d) => {
      import s.implicits._
      val W = 16; val H = 8
      val encode = udf((id: Long) => {
        val r = (32 + (id * 37) % 192).toInt
        val g = (32 + (id * 41) % 192).toInt
        val b = (32 + (id * 43) % 192).toInt
        val img = new java.awt.image.BufferedImage(
          W, H, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var p = 0
        while (p < W * H) { img.setRGB(p % W, p / W, (r << 16) | (g << 8) | b); p += 1 }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", bos)
        bos.toByteArray
      })
      val media = Tables.rebalance(
          Tables.documents(s, d).filter(col("doc_id") < 200)
            .select(col("doc_id").as("media_id")))
        .withColumn("payload", encode(col("media_id")))
        .select(col("media_id"),
          struct(lit("image").as("kind"), lit(W).as("declaredWidth"),
                 lit(H).as("declaredHeight"), lit(0).as("sampleRate")).as("meta"),
          col("payload"))
        .as[graft.multimodal.MediaOps.MediaRecord]
      graft.multimodal.MediaOps.featurize(media).toDF()
        .select(col("media_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          (abs(element_at(col("feature"), 1).cast("double") * 255 -
            (lit(32) + pmod(col("media_id") * 37, lit(192)))) <= 8).as("r_in_tol"),
          (abs(element_at(col("feature"), 2).cast("double") * 255 -
            (lit(32) + pmod(col("media_id") * 41, lit(192)))) <= 8).as("g_in_tol"),
          (abs(element_at(col("feature"), 3).cast("double") * 255 -
            (lit(32) + pmod(col("media_id") * 43, lit(192)))) <= 8).as("b_in_tol"))
        .orderBy(col("media_id"))
    }),

    // ---- q118: EXECUTED image resize in the gate — upgrades the
    // resize surface from the resize_spec annotation to real pixel
    // work. 16x12 BMPs (pixel = pure (id,x,y) formula) encode on
    // executors, MediaOps.resizeImages nearest-neighbor-resamples them
    // to 8x6 (src = (2X, 2Y) at this exact 2:1 ratio), and featurize
    // decodes the RESIZED payloads — so the hash covers decode,
    // the resample's source-pixel arithmetic, and the re-encode
    // (n_bytes pins the 54 + 6*24 output layout). The oracle recomputes
    // the sampled-grid sums from the formula without touching a codec.
    "q118_image_resize" -> ((s, d) => {
      import s.implicits._
      val W = 16; val H = 12
      val encode = udf((id: Long) => {
        val px = Array.tabulate(W * H) { p =>
          val x = p % W; val y = p / W
          (((id * 29 + x * 3 + y * 11) % 256).toInt,
           ((id * 19 + x * 7 + y * 5) % 256).toInt,
           ((id * 13 + x * 9 + y * 17) % 256).toInt)
        }
        graft.multimodal.BmpDecoder.encode(W, H, px)
      })
      val media = Tables.rebalance(
          Tables.documents(s, d).filter(col("doc_id") < 200)
            .select(col("doc_id").as("media_id")))
        .withColumn("payload", encode(col("media_id")))
        .select(col("media_id"),
          struct(lit("image").as("kind"), lit(W).as("declaredWidth"),
                 lit(H).as("declaredHeight"), lit(0).as("sampleRate")).as("meta"),
          col("payload"))
        .as[graft.multimodal.MediaOps.MediaRecord]
      val resized = graft.multimodal.MediaOps.resizeImages(media, 8, 6)
      graft.multimodal.MediaOps.featurize(resized).toDF()
        .select(col("media_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_bytes").cast("long").as("n_bytes"),
          round(element_at(col("feature"), 1).cast("double") * 255 * 48)
            .cast("long").as("sum_r"),
          round(element_at(col("feature"), 2).cast("double") * 255 * 48)
            .cast("long").as("sum_g"),
          round(element_at(col("feature"), 3).cast("double") * 255 * 48)
            .cast("long").as("sum_b"))
        .orderBy(col("media_id"))
    }),

    // ---- q119: frame SAMPLING in the gate — featurizeFrames (real
    // per-frame GIF decode, q114's multi-frame fixtures) emits one row
    // per sampled frame with that frame's exact channel means; with
    // maxFrames >= the 1+id%3 frame count, evenly-spaced sampling
    // enumerates every frame index, so the oracle restates the
    // per-(id, frame) color formula directly. A frame extractor that
    // mis-seeks, composites frames, or drops the tail fails the hash.
    "q119_gif_frame_sample" -> ((s, d) => {
      import s.implicits._
      val media = gifMedia(s, d)
      graft.multimodal.MediaOps.featurizeFrames(media, 3)
        .toDF("media_id", "frame_idx", "width", "height", "r", "g", "b")
        .select(col("media_id"),
          col("frame_idx").cast("long").as("frame_idx"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          round(col("r").cast("double")).cast("long").as("r"),
          round(col("g").cast("double")).cast("long").as("g"),
          round(col("b").cast("double")).cast("long").as("b"))
        .orderBy(col("media_id"), col("frame_idx"))
    }),

    // ---- q154: IMAGE near-dup detection — perceptual dHash over
    // decoded pixels + LSH-banded hamming join, the visual analog of
    // q79's SimHash-over-text. Fixture: 100 base 8x6 BMPs with
    // md5-derived pixels (channel = first md5 byte of "base|x|y|c" —
    // decorrelated, unlike a linear gradient whose adjacent-pixel
    // deltas are id-independent and make EVERY image a near-dup of
    // every other) + 100 PERTURBED copies (ids 100-199 re-encode base
    // id-100 with a +40 bump at pixel (3, 2)) — the planted edit
    // touches only the two horizontal comparisons at that pixel, so
    // each (i, i+100) pair lands within hamming ≤ 2 of its base by
    // construction while unrelated pairs sit ~21 bits apart. Topology:
    // decode + 42-bit dHash are row-local, candidates form on a 3-band
    // pigeonhole join (t+1 bands of 14 bits: any pair within
    // hamming ≤ 2 shares an exact band — recall 1.0, no all-pairs),
    // exact popcount filter after. The hash covers the whole chain: a
    // decode drift (stride, BGR, bottom-up rows), a bit-packing drift,
    // or a banding drift each changes some pair's membership or hamming.
    "q154_image_phash_dedup" -> ((s, d) => {
      import s.implicits._
      val W = 8; val H = 6
      val encode = udf((id: Long) => {
        val base = id % 100
        val md = java.security.MessageDigest.getInstance("MD5")
        def ch(x: Int, y: Int, c: Int): Int = {
          val b = md.digest(s"$base|$x|$y|$c".getBytes("UTF-8"))(0) & 0xff
          val bump = if (id >= 100 && x == 3 && y == 2) 40 else 0
          (b + bump) % 256
        }
        val px = Array.tabulate(W * H) { p =>
          val x = p % W; val y = p / W
          (ch(x, y, 0), ch(x, y, 1), ch(x, y, 2))
        }
        graft.multimodal.BmpDecoder.encode(W, H, px)
      })
      val media = Tables.rebalance(
          Tables.documents(s, d).filter(col("doc_id") < 200)
            .select(col("doc_id").as("media_id")))
        .withColumn("payload", encode(col("media_id")))
        .select(col("media_id"),
          struct(lit("image").as("kind"), lit(W).as("declaredWidth"),
                 lit(H).as("declaredHeight"), lit(0).as("sampleRate")).as("meta"),
          col("payload"))
        .as[graft.multimodal.MediaOps.MediaRecord]
      val hashed = graft.multimodal.MediaOps.dHash(media)
        .filter(col("decoded") === 1L)
        .select(col("media_id"), col("dhash"))
      // shared skew-safe banded join (DedupOps.hammingPairs): identical
      // fingerprints collapse before banding — the blank-thumbnail /
      // logo mass a web crawl actually carries never floods a bucket
      graft.ops.DedupOps.hammingPairs(hashed, "media_id", "dhash",
          bands = 3, bandBits = 14, maxHamming = 2)
        .orderBy(col("m1"), col("m2"))
    }),

    // ---- q156: MIXED exact + near image dedup — the dedup-first
    // expansion semantics under the gate. Fixture: ids 0-99 md5-pixel
    // bases, 100-139 EXACT copies of base id-100 (identical
    // fingerprints — the blank-thumbnail mass in miniature), 140-199
    // one-pixel-edited copies of base id-140. The pair set must
    // contain all three families: within-group hamming-0 pairs
    // (i, i+100), base-edit pairs (i, i+140), and the CROSS-GROUP
    // expansion (i+100, i+140) — an exact copy is near-dup to its
    // base's near-dup. The oracle is EXHAUSTIVE all-pairs popcount
    // over the 200 formula fingerprints (no banding assumption at
    // all), so it verifies the banded + dedup-first + expansion path
    // against ground truth, not against a mirrored approximation.
    "q156_image_mixed_dedup" -> ((s, d) => {
      import s.implicits._
      val W = 8; val H = 6
      val encode = udf((id: Long) => {
        val base = if (id < 140) id % 100 else id - 140
        val md = java.security.MessageDigest.getInstance("MD5")
        def ch(x: Int, y: Int, c: Int): Int = {
          val b = md.digest(s"$base|$x|$y|$c".getBytes("UTF-8"))(0) & 0xff
          val bump = if (id >= 140 && x == 3 && y == 2) 40 else 0
          (b + bump) % 256
        }
        graft.multimodal.BmpDecoder.encode(W, H, Array.tabulate(W * H) { p =>
          (ch(p % W, p / W, 0), ch(p % W, p / W, 1), ch(p % W, p / W, 2))
        })
      })
      val media = Tables.rebalance(
          Tables.documents(s, d).filter(col("doc_id") < 200)
            .select(col("doc_id").as("media_id")))
        .withColumn("payload", encode(col("media_id")))
        .select(col("media_id"),
          struct(lit("image").as("kind"), lit(W).as("declaredWidth"),
                 lit(H).as("declaredHeight"), lit(0).as("sampleRate")).as("meta"),
          col("payload"))
        .as[graft.multimodal.MediaOps.MediaRecord]
      val hashed = graft.multimodal.MediaOps.dHash(media)
        .filter(col("decoded") === 1L)
        .select(col("media_id"), col("dhash"))
      graft.ops.DedupOps.hammingPairs(hashed, "media_id", "dhash",
          bands = 3, bandBits = 14, maxHamming = 2)
        .orderBy(col("m1"), col("m2"))
    }),

    // ---- q163: media near-dup CLUSTERS — the composition the pair
    // families defer to for cluster semantics (SCALING r13: "cluster
    // consumers feed the representatives to q75's connected
    // components"): q156's mixed exact+near fixture -> dHash ->
    // banded hamming pairs -> distributed min-label CC -> per-cluster
    // membership stats keyed by the canonical (min) member. The
    // fixture's truth: bases 0-39 form {i, i+100, i+140} triples
    // (exact copy + edited copy), 40-59 form {i, i+140} pairs, 60-99
    // stay singletons — but the oracle assumes NONE of that: it takes
    // the exhaustive popcount edge set and computes reachability with
    // a RECURSIVE min-label closure, so incidental near-pairs (or a
    // banding/expansion/CC bug) move some cluster's root or size.
    "q163_media_dedup_clusters" -> ((s, d) => {
      import s.implicits._
      val W = 8; val H = 6
      val encode = udf((id: Long) => {
        val base = if (id < 140) id % 100 else id - 140
        val md = java.security.MessageDigest.getInstance("MD5")
        def ch(x: Int, y: Int, c: Int): Int = {
          val b = md.digest(s"$base|$x|$y|$c".getBytes("UTF-8"))(0) & 0xff
          val bump = if (id >= 140 && x == 3 && y == 2) 40 else 0
          (b + bump) % 256
        }
        graft.multimodal.BmpDecoder.encode(W, H, Array.tabulate(W * H) { p =>
          (ch(p % W, p / W, 0), ch(p % W, p / W, 1), ch(p % W, p / W, 2))
        })
      })
      val media = Tables.rebalance(
          Tables.documents(s, d).filter(col("doc_id") < 200)
            .select(col("doc_id").as("media_id")))
        .withColumn("payload", encode(col("media_id")))
        .select(col("media_id"),
          struct(lit("image").as("kind"), lit(W).as("declaredWidth"),
                 lit(H).as("declaredHeight"), lit(0).as("sampleRate")).as("meta"),
          col("payload"))
        .as[graft.multimodal.MediaOps.MediaRecord]
      val hashed = graft.multimodal.MediaOps.dHash(media)
        .filter(col("decoded") === 1L)
        .select(col("media_id"), col("dhash")).localCheckpoint()
      val pairs = graft.ops.DedupOps.hammingPairs(hashed, "media_id", "dhash",
        bands = 3, bandBits = 14, maxHamming = 2)
      graft.ops.GraphOps.connectedComponents(
          hashed.select(col("media_id").as("id")),
          pairs.select(col("m1").as("src"), col("m2").as("dst")))
        .groupBy(col("root").as("cluster_root"))
        .agg(count(lit(1)).as("n_members"), max(col("id")).as("max_id"))
        .orderBy(col("cluster_root"))
    }),

    // ---- q155: AUDIO near-dup detection — q154's chain on the time
    // axis: 200 mono PCM-16 clips (800 md5-derived samples each; ids
    // 100-199 re-encode base id-100 with a +1500 click at sample 400),
    // MediaOps.audioHash packs 49 adjacent-window energy comparisons
    // (50 windows x 16 samples, energy = exact integer sum of |s|)
    // into one BIGINT, and the same 3-band pigeonhole + exact popcount
    // surfaces pairs within hamming <= 2. The click lands inside ONE
    // window, flipping at most its two comparisons — each (i, i+100)
    // pair is caught by construction; md5 samples keep unrelated clips
    // ~24 bits apart. RIFF chunk walk, sign extension, window fold,
    // bit packing, banding: all inside the hash.
    "q155_audio_phash_dedup" -> ((s, d) => {
      import s.implicits._
      val N = 800; val WIN = 50
      val encode = udf((id: Long) =>
        graft.multimodal.WavDecoder.encode(16000,
          audioSamples(id % 100, id >= 100, 400, N)))
      val media = Tables.rebalance(
          Tables.documents(s, d).filter(col("doc_id") < 200)
            .select(col("doc_id").as("media_id")))
        .withColumn("payload", encode(col("media_id")))
        .select(col("media_id"),
          struct(lit("audio").as("kind"), lit(0).as("declaredWidth"),
                 lit(0).as("declaredHeight"), lit(16000).as("sampleRate")).as("meta"),
          col("payload"))
        .as[graft.multimodal.MediaOps.MediaRecord]
      val hashed = graft.multimodal.MediaOps.audioHash(media, WIN)
        .filter(col("decoded") === 1L)
        .select(col("media_id"), col("ahash"))
      graft.ops.DedupOps.hammingPairs(hashed, "media_id", "ahash",
          bands = 3, bandBits = 17, maxHamming = 2)
        .orderBy(col("m1"), col("m2"))
    }),

    // ---- q174: AVI-with-interleaved-audio near-dup (round 17,
    // VERDICT r16 #6) — ONE A/V container yields the audio fingerprint:
    // each payload is a true RIFF/AVI with a 4-frame raw-DIB video
    // stream AND a PCM-16 mono audio stream split into per-frame
    // '01wb' chunks (the standard muxer interleave). The audio samples
    // are q155's exact formula (ids 100-199 re-encode base id-100 with
    // a +1500 click at sample 400), so the oracle is the same
    // closed-form energy-window SQL — the container walk, stream
    // demux, chunk concatenation, sign extension, window fold and
    // banding all live inside the gate while the oracle never sees a
    // byte of RIFF. The video stream is real (id-derived gray frames)
    // and decodable by the q172 path; AviSpec pins the
    // dual-modality extraction from one payload.
    "q174_avi_audio_dedup" -> ((s, d) => {
      import s.implicits._
      val N = 800; val WIN = 50; val W = 16; val H = 8
      val encode = udf((id: Long) => {
        val base = id % 100
        val md = java.security.MessageDigest.getInstance("MD5")
        val samples = audioSamples(base, id >= 100, 400, N)
        val frames = (0 until 4).map { f =>
          Array.tabulate(W * H) { p =>
            val h = md.digest(s"$base|$f|$p".getBytes("UTF-8"))
            val g = h(0) & 0xff
            (g << 16) | (g << 8) | g
          }
        }
        graft.multimodal.AviParser.encodeWithAudio(W, H, frames,
          16000, samples)
      })
      val media = Tables.rebalance(
          Tables.documents(s, d).filter(col("doc_id") < 200)
            .select(col("doc_id").as("media_id")))
        .withColumn("payload", encode(col("media_id")))
        .select(col("media_id"),
          struct(lit("video").as("kind"), lit(W).as("declaredWidth"),
                 lit(H).as("declaredHeight"), lit(16000).as("sampleRate")).as("meta"),
          col("payload"))
        .as[graft.multimodal.MediaOps.MediaRecord]
      val hashed = graft.multimodal.MediaOps.audioHash(media, WIN)
        .filter(col("decoded") === 1L)
        .select(col("media_id"), col("ahash"))
      graft.ops.DedupOps.hammingPairs(hashed, "media_id", "ahash",
          bands = 3, bandBits = 17, maxHamming = 2)
        .orderBy(col("m1"), col("m2"))
    }),

    // ---- q161: WIDE audio near-dup — q155 past the one-long window
    // ceiling: 1600-sample clips at 100 energy windows (99 comparison
    // bits = two words, 3x33-bit bands; band 1 straddles the word
    // boundary), audioHashWide packing + hammingPairsWide banding.
    // Window count is the audio fingerprint's resolution knob exactly
    // as the grid is the image one — this is the config a 10^6+-clip
    // corpus runs (SCALING.md r14 addendum 1's rule on the time axis).
    // Fixture: ids 100-199 re-encode base id-100 with a +1500 click at
    // sample 800 (one window, <= 2 comparisons flipped). Oracle:
    // exhaustive comparison-level hamming from the sample formula for
    // all pairs — RIFF walk, window fold, word packing, and straddling
    // band slices all judged purely by the pair set.
    "q161_audio_wide_dedup" -> ((s, d) => {
      import s.implicits._
      val N = 1600; val WIN = 100
      val encode = udf((id: Long) =>
        graft.multimodal.WavDecoder.encode(16000,
          audioSamples(id % 100, id >= 100, 800, N)))
      val media = Tables.rebalance(
          Tables.documents(s, d).filter(col("doc_id") < 200)
            .select(col("doc_id").as("media_id")))
        .withColumn("payload", encode(col("media_id")))
        .select(col("media_id"),
          struct(lit("audio").as("kind"), lit(0).as("declaredWidth"),
                 lit(0).as("declaredHeight"), lit(16000).as("sampleRate")).as("meta"),
          col("payload"))
        .as[graft.multimodal.MediaOps.MediaRecord]
      val hashed = graft.multimodal.MediaOps.audioHashWide(media, WIN)
        .filter(col("decoded") === 1L)
        .select(col("media_id"), col("ahash"))
      graft.ops.DedupOps.hammingPairsWide(hashed, "media_id", "ahash",
          fpBits = WIN - 1, bands = 3, bandBits = 33, maxHamming = 2)
        .orderBy(col("m1"), col("m2"))
    }),

    // ---- q157: VIDEO temporal near-dup — the composition VERDICT r13
    // missing #2 named: q119's frame sampling feeding q154's perceptual
    // hash, voted along the time axis. Fixture: 200 four-frame 8x6
    // animated GIFs (md5-derived per-(base, frame, pixel, channel)
    // colors, encoded through the JDK writer with an EXPLICIT indexed
    // palette — <= 48 distinct colors per frame, so the round-trip is
    // lossless by construction); ids 100-199 re-encode base id-100 with
    // a +40 bump at pixel (3, 2) of ONE frame (id % 4). Per planted
    // pair, 3 frames are bit-identical and the edited frame lands
    // within hamming <= 2, so the >= 3-of-4 agreement vote catches
    // every copy while unrelated videos (~21 bits apart per frame)
    // never reach it. Topology: per-frame decode + hash are row-local
    // (frameDHash), candidates form on a (frame, band, key) pigeonhole
    // join over per-position DISTINCT fingerprints (the q154
    // dedup-first discipline per position — a shared intro frame can
    // never flood a bucket), and the vote is one groupBy over pair
    // rows. The oracle is EXHAUSTIVE: per-frame hamming recomputed
    // from the pixel FORMULA for all 19,900 pairs (never the codec,
    // no banding assumption), so GIF palette drift, frame mis-seek,
    // banding, expansion, and vote bugs all flip the hash.
    "q157_video_temporal_dedup" -> ((s, d) => {
      import s.implicits._
      val W = 8; val H = 6; val F = 4
      val encode = udf((id: Long) => encodeTemporalGif(id, W, H, F))
      val media = Tables.rebalance(
          Tables.documents(s, d).filter(col("doc_id") < 200)
            .select(col("doc_id").as("media_id")))
        .withColumn("payload", encode(col("media_id")))
        .select(col("media_id"),
          struct(lit("video").as("kind"), lit(W).as("declaredWidth"),
                 lit(H).as("declaredHeight"), lit(0).as("sampleRate")).as("meta"),
          col("payload"))
        .as[graft.multimodal.MediaOps.MediaRecord]
      val frames = graft.multimodal.MediaOps.frameDHash(media, F)
      graft.ops.DedupOps.temporalNearDupPairs(frames,
          "media_id", "frame_idx", "fhash",
          bands = 3, bandBits = 14, maxHamming = 2, minAgree = 3)
        .orderBy(col("m1"), col("m2"))
    }),

    // ---- q167: WIDE video temporal near-dup — q157's vote at the
    // 16x8 frame grid (120 bits/frame, 3x40-bit straddling bands =
    // 10^12 buckets PER POSITION), the geometry a 10^6+-video corpus
    // runs: VERDICT r14 #1a measured every position of the narrow
    // 3x14 form saturating simultaneously at that scale, leaving the
    // budget cap to shed votes — the wide fingerprint keeps per-
    // position candidates linear so the cap's only job is genuinely
    // shared frames (the intro pathology). Fixture: the q157 GIF
    // construction at 16x8 (explicit indexed palette, 128 distinct
    // colors max — lossless round-trip); ids 100-199 re-encode base
    // id-100 with the +40 bump at pixel (3, 2) of frame id % 4, so
    // 3 frames are bit-identical and the edited frame flips <= 2 of
    // its 120 comparisons. Oracle: EXHAUSTIVE per-frame hamming from
    // the pixel formula for all 19,900 pairs — frameDHashWide's word
    // packing, the straddling band slices, the sequence-level dedup,
    // and the vote are all judged purely by the output set.
    "q167_video_temporal_wide" -> ((s, d) => {
      import s.implicits._
      val W = 16; val H = 8; val F = 4
      val encode = udf((id: Long) => encodeTemporalGif(id, W, H, F))
      val media = Tables.rebalance(
          Tables.documents(s, d).filter(col("doc_id") < 200)
            .select(col("doc_id").as("media_id")))
        .withColumn("payload", encode(col("media_id")))
        .select(col("media_id"),
          struct(lit("video").as("kind"), lit(W).as("declaredWidth"),
                 lit(H).as("declaredHeight"), lit(0).as("sampleRate")).as("meta"),
          col("payload"))
        .as[graft.multimodal.MediaOps.MediaRecord]
      val frames = graft.multimodal.MediaOps.frameDHashWide(media, F, W, H)
      graft.ops.DedupOps.temporalNearDupPairsWide(frames,
          "media_id", "frame_idx", "fhash", fpBits = H * (W - 1),
          bands = 3, bandBits = 40, maxHamming = 2, minAgree = 3)
        .orderBy(col("m1"), col("m2"))
    }),

    // ---- q173: the LOSSY-CODEC video tier through the temporal vote
    // (round 16) — q167's composition with REAL JPEG frames inside a
    // RIFF container: MJPEG-in-AVI payloads decode through the JDK's
    // JPEG codec on executors (AviParser MJPG chunks ->
    // ImageIoDecoder.decodePixels), per-position wide dHash, 3x40-band
    // pigeonhole vote. The fixture's five-level gray construction
    // (mjpegLevels) keeps every dHash comparison >= 108 summed-gray
    // units wide — far past the codec's round-trip error — so the
    // ORACLE recomputes the fingerprints from the closed-form level
    // formula with NO codec in the loop: the whole lossy encode ->
    // container mux -> JDK decode -> resample -> pack chain is judged
    // by whether it lands the formula's exact bit matrix (AviSpec pins
    // per-fingerprint equality; this gate pins the operator output).
    // ids >= 100 re-encode key id-100 with a one-cell re-level at
    // frame id % 4 (<= 2 comparisons flip -> that frame still agrees;
    // the vote reads 4-of-4).
    "q173_mjpeg_video_temporal" -> ((s, d) => {
      import s.implicits._
      val W = 16; val H = 8; val F = 4
      val encode = udf((id: Long) => encodeTemporalMjpegKeyed(id % 100,
        if (id >= 100) (id % F).toInt else -1, W, H, F))
      val media = Tables.rebalance(
          Tables.documents(s, d).filter(col("doc_id") < 200)
            .select(col("doc_id").as("media_id")))
        .withColumn("payload", encode(col("media_id")))
        .select(col("media_id"),
          struct(lit("video").as("kind"), lit(W).as("declaredWidth"),
                 lit(H).as("declaredHeight"), lit(0).as("sampleRate")).as("meta"),
          col("payload"))
        .as[graft.multimodal.MediaOps.MediaRecord]
      val frames = graft.multimodal.MediaOps.frameDHashWide(media, F, W, H)
      graft.ops.DedupOps.temporalNearDupPairsWide(frames,
          "media_id", "frame_idx", "fhash", fpBits = H * (W - 1),
          bands = 3, bandBits = 40, maxHamming = 2, minAgree = 3)
        .orderBy(col("m1"), col("m2"))
    }),

    // ---- q160: WIDE-fingerprint image near-dup — q156's mixed
    // exact+near fixture at the 16x8 grid (120 bits, the geometry
    // SCALING.md r13 addendum 3 prescribed for 10^6+ corpora and
    // VERDICT r13 #1 found unimplementable): dHashWide packs the bits
    // into two little-endian words, hammingPairsWide bands them 3x40
    // (band 1 straddles the word boundary — the slice arithmetic is in
    // the gate), and the candidate budget rides the same join the q49
    // family uses (inert at fixture scale: every bucket is far below
    // the 200 floor; the point is the PATH is the production path).
    // Oracle: exhaustive all-pairs hamming recomputed comparison-by-
    // comparison from the pixel formula — no words, no banding, no
    // packing assumption — so a bit-layout or slice bug changes some
    // pair's membership or distance and flips the hash.
    "q160_image_wide_dedup" -> ((s, d) => {
      import s.implicits._
      val W = 16; val H = 8
      val encode = udf((id: Long) => {
        val base = if (id < 140) id % 100 else id - 140
        val md = java.security.MessageDigest.getInstance("MD5")
        def ch(x: Int, y: Int, c: Int): Int = {
          val b = md.digest(s"$base|$x|$y|$c".getBytes("UTF-8"))(0) & 0xff
          val bump = if (id >= 140 && x == 3 && y == 2) 40 else 0
          (b + bump) % 256
        }
        graft.multimodal.BmpDecoder.encode(W, H, Array.tabulate(W * H) { p =>
          (ch(p % W, p / W, 0), ch(p % W, p / W, 1), ch(p % W, p / W, 2))
        })
      })
      val media = Tables.rebalance(
          Tables.documents(s, d).filter(col("doc_id") < 200)
            .select(col("doc_id").as("media_id")))
        .withColumn("payload", encode(col("media_id")))
        .select(col("media_id"),
          struct(lit("image").as("kind"), lit(W).as("declaredWidth"),
                 lit(H).as("declaredHeight"), lit(0).as("sampleRate")).as("meta"),
          col("payload"))
        .as[graft.multimodal.MediaOps.MediaRecord]
      val hashed = graft.multimodal.MediaOps.dHashWide(media, W, H)
        .filter(col("decoded") === 1L)
        .select(col("media_id"), col("dhash"))
      graft.ops.DedupOps.hammingPairsWide(hashed, "media_id", "dhash",
          fpBits = H * (W - 1), bands = 3, bandBits = 40, maxHamming = 2,
          pairBudgetPerDoc = Some(1000))
        .orderBy(col("m1"), col("m2"))
    }),

    // ---- q107: the LIVE transport inside the gate — a real HTTP server
    // (deterministic reference-shaped job board on localhost, no
    // egress), the executor-side crawl (S1 search pages + S4 detail
    // pages over java.net.http), regex extraction, P-series cleaning,
    // and the kv-pivot, hash-matched against a DuckDB oracle that
    // recomputes every field from the same (keyword, index) formulas.
    // Fetch/extract/clean/pivot all sit inside the hash; the ephemeral
    // port never reaches the output (apply_code is the port-free URL
    // tail). Both crawl stages materialize eagerly (localCheckpoint) so
    // the server can stop before the lazy tail evaluates.
    "q107_http_crawl" -> ((s, d) => {
      val (server, base) = graft.sources.FixtureJobServer.start()
      try {
        val jobsDs = graft.sources.HttpCrawl.crawlKeywords(
          s, graft.sources.FixtureJobServer.KEYWORDS,
          s"$base/search?keyword={keyword}").localCheckpoint(true)
        val details = graft.sources.HttpCrawl.crawlDetails(jobsDs)
          .toDF().localCheckpoint(true)
        val jobs = jobsDs.toDF()
        val cleaned = jobs.select(
          col("keyword"),
          trim(col("job_name")).as("job_name"),
          col("company"),
          JobOps.cleanUpdateDate(col("update_date")).as("update_date"),
          JobOps.activelyHiringFlag(col("tag")).as("actively_hiring"),
          JobOps.cleanApplicants(col("applicants")).as("applicants"),
          JobOps.applyCode(col("job_url")).as("apply_code"),
          col("job_url"))
        val wide = JobOps.kvPivotFirst(
          details.withColumnRenamed("job_url", "job_id")
            .select(col("job_id"), col("pos"), col("label"), col("value")),
          idCol = "job_id")
        cleaned.join(wide, cleaned("job_url") === wide("job_id"), "left_outer")
          .select(col("keyword"), col("apply_code"), col("job_name"),
            col("company"), col("update_date"), col("actively_hiring"),
            col("applicants"), col("management"), col("tools"), col("education"))
          .orderBy(col("keyword"), col("apply_code"))
      } finally server.stop(0)
    }),

    // ---- q117: the STREAMING form of the live transport — the
    // reference's scroll loop (test.py:156-166,557-566) composed from
    // both halves that q107 and q105 gate separately: each crawl tick
    // fetches over real HTTP and lands through the DSv2 zone's two-phase
    // epoch commit (crawler writes), the zone is a MICRO_BATCH_READ
    // source (connector streams), and ONE checkpoint spans two drains —
    // run 2's tick re-crawls 後端 (duplicate job_urls) plus a new
    // keyword, so the connector's file-watermark offsets must skip
    // run-1 snapshots and the restored dropDuplicatesWithinWatermark
    // state must drop the re-crawl across RUNS. Every surviving row is
    // a pure (keyword, i) formula the oracle restates; 後端 appearing
    // once (not twice) is what proves resume + cross-run dedup.
    "q117_crawl_stream_resume" -> ((s, d) => {
      val zone = freshZone("graft-crawlstream-", d)
      val landing = new java.io.File(zone, "zone").getAbsolutePath
      val outDir = new java.io.File(zone, "jobs").getAbsolutePath
      val ckDir = new java.io.File(zone, "ck").getAbsolutePath
      val fields = "job_name:string,job_url:string,company:string," +
        "update_date:string,tag:string,applicants:string"
      val ss = streamSession(s)
      def drain(): Unit = {
        val raw = ss.readStream.format("graft-keyword")
          .option("fields", fields).load(landing)
        val cleaned = raw.select(
          col("keyword"),
          trim(col("job_name")).as("job_name"),
          col("company"),
          JobOps.cleanUpdateDate(col("update_date")).as("update_date"),
          JobOps.activelyHiringFlag(col("tag")).as("actively_hiring"),
          JobOps.cleanApplicants(col("applicants")).as("applicants"),
          JobOps.applyCode(col("job_url")).as("apply_code"),
          col("job_url"),
          current_timestamp().as("crawl_ts"))
        val q = cleaned.withWatermark("crawl_ts", "1 hour")
          .dropDuplicatesWithinWatermark("job_url")
          .drop("crawl_ts")
          .writeStream.format("parquet")
          .option("path", outDir).option("checkpointLocation", ckDir)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .outputMode("append").start()
        q.awaitTermination()
      }
      val (server, base) = graft.sources.FixtureJobServer.start()
      try {
        val tmpl = s"$base/search?keyword={keyword}"
        graft.sources.HttpCrawl.crawlToZone(s, Seq("區塊鏈", "後端"), tmpl, landing)
        drain()
        graft.sources.HttpCrawl.crawlToZone(s, Seq("資料", "後端"), tmpl, landing)
        drain()
      } finally server.stop(0)
      ss.read.parquet(outDir)
        .select(col("keyword"), col("apply_code"), col("job_name"),
          col("company"), col("update_date"), col("actively_hiring"),
          col("applicants"))
        .orderBy(col("keyword"), col("apply_code"))
    }),

    // ---- q108: multimodal decode in the gate — deterministic 24-bit
    // BMPs (pixel = pure (id, x, y) formula) are ENCODED on executors,
    // travel as opaque binary columns, and MediaOps.featurize's
    // partition-batched decode must reconstruct dimensions, byte size,
    // and per-channel pixel SUMS that the oracle recomputes from the
    // same formula without ever touching a codec. The sums re-derive
    // exactly from the float feature slots (round(mean*255*48): float
    // error ~2e-3 << 0.5), so the decode path — header parse, stride,
    // bottom-up row order, BGR byte order — is all inside the hash.
    // The encode UDF is fixture construction, not the operator under
    // test (the operator is the decode inside featurize).
    "q108_media_decode" -> ((s, d) => {
      import s.implicits._
      val W = 8; val H = 6
      val encode = udf((id: Long) => {
        val px = Array.tabulate(W * H) { p =>
          val x = p % W; val y = p / W
          (((id * 31 + x * 7 + y * 13) % 256).toInt,
           ((id * 17 + x * 5 + y * 3) % 256).toInt,
           ((id * 23 + x * 11 + y * 29) % 256).toInt)
        }
        graft.multimodal.BmpDecoder.encode(W, H, px)
      })
      val media = Tables.rebalance(
          Tables.documents(s, d).filter(col("doc_id") < 200)
            .select(col("doc_id").as("media_id")))
        .withColumn("payload", encode(col("media_id")))
        .select(col("media_id"),
          struct(lit("image").as("kind"), lit(W).as("declaredWidth"),
                 lit(H).as("declaredHeight"), lit(0).as("sampleRate")).as("meta"),
          col("payload"))
        .as[graft.multimodal.MediaOps.MediaRecord]
      graft.multimodal.MediaOps.featurize(media).toDF()
        .select(col("media_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_bytes").cast("long").as("n_bytes"),
          round(element_at(col("feature"), 1).cast("double") * 255 * (W * H))
            .cast("long").as("sum_r"),
          round(element_at(col("feature"), 2).cast("double") * 255 * (W * H))
            .cast("long").as("sum_g"),
          round(element_at(col("feature"), 3).cast("double") * 255 * (W * H))
            .cast("long").as("sum_b"))
        .orderBy(col("media_id"))
    }),

    // ---- q110: audio decode in the gate (q108's pattern for PCM WAV):
    // deterministic mono PCM-16 clips encode on executors; featurize's
    // WavDecoder must parse the RIFF chunks and reconstruct sample
    // rate, channel count, sample count, byte size, and the exact
    // absolute-amplitude sum (recovered from the float mean slot),
    // all recomputed by the oracle from the sample formula.
    "q110_audio_decode" -> ((s, d) => {
      import s.implicits._
      val N = 800; val RATE = 16000
      val encode = udf((id: Long) => graft.multimodal.WavDecoder.encode(RATE,
        Array.tabulate(N)(i => (((id * 31 + i * 7) % 4001) - 2000).toShort)))
      val media = Tables.rebalance(
          Tables.documents(s, d).filter(col("doc_id") < 200)
            .select(col("doc_id").as("media_id")))
        .withColumn("payload", encode(col("media_id")))
        .select(col("media_id"),
          struct(lit("audio").as("kind"), lit(0).as("declaredWidth"),
                 lit(0).as("declaredHeight"), lit(RATE).as("sampleRate")).as("meta"),
          col("payload"))
        .as[graft.multimodal.MediaOps.MediaRecord]
      graft.multimodal.MediaOps.featurize(media).toDF()
        .select(col("media_id"),
          col("width").cast("long").as("sample_rate"),
          col("height").cast("long").as("channels"),
          col("n_bytes").cast("long").as("n_bytes"),
          element_at(col("feature"), 5).cast("long").as("n_samples"),
          round(element_at(col("feature"), 1).cast("double") * 32768 * N)
            .cast("long").as("sum_abs"))
        .orderBy(col("media_id"))
    }),

    // ---- q112: PNG decode in the gate — q108's BMP pattern through the
    // OTHER image tier (javax.imageio): pixels render into a
    // BufferedImage, ImageIO writes lossless PNG bytes on executors, and
    // featurize's ImageIoDecoder must decode them back to the exact
    // per-channel sums the oracle recomputes from the pixel formula.
    // n_bytes is deliberately NOT in the output: PNG encoders may vary
    // compression across JDKs; decoded pixels may not.
    "q112_png_decode" -> ((s, d) => {
      import s.implicits._
      val W = 9; val H = 5
      val encode = udf((id: Long) => {
        val img = new java.awt.image.BufferedImage(
          W, H, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var p = 0
        while (p < W * H) {
          val x = p % W; val y = p / W
          val r = ((id * 37 + x * 3 + y * 19) % 256).toInt
          val g = ((id * 41 + x * 13 + y * 7) % 256).toInt
          val b = ((id * 43 + x * 17 + y * 23) % 256).toInt
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          p += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        bos.toByteArray
      })
      val media = Tables.rebalance(
          Tables.documents(s, d).filter(col("doc_id") < 200)
            .select(col("doc_id").as("media_id")))
        .withColumn("payload", encode(col("media_id")))
        .select(col("media_id"),
          struct(lit("image").as("kind"), lit(W).as("declaredWidth"),
                 lit(H).as("declaredHeight"), lit(0).as("sampleRate")).as("meta"),
          col("payload"))
        .as[graft.multimodal.MediaOps.MediaRecord]
      graft.multimodal.MediaOps.featurize(media).toDF()
        .select(col("media_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          round(element_at(col("feature"), 1).cast("double") * 255 * (W * H))
            .cast("long").as("sum_r"),
          round(element_at(col("feature"), 2).cast("double") * 255 * (W * H))
            .cast("long").as("sum_g"),
          round(element_at(col("feature"), 3).cast("double") * 255 * (W * H))
            .cast("long").as("sum_b"))
        .orderBy(col("media_id"))
    }),

    // ---- q114: animated-GIF decode in the gate — the multi-frame
    // "video" shape: per id, 1 + id%3 solid-color frames encode through
    // the JDK's own GIF writer on executors; featurize's GifDecoder
    // must recover the frame COUNT and the first frame's exact color
    // (solid frames make the palette lossless, so the float mean slots
    // round back to the precise channel values the oracle restates).
    "q114_gif_decode" -> ((s, d) => {
      graft.multimodal.MediaOps.featurize(gifMedia(s, d)).toDF()
        .select(col("media_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          element_at(col("feature"), 6).cast("long").as("n_frames"),
          round(element_at(col("feature"), 1).cast("double") * 255)
            .cast("long").as("r0"),
          round(element_at(col("feature"), 2).cast("double") * 255)
            .cast("long").as("g0"),
          round(element_at(col("feature"), 3).cast("double") * 255)
            .cast("long").as("b0"))
        .orderBy(col("media_id"))
    }),

    // ---- q113: the video-container tier in the gate — deterministic
    // ISO-BMFF (MP4) boxes build on executors (ftyp + moov{mvhd,
    // trak{tkhd}×n}, all length-tagged, no codec payload) and
    // featurize's Mp4Parser box walk must recover duration, timescale'd
    // milliseconds, track count, the video track's 16.16 resolution,
    // and the exact byte size — every output an integer formula of
    // media_id the oracle restates directly.
    "q113_mp4_metadata" -> ((s, d) => {
      import s.implicits._
      val encode = udf((id: Long) => {
        def u32(v: Long): Array[Byte] = Array(
          ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
          ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
        def box(tpe: String, payload: Array[Byte]): Array[Byte] =
          u32(8L + payload.length) ++ tpe.getBytes("US-ASCII") ++ payload
        val w = 320 + (id % 8) * 16; val h = 180 + (id % 6) * 30
        val dur = (id % 50 + 1) * 500
        val nTracks = (1 + id % 3).toInt
        val mvhd = box("mvhd",
          u32(0) ++ u32(0) ++ u32(0) ++ u32(1000) ++ u32(dur) ++
            Array.fill[Byte](80)(0))
        def tkhd(tw: Long, th: Long) = box("tkhd",
          Array.fill[Byte](76)(0) ++ u32(tw << 16) ++ u32(th << 16))
        val traks = (0 until nTracks).map(t =>
          box("trak", if (t == 0) tkhd(w, h) else tkhd(0, 0)))
          .foldLeft(Array.empty[Byte])(_ ++ _)
        box("ftyp", "isom".getBytes("US-ASCII") ++ u32(0)) ++
          box("moov", mvhd ++ traks)
      })
      val media = Tables.rebalance(
          Tables.documents(s, d).filter(col("doc_id") < 200)
            .select(col("doc_id").as("media_id")))
        .withColumn("payload", encode(col("media_id")))
        .select(col("media_id"),
          struct(lit("video").as("kind"), lit(0).as("declaredWidth"),
                 lit(0).as("declaredHeight"), lit(0).as("sampleRate")).as("meta"),
          col("payload"))
        .as[graft.multimodal.MediaOps.MediaRecord]
      graft.multimodal.MediaOps.featurize(media).toDF()
        .select(col("media_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_bytes").cast("long").as("n_bytes"),
          round(element_at(col("feature"), 1).cast("double") * 1000)
            .cast("long").as("duration_ms"),
          element_at(col("feature"), 6).cast("long").as("n_tracks"))
        .orderBy(col("media_id"))
    }),

    // ---- q109: the custom stateful sessionizer
    // (flatMapGroupsWithState + event-time timeout) in the gate. Real
    // events land as file 1; a far-future sentinel per user lands as
    // file 2; maxFilesPerTrigger=1 forces two micro-batches, so
    // sessions closed within batch 1 emit immediately and the trailing
    // open session per user closes when batch 2's sentinel arrives
    // (gap exceeded) — every REAL session is emitted exactly once,
    // sentinel sessions stay open and never emit (filtered besides).
    // The oracle is plain SQL gaps-and-islands over the same events on
    // the same millisecond timeline. Values are floor(value*100)
    // (integer-valued doubles), so per-session sums are order-exact in
    // both engines.
    "q109_stateful_sessions" -> ((s, d) => {
      import org.apache.spark.sql.types._
      val zone = freshZone("graft-sess-", d)
      val inDir = new java.io.File(zone, "in"); inDir.mkdirs()
      val outDir = new java.io.File(zone, "sessions").getAbsolutePath
      val ckDir = new java.io.File(zone, "ck").getAbsolutePath
      val SENTINEL_MS = 4102444800000L // 2100-01-01

      def landAs(df: DataFrame, name: String, mtime: Long): Unit = {
        val tmp = new java.io.File(zone, s"stage-$name")
        df.coalesce(1).write.mode("overwrite").json(tmp.getAbsolutePath)
        val part = tmp.listFiles().find(_.getName.endsWith(".json")).get
        val dst = new java.io.File(inDir, name)
        java.nio.file.Files.move(part.toPath, dst.toPath)
        dst.setLastModified(mtime)
        ()
      }
      val real = Tables.events(s, d).filter(col("user_id") < 50)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
                floor(col("value") * 100).cast("double").as("value"))
      val t0 = System.currentTimeMillis()
      landAs(real, "0.json", t0 - 60000)
      landAs(real.select(col("user_id")).distinct()
          .select(lit(-1L).as("event_id"),
                  timestamp_millis(lit(SENTINEL_MS)).as("ts"),
                  col("user_id"), lit("sentinel").as("event_type"),
                  lit(0.0).as("value")),
        "1.json", t0)

      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("ts", TimestampType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType)))
      val ss = streamSession(s)
      import ss.implicits._
      val stream = ss.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).json(inDir.getAbsolutePath)
        .as[graft.streaming.StatefulOps.EventRow]
      val q = graft.streaming.StatefulOps.sessionize(stream, 30 * 60 * 1000L)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckDir)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .outputMode("append").start()
      q.awaitTermination()

      ss.read.parquet(outDir)
        .filter(col("session_start_ms") < SENTINEL_MS)
        .select(col("user_id"), col("session_start_ms"), col("session_end_ms"),
                col("n_events"), col("sum_value"))
        .orderBy(col("user_id"), col("session_start_ms"))
    })
  )

  private val labelListDuck =
    "['管理責任','出差外派','上班時段','休假制度','可上班日','需求人數','工作經歷'," +
      "'學歷要求','科系要求','語文條件','擅長工具','工作技能','具備證照','其他條件']"

  val oracles: Map[String, String] = Map(
    "q101_job_record" ->
      s"""WITH ids AS (SELECT doc_id AS job_id FROM documents WHERE doc_id < $N_JOBS),
        |raw AS (
        |  SELECT job_id,
        |    ' 職位' || job_id || ' ' AS raw_name,
        |    'https://www.104.com.tw/job/j' || job_id || '?jobsource=x' AS job_url,
        |    '更新2025/0' || (job_id % 9 + 1) || '/15' AS raw_update,
        |    CASE WHEN job_id % 3 = 0 THEN '積極徵才中'
        |         WHEN job_id % 3 = 1 THEN '' END AS tag,
        |    CASE WHEN job_id % 5 = 0 THEN ''
        |         ELSE '應徵人數 ' || (job_id % 7) || '~' || (job_id % 7 + 5) || ' 人'
        |    END AS raw_apct
        |  FROM ids),
        |list AS (
        |  SELECT job_id,
        |    trim(raw_name) AS job_name,
        |    '公司' || (job_id % 40) AS company,
        |    trim(replace(raw_update, '更新', '')) AS update_date,
        |    CASE WHEN coalesce(tag, '') = '積極徵才中' THEN '是' ELSE '否' END
        |      AS actively_hiring,
        |    coalesce(nullif(trim(regexp_replace(raw_apct, '應徵人數|人', '', 'g')), ''),
        |             'N/A') AS applicants,
        |    regexp_extract(job_url, '/([^/?]+)(\\?.*)?$$', 1) AS apply_code
        |  FROM raw),
        |dt AS (
        |  SELECT job_id, li, rep,
        |    $labelListDuck[(li + 1)::INT] AS label,
        |    li * 2 + rep + 1 AS pos,
        |    'v' || ((job_id * 13 + li * 7 + rep * 3) % 97) AS value
        |  FROM ids
        |  CROSS JOIN (SELECT unnest(range(0, 14)) AS li) l
        |  CROSS JOIN (SELECT unnest(range(0, 2)) AS rep) r
        |  WHERE (job_id + li) % 7 <> 0
        |    AND NOT (job_id % 11 = 0 AND li >= 3)
        |    AND (rep = 0 OR li IN (10, 11, 12) OR (job_id + li) % 5 = 0)),
        |wide AS (
        |  SELECT job_id,
        |    arg_min(value, pos) FILTER (WHERE label = '管理責任') AS management,
        |    arg_min(value, pos) FILTER (WHERE label = '出差外派') AS business_trip,
        |    arg_min(value, pos) FILTER (WHERE label = '上班時段') AS work_time,
        |    arg_min(value, pos) FILTER (WHERE label = '休假制度') AS vacation,
        |    arg_min(value, pos) FILTER (WHERE label = '可上班日') AS start_work,
        |    arg_min(value, pos) FILTER (WHERE label = '需求人數') AS headcount,
        |    arg_min(value, pos) FILTER (WHERE label = '工作經歷') AS work_exp,
        |    arg_min(value, pos) FILTER (WHERE label = '學歷要求') AS education,
        |    arg_min(value, pos) FILTER (WHERE label = '科系要求') AS major,
        |    arg_min(value, pos) FILTER (WHERE label = '語文條件') AS language_req,
        |    coalesce(string_agg(value, '、' ORDER BY pos) FILTER (WHERE label = '擅長工具'), '') AS tools,
        |    coalesce(string_agg(value, '、' ORDER BY pos) FILTER (WHERE label = '工作技能'), '') AS skills,
        |    coalesce(string_agg(value, '、' ORDER BY pos) FILTER (WHERE label = '具備證照'), '') AS certificates,
        |    arg_min(value, pos) FILTER (WHERE label = '其他條件') AS other_requirements
        |  FROM dt GROUP BY job_id),
        |gbars AS (
        |  SELECT job_id, pos,
        |    (job_id * 7 + pos * 11) % 13 - 6 AS dr,
        |    ((job_id * 3 + pos * 17) % 100) || '%' AS text
        |  FROM ids CROSS JOIN (SELECT unnest(range(0, 3)) AS pos) p),
        |gparsed AS (
        |  SELECT job_id, text,
        |    CASE WHEN pos = 0 THEN 'rgb(' || (78 + dr) || ', 145, 255)'
        |         WHEN pos = 1 THEN 'rgb(255, ' || (144 + dr) || ', 199)'
        |         ELSE 'rgb(10, 20, 30)' END AS rgbs
        |  FROM gbars),
        |gkeyed AS (
        |  SELECT job_id, text,
        |    CASE WHEN abs(regexp_extract(rgbs, 'rgb\\((\\d+), (\\d+), (\\d+)\\)', 1)::INT - 78) <= 5
        |           AND abs(regexp_extract(rgbs, 'rgb\\((\\d+), (\\d+), (\\d+)\\)', 2)::INT - 145) <= 5
        |           AND abs(regexp_extract(rgbs, 'rgb\\((\\d+), (\\d+), (\\d+)\\)', 3)::INT - 255) <= 5
        |           THEN '男性'
        |         WHEN abs(regexp_extract(rgbs, 'rgb\\((\\d+), (\\d+), (\\d+)\\)', 1)::INT - 255) <= 5
        |           AND abs(regexp_extract(rgbs, 'rgb\\((\\d+), (\\d+), (\\d+)\\)', 2)::INT - 144) <= 5
        |           AND abs(regexp_extract(rgbs, 'rgb\\((\\d+), (\\d+), (\\d+)\\)', 3)::INT - 199) <= 5
        |           THEN '女性' END AS gender_key
        |  FROM gparsed),
        |gmap AS (
        |  SELECT job_id,
        |    string_agg(gender_key || '=' || text, '|' ORDER BY gender_key) AS a_gender
        |  FROM gkeyed WHERE gender_key IS NOT NULL GROUP BY job_id),
        |lbars AS (
        |  SELECT job_id, l.lang AS bar_lang, lgi, pos,
        |    (job_id * 5 + pos * 3 + lgi * 7) % 5 AS ci,
        |    ((job_id + pos * 29) % 100) || '%' AS text
        |  FROM ids
        |  CROSS JOIN (SELECT unnest(['英文', '日文']) AS lang, unnest([0, 1]) AS lgi) l
        |  CROSS JOIN (SELECT unnest(range(0, 2)) AS pos) p),
        |llev AS (
        |  SELECT job_id, bar_lang, pos,
        |    CASE ['rgb(200, 200, 200)', 'rgb(151, 195, 255)', 'rgb(102, 165, 255)',
        |          'rgb(41, 128, 255)', 'rgb(7, 7, 7)'][(ci + 1)::INT]
        |      WHEN 'rgb(200, 200, 200)' THEN '不會'
        |      WHEN 'rgb(151, 195, 255)' THEN '略懂'
        |      WHEN 'rgb(102, 165, 255)' THEN '中等'
        |      WHEN 'rgb(41, 128, 255)' THEN '精通'
        |      ELSE '未知' END || text AS level_pct
        |  FROM lbars),
        |lperlang AS (
        |  SELECT job_id, bar_lang, string_agg(level_pct, ',' ORDER BY pos) AS levels
        |  FROM llev GROUP BY job_id, bar_lang),
        |lmap AS (
        |  SELECT job_id,
        |    string_agg(bar_lang || '=' || levels, '|' ORDER BY bar_lang)
        |      AS a_language_skills
        |  FROM lperlang GROUP BY job_id),
        |alines AS (
        |  SELECT job_id, pos,
        |    CASE WHEN (job_id + pos) % 3 = 0 THEN 'bad' || pos
        |         ELSE 'b' || pos || '歲' || chr(10) ||
        |              ((job_id * 7 + pos * 13) % 100) || '%' END AS line
        |  FROM ids CROSS JOIN (SELECT unnest(range(0, 3)) AS pos) p),
        |aparts AS (SELECT job_id, str_split(line, chr(10)) AS p FROM alines),
        |amap AS (
        |  SELECT job_id, string_agg(p[1] || '=' || p[2], '|' ORDER BY p[1]) AS a_age
        |  FROM aparts WHERE len(p) = 2 GROUP BY job_id),
        |joined AS (
        |  SELECT l.*, w.management, w.business_trip, w.work_time, w.vacation,
        |    w.start_work, w.headcount, w.work_exp, w.education, w.major,
        |    w.language_req, w.tools, w.skills, w.certificates, w.other_requirements,
        |    coalesce(g.a_gender, '') AS a_gender,
        |    coalesce(m.a_language_skills, '') AS a_language_skills,
        |    coalesce(a.a_age, '') AS a_age
        |  FROM list l
        |  LEFT JOIN wide w USING (job_id)
        |  LEFT JOIN gmap g USING (job_id)
        |  LEFT JOIN lmap m USING (job_id)
        |  LEFT JOIN amap a USING (job_id))
        |SELECT job_id, job_name, company, update_date, actively_hiring,
        |  applicants, apply_code,
        |  'https://www.104.com.tw/jobs/apply/analysis/' || apply_code AS analysis_url,
        |  management, business_trip, work_time, vacation, start_work, headcount,
        |  work_exp, education, major, language_req, tools, skills, certificates,
        |  other_requirements,
        |  '' AS a_education, a_gender, a_language_skills, a_age,
        |  '' AS a_experience, '' AS a_major, '' AS a_skills, '' AS a_certificates,
        |  CASE WHEN (CASE WHEN coalesce(job_name, '') = '' THEN 1 ELSE 0 END
        |           + CASE WHEN coalesce(company, '') = '' THEN 1 ELSE 0 END
        |           + CASE WHEN coalesce(update_date, '') = '' THEN 1 ELSE 0 END
        |           + CASE WHEN coalesce(applicants, '') = '' THEN 1 ELSE 0 END
        |           + CASE WHEN coalesce(management, '') = '' THEN 1 ELSE 0 END
        |           + CASE WHEN coalesce(business_trip, '') = '' THEN 1 ELSE 0 END
        |           + CASE WHEN coalesce(work_time, '') = '' THEN 1 ELSE 0 END
        |           + CASE WHEN coalesce(vacation, '') = '' THEN 1 ELSE 0 END
        |           + CASE WHEN coalesce(start_work, '') = '' THEN 1 ELSE 0 END
        |           + CASE WHEN coalesce(headcount, '') = '' THEN 1 ELSE 0 END
        |           + CASE WHEN coalesce(work_exp, '') = '' THEN 1 ELSE 0 END
        |           + CASE WHEN coalesce(education, '') = '' THEN 1 ELSE 0 END
        |           + CASE WHEN coalesce(major, '') = '' THEN 1 ELSE 0 END
        |           + CASE WHEN coalesce(language_req, '') = '' THEN 1 ELSE 0 END
        |           + CASE WHEN coalesce(tools, '') = '' THEN 1 ELSE 0 END
        |           + CASE WHEN coalesce(skills, '') = '' THEN 1 ELSE 0 END
        |           + CASE WHEN coalesce(certificates, '') = '' THEN 1 ELSE 0 END
        |           + CASE WHEN coalesce(other_requirements, '') = '' THEN 1 ELSE 0 END)
        |         > 6 THEN 'error' ELSE 'ok' END AS quality
        |FROM joined ORDER BY job_id""".stripMargin,

    // The oracle aggregates the deduped union of the two snapshot ticks:
    // tick1 covers doc_id [0,150), tick2 [100,250); dedup on job_url
    // collapses the overlap to one row per doc_id in [0,250), and every
    // cleaned field is a pure doc_id formula (so the oracle states the
    // post-cleaning values directly — the cleaning operators themselves
    // are oracle-mirrored stage by stage in q101).
    "q102_stream_lifecycle" ->
      """WITH u AS (SELECT doc_id FROM documents WHERE doc_id < 250),
        |c AS (
        |  SELECT doc_id,
        |    '職' || doc_id AS job_name,
        |    'https://www.104.com.tw/job/j' || doc_id AS job_url,
        |    CASE WHEN doc_id % 10 = 0 THEN '' ELSE '公司' || (doc_id % 30) END AS company,
        |    CASE WHEN doc_id % 7 = 3 THEN '' ELSE '2025/03/01' END AS update_date,
        |    CASE WHEN doc_id % 4 = 0 THEN '是' ELSE '否' END AS actively_hiring,
        |    CASE WHEN doc_id % 5 = 0 THEN 'N/A' ELSE '3~8' END AS applicants,
        |    'j' || doc_id AS apply_code,
        |    CASE WHEN doc_id % 2 = 0 THEN '' ELSE '需負擔管理責任' END AS management,
        |    CASE WHEN doc_id % 3 = 0 THEN 'Python、SQL' ELSE '' END AS tools,
        |    '大學' AS education,
        |    CASE WHEN doc_id % 6 = 5 THEN '月薪40000' ELSE '' END AS salary
        |  FROM u),
        |q AS (
        |  SELECT *,
        |    (CASE WHEN job_name = '' THEN 1 ELSE 0 END
        |   + CASE WHEN company = '' THEN 1 ELSE 0 END
        |   + CASE WHEN update_date = '' THEN 1 ELSE 0 END
        |   + CASE WHEN applicants = '' THEN 1 ELSE 0 END
        |   + CASE WHEN management = '' THEN 1 ELSE 0 END
        |   + CASE WHEN tools = '' THEN 1 ELSE 0 END
        |   + CASE WHEN education = '' THEN 1 ELSE 0 END
        |   + CASE WHEN salary = '' THEN 1 ELSE 0 END) AS n_empty
        |  FROM c)
        |SELECT CASE WHEN n_empty > 4 THEN 'error' ELSE 'ok' END AS quality,
        |  actively_hiring, count(*) AS n,
        |  sum(length(job_name))::BIGINT AS name_chars,
        |  count(DISTINCT apply_code) AS n_codes,
        |  min(job_url) AS first_url, max(company) AS last_company
        |FROM q GROUP BY 1, 2 ORDER BY quality, actively_hiring""".stripMargin,

    // identical by design: two checkpointed runs over split input must
    // produce exactly what one run over the whole input produces
    "q105_stream_resume" ->
      """WITH u AS (SELECT doc_id FROM documents WHERE doc_id < 250),
        |c AS (
        |  SELECT doc_id,
        |    '職' || doc_id AS job_name,
        |    'https://www.104.com.tw/job/j' || doc_id AS job_url,
        |    CASE WHEN doc_id % 10 = 0 THEN '' ELSE '公司' || (doc_id % 30) END AS company,
        |    CASE WHEN doc_id % 7 = 3 THEN '' ELSE '2025/03/01' END AS update_date,
        |    CASE WHEN doc_id % 4 = 0 THEN '是' ELSE '否' END AS actively_hiring,
        |    CASE WHEN doc_id % 5 = 0 THEN 'N/A' ELSE '3~8' END AS applicants,
        |    'j' || doc_id AS apply_code,
        |    CASE WHEN doc_id % 2 = 0 THEN '' ELSE '需負擔管理責任' END AS management,
        |    CASE WHEN doc_id % 3 = 0 THEN 'Python、SQL' ELSE '' END AS tools,
        |    '大學' AS education,
        |    CASE WHEN doc_id % 6 = 5 THEN '月薪40000' ELSE '' END AS salary
        |  FROM u),
        |q AS (
        |  SELECT *,
        |    (CASE WHEN job_name = '' THEN 1 ELSE 0 END
        |   + CASE WHEN company = '' THEN 1 ELSE 0 END
        |   + CASE WHEN update_date = '' THEN 1 ELSE 0 END
        |   + CASE WHEN applicants = '' THEN 1 ELSE 0 END
        |   + CASE WHEN management = '' THEN 1 ELSE 0 END
        |   + CASE WHEN tools = '' THEN 1 ELSE 0 END
        |   + CASE WHEN education = '' THEN 1 ELSE 0 END
        |   + CASE WHEN salary = '' THEN 1 ELSE 0 END) AS n_empty
        |  FROM c)
        |SELECT CASE WHEN n_empty > 4 THEN 'error' ELSE 'ok' END AS quality,
        |  actively_hiring, count(*) AS n,
        |  sum(length(job_name))::BIGINT AS name_chars,
        |  count(DISTINCT apply_code) AS n_codes,
        |  min(job_url) AS first_url, max(company) AS last_company
        |FROM q GROUP BY 1, 2 ORDER BY quality, actively_hiring""".stripMargin,

    // good rows = ticks 0-3 only (doc_id < 80); the booleans assert the
    // listener actually terminated the unbounded query
    "q115_stream_error_budget" ->
      """WITH u AS (SELECT doc_id FROM documents WHERE doc_id < 80),
        |c AS (
        |  SELECT doc_id,
        |    '職' || doc_id AS job_name,
        |    'https://www.104.com.tw/job/j' || doc_id AS job_url,
        |    CASE WHEN doc_id % 10 = 0 THEN '' ELSE '公司' || (doc_id % 30) END AS company,
        |    CASE WHEN doc_id % 7 = 3 THEN '' ELSE '2025/03/01' END AS update_date,
        |    CASE WHEN doc_id % 4 = 0 THEN '是' ELSE '否' END AS actively_hiring,
        |    CASE WHEN doc_id % 5 = 0 THEN 'N/A' ELSE '3~8' END AS applicants,
        |    'j' || doc_id AS apply_code,
        |    CASE WHEN doc_id % 2 = 0 THEN '' ELSE '需負擔管理責任' END AS management,
        |    CASE WHEN doc_id % 3 = 0 THEN 'Python、SQL' ELSE '' END AS tools,
        |    '大學' AS education,
        |    CASE WHEN doc_id % 6 = 5 THEN '月薪40000' ELSE '' END AS salary
        |  FROM u),
        |q AS (
        |  SELECT *,
        |    (CASE WHEN job_name = '' THEN 1 ELSE 0 END
        |   + CASE WHEN company = '' THEN 1 ELSE 0 END
        |   + CASE WHEN update_date = '' THEN 1 ELSE 0 END
        |   + CASE WHEN applicants = '' THEN 1 ELSE 0 END
        |   + CASE WHEN management = '' THEN 1 ELSE 0 END
        |   + CASE WHEN tools = '' THEN 1 ELSE 0 END
        |   + CASE WHEN education = '' THEN 1 ELSE 0 END
        |   + CASE WHEN salary = '' THEN 1 ELSE 0 END) AS n_empty
        |  FROM c)
        |SELECT CASE WHEN n_empty > 4 THEN 'error' ELSE 'ok' END AS quality,
        |  actively_hiring, count(*) AS n,
        |  sum(length(job_name))::BIGINT AS name_chars,
        |  count(DISTINCT apply_code) AS n_codes,
        |  min(job_url) AS first_url, max(company) AS last_company,
        |  TRUE AS stopped_by_budget, TRUE AS budget_exceeded
        |FROM q GROUP BY 1, 2 ORDER BY quality, actively_hiring""".stripMargin,

    "q106_error_budget" ->
      """SELECT sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS n_errors,
        |  count(*) AS n_rows,
        |  CASE WHEN sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) > 3
        |       THEN 'stop' ELSE 'continue' END AS decision
        |FROM events""".stripMargin,

    // dimensions exact; the lossy channel means collapse to the q60/q63
    // bounded-error booleans the oracle can state
    "q116_jpeg_decode" ->
      """SELECT doc_id AS media_id, 16::BIGINT AS width, 8::BIGINT AS height,
        |  TRUE AS r_in_tol, TRUE AS g_in_tol, TRUE AS b_in_tol
        |FROM documents WHERE doc_id < 200 ORDER BY media_id""".stripMargin,

    // 24 rows exactly: the re-crawled 後端 tick must collapse into the
    // first crawl's rows (resume skips old files; restored dedup state
    // drops the overlap)
    "q117_crawl_stream_resume" ->
      """WITH k AS (SELECT unnest(['區塊鏈', '後端', '資料']) AS keyword),
        |r AS (SELECT keyword, unnest(range(0, 8)) AS i FROM k)
        |SELECT keyword,
        |  keyword || '-' || i AS apply_code,
        |  '職位' || keyword || i AS job_name,
        |  '公司' || i AS company,
        |  '2025/03/0' || (i % 9 + 1) AS update_date,
        |  CASE WHEN i % 2 = 0 THEN '是' ELSE '否' END AS actively_hiring,
        |  CASE WHEN i % 3 = 0 THEN 'N/A' ELSE i || '~' || (i + 5) END AS applicants
        |FROM r ORDER BY keyword, apply_code""".stripMargin,

    // every output field is a pure (keyword, index) formula: what the
    // fixture server renders into HTML, the crawl+extract+clean+pivot
    // must reconstruct exactly
    "q107_http_crawl" ->
      """WITH k AS (SELECT unnest(['區塊鏈', '後端', '資料']) AS keyword),
        |r AS (SELECT keyword, unnest(range(0, 8)) AS i FROM k)
        |SELECT keyword,
        |  keyword || '-' || i AS apply_code,
        |  '職位' || keyword || i AS job_name,
        |  '公司' || i AS company,
        |  '2025/03/0' || (i % 9 + 1) AS update_date,
        |  CASE WHEN i % 2 = 0 THEN '是' ELSE '否' END AS actively_hiring,
        |  CASE WHEN i % 3 = 0 THEN 'N/A' ELSE i || '~' || (i + 5) END AS applicants,
        |  '不需負擔管理責任(' || keyword || '-' || i || ')' AS management,
        |  'Python、Solidity' AS tools,
        |  '大學以上' AS education
        |FROM r ORDER BY keyword, apply_code""".stripMargin,

    // channel sums recomputed from the pixel formula — no codec in the
    // oracle; n_bytes pins the encoder's exact layout (54-byte header +
    // 24-byte rows x 6, no padding at width 8)
    "q108_media_decode" ->
      """WITH m AS (SELECT doc_id AS media_id FROM documents WHERE doc_id < 200),
        |px AS (SELECT media_id, unnest(range(0, 48)) AS p FROM m),
        |c AS (SELECT media_id,
        |  (media_id * 31 + (p % 8) * 7 + (p // 8) * 13) % 256 AS r,
        |  (media_id * 17 + (p % 8) * 5 + (p // 8) * 3) % 256 AS g,
        |  (media_id * 23 + (p % 8) * 11 + (p // 8) * 29) % 256 AS b
        | FROM px)
        |SELECT media_id, 8::BIGINT AS width, 6::BIGINT AS height,
        |  198::BIGINT AS n_bytes,
        |  sum(r)::BIGINT AS sum_r, sum(g)::BIGINT AS sum_g, sum(b)::BIGINT AS sum_b
        |FROM c GROUP BY media_id ORDER BY media_id""".stripMargin,

    // absolute-amplitude sums from the sample formula; n_bytes pins the
    // 44-byte RIFF header + 2 bytes/sample mono layout
    "q110_audio_decode" ->
      """WITH m AS (SELECT doc_id AS media_id FROM documents WHERE doc_id < 200),
        |sm AS (SELECT media_id, unnest(range(0, 800)) AS i FROM m)
        |SELECT media_id, 16000::BIGINT AS sample_rate, 1::BIGINT AS channels,
        |  1644::BIGINT AS n_bytes, 800::BIGINT AS n_samples,
        |  sum(abs((media_id * 31 + i * 7) % 4001 - 2000))::BIGINT AS sum_abs
        |FROM sm GROUP BY media_id ORDER BY media_id""".stripMargin,

    "q112_png_decode" ->
      """WITH m AS (SELECT doc_id AS media_id FROM documents WHERE doc_id < 200),
        |px AS (SELECT media_id, unnest(range(0, 45)) AS p FROM m),
        |c AS (SELECT media_id,
        |  (media_id * 37 + (p % 9) * 3 + (p // 9) * 19) % 256 AS r,
        |  (media_id * 41 + (p % 9) * 13 + (p // 9) * 7) % 256 AS g,
        |  (media_id * 43 + (p % 9) * 17 + (p // 9) * 23) % 256 AS b
        | FROM px)
        |SELECT media_id, 9::BIGINT AS width, 5::BIGINT AS height,
        |  sum(r)::BIGINT AS sum_r, sum(g)::BIGINT AS sum_g, sum(b)::BIGINT AS sum_b
        |FROM c GROUP BY media_id ORDER BY media_id""".stripMargin,

    "q114_gif_decode" ->
      """WITH m AS (SELECT doc_id AS media_id FROM documents WHERE doc_id < 200)
        |SELECT media_id, 7::BIGINT AS width, 3::BIGINT AS height,
        |  (1 + media_id % 3)::BIGINT AS n_frames,
        |  (media_id * 53 % 256)::BIGINT AS r0,
        |  (media_id * 59 % 256)::BIGINT AS g0,
        |  (media_id * 61 % 256)::BIGINT AS b0
        |FROM m ORDER BY media_id""".stripMargin,

    // the resized 8x6 grid samples source pixel (2X, 2Y) of the 16x12
    // original (nearest-neighbor at the exact 2:1 ratio); n_bytes pins
    // the re-encoded BMP layout (54-byte header + 6 rows * 24 stride)
    "q118_image_resize" ->
      """WITH m AS (SELECT doc_id AS media_id FROM documents WHERE doc_id < 200),
        |px AS (SELECT media_id, unnest(range(0, 48)) AS p FROM m),
        |c AS (SELECT media_id,
        |  (media_id * 29 + (p % 8) * 2 * 3 + (p // 8) * 2 * 11) % 256 AS r,
        |  (media_id * 19 + (p % 8) * 2 * 7 + (p // 8) * 2 * 5) % 256 AS g,
        |  (media_id * 13 + (p % 8) * 2 * 9 + (p // 8) * 2 * 17) % 256 AS b
        | FROM px)
        |SELECT media_id, 8::BIGINT AS width, 6::BIGINT AS height,
        |  198::BIGINT AS n_bytes,
        |  sum(r)::BIGINT AS sum_r, sum(g)::BIGINT AS sum_g, sum(b)::BIGINT AS sum_b
        |FROM c GROUP BY media_id ORDER BY media_id""".stripMargin,

    // one row per (id, frame): evenly-spaced sampling with maxFrames >=
    // n enumerates every frame index; solid frames make the palette
    // lossless so the means restate the per-frame color formula exactly
    "q119_gif_frame_sample" ->
      """WITH m AS (SELECT doc_id AS media_id FROM documents WHERE doc_id < 200),
        |f AS (SELECT media_id, unnest(range(0, 1 + media_id % 3)) AS frame_idx FROM m)
        |SELECT media_id, frame_idx::BIGINT AS frame_idx,
        |  7::BIGINT AS width, 3::BIGINT AS height,
        |  ((media_id * 53 + frame_idx * 71) % 256)::BIGINT AS r,
        |  ((media_id * 59 + frame_idx * 37) % 256)::BIGINT AS g,
        |  ((media_id * 61 + frame_idx * 29) % 256)::BIGINT AS b
        |FROM f ORDER BY media_id, frame_idx""".stripMargin,

    // the dHash chain recomputed from the pixel FORMULA, never a codec:
    // gray(x, y) as the exact integer channel sum (bump applied inside
    // each channel's mod, matching the encoder), one bit per adjacent
    // comparison, same 3x14-bit banding, same exact popcount filter
    "q154_image_phash_dedup" -> {
      def gray(xe: String, ye: String) = {
        def ch(c: Int) =
          s"((('0x' || substr(md5((media_id % 100)::VARCHAR || '|' || " +
            s"($xe)::VARCHAR || '|' || ($ye)::VARCHAR || '|$c'), 1, 2))::BIGINT + " +
            s"CASE WHEN media_id >= 100 AND ($xe) = 3 AND ($ye) = 2 " +
            s"THEN 40 ELSE 0 END) % 256)"
        s"(${ch(0)} + ${ch(1)} + ${ch(2)})"
      }
      s"""WITH m AS (SELECT doc_id AS media_id FROM documents WHERE doc_id < 200),
        |cmp AS (
        |  SELECT media_id, x, y,
        |    CASE WHEN ${gray("x + 1", "y")} > ${gray("x", "y")}
        |         THEN (1::BIGINT << (y * 7 + x)) ELSE 0::BIGINT END AS bit
        |  FROM m, (SELECT unnest(range(0, 7)) AS x),
        |          (SELECT unnest(range(0, 6)) AS y)),
        |d AS MATERIALIZED (
        |  SELECT media_id, sum(bit)::BIGINT AS dhash FROM cmp
        |  GROUP BY media_id),
        |bands AS MATERIALIZED (
        |  SELECT media_id, b, (dhash >> (b * 14)) & 16383 AS k
        |  FROM d, (SELECT unnest(range(0, 3)) AS b)),
        |cand AS (
        |  SELECT DISTINCT a.media_id AS m1, c.media_id AS m2
        |  FROM bands a JOIN bands c
        |    ON a.b = c.b AND a.k = c.k AND a.media_id < c.media_id)
        |SELECT m1, m2,
        |  bit_count(xor(d1.dhash, d2.dhash))::BIGINT AS hamming
        |FROM cand
        |JOIN d d1 ON d1.media_id = m1
        |JOIN d d2 ON d2.media_id = m2
        |WHERE bit_count(xor(d1.dhash, d2.dhash)) <= 2
        |ORDER BY m1, m2""".stripMargin
    },

    // EXHAUSTIVE all-pairs ground truth (19,900 pairs at 200 images —
    // trivial for the oracle, exactly what the banded Spark path must
    // never do at scale): any banding, dedup-first, or expansion bug
    // surfaces as a missing or extra pair
    "q156_image_mixed_dedup" -> {
      def gray(xe: String, ye: String) = {
        def ch(c: Int) =
          s"((('0x' || substr(md5(base::VARCHAR || '|' || " +
            s"($xe)::VARCHAR || '|' || ($ye)::VARCHAR || '|$c'), 1, 2))::BIGINT + " +
            s"CASE WHEN media_id >= 140 AND ($xe) = 3 AND ($ye) = 2 " +
            s"THEN 40 ELSE 0 END) % 256)"
        s"(${ch(0)} + ${ch(1)} + ${ch(2)})"
      }
      s"""WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CASE WHEN doc_id < 140 THEN doc_id % 100
        |         ELSE doc_id - 140 END AS base
        |  FROM documents WHERE doc_id < 200),
        |cmp AS (
        |  SELECT media_id, x, y,
        |    CASE WHEN ${gray("x + 1", "y")} > ${gray("x", "y")}
        |         THEN (1::BIGINT << (y * 7 + x)) ELSE 0::BIGINT END AS bit
        |  FROM m, (SELECT unnest(range(0, 7)) AS x),
        |          (SELECT unnest(range(0, 6)) AS y)),
        |d AS MATERIALIZED (
        |  SELECT media_id, sum(bit)::BIGINT AS dhash FROM cmp
        |  GROUP BY media_id)
        |SELECT d1.media_id AS m1, d2.media_id AS m2,
        |  bit_count(xor(d1.dhash, d2.dhash))::BIGINT AS hamming
        |FROM d d1 JOIN d d2 ON d1.media_id < d2.media_id
        |WHERE bit_count(xor(d1.dhash, d2.dhash)) <= 2
        |ORDER BY m1, m2""".stripMargin
    },

    // clusters as a RECURSIVE min-label reachability closure over the
    // exhaustive popcount edge set — no banding, no iteration-scheme
    // assumption: whatever connectedComponents converges to must equal
    // true transitive closure
    "q163_media_dedup_clusters" -> {
      def gray(xe: String, ye: String) = {
        def ch(c: Int) =
          s"((('0x' || substr(md5(base::VARCHAR || '|' || " +
            s"($xe)::VARCHAR || '|' || ($ye)::VARCHAR || '|$c'), 1, 2))::BIGINT + " +
            s"CASE WHEN media_id >= 140 AND ($xe) = 3 AND ($ye) = 2 " +
            s"THEN 40 ELSE 0 END) % 256)"
        s"(${ch(0)} + ${ch(1)} + ${ch(2)})"
      }
      s"""WITH RECURSIVE m AS (
        |  SELECT doc_id AS media_id,
        |    CASE WHEN doc_id < 140 THEN doc_id % 100
        |         ELSE doc_id - 140 END AS base
        |  FROM documents WHERE doc_id < 200),
        |cmp AS (
        |  SELECT media_id, x, y,
        |    CASE WHEN ${gray("x + 1", "y")} > ${gray("x", "y")}
        |         THEN (1::BIGINT << (y * 7 + x)) ELSE 0::BIGINT END AS bit
        |  FROM m, (SELECT unnest(range(0, 7)) AS x),
        |          (SELECT unnest(range(0, 6)) AS y)),
        |d AS MATERIALIZED (
        |  SELECT media_id, sum(bit)::BIGINT AS dhash FROM cmp
        |  GROUP BY media_id),
        |edges AS MATERIALIZED (
        |  SELECT d1.media_id AS m1, d2.media_id AS m2
        |  FROM d d1 JOIN d d2 ON d1.media_id < d2.media_id
        |  WHERE bit_count(xor(d1.dhash, d2.dhash)) <= 2),
        |edges_sym AS MATERIALIZED (
        |  SELECT m1 AS a, m2 AS b FROM edges
        |  UNION ALL SELECT m2 AS a, m1 AS b FROM edges),
        |reach(id, r) AS (
        |  SELECT media_id, media_id FROM d
        |  UNION
        |  SELECT e.b, reach.r FROM reach JOIN edges_sym e ON e.a = reach.id),
        |roots AS (SELECT id, min(r) AS root FROM reach GROUP BY id)
        |SELECT root AS cluster_root, count(*) AS n_members,
        |  max(id) AS max_id
        |FROM roots GROUP BY root ORDER BY cluster_root""".stripMargin
    },

    // the audio-hash chain from the sample formula: window energies as
    // exact integer sums, adjacent comparisons, same banding + popcount
    "q155_audio_phash_dedup" ->
      """WITH m AS (SELECT doc_id AS media_id FROM documents WHERE doc_id < 200),
        |s AS (
        |  SELECT media_id, i,
        |    (('0x' || substr(md5((media_id % 100)::VARCHAR || '|' ||
        |        i::VARCHAR), 1, 4))::BIGINT % 4001) - 2000
        |      + CASE WHEN media_id >= 100 AND i = 400 THEN 1500 ELSE 0 END AS v
        |  FROM m, (SELECT unnest(range(0, 800)) AS i)),
        |e AS (
        |  SELECT media_id, i // 16 AS w, sum(abs(v))::BIGINT AS energy
        |  FROM s GROUP BY media_id, i // 16),
        |cmp AS (
        |  SELECT a.media_id,
        |    CASE WHEN b.energy > a.energy
        |         THEN (1::BIGINT << a.w::INT) ELSE 0::BIGINT END AS bit
        |  FROM e a JOIN e b ON a.media_id = b.media_id AND b.w = a.w + 1),
        |h AS MATERIALIZED (
        |  SELECT media_id, sum(bit)::BIGINT AS ahash FROM cmp
        |  GROUP BY media_id),
        |bands AS MATERIALIZED (
        |  SELECT media_id, b, (ahash >> (b * 17)) & 131071 AS k
        |  FROM h, (SELECT unnest(range(0, 3)) AS b)),
        |cand AS (
        |  SELECT DISTINCT a.media_id AS m1, c.media_id AS m2
        |  FROM bands a JOIN bands c
        |    ON a.b = c.b AND a.k = c.k AND a.media_id < c.media_id)
        |SELECT m1, m2,
        |  bit_count(xor(h1.ahash, h2.ahash))::BIGINT AS hamming
        |FROM cand
        |JOIN h h1 ON h1.media_id = m1
        |JOIN h h2 ON h2.media_id = m2
        |WHERE bit_count(xor(h1.ahash, h2.ahash)) <= 2
        |ORDER BY m1, m2""".stripMargin,

    // q174: the container is invisible to the oracle — the audio
    // samples are q155's formula, so the SAME closed-form SQL is the
    // ground truth (the AVI demux under test must reproduce it)
    "q174_avi_audio_dedup" ->
      """WITH m AS (SELECT doc_id AS media_id FROM documents WHERE doc_id < 200),
        |s AS (
        |  SELECT media_id, i,
        |    (('0x' || substr(md5((media_id % 100)::VARCHAR || '|' ||
        |        i::VARCHAR), 1, 4))::BIGINT % 4001) - 2000
        |      + CASE WHEN media_id >= 100 AND i = 400 THEN 1500 ELSE 0 END AS v
        |  FROM m, (SELECT unnest(range(0, 800)) AS i)),
        |e AS (
        |  SELECT media_id, i // 16 AS w, sum(abs(v))::BIGINT AS energy
        |  FROM s GROUP BY media_id, i // 16),
        |cmp AS (
        |  SELECT a.media_id,
        |    CASE WHEN b.energy > a.energy
        |         THEN (1::BIGINT << a.w::INT) ELSE 0::BIGINT END AS bit
        |  FROM e a JOIN e b ON a.media_id = b.media_id AND b.w = a.w + 1),
        |h AS MATERIALIZED (
        |  SELECT media_id, sum(bit)::BIGINT AS ahash FROM cmp
        |  GROUP BY media_id),
        |bands AS MATERIALIZED (
        |  SELECT media_id, b, (ahash >> (b * 17)) & 131071 AS k
        |  FROM h, (SELECT unnest(range(0, 3)) AS b)),
        |cand AS (
        |  SELECT DISTINCT a.media_id AS m1, c.media_id AS m2
        |  FROM bands a JOIN bands c
        |    ON a.b = c.b AND a.k = c.k AND a.media_id < c.media_id)
        |SELECT m1, m2,
        |  bit_count(xor(h1.ahash, h2.ahash))::BIGINT AS hamming
        |FROM cand
        |JOIN h h1 ON h1.media_id = m1
        |JOIN h h2 ON h2.media_id = m2
        |WHERE bit_count(xor(h1.ahash, h2.ahash)) <= 2
        |ORDER BY m1, m2""".stripMargin,

    // exhaustive comparison-level ground truth from the sample formula:
    // window energies as exact integer sums, one boolean per adjacent
    // comparison, pair hamming = count of differing comparisons
    "q161_audio_wide_dedup" ->
      """WITH m AS (SELECT doc_id AS media_id FROM documents WHERE doc_id < 200),
        |s AS (
        |  SELECT media_id, i,
        |    (('0x' || substr(md5((media_id % 100)::VARCHAR || '|' ||
        |        i::VARCHAR), 1, 4))::BIGINT % 4001) - 2000
        |      + CASE WHEN media_id >= 100 AND i = 800 THEN 1500 ELSE 0 END AS v
        |  FROM m, (SELECT unnest(range(0, 1600)) AS i)),
        |e AS (
        |  SELECT media_id, i // 16 AS w, sum(abs(v))::BIGINT AS energy
        |  FROM s GROUP BY media_id, i // 16),
        |cmp AS MATERIALIZED (
        |  SELECT a.media_id, a.w, b.energy > a.energy AS bit
        |  FROM e a JOIN e b ON a.media_id = b.media_id AND b.w = a.w + 1)
        |SELECT a.media_id AS m1, b.media_id AS m2,
        |  count(*) FILTER (WHERE a.bit <> b.bit)::BIGINT AS hamming
        |FROM cmp a JOIN cmp b ON a.w = b.w AND a.media_id < b.media_id
        |GROUP BY a.media_id, b.media_id
        |HAVING count(*) FILTER (WHERE a.bit <> b.bit) <= 2
        |ORDER BY m1, m2""".stripMargin,

    // EXHAUSTIVE per-frame ground truth from the pixel formula: one
    // boolean per (video, frame, comparison), pair hamming = count of
    // differing comparisons (no bit packing, no banding, no codec),
    // agreement = frames within 2, vote >= 3 of 4
    "q157_video_temporal_dedup" -> {
      def gray(xe: String, ye: String) = {
        def ch(c: Int) =
          s"((('0x' || substr(md5((media_id % 100)::VARCHAR || '|' || " +
            s"f::VARCHAR || '|' || ($xe)::VARCHAR || '|' || " +
            s"($ye)::VARCHAR || '|$c'), 1, 2))::BIGINT + " +
            s"CASE WHEN media_id >= 100 AND f = media_id % 4 " +
            s"AND ($xe) = 3 AND ($ye) = 2 THEN 40 ELSE 0 END) % 256)"
        s"(${ch(0)} + ${ch(1)} + ${ch(2)})"
      }
      s"""WITH m AS (SELECT doc_id AS media_id FROM documents WHERE doc_id < 200),
        |cmp AS MATERIALIZED (
        |  SELECT media_id, f, x, y,
        |    ${gray("x + 1", "y")} > ${gray("x", "y")} AS bit
        |  FROM m, (SELECT unnest(range(0, 4)) AS f),
        |          (SELECT unnest(range(0, 7)) AS x),
        |          (SELECT unnest(range(0, 6)) AS y)),
        |fr AS (
        |  SELECT a.media_id AS m1, b.media_id AS m2, a.f,
        |    count(*) FILTER (WHERE a.bit <> b.bit) AS ham
        |  FROM cmp a JOIN cmp b
        |    ON a.f = b.f AND a.x = b.x AND a.y = b.y
        |   AND a.media_id < b.media_id
        |  GROUP BY a.media_id, b.media_id, a.f)
        |SELECT m1, m2,
        |  count(*) FILTER (WHERE ham <= 2)::BIGINT AS n_agree,
        |  coalesce(sum(ham) FILTER (WHERE ham <= 2), 0)::BIGINT AS ham_sum
        |FROM fr GROUP BY m1, m2
        |HAVING count(*) FILTER (WHERE ham <= 2) >= 3
        |ORDER BY m1, m2""".stripMargin
    },

    // the q157 exhaustive discipline at the 16x8 grid: per-frame
    // hamming counted comparison-by-comparison from the pixel formula
    // — frameDHashWide's word packing, the straddling 3x40 band
    // slices, and the wide vote are judged purely by the output set
    "q167_video_temporal_wide" -> {
      def gray(xe: String, ye: String) = {
        def ch(c: Int) =
          s"((('0x' || substr(md5((media_id % 100)::VARCHAR || '|' || " +
            s"f::VARCHAR || '|' || ($xe)::VARCHAR || '|' || " +
            s"($ye)::VARCHAR || '|$c'), 1, 2))::BIGINT + " +
            s"CASE WHEN media_id >= 100 AND f = media_id % 4 " +
            s"AND ($xe) = 3 AND ($ye) = 2 THEN 40 ELSE 0 END) % 256)"
        s"(${ch(0)} + ${ch(1)} + ${ch(2)})"
      }
      s"""WITH m AS (SELECT doc_id AS media_id FROM documents WHERE doc_id < 200),
        |cmp AS MATERIALIZED (
        |  SELECT media_id, f, x, y,
        |    ${gray("x + 1", "y")} > ${gray("x", "y")} AS bit
        |  FROM m, (SELECT unnest(range(0, 4)) AS f),
        |          (SELECT unnest(range(0, 15)) AS x),
        |          (SELECT unnest(range(0, 8)) AS y)),
        |fr AS (
        |  SELECT a.media_id AS m1, b.media_id AS m2, a.f,
        |    count(*) FILTER (WHERE a.bit <> b.bit) AS ham
        |  FROM cmp a JOIN cmp b
        |    ON a.f = b.f AND a.x = b.x AND a.y = b.y
        |   AND a.media_id < b.media_id
        |  GROUP BY a.media_id, b.media_id, a.f)
        |SELECT m1, m2,
        |  count(*) FILTER (WHERE ham <= 2)::BIGINT AS n_agree,
        |  coalesce(sum(ham) FILTER (WHERE ham <= 2), 0)::BIGINT AS ham_sum
        |FROM fr GROUP BY m1, m2
        |HAVING count(*) FILTER (WHERE ham <= 2) >= 3
        |ORDER BY m1, m2""".stripMargin
    },

    // q173: the v-LEVEL closed form replayed in SQL — v(x) = (h0 % 5 +
    // x + sum_{i<=x}(h_i % 4)) % 5 per (key, frame, row), the bump a
    // one-cell re-level to the least value distinct from itself and
    // both horizontal neighbors, comparison bits = v(x+1) > v(x), then
    // exactly q167's exhaustive per-position hamming + vote. No codec,
    // no words, no banding: the MJPEG encode/decode chain is correct
    // iff the operator's output equals this formula's.
    "q173_mjpeg_video_temporal" -> {
      s"""WITH m AS (SELECT doc_id AS media_id FROM documents WHERE doc_id < 200),
        |hb AS MATERIALIZED (
        |  SELECT media_id, f, y, x,
        |    ('0x' || substr(md5((media_id % 100)::VARCHAR || '|' || f::VARCHAR
        |       || '|' || x::VARCHAR || '|' || y::VARCHAR), 1, 2))::BIGINT AS h
        |  FROM m, (SELECT unnest(range(0, 4)) AS f),
        |          (SELECT unnest(range(0, 16)) AS x),
        |          (SELECT unnest(range(0, 8)) AS y)),
        |vwalk AS MATERIALIZED (
        |  SELECT media_id, f, y, x,
        |    (first_value(h % 5) OVER (PARTITION BY media_id, f, y ORDER BY x)
        |     + x
        |     + sum(CASE WHEN x > 0 THEN h % 4 ELSE 0 END)
        |         OVER (PARTITION BY media_id, f, y ORDER BY x)) % 5 AS v0
        |  FROM hb),
        |vb AS MATERIALIZED (
        |  SELECT media_id, f, y, x,
        |    CASE WHEN media_id >= 100 AND f = media_id % 4
        |          AND y = 2 AND x = 3
        |      THEN list_min([c FOR c IN [0, 1, 2, 3, 4]
        |             IF c <> lag(v0) OVER wx AND c <> v0
        |                AND c <> lead(v0) OVER wx])
        |      ELSE v0 END AS v
        |  FROM vwalk
        |  WINDOW wx AS (PARTITION BY media_id, f, y ORDER BY x)),
        |cmp AS MATERIALIZED (
        |  SELECT media_id, f, y, x,
        |    lead(v) OVER (PARTITION BY media_id, f, y ORDER BY x) > v AS bit
        |  FROM vb QUALIFY x < 15),
        |fr AS (
        |  SELECT a.media_id AS m1, b.media_id AS m2, a.f,
        |    count(*) FILTER (WHERE a.bit <> b.bit) AS ham
        |  FROM cmp a JOIN cmp b
        |    ON a.f = b.f AND a.x = b.x AND a.y = b.y
        |   AND a.media_id < b.media_id
        |  GROUP BY a.media_id, b.media_id, a.f)
        |SELECT m1, m2,
        |  count(*) FILTER (WHERE ham <= 2)::BIGINT AS n_agree,
        |  coalesce(sum(ham) FILTER (WHERE ham <= 2), 0)::BIGINT AS ham_sum
        |FROM fr GROUP BY m1, m2
        |HAVING count(*) FILTER (WHERE ham <= 2) >= 3
        |ORDER BY m1, m2""".stripMargin
    },

    // the q156 exhaustive discipline at the 16x8 grid: hamming counted
    // comparison-by-comparison straight from the formula — the wide
    // word packing and the straddling band slices are judged purely by
    // the pair set they produce
    "q160_image_wide_dedup" -> {
      def gray(xe: String, ye: String) = {
        def ch(c: Int) =
          s"((('0x' || substr(md5(base::VARCHAR || '|' || " +
            s"($xe)::VARCHAR || '|' || ($ye)::VARCHAR || '|$c'), 1, 2))::BIGINT + " +
            s"CASE WHEN media_id >= 140 AND ($xe) = 3 AND ($ye) = 2 " +
            s"THEN 40 ELSE 0 END) % 256)"
        s"(${ch(0)} + ${ch(1)} + ${ch(2)})"
      }
      s"""WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CASE WHEN doc_id < 140 THEN doc_id % 100
        |         ELSE doc_id - 140 END AS base
        |  FROM documents WHERE doc_id < 200),
        |cmp AS MATERIALIZED (
        |  SELECT media_id, x, y,
        |    ${gray("x + 1", "y")} > ${gray("x", "y")} AS bit
        |  FROM m, (SELECT unnest(range(0, 15)) AS x),
        |          (SELECT unnest(range(0, 8)) AS y))
        |SELECT a.media_id AS m1, b.media_id AS m2,
        |  count(*) FILTER (WHERE a.bit <> b.bit)::BIGINT AS hamming
        |FROM cmp a JOIN cmp b
        |  ON a.x = b.x AND a.y = b.y AND a.media_id < b.media_id
        |GROUP BY a.media_id, b.media_id
        |HAVING count(*) FILTER (WHERE a.bit <> b.bit) <= 2
        |ORDER BY m1, m2""".stripMargin
    },

    // every field an integer formula; n_bytes pins the box layout
    // (16-byte ftyp + 8-byte moov header + 108-byte mvhd + 100 per trak)
    "q113_mp4_metadata" ->
      """WITH m AS (SELECT doc_id AS media_id FROM documents WHERE doc_id < 200)
        |SELECT media_id,
        |  (320 + (media_id % 8) * 16)::BIGINT AS width,
        |  (180 + (media_id % 6) * 30)::BIGINT AS height,
        |  (132 + 100 * (1 + media_id % 3))::BIGINT AS n_bytes,
        |  ((media_id % 50 + 1) * 500)::BIGINT AS duration_ms,
        |  (1 + media_id % 3)::BIGINT AS n_tracks
        |FROM m ORDER BY media_id""".stripMargin,

    // gaps-and-islands on the millisecond timeline (the sessionizer
    // compares Timestamp.getTime millis; epoch_ms truncates identically)
    "q109_stateful_sessions" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ms(ts) AS ms, floor(value * 100) AS v
        |  FROM events WHERE user_id < 50),
        |m AS (
        |  SELECT user_id, ms, v,
        |    CASE WHEN lag(ms) OVER w IS NULL
        |              OR ms - lag(ms) OVER w >= 1800000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms)),
        |s AS (
        |  SELECT user_id, ms, v,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ms
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m)
        |SELECT user_id, min(ms) AS session_start_ms, max(ms) AS session_end_ms,
        |  count(*) AS n_events, sum(v)::DOUBLE AS sum_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start_ms""".stripMargin
  )
}
