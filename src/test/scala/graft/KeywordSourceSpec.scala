package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.KeywordSource

class KeywordSourceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  test("per-keyword scans union with keyword tags (S1)") {
    val d1 = tmp("kw-a"); val d2 = tmp("kw-b")
    Seq(("j1", 10)).toDF("job", "n").write.mode("overwrite").parquet(d1)
    Seq(("j2", 20), ("j3", 30)).toDF("job", "n").write.mode("overwrite").parquet(d2)
    val df = KeywordSource.read(spark, Map("區塊鏈工程師" -> d1, "資料工程師" -> d2))
    assert(df.count() == 3)
    val byKw = df.groupBy("keyword").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKw == Map("區塊鏈工程師" -> 1L, "資料工程師" -> 2L))
  }

  test("partitioned layout prunes to the filtered keyword") {
    val base = tmp("kw-part")
    Seq(("j1", 10)).toDF("job", "n")
      .withColumn("keyword", lit("kw_a"))
      .write.partitionBy("keyword").mode("overwrite").parquet(base)
    Seq(("j2", 20)).toDF("job", "n")
      .withColumn("keyword", lit("kw_b"))
      .write.partitionBy("keyword").mode("append").parquet(base)
    val pruned = KeywordSource.readPartitioned(spark, base)
      .filter(col("keyword") === "kw_a")
    assert(pruned.count() == 1)
    // partition pruning is visible in the scan's partition filters
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || plan.contains("keyword"), plan)
  }

  private def writeSnapshots(base: String, kw: String, file: String,
                             lines: Seq[String]): Unit = {
    val dir = java.nio.file.Paths.get(base, kw)
    Files.createDirectories(dir)
    Files.write(dir.resolve(file), lines.mkString("\n").getBytes("UTF-8"))
    ()
  }

  test("DSv2 graft-keyword: scans JSON snapshots, one partition per file") {
    val base = tmp("kw-dsv2")
    writeSnapshots(base, "scala", "s1.json", Seq(
      """{"job":"j1","company":"Acme","extra":"x"}""",
      """{"job":"j2","company":"Beta"}"""))
    writeSnapshots(base, "spark", "p1.json", Seq(
      """{"job":"j3","company":"Acme"}"""))
    writeSnapshots(base, "spark", "p2.json", Seq(
      """{"job":"j4"}"""))

    val df = spark.read.format("graft-keyword")
      .option("fields", "job,company").load(base)
    assert(df.schema.fieldNames.toSeq == Seq("keyword", "job", "company"))
    assert(df.rdd.getNumPartitions == 3) // one per snapshot file
    val rows = df.orderBy("job").collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.getString(2))))
    assert(rows.toSeq == Seq(
      ("scala", "j1", Some("Acme")), ("scala", "j2", Some("Beta")),
      ("spark", "j3", Some("Acme")), ("spark", "j4", None)))
  }

  test("DSv2 graft-keyword: keyword filter prunes directories at planning time") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import graft.sources.KeywordScan
    val base = tmp("kw-dsv2-push")
    writeSnapshots(base, "scala", "s1.json", Seq("""{"job":"j1"}"""))
    writeSnapshots(base, "spark", "p1.json", Seq("""{"job":"j2"}"""))
    writeSnapshots(base, "spark", "p2.json", Seq("""{"job":"j3"}"""))

    val all = spark.read.format("graft-keyword").option("fields", "job").load(base)
    assert(all.rdd.getNumPartitions == 3)

    val filtered = all.filter(col("keyword") === "scala").select("job")
    // the filter reached the scan: it reports as pushed...
    val scan = filtered.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.asInstanceOf[KeywordScan]
    }.get
    assert(scan.pushed.map(_.toString).toSet ==
      Set("IsNotNull(keyword)", "EqualTo(keyword,scala)"))
    assert(scan.keywords.contains(Set("scala")))
    // ...columns were pruned to what the query needs — the filter is fully
    // handled at the scan, so even `keyword` drops out of the read schema
    assert(scan.readSchema().fieldNames.toSeq == Seq("job"))
    // ...and pruning is physical: the spark directory contributes zero
    // input partitions (2 files skipped at planning, not filtered later)
    assert(filtered.rdd.getNumPartitions == 1)
    assert(filtered.as[String].collect().toSeq == Seq("j1"))

    val in = all.filter(col("keyword").isin("scala", "nosuch"))
    assert(in.rdd.getNumPartitions == 1)
    assert(in.count() == 1)
  }

  test("DSv2 graft-keyword: write path round-trips through the reader") {
    import spark.implicits._
    val base = tmp("kw-dsv2-write")
    Seq(
      ("scala", "j1", 100L),
      ("scala", "j2", 200L),
      ("spark", "j3", 300L)
    ).toDF("keyword", "job", "salary")
      .write.format("graft-keyword")
      .option("fields", "job,salary:long")
      .mode("append").save(base)

    // layout is the reader's: per-keyword dirs, committed .json files,
    // no staging leftovers
    val dirs = new java.io.File(base).listFiles().filter(_.isDirectory)
      .map(_.getName).sorted
    assert(dirs.toSeq == Seq("scala", "spark"))
    val files = new java.io.File(base, "scala").listFiles().map(_.getName)
    assert(files.forall(f => f.endsWith(".json") && !f.startsWith(".staging")), files.toSeq)

    val back = spark.read.format("graft-keyword")
      .option("fields", "job,salary:long").load(base)
      .orderBy("job")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(back.toSeq == Seq(
      ("scala", "j1", 100L), ("scala", "j2", 200L), ("spark", "j3", 300L)))

    // second append adds rows without clobbering the first batch (S6)
    Seq(("scala", "j9", 900L)).toDF("keyword", "job", "salary")
      .write.format("graft-keyword")
      .option("fields", "job,salary:long")
      .mode("append").save(base)
    assert(spark.read.format("graft-keyword")
      .option("fields", "job").load(base).count() == 4)
  }

  test("DSv2 graft-keyword: runtime filtering prunes directories from a join") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import graft.sources.KeywordScan
    val base = tmp("kw-dsv2-rt")
    // pad the fact side: the connector now reports REAL size statistics,
    // so an unpadded 3-row fact would itself become the broadcast side
    // and no runtime filter would target its scan. The scenario being
    // modeled is big-fact x selective-dim.
    val pad = "x" * 2048
    writeSnapshots(base, "scala", "s1.json",
      s"""{"job":"j1"}""" +: (1 to 20).map(i => s"""{"job":"f$i","pad":"$pad"}"""))
    writeSnapshots(base, "spark", "p1.json",
      s"""{"job":"j2"}""" +: (1 to 20).map(i => s"""{"job":"g$i","pad":"$pad"}"""))
    writeSnapshots(base, "flink", "f1.json",
      s"""{"job":"j3"}""" +: (1 to 20).map(i => s"""{"job":"h$i","pad":"$pad"}"""))

    // dim must be a real relation (same requirement as DPP: a folded
    // LocalRelation has no Filter node for the pruning rule to find)
    val dimDir = tmp("kw-dsv2-rt-dim")
    Seq(("scala", "keep"), ("spark", "drop"), ("flink", "drop"))
      .toDF("kw", "tag").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("tag") === "keep")

    try {
      // fixture-scale benefit estimate, as in DppSpec; threshold under the
      // padded fact size so only the dim broadcasts (the at-scale regime)
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10240")
      val fact = spark.read.format("graft-keyword")
        .option("fields", "job").load(base)
      val q = fact.join(dim, fact("keyword") === dim("kw")).select("keyword", "job")
      val rows = q.collect().map(r => (r.getString(0), r.getString(1)))
      assert(rows.length == 21 && rows.forall(_._1 == "scala"), rows.toSeq.take(5))
      assert(rows.contains(("scala", "j1")))

      // the scan received the runtime keys and re-planned its partitions.
      // The join runs under AQE: descend through the adaptive plan AND
      // its query stages (stages are collect-leaves)
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def findScan(p: SparkPlan): Option[KeywordScan] =
        p.collectFirst { case b: BatchScanExec => b.scan.asInstanceOf[KeywordScan] }
          .orElse(p.collect { case qs: QueryStageExec => qs.plan }
            .flatMap(findScan(_)).headOption)
      val root = q.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val scan = findScan(root).get
      assert(scan.runtimeKeywords.contains(Set("scala")), scan.runtimeKeywords)
      assert(q.queryExecution.executedPlan.toString.contains("RuntimeFilters"),
        "no runtime filter attached to the scan")
    } finally {
      spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.useStats")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("DSv2 graft-keyword: streaming read ingests only new files per tick") {
    import org.apache.spark.sql.streaming.Trigger
    val base = tmp("kw-dsv2-stream")
    val outDir = tmp("kw-dsv2-stream-out")
    val ckpt = tmp("kw-dsv2-stream-ckpt")
    writeSnapshots(base, "scala", "s1.json", Seq("""{"job":"j1"}"""))
    writeSnapshots(base, "spark", "p1.json", Seq("""{"job":"j2"}"""))

    def drain(): Unit = {
      val q = spark.readStream.format("graft-keyword")
        .option("fields", "job").load(base)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).outputMode("append").start()
      q.awaitTermination(60000)
    }

    drain()
    assert(spark.read.parquet(outDir).count() == 2)

    // second tick: one new file appears; ONLY its rows are ingested
    // (checkpointed file-set offset — a restart never re-reads)
    writeSnapshots(base, "scala", "s2.json", Seq("""{"job":"j9"}"""))
    drain()
    val rows = spark.read.parquet(outDir).select("keyword", "job")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(rows.toSeq == Seq(("scala", "j1"), ("scala", "j9"), ("spark", "j2")))

    // third tick with nothing new: no duplicate ingestion
    drain()
    assert(spark.read.parquet(outDir).count() == 3)
  }

  test("DSv2 graft-keyword: COUNT(*) pushdown skips JSON parsing") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.SparkPlan
    def scans(p: SparkPlan): Seq[BatchScanExec] = p.collect {
      case b: BatchScanExec => Seq(b)
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
    }.flatten
    val base = tmp("kw-aggpush")
    writeSnapshots(base, "scala", "s1.json", Seq("""{"job":"j1"}""", """{"job":"j2"}"""))
    writeSnapshots(base, "scala", "s2.json", Seq("""{"job":"j3"}"""))
    writeSnapshots(base, "spark", "p1.json", Seq("""{"job":"j4"}"""))
    def load() = spark.read.format("graft-keyword")
      .option("fields", "job").load(base)

    // grouped count: one pre-counted row per file, keyword carried
    val grouped = load().groupBy("keyword").count()
    assert(grouped.collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      == Seq(("scala", 3L), ("spark", 1L)))
    grouped.collect() // materialize AQE stages for plan inspection
    val gScan = scans(grouped.queryExecution.executedPlan)
    assert(gScan.nonEmpty && gScan.forall(
      _.scan.isInstanceOf[graft.sources.KeywordCountScan]),
      grouped.queryExecution.executedPlan.toString)

    // global count: no keyword column in the pushed schema
    val total = load().agg(count(lit(1)).as("n"))
    assert(total.collect()(0).getLong(0) == 4L)
    val tScan = scans(total.queryExecution.executedPlan)
    assert(tScan.nonEmpty && tScan.forall(
      _.scan.isInstanceOf[graft.sources.KeywordCountScan]))

    // a query needing payload fields must NOT be count-pushed
    val rows = load().groupBy("keyword").agg(max(col("job")).as("mx"))
    assert(rows.collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
      == Seq(("scala", "j3"), ("spark", "j4")))
    val rScan = scans(rows.queryExecution.executedPlan)
    assert(rScan.nonEmpty && rScan.forall(
      _.scan.isInstanceOf[graft.sources.KeywordScan]))

    // keyword filter still prunes directories under pushdown
    val filtered = load().filter(col("keyword") === "scala").groupBy("keyword").count()
    assert(filtered.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      == Seq(("scala", 3L)))
    assert(filtered.rdd.getNumPartitions <= 2) // scala's two files only
  }

  test("DSv2 graft-keyword: limit pushdown bounds per-file reads; stats are real") {
    val base = tmp("kw-limit")
    writeSnapshots(base, "scala", "s1.json",
      (1 to 50).map(i => s"""{"job":"j$i"}"""))
    writeSnapshots(base, "spark", "p1.json",
      (1 to 50).map(i => s"""{"job":"k$i"}"""))
    def load() = spark.read.format("graft-keyword")
      .option("fields", "job").load(base)

    val lim = load().limit(3)
    assert(lim.collect().length == 3)
    val plan = lim.queryExecution.executedPlan.toString
    assert(plan.contains("PushedLimit: 3"), plan)

    // SupportsReportStatistics: the optimizer sees real file bytes, not
    // "unknown = infinite" — which is what lets size-gated broadcast
    // helpers treat connector tables like parquet ones
    val bytes = load().queryExecution.optimizedPlan.stats.sizeInBytes
    val onDisk = new java.io.File(base).listFiles.flatMap(_.listFiles)
      .map(_.length).sum
    assert(bytes == BigInt(onDisk), s"stats=$bytes disk=$onDisk")
    // and the keyword filter shrinks the estimate with the pruning
    val filtered = load().filter(col("keyword") === "scala")
      .queryExecution.optimizedPlan.stats.sizeInBytes
    assert(filtered < bytes, s"filtered=$filtered all=$bytes")
  }

  test("DSv2 graft-keyword: maxFilesPerTrigger bounds each micro-batch (T4)") {
    import org.apache.spark.sql.streaming.Trigger
    val base = tmp("kw-admit")
    val outDir = tmp("kw-admit-out")
    val ckpt = tmp("kw-admit-ckpt")
    writeSnapshots(base, "scala", "s1.json", Seq("""{"job":"j1"}"""))
    writeSnapshots(base, "scala", "s2.json", Seq("""{"job":"j2"}"""))
    writeSnapshots(base, "spark", "p1.json", Seq("""{"job":"j3"}"""))

    val q = spark.readStream.format("graft-keyword")
      .option("fields", "job")
      .option("maxFilesPerTrigger", "1").load(base)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    q.awaitTermination(60000)

    // all rows arrive, but over THREE bounded batches (one file each),
    // not one catch-up batch — the offset log has one entry per batch
    assert(spark.read.parquet(outDir).count() == 3)
    val batches = new java.io.File(ckpt, "offsets").listFiles()
      .count(_.getName.forall(_.isDigit))
    assert(batches == 3, s"expected 3 micro-batches, got $batches")
  }

  test("DSv2 graft-keyword: admission is arrival-fair across keywords") {
    import org.apache.spark.sql.streaming.Trigger
    val base = tmp("kw-fair")
    val outDir = tmp("kw-fair-out")
    val ckpt = tmp("kw-fair-ckpt")
    // 'aaa' is chatty AND alphabetically first; 'zzz' landed the OLDEST
    // snapshot. Keyword-ordered admission would drain all of 'aaa'
    // before 'zzz' ever runs; arrival order must admit t0 first.
    writeSnapshots(base, "zzz", "t0.json", Seq("""{"job":"oldest"}"""))
    writeSnapshots(base, "aaa", "t1.json", Seq("""{"job":"a1"}"""))
    writeSnapshots(base, "aaa", "t2.json", Seq("""{"job":"a2"}"""))

    val q = spark.readStream.format("graft-keyword")
      .option("fields", "job")
      .option("maxFilesPerTrigger", "1").load(base)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    q.awaitTermination(60000)

    // batch 0's offset must already carry the zzz watermark: the oldest
    // file won admission in the very first bounded batch
    val off0 = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(ckpt, "offsets/0").toPath))
    assert(off0.contains("zzz"),
      s"first admitted batch skipped the oldest keyword: $off0")
    assert(spark.read.parquet(outDir).count() == 3)
  }

  test("DSv2 graft-keyword: non-positive maxFilesPerTrigger fails fast") {
    val base = tmp("kw-badopt")
    writeSnapshots(base, "scala", "s1.json", Seq("""{"job":"j1"}"""))
    // option parsing lives in newScanBuilder, shared by batch and
    // streaming — the batch path surfaces the error synchronously
    def msgChain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(c => String.valueOf(c.getMessage)).mkString(" | ")
    def read(v: String) = spark.read.format("graft-keyword")
      .option("fields", "job").option("maxFilesPerTrigger", v)
      .load(base).count()
    val e0 = intercept[Exception] { read("0") }
    assert(msgChain(e0).contains("maxFilesPerTrigger"))
    val eBad = intercept[Exception] { read("many") }
    assert(msgChain(eBad).contains("maxFilesPerTrigger"))
  }

  test("DSv2 graft-keyword: ORDER BY keyword LIMIT pushes as partial top-n") {
    val base = tmp("kw-topn")
    writeSnapshots(base, "beam", "b1.json",
      (1 to 40).map(i => s"""{"job":"b$i"}"""))
    writeSnapshots(base, "scala", "s1.json",
      (1 to 40).map(i => s"""{"job":"s$i"}"""))
    writeSnapshots(base, "spark", "p1.json",
      (1 to 40).map(i => s"""{"job":"p$i"}"""))
    def load() = spark.read.format("graft-keyword")
      .option("fields", "job").load(base)

    // every partition is keyword-constant, so per-file "any k rows" is a
    // valid partial top-k by keyword; the global sort-merge keeps only
    // the lexicographically smallest keyword's rows
    val q = load().orderBy(col("keyword")).limit(2)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedTopN: keyword, 2"), plan)
    assert(q.collect().map(_.getString(0)).toSeq == Seq("beam", "beam"))

    // descending flips which keyword survives — same pushdown
    val qd = load().orderBy(col("keyword").desc).limit(1)
    assert(qd.queryExecution.executedPlan.toString
      .contains("PushedTopN: keyword, 1"))
    assert(qd.collect().map(_.getString(0)).toSeq == Seq("spark"))

    // a payload sort must NOT push (rows within a file are unordered by
    // payload — per-file head-k would be wrong); plain limit still does
    val qj = load().orderBy(col("job")).limit(2)
    val pj = qj.queryExecution.executedPlan.toString
    assert(!pj.contains("PushedTopN"), pj)
    assert(qj.collect().map(_.getString(1)).toSeq == Seq("b1", "b10"))
  }

  test("DSv2 graft-keyword: keyword-grouped partitioning elides the agg shuffle") {
    val base = tmp("kw-kgp")
    writeSnapshots(base, "scala", "s1.json", Seq("""{"job":"j1"}""", """{"job":"j2"}"""))
    writeSnapshots(base, "scala", "s2.json", Seq("""{"job":"j3"}"""))
    writeSnapshots(base, "spark", "p1.json", Seq("""{"job":"j4"}"""))
    val conf = spark.conf
    val key = "spark.sql.sources.v2.bucketing.enabled"
    val old = conf.getOption(key)
    try {
      conf.set(key, "true")
      // a ROW-LEVEL aggregation (max needs the payload, so COUNT pushdown
      // does not supersede the scan): storage-partitioned execution means
      // the per-keyword rollup of actual rows needs NO Exchange
      val agg = spark.read.format("graft-keyword")
        .option("fields", "job").option("partitioning", "keyword").load(base)
        .groupBy("keyword").agg(max(col("job")).as("mx"))
      val rows = agg.collect().map(r => (r.getString(0), r.getString(1))).sorted
      assert(rows.toSeq == Seq(("scala", "j3"), ("spark", "j4")))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan)
    } finally {
      old.fold(conf.unset(key))(v => conf.set(key, v))
    }
  }

  test("DSv2 graft-keyword: streaming offset is O(#keywords), not O(#files)") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.sources.KeywordWatermarkOffset
    // deterministic single-line serialization + round-trip
    val o = KeywordWatermarkOffset(Map("spark" -> "p9.json", "scala" -> "s2.json"))
    assert(o.json() == """{"scala":"s2.json","spark":"p9.json"}""")
    assert(!o.json().contains("\n"))
    assert(KeywordWatermarkOffset.fromJson(o.json()) == o)

    // end-to-end: many files per keyword, the committed offset log line
    // carries only the per-keyword watermark, not the file list
    val base = tmp("kw-wm-stream")
    val outDir = tmp("kw-wm-out")
    val ckpt = tmp("kw-wm-ckpt")
    (1 to 5).foreach(i =>
      writeSnapshots(base, "scala", s"s$i.json", Seq(s"""{"job":"j$i"}""")))
    val q = spark.readStream.format("graft-keyword")
      .option("fields", "job").load(base)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    q.awaitTermination(60000)
    assert(spark.read.parquet(outDir).count() == 5)
    val offsetFiles = new java.io.File(ckpt, "offsets").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    val lastLine = scala.io.Source.fromFile(offsetFiles.last).getLines().toSeq.last
    assert(lastLine.contains("s5.json"), lastLine)
    assert(!lastLine.contains("s1.json"), s"offset still carries old files: $lastLine")
  }

  test("DSv2 graft-keyword: streaming WRITE stages per epoch, readable back") {
    import org.apache.spark.sql.streaming.Trigger
    val inDir = tmp("kw-sw-in")
    val zone = tmp("kw-sw-zone")
    val ckpt = tmp("kw-sw-ckpt")
    import spark.implicits._
    Seq(("scala", "j1"), ("scala", "j2"), ("spark", "j3"))
      .toDF("keyword", "job").write.mode("append").parquet(inDir)

    val q = spark.readStream
      .schema("keyword STRING, job STRING").parquet(inDir)
      .writeStream.format("graft-keyword")
      .option("fields", "job")
      .option("path", zone).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    q.awaitTermination(60000)

    // epoch commit renamed everything into place: no staging leftovers,
    // epoch id visible in the committed names; the _epochs marker dir
    // holds the exactly-once commit record and is hidden from readers
    val files = new java.io.File(zone).listFiles
      .filterNot(_.getName.startsWith("_")).flatMap(_.listFiles).map(_.getName)
    assert(files.nonEmpty && files.forall(f =>
      f.endsWith(".json") && !f.startsWith(".staging")), files.toSeq)
    assert(files.forall(_.startsWith("epoch")), files.toSeq)
    assert(new java.io.File(new java.io.File(zone, "_epochs"), "epoch-0").exists())

    // and the connector reads its own streaming output back
    val got = spark.read.format("graft-keyword")
      .option("fields", "job").load(zone)
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(got.toSeq == Seq(("scala", "j1"), ("scala", "j2"), ("spark", "j3")))
  }

  test("DSv2 graft-keyword: replayed epoch commit is idempotent (exactly-once)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String
    import graft.sources.{KeywordStagedFiles, KeywordStreamingWrite, KeywordStreamingWriterFactory}
    val zone = tmp("kw-epoch-replay")
    val schema = StructType(Seq(
      StructField("keyword", StringType), StructField("job", StringType)))
    val sink = new KeywordStreamingWrite(zone, schema)
    val factory = KeywordStreamingWriterFactory(zone, schema)
    def stage(epochId: Long, taskId: Long, jobs: Seq[String]): KeywordStagedFiles = {
      val w = factory.createWriter(0, taskId, epochId)
      jobs.foreach(j => w.write(InternalRow(
        UTF8String.fromString("scala"), UTF8String.fromString(j))))
      w.commit().asInstanceOf[KeywordStagedFiles]
    }
    def readBack(): Seq[String] = spark.read.format("graft-keyword")
      .option("fields", "job").load(zone)
      .collect().map(_.getString(1)).toSeq.sorted

    // first attempt of epoch 7 commits normally
    sink.commit(7L, Array(stage(7L, 0L, Seq("j1", "j2"))))
    assert(readBack() == Seq("j1", "j2"))

    // restart between sink commit and offset-log write: Spark replays
    // epoch 7 with fresh tasks — the marker makes the second commit a
    // no-op (replayed staging discarded), NOT an append
    sink.commit(7L, Array(stage(7L, 1L, Seq("j1", "j2"))))
    assert(readBack() == Seq("j1", "j2"), "replayed epoch duplicated data")
    // no staging leftovers from the discarded replay
    val leftover = new java.io.File(zone, "scala").listFiles()
      .map(_.getName).filter(_.startsWith(".staging"))
    assert(leftover.isEmpty, leftover.toSeq)

    // a DIFFERENT epoch still appends, and the marker dir stays hidden
    // from readers (hidden-path rule)
    sink.commit(8L, Array(stage(8L, 2L, Seq("j3"))))
    assert(readBack() == Seq("j1", "j2", "j3"))
    assert(new java.io.File(new java.io.File(zone, "_epochs"), "epoch-7").exists())

    // crash mid-rename: epoch 9's first attempt left partial output and
    // no marker — the retry replaces it instead of appending to it
    val partial = stage(9L, 3L, Seq("j4", "j5"))
    new java.io.File(partial.files.head).renameTo(new java.io.File(
      new java.io.File(partial.files.head).getParentFile,
      new java.io.File(partial.files.head).getName.stripPrefix(".staging-")))
    partial.files.tail.foreach(f => new java.io.File(f).delete())
    sink.commit(9L, Array(stage(9L, 4L, Seq("j4", "j5"))))
    assert(readBack() == Seq("j1", "j2", "j3", "j4", "j5"),
      "partial first attempt not replaced on retry")
  }

  test("DSv2 graft-keyword: aborted tasks leave no visible files") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String
    import graft.sources.{KeywordStagedFiles, KeywordWriterFactory}
    val base = tmp("kw-dsv2-abort")
    val schema = StructType(Seq(
      StructField("keyword", StringType), StructField("job", StringType)))
    val writer = KeywordWriterFactory(base, schema).createWriter(0, 0L)
    writer.write(InternalRow(UTF8String.fromString("scala"),
                             UTF8String.fromString("j1")))
    // before commit: only a hidden staging file exists -> reader sees nothing
    val staged = new java.io.File(base, "scala").listFiles().map(_.getName)
    assert(staged.forall(_.startsWith(".staging-")), staged.toSeq)
    assert(spark.read.format("graft-keyword")
      .option("fields", "job").load(base).count() == 0)
    // abort: staging removed entirely
    writer.abort()
    assert(new java.io.File(base, "scala").listFiles().isEmpty)

    // and the commit path makes exactly those files visible
    val w2 = KeywordWriterFactory(base, schema).createWriter(1, 1L)
    w2.write(InternalRow(UTF8String.fromString("scala"),
                         UTF8String.fromString("j2")))
    val msg = w2.commit().asInstanceOf[KeywordStagedFiles]
    new graft.sources.KeywordBatchWrite(base, schema).commit(Array(msg))
    assert(spark.read.format("graft-keyword")
      .option("fields", "job").load(base).count() == 1)
  }

  test("streaming increments work for non-ASCII keywords (encoded dirs)") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.sources.KeywordScanUtil.dirName
    val base = tmp("kw-zh-stream")
    val outDir = tmp("kw-zh-stream-out")
    val ckpt = tmp("kw-zh-stream-ckpt")
    // land snapshots in the ENCODED layout the writer produces (the
    // offset log keys on the decoded keyword — Chinese must survive the
    // encode/decode boundary across ticks and checkpoint resume)
    writeSnapshots(base, dirName("區塊鏈工程師"), "t1.json", Seq("""{"job":"j1"}"""))
    def drain(): Unit = {
      val q = spark.readStream.format("graft-keyword")
        .option("fields", "job").load(base)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).outputMode("append").start()
      q.awaitTermination(60000)
      ()
    }
    drain()
    writeSnapshots(base, dirName("區塊鏈工程師"), "t2.json", Seq("""{"job":"j2"}"""))
    drain()
    val rows = spark.read.parquet(outDir).select("keyword", "job")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(rows.toSeq == Seq(("區塊鏈工程師", "j1"), ("區塊鏈工程師", "j2")))
    // batch read agrees and the keyword filter prunes to the encoded dir
    assert(spark.read.format("graft-keyword").option("fields", "job")
      .load(base).filter(org.apache.spark.sql.functions.col("keyword") === "區塊鏈工程師")
      .count() == 2)
  }

  test("keyword dir codec: non-ASCII round-trips, legacy names pass through") {
    import graft.sources.KeywordScanUtil.{dirName, dirKeyword}
    assert(dirKeyword(dirName("區塊鏈工程師")) == "區塊鏈工程師")
    assert(dirName("區塊鏈工程師").forall(_ < 128)) // pure ASCII on disk
    assert(dirName("en") == "en")                   // ASCII zones unchanged
    assert(dirKeyword(dirName("C++")) == "C++")
    assert(dirKeyword("C++") == "C++")              // legacy unencoded dir
    assert(dirKeyword("50%off") == "50%off")        // stray '%' never throws
    assert(dirName("a b") == "a%20b")               // space is %20, never '+'
    assert(dirKeyword(dirName("a b")) == "a b")
    assert(dirKeyword(dirName("🚀jobs")) == "🚀jobs") // non-BMP round-trips
    assert(dirKeyword("🚀jobs") == "🚀jobs")          // legacy literal non-BMP
  }
}
