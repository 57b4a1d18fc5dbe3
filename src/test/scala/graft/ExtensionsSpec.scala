package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.GraftExtensions

/** The optimizer-rule suite builds its own session (extensions are fixed
  * at session construction).
  */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // getOrCreate() would return the suite-shared session and silently
    // drop withExtensions — clear the active/default session so a fresh
    // one (sharing the SparkContext) is built with the rule installed.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("size(array_intersect) > 0 is rewritten to arrays_overlap") {
    import org.apache.spark.sql.types.ArrayType
    import spark.implicits._
    // Build on top of Range (ConvertToLocalRelation would fold a local
    // fixture and hide the rewrite) with split(), whose result type is
    // containsNull=false — the only element type the rule fires on (the
    // rewrite is not exact for nullable elements).
    val df = spark.range(3).select(
      split(element_at(array(lit("a,b"), lit("a"), lit("a,b,c")),
        ($"id" + 1).cast("int")), ",").as("x"),
      split(element_at(array(lit("b,c"), lit("c"), lit("z")),
        ($"id" + 1).cast("int")), ",").as("y"))
    assert(df.schema.fields.forall(
      _.dataType.asInstanceOf[ArrayType].containsNull == false))

    val q = df.filter(size(array_intersect(col("x"), col("y"))) > 0)
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("arrays_overlap"), optimized)
    assert(!optimized.contains("array_intersect"), optimized)
    assert(q.count() == 1)

    val qNot = df.filter(size(array_intersect(col("x"), col("y"))) === 0)
    assert(qNot.queryExecution.optimizedPlan.toString.contains("arrays_overlap"))
    assert(qNot.count() == 2)
  }

  test("rewrite is guarded off for nullable-element arrays (not exact there)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // With null elements the two expressions genuinely disagree:
    // intersect([null],[null]) has size 1 (TRUE) but arrays_overlap -> NULL.
    // The guard must leave such plans alone — and the unrewritten query
    // must keep array_intersect's null-as-value semantics.
    val dir = java.nio.file.Files.createTempDirectory("ext-rule-null").toString
    val arr = ArrayType(StringType, containsNull = true)
    val schema = StructType(Seq(StructField("x", arr), StructField("y", arr)))
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row(Seq("a", null), Seq(null, "c")), // only null in common -> size 1
        Row(Seq("a"), Seq("c")),             // disjoint -> size 0
        Row(Seq("a", "b"), Seq("b"))),       // real overlap -> size 1
      schema).write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)

    val q = df.filter(size(array_intersect(col("x"), col("y"))) > 0)
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("arrays_overlap"), optimized)
    assert(q.count() == 2) // null-common row kept: rewrite would have dropped it
  }

  test("native AsOfJoinExec plans and matches the window formulation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val trades = (0 until 400).map { i =>
      (i.toLong % 20, (i * 37 % 1000).toLong, s"t$i")
    }.toDF("key", "ts", "trade").repartition(5)
    val quotes = (0 until 300).map { i =>
      (i.toLong % 20, (i * 53 % 1000).toLong, (i * 7 % 500).toDouble)
    }.toDF("key", "qts", "px").repartition(3)

    val native = graft.ops.JoinOps.asofJoinNative(
      trades, quotes, "key", "ts", "qts", Seq("px"))
    // the custom physical operator actually plans (nodes print without
    // the Exec suffix), with co-partitioning exchanges + sorts injected
    // by EnsureRequirements on both sides
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(plan.contains("Exchange hashpartitioning(key"), plan)

    val got = native.orderBy("key", "ts", "trade")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
                           Option(r.get(3)).map(_.asInstanceOf[Double])))
    val expected = graft.ops.JoinOps.asofJoinBackward(
      trades, quotes.withColumnRenamed("qts", "ts2")
        .withColumnRenamed("ts2", "qts"), "key", "ts", "qts", Seq("px"))
      .orderBy("key", "ts", "trade")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
                           Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(got.length == 400)
    assert(got.toSeq == expected.toSeq)
  }

  test("injected SQL functions resolve without imperative registration") {
    // the extensions-built session gets is_similar_rgb / ldot via
    // injectFunction — no GraftFunctions.registerAll call anywhere here
    val sim = spark.sql(
      "SELECT is_similar_rgb('rgb(10, 20, 30)', 'rgb(12, 22, 28)', 5) AS s")
      .collect()(0).getBoolean(0)
    assert(sim)
    val dot = spark.sql(
      "SELECT ldot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
      .collect()(0).getLong(0)
    assert(dot == 32L)
  }

  test("rewrite preserves results vs unoptimized comparison on random arrays") {
    import spark.implicits._
    val rows = (0 until 200).map { i =>
      (Seq.tabulate(i % 7)(j => s"t${(i * 31 + j) % 10}"),
       Seq.tabulate((i + 3) % 5)(j => s"t${(i * 17 + j) % 10}"))
    }
    val df = rows.toDF("x", "y")
    val rewritten = df.filter(size(array_intersect($"x", $"y")) > 0).count()
    // arrays_overlap directly = the semantics the rule claims
    val direct = df.filter(arrays_overlap($"x", $"y")).count()
    assert(rewritten == direct)
  }
  test("RewriteMapPivot: collect-map-then-probe collapses to per-key max (LAST_WIN)") {
    import spark.implicits._
    val prevPolicy = spark.conf.get("spark.sql.mapKeyDedupPolicy")
    val prevAnsi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      // duplicate key 'a' in group 1 (sorted entries + LAST_WIN = max
      // value wins), key 'b' missing from group 2 (null)
      val df = Seq((1L, "a", 10L), (1L, "a", 30L), (1L, "b", 5L),
                   (2L, "a", 7L), (2L, "c", 9L)).toDF("g", "k", "v")
        .repartition(3)
      def mapAgg = map_from_entries(sort_array(collect_list(struct($"k", $"v"))))
      def mapAggOf(d: org.apache.spark.sql.DataFrame) =
        map_from_entries(sort_array(collect_list(struct(d("k"), d("v")))))

      // shape 2: several probes share one map alias (Project over Aggregate)
      val q = df.groupBy($"g").agg(mapAgg.as("m"))
        .select($"g", element_at($"m", "a").as("a"), element_at($"m", "b").as("b"))
      val opt = q.queryExecution.optimizedPlan.toString
      assert(!opt.contains("map_from_entries"), opt)
      assert(!opt.contains("collect_list"), opt)
      assert(opt.contains("max(CASE WHEN"), opt)
      val got = q.orderBy("g").collect()
        .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSeq
      assert(got == Seq((1L, Some(30L), Some(5L)), (2L, Some(7L), None)))

      // null VALUES among duplicates: nulls sort first ascending, so
      // last-wins picks the max non-null — exactly max()'s null handling;
      // an all-null key stays null on both sides
      val dfN = Seq((1L, "a", Some(4L)), (1L, "a", None),
                    (1L, "b", None)).toDF("g", "k", "v")
      val qN = dfN.groupBy($"g")
        .agg(mapAggOf(dfN).as("m"))
        .select($"g", element_at($"m", "a").as("a"), element_at($"m", "b").as("b"))
      assert(!qN.queryExecution.optimizedPlan.toString.contains("collect_list"))
      val rN = qN.collect()(0)
      assert(rN.getLong(1) == 4L && rN.isNullAt(2))

      // shape 1: a single probe that CollapseProject inlines into the
      // Aggregate's own result expressions
      val q1 = df.groupBy($"g").agg(mapAgg.as("m"))
        .select($"g", element_at($"m", "a").as("a"))
      val opt1 = q1.queryExecution.optimizedPlan.toString
      assert(!opt1.contains("collect_list"), opt1)
      assert(q1.orderBy("g").collect().map(_.getLong(1)).toSeq == Seq(30L, 7L))
    } finally {
      spark.conf.set("spark.sql.mapKeyDedupPolicy", prevPolicy)
      spark.conf.set("spark.sql.ansi.enabled", prevAnsi)
    }
  }

  test("RewriteMapPivot guarded off: EXCEPTION policy, and non-probe map uses") {
    import spark.implicits._
    val prevPolicy = spark.conf.get("spark.sql.mapKeyDedupPolicy")
    val prevAnsi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val df = Seq((1L, "a", 10L), (1L, "b", 5L)).toDF("g", "k", "v")
      def probe = df.groupBy($"g")
        .agg(map_from_entries(sort_array(collect_list(struct($"k", $"v")))).as("m"))

      // default EXCEPTION policy: duplicate keys must abort, max can't
      // reproduce that — plan untouched
      spark.conf.set("spark.sql.mapKeyDedupPolicy", "EXCEPTION")
      val qEx = probe.select($"g", element_at($"m", "a").as("a"))
      assert(qEx.queryExecution.optimizedPlan.toString.contains("map_from_entries"))

      // LAST_WIN but the map ALSO feeds size(m): the rule must leave the
      // whole plan alone (rewriting would compute the aggregate twice)
      spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      val qSize = probe.select($"g", element_at($"m", "a").as("a"),
                               size($"m").as("n"))
      val optSize = qSize.queryExecution.optimizedPlan.toString
      assert(optSize.contains("map_from_entries"), optSize)
      assert(qSize.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .toSeq == Seq((1L, 10L, 2)))
    } finally {
      spark.conf.set("spark.sql.mapKeyDedupPolicy", prevPolicy)
      spark.conf.set("spark.sql.ansi.enabled", prevAnsi)
    }
  }

  test("RewriteMapPivot fires on the flagship (q101) label set written naively") {
    import spark.implicits._
    val prevPolicy = spark.conf.get("spark.sql.mapKeyDedupPolicy")
    val prevAnsi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      // q101's long-table shape — (job_id, pos, label, value) over the
      // REAL 14-label closed set — written the reference's way: build
      // the whole label->value dict per job, then probe every label.
      // One value per (job, label), so first-match == last-win == max
      // and the naive form is semantically equal to kvPivotFirst's
      // single-valued columns.
      val labels = graft.jobs.JobSchema.detailLabels
      val long = spark.range(40 * labels.size).select(
        (col("id") % 40).as("job_id"),
        (col("id") / 40 + 1).cast("int").as("pos"),
        element_at(typedLit(labels.map(_._1)),
          (col("id") / 40 + 1).cast("int")).as("label"),
        concat(lit("值"), col("id")).as("value"))
        .filter(pmod(col("job_id") + length(col("label")), lit(5)) =!= 0)
        .repartition(4).cache()
      val naive = long.groupBy($"job_id")
        .agg(map_from_entries(sort_array(collect_list(struct($"label", $"value"))))
          .as("kv"))
        .select($"job_id" +:
          labels.map { case (l, name) => element_at($"kv", l).as(name) }: _*)
      val opt = naive.queryExecution.optimizedPlan.toString
      // all 14 probes collapse: no per-group entry buffering survives
      assert(!opt.contains("collect_list"), opt)
      assert(!opt.contains("map_from_entries"), opt)
      assert("max\\(CASE WHEN".r.findAllIn(opt).size == labels.size, opt)
      // parity with the engine's pivot on every single-valued column
      val pivot = graft.jobs.JobOps.kvPivotFirst(long)
      val singles = labels.collect {
        case (l, name) if !graft.jobs.JobSchema.multiValuedLabels(l) => name }
      def key(df: org.apache.spark.sql.DataFrame) =
        df.select(col("job_id") +: singles.map(col): _*)
          .orderBy("job_id").collect().map(_.toSeq).toSeq
      assert(key(naive) == key(pivot))
      long.unpersist()
    } finally {
      spark.conf.set("spark.sql.mapKeyDedupPolicy", prevPolicy)
      spark.conf.set("spark.sql.ansi.enabled", prevAnsi)
    }
  }

  test("RewriteMapPivot result parity on random grouped data") {
    import spark.implicits._
    val prevPolicy = spark.conf.get("spark.sql.mapKeyDedupPolicy")
    val prevAnsi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val rows = (0 until 500).map { i =>
        (i.toLong % 17, s"k${i % 7}", (i * 31 % 100).toLong)
      }
      val keys = Seq("k0", "k3", "k6", "k_missing")
      val df = rows.toDF("g", "k", "v").repartition(5)
      val q = df.groupBy($"g")
        .agg(map_from_entries(sort_array(collect_list(struct($"k", $"v")))).as("m"))
        .select($"g" +: keys.map(x => element_at($"m", x).as(x)): _*)
      assert(!q.queryExecution.optimizedPlan.toString.contains("collect_list"))
      val got = q.collect().map(r =>
        r.getLong(0) -> keys.indices.map(i => Option(r.get(i + 1))).toSeq).toMap
      // expected: per group, max value per key; None when absent
      val expected = rows.groupBy(_._1).map { case (g, rs) =>
        g -> keys.map(x => rs.filter(_._2 == x).map(_._3)
          .reduceOption(_ max _)).toSeq
      }
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.mapKeyDedupPolicy", prevPolicy)
      spark.conf.set("spark.sql.ansi.enabled", prevAnsi)
    }
  }

  test("native AsOfJoinExec: null keys/timestamps join nothing, both sides") {
    import spark.implicits._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val tSchema = StructType(Seq(StructField("key", LongType, true),
      StructField("ts", LongType, true), StructField("trade", StringType, true)))
    val qSchema = StructType(Seq(StructField("key", LongType, true),
      StructField("qts", LongType, true), StructField("px", DoubleType, true)))
    val trades = spark.createDataFrame(java.util.Arrays.asList(
      Row(1L, 100L, "ok"),
      Row(null, 100L, "nullkey"),
      Row(1L, null, "nullts")), tSchema)
    val quotes = spark.createDataFrame(java.util.Arrays.asList(
      Row(1L, 50L, 9.5),
      Row(null, 40L, 1.0),   // null-key quote must never match
      Row(1L, null, 2.0)),   // null-ts quote must never match
      qSchema)
    val out = graft.ops.JoinOps.asofJoinNative(trades, quotes, "key", "ts", "qts", Seq("px"))
      .orderBy("trade").collect()
    // rows: nullkey, nullts, ok
    assert(out.length == 3)
    assert(out(0).isNullAt(3) && out(1).isNullAt(3))
    assert(out(2).getDouble(3) == 9.5)
  }

  test("native AsOfJoinExec: buffer-backed array values are deep-copied") {
    import spark.implicits._
    // right value column is an ARRAY: the exec's remembered match must not
    // alias the reused UnsafeRow buffer (stale data for later left rows)
    val trades = (0 until 200).map(i => (i.toLong % 4, 500L + i))
      .toDF("key", "ts")
    val quotes = (0 until 40).map { i =>
      (i.toLong % 4, i.toLong * 10, Seq(i.toLong, i.toLong * 2, i.toLong * 3))
    }.toDF("key", "qts", "arr")
    val native = graft.ops.JoinOps.asofJoinNative(trades, quotes, "key", "ts", "qts", Seq("arr"))
      .orderBy("key", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toSeq))
    val window = graft.ops.JoinOps.asofJoinBackward(trades,
        quotes.withColumnRenamed("qts", "wts").withColumnRenamed("wts", "qts"),
        "key", "ts", "qts", Seq("arr"))
      .orderBy("key", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toSeq))
    assert(native.toSeq == window.toSeq)
    // every trade at ts>=500 sees its key's LATEST quote array, intact
    native.groupBy(_._1).foreach { case (k, rows) =>
      assert(rows.map(_._3).distinct.size == 1, s"key $k saw mixed arrays")
    }
  }
}
