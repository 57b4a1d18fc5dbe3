package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Advanced relational surface: range joins re-expressed as equi-joins
  * (the scalable form), grouping sets, exact-formula variance/stddev,
  * percentiles, and sketch cardinalities.
  */
object Advanced {

  private val BUCKET_W = 50 // events.value in [0, ~561): 12 buckets

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- q56: range join -> equi join. Joining events to value-interval
    // buckets is a range join (BroadcastNestedLoop at scale = death); with
    // fixed-width intervals the interval id is computable on both sides,
    // so it becomes a hash equi-join. This bucketize-the-range-key trick
    // is the standard 100 TB shape for interval joins.
    "q56_range_bucket_join" -> ((s, d) => {
      val dim = s.range(0, 20).select(
        col("id").cast("int").as("bucket_id"),
        (col("id") * BUCKET_W).cast("double").as("lo"),
        ((col("id") + 1) * BUCKET_W).cast("double").as("hi"),
        concat(lit("["), col("id") * BUCKET_W, lit(","),
               (col("id") + 1) * BUCKET_W, lit(")")).as("bucket_label"))
      Tables.events(s, d)
        .withColumn("bucket_id", floor(col("value") / BUCKET_W).cast("int"))
        .join(broadcast(dim), "bucket_id")
        // the range predicate stays as a (now trivially true) guard —
        // this is what makes the rewrite semantically a range join
        .filter(col("value") >= col("lo") && col("value") < col("hi"))
        .groupBy(col("bucket_id"), col("bucket_label"))
        .agg(count(lit(1)).as("n"),
             sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
        .orderBy(col("bucket_id"))
    }),

    // ---- q57: GROUPING SETS beyond rollup/cube, with grouping_id to
    // disambiguate subtotal rows from real NULLs.
    "q57_grouping_sets" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_gs")
      s.sql(
        s"""SELECT coalesce(o_orderstatus, '(all)') AS orderstatus,
           |  coalesce(o_orderpriority, '(all)') AS orderpriority,
           |  cast(grouping_id(o_orderstatus, o_orderpriority) AS int) AS gid,
           |  count(*) AS n
           |FROM orders_gs
           |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
           |                        (o_orderstatus, o_orderpriority))
           |ORDER BY orderstatus, orderpriority, gid""".stripMargin)
    }),

    // ---- q58: variance/stddev via the explicit exact-moment formula —
    // decimal power sums make the moments order-insensitive, then a fixed
    // IEEE op sequence matches DuckDB bit-for-bit (built-in var_samp uses
    // engine-specific streaming updates that never hash-match).
    "q58_variance" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("sx"),
          sum(col("l_quantity").cast(DecimalType(18, 2)) *
              col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("sx2"))
        .select(col("l_returnflag"),
                col("n"),
                round((col("sx2") - col("sx") * col("sx") / col("n")) /
                      (col("n") - 1), 6).as("var_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // ---- q59: exact percentile (median/p90) — Spark `percentile` and
    // DuckDB `quantile_cont` both use linear interpolation on the sorted
    // values; inputs are 2-decimal doubles so the interpolation arithmetic
    // is identical.
    "q59_percentiles" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(expr("percentile(o_totalprice, 0.5)").as("p50"),
             expr("percentile(o_totalprice, 0.9)").as("p90"),
             count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
    }),

    // ---- q62: correlation via exact decimal cross-moments — same
    // order-insensitivity story as q58 (built-in corr never hash-matches).
    "q62_correlation" -> ((s, d) => {
      Tables.lineitem(s, d)
        .agg(
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("sx"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("sy"),
          sum(col("l_quantity").cast(DecimalType(18, 2)) *
              col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("sxx"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
              col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("syy"),
          sum(col("l_quantity").cast(DecimalType(18, 2)) *
              col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("sxy"))
        .select(col("n"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
                (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
                 sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 6)
            .as("corr_qty_price"))
    }),

    // ---- q63: approximate percentile sketch. Spark's KLL-ish
    // approx_percentile and DuckDB's t-digest give different raw estimates
    // by design, so the query emits the EXACT percentile plus a
    // bounded-error boolean (|approx-exact|/exact <= 5%) — the boolean IS
    // engine-portable, so the oracle (exact, TRUE) hash-checks the sketch.
    "q63_approx_percentile" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("p50_approx"),
             expr("percentile(l_extendedprice, 0.5)").as("p50_exact"))
        .select(col("l_returnflag"), col("p50_exact"),
          (abs(col("p50_approx") - col("p50_exact")) / col("p50_exact") <= 0.05)
            .as("within_5pct"))
        .orderBy(col("l_returnflag"))
    }),

    // ---- q67: skew-safe holistic aggregation — collect every event_id
    // per event_type (a 5-key, ~2000-values-per-key hot-key workload)
    // through the two-phase salted path, then fingerprint the sorted
    // collection. The oracle computes the same fingerprint from a plain
    // ordered string_agg: salting must be RESULT-INVISIBLE.
    "q67_salted_collect" -> ((s, d) => {
      val salted = graft.ops.ScaleOps.saltedCollectList(
        Tables.events(s, d).select(col("event_type"), col("event_id")),
        key = "event_type", valueCol = "event_id",
        saltSource = "event_id", salts = 8)
      salted.select(col("event_type"),
                    size(col("event_ids")).cast("long").as("n"),
                    md5(concat_ws(",",
                      expr("transform(event_ids, x -> cast(x AS string))"))).as("ids_md5"))
        .orderBy(col("event_type"))
    }),

    // ---- q68: the reference's RGB tolerance predicate (P9/A5) under the
    // oracle gate — colors synthesized from event ids, classified by the
    // native codegen IsSimilarRgb expression; the oracle mirrors the
    // parse+tolerance semantics on the underlying channel ints.
    "q68_rgb_similarity" -> ((s, d) => {
      import graft.functions.RgbFunctions
      Tables.events(s, d)
        .withColumn("r", (col("event_id") * 37 % 256).cast("int"))
        .withColumn("g", (col("event_id") * 59 % 256).cast("int"))
        .withColumn("b", (col("event_id") * 83 % 256).cast("int"))
        .withColumn("css", concat(lit("rgb("), col("r"), lit(", "),
                                  col("g"), lit(", "), col("b"), lit(")")))
        .withColumn("near_gray",
          RgbFunctions.isSimilarRgb(col("css"), lit("rgb(120, 120, 120)"), 40))
        .groupBy(col("near_gray")).agg(count(lit(1)).as("n"))
        .orderBy(col("near_gray"))
    }),

    // ---- q60: HLL sketch cardinality. Spark's HLL++ and DuckDB's
    // approx_count_distinct estimate differently by design, so — as in
    // q63 — the query emits the exact cardinality plus a bounded-error
    // boolean, which both engines CAN agree on, making the sketch
    // hash-checkable (oracle emits (exact, TRUE)).
    "q60_approx_distinct" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
             countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx_parts") - col("exact_parts")).cast("double") /
            col("exact_parts") <= 0.05).as("within_5pct"))
        .orderBy(col("l_returnflag"))
    }),

    // ---- q76: distribution window family — ntile / percent_rank /
    // cume_dist / nth_value over a per-priority price ordering. The
    // ordering key (price, orderkey) is unique, so the rank arithmetic
    // ((k-1)/(n-1), k/n) is tie-free and engine-exact. One shuffle on the
    // partition key; nth_value needs the full frame (unbounded both ways).
    "q76_window_distribution" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .withColumn("quartile", ntile(4).over(w).cast("long"))
        .withColumn("pr", round(percent_rank().over(w), 6))
        .withColumn("cd", round(cume_dist().over(w), 6))
        .withColumn("third_price", nth_value(col("o_totalprice"), 3).over(full))
        .select(col("o_orderpriority"), col("o_orderkey"), col("quartile"),
                col("pr"), col("cd"), col("third_price"))
        .orderBy(col("o_orderpriority"), col("o_orderkey"))
    }),

    // ---- q77: long->wide pivot. The value list is EXPLICIT — without it
    // Spark runs an extra distinct-collect job to discover columns, and
    // the output schema becomes data-dependent (a schema-drift hazard in
    // a 100 TB pipeline). One shuffle: pivot-agg is partial+final like
    // any groupBy.
    "q77_pivot_wide" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("h", hour(col("ts")))
        .groupBy(col("h"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("h"))
    }),

    // ---- q80: per-group mode (argmax-by-count). Built-in mode() is
    // tie-nondeterministic (and engine-divergent); the portable scalable
    // form is counts -> top-1 window with an explicit tie-break. Two
    // map-side-combined shuffles; the window input is group-cardinality
    // sized, not data sized.
    "q80_group_mode" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val counts = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("n").desc, col("l_quantity").asc)
      counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_returnflag"), col("l_quantity").as("mode_qty"), col("n"))
        .orderBy(col("l_returnflag"))
    }),

    // ---- q78: wide->long unpivot of the q77 shape (melt). Zero cells
    // survive the round trip (na.fill in the wide form), which the oracle
    // mirrors with a dense hours x types frame.
    "q78_unpivot_long" -> ((s, d) => {
      val wide = queries("q77_pivot_wide")(s, d)
      wide.unpivot(
          Array(col("h")),
          Array(col("click"), col("error"), col("purchase"),
                col("signup"), col("view")),
          "event_type", "n")
        .orderBy(col("h"), col("event_type"))
    }),

    // ---- q123: the Space-Saving sketch's APPROXIMATE regime under the
    // cross-engine gate (q96b runs the same TypedImperativeAggregate in
    // its exact regime; this closes the one previously un-gated cell —
    // VERDICT r7 #2). The fixture streams are near-uniform (max chunk
    // df 5 at sf0.1), so a skewed stream is synthesized arithmetically
    // from lineitem: 7 hot items carry ~1/21 of the mass each, the tail
    // is one item per partkey. Capacity 256 << distinct items, so every
    // partition buffer evicts and the partial->final merge runs the
    // error-propagating path. The gate is the q60/q63 bounded-error
    // pattern on the sketch CONTRACT, stated against the sketch's OWN
    // observable mass S = sum(cnt) rather than the stream length n
    // (ADVICE r8: offset merges can inflate counters past n across a
    // deep merge chain, so `err * cap <= n` is not a theorem of the
    // merge — `err * cap <= S` is, for ANY merge tree). Provable
    // invariants (chain-merge test in SketchSpec): every per-entry
    // err <= min counter <= S/capacity; any item with
    // true_cnt * capacity > S is present; present items bracket
    // (cnt - err <= exact <= cnt). The heavy-set FILTER stays the
    // exact-side `exact_cnt * cap > n` so the oracle can re-derive the
    // row set; presence is only asserted where the theorem asserts it
    // (exact_cnt * cap > S), absence below that is contract-legal.
    // All booleans are engine-portable; the oracle re-derives the
    // heavy set exactly and emits TRUE.
    "q123_sketch_heavy_hitters" -> ((s, d) => {
      val cap = 256
      val items = Tables.lineitem(s, d).select(
        when(col("l_orderkey") % 3 === 0,
             concat(lit("hot"), col("l_partkey") % 7))
          .otherwise(concat(lit("tail"), col("l_partkey"))).as("item"))
      // localCheckpoint: the sketch result (<= cap rows) feeds both the
      // mass scalar and the presence join — without it Spark would run
      // the whole sketch aggregation once per consumer
      val sketch = Tables.rebalance(items)
        .agg(graft.functions.SketchFunctions
          .spaceSavingTopK(col("item"), cap, cap).as("top"))
        .select(explode(col("top")).as("e"))
        .select(col("e.item").as("item"), col("e.cnt").as("sk_cnt"),
                col("e.err").as("sk_err"), col("e.sat").as("sk_sat"))
        .localCheckpoint()
      val totals = items.agg(count(lit(1)).as("n"))
      // S and the sketch-wide saturation flag are one-row scalars off the
      // same sketch frame; both crossJoins broadcast a single row.
      val mass = sketch.agg(sum(col("sk_cnt")).as("s_mass"),
                            max(col("sk_sat")).as("sk_saturated"))
      items.groupBy(col("item")).agg(count(lit(1)).as("exact_cnt"))
        .crossJoin(totals)
        .filter(col("exact_cnt") * cap > col("n"))
        .join(sketch, Seq("item"), "left")
        .crossJoin(mass)
        .select(col("item"), col("exact_cnt"),
          when(col("sk_cnt").isNotNull,
               col("sk_cnt") >= col("exact_cnt") &&
               col("sk_cnt") - col("sk_err") <= col("exact_cnt") &&
               col("sk_err") * cap <= col("s_mass"))
            .otherwise(col("exact_cnt") * cap <= col("s_mass"))
            .as("contract_ok"),
          col("sk_saturated").as("saturated"))
        .orderBy(col("item"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q56_range_bucket_join" ->
      s"""SELECT bucket_id, bucket_label, count(*) AS n,
        |  sum(value::DECIMAL(18,2))::DOUBLE AS sum_value
        |FROM events
        |JOIN (SELECT i::INT AS bucket_id, (i * $BUCKET_W)::DOUBLE AS lo,
        |             ((i + 1) * $BUCKET_W)::DOUBLE AS hi,
        |             '[' || (i * $BUCKET_W) || ',' || ((i + 1) * $BUCKET_W) || ')' AS bucket_label
        |      FROM (SELECT unnest(range(0, 20)) AS i)) b
        |  ON value >= lo AND value < hi
        |GROUP BY bucket_id, bucket_label ORDER BY bucket_id""".stripMargin,

    "q57_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS orderstatus,
        |  coalesce(o_orderpriority, '(all)') AS orderpriority,
        |  grouping(o_orderstatus, o_orderpriority)::INT AS gid, count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
        |                        (o_orderstatus, o_orderpriority))
        |ORDER BY orderstatus, orderpriority, gid""".stripMargin,

    "q58_variance" ->
      """SELECT l_returnflag, n,
        |  round((sx2 - sx * sx / n) / (n - 1), 6) AS var_qty
        |FROM (
        |  SELECT l_returnflag, count(*) AS n,
        |    sum(l_quantity::DECIMAL(18,2))::DOUBLE AS sx,
        |    sum(l_quantity::DECIMAL(18,2) * l_quantity::DECIMAL(18,2))::DOUBLE AS sx2
        |  FROM lineitem GROUP BY l_returnflag)
        |ORDER BY l_returnflag""".stripMargin,

    "q59_percentiles" ->
      """SELECT o_orderstatus, quantile_cont(o_totalprice, 0.5) AS p50,
        |  quantile_cont(o_totalprice, 0.9) AS p90, count(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q68_rgb_similarity" ->
      """SELECT near_gray, count(*) AS n FROM (
        |  SELECT abs((event_id * 37 % 256) - 120) <= 40
        |     AND abs((event_id * 59 % 256) - 120) <= 40
        |     AND abs((event_id * 83 % 256) - 120) <= 40 AS near_gray
        |  FROM events)
        |GROUP BY near_gray ORDER BY near_gray""".stripMargin,

    "q67_salted_collect" ->
      """SELECT event_type, count(*) AS n,
        |  md5(string_agg(event_id::VARCHAR, ',' ORDER BY event_id)) AS ids_md5
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q62_correlation" ->
      """SELECT n, round((n * sxy - sx * sy) /
        |  (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS corr_qty_price
        |FROM (
        |  SELECT count(*) AS n,
        |    sum(l_quantity::DECIMAL(18,2))::DOUBLE AS sx,
        |    sum(l_extendedprice::DECIMAL(18,2))::DOUBLE AS sy,
        |    sum(l_quantity::DECIMAL(18,2) * l_quantity::DECIMAL(18,2))::DOUBLE AS sxx,
        |    sum(l_extendedprice::DECIMAL(18,2) * l_extendedprice::DECIMAL(18,2))::DOUBLE AS syy,
        |    sum(l_quantity::DECIMAL(18,2) * l_extendedprice::DECIMAL(18,2))::DOUBLE AS sxy
        |  FROM lineitem)""".stripMargin,

    // q60/q63: the sketch estimate itself is engine-specific, but the
    // 5%-bound boolean is portable — the oracle asserts the bound holds.
    "q60_approx_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
        |  TRUE AS within_5pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q63_approx_percentile" ->
      """SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS p50_exact,
        |  TRUE AS within_5pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q76_window_distribution" ->
      """SELECT o_orderpriority, o_orderkey,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd,
        |  nth_value(o_totalprice, 3) OVER (
        |    PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS third_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,

    "q77_pivot_wide" ->
      """SELECT extract(hour FROM ts)::INT AS h,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY 1 ORDER BY h""".stripMargin,

    "q78_unpivot_long" ->
      """WITH hours AS (SELECT DISTINCT extract(hour FROM ts)::INT AS h FROM events),
        |types AS (SELECT * FROM (VALUES ('click'), ('error'), ('purchase'),
        |                                ('signup'), ('view')) t(event_type)),
        |counts AS (SELECT extract(hour FROM ts)::INT AS h, event_type,
        |             count(*) AS n
        |           FROM events GROUP BY 1, 2)
        |SELECT h, t.event_type, coalesce(n, 0) AS n
        |FROM hours CROSS JOIN types t
        |LEFT JOIN counts USING (h, event_type)
        |ORDER BY h, event_type""".stripMargin,

    "q80_group_mode" ->
      """SELECT l_returnflag, mode_qty, n FROM (
        |  SELECT l_returnflag, l_quantity AS mode_qty, count(*) AS n,
        |    row_number() OVER (PARTITION BY l_returnflag
        |                       ORDER BY count(*) DESC, l_quantity ASC) AS rn
        |  FROM lineitem GROUP BY l_returnflag, l_quantity)
        |WHERE rn = 1 ORDER BY l_returnflag""".stripMargin,

    // the heavy set is re-derived exactly (exact_cnt * capacity > n);
    // every sketch-contract boolean must come back TRUE. The saturation
    // flag is DERIVED, not assumed: sketch-wide evicted <=>
    // distinct(items) > capacity (an eviction needs a full buffer; a
    // merge prune needs a too-big union; conversely if distinct fits
    // capacity no buffer ever overflows) — at sf0.001 the synthesized
    // stream has only ~207 distinct items, the sketch stays EXACT, and
    // the round-8 hardcoded TRUE was wrong there (tri-scale sweep find,
    // round 9; the sf0.01 driver gate never saw it).
    "q123_sketch_heavy_hitters" ->
      """WITH s AS (
        |  SELECT CASE WHEN l_orderkey % 3 = 0 THEN 'hot' || (l_partkey % 7)
        |              ELSE 'tail' || l_partkey END AS item FROM lineitem),
        |ex AS (SELECT item, count(*) AS exact_cnt FROM s GROUP BY item),
        |n AS (SELECT count(*) AS n, count(DISTINCT item) > 256 AS sat FROM s)
        |SELECT item, exact_cnt, TRUE AS contract_ok, sat AS saturated
        |FROM ex, n WHERE exact_cnt * 256 > n.n ORDER BY item""".stripMargin
  )
}
