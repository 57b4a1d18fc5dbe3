package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Core relational surface: scan/filter/project, hash aggregation,
  * broadcast + shuffle joins, semi/anti/outer joins, rollup/cube,
  * window functions, top-k, set ops.
  *
  * Determinism rules (SURVEY.md §5/§7): monetary aggregates go through
  * DecimalType so Spark and the DuckDB oracle sum EXACTLY, then cast to
  * double at the end (both engines convert the same exact decimal to the
  * same IEEE double). Every output has a total ORDER BY. Timestamps are
  * emitted as epoch millis (bigint) or DATE, never raw TIMESTAMP.
  *
  * Scale notes: aggregations are partial+final automatically (hash agg
  * with map-side combine); the small dims (region/nation/part/supplier/
  * customer) are broadcast explicitly so the big fact tables never
  * shuffle for those joins. Only genuinely large-large joins
  * (lineitem x orders) shuffle, on their join key.
  */
object Relational {

  /** Exact decimal sum surfaced as double — bit-identical across engines. */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")
  /** Exact decimal product-sum: sum(a*b) with decimal operands. */
  private def dsum2(a: Column, b: Column): Column =
    sum(a.cast(DecimalType(18, 2)) * b.cast(DecimalType(18, 2))).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- q01: pricing summary (flagship): scan -> filter -> hash agg -> sort.
    // Filter is pushed to the parquet scan; agg is partial+final.
    "q01_pricing_summary" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-01")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
              (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(18, 2))))
            .cast("double").as("sum_disc_price"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // ---- q02: top-k via TakeOrderedAndProject (no full sort at scale).
    "q02_topk_orders" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    }),

    // ---- q03: shipping priority — 3-way join, big sides shuffle on keys,
    // group agg, top-10. customer filter prunes before the join. customer
    // grows with SF, so its broadcast is size-gated, not hard-coded.
    "q03_shipping_priority" -> ((s, d) => {
      val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val ord  = Tables.orders(s, d).filter(col("o_orderdate") < to_timestamp(lit("1998-03-15")))
      val li   = Tables.lineitem(s, d).filter(col("l_shipdate") > to_timestamp(lit("1998-03-15")))
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(ScaleOps.broadcastIfSmall(cust), ord("o_custkey") === cust("c_custkey"))
        .groupBy(col("l_orderkey"))
        .agg(dsum2(col("l_extendedprice"), lit(1) - col("l_discount")).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // ---- q05: star join through region->nation->customer/supplier.
    // region/nation are fixed-cardinality => unconditional broadcast;
    // customer/supplier grow with SF => size-gated hints (AQE decides
    // past the threshold). Only lineitem x orders shuffles at sf0.1.
    "q05_region_revenue" -> ((s, d) => {
      val region = Tables.region(s, d).filter(col("r_name") === "ASIA")
      val nation = Tables.nation(s, d)
      val cust   = Tables.customer(s, d)
      val supp   = Tables.supplier(s, d)
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
                col("o_orderdate") <  to_timestamp(lit("1999-01-01")))
      val li = Tables.lineitem(s, d)
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(ScaleOps.broadcastIfSmall(supp), li("l_suppkey") === supp("s_suppkey"))
        .join(ScaleOps.broadcastIfSmall(cust), ord("o_custkey") === cust("c_custkey") &&
                               supp("s_nationkey") === cust("c_nationkey"))
        .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
        .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(dsum2(col("l_extendedprice"), lit(1) - col("l_discount")).as("revenue"))
        .orderBy(col("n_name"))
    }),

    // ---- q06: pure scan-filter-agg; every predicate pushed to parquet.
    "q06_forecast_revenue" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
                col("l_shipdate") <  to_timestamp(lit("1997-01-01")) &&
                col("l_discount").between(0.03, 0.07) &&
                col("l_quantity") < 24)
        .agg(dsum2(col("l_extendedprice"), col("l_discount")).as("revenue"),
             count(lit(1)).as("n"))
    }),

    // ---- q07: left-semi join (EXISTS): customers with at least one
    // finished order, counted per segment. Broadcast the distinct keys.
    "q07_semi_join" -> ((s, d) => {
      val ordF = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_custkey"))
      Tables.customer(s, d)
        .join(ordF, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_customers"))
        .orderBy(col("c_mktsegment"))
    }),

    // ---- q08: left-anti join (NOT EXISTS): customers with no orders.
    "q08_anti_join" -> ((s, d) => {
      val ord = Tables.orders(s, d).select(col("o_custkey"))
      Tables.customer(s, d)
        .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    // ---- q09: outer join + agg-of-agg (TPC-H Q13 shape): distribution of
    // order counts per customer, including zero-order customers.
    "q09_order_count_hist" -> ((s, d) => {
      val cust = Tables.customer(s, d).select(col("c_custkey"))
      val ord  = Tables.orders(s, d).select(col("o_custkey"), col("o_orderkey"))
      cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // ---- q10: ROLLUP subtotals (partial aggregation still applies).
    "q10_rollup" -> ((s, d) => {
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
                coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
                col("n"), col("sum_qty"))
        .orderBy(col("returnflag"), col("linestatus"))
    }),

    // ---- q11: CUBE over two order dimensions.
    "q11_cube" -> ((s, d) => {
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .select(coalesce(col("o_orderstatus"), lit("(all)")).as("orderstatus"),
                coalesce(col("o_orderpriority"), lit("(all)")).as("orderpriority"),
                col("n"), col("sum_price"))
        .orderBy(col("orderstatus"), col("orderpriority"))
    }),

    // ---- q12: distinct (shuffle dedup) + exact/approx cardinalities.
    "q12_distinct_stats" -> ((s, d) => {
      Tables.orders(s, d)
        .agg(countDistinct(col("o_custkey")).as("n_custkeys"),
             countDistinct(col("o_orderpriority")).as("n_priorities"),
             count(lit(1)).as("n_orders"),
             min(col("o_totalprice")).as("min_price"),
             max(col("o_totalprice")).as("max_price"))
    }),

    // ---- q13: ranking window — top-3 orders per customer.
    "q13_window_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // ---- q14: running-total window over an exact decimal (order-insensitive
    // summation so Spark and DuckDB agree bit-for-bit).
    "q14_window_running_sum" -> ((s, d) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, d)
        .filter(col("l_suppkey") <= 5)
        .withColumn("running_qty",
          sum(col("l_quantity").cast(DecimalType(18, 2))).over(w).cast("double"))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
                col("running_qty"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    }),

    // ---- q15: lag/lead analytics over the event stream.
    "q15_window_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .filter(col("user_id") < 10)
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .select(col("user_id"), col("event_id"), col("value"),
                col("prev_value"), col("next_type"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // ---- q16: set operations — INTERSECT / EXCEPT of customer key sets.
    "q16_set_ops" -> ((s, d) => {
      val ord = Tables.orders(s, d)
      val fCust = ord.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      val oCust = ord.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
      val both = fCust.intersect(oCust).withColumn("kind", lit("both"))
      val fOnly = fCust.except(oCust).withColumn("kind", lit("f_only"))
      both.unionAll(fOnly)
        .groupBy(col("kind")).agg(count(lit(1)).as("n"))
        .orderBy(col("kind"))
    }),

    // ---- q17: AS-OF join (Spark has no native as-of). Implemented the
    // scalable way: union both event kinds, one window pass per user
    // carrying the last signup ts forward — O(n log n) per key, no
    // range cross-product. DuckDB oracle uses a plain correlated max.
    // Generic reusable form: graft.ops.JoinOps.asofJoinBackward.
    "q17_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("event_type").isin("signup", "purchase"))
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      // signup sorts before purchase at identical ts => inclusive as-of.
      val tagged = ev.withColumn("kind_ord",
        when(col("event_type") === "signup", 0).otherwise(1))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("kind_ord"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("last_signup_ts",
          last(when(col("event_type") === "signup", col("ts")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase" && col("last_signup_ts").isNotNull)
        .select(col("event_id"),
                unix_millis(col("last_signup_ts")).as("signup_ms"))
        .orderBy(col("event_id"))
    }),

    // ---- q18: broadcast join fact->dim + agg by part brand.
    // `part` grows with SF, so the hint is size-gated: at small SF the plan
    // is a broadcast hash join (PlanGuardSpec asserts it); at 100x the dim
    // outgrows the gate and AQE picks the strategy from runtime sizes.
    "q18_broadcast_join" -> ((s, d) => {
      val part = Tables.part(s, d).select(col("p_partkey"), col("p_brand"))
      Tables.lineitem(s, d)
        .join(ScaleOps.broadcastIfSmall(part), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("p_brand"))
    }),

    // ---- q19: grouped funnel — users whose first purchase follows their
    // first signup (conversion analysis over the event stream).
    "q19_funnel" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val firsts = ev.groupBy(col("user_id")).agg(
        min(when(col("event_type") === "signup", col("ts"))).as("first_signup"),
        min(when(col("event_type") === "purchase", col("ts"))).as("first_purchase"))
      firsts.agg(
        count(lit(1)).as("n_users"),
        count(col("first_signup")).as("n_signed_up"),
        count(when(col("first_purchase") > col("first_signup"), lit(1))).as("n_converted"))
    }),

    // ---- q20: grouped min_by/max_by (first-match semantics, ordered by a
    // unique key — SURVEY.md §2.3 first-wins rule made deterministic).
    "q20_first_last_by" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(min_by(col("value"), col("event_id")).as("first_value"),
             max_by(col("value"), col("event_id")).as("last_value"),
             count(lit(1)).as("n"))
        .orderBy(col("user_id"))
    }),

    // ---- q17b: q17's as-of semantics through the NATIVE operator
    // (plans/AsOfJoinPlan.scala — custom LogicalPlan -> Strategy ->
    // co-partitioned streaming-merge AsOfJoinExec) instead of the
    // union+window form. The strategy registers idempotently on the
    // session's experimental hook, so the driver's plain session (built
    // without withExtensions) plans the node too. Oracle identical to
    // q17: the operator must reproduce the window form bit-for-bit.
    // PlanGuardSpec pins AsOfJoinExec into this query's physical plan.
    "q17b_asof_native" -> ((s, d) => {
      if (!s.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
        s.experimental.extraStrategies =
          s.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"))
      JoinOps.asofJoinNative(purchases, signups, "user_id", "ts", "ts", Seq("ts"))
        .filter(col("asof_ts").isNotNull)
        .select(col("event_id"), unix_millis(col("asof_ts")).as("signup_ms"))
        .orderBy(col("event_id"))
    }),

    // ---- q103: the salted large-x-large equi-join (ScaleOps
    // .saltedEquiJoin) inside the oracle gate — the salt must be
    // INVISIBLE in the result: left rows spread over 8 (key, salt)
    // reducers, the right side replicated 8x, and the aggregate still
    // equals the plain join's oracle. This is the skew topology for the
    // hot-key case AQE's sort-merge split can't reach (q67 proved the
    // salted AGGREGATION oracle-invisible; this closes the join form).
    "q103_salted_join" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("okey"), col("l_partkey"), col("l_quantity"))
      val ord = Tables.orders(s, d)
        .select(col("o_orderkey").as("okey"), col("o_orderpriority"))
      ScaleOps.saltedEquiJoin(li, ord, "okey", "l_partkey", 8)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("o_orderpriority"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity::DECIMAL(18,2))::DOUBLE AS sum_qty,
        |  sum(l_extendedprice::DECIMAL(18,2))::DOUBLE AS sum_base_price,
        |  sum(l_extendedprice::DECIMAL(18,2) * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2)))::DOUBLE AS sum_disc_price,
        |  sum(l_quantity::DECIMAL(18,2))::DOUBLE / count(*) AS avg_qty,
        |  sum(l_extendedprice::DECIMAL(18,2))::DOUBLE / count(*) AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q03_shipping_priority" ->
      """SELECT l_orderkey,
        |  sum(l_extendedprice::DECIMAL(18,2) * (1 - l_discount)::DECIMAL(18,2))::DOUBLE AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l_shipdate > TIMESTAMP '1998-03-15'
        |GROUP BY l_orderkey
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q05_region_revenue" ->
      """SELECT n_name,
        |  sum(l_extendedprice::DECIMAL(18,2) * (1 - l_discount)::DECIMAL(18,2))::DOUBLE AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1999-01-01'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q06_forecast_revenue" ->
      """SELECT sum(l_extendedprice::DECIMAL(18,2) * l_discount::DECIMAL(18,2))::DOUBLE AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q07_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q08_anti_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q09_order_count_hist" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q10_rollup" ->
      """SELECT coalesce(l_returnflag, '(all)') AS returnflag,
        |  coalesce(l_linestatus, '(all)') AS linestatus,
        |  count(*) AS n, sum(l_quantity::DECIMAL(18,2))::DOUBLE AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,

    "q11_cube" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS orderstatus,
        |  coalesce(o_orderpriority, '(all)') AS orderpriority,
        |  count(*) AS n, sum(o_totalprice::DECIMAL(18,2))::DOUBLE AS sum_price
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY orderstatus, orderpriority""".stripMargin,

    "q12_distinct_stats" ->
      """SELECT count(DISTINCT o_custkey) AS n_custkeys,
        |  count(DISTINCT o_orderpriority) AS n_priorities,
        |  count(*) AS n_orders,
        |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
        |FROM orders""".stripMargin,

    "q13_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q14_window_running_sum" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  (sum(l_quantity::DECIMAL(18,2)) OVER (PARTITION BY l_suppkey
        |     ORDER BY l_shipdate, l_orderkey, l_linenumber
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE AS running_qty
        |FROM lineitem WHERE l_suppkey <= 5
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,

    "q15_window_lag_lead" ->
      """SELECT user_id, event_id, value,
        |  lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
        |  lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |FROM events WHERE user_id < 10
        |ORDER BY user_id, event_id""".stripMargin,

    "q16_set_ops" ->
      """SELECT kind, count(*) AS n FROM (
        |  SELECT o_custkey, 'both' AS kind FROM
        |    (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |     INTERSECT
        |     SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |  UNION ALL
        |  SELECT o_custkey, 'f_only' AS kind FROM
        |    (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |     EXCEPT
        |     SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'))
        |GROUP BY kind ORDER BY kind""".stripMargin,

    "q17_asof_join" ->
      """SELECT p.event_id, epoch_ms(max(s.ts)) AS signup_ms
        |FROM events p JOIN events s
        |  ON s.user_id = p.user_id AND s.event_type = 'signup' AND s.ts <= p.ts
        |WHERE p.event_type = 'purchase'
        |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin,

    "q17b_asof_native" ->
      """SELECT p.event_id, epoch_ms(max(s.ts)) AS signup_ms
        |FROM events p JOIN events s
        |  ON s.user_id = p.user_id AND s.event_type = 'signup' AND s.ts <= p.ts
        |WHERE p.event_type = 'purchase'
        |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin,

    "q103_salted_join" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  sum(l_quantity::DECIMAL(18,2))::DOUBLE AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q18_broadcast_join" ->
      """SELECT p_brand, count(*) AS n,
        |  sum(l_extendedprice::DECIMAL(18,2))::DOUBLE AS sum_price
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q19_funnel" ->
      """SELECT count(*) AS n_users,
        |  count(first_signup) AS n_signed_up,
        |  count(CASE WHEN first_purchase > first_signup THEN 1 END) AS n_converted
        |FROM (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
        |  FROM events GROUP BY user_id)""".stripMargin,

    "q20_first_last_by" ->
      """SELECT user_id, arg_min(value, event_id) AS first_value,
        |  arg_max(value, event_id) AS last_value, count(*) AS n
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
