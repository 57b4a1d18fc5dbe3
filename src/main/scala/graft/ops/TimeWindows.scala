package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Event-time windowing surface (SURVEY.md §2.7 extension ops): tumbling,
  * sliding, and session windows over the `events` stream table, run here
  * in batch mode so the DuckDB oracle can check them. The exact same
  * expressions run under Structured Streaming (see graft.streaming) with
  * `withWatermark` — Spark's batch and streaming window semantics match.
  *
  * Window starts are emitted as epoch millis (bigint): raw TIMESTAMP
  * columns don't survive the ns/µs precision difference between the
  * fixture parquet and the two engines (SURVEY.md §7 risks).
  */
object TimeWindows {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- q36: tumbling 1h window per event type. window() aligns to the
    // epoch, so for whole-hour widths it equals date_trunc('hour').
    "q36_tumbling_window" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
             sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
        .select(unix_millis(col("window.start")).as("ws"),
                col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("ws"), col("event_type"))
    }),

    // ---- q37: sliding window (1h wide, 30m slide) — each event lands in
    // exactly two windows; Spark materializes both assignments.
    "q37_sliding_window" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(unix_millis(col("window.start")).as("ws"), col("n"))
        .orderBy(col("ws"))
    }),

    // ---- q38: session windows with a 10-minute gap, per user. Sessions
    // merge while consecutive events are < gap apart; the oracle computes
    // the same islands with lag() over µs epochs.
    "q38_session_window" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
             sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
        .select(col("user_id"),
                unix_millis(col("session_window.start")).as("session_start_ms"),
                col("n_events"), col("sum_value"))
        .orderBy(col("user_id"), col("session_start_ms"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q36_tumbling_window" ->
      """SELECT epoch_ms(date_trunc('hour', ts)) AS ws, event_type,
        |  count(*) AS n, sum(value::DECIMAL(18,2))::DOUBLE AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin,

    "q37_sliding_window" ->
      """SELECT ws, count(*) AS n FROM (
        |  SELECT unnest([flr, flr - 1800000]) AS ws
        |  FROM (SELECT (epoch_ms(ts) // 1800000) * 1800000 AS flr FROM events))
        |GROUP BY ws ORDER BY ws""".stripMargin,

    "q38_session_window" ->
      """WITH e AS (
        |  SELECT user_id, ts, value, epoch_us(ts) AS eu,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_eu
        |  FROM events),
        |flagged AS (
        |  SELECT *, CASE WHEN prev_eu IS NULL OR eu - prev_eu >= 600000000 THEN 1 ELSE 0 END AS new_s
        |  FROM e),
        |sess AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT user_id, epoch_ms(min(ts)) AS session_start_ms,
        |  count(*) AS n_events, sum(value::DECIMAL(18,2))::DOUBLE AS sum_value
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, session_start_ms""".stripMargin
  )
}
