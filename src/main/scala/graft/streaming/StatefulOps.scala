package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming operators (SURVEY.md §2.7 extension surface):
  * per-key state that survives across micro-batches AND across query
  * restarts (checkpointed) — the streaming analog of the reference's
  * `old_scrolls` cursor (test.py:558) generalized to arbitrary state.
  */
object StatefulOps {

  case class EventRow(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                      event_type: String, value: Double)
  case class UserState(nEvents: Long, nErrors: Long, lastEventId: Long)
  case class UserProgress(user_id: Long, n_events: Long, n_errors: Long,
                          last_event_id: Long)

  /** Running per-user counters via mapGroupsWithState — state store is
    * checkpointed, so a restarted query resumes counting where the
    * previous run stopped (verified in StatefulSpec).
    */
  def runningUserCounters(events: Dataset[EventRow]): Dataset[UserProgress] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0L, -1L))
          var n = prev.nEvents
          var errs = prev.nErrors
          var last = prev.lastEventId
          rows.foreach { r =>
            n += 1
            if (r.event_type == "error") errs += 1
            if (r.event_id > last) last = r.event_id
          }
          state.update(UserState(n, errs, last))
          UserProgress(userId, n, errs, last)
      }
  }

  case class DocRow(doc_id: Long, text: String)
  case class DedupedDoc(doc_id: Long, content_hash: String)

  /** Cross-batch streaming exact dedup: the streaming form of q47. Keyed
    * by content sha2, the FIRST occurrence (smallest doc_id within its
    * arrival batch) is emitted; every later copy — same batch or any
    * subsequent micro-batch, across query restarts — is dropped, because
    * the hash's state survives in the checkpointed state store.
    *
    * State per distinct document is one long — bounded by the distinct
    * corpus size, not the stream length. At 100 TB scale run this on the
    * RocksDB state store provider (state larger than executor heap) and
    * shard by hash prefix if a single state store grows hot; the
    * operator itself shuffles once on the hash, exactly like the batch
    * sha2 groupBy.
    */
  def streamingDedup(docs: Dataset[DocRow]): Dataset[DedupedDoc] = {
    import docs.sparkSession.implicits._
    docs
      .select(col("doc_id"), sha2(col("text"), 256).as("h")).as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, DedupedDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (h: String, rows: Iterator[(Long, String)], state: GroupState[Long]) =>
          if (state.exists) Iterator.empty
          else {
            val first = rows.map(_._1).min
            state.update(first)
            Iterator.single(DedupedDoc(first, h))
          }
      }
  }

  case class SessionAgg(start: Long, end: Long, n: Long, sum: Double)
  case class SessionOut(user_id: Long, session_start_ms: Long,
                        session_end_ms: Long, n_events: Long, sum_value: Double)

  /** Custom sessionizer via flatMapGroupsWithState with event-time
    * timeout: sessions close when the WATERMARK passes last-event + gap
    * (not wall clock), and only closed sessions are emitted — the
    * hand-rolled equivalent of `session_window` for cases needing custom
    * per-session state or emission logic (SURVEY.md §2.7 extension).
    */
  def sessionize(events: Dataset[EventRow], gapMs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAgg, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[SessionAgg]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, s.start, s.end, s.n, s.sum))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { r =>
              val t = r.ts.getTime
              cur match {
                case Some(s) if t - s.end < gapMs =>
                  cur = Some(SessionAgg(s.start, math.max(s.end, t), s.n + 1,
                                        s.sum + r.value))
                case Some(s) =>
                  closed ::= SessionOut(userId, s.start, s.end, s.n, s.sum)
                  cur = Some(SessionAgg(t, t, 1, r.value))
                case None =>
                  cur = Some(SessionAgg(t, t, 1, r.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** The reference's error budget (max_errors=3, test.py:129-144) as a
    * batch Observation: count error rows while the main pipeline runs —
    * one pass, no second scan — then let the caller abort if over budget.
    */
  def observedErrorCount(df: DataFrame, isError: org.apache.spark.sql.Column):
      (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation()
    val out = df.observe(obs, sum(when(isError, 1L).otherwise(0L)).as("n_errors"),
                              count(lit(1)).as("n_rows"))
    (out, obs)
  }

  /** Streaming error budget (T5): attach `df.observe("quality", ...)` to
    * the stream, register this listener, and it accumulates the observed
    * error count across micro-batches, stopping the query once the
    * budget is blown — the reference's crawler-abort loop as a
    * StreamingQueryListener.
    */
  class ErrorBudgetListener(spark: SparkSession, maxErrors: Long,
                            metricName: String = "quality")
      extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    @volatile var totalErrors: Long = 0L
    @volatile var budgetExceeded: Boolean = false

    override def onQueryStarted(e: QueryStartedEvent): Unit = {}
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = {}
    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      val m = e.progress.observedMetrics
      if (m.containsKey(metricName)) {
        totalErrors += m.get(metricName).getAs[Long]("n_errors")
        if (totalErrors > maxErrors && !budgetExceeded) {
          budgetExceeded = true
          Option(spark.streams.get(e.progress.id)).foreach(_.stop())
        }
      }
    }
  }

  /** Attach the observable error metric to a (streaming) DataFrame. */
  def withErrorMetric(df: DataFrame, isError: org.apache.spark.sql.Column,
                      metricName: String = "quality"): DataFrame =
    df.observe(metricName,
      sum(when(isError, 1L).otherwise(0L)).as("n_errors"),
      count(lit(1)).as("n_rows"))
}
