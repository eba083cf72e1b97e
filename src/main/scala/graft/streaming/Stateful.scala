package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming operators (SURVEY.md §2.6: KeyValueGroupedDataset
  * custom state): exactly the pieces the built-in windows can't express —
  * cross-batch per-key accumulators and stream dedup.
  *
  * State scale posture: state lives in the state store keyed by user —
  * partitioned by the shuffle, checkpointed per batch, and (for dedup)
  * bounded by the watermark so it cannot grow without limit.
  */
object Stateful {

  /** Cross-batch per-user running aggregate: cumulative event count and
    * running sum of `value`, emitted once per user per micro-batch in
    * which the user appeared. flatMapGroupsWithState because neither the
    * emission cadence (on-change, not on-window-close) nor the
    * cumulative-forever semantics fit a windowed aggregation. */
  case class UserEvent(user_id: Long, ts: Timestamp, value: Double)
  case class UserTotals(user_id: Long, n_events: Long, sum_value: Double)

  def runningUserTotals(events: Dataset[UserEvent]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserTotals, UserTotals](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, batch: Iterator[UserEvent], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(user, 0L, 0.0))
          var n = prev.n_events
          var s = prev.sum_value
          batch.foreach { e => n += 1; s += e.value }
          if (n == prev.n_events) Iterator.empty
          else {
            val now = UserTotals(user, n, s)
            state.update(now)
            Iterator.single(now)
          }
      }
  }

  /** Stream dedup on event_id bounded by the watermark: duplicates
    * arriving within the watermark horizon are dropped, and the dedup
    * state for ids older than the watermark is reclaimed. */
  def dedupStream(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** The same running totals on the transformWithState API (Spark 4's
    * arbitrary-state operator, successor to flatMapGroupsWithState):
    * typed ValueState per key, explicit TimeMode/TTL surface, RocksDB
    * state store required. Kept semantically identical to
    * `runningUserTotals` — `StatefulSpec` asserts both implementations
    * emit the same totals on the same stream — so migrating a pipeline
    * between the two APIs is a mechanical swap. */
  class RunningTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, UserEvent, UserTotals] {
    @transient private var totals: org.apache.spark.sql.streaming.ValueState[UserTotals] = _

    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      totals = getHandle.getValueState[UserTotals]("totals",
        org.apache.spark.sql.Encoders.product[UserTotals],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[UserEvent],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[UserTotals] = {
      val prev = if (totals.exists()) totals.get() else UserTotals(user, 0L, 0.0)
      var n = prev.n_events
      var s = prev.sum_value
      rows.foreach { e => n += 1; s += e.value }
      if (n == prev.n_events) Iterator.empty
      else {
        val now = UserTotals(user, n, s)
        totals.update(now)
        Iterator.single(now)
      }
    }
  }

  def runningUserTotalsTws(events: Dataset[UserEvent]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }

  /** Closed session per user: emitted only when the event-time TIMER
    * fires (watermark passes last-event-time + gap) — the pattern the
    * built-in session_window can't express when the close-out must run
    * custom logic (final scoring, side outputs, state cleanup order). */
  case class SessionSummary(user_id: Long, n_events: Long, sum_value: Double,
                            session_end_ms: Long)

  /** Event-time sessionization with timer-driven close-out on
    * transformWithState: state accumulates per key; each batch re-arms
    * one timer at last-event-time + gap; when the watermark crosses it,
    * handleExpiredTimer emits the summary and clears state. State and
    * timers both live in the (RocksDB) state store, partitioned by key —
    * nothing driver-side. */
  class SessionTimerProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, UserEvent, SessionSummary] {
    @transient private var sess: org.apache.spark.sql.streaming.ValueState[SessionSummary] = _

    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      sess = getHandle.getValueState[SessionSummary]("session",
        org.apache.spark.sql.Encoders.product[SessionSummary],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[UserEvent],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[SessionSummary] = {
      val prev = if (sess.exists()) sess.get() else SessionSummary(user, 0L, 0.0, 0L)
      var n = prev.n_events
      var s = prev.sum_value
      var lastMs = prev.session_end_ms
      rows.foreach { e => n += 1; s += e.value; lastMs = math.max(lastMs, e.ts.getTime) }
      if (n != prev.n_events) {
        // re-arm: one live timer per key (delete the stale one first)
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        getHandle.registerTimer(lastMs + gapMs)
        sess.update(SessionSummary(user, n, s, lastMs))
      }
      Iterator.empty
    }

    override def handleExpiredTimer(user: Long,
        timerValues: org.apache.spark.sql.streaming.TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[SessionSummary] = {
      val out = if (sess.exists()) Iterator.single(sess.get()) else Iterator.empty
      sess.clear()
      out
    }
  }

  def sessionTotalsWithTimers(events: Dataset[UserEvent], watermark: String,
                              gapMs: Long): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(new SessionTimerProcessor(gapMs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(), OutputMode.Append())
  }
}
