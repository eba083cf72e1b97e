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
}
