package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time window transforms over the `events` shape
  * (event_id, ts, user_id, event_type, value, props-JSON).
  *
  * Every transform here is written against an *unbounded* DataFrame: the
  * same code runs as a batch query (the oracle-checked `Events` defs) and
  * as a Structured Streaming stage (`StreamingSpec` drives them through
  * MemoryStream with watermarks). That one-definition-two-runtimes
  * property is the Spark-first answer to the reference's hand-rolled
  * stream loop (SURVEY.md §2.6 streaming mandate).
  */
object Windows {

  /** JSON payload extraction (`props` → numeric `k`). */
  def withK(df: DataFrame): DataFrame =
    df.withColumn("k", get_json_object(col("props"), "$.k").cast("long"))

  /** Tumbling event-time windows: (window_start, event_type) aggregates. */
  def tumbling(df: DataFrame, width: String = "1 hour"): DataFrame =
    df.groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding event-time windows (width / slide). */
  def sliding(df: DataFrame, width: String = "1 hour",
              slide: String = "30 minutes"): DataFrame =
    df.groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))

  /** Batch sessionization: gap-based sessions via lag + running sum —
    * the classic two-window formulation (one shuffle on user_id). A new
    * session starts when the gap to the previous event is >= `gapSec`
    * (mirrors session_window's exclusive window end). */
  def sessionizeBatch(df: DataFrame, gapSec: Long = 600): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df
      .withColumn("_prev", lag(col("ts"), 1).over(byUser))
      .withColumn("_new_session",
        (col("_prev").isNull ||
          (unix_micros(col("ts")) - unix_micros(col("_prev"))) >= gapSec * 1000000L)
          .cast("long"))
      .withColumn("session_id", sum(col("_new_session")).over(running))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
  }

  /** Streaming sessionization via the built-in session_window (merging
    * gap-based windows with state cleanup driven by the watermark). */
  def sessionized(df: DataFrame, gap: String = "10 minutes"): DataFrame =
    df.groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("user_id"), col("n_events"))

  /** Streaming stage: watermarked tumbling counts (append mode emits a
    * window once the watermark passes its end — late data beyond the
    * watermark is dropped). */
  def tumblingStream(df: DataFrame, width: String = "1 hour",
                     watermark: String = "30 minutes"): DataFrame =
    tumbling(df.withWatermark("ts", watermark), width)

  /** Streaming stage: watermarked session windows. */
  def sessionStream(df: DataFrame, gap: String = "10 minutes",
                    watermark: String = "30 minutes"): DataFrame =
    sessionized(df.withWatermark("ts", watermark), gap)
}
