package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Structured Streaming semantics for the Windows transforms (SURVEY.md
  * §2.6): watermarked tumbling windows in append mode, late-data
  * dropping, and session-window merging — driven through MemoryStream.
  */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double, props: String)

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def ev(id: Long, t: String, user: Long = 1, typ: String = "click",
                 v: Double = 1.0): Ev =
    Ev(id, ts(t), user, typ, v, """{"k": 1}""")

  private var sinkId = 0
  private def runStream(mem: MemoryStream[Ev], transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
                        mode: OutputMode, feeds: Seq[Seq[Ev]]): org.apache.spark.sql.DataFrame = {
    sinkId += 1
    val name = s"stream_sink_$sinkId"
    val query = transform(mem.toDS().toDF())
      .writeStream.format("memory").queryName(name).outputMode(mode).start()
    try feeds.foreach { batch => mem.addData(batch); query.processAllAvailable() }
    finally query.stop()
    spark.table(name)
  }

  test("tumbling append: window emits once the watermark passes its end") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = runStream(mem, df => Windows.tumblingStream(df, "1 hour", "30 minutes"),
      OutputMode.Append(), Seq(
        Seq(ev(1, "2024-01-01 00:10:00"), ev(2, "2024-01-01 00:20:00")),
        // watermark = max_ts - 30 min; this event pushes it past 01:00
        Seq(ev(3, "2024-01-01 01:40:00")),
        Seq(ev(4, "2024-01-01 03:00:00"))))
    val rows = out.select(col("window_start").cast("string"), col("event_type"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // the 00:00 window (2 events) finalized; the 01:00 window finalized
    // by batch 3's watermark push; 03:00 still open → not emitted
    assert(rows === Set(
      ("2024-01-01 00:00:00", "click", 2L),
      ("2024-01-01 01:00:00", "click", 1L)))
  }

  test("late data beyond the watermark is dropped") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = runStream(mem, df => Windows.tumblingStream(df, "1 hour", "10 minutes"),
      OutputMode.Append(), Seq(
        Seq(ev(1, "2024-01-01 00:30:00")),
        Seq(ev(2, "2024-01-01 02:00:00")),   // watermark → 01:50, closes 00:00 win
        Seq(ev(3, "2024-01-01 00:40:00")),   // late: before watermark → dropped
        Seq(ev(4, "2024-01-01 04:00:00")))) // closes the 02:00 window
    val rows = out.select(col("window_start").cast("string"), col("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // 00:00 window emitted with ONE event only; the late event never shows
    assert(rows === Set(("2024-01-01 00:00:00", 1L), ("2024-01-01 02:00:00", 1L)))
  }

  test("session windows merge events within the gap and split across it") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = runStream(mem, df => Windows.sessionStream(df, "10 minutes", "1 minute"),
      OutputMode.Append(), Seq(
        Seq(ev(1, "2024-01-01 00:00:00"), ev(2, "2024-01-01 00:05:00"),
          ev(3, "2024-01-01 00:30:00"),
          ev(10, "2024-01-01 00:02:00", user = 2)),
        Seq(ev(4, "2024-01-01 06:00:00")))) // pushes watermark, closes sessions
    val rows = out
      .select(col("user_id"), col("session_start").cast("string"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(rows === Set(
      (1L, "2024-01-01 00:00:00", 2L),  // events 1+2 merged (5 min gap)
      (1L, "2024-01-01 00:30:00", 1L),  // event 3: 25 min gap → new session
      (2L, "2024-01-01 00:02:00", 1L)))
  }

  test("batch and streaming tumbling agree on the same bounded input") {
    val events = Seq(
      ev(1, "2024-01-01 00:10:00"), ev(2, "2024-01-01 00:20:00", typ = "view"),
      ev(3, "2024-01-01 01:40:00"), ev(4, "2024-01-01 03:00:00")).toDF()
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Ev]
    val streamed = runStream(mem, df => Windows.tumblingStream(df, "1 hour", "0 seconds"),
      OutputMode.Append(), Seq(
        Seq(ev(1, "2024-01-01 00:10:00"), ev(2, "2024-01-01 00:20:00", typ = "view"),
          ev(3, "2024-01-01 01:40:00"), ev(4, "2024-01-01 03:00:00")),
        Seq(ev(5, "2024-01-02 00:00:00")))) // watermark push to flush all
      .filter(col("window_start") < ts("2024-01-01 12:00:00"))
    val batch = Windows.tumbling(events, "1 hour")
    assert(streamed.select("window_start", "event_type", "n", "sum_value").collect().toSet ===
      batch.select("window_start", "event_type", "n", "sum_value").collect().toSet)
  }

  test("HLL approx_count_distinct stays within its error bound") {
    val ev = graft.core.Tables.load(spark, sf001, "events")
    val approx = ev.agg(approx_count_distinct(col("user_id"), 0.02)).head().getLong(0)
    val exact = ev.agg(countDistinct(col("user_id"))).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }
}
