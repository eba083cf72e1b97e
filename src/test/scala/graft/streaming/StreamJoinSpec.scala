package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Stream-stream join with watermarks and a time-bound condition
  * (SURVEY.md §2.6 streaming surface): click events join their
  * originating view within 10 minutes; state on both sides is bounded by
  * the watermarks + time constraint. */
case class View(view_id: Long, user: Long, v_ts: Timestamp)
case class Click(click_id: Long, view_fk: Long, c_ts: Timestamp)

class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("stream-stream interval join matches only in-window pairs") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val views = MemoryStream[View]
    val clicks = MemoryStream[Click]

    val joined = views.toDS().withWatermark("v_ts", "30 minutes")
      .join(
        clicks.toDS().withWatermark("c_ts", "30 minutes"),
        expr("""view_id = view_fk AND
                c_ts >= v_ts AND c_ts <= v_ts + INTERVAL 10 MINUTES""".stripMargin))

    val query = joined.writeStream.format("memory")
      .queryName("stream_join").outputMode("append").start()
    try {
      views.addData(
        View(1, 100, ts("2024-01-01 00:00:00")),
        View(2, 200, ts("2024-01-01 00:05:00")))
      clicks.addData(
        Click(10, 1, ts("2024-01-01 00:04:00")),  // in window (4 min after)
        Click(11, 2, ts("2024-01-01 00:30:00")),  // late: 25 min after view 2
        Click(12, 9, ts("2024-01-01 00:06:00")))  // no matching view
      query.processAllAvailable()
    } finally query.stop()

    val got = spark.table("stream_join")
      .select("click_id", "view_id", "user").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((10L, 1L, 100L)))
  }
}
