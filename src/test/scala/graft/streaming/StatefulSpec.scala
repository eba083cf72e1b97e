package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import Stateful.UserEvent

/** Custom streaming state: cross-batch accumulators and watermarked
  * stream dedup. */
class StatefulSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("flatMapGroupsWithState: totals accumulate across micro-batches") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[UserEvent]
    val query = Stateful.runningUserTotals(mem.toDS())
      .writeStream.format("memory").queryName("running_totals")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(UserEvent(1, ts("2024-01-01 00:00:00"), 2.0),
        UserEvent(1, ts("2024-01-01 00:01:00"), 3.0),
        UserEvent(2, ts("2024-01-01 00:00:30"), 10.0))
      query.processAllAvailable()
      mem.addData(UserEvent(1, ts("2024-01-01 01:00:00"), 5.0))
      query.processAllAvailable()
    } finally query.stop()

    val rows = spark.table("running_totals")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // batch 1 emissions: user1 (2 events, 5.0), user2 (1, 10.0)
    // batch 2 emission: user1 cumulative (3 events, 10.0); user2 silent
    assert(rows === Set((1L, 2L, 5.0), (2L, 1L, 10.0), (1L, 3L, 10.0)))
  }

  test("transformWithState: same totals as flatMapGroupsWithState on the same stream") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // transformWithState requires the RocksDB state store provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[UserEvent]
      val query = Stateful.runningUserTotalsTws(mem.toDS())
        .writeStream.format("memory").queryName("running_totals_tws")
        .outputMode(OutputMode.Append()).start()
      try {
        mem.addData(UserEvent(1, ts("2024-01-01 00:00:00"), 2.0),
          UserEvent(1, ts("2024-01-01 00:01:00"), 3.0),
          UserEvent(2, ts("2024-01-01 00:00:30"), 10.0))
        query.processAllAvailable()
        mem.addData(UserEvent(1, ts("2024-01-01 01:00:00"), 5.0))
        query.processAllAvailable()
      } finally query.stop()

      val rows = spark.table("running_totals_tws")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // identical emissions to the flatMapGroupsWithState test above
      assert(rows === Set((1L, 2L, 5.0), (2L, 1L, 10.0), (1L, 3L, 10.0)))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("transformWithState timers: sessions close when the watermark passes the gap") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[UserEvent]
      // zero watermark delay: the watermark tracks max seen event time,
      // so timer firing is deterministic per batch
      val query = Stateful.sessionTotalsWithTimers(mem.toDS(),
        watermark = "0 seconds", gapMs = 10 * 60 * 1000)
        .writeStream.format("memory").queryName("session_timers")
        .outputMode(OutputMode.Append()).start()
      try {
        mem.addData(UserEvent(1, ts("2024-01-01 00:00:00"), 2.0),
          UserEvent(1, ts("2024-01-01 00:01:00"), 3.0))
        query.processAllAvailable()
        assert(spark.table("session_timers").isEmpty,
          "session must stay open while the watermark is behind the gap")

        // a later event from ANOTHER user pushes the watermark past
        // user 1's gap → user 1's timer fires, session emitted
        mem.addData(UserEvent(2, ts("2024-01-01 01:00:00"), 7.0))
        query.processAllAvailable()
        mem.addData(UserEvent(2, ts("2024-01-01 01:00:01"), 1.0))
        query.processAllAvailable()

        val rows = spark.table("session_timers")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        assert(rows === Set((1L, 2L, 5.0)),
          s"user 1's session should be the only closed one: ${rows.mkString(",")}")
      } finally query.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("dropDuplicatesWithinWatermark: in-horizon duplicates dropped") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[graft.streaming.Ev]
    val query = Stateful.dedupStream(mem.toDS().toDF(), "1 hour")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        Ev(1, ts("2024-01-01 00:00:00"), 1, "click", 1.0, "{}"),
        Ev(2, ts("2024-01-01 00:05:00"), 1, "click", 1.0, "{}"))
      query.processAllAvailable()
      mem.addData( // duplicate id 1 within horizon + a fresh id
        Ev(1, ts("2024-01-01 00:10:00"), 1, "click", 1.0, "{}"),
        Ev(3, ts("2024-01-01 00:20:00"), 1, "click", 1.0, "{}"))
      query.processAllAvailable()
    } finally query.stop()

    val ids = spark.table("dedup_stream").select("event_id")
      .as[Long].collect().sorted.toSeq
    assert(ids === Seq(1L, 2L, 3L))
  }
}
