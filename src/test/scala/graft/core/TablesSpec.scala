package graft.core

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** `Tables.load` must normalize every events.ts parquet encoding the
  * driver has shipped — TIMESTAMP(NANOS) surfacing as a long (under
  * spark.sql.legacy.parquet.nanosAsLong), micros TIMESTAMP_NTZ, and
  * plain TimestampType — to the same engine contract: `ts` TimestampType
  * (UTC instant) + `ts_ns` long. The driver switched encodings mid-round
  * once; this is the regression guard. */
class TablesSpec extends SparkSpec {

  // 2024-03-01 12:34:56.789123 UTC
  private val us = 1709296496789123L

  private def load(writeAs: String): (Timestamp, Long) = {
    val dir = tempDir(s"tables_$writeAs")
    val df = writeAs match {
      case "long_nanos" =>
        spark.range(1).select(lit(1L).as("event_id"),
          lit(us * 1000L).as("ts"), lit("click").as("event_type"))
      case "ntz_micros" =>
        spark.range(1).select(lit(1L).as("event_id"),
          timestamp_micros(lit(us)).cast(TimestampNTZType).as("ts"),
          lit("click").as("event_type"))
      case "timestamp" =>
        spark.range(1).select(lit(1L).as("event_id"),
          timestamp_micros(lit(us)).as("ts"), lit("click").as("event_type"))
    }
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Tables.load(spark, dir, "events")
    assert(out.schema("ts").dataType === TimestampType, writeAs)
    assert(out.schema("ts_ns").dataType === LongType, writeAs)
    val r = out.select(col("ts"), col("ts_ns")).collect()(0)
    (r.getTimestamp(0), r.getLong(1))
  }

  test("all three events.ts encodings normalize to the same instant") {
    val results = Seq("long_nanos", "ntz_micros", "timestamp").map(load)
    // ns is exact integer arithmetic in every path
    assert(results.forall(_._2 == us * 1000L),
      s"ts_ns mismatch: ${results.map(_._2)}")
    // and the TimestampType instants agree across encodings
    assert(results.map(_._1.getTime).distinct.size === 1,
      s"ts mismatch: ${results.map(_._1)}")
    assert(results.head._1.getTime === us / 1000L)
  }
}
