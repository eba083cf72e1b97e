package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}

/** Temporal / SCD2 query operators (SURVEY.md §2.5 Q1-Q3, Q6 + the as-of
  * join of §2.6) as reusable library functions, exercised over the
  * synthetic tables so the DuckDB oracle can check them.
  *
  * The same helpers back the SDS reporting store views
  * (graft.sds.Scd2Store.live/asOf use the block-interval specialization).
  *
  * Scale posture: everything here is one shuffle on the entity key
  * (window functions); the as-of join is the union-merge pattern — tag
  * both sides, one sort per key, carry the last build row forward — which
  * scales linearly instead of the naive key-range join's quadratic blowup.
  */
object Temporal {
  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private val Sentinel = "9999-12-31 00:00:00"

  /** Q1/Q2 precursor: turn an event-versioned table into SCD2 intervals:
    * `valid_from` = version time, `valid_to` = next version's time for
    * the same entity (sentinel for the live version). */
  def intervalize(df: DataFrame, entityKey: Seq[String], time: String,
                  tieBreak: Seq[String]): DataFrame = {
    val w = Window.partitionBy(entityKey.map(col): _*)
      .orderBy((time +: tieBreak).map(col): _*)
    df.withColumn("valid_from", col(time))
      .withColumn("valid_to",
        coalesce(lead(col(time), 1).over(w), lit(Sentinel).cast("timestamp")))
  }

  /** Q2: point-in-time snapshot over intervalized data. */
  def asOf(intervals: DataFrame, at: Column): DataFrame =
    intervals.filter(col("valid_from") <= at && col("valid_to") > at)

  /** As-of join (§2.6): for each probe row, the latest build row of the
    * same key with buildTime <= probeTime. Implemented as union + one
    * window pass (no fat range join): build rows sort before probe rows
    * at equal times, ties among build rows broken by `buildTie` ascending
    * so the largest wins, and `last(ignoreNulls)` carries the winning
    * build payload onto each probe row.
    */
  def asOfJoin(probe: DataFrame, probeKey: String, probeTime: String,
               build: DataFrame, buildKey: String, buildTime: String,
               buildTie: String, payload: Seq[String]): DataFrame = {
    val buildTypes = build.schema.fields.map(f => f.name -> f.dataType).toMap
    val probeSide = payload.foldLeft(
      probe.withColumn("_k", col(probeKey))
        .withColumn("_t", col(probeTime))
        .withColumn("_tie", lit(null).cast(buildTypes(buildTie)))
        .withColumn("_side", lit(1))) {
      (df, c) => df.withColumn(s"_b_$c", lit(null).cast(buildTypes(c)))
    }
    val buildSide = probe.schema.fields.foldLeft(
      build.select(
        Seq(col(buildKey).as("_k"), col(buildTime).as("_t"),
          col(buildTie).as("_tie"), lit(0).as("_side")) ++
          payload.map(c => col(c).as(s"_b_$c")): _*)) {
      (df, f) => df.withColumn(f.name, lit(null).cast(f.dataType))
    }
    val unioned = probeSide.unionByName(buildSide.select(probeSide.columns.map(col): _*))
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_side"), col("_tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"_asof_$c", last(col(s"_b_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 1)
      .select(probe.columns.map(col) ++ payload.map(c => col(s"_asof_$c").as(c)): _*)
  }

  /** Orders as an SCD2 source: each order is a new "version" of its
    * customer's state, intervalized by order date. */
  private def orderIntervals(s: SparkSession, dir: String): DataFrame =
    intervalize(
      t(s, dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice", "o_orderdate"),
      entityKey = Seq("o_custkey"), time = "o_orderdate", tieBreak = Seq("o_orderkey"))

  private val orderIntervalsSql =
    """SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate AS valid_from,
      |  coalesce(lead(o_orderdate) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey), TIMESTAMP '9999-12-31 00:00:00') AS valid_to
      |FROM orders""".stripMargin

  val defs: Seq[Q] = Seq(
    // ---- q18: SCD2 interval build (Q1 live-row convention) -------------
    // Timestamp OUTPUT columns hash differently across engines even when
    // every value matches (parquet TIMESTAMP_MS unit vs µs, and Spark's
    // isAdjustedToUTC instants read back as TIMESTAMPTZ by some readers).
    // Emit epoch-microsecond BIGINTs on both sides instead — integer
    // hashing is representation-free. Spark unix_micros == DuckDB
    // epoch_us on the same instant.
    Q("q18_scd2_intervals",
      s"""SELECT o_custkey, o_orderkey, o_totalprice,
        |  epoch_us(CAST(valid_from AS TIMESTAMP)) AS valid_from_us,
        |  epoch_us(CAST(valid_to AS TIMESTAMP)) AS valid_to_us,
        |  (valid_to = TIMESTAMP '9999-12-31 00:00:00') AS is_live
        |FROM ($orderIntervalsSql)
        |ORDER BY o_custkey, valid_from_us, o_orderkey""".stripMargin) { (s, dir) =>
      orderIntervals(s, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          // parquet NTZ → instant under the UTC session zone, then µs
          unix_micros(col("valid_from").cast("timestamp")).as("valid_from_us"),
          unix_micros(col("valid_to").cast("timestamp")).as("valid_to_us"),
          (col("valid_to") === lit(Sentinel).cast("timestamp")).as("is_live"))
        .orderBy("o_custkey", "valid_from_us", "o_orderkey")
    },

    // ---- q19: point-in-time snapshot (Q2) ------------------------------
    Q("q19_scd2_asof",
      s"""SELECT o_custkey, o_orderkey, o_totalprice
        |FROM ($orderIntervalsSql)
        |WHERE valid_from <= TIMESTAMP '1998-06-30 00:00:00'
        |  AND valid_to > TIMESTAMP '1998-06-30 00:00:00'
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      asOf(orderIntervals(s, dir), lit("1998-06-30 00:00:00").cast("timestamp"))
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "o_orderkey")
    },

    // ---- q20: entity version history (Q3) ------------------------------
    Q("q20_scd2_history",
      """SELECT o_custkey, o_orderkey,
        |  row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS version_no,
        |  count(*) OVER (PARTITION BY o_custkey) AS n_versions
        |FROM orders
        |ORDER BY o_custkey, version_no""".stripMargin) { (s, dir) =>
      val byTime = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val all = Window.partitionBy(col("o_custkey"))
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          row_number().over(byTime).cast("long").as("version_no"),
          count(lit(1)).over(all).as("n_versions"))
        .orderBy("o_custkey", "version_no")
    },

    // ---- q21: as-of join (events ← latest order at event time) ---------
    // Spark side: scalable union+window merge; oracle: the obviously
    // correct join + row_number formulation — same semantics, different
    // physical strategy.
    Q("q21_asof_join",
      """SELECT event_id, user_id, o_orderkey, o_totalprice FROM (
        |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e LEFT JOIN orders o
        |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
        |WHERE rn = 1
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      asOfJoin(
        probe = t(s, dir, "events").select("event_id", "user_id", "ts"),
        probeKey = "user_id", probeTime = "ts",
        build = t(s, dir, "orders"), buildKey = "o_custkey",
        buildTime = "o_orderdate", buildTie = "o_orderkey",
        payload = Seq("o_orderkey", "o_totalprice"))
        .select("event_id", "user_id", "o_orderkey", "o_totalprice")
        .orderBy("event_id")
    },

    // ---- q22: validity-window predicate (Q6) ---------------------------
    Q("q22_validity_window",
      """SELECT o_orderpriority, count(*) AS n_active,
        |  round(sum(o_totalprice), 2) AS active_value
        |FROM orders
        |WHERE o_orderdate <= TIMESTAMP '1998-06-30 00:00:00'
        |  AND o_orderdate + INTERVAL 30 DAY > TIMESTAMP '1998-06-30 00:00:00'
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val at = lit("1998-06-30 00:00:00").cast("timestamp")
      t(s, dir, "orders")
        .filter(col("o_orderdate") <= at &&
          col("o_orderdate") + expr("INTERVAL 30 DAYS") > at)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_active"),
          round(sum(col("o_totalprice")), 2).as("active_value"))
        .orderBy("o_orderpriority")
    }
  )
}
