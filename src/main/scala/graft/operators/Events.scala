package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}
import graft.streaming.Windows

/** Event-stream analytics over the `events` table (SURVEY.md §2.6):
  * JSON extraction, tumbling/sliding event-time windows, sessionization,
  * funnel, cube, and HLL approximate distinct. The window/session
  * transforms are the SAME functions Structured Streaming runs
  * (graft.streaming.Windows) — applied here to the bounded table so the
  * DuckDB oracle can check their event-time semantics.
  */
object Events {
  /** q78's as-of chain over an arbitrary events frame (event_id,
    * user_id, event_type, ts_ns) — extracted so the skew harness
    * (`ScaleBench`) measures the EXACT shipped plan under a hot user,
    * not a hand copy. One shuffle (the per-user window partitioning);
    * see the q78 doc below for the union-window design. */
  private[graft] def asofJoinOf(e: DataFrame): DataFrame = {
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), expr("ts_ns DIV 1000").as("tus"), lit(0).as("tag"),
        col("event_id").as("view_id"), lit(null).cast("long").as("purchase_id"))
    val buys = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("ts_ns DIV 1000").as("tus"), lit(1).as("tag"),
        lit(null).cast("long").as("view_id"), col("event_id").as("purchase_id"))
    val w = W.partitionBy("user_id").orderBy("tus", "tag")
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    views.unionByName(buys)
      .withColumn("asof_view_id", last(col("view_id"), ignoreNulls = true).over(w))
      .withColumn("asof_view_tus",
        last(when(col("tag") === 0, col("tus")), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("purchase_id").as("event_id"), col("user_id"),
        col("asof_view_id").as("view_id"),
        expr("(tus - asof_view_tus) DIV 1000").as("gap_ms"))
      .orderBy("event_id")
  }

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  val defs: Seq[Q] = Seq(
    // ---- q35: JSON payload extraction ------------------------------------
    Q("q35_json_extract",
      """SELECT event_type,
        |  count(*) AS n,
        |  CAST(min(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS min_k,
        |  CAST(max(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS max_k,
        |  round(avg(CAST(props->>'k' AS BIGINT)), 4) AS avg_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      Windows.withK(ev(s, dir))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"),
          max(col("k")).as("max_k"), round(avg(col("k")), 4).as("avg_k"))
        .orderBy("event_type")
    },

    // ---- q36: tumbling window -------------------------------------------
    Q("q36_tumbling_window",
      """SELECT make_timestamp((epoch_us(ts)//3600000000)*3600000000) AS window_start,
        |  event_type, count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events
        |GROUP BY window_start, event_type
        |ORDER BY window_start, event_type""".stripMargin) { (s, dir) =>
      Windows.tumbling(ev(s, dir), "1 hour")
        .orderBy("window_start", "event_type")
    },

    // ---- q37: sliding window (1 h window / 30 min slide) -----------------
    // Oracle: each event lands in the two 30-min-grid windows that cover
    // it — exactly Spark's window(ts, w, s) expansion.
    Q("q37_sliding_window",
      """SELECT window_start, event_type, count(*) AS n FROM (
        |  SELECT make_timestamp((epoch_us(ts)//1800000000)*1800000000
        |           - o * 1800000000) AS window_start, event_type
        |  FROM events, unnest([0, 1]) AS t(o))
        |GROUP BY window_start, event_type
        |ORDER BY window_start, event_type""".stripMargin) { (s, dir) =>
      Windows.sliding(ev(s, dir), "1 hour", "30 minutes")
        .orderBy("window_start", "event_type")
    },

    // ---- q38: sessionization (10-minute inactivity gap) ------------------
    Q("q38_sessionize",
      """WITH g AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 600000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT *, sum(new_session) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM g)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  CAST(min(ts) AS TIMESTAMP) AS session_start,
        |  CAST(max(ts) AS TIMESTAMP) AS session_end, count(*) AS n_events,
        |  round(sum(value), 4) AS sum_value
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin) { (s, dir) =>
      Windows.sessionizeBatch(ev(s, dir), gapSec = 600)
        .orderBy("user_id", "session_id")
    },

    // ---- q39: conversion funnel (signup → purchase) ----------------------
    Q("q39_event_funnel",
      """WITH u AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase,
        |    count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases
        |  FROM events GROUP BY user_id)
        |SELECT count(*) AS n_users,
        |  count(first_signup) AS n_signed_up,
        |  CAST(sum(CASE WHEN first_purchase > first_signup THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_converted,
        |  CAST(sum(n_purchases) AS BIGINT) AS total_purchases
        |FROM u""".stripMargin) { (s, dir) =>
      ev(s, dir)
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "signup", col("ts"))).as("first_signup"),
          min(when(col("event_type") === "purchase", col("ts"))).as("first_purchase"),
          count(when(col("event_type") === "purchase", lit(1))).as("n_purchases"))
        .agg(count(lit(1)).as("n_users"),
          count(col("first_signup")).as("n_signed_up"),
          sum(when(col("first_purchase") > col("first_signup"), 1).otherwise(0))
            .cast("long").as("n_converted"),
          sum(col("n_purchases")).cast("long").as("total_purchases"))
    },

    // ---- q40: cube over (event_type, day) with ALL labels ----------------
    Q("q40_cube_daily",
      """SELECT coalesce(event_type, 'ALL') AS etype,
        |  coalesce(strftime(date_trunc('day', ts), '%Y-%m-%d'), 'ALL') AS day,
        |  count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events
        |GROUP BY CUBE(event_type, date_trunc('day', ts))
        |ORDER BY etype, day""".stripMargin) { (s, dir) =>
      ev(s, dir)
        .cube(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("_day"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
        .select(coalesce(col("event_type"), lit("ALL")).as("etype"),
          coalesce(col("_day"), lit("ALL")).as("day"),
          col("n"), col("sum_value"))
        .orderBy("etype", "day")
    },

    // ---- q41: HLL approximate distinct -----------------------------------
    // A sketch can't hash-match another engine's sketch, but the contract
    // can: emit the exact distinct (oracle-checkable) plus a boolean that
    // the HLL estimate lands within 10% of exact; DuckDB's side asserts
    // the literal `true`. 10% = 5 sigma of the configured rsd=0.02 — wide
    // enough that no dataset/scale the driver picks can trip it through
    // ordinary sketch error (a trip would mean the sketch is broken),
    // tight enough to catch real regressions. ScalaTest bounds the error
    // at the sharper 5% on the fixture data.
    Q("q41_approx_distinct",
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        |  count(*) AS n, true AS hll_ok
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      ev(s, dir)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_users"),
          count(lit(1)).as("n"),
          (abs(approx_count_distinct(col("user_id"), 0.02) -
            countDistinct(col("user_id"))) <=
            countDistinct(col("user_id")) * lit(0.10)).as("hll_ok"))
        .orderBy("event_type")
    },

    // ---- q43: time-range self join (bucketed band join) -----------------
    // Pairs of events from the same user within 60 s. The oracle states
    // the plain non-equi join; the Spark side buckets time into
    // 60 s grains and joins on (user, bucket) with the follower probing
    // its own and the next bucket — the shuffle carries bucket groups,
    // not the per-user cross product (the classic scalable range join).
    Q("q43_range_join",
      """SELECT a.user_id, a.event_id AS e1, b.event_id AS e2,
        |  epoch_us(b.ts) - epoch_us(a.ts) AS dt_us
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        |  AND epoch_us(b.ts) > epoch_us(a.ts)
        |  AND epoch_us(b.ts) - epoch_us(a.ts) <= 60000000
        |ORDER BY a.user_id, e1, e2""".stripMargin) { (s, dir) =>
      val e = ev(s, dir).select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"))
        .withColumn("bucket", expr("us DIV 60000000"))
      // leader probes its own bucket and the next one
      val probe = e.select(col("user_id"), col("event_id").as("e1"),
        col("us").as("us1"),
        explode(array(col("bucket"), col("bucket") + 1)).as("bucket"))
      val build = e.select(col("user_id"), col("event_id").as("e2"),
        col("us").as("us2"), col("bucket"))
      probe.join(build, Seq("user_id", "bucket"))
        .filter(col("us2") > col("us1") && col("us2") - col("us1") <= 60000000L)
        .select(col("user_id"), col("e1"), col("e2"),
          (col("us2") - col("us1")).as("dt_us"))
        .orderBy("user_id", "e1", "e2")
    },

    // ---- q65: event-type transition matrix (behavioral bigrams) ---------
    // Per-user ordered event streams → successor pairs via one lead()
    // window → global (from, to) counts with per-source transition
    // probability: the Markov-chain view behind funnel diagnostics and
    // session simulators. Two shuffles total — the per-user window
    // (partitioned by user_id, so it scales with the user count) and the
    // tiny (|types|²-bounded) transition aggregation.
    Q("q65_event_transitions",
      """WITH o AS (
        |  SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |t AS (SELECT event_type AS from_type, to_type, count(*) AS n
        |      FROM o WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  round(n / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE), 6) AS p
        |FROM t ORDER BY from_type, to_type""".stripMargin) { (s, dir) =>
      val w = W.partitionBy("user_id").orderBy("ts", "event_id")
      ev(s, dir)
        .select(col("event_type").as("from_type"),
          lead("event_type", 1).over(w).as("to_type"))
        .filter(col("to_type").isNotNull)
        .groupBy("from_type", "to_type")
        .agg(count(lit(1)).as("n"))
        .withColumn("p", round(
          col("n") / sum("n").over(W.partitionBy("from_type")).cast("double"), 6))
        .orderBy("from_type", "to_type")
    },

    // ---- q78: as-of join (temporal attribution) -------------------------
    // The operator Spark lacks natively: for every purchase, the most
    // recent view by the same user at or before it (plus the exact gap).
    // Implemented with the scalable union-window pattern instead of an
    // inequality join: tag both sides, ONE shuffle on user_id, and a
    // running last(ignoreNulls) carries the latest view forward — cost
    // O(events log events-per-user), never views×purchases. At 100 TB
    // the same plan holds: the only exchange is the per-user window
    // partitioning, and AQE handles user skew. Gap arithmetic uses the
    // exact ns longs (DIV, engine-identical) — never doubles.
    Q("q78_asof_join",
      """WITH u AS (
        |  SELECT user_id, epoch_us(ts) AS tus, 0 AS tag,
        |         event_id AS view_id, NULL::BIGINT AS purchase_id
        |  FROM events WHERE event_type = 'view'
        |  UNION ALL
        |  SELECT user_id, epoch_us(ts) AS tus, 1 AS tag,
        |         NULL::BIGINT AS view_id, event_id
        |  FROM events WHERE event_type = 'purchase'),
        |w AS (
        |  SELECT *,
        |    last_value(view_id IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY tus, tag
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_view_id,
        |    last_value(CASE WHEN tag = 0 THEN tus END IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY tus, tag
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_view_tus
        |  FROM u)
        |SELECT purchase_id AS event_id, user_id,
        |  asof_view_id AS view_id,
        |  CAST((tus - asof_view_tus) // 1000 AS BIGINT) AS gap_ms
        |FROM w WHERE tag = 1
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      // µs precision on BOTH sides: DuckDB's parquet reader floors the
      // ns timestamps to µs, so the Spark side floors ts_ns identically
      // (q38's epoch_us convention) — gap arithmetic stays exact-integer.
      // View sorts before a same-instant purchase (tag 0 < 1), so an
      // exactly-simultaneous view is attributable — and the fixture has
      // no (user, ts) ties anyway.
      asofJoinOf(ev(s, dir))
    },

    // ---- q225: FORWARD as-of join with tolerance -------------------------
    // The other half of the merge_asof surface (q78/q21 are backward):
    // for every click, the NEXT purchase of the same user at-or-after
    // it, kept only within a 1-hour tolerance — "did this interaction
    // convert, and how fast". Same union+partitioned-window shape as
    // q78, scanned in DESCENDING event time so `last(..ignoreNulls)`
    // carries the nearest FUTURE purchase; the tolerance is one exact
    // integer filter applied after the match (misses stay as NULL rows
    // — the unconverted clicks are part of the answer). No range join,
    // no per-row subquery: one shuffle by user, one window.
    Q("q225_asof_forward_tolerance",
      """WITH u AS (
        |  SELECT user_id, epoch_us(ts) AS tus, 1 AS tag,
        |         event_id AS click_id, NULL::BIGINT AS purchase_id
        |  FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id, epoch_us(ts) AS tus, 0 AS tag,
        |         NULL::BIGINT AS click_id, event_id
        |  FROM events WHERE event_type = 'purchase'),
        |w AS (
        |  SELECT *,
        |    last_value(purchase_id IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY tus DESC, tag
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS next_pid,
        |    last_value(CASE WHEN tag = 0 THEN tus END IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY tus DESC, tag
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS next_ptus
        |  FROM u),
        |m AS (SELECT click_id AS event_id, user_id,
        |    CASE WHEN next_ptus - tus <= 3600000000 THEN next_pid END
        |      AS purchase_id,
        |    CASE WHEN next_ptus - tus <= 3600000000
        |         THEN (next_ptus - tus) // 1000 END AS gap_ms
        |  FROM w WHERE tag = 1)
        |SELECT event_id, user_id, CAST(purchase_id AS BIGINT) AS purchase_id,
        |  CAST(gap_ms AS BIGINT) AS gap_ms
        |FROM m ORDER BY event_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.{Window => W}
      val e = ev(s, dir)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), expr("ts_ns DIV 1000").as("tus"),
          lit(1).as("tag"), col("event_id").as("click_id"),
          lit(null).cast("long").as("purchase_id"))
      val buys = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), expr("ts_ns DIV 1000").as("tus"),
          lit(0).as("tag"), lit(null).cast("long").as("click_id"),
          col("event_id").as("purchase_id"))
      // purchase (tag 0) sorts before a same-instant click in the
      // descending scan, so at-or-after is INCLUSIVE of ties — the same
      // deterministic tie rule as q78, mirrored in the oracle
      val w = W.partitionBy("user_id").orderBy(col("tus").desc, col("tag"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
      val tol = 3600000000L // 1 hour in µs
      clicks.unionByName(buys)
        .withColumn("next_pid",
          last(col("purchase_id"), ignoreNulls = true).over(w))
        .withColumn("next_ptus",
          last(when(col("tag") === 0, col("tus")), ignoreNulls = true).over(w))
        .filter(col("tag") === 1)
        .select(col("click_id").as("event_id"), col("user_id"),
          when(col("next_ptus") - col("tus") <= tol, col("next_pid"))
            .as("purchase_id"),
          when(col("next_ptus") - col("tus") <= tol,
            expr("(next_ptus - tus) DIV 1000")).as("gap_ms"))
        .orderBy("event_id")
    },

    // ---- q135: retention cohort analysis --------------------------------
    // The product-analytics staple: users cohorted by FIRST-event date,
    // retention = distinct users active at each day offset, as a
    // cohort × offset matrix with rates against the cohort size. Shapes:
    // one min-agg for the cohort assignment, one equi-join back, one
    // distinct-count agg — all partial-combinable, date arithmetic in
    // exact integers, rates rounded identically on both engines.
    Q("q135_retention_cohorts",
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
        |f AS (SELECT user_id, min(d) AS cohort FROM e GROUP BY 1),
        |cs AS (SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_n
        |       FROM f GROUP BY 1),
        |j AS (SELECT e.user_id, f.cohort,
        |    date_diff('day', f.cohort, e.d) AS off
        |  FROM e JOIN f USING (user_id) WHERE date_diff('day', f.cohort, e.d) <= 7),
        |r AS (SELECT cohort, off, CAST(count(DISTINCT user_id) AS BIGINT)
        |        AS n_users FROM j GROUP BY 1, 2)
        |SELECT r.cohort, CAST(r.off AS INT) AS offset_days, r.n_users,
        |  round(CAST(r.n_users AS DOUBLE) / cs.cohort_n, 4) AS retention
        |FROM r JOIN cs USING (cohort)
        |ORDER BY cohort, offset_days""".stripMargin) { (s, dir) =>
      val e = ev(s, dir).select(col("user_id"), to_date(col("ts")).as("d"))
      val f = e.groupBy("user_id").agg(min(col("d")).as("cohort"))
      val cs = f.groupBy("cohort").agg(count(lit(1)).as("cohort_n"))
      e.join(f, "user_id")
        .withColumn("off", datediff(col("d"), col("cohort")))
        .filter(col("off") <= 7)
        .groupBy("cohort", "off")
        .agg(countDistinct(col("user_id")).as("n_users"))
        .join(cs, "cohort")
        .select(col("cohort"), col("off").cast("int").as("offset_days"),
          col("n_users"),
          round(col("n_users").cast("double") / col("cohort_n"), 4)
            .as("retention"))
        .orderBy("cohort", "offset_days")
    },

    // ---- q141: per-user z-score anomaly detection -----------------------
    // The monitoring staple: flag events whose value sits > 3 population
    // standard deviations from the USER's own mean. Two passes, both
    // partial-combinable: per-user (n, mean, M2 via sum/sumsq) then an
    // equi-join back — no window, no sort. Variance is computed as
    // (sumsq - sum²/n)/n on BOTH engines (same expression, same
    // float order), z rounded to 4 so the flag boundary is stable;
    // users with fewer than 10 events or zero variance are skipped.
    Q("q141_zscore_anomalies",
      """WITH st AS (SELECT user_id, count(*) AS n, sum(value) AS s,
        |    sum(value * value) AS sq FROM events GROUP BY 1),
        |g AS (SELECT user_id, n, s / n AS mu,
        |    sqrt((sq - s * s / n) / n) AS sigma FROM st WHERE n >= 10),
        |z AS (SELECT e.event_id, e.user_id, e.value,
        |    round((e.value - g.mu) / g.sigma, 4) AS z
        |  FROM events e JOIN g USING (user_id) WHERE g.sigma > 0)
        |SELECT event_id, user_id, round(value, 4) AS value, z
        |FROM z WHERE abs(z) > 3
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val st = ev(s, dir).groupBy("user_id")
        .agg(count(lit(1)).as("n"), sum(col("value")).as("s"),
          sum(col("value") * col("value")).as("sq"))
        .filter(col("n") >= 10)
        .select(col("user_id"), (col("s") / col("n")).as("mu"),
          sqrt((col("sq") - col("s") * col("s") / col("n")) / col("n"))
            .as("sigma"))
        .filter(col("sigma") > 0)
      ev(s, dir).select(col("event_id"), col("user_id"), col("value"))
        .join(st, "user_id")
        .withColumn("z", round((col("value") - col("mu")) / col("sigma"), 4))
        .filter(abs(col("z")) > 3)
        .select(col("event_id"), col("user_id"),
          round(col("value"), 4).as("value"), col("z"))
        .orderBy("event_id")
    },

    // ---- q205: strictly-ordered event funnel ----------------------------
    // The funnel analytics q163's as-of attribution does NOT express:
    // each step must happen strictly AFTER the previous step's first
    // completion (signup → first view after signup → first click after
    // that view → first purchase after that click), so step k is
    // min(ts of type_k WHERE ts > step_{k-1}) — a chain of per-user
    // grouped minima with an equi-join on user between stages, never a
    // per-user sequential scan: each stage is partial-aggregable and
    // the whole funnel is 4 hash aggregates + 3 user-key joins,
    // exactly what survives a 100 TB event log. Microsecond-integer
    // timestamps end to end; lags in exact ms.
    Q("q205_event_funnel",
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS tus
        |            FROM events),
        |s1 AS (SELECT user_id, min(tus) AS t1 FROM ev
        |       WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.tus) AS t2, max(s1.t1) AS t1
        |       FROM ev e JOIN s1 ON s1.user_id = e.user_id
        |       WHERE e.event_type = 'view' AND e.tus > s1.t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.tus) AS t3, max(s2.t2) AS t2
        |       FROM ev e JOIN s2 ON s2.user_id = e.user_id
        |       WHERE e.event_type = 'click' AND e.tus > s2.t2 GROUP BY 1),
        |s4 AS (SELECT e.user_id, min(e.tus) AS t4, max(s3.t3) AS t3
        |       FROM ev e JOIN s3 ON s3.user_id = e.user_id
        |       WHERE e.event_type = 'purchase' AND e.tus > s3.t3
        |       GROUP BY 1),
        |u AS (SELECT DISTINCT user_id FROM ev)
        |SELECT u.user_id,
        |  CAST(s1.user_id IS NOT NULL AS INT) AS did_signup,
        |  CAST(s2.user_id IS NOT NULL AS INT) AS did_view,
        |  CAST(s3.user_id IS NOT NULL AS INT) AS did_click,
        |  CAST(s4.user_id IS NOT NULL AS INT) AS did_purchase,
        |  CAST((s2.t2 - s2.t1) // 1000 AS BIGINT) AS lag_view_ms,
        |  CAST((s3.t3 - s3.t2) // 1000 AS BIGINT) AS lag_click_ms,
        |  CAST((s4.t4 - s4.t3) // 1000 AS BIGINT) AS lag_purchase_ms
        |FROM u
        |LEFT JOIN s1 ON s1.user_id = u.user_id
        |LEFT JOIN s2 ON s2.user_id = u.user_id
        |LEFT JOIN s3 ON s3.user_id = u.user_id
        |LEFT JOIN s4 ON s4.user_id = u.user_id
        |ORDER BY u.user_id""".stripMargin) { (s, dir) =>
      val e = ev(s, dir).select(col("user_id"), col("event_type"),
        expr("ts_ns DIV 1000").as("tus"))
      val s1 = e.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("tus").as("t1"))
      def step(prev: DataFrame, prevT: String, typ: String,
          tOut: String): DataFrame =
        e.filter(col("event_type") === typ)
          .join(prev.select(col("user_id"), col(prevT)), "user_id")
          .filter(col("tus") > col(prevT))
          .groupBy("user_id")
          .agg(min("tus").as(tOut), max(col(prevT)).as(prevT))
      val s2 = step(s1, "t1", "view", "t2")
      val s3 = step(s2, "t2", "click", "t3")
      val s4 = step(s3, "t3", "purchase", "t4")
      val u = e.select("user_id").distinct()
      u.join(s1.select(col("user_id"), col("t1"), lit(1).as("f1")),
          Seq("user_id"), "left")
        .join(s2.select(col("user_id"), col("t1").as("t1b"), col("t2"),
          lit(1).as("f2")), Seq("user_id"), "left")
        .join(s3.select(col("user_id"), col("t2").as("t2b"), col("t3"),
          lit(1).as("f3")), Seq("user_id"), "left")
        .join(s4.select(col("user_id"), col("t3").as("t3b"), col("t4"),
          lit(1).as("f4")), Seq("user_id"), "left")
        .select(col("user_id"),
          coalesce(col("f1"), lit(0)).as("did_signup"),
          coalesce(col("f2"), lit(0)).as("did_view"),
          coalesce(col("f3"), lit(0)).as("did_click"),
          coalesce(col("f4"), lit(0)).as("did_purchase"),
          expr("(t2 - t1b) DIV 1000").as("lag_view_ms"),
          expr("(t3 - t2b) DIV 1000").as("lag_click_ms"),
          expr("(t4 - t3b) DIV 1000").as("lag_purchase_ms"))
        .orderBy("user_id")
    },

    // ---- q208: sessionized path mining (event-type trigrams) -----------
    // The "what do users DO" companion to q205's funnel: every
    // consecutive event-type trigram along each user's timeline,
    // counted corpus-wide — the path table a product-analytics tool
    // renders as a Sankey. Per-user ordered collection is BOUNDED
    // (one user's history, the natural unit — this is the one shape
    // where collect_list is the scale-correct tool), ordering made
    // deterministic by the unique event_id tiebreak; trigram expansion
    // is a map-side transform over the sorted array, and the count is
    // one hash aggregate over a ≤|types|³ domain.
    Q("q208_event_paths",
      """WITH tl AS (SELECT user_id,
        |    list(event_type ORDER BY epoch_us(ts), event_id) AS ts
        |  FROM events GROUP BY 1),
        |tg AS (SELECT user_id,
        |    unnest(list_transform(range(1, len(ts) - 1),
        |      i -> ts[i] || '>' || ts[i+1] || '>' || ts[i+2])) AS path
        |  FROM tl WHERE len(ts) >= 3)
        |SELECT path, count(*) AS cnt,
        |  count(DISTINCT user_id) AS n_users
        |FROM tg GROUP BY 1
        |ORDER BY cnt DESC, path""".stripMargin) { (s, dir) =>
      val tl = ev(s, dir)
        .select(col("user_id"),
          struct(expr("ts_ns DIV 1000").as("tus"), col("event_id"),
            col("event_type")).as("e"))
        .groupBy("user_id")
        .agg(sort_array(collect_list(col("e"))).as("es"))
        .filter(size(col("es")) >= 3)
        .select(col("user_id"),
          expr("transform(es, x -> x.event_type)").as("ts"))
      tl.select(col("user_id"),
          explode(expr("transform(sequence(0, size(ts) - 3), " +
            "i -> concat(ts[i], '>', ts[i+1], '>', ts[i+2]))")).as("path"))
        .groupBy("path")
        .agg(count(lit(1)).as("cnt"),
          countDistinct("user_id").as("n_users"))
        .orderBy(desc("cnt"), asc("path"))
    }
  )
}
