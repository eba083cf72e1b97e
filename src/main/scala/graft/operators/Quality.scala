package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}

/** Data-quality operators (SURVEY.md §2.6, round-10): column profiling
  * and declarative expectation checks — the Deequ-style pre-flight every
  * production pipeline runs before training-set cuts or dashboard
  * publishes.
  *
  * Scale posture: every metric is a map-side-combinable aggregate (one
  * pass per profiled column over a 1-column pruned scan; checks are one
  * agg or one equi-join each), so a 100 TB profile is a handful of
  * column-pruned scans — never a sort, never a window, and the report
  * itself is bounded by the column count, not the data.
  */
object Quality {

  /** Profile one column of `df`: row count, nulls, exact distinct count,
    * min/max (string form), and the most frequent value with its count
    * (ties to the largest value string — deterministic: max(struct)
    * compares cnt then value, matching the oracle's cnt DESC, v DESC).
    * The top-value
    * agg is a hash groupBy on the column, combined map-side; for an
    * unbounded-domain column at extreme scale the MG-sketch path (q121)
    * is the drop-in replacement. */
  private def profileCol(df: DataFrame, c: String): DataFrame = {
    val v = col(c).cast("string")
    val top = df.filter(col(c).isNotNull)
      .groupBy(v.as("value")).agg(count(lit(1)).as("cnt"))
      .agg(max(struct(col("cnt"), col("value"))).as("m"))
      .select(col("m.value").as("top_value"), col("m.cnt").as("top_count"))
    df.agg(
      count(lit(1)).as("n_rows"),
      count(when(col(c).isNull, 1)).as("n_null"),
      countDistinct(col(c)).as("n_distinct"),
      // min/max in the column's NATIVE order, then rendered as string —
      // min of the casted strings would compare lexicographically and
      // disagree with the oracle's numeric min on numeric columns
      min(col(c)).cast("string").as("min_value"),
      max(col(c)).cast("string").as("max_value"))
      .crossJoin(top) // both sides are one row
      .select(lit(c).as("column"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_value"), col("max_value"),
        col("top_value"), col("top_count"))
  }

  /** One expectation-check verdict row: name, rows checked, violations. */
  private def check(name: String, checked: Long, violations: Long,
                    spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((name, checked, violations, violations == 0L))
      .toDF("check", "n_checked", "n_violations", "passed")
  }

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val defs: Seq[Q] = Seq(

    // ---- q149: column profiling report --------------------------------
    // The summarize/describe staple, exact and engine-checkable: per
    // column of `orders` — rows, nulls, exact distinct, min/max, top
    // value. Each column's profile is one 1-column pruned scan of
    // map-side-combinable aggs; the most-frequent value uses a
    // deterministic (count, value) struct-max so ties never flap.
    Q("q149_data_profile", {
      val cols = Seq("o_custkey", "o_orderpriority", "o_orderstatus",
        "o_totalprice")
      val one = (c: String) =>
        s"""SELECT '$c' AS "column",
          |  CAST(count(*) AS BIGINT) AS n_rows,
          |  CAST(count(CASE WHEN $c IS NULL THEN 1 END) AS BIGINT) AS n_null,
          |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
          |  CAST(min($c) AS VARCHAR) AS min_value,
          |  CAST(max($c) AS VARCHAR) AS max_value,
          |  (SELECT t.v FROM (
          |     SELECT CAST($c AS VARCHAR) AS v, count(*) AS cnt FROM orders
          |     WHERE $c IS NOT NULL GROUP BY 1
          |     ORDER BY cnt DESC, v DESC LIMIT 1) t) AS top_value,
          |  (SELECT t.cnt FROM (
          |     SELECT CAST($c AS VARCHAR) AS v, CAST(count(*) AS BIGINT) AS cnt
          |     FROM orders WHERE $c IS NOT NULL GROUP BY 1
          |     ORDER BY cnt DESC, v DESC LIMIT 1) t) AS top_count
          |FROM orders""".stripMargin
      cols.map(one).mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
    }) { (s, dir) =>
      val orders = t(s, dir, "orders")
      Seq("o_custkey", "o_orderpriority", "o_orderstatus", "o_totalprice")
        .map(profileCol(orders, _))
        .reduce(_ unionByName _)
        .orderBy("column")
    },

    // ---- q150: declarative expectation checks --------------------------
    // The pre-flight gate: uniqueness, referential integrity, domain
    // membership, range, and completeness — each one agg or one
    // equi-join, reported as (check, checked, violations, passed) with
    // deliberately-failing rows included so the found path is exercised
    // (price cap and the non-unique column), not just green checkmarks.
    Q("q150_data_quality_checks",
      """SELECT * FROM (
        |  SELECT 'orders.pk_unique' AS "check",
        |    CAST(count(*) AS BIGINT) AS n_checked,
        |    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
        |      AS n_violations,
        |    count(*) = count(DISTINCT o_orderkey) AS passed
        |  FROM orders
        |  UNION ALL
        |  SELECT 'orders.custkey_unique',
        |    CAST(count(*) AS BIGINT),
        |    CAST(count(*) - count(DISTINCT o_custkey) AS BIGINT),
        |    count(*) = count(DISTINCT o_custkey)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'lineitem.fk_orders',
        |    CAST((SELECT count(*) FROM lineitem) AS BIGINT),
        |    CAST((SELECT count(*) FROM lineitem l
        |          WHERE l.l_orderkey NOT IN
        |            (SELECT o_orderkey FROM orders)) AS BIGINT),
        |    (SELECT count(*) FROM lineitem l
        |     WHERE l.l_orderkey NOT IN
        |       (SELECT o_orderkey FROM orders)) = 0
        |  UNION ALL
        |  SELECT 'orders.status_domain',
        |    CAST(count(*) AS BIGINT),
        |    CAST(count(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P')
        |      THEN 1 END) AS BIGINT),
        |    count(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P')
        |      THEN 1 END) = 0
        |  FROM orders
        |  UNION ALL
        |  SELECT 'orders.price_cap_450k',
        |    CAST(count(*) AS BIGINT),
        |    CAST(count(CASE WHEN o_totalprice > 450000 THEN 1 END) AS BIGINT),
        |    count(CASE WHEN o_totalprice > 450000 THEN 1 END) = 0
        |  FROM orders
        |  UNION ALL
        |  SELECT 'orders.orderdate_complete',
        |    CAST(count(*) AS BIGINT),
        |    CAST(count(CASE WHEN o_orderdate IS NULL THEN 1 END) AS BIGINT),
        |    count(CASE WHEN o_orderdate IS NULL THEN 1 END) = 0
        |  FROM orders)
        |ORDER BY "check"""".stripMargin) { (s, dir) =>
      val orders = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      val nOrders = orders.count()
      val nLi = li.count()
      val dupPk = nOrders - orders.select("o_orderkey").distinct().count()
      val dupCust = nOrders - orders.select("o_custkey").distinct().count()
      // referential integrity as an ANTI join on the key — the
      // NOT IN subquery shape, expressed join-wise for scale
      val orphans = li.select(col("l_orderkey"))
        .join(orders.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .count()
      val aggRow = orders.agg(
        count(when(!col("o_orderstatus").isin("F", "O", "P"), 1)).as("dom"),
        count(when(col("o_totalprice") > 450000, 1)).as("cap"),
        count(when(col("o_orderdate").isNull, 1)).as("nulldate"))
        .collect()(0)
      check("orders.pk_unique", nOrders, dupPk, s)
        .unionByName(check("orders.custkey_unique", nOrders, dupCust, s))
        .unionByName(check("lineitem.fk_orders", nLi, orphans, s))
        .unionByName(check("orders.status_domain", nOrders, aggRow.getLong(0), s))
        .unionByName(check("orders.price_cap_450k", nOrders, aggRow.getLong(1), s))
        .unionByName(check("orders.orderdate_complete", nOrders, aggRow.getLong(2), s))
        .orderBy("check")
    },

    // ---- q179: corpus drift monitor (crawl-over-crawl distribution) -----
    // The data-drift alarm every corpus pipeline runs between snapshots:
    // per-source L1 distance between the two crawls' word distributions
    // (0 = identical mix, 2 = disjoint). Snapshot B is the q115
    // deterministic mutation (every 17th doc re-crawled with appended
    // text, every 19th gone). The per-word term |c_a·N_b − c_b·N_a| is
    // summed EXACTLY in DECIMAL(38)/HUGEINT — products reach ~1e15 per
    // word at large SFs and a silent long overflow would fabricate
    // drift — with ONE division at the end. Cost shape: two word-count
    // aggregations + one full-outer equi-join on (source, word) — never
    // anything doc×doc.
    Q("q179_corpus_drift",
      """WITH a AS (SELECT source, unnest(string_split(text, ' ')) AS w
        |           FROM documents),
        |b AS (SELECT source, unnest(string_split(
        |          CASE WHEN doc_id % 17 = 0 THEN text || ' recrawled update'
        |               ELSE text END, ' ')) AS w
        |      FROM documents WHERE doc_id % 19 <> 0),
        |ca AS (SELECT source, w, count(*) AS c FROM a GROUP BY 1, 2),
        |cb AS (SELECT source, w, count(*) AS c FROM b GROUP BY 1, 2),
        |na AS (SELECT source, sum(c) AS n FROM ca GROUP BY 1),
        |nb AS (SELECT source, sum(c) AS n FROM cb GROUP BY 1),
        |j AS (SELECT coalesce(ca.source, cb.source) AS source,
        |        coalesce(ca.c, 0) AS c_a, coalesce(cb.c, 0) AS c_b
        |      FROM ca FULL OUTER JOIN cb
        |        ON cb.source = ca.source AND cb.w = ca.w),
        |t AS (SELECT j.source,
        |        sum(abs(CAST(j.c_a AS HUGEINT) * nb.n
        |              - CAST(j.c_b AS HUGEINT) * na.n)) AS num,
        |        max(na.n) AS n_a, max(nb.n) AS n_b
        |      FROM j JOIN na ON na.source = j.source
        |             JOIN nb ON nb.source = j.source
        |      GROUP BY 1)
        |SELECT source, CAST(n_a AS BIGINT) AS words_a,
        |  CAST(n_b AS BIGINT) AS words_b,
        |  round(CAST(num AS DOUBLE)
        |    / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6) AS l1_drift
        |FROM t ORDER BY source""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "documents")
      val a = d.select(col("source"),
        explode(split(col("text"), " ")).as("w"))
      val b = d.filter(col("doc_id") % 19 =!= 0)
        .select(col("source"), explode(split(
          when(col("doc_id") % 17 === 0,
            concat(col("text"), lit(" recrawled update")))
            .otherwise(col("text")), " ")).as("w"))
      val ca = a.groupBy("source", "w").agg(count(lit(1)).as("c_a"))
      val cb = b.groupBy("source", "w").agg(count(lit(1)).as("c_b"))
      val na = ca.groupBy("source").agg(sum(col("c_a")).as("n_a"))
      val nb = cb.groupBy("source").agg(sum(col("c_b")).as("n_b"))
      val j = ca.join(cb, Seq("source", "w"), "full_outer")
        .select(col("source"),
          coalesce(col("c_a"), lit(0L)).as("c_a"),
          coalesce(col("c_b"), lit(0L)).as("c_b"))
      j.join(broadcast(na), "source").join(broadcast(nb), "source")
        .groupBy("source")
        .agg(
          sum(abs(col("c_a").cast("decimal(38,0)") * col("n_b")
            - col("c_b").cast("decimal(38,0)") * col("n_a"))).as("num"),
          max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"))
        .select(col("source"), col("n_a").as("words_a"),
          col("n_b").as("words_b"),
          round(col("num").cast("double")
            / (col("n_a").cast("double") * col("n_b").cast("double")), 6)
            .as("l1_drift"))
        .orderBy("source")
    })
}
