package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}

/** Breadth of the scalar/relational surface beyond the core set
  * (SURVEY.md §2.6): pivot, array functions, math/datetime functions,
  * grouping sets, correlated subqueries (SQL entry point), range window
  * frames. */
object Extras {
  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val defs: Seq[Q] = Seq(
    // ---- q45: pivot (explicit value list → single pass) -----------------
    Q("q45_pivot_status_by_year",
      """SELECT year(o_orderdate) AS y,
        |  CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS "F",
        |  CAST(count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS "O",
        |  CAST(count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS "P"
        |FROM orders
        |GROUP BY y
        |ORDER BY y""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).cast("long").as("y"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .count()
        .na.fill(0L, Seq("F", "O", "P"))
        .orderBy("y")
    },

    // ---- q46: array function surface over embeddings --------------------
    Q("q46_array_funcs",
      """SELECT vec_id,
        |  CAST(len(embedding) AS INT) AS dim,
        |  round(CAST(list_min(embedding) AS DOUBLE), 6) AS v_min,
        |  round(CAST(list_max(embedding) AS DOUBLE), 6) AS v_max,
        |  round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS v_sum,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
        |  round(CAST(embedding[1] AS DOUBLE), 6) AS first_v,
        |  round(CAST(list_sort(embedding)[1] AS DOUBLE), 6) AS sorted_first
        |FROM embeddings
        |WHERE vec_id % 50 = 0
        |ORDER BY vec_id""".stripMargin) { (s, dir) =>
      t(s, dir, "embeddings")
        .filter(col("vec_id") % 50 === 0)
        .withColumn("_d", transform(col("embedding"), x => x.cast("double")))
        .select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          round(array_min(col("embedding")).cast("double"), 6).as("v_min"),
          round(array_max(col("embedding")).cast("double"), 6).as("v_max"),
          round(aggregate(col("_d"), lit(0.0d), (a, x) => a + x), 6).as("v_sum"),
          size(filter(col("embedding"), x => x > 0)).as("n_pos"),
          round(col("embedding").getItem(0).cast("double"), 6).as("first_v"),
          round(array_sort(col("embedding")).getItem(0).cast("double"), 6).as("sorted_first"))
        .orderBy("vec_id")
    },

    // ---- q47: math + datetime function surface ---------------------------
    Q("q47_math_datetime_funcs",
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS y,
        |  CAST(month(o_orderdate) AS INT) AS m,
        |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,  -- DuckDB 0=Sun, Spark 1=Sun
        |  CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INT) AS days_since,
        |  round(sqrt(o_totalprice), 4) AS sqrt_price,
        |  round(ln(o_totalprice), 6) AS ln_price,
        |  CAST(ceil(o_totalprice / 1000) AS BIGINT) AS price_k_ceil,
        |  CAST(o_orderkey % 7 AS BIGINT) AS mod7,
        |  round(abs(o_totalprice - 100000), 2) AS abs_dev
        |FROM orders
        |WHERE o_orderkey % 100 = 0
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderkey") % 100 === 0)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofweek(col("o_orderdate")).as("dow"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("days_since"),
          round(sqrt(col("o_totalprice")), 4).as("sqrt_price"),
          round(log(col("o_totalprice")), 6).as("ln_price"),
          ceil(col("o_totalprice") / 1000).cast("long").as("price_k_ceil"),
          (col("o_orderkey") % 7).as("mod7"),
          round(abs(col("o_totalprice") - 100000), 2).as("abs_dev"))
        .orderBy("o_orderkey")
    },

    // ---- q48: explicit GROUPING SETS (SQL entry point) -------------------
    Q("q48_grouping_sets",
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        |ORDER BY status, priority""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(
        """SELECT coalesce(o_orderstatus, 'ALL') AS status,
          |  coalesce(o_orderpriority, 'ALL') AS priority,
          |  count(*) AS n, round(sum(o_totalprice), 2) AS total
          |FROM orders
          |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
          |ORDER BY status, priority""".stripMargin)
    },

    // ---- q49: correlated scalar subquery (SQL entry point) ---------------
    Q("q49_correlated_subquery",
      """SELECT c_custkey, c_name
        |FROM customer c
        |WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
        |                   WHERE c2.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").createOrReplaceTempView("customer")
      s.sql(
        """SELECT c_custkey, c_name
          |FROM customer c
          |WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
          |                   WHERE c2.c_nationkey = c.c_nationkey)
          |ORDER BY c_custkey""".stripMargin)
    },

    // ---- q51: exact + approximate percentiles ---------------------------
    // Exact percentile matches DuckDB's quantile_cont (both linear
    // interpolation); approx_percentile is the sketch path for scale and
    // is bounded against the exact value in the assertion columns.
    Q("q51_percentiles",
      """SELECT o_orderpriority,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |  round(quantile_cont(o_totalprice, 0.95), 4) AS p95,
        |  round(min(o_totalprice), 4) AS p_min,
        |  round(max(o_totalprice), 4) AS p_max
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.95)"), 4).as("p95"),
          round(min(col("o_totalprice")), 4).as("p_min"),
          round(max(col("o_totalprice")), 4).as("p_max"))
        .orderBy("o_orderpriority")
    },

    // ---- q52: window navigation functions --------------------------------
    Q("q52_window_navigation",
      """SELECT o_custkey, o_orderkey,
        |  lag(o_totalprice) OVER w AS prev_price,
        |  lead(o_totalprice) OVER w AS next_price,
        |  first_value(o_totalprice) OVER w AS first_price,
        |  round(o_totalprice - coalesce(lag(o_totalprice) OVER w, o_totalprice), 2) AS delta
        |FROM orders
        |WHERE o_custkey % 200 = 0
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .filter(col("o_custkey") % 200 === 0)
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          first(col("o_totalprice")).over(w).as("first_price"),
          round(col("o_totalprice") -
            coalesce(lag(col("o_totalprice"), 1).over(w), col("o_totalprice")), 2).as("delta"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // ---- q53: multiset set operations (ALL variants) ---------------------
    Q("q53_set_ops_all",
      """SELECT l_partkey, 'inter' AS op FROM (
        |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
        |  INTERSECT ALL
        |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A')
        |UNION ALL
        |SELECT l_partkey, 'exc' AS op FROM (
        |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
        |  EXCEPT ALL
        |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A')
        |ORDER BY op, l_partkey""".stripMargin) { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val r = li.filter(col("l_returnflag") === "R").select("l_partkey")
      val a = li.filter(col("l_returnflag") === "A").select("l_partkey")
      r.intersectAll(a).withColumn("op", lit("inter"))
        .unionAll(r.exceptAll(a).withColumn("op", lit("exc")))
        .orderBy("op", "l_partkey")
    },

    // ---- q50: RANGE window frame ----------------------------------------
    Q("q50_range_frame",
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
        |    RANGE BETWEEN 5000 PRECEDING AND CURRENT ROW) AS n_similar_cheaper
        |FROM orders
        |WHERE o_custkey % 100 = 0
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice"))
        .rangeBetween(-5000, Window.currentRow)
      t(s, dir, "orders")
        .filter(col("o_custkey") % 100 === 0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          count(lit(1)).over(w).as("n_similar_cheaper"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // ---- q66: per-key top-k via the custom physical operator ------------
    // Same answer as q08's window row_number form, but planned through
    // graft.plans.TopKPerKeyNode: partial per-partition bounded heaps →
    // exchange carrying only partial winners → final merge. The oracle
    // states the declarative row_number semantics; `TopKPerKeySpec`
    // additionally asserts plan shape and window-form equivalence.
    Q("q66_topk_custom",
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
        |  FROM orders) t WHERE rn <= 3
        |ORDER BY o_custkey, o_totalprice DESC, o_orderkey DESC""".stripMargin) { (s, dir) =>
      graft.plans.TopK.perKey(
        t(s, dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice"),
        Seq("o_custkey"), struct(col("o_totalprice"), col("o_orderkey")), k = 3)
        .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey").desc)
    },

    // ---- q68: statistical aggregates (corr / covar / stddev / regr) -----
    // The OLAP statistics surface: Pearson correlation, sample
    // covariance/stddev/variance, and the regr_* linear-fit pair —
    // per-group, single aggregation pass (each is a map-side-combinable
    // moment accumulation, so the plan is the same two-stage hash agg as
    // any sum). Rounded at 4 dp: the co-moment merges are
    // order-sensitive at ~1e-12 relative, same determinism budget as
    // q01's sums.
    Q("q68_stat_funcs",
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
        |  round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qp,
        |  round(stddev_samp(l_extendedprice), 4) AS sd_price,
        |  round(var_samp(l_quantity), 4) AS var_qty,
        |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("covar_qp"),
          round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
          round(var_samp(col("l_quantity")), 4).as("var_qty"),
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4).as("intercept"))
        .orderBy("l_returnflag")
    },

    // ---- q70: ranking window functions (ntile / percent_rank / ...) -----
    // The remaining window-rank surface: rank/dense_rank exercise
    // SQL-standard tie semantics on the raw price; ntile needs a TOTAL
    // order (tile assignment is positional, so ties must be broken — by
    // orderkey here) for cross-engine determinism.
    Q("q70_window_ranks",
      """SELECT o_custkey, o_orderkey,
        |  CAST(rank() OVER wp AS BIGINT) AS rnk,
        |  CAST(dense_rank() OVER wp AS BIGINT) AS drnk,
        |  round(percent_rank() OVER wp, 6) AS prnk,
        |  round(cume_dist() OVER wp, 6) AS cdist,
        |  CAST(ntile(4) OVER wt AS BIGINT) AS quartile
        |FROM orders
        |WHERE o_custkey % 150 = 0
        |WINDOW wp AS (PARTITION BY o_custkey ORDER BY o_totalprice),
        |       wt AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      val wp = Window.partitionBy("o_custkey").orderBy("o_totalprice")
      val wt = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
      t(s, dir, "orders")
        .filter(col("o_custkey") % 150 === 0)
        .select(col("o_custkey"), col("o_orderkey"),
          rank().over(wp).cast("long").as("rnk"),
          dense_rank().over(wp).cast("long").as("drnk"),
          round(percent_rank().over(wp), 6).as("prnk"),
          round(cume_dist().over(wp), 6).as("cdist"),
          ntile(4).over(wt).cast("long").as("quartile"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // ---- q71: fixed-width histogram -------------------------------------
    // The distribution-profiling primitive: 20 equal-width bins over the
    // observed [min, max] — bounds from one tiny broadcast aggregate,
    // binning per-row, then a 20-group count. Integer bin math on both
    // engines; the max value is clamped into the last bin.
    Q("q71_histogram",
      """WITH b AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders)
        |SELECT
        |  CAST(least(floor((o_totalprice - lo) / ((hi - lo) / 20)), 19) AS BIGINT) AS bin,
        |  round(min(lo + CAST(least(floor((o_totalprice - lo) / ((hi - lo) / 20)), 19) AS BIGINT)
        |    * ((hi - lo) / 20)), 4) AS bin_lo,
        |  count(*) AS n
        |FROM orders CROSS JOIN b
        |GROUP BY bin ORDER BY bin""".stripMargin) { (s, dir) =>
      val bounds = t(s, dir, "orders")
        .agg(min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
      val width = (col("hi") - col("lo")) / 20
      val bin = least(floor((col("o_totalprice") - col("lo")) / width), lit(19))
        .cast("long")
      t(s, dir, "orders")
        .crossJoin(broadcast(bounds))
        .withColumn("bin", bin)
        .groupBy("bin")
        .agg(round(min(col("lo") + col("bin") * width), 4).as("bin_lo"),
          count(lit(1)).as("n"))
        .orderBy("bin")
    },

    // ---- q72: gaps and islands ------------------------------------------
    // Consecutive-run detection (the classic islands problem): per
    // customer, runs of consecutive o_orderkey values found via the
    // key − row_number() fingerprint (constant within a run), then one
    // group per island. Two window/agg passes, both partitioned by
    // customer — linear, no self-join.
    Q("q72_gaps_islands",
      """WITH g AS (
        |  SELECT o_custkey, o_orderkey,
        |    o_orderkey - row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS grp
        |  FROM orders WHERE o_custkey % 200 = 0)
        |SELECT o_custkey, min(o_orderkey) AS island_start,
        |  max(o_orderkey) AS island_end, count(*) AS island_len
        |FROM g GROUP BY o_custkey, grp
        |ORDER BY o_custkey, island_start""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      t(s, dir, "orders")
        .filter(col("o_custkey") % 200 === 0)
        .withColumn("grp", col("o_orderkey") - row_number().over(w))
        .groupBy("o_custkey", "grp")
        .agg(min("o_orderkey").as("island_start"),
          max("o_orderkey").as("island_end"),
          count(lit(1)).as("island_len"))
        .drop("grp")
        .orderBy("o_custkey", "island_start")
    },

    // ---- q73: unpivot / melt (wide → long) ------------------------------
    // Reshaping surface: lineitem's four numeric measures melted to
    // (key, measure, value) rows via the native unpivot operator (a
    // generator, not a join — output is 4 rows per input row, produced
    // map-side). Oracle states the engine-agnostic UNION ALL form.
    Q("q73_unpivot",
      """SELECT l_orderkey, l_linenumber, measure, round(value, 4) AS value FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_discount' AS measure, l_discount AS value
        |  FROM lineitem WHERE l_orderkey % 500 = 0
        |  UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
        |  FROM lineitem WHERE l_orderkey % 500 = 0
        |  UNION ALL SELECT l_orderkey, l_linenumber, 'l_quantity', l_quantity
        |  FROM lineitem WHERE l_orderkey % 500 = 0
        |  UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
        |  FROM lineitem WHERE l_orderkey % 500 = 0) u
        |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 500 === 0)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_discount"), col("l_extendedprice"),
            col("l_quantity"), col("l_tax")),
          "measure", "value")
        .withColumn("value", round(col("value"), 4))
        .orderBy("l_orderkey", "l_linenumber", "measure")
    },

    // ---- q74: positional explode (generator with ordinality) ------------
    // Column-to-rows with position: per-dimension stats across the
    // embedding corpus via posexplode — the generator runs map-side and
    // the aggregation groups on the (tiny) dimension domain.
    Q("q74_explode_positional",
      """WITH x AS (
        |  SELECT unnest(list_transform(range(1, len(embedding) + 1),
        |    i -> struct_pack(pos := i - 1, v := CAST(embedding[i] AS DOUBLE)))) AS s
        |  FROM embeddings)
        |SELECT s.pos AS pos,
        |  round(avg(s.v), 6) AS avg_v, round(min(s.v), 6) AS min_v,
        |  round(max(s.v), 6) AS max_v, count(*) AS n
        |FROM x GROUP BY s.pos ORDER BY pos""".stripMargin) { (s, dir) =>
      t(s, dir, "embeddings")
        .select(posexplode(transform(col("embedding"), x => x.cast("double")))
          .as(Seq("pos", "v")))
        .groupBy(col("pos").cast("long").as("pos"))
        .agg(round(avg("v"), 6).as("avg_v"), round(min("v"), 6).as("min_v"),
          round(max("v"), 6).as("max_v"), count(lit(1)).as("n"))
        .orderBy("pos")
    },

    // ---- q75: ordered string aggregation --------------------------------
    // listagg-style rollups (label lists, id digests). Determinism is the
    // whole trick: DISTINCT + an explicit element order on both engines
    // (Spark: sort_array(collect_set); DuckDB: string_agg DISTINCT ...
    // ORDER BY) — an unordered listagg would be flakily nondeterministic
    // under parallel aggregation.
    Q("q75_string_agg",
      """SELECT o_orderpriority,
        |  string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
        |  CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          concat_ws(",", sort_array(collect_set(col("o_orderstatus"))))
            .as("statuses"),
          countDistinct(col("o_orderstatus")).as("n_statuses"))
        .orderBy("o_orderpriority")
    },

    // ---- q123: exact GLOBAL quantiles without a sort ---------------------
    // q51's `percentile` buffers every group value in one agg buffer — a
    // global exact quantile over 100 TB can't go through it. This is the
    // scale path: ExactQuantile.kthSmallest narrows each rank by
    // equi-width histogram passes over the integer cents domain (B=4096
    // → 2 histogram passes for a 10^7 range), each pass a map-side-
    // combined hash agg whose exchange carries ≤ranks·B cells. No sort,
    // no window, no data-row shuffle; driver state is bucket counts
    // only. The oracle takes the rank definition literally: the row at
    // row_number k = ceil(p·n) of the sorted domain. k is computed in
    // exact decimal arithmetic on both sides (DuckDB DECIMAL literals,
    // driver BigDecimal) so no float ceil straddles an integer.
    Q("q123_exact_quantiles",
      """WITH v AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c
        |           FROM lineitem),
        |n AS (SELECT count(*) AS n FROM v),
        |r AS (SELECT c, row_number() OVER (ORDER BY c) AS rn FROM v),
        |p AS (SELECT * FROM (VALUES (0.25),(0.50),(0.75),(0.95),(0.99)) t(p)),
        |k AS (SELECT p.p, CAST(ceil(p.p * n.n) AS BIGINT) AS k FROM p, n)
        |SELECT CAST(k.p AS DOUBLE) AS p, k.k AS k,
        |  round(r.c / 100.0, 2) AS price
        |FROM k JOIN r ON r.rn = k.k
        |ORDER BY p""".stripMargin) { (s, dir) =>
      import s.implicits._
      // pin the narrow cents column ONCE: the rank-target count and the
      // narrowing's stats + histogram passes all read the same
      // materialized projection (one source scan total)
      val cents = ExactQuantile.pin(
        t(s, dir, "lineitem")
          .select(round(col("l_extendedprice") * 100, 0).cast("long").as("c")),
        Seq("c"))
      val n = cents.count()
      val ps = Seq("0.25", "0.50", "0.75", "0.95", "0.99").map(BigDecimal(_))
      val ks = ps.map(p =>
        p.toString -> (p * n).setScale(0, BigDecimal.RoundingMode.CEILING).toLong).toMap
      val vals = ExactQuantile.kthSmallest(cents, "c", ks)
      ps.map(p => (p.toDouble, ks(p.toString),
          (BigDecimal(vals(p.toString)) / 100).toDouble))
        .toDF("p", "k", "price").orderBy("p")
    },

    // ---- q129: exact PER-GROUP quantiles, still no sort ------------------
    // q123's narrowing with per-(group, rank) intervals: the group
    // predicate rides inside each histogram cell's `when`, so G groups
    // cost the SAME pass count as one — each pass stays one scan + one
    // hash agg over ≤specs·B cells. The grouped exact-median answer
    // `percentile` gives by buffering every group's values, delivered
    // at a bounded memory footprint instead.
    Q("q129_grouped_exact_quantiles",
      """WITH v AS (SELECT l_returnflag AS g,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS c FROM lineitem),
        |n AS (SELECT g, count(*) AS n FROM v GROUP BY 1),
        |r AS (SELECT g, c, row_number() OVER (PARTITION BY g ORDER BY c) AS rn
        |      FROM v),
        |p AS (SELECT * FROM (VALUES (0.50),(0.95)) t(p)),
        |k AS (SELECT n.g, p.p, CAST(ceil(p.p * n.n) AS BIGINT) AS k FROM n, p)
        |SELECT k.g AS l_returnflag, CAST(k.p AS DOUBLE) AS p, k.k AS k,
        |  round(r.c / 100.0, 2) AS price
        |FROM k JOIN r ON r.g = k.g AND r.rn = k.k
        |ORDER BY l_returnflag, p""".stripMargin) { (s, dir) =>
      import s.implicits._
      // pinned once: group counts + narrowing share one source scan
      val li = ExactQuantile.pin(
        t(s, dir, "lineitem").select(col("l_returnflag").as("g"),
          round(col("l_extendedprice") * 100, 0).cast("long").as("c")),
        Seq("g", "c"))
      val ps = Seq("0.50", "0.95").map(BigDecimal(_))
      def mkKs(counts: Map[String, Long]) =
        for ((g, n) <- counts; p <- ps) yield
          (g, p.toString) -> (p * n).setScale(0, BigDecimal.RoundingMode.CEILING).toLong
      // group counts come from the narrowing's own stats pass — no
      // separate count-per-group aggregation
      val (ns, vals) = ExactQuantile.kthSmallestAllGroups(li, "g", "c", mkKs)
      val ks = mkKs(ns)
      (for ((g, _) <- ns.toSeq; p <- ps) yield
        (g, p.toDouble, ks((g, p.toString)),
          (BigDecimal(vals((g, p.toString))) / 100).toDouble))
        .toDF("l_returnflag", "p", "k", "price")
        .orderBy("l_returnflag", "p")
    },

    // ---- q194: exact trimmed + winsorized mean per group ----------------
    // Robust central tendency WITHOUT a global sort: the exact p10/p90
    // edges come from the proven grouped histogram narrowing (q129's
    // kthSmallestByGroup — pass count log_B(domain), constant in corpus
    // size), then ONE broadcast of the 2·groups edge scalars drives two
    // partial-aggregable passes: the trimmed mean over values inside
    // [p10, p90] and the winsorized mean with values clamped to the
    // edges — the outlier-robust per-segment value report. Integer-cent
    // sums with a single final division, so no float summation order
    // can drift between engines.
    Q("q194_trimmed_mean",
      """WITH v AS (SELECT event_type AS g,
        |    CAST(round(value * 100) AS BIGINT) AS c FROM events),
        |n AS (SELECT g, count(*) AS n FROM v GROUP BY 1),
        |r AS (SELECT g, c, row_number() OVER (PARTITION BY g ORDER BY c) AS rn
        |      FROM v),
        |k AS (SELECT g, n, CAST(ceil(0.1 * n) AS BIGINT) AS k10,
        |      CAST(ceil(0.9 * n) AS BIGINT) AS k90 FROM n),
        |e AS (SELECT k.g, k.n, r1.c AS v10, r2.c AS v90
        |      FROM k JOIN r r1 ON r1.g = k.g AND r1.rn = k.k10
        |             JOIN r r2 ON r2.g = k.g AND r2.rn = k.k90),
        |kept AS (SELECT v.g, count(*) AS nk, sum(v.c) AS sk
        |  FROM v JOIN e ON e.g = v.g AND v.c BETWEEN e.v10 AND e.v90
        |  GROUP BY 1),
        |wins AS (SELECT v.g, sum(CASE WHEN v.c < e.v10 THEN e.v10
        |    WHEN v.c > e.v90 THEN e.v90 ELSE v.c END) AS sw
        |  FROM v JOIN e ON e.g = v.g GROUP BY 1)
        |SELECT e.g AS event_type, CAST(e.n AS BIGINT) AS n,
        |  round(e.v10 / 100.0, 2) AS p10, round(e.v90 / 100.0, 2) AS p90,
        |  CAST(kept.nk AS BIGINT) AS n_kept,
        |  round(CAST(kept.sk AS DOUBLE) / kept.nk / 100.0, 4) AS trimmed_mean,
        |  round(CAST(wins.sw AS DOUBLE) / e.n / 100.0, 4) AS winsorized_mean
        |FROM e JOIN kept ON kept.g = e.g JOIN wins ON wins.g = e.g
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      import s.implicits._
      // pinned once: group counts, the narrowing, AND the two
      // trimmed/winsorized aggregation passes all read one scan
      val v = ExactQuantile.pin(
        Tables.load(s, dir, "events").select(col("event_type").as("g"),
          round(col("value") * 100, 0).cast("long").as("c")),
        Seq("g", "c"))
      def mkKs(counts: Map[String, Long]) =
        (for ((g, n) <- counts.toSeq;
              (p, lbl) <- Seq(BigDecimal("0.1") -> "p10",
                BigDecimal("0.9") -> "p90")) yield
          (g, lbl) -> (p * n).setScale(0, BigDecimal.RoundingMode.CEILING).toLong
          ).toMap
      // group counts come from the narrowing's own stats pass
      val (ns, edges) = ExactQuantile.kthSmallestAllGroups(v, "g", "c", mkKs)
      val eDf = ns.toSeq.map { case (g, n) =>
        (g, n, edges((g, "p10")), edges((g, "p90")))
      }.toDF("g", "n", "v10", "v90")
      val joined = v.join(broadcast(eDf), "g")
      val kept = joined.filter(col("c").between(col("v10"), col("v90")))
        .groupBy("g").agg(count(lit(1)).as("nk"), sum(col("c")).as("sk"))
      val wins = joined.select(col("g"),
          when(col("c") < col("v10"), col("v10"))
            .when(col("c") > col("v90"), col("v90"))
            .otherwise(col("c")).as("w"))
        .groupBy("g").agg(sum(col("w")).as("sw"))
      eDf.join(kept, "g").join(wins, "g")
        .select(col("g").as("event_type"), col("n"),
          round(col("v10") / 100.0, 2).as("p10"),
          round(col("v90") / 100.0, 2).as("p90"),
          col("nk").as("n_kept"),
          round(col("sk").cast("double") / col("nk") / 100.0, 4)
            .as("trimmed_mean"),
          round(col("sw").cast("double") / col("n") / 100.0, 4)
            .as("winsorized_mean"))
        .orderBy("event_type")
    },

    // ---- q204: Z-order layout — zone-map pruning evaluation ------------
    // The STORAGE-side scale lever (Delta/Iceberg Z-ORDER, Spark's
    // repartitionByRange+sortWithinPartitions idiom): interleaving the
    // bits of two filter columns clusters multi-dimensional locality
    // into file-sized buckets, so min/max zone maps prune 2-D query
    // boxes that an arrival-order layout cannot. The bit spread is the
    // classic 4-step shift-mask (16 → 32 bits, integer-exact, replayed
    // verbatim by the oracle); both layouts get identical zone maps
    // (per-bucket min/max of both columns) and three literal query
    // boxes are evaluated against each: buckets touched, rows scanned
    // (sum of touched buckets), rows actually matching — the scan-
    // amplification column is the number a table-layout decision is
    // made on. Everything integer; one final rounded ratio.
    Q("q204_zorder_layout",
      """WITH ord AS (SELECT o_orderkey,
        |    CAST(o_custkey % 65536 AS BIGINT) AS x,
        |    CAST(datediff('day', DATE '1995-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS y
        |  FROM orders),
        |sp AS (SELECT o_orderkey, x, y,
        |    (x | (x << 8)) & 16711935 AS x1, (y | (y << 8)) & 16711935 AS y1
        |  FROM ord),
        |sp2 AS (SELECT *, (x1 | (x1 << 4)) & 252645135 AS x2,
        |    (y1 | (y1 << 4)) & 252645135 AS y2 FROM sp),
        |sp3 AS (SELECT *, (x2 | (x2 << 2)) & 858993459 AS x3,
        |    (y2 | (y2 << 2)) & 858993459 AS y3 FROM sp2),
        |sp4 AS (SELECT *, (x3 | (x3 << 1)) & 1431655765 AS x4,
        |    (y3 | (y3 << 1)) & 1431655765 AS y4 FROM sp3),
        |zed AS (SELECT o_orderkey, x, y, x4 + 2 * y4 AS z FROM sp4),
        |lay AS (SELECT x, y, 'zorder' AS layout, z // 16384 AS bucket
        |        FROM zed
        |        UNION ALL
        |        SELECT x, y, 'arrival' AS layout, o_orderkey // 64 AS bucket
        |        FROM zed),
        |zm AS (SELECT layout, bucket, min(x) AS x_lo, max(x) AS x_hi,
        |        min(y) AS y_lo, max(y) AS y_hi, count(*) AS n
        |      FROM lay GROUP BY 1, 2),
        |boxes(box_id, qx_lo, qx_hi, qy_lo, qy_hi) AS (VALUES
        |  (1, 100, 200, 0, 180), (2, 500, 600, 1000, 1180),
        |  (3, 0, 1500, 30, 60)),
        |touch AS (SELECT b.box_id, zm.layout,
        |        count(*) AS buckets_touched, sum(zm.n) AS rows_scanned
        |      FROM boxes b JOIN zm
        |        ON zm.x_lo <= b.qx_hi AND zm.x_hi >= b.qx_lo
        |       AND zm.y_lo <= b.qy_hi AND zm.y_hi >= b.qy_lo
        |      GROUP BY 1, 2),
        |mt AS (SELECT b.box_id, count(*) AS rows_matching
        |      FROM boxes b JOIN zed o
        |        ON o.x BETWEEN b.qx_lo AND b.qx_hi
        |       AND o.y BETWEEN b.qy_lo AND b.qy_hi
        |      GROUP BY 1),
        |nb AS (SELECT layout, count(*) AS n_buckets FROM zm GROUP BY 1)
        |SELECT t.box_id, t.layout, nb.n_buckets,
        |  CAST(t.buckets_touched AS BIGINT) AS buckets_touched,
        |  CAST(t.rows_scanned AS BIGINT) AS rows_scanned,
        |  CAST(mt.rows_matching AS BIGINT) AS rows_matching,
        |  round(CAST(t.rows_scanned AS DOUBLE)
        |    / nullif(mt.rows_matching, 0), 2) AS scan_amplification
        |FROM touch t JOIN mt ON mt.box_id = t.box_id
        |JOIN nb ON nb.layout = t.layout
        |ORDER BY t.box_id, t.layout""".stripMargin) { (s, dir) =>
      import s.implicits._
      val ord = t(s, dir, "orders").select(col("o_orderkey"),
        (col("o_custkey") % 65536).cast("long").as("x"),
        datediff(col("o_orderdate").cast("date"),
          lit("1995-01-01").cast("date")).cast("long").as("y"))
      val zed = ord
        .withColumn("x1", expr("(x | shiftleft(x, 8)) & 16711935"))
        .withColumn("y1", expr("(y | shiftleft(y, 8)) & 16711935"))
        .withColumn("x2", expr("(x1 | shiftleft(x1, 4)) & 252645135"))
        .withColumn("y2", expr("(y1 | shiftleft(y1, 4)) & 252645135"))
        .withColumn("x3", expr("(x2 | shiftleft(x2, 2)) & 858993459"))
        .withColumn("y3", expr("(y2 | shiftleft(y2, 2)) & 858993459"))
        .withColumn("x4", expr("(x3 | shiftleft(x3, 1)) & 1431655765"))
        .withColumn("y4", expr("(y3 | shiftleft(y3, 1)) & 1431655765"))
        .select(col("o_orderkey"), col("x"), col("y"),
          expr("x4 + 2 * y4").as("z"))
      val lay = zed.select(col("x"), col("y"), lit("zorder").as("layout"),
          expr("z DIV 16384").as("bucket"))
        .union(zed.select(col("x"), col("y"), lit("arrival").as("layout"),
          expr("o_orderkey DIV 64").as("bucket")))
      val zm = lay.groupBy("layout", "bucket")
        .agg(min("x").as("x_lo"), max("x").as("x_hi"),
          min("y").as("y_lo"), max("y").as("y_hi"),
          count(lit(1)).as("n"))
      val boxes = Seq((1, 100L, 200L, 0L, 180L),
          (2, 500L, 600L, 1000L, 1180L), (3, 0L, 1500L, 30L, 60L))
        .toDF("box_id", "qx_lo", "qx_hi", "qy_lo", "qy_hi")
      val touch = zm.join(broadcast(boxes),
          col("x_lo") <= col("qx_hi") && col("x_hi") >= col("qx_lo") &&
            col("y_lo") <= col("qy_hi") && col("y_hi") >= col("qy_lo"))
        .groupBy("box_id", "layout")
        .agg(count(lit(1)).as("buckets_touched"),
          sum("n").as("rows_scanned"))
      val mt = zed.join(broadcast(boxes),
          col("x").between(col("qx_lo"), col("qx_hi")) &&
            col("y").between(col("qy_lo"), col("qy_hi")))
        .groupBy("box_id").agg(count(lit(1)).as("rows_matching"))
      val nb = zm.groupBy("layout").agg(count(lit(1)).as("n_buckets"))
      touch.join(mt, "box_id").join(broadcast(nb), "layout")
        .select(col("box_id"), col("layout"), col("n_buckets"),
          col("buckets_touched"), col("rows_scanned"), col("rows_matching"),
          round(col("rows_scanned").cast("double") /
            when(col("rows_matching") === 0, lit(null))
              .otherwise(col("rows_matching")), 2).as("scan_amplification"))
        .orderBy("box_id", "layout")
    },

    // ---- q207: OHLC time-series downsampling (min_by/max_by) -----------
    // The resampling operator every time-series store ships (candlestick
    // bars, telemetry downsampling): per (brand, month), the price at
    // the EARLIEST and LATEST event plus high/low/volume — open/close
    // via min_by/max_by over a composite integer event key
    // (day·1e8 + orderkey)·10 + linenumber, unique by construction so
    // the selection is deterministic without any ordered window; one
    // partial-aggregable pass, broadcast part dim for the brand.
    // Prices in exact cents (one shared double rounding at the cents
    // conversion, then integer min/max/sum).
    Q("q207_ohlc_downsample",
      """WITH px AS (SELECT p.p_brand,
        |    CAST(date_trunc('month', l.l_shipdate) AS DATE) AS mon,
        |    (CAST(datediff('day', DATE '1995-01-01',
        |       CAST(l.l_shipdate AS DATE)) AS BIGINT) * 100000000
        |     + l.l_orderkey) * 10 + l.l_linenumber AS ek,
        |    CAST(round(l.l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey)
        |SELECT p_brand, mon,
        |  CAST(arg_min(cents, ek) AS BIGINT) AS open_c,
        |  CAST(max(cents) AS BIGINT) AS high_c,
        |  CAST(min(cents) AS BIGINT) AS low_c,
        |  CAST(arg_max(cents, ek) AS BIGINT) AS close_c,
        |  count(*) AS volume,
        |  CAST(sum(cents) AS BIGINT) AS turnover_c
        |FROM px GROUP BY 1, 2
        |ORDER BY p_brand, mon""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part").select("p_partkey", "p_brand")),
          col("p_partkey") === col("l_partkey"))
        .select(col("p_brand"),
          to_date(date_trunc("month", col("l_shipdate"))).as("mon"),
          ((datediff(col("l_shipdate").cast("date"),
            lit("1995-01-01").cast("date")).cast("long") * 100000000L
            + col("l_orderkey")) * 10L + col("l_linenumber")).as("ek"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"))
        .groupBy("p_brand", "mon")
        .agg(expr("min_by(cents, ek)").as("open_c"),
          max("cents").as("high_c"),
          min("cents").as("low_c"),
          expr("max_by(cents, ek)").as("close_c"),
          count(lit(1)).as("volume"),
          sum("cents").as("turnover_c"))
        .orderBy("p_brand", "mon")
    },

    // ---- q209: two-phase distributed skyline (Pareto-optimal set) ------
    // The multi-objective query (cheapest-AND-largest parts: minimize
    // price, maximize size) whose naive form is an O(n²) dominance
    // self-join. The distributed shape: phase 1 buckets price into
    // fixed $5 ranges and takes max(size) per bucket — a ≤20-row
    // summary; phase 2 computes each bucket's best strictly-cheaper
    // size (a triangle join on the tiny summary) and prunes every row
    // whose size doesn't beat it (anything ≤ is dominated by some
    // strictly cheaper part) — ONE broadcast filter that eliminates
    // ~all of the corpus; phase 3 runs the exact dominance anti-join
    // on the surviving handful only (broadcast, never corpus²). The
    // oracle is the NOT EXISTS the plan avoids. Exact-cents integers;
    // ties (equal price and size) are mutually non-dominating and both
    // survive, deterministically.
    Q("q209_skyline",
      """WITH p AS (SELECT p_partkey,
        |    CAST(round(p_retailprice * 100) AS BIGINT) AS cents,
        |    p_size FROM part)
        |SELECT op.p_partkey, op.cents, CAST(op.p_size AS INT) AS p_size
        |FROM p op
        |WHERE NOT EXISTS (SELECT 1 FROM p q
        |  WHERE (q.cents < op.cents AND q.p_size >= op.p_size)
        |     OR (q.cents <= op.cents AND q.p_size > op.p_size))
        |ORDER BY op.cents, op.p_size, op.p_partkey""".stripMargin) {
      (s, dir) =>
      val p = t(s, dir, "part").select(col("p_partkey"),
        round(col("p_retailprice") * 100).cast("long").as("cents"),
        col("p_size"))
      val b = p.withColumn("bk", expr("cents DIV 500"))
      val bmax = b.groupBy("bk").agg(max("p_size").as("mx"))
      val best = bmax.as("a")
        .join(bmax.as("bb"), col("bb.bk") < col("a.bk"), "left")
        .groupBy(col("a.bk").as("bk"))
        .agg(max(col("bb.mx")).as("best_lower"))
      val cand = b.join(broadcast(best), "bk")
        .filter(col("best_lower").isNull ||
          col("p_size") > col("best_lower"))
        .select("p_partkey", "cents", "p_size")
      cand.as("x")
        .join(broadcast(cand.as("y")),
          (col("y.cents") < col("x.cents") &&
            col("y.p_size") >= col("x.p_size")) ||
            (col("y.cents") <= col("x.cents") &&
              col("y.p_size") > col("x.p_size")),
          "left_anti")
        .select(col("p_partkey"), col("cents"),
          col("p_size").cast("int").as("p_size"))
        .orderBy("cents", "p_size", "p_partkey")
    },

    // ---- q214: exact integer OLS trend per group ------------------------
    // Per-brand price trend as a least-squares slope over yearly mean
    // prices — the drift detector a curation/market pipeline runs per
    // segment. Everything before the ONE final rounding is exact
    // integer arithmetic: prices to cents, yearly means by integer
    // division, then slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²) with
    // centered years (x = year − 1995, so products stay far from
    // BIGINT range at any SF — the raw-epoch-day form overflows at
    // sf≈0.1). The exact numerator/denominator are emitted alongside
    // the rounded ratio, so a caller can compare slopes without any
    // float at all. Two map-side-combinable aggregates and a broadcast
    // dim join — no shuffle carries more than (brand × year) rows.
    Q("q214_price_trend",
      """WITH px AS (SELECT p.p_brand,
        |    CAST(year(l.l_shipdate) AS BIGINT) - 1995 AS x,
        |    CAST(round(l.l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
        |yr AS (SELECT p_brand, x,
        |    CAST(sum(cents) // count(*) AS BIGINT) AS y
        |  FROM px GROUP BY 1, 2),
        |s AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM yr GROUP BY 1)
        |SELECT p_brand, n AS n_years,
        |  n * sxy - sx * sy AS slope_num,
        |  n * sxx - sx * sx AS slope_den,
        |  round(CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx), 6)
        |    AS slope_cents_per_year
        |FROM s WHERE n >= 2 ORDER BY p_brand""".stripMargin) { (s, dir) =>
      val px = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part").select("p_partkey", "p_brand")),
          col("p_partkey") === col("l_partkey"))
        .select(col("p_brand"),
          (year(col("l_shipdate")).cast("long") - 1995L).as("x"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"))
      val yr = px.groupBy("p_brand", "x")
        .agg(expr("CAST(sum(cents) div count(1) AS BIGINT)").as("y"))
      val num = col("n") * col("sxy") - col("sx") * col("sy")
      val den = col("n") * col("sxx") - col("sx") * col("sx")
      yr.groupBy("p_brand")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"))
        .filter(col("n") >= 2)
        .select(col("p_brand"), col("n").as("n_years"),
          num.as("slope_num"), den.as("slope_den"),
          round(num.cast("double") / den, 6).as("slope_cents_per_year"))
        .orderBy("p_brand")
    }
  )
}
