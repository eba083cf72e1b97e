package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.{Q, Tables}

/** Core relational operator surface (SURVEY.md §2.5-2.6): scan + pushdown
  * filter/project, hash/broadcast joins, semi/anti joins, aggregation,
  * rollup, window functions, top-k, set ops.
  *
  * Scale posture: dimension tables (region/nation/customer at bench SF)
  * are broadcast explicitly; fact-fact joins shuffle on their join keys
  * and rely on AQE for skew handling. Filters are expressed directly on
  * scan columns so Catalyst pushes them into the parquet reader.
  */
object Relational {
  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private def ts(lit0: String) = lit(lit0).cast("timestamp")

  val defs: Seq[Q] = Seq(
    // ---- q01: full-scan aggregation (TPC-H Q1 shape) -------------------
    Q("q01_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= ts("2000-12-01 00:00:00"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // ---- q02: pushdown filter + column-pruned projection ---------------
    Q("q02_filter_project",
      """SELECT l_orderkey, l_linenumber, l_partkey, l_extendedprice
        |FROM lineitem
        |WHERE l_quantity < 5 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_quantity") < 5 && col("l_returnflag") === "R")
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // ---- q03: fact-fact shuffle join + broadcast dim + top-k -----------
    Q("q03_shipping_priority",
      """SELECT l_orderkey,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-30 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-06-30 00:00:00'
        |GROUP BY l_orderkey, orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin) { (s, dir) =>
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders").filter(col("o_orderdate") < ts("1998-06-30 00:00:00"))
      val li = t(s, dir, "lineitem").filter(col("l_shipdate") > ts("1998-06-30 00:00:00"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
          col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // ---- q04: left-semi join (EXISTS) -----------------------------------
    Q("q04_priority_semi",
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val big = t(s, dir, "lineitem").filter(col("l_quantity") > 45).select("l_orderkey")
      t(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },

    // ---- q05: 5-way join, broadcast dims, same-nation constraint -------
    Q("q05_local_supplier_volume",
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |  JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
      val nation = t(s, dir, "nation")
      val region = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val asianNations = broadcast(
        nation.join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey", "n_name"))
      val supp = t(s, dir, "supplier")
        .join(asianNations, col("s_nationkey") === col("n_nationkey"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // ---- q06: scan-heavy single-row aggregate (TPC-H Q6 shape) ---------
    Q("q06_forecast_revenue",
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1997-01-01 00:00:00") &&
          col("l_shipdate") < ts("1998-01-01 00:00:00") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))
    },

    // ---- q07: left-anti join (NOT EXISTS) -------------------------------
    Q("q07_customers_without_orders",
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // ---- q08: ranking window (row_number, top-3 per partition) ----------
    Q("q08_top_orders_per_customer",
      """SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders)
        |WHERE rk <= 3
        |ORDER BY o_custkey, rk""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select("o_custkey", "rk", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rk")
    },

    // ---- q09: running aggregate window ----------------------------------
    Q("q09_running_customer_spend",
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          round(sum(col("o_totalprice")).over(w), 2).as("running_spend"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // ---- q10: global top-k (sort + limit, TakeOrderedAndProject) --------
    Q("q10_top100_orders",
      """SELECT o_orderkey, o_totalprice, o_orderpriority
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    // ---- q11: rollup (grouping sets) ------------------------------------
    Q("q11_rollup_sales",
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n"), col("qty"))
        .orderBy("returnflag", "linestatus")
    },

    // ---- q12: set operations (INTERSECT / EXCEPT) ------------------------
    Q("q12_set_ops",
      """WITH f AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
        |     o AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |SELECT o_custkey, 'both' AS set_op FROM (SELECT * FROM f INTERSECT SELECT * FROM o)
        |UNION ALL
        |SELECT o_custkey, 'f_only' AS set_op FROM (SELECT * FROM f EXCEPT SELECT * FROM o)
        |ORDER BY o_custkey, set_op""".stripMargin) { (s, dir) =>
      val ord = t(s, dir, "orders")
      val f = ord.filter(col("o_orderstatus") === "F").select("o_custkey").distinct()
      val o = ord.filter(col("o_orderstatus") === "O").select("o_custkey").distinct()
      f.intersect(o).withColumn("set_op", lit("both"))
        .unionAll(f.except(o).withColumn("set_op", lit("f_only")))
        .orderBy("o_custkey", "set_op")
    },

    // ---- q13: exact distinct aggregation ---------------------------------
    Q("q13_distinct_counts",
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    },

    // ---- q14: CASE/WHEN enum mapping --------------------------------------
    Q("q14_priority_buckets",
      """SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'critical'
        |            WHEN o_orderpriority = '3-MEDIUM' THEN 'medium'
        |            ELSE 'low' END AS bucket,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY bucket
        |ORDER BY bucket""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .withColumn("bucket",
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "critical")
            .when(col("o_orderpriority") === "3-MEDIUM", "medium")
            .otherwise("low"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy("bucket")
    },

    // ---- q15: date/time functions ------------------------------------------
    Q("q15_sales_by_month",
      """SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
        |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY y, m
        |ORDER BY y, m""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy("y", "m")
    },

    // ---- q16: string function surface ---------------------------------------
    Q("q16_string_funcs",
      """SELECT c_custkey,
        |  upper(c_name) AS uname,
        |  length(c_name) AS name_len,
        |  substr(c_name, 1, 9) AS prefix,
        |  replace(c_name, 'Customer', 'Cust') AS short_name,
        |  concat(c_mktsegment, ':', c_name) AS tagged
        |FROM customer
        |WHERE c_custkey % 10 = 0
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .filter(col("c_custkey") % 10 === 0)
        .select(col("c_custkey"),
          upper(col("c_name")).as("uname"),
          length(col("c_name")).cast("long").as("name_len"),
          substring(col("c_name"), 1, 9).as("prefix"),
          regexp_replace(col("c_name"), "Customer", "Cust").as("short_name"),
          concat(col("c_mktsegment"), lit(":"), col("c_name")).as("tagged"))
        .orderBy("c_custkey")
    },

    // ---- q17: NULL normalization ("" → NULL convention, SURVEY §1.2) --------
    Q("q17_null_normalize",
      """SELECT coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_norm,
        |  count(*) AS n,
        |  count(nullif(o_orderstatus, 'O')) AS n_non_null
        |FROM orders
        |GROUP BY status_norm
        |ORDER BY status_norm""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .withColumn("status_nulled", when(col("o_orderstatus") === "O", lit(null)).otherwise(col("o_orderstatus")))
        .groupBy(coalesce(col("status_nulled"), lit("OPEN")).as("status_norm"))
        .agg(count(lit(1)).as("n"), count(col("status_nulled")).as("n_non_null"))
        .orderBy("status_norm")
    }
  )
}
