package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** The bucketing contract: a join of two tables bucketed on the join key
  * into the same bucket count plans with NO shuffle exchange on either
  * side, and produces the same rows as the shuffled join. */
class BucketedStoreSpec extends SparkSpec {

  test("co-bucketed join is exchange-free and row-identical") {
    val dir = tempDir("bucketed")
    val orders = Tables.load(spark, sf001, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Tables.load(spark, sf001, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice")

    BucketedStore.write(orders, "b_orders", s"$dir/orders", "o_orderkey", 8)
    BucketedStore.write(lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", s"$dir/lineitem", "o_orderkey", 8)

    // at this fixture scale Spark prefers a broadcast join (which ignores
    // bucketing entirely) — disable it for the assertion so the plan shows
    // what a fact⋈fact join does at real scale: sort-merge over the
    // bucketed scans with no shuffle on either side
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = BucketedStore.read(spark, "b_orders")
        .join(BucketedStore.read(spark, "b_lineitem"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString

      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n${plan.take(2000)}")

      // same answer as the plain shuffled join
      val expected = orders.join(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
      assert(joined.count() === expected.count())
      assert(joined.exceptAll(expected).isEmpty && expected.exceptAll(joined).isEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)

    // single-bucket pruning on a point lookup of the bucket key. The
    // DisableUnnecessaryBucketedScan rule treats filter-only plans as
    // non-beneficiaries and turns the bucketed scan off, so pin it on
    // for the pruning assertion.
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val point = BucketedStore.read(spark, "b_orders")
        .filter(col("o_orderkey") === 1L)
      val scanned = point.queryExecution.executedPlan.toString
      assert(scanned.contains("SelectedBucketsCount: 1 out of 8"), scanned.take(1500))
    } finally
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }
}
