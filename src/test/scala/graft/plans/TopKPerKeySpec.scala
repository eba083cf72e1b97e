package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** The custom top-k operator must (a) agree exactly with the window
  * row_number formulation, (b) plan as partial→exchange→final so the
  * shuffle carries only partial winners. */
class TopKPerKeySpec extends SparkSpec {

  private def orders = Tables.load(spark, sf001, "orders")
    .select("o_custkey", "o_orderkey", "o_totalprice")

  test("agrees with the window row_number formulation (composite tiebreak)") {
    // deterministic order: price desc, then orderkey desc via struct
    val got = TopK.perKey(orders, Seq("o_custkey"),
      struct(col("o_totalprice"), col("o_orderkey")), k = 3)
      .select("o_custkey", "o_orderkey")

    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").desc)
    val want = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).select("o_custkey", "o_orderkey")

    assert(got.count() === want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("plans as partial→exchange→final; ascending variant works") {
    val df = TopK.perKey(orders, Seq("o_custkey"), col("o_totalprice"), 2,
      ascending = true)
    val plan = df.queryExecution.executedPlan.toString
    assert("TopKPerKey ".r.findAllIn(plan).size >= 2, plan.take(1500))
    // the exchange sits BETWEEN the two phases: final above, partial below
    val first = plan.indexOf("TopKPerKey ")
    val ex = plan.indexOf("Exchange hashpartitioning")
    val second = plan.indexOf("TopKPerKey ", first + 1)
    assert(first >= 0 && first < ex && ex < second, plan.take(1500))

    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").asc)
    val want = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).drop("rn")
    // ascending top-k = k smallest; compare only the retained price set
    // per customer (ties on price may legitimately pick different rows)
    val gotAgg = df.groupBy("o_custkey")
      .agg(sort_array(collect_list("o_totalprice")).as("ps"))
    val wantAgg = want.groupBy("o_custkey")
      .agg(sort_array(collect_list("o_totalprice")).as("ps"))
    assert(gotAgg.exceptAll(wantAgg).isEmpty && wantAgg.exceptAll(gotAgg).isEmpty)
  }

  test("groups smaller than k pass through whole") {
    import spark.implicits._
    val tiny = Seq((1L, 10L, 5.0), (1L, 11L, 4.0), (2L, 20L, 1.0))
      .toDF("o_custkey", "o_orderkey", "o_totalprice")
    val got = TopK.perKey(tiny, Seq("o_custkey"), col("o_totalprice"), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L), (1L, 11L), (2L, 20L)))
  }

  test("partial phase flushes at the key cap and stays EXACT") {
    // cap far below the distinct-key count: every input partition's heap
    // map flushes repeatedly (the bounded-memory path), and because the
    // final merge rejoins a key's flushed candidate sets after
    // clustering, the result must STILL equal the window formulation.
    // Keys per FINAL partition (1500/32 ≈ 47… but the cap applies there
    // too) — final partitions stay under the cap only if keys spread;
    // with 200 shuffle partitions here keys-per-final ≈ 8 < 16.
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    val prevCoalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    try {
      spark.conf.set(TopKPerKeyExec.CapKey, "16")
      spark.conf.set("spark.sql.shuffle.partitions", "200")
      // AQE would coalesce the tiny shuffle back to a few partitions and
      // push keys-per-final-partition over the cap again
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val got = TopK.perKey(orders.repartition(4), Seq("o_custkey"),
        struct(col("o_totalprice"), col("o_orderkey")), k = 3)
        .select("o_custkey", "o_orderkey")
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").desc)
      val want = orders.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3).select("o_custkey", "o_orderkey")
      assert(got.count() === want.count())
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    } finally {
      spark.conf.unset(TopKPerKeyExec.CapKey)
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prevCoalesce)
    }
  }

  test("final merge past the key cap SPILLS to the sort-based merge, stays exact") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // AQE wraps the executed plan in AdaptiveSparkPlanExec, which hides
      // the node instances whose metric this test reads — plain plan here
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set(TopKPerKeyExec.CapKey, "4")
      // ~1500 distinct custkeys over 32 final partitions ≈ 47 keys per
      // clustered partition — far past the cap of 4, so every final
      // partition must take the external-sorter path, and the result
      // must STILL equal the window formulation exactly.
      val df = TopK.perKey(orders, Seq("o_custkey"),
        struct(col("o_totalprice"), col("o_orderkey")), k = 3)
        .select("o_custkey", "o_orderkey")
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").desc)
      val want = orders.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3).select("o_custkey", "o_orderkey")
      // collect() drives df's OWN queryExecution, so the spill metric can
      // be read off that exact executed plan afterwards
      assert(df.collect().length.toLong === want.count())
      val spills = df.queryExecution.executedPlan.collect {
        case t: TopKPerKeyExec if !t.partial => t.metrics("spillMerges").value
      }.sum
      assert(spills > 0, "expected at least one final-phase sort-merge spill")
      assert(df.exceptAll(want).isEmpty && want.exceptAll(df).isEmpty)
    } finally {
      spark.conf.unset(TopKPerKeyExec.CapKey)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
