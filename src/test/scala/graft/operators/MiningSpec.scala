package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit + plan gates for the mining family (q142-q146). The oracle gate
  * covers end-to-end values; these pin the algorithmic claims the oracle
  * can't see — deletion-key exactness vs brute force, triangle-count
  * orientation independence, plan shapes. */
class MiningSpec extends SparkSpec {
  import spark.implicits._

  // ---- deletion-neighborhood fuzzy join ------------------------------

  test("deletionKeys: every levenshtein<=1 pair shares a key (exhaustive small alphabet)") {
    // all strings of length <= 3 over {a, b}: 15 strings, 225 pairs
    val alpha = Seq("a", "b")
    val strs = (Seq("") ++ alpha ++
      (for (x <- alpha; y <- alpha) yield x + y) ++
      (for (x <- alpha; y <- alpha; z <- alpha) yield x + y + z)).distinct
    def del1(s: String): Set[String] =
      (0 until s.length).map(i => s.take(i) + s.drop(i + 1)).toSet + s
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    for (x <- strs; y <- strs if lev(x, y) <= 1)
      assert(del1(x).intersect(del1(y)).nonEmpty,
        s"lev('$x','$y')<=1 but no shared deletion key")
    // and the Spark expression agrees with the Scala reference
    val got = strs.toDF("s")
      .select(col("s"), Mining.deletionKeys(col("s")).as("k"))
      .as[(String, Seq[String])].collect().toMap
    for (s <- strs if s.nonEmpty)
      assert(got(s).toSet == del1(s), s"deletionKeys('$s')")
  }

  test("q142: blocked fuzzy join equals brute force at sf0.001") {
    val out = graft.SparkEntry.queries("q142_fuzzy_join")(spark, sf0001)
      .select("dirty_id", "n_matches", "best_id", "best_lev")
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    // brute force in Scala over the same derivation
    val cust = graft.core.Tables.load(spark, sf0001, "customer")
      .select(col("c_custkey").cast("long"), col("c_name"))
      .as[(Long, String)].collect().toSeq
    def lev(a: String, b: String): Int = {
      var prev = (0 to b.length).toArray
      for (i <- 1 to a.length) {
        val cur = new Array[Int](b.length + 1); cur(0) = i
        for (j <- 1 to b.length)
          cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1),
            prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
      prev(b.length)
    }
    val expected = cust.map { case (id, name) =>
      val p = (id % name.length).toInt
      val dirty = name.take(p) + name.drop(p + 1)
      val hits = cust.map { case (cid, cn) => (cid, lev(dirty, cn)) }
        .filter(_._2 <= 1)
      val best = hits.map { case (cid, l) => l * 1000000000L + cid }.min
      (id, hits.size.toLong, best % 1000000000L, best / 1000000000L)
    }.sortBy(_._1)
    assert(out == expected)
  }

  test("q142: candidate generation is an equi-join, no cartesian product") {
    val p = graft.SparkEntry.queries("q142_fuzzy_join")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), "all-pairs join leaked in")
    assert(!p.contains("BroadcastNestedLoopJoin"), "non-equi join leaked in")
  }

  // ---- frequent pairs / triangles ------------------------------------

  test("q143: A-priori pruning semi-join is in the plan; pair join is equi") {
    // the pin runs against the BUILDER chain (the semi-join now
    // executes once at co-purchase-spill build time; the memoized q143
    // plan is a filtered parquet read of that spill — also asserted)
    val li = graft.core.Tables.load(spark, sf0001, "lineitem")
    val built = Mining.pairCounts(Mining.frequentBasketItems(li, 30L))
    val bp = built.queryExecution.executedPlan.toString
    assert(bp.contains("LeftSemi"), "support prune must be a semi join")
    assert(!bp.contains("CartesianProduct") &&
      !bp.contains("BroadcastNestedLoopJoin"), bp.take(1500))
    val df = graft.SparkEntry.queries("q143_frequent_pairs")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1500))
  }

  test("q144: degree-oriented triangle count equals naive a<b<c enumeration") {
    // random graph: 60 nodes, p=0.15
    val rnd = new scala.util.Random(7)
    val edges = (for {
      a <- 0 until 60; b <- (a + 1) until 60
      if rnd.nextDouble() < 0.15
    } yield (a.toLong, b.toLong)).toSeq
    val naive = (for {
      (a, b) <- edges; (b2, c) <- edges if b2 == b
      if edges.contains((a, c))
    } yield (a, b, c)).toSeq
    val naivePer = naive.flatMap { case (a, b, c) => Seq(a, b, c) }
      .groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val e = edges.toDF("a", "b")
    val got = Mining.trianglesPerVertex(e)
      .as[(Long, Long)].collect().toMap
    assert(got == naivePer)
  }

  test("q144: wedge join and closing join are equi-joins") {
    val p = graft.SparkEntry.queries("q144_copurchase_triangles")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1500))
  }

  // ---- decayed value / MAD -------------------------------------------

  test("q145: decay weights are exact-integer ratios; hand-computed user") {
    // one user, purchases at ts 1..3 with values 1.00, 2.00, 4.00 —
    // most recent (4.00) has k=0: decayed = 4 + 0.9*2 + 0.81*1 = 6.61
    assert(Mining.Pow9(15) == math.pow(9, 15).toLong)
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 1.00),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), 2.00),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:03"), 4.00))
      .toDF("user_id", "ts", "value")
      .withColumn("event_id", col("user_id") * 10 + second(col("ts")))
      .withColumn("event_type", lit("purchase"))
    val out = Mining.decayedUserValue(df)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 3L, 6.61)))
  }

  test("q152: per-item top-3 runs through TopKPerKey, no window sort") {
    val df = graft.SparkEntry.queries("q152_item_cf")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), "expected the custom top-k operator")
    assert(!p.contains("RunningWindowFunction") &&
      !p.contains("Window "), "corpus-wide window sort leaked in")
    // and the selection is the same one a window would make
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("item")
      .orderBy(col("sim").desc, col("other"))
    val items = graft.core.Tables.load(spark, sf0001, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val sup = items.groupBy("pk").agg(count(lit(1)).as("cnt"))
    val pr = items.as("x").join(items.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .groupBy(col("x.pk").as("a"), col("y.pk").as("b"))
      .agg(count(lit(1)).as("c")).filter(col("c") >= 2)
    val e = pr.select(col("a").as("item"), col("b").as("other"), col("c"))
      .unionAll(pr.select(col("b").as("item"), col("a").as("other"), col("c")))
    val ref = e
      .join(sup.select(col("pk").as("item"), col("cnt").as("sa")), "item")
      .join(sup.select(col("pk").as("other"), col("cnt").as("sb")), "other")
      .withColumn("sim",
        round(col("c").cast("double") / (col("sa") + col("sb") - col("c")), 6))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("item", "other", "c", "sim")
      .as[(Long, Long, Long, Double)].collect().toSet
    val got = df.as[(Long, Long, Long, Double)].collect().toSet
    assert(got == ref)
  }

  test("q147: equi-depth bins are balanced and partition the row count") {
    val bins = graft.SparkEntry.queries("q147_equidepth_bins")(spark, sf0001)
      .select("bin", "n_rows").as[(Long, Long)].collect().toSeq
    val total = graft.core.Tables.load(spark, sf0001, "orders").count()
    assert(bins.map(_._1) == (0L to 9L), "ten bins, densely numbered")
    assert(bins.map(_._2).sum == total, "bins partition the rows")
    val ideal = total / 10.0
    bins.foreach { case (b, n) =>
      assert(math.abs(n - ideal) <= math.max(2, total / 100),
        s"bin $b holds $n of ~$ideal — not equi-depth")
    }
  }

  test("q148: gap-filled series is dense and trailing sums match a replay") {
    val out = graft.SparkEntry.queries("q148_gapfill_trailing")(spark, sf0001)
      .select(col("user_id"), col("d").cast("string"), col("n_errors"),
        col("err_3d"))
      .as[(Long, String, Long, Long)].collect().toSeq
    val events = graft.core.Tables.load(spark, sf0001, "events")
      .select(col("user_id"), to_date(col("ts")).cast("string").as("d"),
        col("event_type"))
      .as[(Long, String, String)].collect().toSeq
    val users = events.map(_._1).distinct
    val days = {
      val all = events.map(_._2).distinct.sorted
      val (lo, hi) = (java.time.LocalDate.parse(all.head),
        java.time.LocalDate.parse(all.last))
      Iterator.iterate(lo)(_.plusDays(1)).takeWhile(!_.isAfter(hi))
        .map(_.toString).toSeq
    }
    assert(out.size == users.size * days.size, "dense user x day grid")
    val errCounts = events.filter(_._3 == "error")
      .groupBy(e => (e._1, e._2)).map { case (k, v) => k -> v.size.toLong }
    val expected = (for (u <- users.sorted; (d, i) <- days.zipWithIndex) yield {
      val n = errCounts.getOrElse((u, d), 0L)
      val trail = (math.max(0, i - 2) to i)
        .map(j => errCounts.getOrElse((u, days(j)), 0L)).sum
      (u, d, n, trail)
    }).toSeq
    assert(out == expected)
  }

  test("q146: MAD outlier counts match a driver-side recomputation at sf0.001") {
    val events = graft.core.Tables.load(spark, sf0001, "events")
      .select(col("event_type"), round(col("value") * 100).cast("long").as("v"))
      .as[(String, Long)].collect().toSeq
    val expected = events.groupBy(_._1).map { case (g, rows) =>
      val vs = rows.map(_._2).sorted
      val med = vs((vs.size - 1) / 2) // k = (n+1)/2, 1-indexed
      val devs = vs.map(v => math.abs(v - med)).sorted
      val mad = devs((devs.size - 1) / 2)
      (g, vs.size.toLong, med, mad,
        devs.count(_ > 3 * mad).toLong)
    }.toSeq.sortBy(_._1)
    val got = graft.SparkEntry.queries("q146_mad_outliers")(spark, sf0001)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
  }
}
