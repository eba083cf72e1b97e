package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** Behavior guards for the sketch/linkage/graph family (q196-q206):
  * the mathematical guarantees each sketch is USED for, asserted on
  * live query output — beyond the oracle hash, these pin the
  * properties that must survive any future re-implementation. */
class SketchFamilySpec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf0001)

  test("q196: HLL estimate lands within the p=12 error envelope") {
    val rows = run("q196_hll_cardinality").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val err = math.abs(r.getAs[Double]("err_pct"))
      assert(err <= 5.0, s"HLL err ${err}% exceeds ~3σ of 1.6% expected")
      val zeros = r.getAs[Long]("zeros")
      assert(zeros >= 0 && zeros <= 4096)
    }
  }

  test("q197: Count-Min never undercounts") {
    val rows = run("q197_cms_frequency").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("cnt"),
        s"CMS undercounted: $r")
      assert(r.getAs[Long]("overcount") >= 0)
    }
  }

  test("q198: Bloom filter has zero false negatives") {
    val rows = run("q198_bloom_prefilter").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_exact_missed")).sum == 0L,
      "a member probe failed the filter — impossible by construction")
    rows.foreach(r => assert(r.getAs[Long]("n_bloom_pass") >=
      r.getAs[Long]("n_member")))
  }

  test("q203: KMV degrades to EXACT when the set is smaller than k") {
    // sf0.001 segment part-baskets are all < 256 distinct, so the
    // sketch IS the set: estimates must equal the exact counts
    val rows = run("q203_kmv_overlap").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("union_est") ==
        r.getAs[Long]("n_union").toDouble, s"sub-k union not exact: $r")
      assert(r.getAs[Double]("jacc_est") == r.getAs[Double]("jacc_exact"),
        s"sub-k jaccard not exact: $r")
    }
  }

  test("q200: PageRank conserves (floor-leaked) mass and rank floor") {
    val rows = run("q200_pagerank_trade_graph").collect()
    val n = rows.length
    val total = rows.map(_.getAs[Long]("pr")).sum
    assert(total <= n.toLong * 1000000L,
      "integer floor can only LOSE mass, never create it")
    assert(total >= (n.toLong * 1000000L * 95) / 100,
      "floor leakage should stay within ~5% over 5 iterations")
    assert(rows.map(_.getAs[Long]("pr")).min >= 150000L,
      "every node keeps at least the teleport mass")
  }

  test("q206: JL distortion concentrates around 1 at k=16") {
    val rows = run("q206_jl_projection").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getAs[Double]("distortion")
      assert(d > 0.2 && d < 3.0,
        s"distortion $d outside the k=16 concentration envelope")
      assert(r.getAs[Double]("d2_orig") > 0)
    }
  }

  test("q199: every variant finds a match and most hit their source") {
    val rows = run("q199_record_linkage").collect()
    assert(rows.nonEmpty)
    val hits = rows.map(_.getAs[Int]("hit")).sum
    assert(hits * 10 >= rows.length * 8,
      s"expected >=80% true-descriptor hits, got $hits/${rows.length}")
    rows.foreach(r => assert(r.getAs[Int]("lev") <= 3))
  }
}
