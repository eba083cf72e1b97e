package graft.operators

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** ExactQuantile vs brute-force sorted selection: duplicates, skew,
  * negatives, and a tiny bucket count (B=4) that forces the narrowing
  * loop through many passes — every pass boundary is a chance to lose a
  * rank to an off-by-one in the cumulative-count walk. */
class ExactQuantileSpec extends AnyFunSuite with SparkSpec {

  private def check(data: Seq[Long], ks: Seq[Long], buckets: Int): Unit = {
    val s = spark
    import s.implicits._
    val df = data.toDF("v").repartition(5)
    val want = data.sorted
    val got = ExactQuantile.kthSmallest(
      df, "v", ks.map(k => s"k$k" -> k).toMap, buckets)
    ks.foreach { k =>
      assert(got(s"k$k") === want((k - 1).toInt),
        s"rank $k of n=${data.size} B=$buckets")
    }
  }

  test("uniform with duplicates, B=4 forces deep narrowing") {
    val rnd = new Random(7)
    val data = Seq.fill(3000)(rnd.nextInt(500).toLong - 250L)
    check(data, Seq(1L, 2L, 750L, 1500L, 2999L, 3000L), buckets = 4)
  }

  test("heavy skew: one value holds 90% of the mass") {
    val rnd = new Random(11)
    val data = Seq.fill(2700)(42L) ++ Seq.fill(300)(rnd.nextLong() % 1000000L)
    check(data, Seq(1L, 150L, 1500L, 2950L, 3000L), buckets = 8)
  }

  test("wide sparse domain narrows in log_B passes") {
    val rnd = new Random(13)
    val data = Seq.fill(800)(rnd.nextLong() % 10000000000L)
    check(data, Seq(1L, 400L, 401L, 800L), buckets = 16)
  }

  test("all-equal column and single row") {
    check(Seq.fill(50)(9L), Seq(1L, 25L, 50L), buckets = 4)
    check(Seq(-3L), Seq(1L), buckets = 4)
  }

  test("adjacent ranks across a bucket boundary stay independent") {
    // values 0..99 once each, B=10: ranks 10 and 11 straddle the
    // first-pass bucket edge
    check((0L until 100L), Seq(10L, 11L, 90L, 91L), buckets = 10)
  }

  test("grouped: per-group ranks match per-group sorted selection") {
    val s = spark
    import s.implicits._
    val rnd = new Random(17)
    val data = (0 until 4000).map { _ =>
      val g = s"g${rnd.nextInt(3)}"
      (g, rnd.nextInt(700).toLong - 350L)
    }
    val df = data.toDF("g", "v").repartition(5)
    val byG = data.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val ks = byG.flatMap { case (g, vs) =>
      Seq((g, "p25") -> (vs.size / 4 + 1).toLong,
        (g, "max") -> vs.size.toLong, (g, "min") -> 1L)
    }
    val got = ExactQuantile.kthSmallestByGroup(df, "g", "v", ks, buckets = 8)
    ks.foreach { case ((g, lbl), k) =>
      assert(got((g, lbl)) === byG(g)((k - 1).toInt), s"($g, $lbl) k=$k")
    }
  }

  test("grouped: missing group fails loudly") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 1L)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      ExactQuantile.kthSmallestByGroup(df, "g", "v", Map(("zz", "p") -> 1L))
    }
  }

  test("out-of-range rank and empty input fail loudly") {
    val s = spark
    import s.implicits._
    val df = Seq(1L, 2L).toDF("v")
    intercept[IllegalArgumentException] {
      ExactQuantile.kthSmallest(df, "v", Map("k" -> 3L))
    }
    intercept[IllegalArgumentException] {
      ExactQuantile.kthSmallest(df.filter("v > 5"), "v", Map("k" -> 1L))
    }
  }
}
