package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q138's exactness guarantee: PPJoin prefix filtering must find EVERY
  * pair with Jaccard ≥ 0.7 that brute-force all-pairs finds — the
  * pigeonhole argument and the ceil-prefix-length integer arithmetic
  * are both load-bearing, and an off-by-one in either silently drops
  * pairs (a false negative the oracle fixture might not cover). */
class ExactSetSimSpec extends AnyFunSuite with SparkSpec {

  private def bruteForce(sets: Map[Long, Set[String]]): Set[(Long, Long)] = {
    val ids = sets.keys.toSeq.sorted
    (for {
      i <- ids; j <- ids if i < j
      inter = (sets(i) & sets(j)).size
      union = sets(i).size + sets(j).size - inter
      if inter * 10 >= union * 7
    } yield (i, j)).toSet
  }

  test("prefix filtering finds exactly the brute-force pair set") {
    val s = spark
    import s.implicits._
    for (seed <- 1 to 8) {
      val rnd = new Random(seed * 7919L)
      val vocab = (0 until 60).map(i => s"tok$i")
      // clusters of near-identical sets (high-J pairs) + random tail
      val base = (0 until 5).map(_ =>
        rnd.shuffle(vocab).take(8 + rnd.nextInt(10)).toSet)
      val sets: Map[Long, Set[String]] = (0 until 40).map { id =>
        val st =
          if (id < 20) {
            val b = base(id % 5)
            // mutate 0-2 elements: J stays mostly >= 0.7 in-cluster
            val drop = b.take(rnd.nextInt(2))
            val add = rnd.shuffle(vocab).take(rnd.nextInt(2)).toSet
            (b -- drop) ++ add
          } else rnd.shuffle(vocab).take(5 + rnd.nextInt(12)).toSet
        id.toLong -> st
      }.toMap
      val sh = sets.toSeq.flatMap { case (id, st) => st.map(w => (id, w)) }
        .toDF("doc_id", "s")
      val got = Dedup.exactSetSimJoinOf(sh)._1
        .select("doc1", "doc2").as[(Long, Long)].collect().toSet
      val want = bruteForce(sets)
      assert(got === want,
        s"seed=$seed missing=${want -- got} extra=${got -- want}")
      assert(want.nonEmpty, s"seed=$seed fixture carries no signal")
    }
  }

  test("singleton-element and tiny sets do not break the prefix slice") {
    val s = spark
    import s.implicits._
    val sh = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "a"), (4L, "b"))
      .toDF("doc_id", "s")
    val got = Dedup.exactSetSimJoinOf(sh)._1
      .select("doc1", "doc2").as[(Long, Long)].collect().toSet
    // {a}~{a}: J=1; {a}~{a,b}: J=0.5 < 0.7; {b}~{a,b}: 0.5
    assert(got === Set((1L, 2L)))
  }
}
