package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property check for the q59 component machinery: on ANY random edge
  * list, the single-task union-find path and the distributed
  * pointer-jumping label-propagation path must produce identical
  * (node → canonical, group_size) labelings, and both must equal a
  * reference union-find computed locally. Cases drawn with fixed seeds
  * (deterministic CI). */
class CcPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  // graphs mixing cliques, chains, stars, and random noise edges
  private val genEdges: Gen[List[(Long, Long)]] = for {
    nNodes <- Gen.choose(2, 60)
    nEdges <- Gen.choose(1, 80)
    edges <- Gen.listOfN(nEdges, for {
      a <- Gen.choose(0L, nNodes.toLong)
      b <- Gen.choose(0L, nNodes.toLong) if a != b
    } yield (a, b))
  } yield edges

  private def reference(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    val canon = parent.keys.toSeq.map(n => n -> find(n)).toMap
    val sizes = canon.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    canon.map { case (n, c) => n -> (c, sizes(c)) }
  }

  test("union-find and pointer-jumping paths agree with reference on random graphs") {
    samples(genEdges, 12).filter(_.nonEmpty).foreach { edges =>
      val df = edges.toDF("doc1", "doc2")
      val want = reference(edges)
      for (threshold <- Seq(Long.MaxValue, 0L)) { // both paths
        val got = Dedup.connectedComponents(df, smallGraphThreshold = threshold)
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
        assert(got === want,
          s"threshold=$threshold edges=$edges:\n got=$got\n want=$want")
      }
    }
  }

  test("string node ids fail loudly instead of silently casting to null") {
    val df = Seq(("a", "b"), ("b", "c")).toDF("doc1", "doc2")
    val ex = intercept[IllegalArgumentException] {
      Dedup.connectedComponents(df)
    }
    assert(ex.getMessage.contains("integral node ids"))
  }
}
