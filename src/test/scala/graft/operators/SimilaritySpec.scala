package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Hierarchical IVF assignment: the approximate two-level coarse
  * quantizer must produce a total, unique assignment and stay close to
  * the exact flat argmax — and its plan must remain broadcast-only. */
class SimilaritySpec extends SparkSpec {

  private def vectors(dir: String) =
    Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))

  private def centroids(dir: String) =
    vectors(dir).filter(col("vec_id") % 64 === 0)
      .select(col("vec_id").as("c_id"), col("v").as("cv"))

  test("hierarchical assign is total and unique (one cluster per vector)") {
    val n = vectors(sf001)
    val asg = Similarity.ivfAssignHierarchical(n, centroids(sf001))
    assert(asg.count() === n.count())
    assert(asg.select("vec_id").distinct().count() === n.count())
    assert(asg.filter(col("c_id").isNull).isEmpty)
  }

  test("hierarchical assign agrees with the exact flat argmax on most vectors") {
    val n = vectors(sf001)
    val cent = centroids(sf001)
    val exact = Similarity.ivfAssign(n, cent)
      .select(col("vec_id"), col("c_id").as("c_exact"))
    val hier = Similarity.ivfAssignHierarchical(n, cent)
      .select(col("vec_id"), col("c_id").as("c_hier"))
    val total = n.count()
    val agree = exact.join(hier, "vec_id")
      .filter(col("c_exact") === col("c_hier")).count()
    val frac = agree.toDouble / total
    // approximate by design (the true nearest centroid can live under a
    // different level-1 pivot). These synthetic vectors are the WORST
    // case for hierarchical pivoting — near-orthogonal, so pivot
    // similarities barely discriminate (measured 0.3-0.5 agreement
    // across sf/K; real text embeddings cluster, making pivots
    // meaningful). The floor pins against outright regressions (random
    // assignment would land ≈1/√K ≈ 0.15 here).
    assert(frac >= 0.25, s"exact-agreement $frac below floor")
  }

  test("hierarchical assign never leaves broadcast-join land") {
    val p = Similarity.ivfAssignHierarchicalPlan(vectors(sf0001), centroids(sf0001))
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      p.take(1500))
  }
}
