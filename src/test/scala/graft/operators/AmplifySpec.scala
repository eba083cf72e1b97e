package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The amplifier's load-bearing invariants: determinism, id
  * disjointness, EXACT within-replica Jaccard preservation (the word
  * cipher is a function of the word alone), and cross-replica
  * dissimilarity (amplification must not manufacture an R²-sized
  * duplicate cluster out of each base doc). */
class AmplifySpec extends SparkSpec {
  import spark.implicits._

  private val docA =
    "the quick brown fox jumps over the lazy dog and then runs far away home"
  private val docB = // near-dup of A: one word differs
    "the quick brown fox jumps over the lazy dog and then runs far away house"

  private def base: DataFrame =
    Seq((1L, docA), (2L, docB)).toDF("doc_id", "text")

  private def shingleSet(text: String): Set[String] =
    text.split(" ").sliding(3).map(_.mkString(" ")).toSet

  private def jaccard(a: Set[String], b: Set[String]): Double =
    a.intersect(b).size.toDouble / a.union(b).size

  private def textsOf(df: DataFrame): Map[Long, String] =
    df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("deterministic: two amplification runs are identical") {
    assert(textsOf(Amplify.docs(base, 3)) === textsOf(Amplify.docs(base, 3)))
  }

  test("replica ids are disjoint and replica 0 is the base, verbatim") {
    val amp = textsOf(Amplify.docs(base, 3))
    assert(amp.keySet ===
      Set(1L, 2L, 1L + Amplify.IdStride, 2L + Amplify.IdStride,
        1L + 2 * Amplify.IdStride, 2L + 2 * Amplify.IdStride))
    assert(amp(1L) === docA && amp(2L) === docB)
  }

  test("within-replica Jaccard is preserved exactly; cross-replica drops below threshold") {
    val amp = textsOf(Amplify.docs(base, 3))
    val baseJ = jaccard(shingleSet(docA), shingleSet(docB))
    for (i <- 1 to 2) {
      val a = shingleSet(amp(1L + i * Amplify.IdStride))
      val b = shingleSet(amp(2L + i * Amplify.IdStride))
      // the cipher maps words independently of position/doc, so shared
      // shingles stay shared and distinct shingles stay distinct
      // (md5-collision-free at this vocabulary size)
      assert(jaccard(a, b) === baseJ, s"replica $i changed within-replica Jaccard")
      // the same base doc across replicas must NOT look like a near-dup
      assert(jaccard(shingleSet(amp(1L)), a) < 0.5,
        s"replica $i too similar to base: ${jaccard(shingleSet(amp(1L)), a)}")
    }
  }

  test("event skew amplifier: hot user owns ≈hotFrac of rows, replicas never tie") {
    val ev = Seq((1L, 10L, 1000L, "view"), (2L, 11L, 2000L, "purchase"),
      (3L, 12L, 3000L, "view"), (4L, 13L, 4000L, "click"))
      .toDF("event_id", "user_id", "ts_ns", "event_type")
    val uni = Amplify.events(ev, 50)
    assert(uni.count() === 200)
    assert(uni.filter(col("user_id") === 0L).isEmpty, "hotFrac=0 → no hot rows")
    assert(uni.select("event_id").distinct().count() === 200, "ids disjoint")
    assert(uni.select("user_id", "ts_ns").distinct().count() === 200,
      "(user, ts) never ties across replicas")
    val hot = Amplify.events(ev, 50, hotFrac = 0.3)
    val hotRows = hot.filter(col("user_id") === 0L).count()
    assert(hotRows >= 40 && hotRows <= 80, // 0.3±tolerance of 200
      s"expected ≈60 hot rows of 200, got $hotRows")
    // deterministic: same call, same rows
    assert(hot.except(Amplify.events(ev, 50, hotFrac = 0.3)).isEmpty)
  }

  test("giant dup cluster: identical texts, disjoint ids, LSH sees one component") {
    val cluster = Amplify.giantDupCluster(base, 40)
    assert(cluster.count() === 40)
    assert(cluster.select("text").distinct().count() === 1, "all texts identical")
    assert(cluster.select("doc_id").distinct().count() === 40)
    val cand = Dedup.lshCandidatePairsOf(base.unionByName(cluster))
      .filter(col("doc1") >= 2 * Amplify.IdStride)
    assert(cand.count() === 40L * 39 / 2, "every cluster pair is a candidate")
    val cc = Dedup.connectedComponents(cand.select("doc1", "doc2"))
    assert(cc.filter(col("doc_id") >= 2 * Amplify.IdStride)
      .select("canonical_id").distinct().count() === 1, "one component")
  }

  test("clustered vectors: deterministic, unit-plane ring, graded similarity") {
    val v = Amplify.clusteredVectors(spark, 200L, centers = 8, dims = 16)
    assert(v.count() === 200)
    assert(v.select("vec_id").distinct().count() === 200)
    assert(v.except(Amplify.clusteredVectors(spark, 200L, centers = 8, dims = 16)).isEmpty)
    // same-center vectors are near-parallel; opposite-ring centers anti
    val rows = v.collect().map(r =>
      r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    assert(cos(rows(0L), rows(8L)) > 0.9, "same center ⇒ near-parallel")
    assert(cos(rows(0L), rows(4L)) < -0.8, "opposite center ⇒ anti-parallel")
  }

  test("embedding amplification: disjoint ids, deterministic, same dims, base verbatim") {
    val e = Seq((0L, Array(1.0f, 0.0f, 0.5f, -0.25f)), (1L, Array(0.0f, 1.0f, -0.5f, 0.25f)))
      .toDF("vec_id", "embedding")
    val amp = Amplify.embeddings(e, 2, dims = 4)
    assert(amp.count() === 4)
    val rows = amp.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(rows.keySet === Set(0L, 1L, Amplify.IdStride, 1L + Amplify.IdStride))
    assert(rows(0L) === Seq(1.0f, 0.0f, 0.5f, -0.25f))
    assert(rows(Amplify.IdStride) !== rows(0L), "replica must be perturbed")
    val again = Amplify.embeddings(e, 2, dims = 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(again === rows)
  }
}
