package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Behavior invariants for the corpus-prep operators (q59-q63) that the
  * oracle hash-compare can't express directly. */
class CorpusSpec extends SparkSpec {

  test("connectedComponents labels a 4-chain and an isolated pair (both paths)") {
    import spark.implicits._
    // 1-2-3-4 chain (diameter 3 forces multiple propagation rounds) + 10-11
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("doc1", "doc2")
    val want = Set(
      (1L, 1L, 4L), (2L, 1L, 4L), (3L, 1L, 4L), (4L, 1L, 4L),
      (10L, 10L, 2L), (11L, 10L, 2L))
    // small-graph union-find path
    val uf = Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(uf === want)
    // distributed label-propagation path (threshold forced to 0)
    val lp = Dedup.connectedComponents(pairs, smallGraphThreshold = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(lp === want)
  }

  test("distributed path converges on a 200-node chain (pointer jumping)") {
    import spark.implicits._
    // diameter 199 — the plain O(diameter) loop would trip the round
    // bound; pointer jumping needs ~log2(200) rounds
    val chain = (1L until 200L).map(i => (i, i + 1)).toDF("doc1", "doc2")
    val got = Dedup.connectedComponents(chain, smallGraphThreshold = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length === 200)
    assert(got.forall { case (_, c, g) => c == 1L && g == 200L },
      s"all 200 nodes must label to 1: ${got.filter(_._2 != 1L).take(5).mkString(",")}")
  }

  test("q59 groups are consistent with q30 pairs (every pair co-labeled)") {
    val pairs = SparkEntry_q("q30_dedup_minhash_lsh", sf001)
    val groups = SparkEntry_q("q59_dedup_groups_cc", sf001)
    val lbl = groups.select(col("doc_id"), col("canonical_id"))
    val violated = pairs
      .join(lbl.withColumnRenamed("doc_id", "doc1")
        .withColumnRenamed("canonical_id", "c1"), "doc1")
      .join(lbl.withColumnRenamed("doc_id", "doc2")
        .withColumnRenamed("canonical_id", "c2"), "doc2")
      .filter(col("c1") =!= col("c2"))
    assert(violated.isEmpty, "a candidate pair spans two groups")
  }

  test("q60 keeps every stratum within its configured rate (±10% abs)") {
    val total = graft.core.Tables.load(spark, sf001, "documents")
      .groupBy("lang").count().withColumnRenamed("count", "n_total")
    val kept = SparkEntry_q("q60_stratified_sample", sf001)
      .groupBy("lang").count().withColumnRenamed("count", "n_kept")
    val rates = total.join(kept, "lang")
      .select(col("lang"), col("n_kept").cast("double") / col("n_total"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(rates("en") - 0.35) < 0.10, s"en rate ${rates("en")}")
    Seq("zh", "es", "de", "fr").foreach { l =>
      assert(rates(l) > 0.80, s"$l rate ${rates(l)}")
    }
  }

  test("q61 redacted text contains no un-redacted email/phone") {
    val out = SparkEntry_q("q61_pii_redaction", sf001)
    assert(out.filter(col("redacted").rlike("@")).isEmpty, "email survived")
    assert(out.filter(col("redacted").rlike("\\+1-555-[0-9]")).isEmpty,
      "phone survived")
    assert(out.filter(col("n_emails") < 1).isEmpty, "injected email missed")
    // every third doc gets a phone
    assert(out.filter(col("doc_id") % 3 === 0 && col("n_phones") < 1).isEmpty)
  }

  test("q63 packing invariants: offset bounded, windows contiguous per shard") {
    val out = SparkEntry_q("q63_token_packing", sf001).persist()
    assert(out.filter(col("offset_in_window") >= 256 ||
      col("offset_in_window") < 0).isEmpty, "offset out of range")
    // window ids per shard form a non-decreasing sequence in doc order
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
    assert(out.withColumn("prev", lag("window_id", 1).over(w))
      .filter(col("prev") > col("window_id")).isEmpty, "window_id regressed")
    out.unpersist()
  }

  private def SparkEntry_q(name: String, dir: String = sf0001) =
    graft.SparkEntry.queries(name)(spark, dir)
}
