package graft.operators

import graft.SparkSpec

/** Edge inputs for the text/dedup operators: documents shorter than one
  * shingle (<3 words) and single-word docs must flow through without
  * errors — sequence()/slice() HOF patterns crash on descending
  * sequences if unguarded. */
class TextEdgeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = tempDir("text-edge")
    Seq(
      (0L, "one", "en", "src0", 3L),
      (1L, "two words", "en", "src0", 9L),
      (2L, "three words here", "en", "src0", 16L),
      (3L, "a much longer document with plenty of words to shingle", "en", "src0", 54L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("fingerprints: short docs get null shingle extrema, rolling hash still set") {
    val rows = graft.SparkEntry.queries("q26_fingerprint")(spark, dir).collect()
    assert(rows.length === 4)
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    assert(byId(0L).isNullAt(2) && byId(1L).isNullAt(2)) // fp_shingle_min
    assert(!byId(2L).isNullAt(2) && !byId(3L).isNullAt(2))
    assert(rows.forall(!_.isNullAt(4))) // fp_rolling always present
  }

  test("jaccard/minhash: sub-shingle docs drop out instead of crashing") {
    assert(graft.SparkEntry.queries("q29_dedup_ngram_jaccard")(spark, dir).count() >= 0)
    assert(graft.SparkEntry.queries("q30_dedup_minhash_lsh")(spark, dir).count() >= 0)
  }

  test("token counting and quality scoring handle one-word docs") {
    val tok = graft.SparkEntry.queries("q23_token_count")(spark, dir).collect()
    assert(tok.length === 4)
    val q = graft.SparkEntry.queries("q24_quality_score")(spark, dir).collect()
    assert(q.length === 4)
  }
}
