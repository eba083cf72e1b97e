package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Behavior invariants for the curation operators (q104-q106) beyond
  * the oracle hash-compare. */
class CurationSpec extends SparkSpec {

  private def q(name: String, dir: String) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("q104: the distilled classifier actually learns the gate") {
    val r = q("q104_quality_classifier", sf001).collect()
    assert(r.length === 1)
    val row = r(0)
    val Seq(tp, fp, tn, fn) =
      Seq("tp", "fp", "tn", "fn").map(c => row.getLong(row.fieldIndex(c)))
    val acc = row.getDouble(row.fieldIndex("accuracy"))
    val n = tp + fp + tn + fn
    assert(n === 500, "one verdict per sf0.01 doc")
    // both classes predicted (a degenerate all-one-class model is the
    // failure mode of unscaled GD) and accuracy well above the majority
    // floor (~0.57 at sf0.01)
    assert(tp + fp > 0 && tn + fn > 0, s"degenerate: tp=$tp fp=$fp tn=$tn fn=$fn")
    assert(acc > 0.65, s"did not learn: accuracy $acc")
    // the 1e-6-rounded trajectory is reproducible bit-for-bit
    val again = q("q104_quality_classifier", sf001).collect()(0)
    assert(row.toSeq === again.toSeq, "GD trajectory must be deterministic")
  }

  test("q105: known-overlap fixture lands in the right deciles") {
    import spark.implicits._
    val dir = tempDir("curation_docs")
    // two identical docs (every shingle duplicated → decile 9) and one
    // disjoint doc (no shingle shared → decile 0)
    Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = q("q105_dup_gram_fraction", dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toList
    assert(got === List((0, 1L, 0.0), (9, 2L, 1.0)))
  }

  test("q106: shards partition the corpus and respect the token budget") {
    val docs = graft.core.Tables.load(spark, sf001, "documents")
    val totalDocs = docs.count()
    val toks = docs.select(
      size(split(trim(regexp_replace(lower(col("text")), "\\s+", " ")), " "))
        .cast("long").as("n"))
    val totalTok = toks.agg(sum("n")).collect()(0).getLong(0)
    val maxTok = toks.agg(max("n")).collect()(0).getLong(0)
    val shards = q("q106_epoch_shards", sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // exact partition of the corpus
    assert(shards.map(_._2).sum === totalDocs)
    assert(shards.map(_._3).sum === totalTok)
    // contiguous shard ids from 0
    assert(shards.map(_._1).toList === shards.indices.map(_.toLong).toList)
    // a shard never overshoots the budget by more than one doc (docs are
    // never split), and only the last shard may run short
    assert(shards.init.forall { case (_, _, t) => t >= 1000 - maxTok + 1 },
      "non-final shard far below budget")
    assert(shards.forall { case (_, _, t) => t <= 1000 + maxTok - 1 },
      "shard overshoots budget by a whole doc")
  }

  test("q108: BPE merges match the hand-computed sequence on a fixture") {
    import spark.implicits._
    val dir = tempDir("bpe_docs")
    // vocab: aaab (freq 2), ab (freq 1)
    //   step 1: (a,a) count 4  -> aa   (greedy L-to-R: aaab = aa|a|b)
    //   step 2: (a,b) count 3  -> ab
    //   step 3: (aa,ab) count 2 -> aaab
    Seq((1L, "aaab aaab ab"), (2L, "aaab"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // fixture doc 1 holds two aaab + one ab; doc 2 one aaab → freq 3/1
    //   step 1: (a,a) = 2 per aaab × 3 = 6;       merge aa
    //   step 2: (a,b): aaab 1×3 + ab 1×1 = 4;     merge ab
    //   step 3: (aa,ab) = 3;                      merge aaab
    val (v, merges) = Curation.trainBpe(spark, dir, k = 3)
    assert(merges === Seq(
      (1, "a", "a", "aa", 6L),
      (2, "a", "b", "ab", 4L),
      (3, "aa", "ab", "aaab", 3L)))
    val seqs = v.collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(seqs("aaab") === "|aaab|")
    assert(seqs("ab") === "|ab|")
    v.unpersist()
    // step 4 has no pairs left anywhere — must fail loudly, not diverge
    val e = intercept[IllegalArgumentException] {
      Curation.trainBpe(spark, dir, k = 4)
    }
    assert(e.getMessage.contains("exhausted"))
  }

  test("batched BPE: batchSize=1 reproduces exact greedy; exhaustion is graceful") {
    import spark.implicits._
    val d = Seq((1L, "aaab aaab ab"), (2L, "aaab")).toDF("doc_id", "text")
    val (v1, m1, p1) = Curation.trainBpeBatchedOf(d, k = 3, batchSize = 1)
    assert(m1 === Seq(
      (1, "a", "a", "aa", 6L),
      (2, "a", "b", "ab", 4L),
      (3, "aa", "ab", "aaab", 3L)))
    assert(p1 === 3)
    v1.unpersist()
    // over-asking stops at pair exhaustion instead of throwing (the
    // scale path records what it learned; exact greedy stays loud)
    val (v2, m2, _) = Curation.trainBpeBatchedOf(d, k = 50, batchSize = 4)
    assert(m2.length >= 3 && m2.length < 50)
    v2.unpersist()
  }

  test("batched BPE: real corpus — valid merges, fewer passes, detok invariant") {
    val d = graft.core.Tables.load(spark, sf001, "documents")
      .select("doc_id", "text")
    val (v, merges, passes) = Curation.trainBpeBatchedOf(d, k = 16, batchSize = 4)
    assert(merges.length === 16)
    assert(passes < 16, s"batching must cut passes below k, ran $passes")
    assert(merges.forall { case (_, l, r, m, c) => m == l + r && c > 0 })
    // within a pass's batch the chosen symbols are disjoint — across the
    // whole table every merged symbol is unique
    assert(merges.map(_._4).distinct.length === merges.length)
    val bad = v.collect().filter { r =>
      val word = r.getString(0)
      val toks = r.getString(2).split(" ").map(t => t.substring(1, t.length - 1))
      toks.mkString("") != word || toks.exists(_.isEmpty)
    }
    assert(bad.isEmpty, s"detokenization broke for: ${bad.take(3).mkString(",")}")
    v.unpersist()
  }

  test("q108/q109: detokenization invariant on the real corpus") {
    val (v, merges) = Curation.trainBpe(spark, sf001)
    assert(merges.length === 8)
    assert(merges.forall { case (_, l, r, m, c) => m == l + r && c > 0 })
    // every word's final symbols concatenate back to the word
    val bad = v.collect().filter { r =>
      val word = r.getString(0)
      val toks = r.getString(2).split(" ").map(t => t.substring(1, t.length - 1))
      toks.mkString("") != word || toks.exists(_.isEmpty)
    }
    assert(bad.isEmpty, s"detokenization broke for: ${bad.take(3).mkString(",")}")
    v.unpersist()
  }

  test("q110: no near-dup pair straddles a split (leakage invariant)") {
    val assign = Dedup.leakageSafeSplitAssign(spark, sf001)
      .select(col("doc_id"), col("split")).localCheckpoint(true)
    val pairs = graft.SparkEntry.queries("q30_dedup_minhash_lsh")(spark, sf001)
      .select(col("doc1"), col("doc2"))
    val straddling = pairs
      .join(assign.withColumnRenamed("doc_id", "doc1")
        .withColumnRenamed("split", "s1"), "doc1")
      .join(assign.withColumnRenamed("doc_id", "doc2")
        .withColumnRenamed("split", "s2"), "doc2")
      .filter(col("s1") =!= col("s2"))
      .count()
    assert(straddling === 0L, "a near-dup pair crossed a split boundary")
    // the aggregated query accounts for every doc exactly once
    val total = graft.SparkEntry.queries("q110_leakage_safe_split")(spark, sf001)
      .agg(sum("n_docs")).collect()(0).getLong(0)
    assert(total === graft.core.Tables.load(spark, sf001, "documents").count())
  }

  test("q106: the prefix sum is distributed — no single-partition window") {
    val plan = q("q106_epoch_shards", sf001)
      .queryExecution.executedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("Window")).toList
    assert(windows.nonEmpty, "expected a windowed cumsum in the plan")
    // the cumsum window must be keyed by the bucket column, never a
    // global-order (single-partition) window
    assert(!plan.contains("SinglePartition"),
      s"global exchange leaked into the shard plan:\n$plan")
  }
}
