package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus amplifier — scale-testing input generator.
  *
  * Replicates a corpus R× with seeded perturbation so the dedup/ANN
  * paths can be MEASURED at 10×/50× instead of arguing scale posture
  * from plan shape alone. No `Math.random` anywhere: every derived
  * value is an md5 function of (replica, payload), so repeated runs —
  * and the two sides of any engine comparison — see bit-identical data.
  *
  * Document perturbation is a per-replica word-substitution CIPHER:
  * replica i rewrites a word w to a hash token iff md5("s<i>:"+w)
  * selects it (~40% of the vocabulary), with the replacement
  * md5-derived from (i, w) alone. Because the map depends only on the
  * WORD (never on position or doc), two documents in the same replica
  * share a rewritten shingle exactly when they shared the original —
  * within-replica Jaccard is preserved EXACTLY, so each replica
  * contributes the base corpus's duplicate structure unchanged and the
  * total near-dup pair count scales linearly in R. Across replicas,
  * ~40% of words differ, so a 3-gram shingle survives with p≈0.6³≈0.22
  * and cross-replica Jaccard lands ≈0.12 — far below the 0.5 dedup
  * threshold. An amplified corpus therefore behaves like a genuinely
  * LARGER corpus (more docs, same dup rate), not like one giant
  * duplicate cluster whose candidate pairs would blow up ∝R².
  *
  * All per-row work is codegen'd string/array expressions — the
  * amplifier itself scales like any map-side operator.
  */
object Amplify {

  /** doc_id/vec_id offset between replicas; must exceed the base id
    * range and stay divisible by common modulus choices (64, 100) so
    * id-derived sampling predicates keep firing per replica. */
  val IdStride: Long = 100_000_000L

  private def cipherWord(w: Column, i: Int): Column = {
    // ~40% selection: first md5 byte of a replica-salted hash < 103/256
    val sel = conv(substring(md5(concat(lit(s"s$i:"), w)), 1, 2), 16, 10) < 103
    when(sel, concat(lit("w"), substring(md5(concat(lit(s"r$i:"), w)), 1, 8)))
      .otherwise(w)
  }

  /** Replicate `documents`-shaped rows (doc_id, text, rest...) R×. */
  def docs(base: DataFrame, replicas: Int): DataFrame = {
    require(replicas >= 1, s"replicas must be >= 1, got $replicas")
    val rest = base.columns.filterNot(c => c == "doc_id" || c == "text").map(col)
    (0 until replicas).map { i =>
      if (i == 0) base
      else {
        val ciphered = array_join(
          transform(split(col("text"), " "), w => cipherWord(w, i)), " ")
        base.select(
          Seq((col("doc_id") + lit(i * IdStride)).as("doc_id"),
            ciphered.as("text")) ++ rest: _*)
      }
    }.reduce(_ unionByName _)
  }

  /** Deterministic per-(replica, dimension) offset in [-0.05, 0.05) —
    * literal arrays baked at plan-build time, same trick as the LSH
    * hyperplanes (`Similarity.hpVal`). */
  private def noiseVal(i: Int, d: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"e$i:$d".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
    (java.lang.Long.parseLong(hex, 16) % 1000) / 10000.0 - 0.05
  }

  /** Replicate `embeddings`-shaped rows (vec_id, embedding, rest...) R×:
    * replica i shifts every vector by a replica-specific constant offset
    * vector — neighborhood structure within a replica is preserved
    * (cosine changes smoothly), ids are disjoint, and the perturbation
    * is reproducible. */
  def embeddings(base: DataFrame, replicas: Int, dims: Int = 64): DataFrame = {
    require(replicas >= 1, s"replicas must be >= 1, got $replicas")
    val rest = base.columns.filterNot(c => c == "vec_id" || c == "embedding").map(col)
    (0 until replicas).map { i =>
      if (i == 0) base
      else {
        val noise = typedLit(Array.tabulate(dims)(d => noiseVal(i, d)))
        base.select(
          Seq((col("vec_id") + lit(i * IdStride)).as("vec_id"),
            zip_with(col("embedding"), noise,
              (x, nz) => (x + nz).cast("float")).as("embedding")) ++ rest: _*)
      }
    }.reduce(_ unionByName _)
  }
}
