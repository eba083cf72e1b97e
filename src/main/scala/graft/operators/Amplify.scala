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

  /** Replicate `events`-shaped rows (event_id, user_id, ts_ns, rest…)
    * R× with optional HOT-KEY skew: an md5-selected `hotFrac` of all
    * rows is reassigned to user_id 0 — the hot-user regime for the
    * per-user windows (q69/q78), where one window partition holds
    * `hotFrac` of the whole corpus and AQE's join-side skew handling
    * does not apply. ts_ns is shifted by 1 µs (1000 ns) per replica so
    * replicas never tie on (user, ts) EVEN AFTER the µs flooring that
    * `Events.asofJoinOf` applies (ts_ns DIV 1000) — a raw +i ns shift
    * would collapse back onto the same microsecond. */
  def events(base: DataFrame, replicas: Int, hotFrac: Double = 0.0): DataFrame = {
    require(replicas >= 1, s"replicas must be >= 1, got $replicas")
    require(hotFrac >= 0.0 && hotFrac < 1.0, s"hotFrac in [0,1), got $hotFrac")
    val rest = base.columns
      .filterNot(c => Seq("event_id", "user_id", "ts_ns").contains(c)).map(col)
    val hotCut = lit(math.round(hotFrac * 65536).max(0))
    (0 until replicas).map { i =>
      val hot = conv(substring(md5(concat(lit(s"h$i:"),
        col("event_id").cast("string"))), 1, 4), 16, 10) < hotCut
      base.select(Seq(
        (col("event_id") + lit(i * IdStride)).as("event_id"),
        when(hot, lit(0L))
          .otherwise(col("user_id") + lit(i * IdStride)).as("user_id"),
        (col("ts_ns") + lit(i.toLong * 1000L)).as("ts_ns")) ++ rest: _*)
    }.reduce(_ unionByName _)
  }

  /** A giant duplicate cluster: `size` docs with IDENTICAL text (the
    * first base doc's), ids above 2·IdStride — the worst-case hot LSH
    * bucket: all `size` docs share every (band, bucket) key, so pair
    * generation concentrates size² work on single join keys. */
  def giantDupCluster(base: DataFrame, size: Int): DataFrame = {
    require(size >= 1)
    val seed = base.orderBy("doc_id").select("text").limit(1)
    base.sparkSession.range(size)
      .select((col("id") + lit(2L * IdStride)).as("doc_id"))
      .crossJoin(broadcast(seed)) // single-row stat frame, broadcast
  }

  /** CLUSTERED vector generator — the regime the hierarchical coarse
    * quantizer is designed for, which the replicated corpus can't
    * produce (synthetic base embeddings are near-orthogonal, so pivot
    * similarities carry no signal; see SimilaritySpec's documented
    * agreement floor). Deterministic mixture of `centers` md5-seeded
    * centers arranged on a ring in the (e0, e1) plane:
    *
    *   angle(v)  = 2π·(vec_id mod centers)/centers        (its center)
    *             + jitter(vec_id)·(π/centers)/2           (±¼ spacing)
    *   vector(v) = [cos angle, sin angle,
    *                ±0.02 md5 noise in dims 2-9, 0…]
    *
    * Cosine between two vectors ≈ cos(Δangle): similarity is GRADED
    * across centers (near centers are similar, far ones aren't), which
    * is what makes a vector's nearest pivot predictive of its nearest
    * centroid — real text/image embeddings behave this way, orthogonal
    * clouds don't. Every value is md5-derived from vec_id alone, so
    * repeated runs see bit-identical data. */
  def clusteredVectors(spark: org.apache.spark.sql.SparkSession, n: Long,
                       centers: Int = 64, dims: Int = 64): DataFrame = {
    require(n >= 1 && centers >= 2 && dims >= 10)
    def md5Frac(salt: String): Column = // [0, 1) from md5(salt:vec_id)
      conv(substring(md5(concat(lit(s"$salt:"), col("vec_id").cast("string"))),
        1, 15), 16, 10).cast("double") / math.pow(16, 15)
    val spacing = 2 * math.Pi / centers
    val angle = pmod(col("vec_id"), lit(centers.toLong)).cast("double") * spacing +
      (md5Frac("j") - 0.5) * (spacing / 2)
    val comps: Seq[Column] =
      cos(angle) +: sin(angle) +:
        (2 until 10).map(d => (md5Frac(s"n$d") - 0.5) * 0.04) ++:
        Seq.fill(dims - 10)(lit(0.0))
    spark.range(n).select(col("id").as("vec_id"))
      .select(col("vec_id"), array(comps: _*).as("v"))
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
