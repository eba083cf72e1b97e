package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}

/** Similarity search over the `embeddings` table (64-dim float vectors):
  * brute-force cosine top-k as the exact baseline, and a random-
  * hyperplane LSH-bucketed variant as the scale path (SURVEY.md §2.6).
  *
  * Scale posture: brute force is O(queries × corpus) — fine for a bounded
  * query set against a broadcast query side, wrong for corpus × corpus.
  * The LSH variant hashes each vector once (per-row, map-side) into a
  * bucket; the candidate join is bucket-equality, so the shuffle carries
  * (bucket) groups instead of the cross product, and recall is tuned by
  * bits/tables. Hyperplanes are derived from md5 so the oracle can
  * reproduce them bit-for-bit; a production deployment would swap in a
  * broadcast matrix of real gaussian planes with the same plan shape.
  */
object Similarity {
  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  /** Queries = every 100th vector: a small probe set (broadcastable). */
  private val QueryFilter = "vec_id % 100 = 0"
  private val TopK = 5
  private val LshBits = 4

  /** q99 product-quantization geometry: 64 dims = [[PqM]] subspaces ×
    * [[PqSub]] dims, [[PqKs]] centroids per subspace (4-bit codes), seeds
    * drawn from every [[PqSeedStep]]-th vector (≥ PqKs at every SF). */
  private val PqM = 8
  private val PqSub = 8
  private val PqKs = 16
  private val PqSeedStep = 32

  /** q100 binary-quantization rerank depth: Hamming top-R candidates per
    * query survive to the exact-cosine rerank (R = 4×[[TopK]]). */
  private val BqR = 20

  /** Product-quantization artifacts over `n` = (vec_id, v: array<double>):
    * (codes = (vec_id, codes array<int>) — the 8-byte storage rows —
    * and dtab = (query_id, dt array<array<long>>) — per-query M×Ks
    * micro-unit distance tables). Encode is a broadcast-K join +
    * min_by partial agg (ties to the smallest k, matching the oracle's
    * row_number); shared by q99 and ScaleBench's pq measurement. */
  private[graft] def pqArtifacts(n: DataFrame,
      queryFilter: String = QueryFilter): (DataFrame, DataFrame) = {
    // one row per (vector, subspace); slice is 1-based like DuckDB's v[i]
    val sub = n.withColumn("m", explode(sequence(lit(0), lit(PqM - 1))))
      .select(col("vec_id"), col("m"),
        slice(col("v"), col("m") * PqSub + 1, lit(PqSub)).as("sv"))
    // Seed selection plans as TakeOrderedAndProject (orderBy+limit): every
    // partition forwards at most PqKs rows, no global window — and the
    // Ks·M centroid table (16×8 rows of 8 doubles) is driver-built and
    // broadcast, so encoding never re-scans the corpus for seeds.
    val seedRows = n.filter(col("vec_id") % PqSeedStep === 0)
      .orderBy("vec_id").limit(PqKs)
      .select(col("v")).collect() // bounded: ≤ PqKs rows by the limit
    val spark = n.sparkSession
    import spark.implicits._
    val cent = seedRows.zipWithIndex.flatMap { case (row, k) =>
      val v = row.getSeq[Double](0)
      (0 until PqM).map(m => (m, k, v.slice(m * PqSub, m * PqSub + PqSub)))
    }.toSeq.toDF("m", "k", "cv")
    def d2(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0d), (acc, x) => acc + x)
    val enc = sub.join(broadcast(cent), Seq("m"))
      .withColumn("_d2", d2(col("sv"), col("cv")))
      .groupBy(col("vec_id"), col("m"))
      .agg(min_by(col("k"), struct(col("_d2"), col("k"))).as("code"))
    val codes = enc.groupBy("vec_id").agg(
      transform(array_sort(collect_list(struct(col("m"), col("code")))),
        p => p.getField("code")).as("codes"))
    // per-query distance tables, micro-unit longs, nested dense [m][k]
    val dflat = sub.filter(expr(queryFilter))
      .select(col("vec_id").as("query_id"), col("m"), col("sv"))
      .join(broadcast(cent), Seq("m"))
      .withColumn("d2u",
        floor(d2(col("sv"), col("cv")) * 1e6 + 0.5).cast("long"))
    val dtab = dflat.groupBy("query_id", "m")
      .agg(transform(array_sort(collect_list(struct(col("k"), col("d2u")))),
        p => p.getField("d2u")).as("dk"))
      .groupBy("query_id")
      .agg(transform(array_sort(collect_list(struct(col("m"), col("dk")))),
        p => p.getField("dk")).as("dt"))
    (codes, dtab)
  }

  /** The ADC scan over [[pqArtifacts]] output: broadcast tables, eight
    * lookups per corpus row, exact long sum — map-side until the
    * per-query top-k window. The scorer defaults to the native
    * codegen'd `pq_adc` Expression (functions/PqAdc.scala): a fused int
    * loop in whole-stage codegen where the HOF chain
    * (aggregate∘zip_with∘element_at, `nativeScorer = false` — kept as
    * ScaleBench's comparison arm) interprets a lambda frame per
    * subspace per pair — this is the scan's hottest scalar. */
  private[graft] def pqScan(codes: DataFrame, dtab: DataFrame,
      nativeScorer: Boolean = true): DataFrame = {
    val score: Column =
      if (nativeScorer) expr("pq_adc(codes, dt)")
      else aggregate(
        zip_with(col("codes"), sequence(lit(0), lit(PqM - 1)), (c, mm) =>
          element_at(element_at(col("dt"), mm + 1), c + 1)),
        lit(0L), (acc, x) => acc + x)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("d2u").asc, col("neighbor_id"))
    codes.select(col("vec_id").as("neighbor_id"), col("codes"))
      .join(broadcast(dtab), col("neighbor_id") =!= col("query_id"))
      .withColumn("d2u", score)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= TopK)
  }

  private def asDouble: Column = transform(col("embedding"), x => x.cast("double"))

  /** Deterministic pseudo-random hyperplane component in [-1, 1):
    * plane j, dimension d ↦ ((int(md5("j:d")[0:15], 16) % 1000) / 500) - 1.
    * Same arithmetic on the DuckDB side; the Spark side bakes the values
    * into literal arrays at plan-build time (a broadcast plane matrix at
    * production scale) so no per-row md5 work happens. */
  private def hpVal(j: Int, d: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$j:$d".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % 1000 / 500.0 - 1
  }

  /** q87's projection width (64 → 16 dims, 4× smaller). */
  private[operators] val RpOut = 16

  /** Achlioptas ±1 sign for output dim `j`, input dim `i` — md5 parity,
    * so DuckDB reproduces the matrix from the same string (q87). */
  private[operators] def rpSign(j: Int, i: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"rp:$j:$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
    if (Integer.parseInt(hex.take(1), 16) % 2 == 0) 1.0 else -1.0
  }

  /** Random-projection map 64 → [[RpOut]] dims: y_j = Σ_i v_i·s(j,i) / √RpOut.
    * The sign matrix is a driver-side LITERAL (1024 doubles) folded into
    * codegen — zero hashing at runtime, map-only per row (q87 and any
    * reduce-before-ANN pipeline). */
  private[operators] def rpProject(v: Column): Column = {
    val scale = math.sqrt(RpOut)
    array((0 until RpOut).map { j =>
      val row = typedLit(Array.tabulate(Dims)(i => rpSign(j, i)))
      aggregate(zip_with(v, row, (x, p) => x * p),
        lit(0.0d), (acc, x) => acc + x) / scale
    }: _*)
  }

  /** Driver-side twin of [[rpProject]] for specs — same matrix, same
    * arithmetic, no Spark. */
  private[operators] def rpProjectLocal(v: Array[Double]): Array[Double] =
    Array.tabulate(RpOut)(j =>
      (0 until Dims).map(i => v(i) * rpSign(j, i)).sum / math.sqrt(RpOut))

  private val Dims = 64

  /** IVF coarse assignment: every vector to its nearest centroid, as a
    * broadcast-K map-side argmax via `max_by` (partial-agg combinable —
    * no corpus×centroid sort) with a deterministic tie-break (highest
    * cos_sim, then smallest c_id via -c_id in the ordering struct).
    * `vectors` = (vec_id, v: array<double>), `centroids` = (c_id,
    * cv: array<double>). localCheckpoint: every caller reads the
    * assignment from both sides of the probe self-join (or across
    * k-means rounds), so without pinning the whole quantization pass —
    * the expensive subtree — would execute twice; unlike persist() the
    * blocks are released once the frame is gone. */
  def ivfAssign(vectors: DataFrame, centroids: DataFrame): DataFrame =
    vectors.join(broadcast(centroids))
      .withColumn("_csim", expr("cosine_sim(v, cv)"))
      .groupBy(col("vec_id"))
      .agg(max_by(col("c_id"), struct(col("_csim"), -col("c_id"))).as("c_id"),
        first(col("v")).as("v"))
      .localCheckpoint(true)

  /** The inverted-list probe over an `ivfAssign` output: each query
    * vector scores ONLY its own cluster's list — the search join is
    * centroid-equality, never corpus×corpus. Shared verbatim by q54,
    * q76, and `ScaleBench` (the scale harness measures the exact
    * shipped plan, not a hand copy). */
  def ivfProbeOfAssigned(assign: DataFrame,
                         queryFilter: String = QueryFilter,
                         topK: Int = TopK): DataFrame = {
    val q = assign.filter(expr(queryFilter))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("c_id").as("cluster"))
    val c = assign.select(col("vec_id").as("neighbor_id"), col("v"),
      col("c_id").as("cluster"))
    val rk = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    q.join(c, Seq("cluster"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos_sim", expr("cosine_sim(qv, v)"))
      .withColumn("rk", row_number().over(rk).cast("long"))
      .filter(col("rk") <= topK)
      .select(col("query_id"), col("cluster"), col("rk"), col("neighbor_id"),
        round(col("cos_sim"), 6).as("cos_sim"))
      .orderBy("query_id", "rk")
  }

  /** Full IVF search: coarse assign + cluster probe. */
  def ivfProbeOf(vectors: DataFrame, centroids: DataFrame): DataFrame =
    ivfProbeOfAssigned(ivfAssign(vectors, centroids))

  /** Multi-probe IVF search (nprobe > 1): each query scores the
    * inverted lists of its `nprobe` NEAREST centroids, not just its
    * own cluster's — the classic recall fix for the quantization-
    * boundary problem (a query near a cell edge has true neighbors in
    * the adjacent cell, which single-probe silently loses; recall vs
    * the q33 brute-force ground truth is measured per P by
    * `ScaleBench`). Plan shape is unchanged from single-probe: the
    * query→top-P-centroid step is a broadcast(K) join + per-query
    * window over P·queries rows (queries are the small side by
    * construction), and the search join stays a cluster equi-join —
    * each neighbor belongs to exactly one cluster, so multi-probe
    * multiplies the QUERY side by P, never the corpus side, and no
    * candidate is scored twice. */
  def ivfProbeMulti(assign: DataFrame, centroids: DataFrame, nprobe: Int,
                    queryFilter: String = QueryFilter,
                    topK: Int = TopK): DataFrame = {
    val crk = Window.partitionBy(col("query_id"))
      .orderBy(col("_csim").desc, col("cluster"))
    val q = assign.filter(expr(queryFilter))
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
      .join(broadcast(centroids.select(col("c_id").as("cluster"), col("cv"))))
      .withColumn("_csim", expr("cosine_sim(qv, cv)"))
      .withColumn("crk", row_number().over(crk))
      .filter(col("crk") <= nprobe)
      .select(col("query_id"), col("qv"), col("cluster"))
    val c = assign.select(col("vec_id").as("neighbor_id"), col("v"),
      col("c_id").as("cluster"))
    val rk = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    q.join(c, Seq("cluster"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos_sim", expr("cosine_sim(qv, v)"))
      .withColumn("rk", row_number().over(rk).cast("long"))
      .filter(col("rk") <= topK)
      .select(col("query_id"), col("rk"), col("neighbor_id"),
        round(col("cos_sim"), 6).as("cos_sim"))
      .orderBy("query_id", "rk")
  }

  /** Multi-probe coarse ASSIGNMENT for the corpus side: one row per
    * (vector, probed cluster), probe ranks 1..nprobe, rank 1 ≡ the
    * `ivfAssign` home cluster. Unlike `ivfProbeMulti` — whose window
    * runs only over the SMALL query side — this expands every corpus
    * vector, so a row_number window would shuffle the N·K scored cross
    * product. Instead: nprobe sequential exclusion-argmax passes, each
    * the same broadcast-K join + partial-agg `max_by` as `ivfAssign`,
    * so every exchange carries N rows (one per vector) and P is a
    * small constant multiplier on map-side compute only. The tie-break
    * (cos DESC, c_id ASC) makes exclusion-argmax pass p identical to
    * the p-th `row_number` rank, which is how the DuckDB oracle
    * expresses it (q93). */
  def ivfAssignMulti(vectors: DataFrame, centroids: DataFrame,
                     nprobe: Int): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    var cur = vectors.select(col("vec_id"), col("v"),
      array().cast("array<long>").as("_probed"))
    val rounds = Seq.newBuilder[DataFrame]
    for (p <- 1 to nprobe) {
      val pass = cur.join(broadcast(centroids))
        .filter(!array_contains(col("_probed"), col("c_id")))
        .withColumn("_csim", expr("cosine_sim(v, cv)"))
        .groupBy(col("vec_id"))
        .agg(max_by(col("c_id"), struct(col("_csim"), -col("c_id"))).as("c_id"),
          first(col("v")).as("v"), first(col("_probed")).as("_probed"))
      // intermediate passes are read twice (as output and as the next
      // pass's input) — pin them; the last pass is read once
      val a = if (p < nprobe) pass.localCheckpoint(true) else pass
      rounds += a.select(col("vec_id"), lit(p).as("probe_rank"),
        col("c_id"), col("v"))
      cur = a.select(col("vec_id"), col("v"),
        concat(col("_probed"), array(col("c_id"))).as("_probed"))
    }
    rounds.result().reduce(_ unionByName _)
  }

  /** Two-level hierarchical coarse assignment — the flat `ivfAssign`
    * is O(N·K) dot products, which the 50× scaling measurement showed
    * dominating once K grows with the corpus; this drops per-vector
    * work to ~2√K: (1) √K level-1 pivots are hash-sampled FROM the
    * centroids and every centroid is exactly-assigned to its nearest
    * pivot (K·√K — centroids, not corpus); (2) each vector finds its
    * nearest pivot (√K dots) and then argmaxes only over that pivot's
    * ~√K child centroids. Both join sides are broadcast (K rows at
    * most) and all reduction is partial-agg `max_by` — same shuffle
    * shape as the flat assign, strictly less compute. The assignment
    * is APPROXIMATE in the classic hierarchical-ANN sense (the true
    * nearest centroid can live under a different pivot);
    * `SimilaritySpec` pins the measured exact-agreement floor, and the
    * probe layout/downstream plan are unchanged. */
  def ivfAssignHierarchical(vectors: DataFrame, centroids: DataFrame): DataFrame =
    ivfAssignHierarchicalPlan(vectors, centroids).localCheckpoint(true)

  /** Deterministic md5 sampling predicate over an id column — the
    * repo's portable hash idiom (bit-identical in DuckDB via
    * `('0x'||substr(md5(CAST(id AS VARCHAR)),1,15))::BIGINT % step`). */
  private def md5Sampled(id: Column, step: Long): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long"),
      lit(step)) === 0

  /** The level-1 pivot set: ~√K centroids hash-sampled from the
    * codebook, with a GUARANTEED-nonempty fallback — a hash sample has
    * no hit guarantee, and an empty pivot set would propagate an empty
    * assignment through every downstream operator (silently dropping
    * the whole corpus, the wrong-answer shape). The fallback (the
    * min-c_id centroid) keeps the operator total: one pivot = a flat
    * argmax, approximate in degree but never empty. Mirrored verbatim
    * in the q83 DuckDB oracle. */
  private[operators] def l1Pivots(centroids: DataFrame, step: Long): DataFrame = {
    val sampled = centroids.filter(md5Sampled(col("c_id"), step))
    val base = if (sampled.isEmpty) centroids.orderBy(col("c_id")).limit(1)
               else sampled
    base.select(col("c_id").as("l1_id"), col("cv").as("l1v"))
  }

  /** The un-checkpointed hierarchical-assign plan (exposed so specs can
    * assert its join shape — localCheckpoint executes eagerly and hides
    * the lineage). Output: (vec_id, l1_id, c_id, v). */
  private[operators] def ivfAssignHierarchicalPlan(
      vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val k = centroids.count()
    require(k > 0, "hierarchical IVF assign needs a non-empty codebook")
    val step = math.max(1L, math.round(math.sqrt(k.toDouble)))
    val l1 = l1Pivots(centroids, step)
    // exact parent for every centroid: K·√K, tiny
    val centWithParent = centroids.join(broadcast(l1))
      .withColumn("_psim", expr("cosine_sim(cv, l1v)"))
      .groupBy(col("c_id"))
      .agg(max_by(col("l1_id"), struct(col("_psim"), -col("l1_id"))).as("l1_id"),
        first(col("cv")).as("cv"))
    // vector → nearest pivot (√K dots per row)
    val vl1 = vectors.join(broadcast(l1))
      .withColumn("_psim", expr("cosine_sim(v, l1v)"))
      .groupBy(col("vec_id"))
      .agg(max_by(col("l1_id"), struct(col("_psim"), -col("l1_id"))).as("l1_id"),
        first(col("v")).as("v"))
    // vector → best centroid among its pivot's children (~√K dots);
    // l1_id is the group's single pivot, carried for the oracle gate
    vl1.join(broadcast(centWithParent), Seq("l1_id"))
      .withColumn("_csim", expr("cosine_sim(v, cv)"))
      .groupBy(col("vec_id"))
      .agg(first(col("l1_id")).as("l1_id"),
        max_by(col("c_id"), struct(col("_csim"), -col("c_id"))).as("c_id"),
        first(col("v")).as("v"))
  }

  private def hpSql(j: Int, d: String): String =
    s"(('0x'||substr(md5('$j:' || CAST($d AS VARCHAR)),1,15))::BIGINT % 1000) / 500.0 - 1"

  /** LSH bucket id: sign bits of the vector's dot product with
    * `LshBits` literal hyperplanes. Pure per-row expression — no shuffle. */
  private def bucket(v: Column): Column =
    (0 until LshBits).map { j =>
      val plane = typedLit(Array.tabulate(Dims)(d => hpVal(j, d)))
      val proj = aggregate(zip_with(v, plane, (x, p) => x * p),
        lit(0.0d), (acc, x) => acc + x)
      when(proj > 0, lit(1L << j)).otherwise(0L)
    }.reduce(_ + _)

  private val bucketSql: String = (0 until LshBits).map { j =>
    s"""CASE WHEN list_sum(list_transform(range(0, len(v)),
       |  d -> v[d + 1] * (${hpSql(j, "d")}))) > 0 THEN ${1L << j} ELSE 0 END"""
      .stripMargin.replace("\n", " ")
  }.mkString("(", " + ", ")")

  val defs: Seq[Q] = Seq(
    // ---- q33: brute-force cosine top-k (exact baseline) -----------------
    Q("q33_cosine_topk",
      s"""WITH e AS (SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |n AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label AS neighbor_label,
        |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos_sim,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_dot_product(q.v, c.v) / (q.nrm * c.nrm) DESC, c.vec_id) AS rk
        |  FROM n q JOIN n c ON c.vec_id <> q.vec_id
        |  WHERE q.$QueryFilter)
        |SELECT query_id, rk, neighbor_id, neighbor_label, round(cos_sim, 6) AS cos_sim
        |FROM scored WHERE rk <= $TopK
        |ORDER BY query_id, rk""".stripMargin) { (s, dir) =>
      val n = emb(s, dir).select(col("vec_id"), col("label"), asDouble.as("v"))
      val q = n.filter(expr(QueryFilter))
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
      broadcast(q)
        .join(n, col("vec_id") =!= col("query_id"))
        .withColumn("cos_sim", expr("cosine_sim(qv, v)"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= TopK)
        .select(col("query_id"), col("rk"), col("vec_id").as("neighbor_id"),
          col("label").as("neighbor_label"), round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy("query_id", "rk")
    },

    // ---- q34: LSH-bucketed ANN (the scale path) -------------------------
    Q("q34_ann_lsh",
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
        |             CAST($bucketSql AS BIGINT) AS bucket FROM e),
        |scored AS (
        |  SELECT q.vec_id AS query_id, q.bucket, c.vec_id AS neighbor_id,
        |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos_sim,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_dot_product(q.v, c.v) / (q.nrm * c.nrm) DESC, c.vec_id) AS rk
        |  FROM n q JOIN n c ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
        |  WHERE q.$QueryFilter)
        |SELECT query_id, bucket, rk, neighbor_id, round(cos_sim, 6) AS cos_sim
        |FROM scored WHERE rk <= $TopK
        |ORDER BY query_id, rk""".stripMargin) { (s, dir) =>
      val n = emb(s, dir).select(col("vec_id"), asDouble.as("v"))
        .withColumn("bucket", bucket(col("v")))
      val q = n.filter(expr(QueryFilter))
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("bucket"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos_sim").desc, col("neighbor_id"))
      val c = n.select(col("vec_id").as("neighbor_id"), col("v"), col("bucket"))
      q.join(c, Seq("bucket"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("cos_sim", expr("cosine_sim(qv, v)"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= TopK)
        .select(col("query_id"), col("bucket"), col("rk"), col("neighbor_id"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy("query_id", "rk")
    },

    // ---- q54: IVF-style ANN (coarse quantizer + cluster probe) ----------
    // Inverted-file layout: a deterministic coarse codebook (every 64th
    // vector — production would train k-means, same plan shape), every
    // vector assigned to its nearest centroid (one broadcast pass), and a
    // query probes ONLY its own cluster's inverted list. The search join
    // is centroid-equality — the other classic ANN layout next to
    // hyperplane LSH (q34).
    Q("q54_ann_ivf",
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |cent AS (SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM n WHERE vec_id % 64 = 0),
        |assign AS (
        |  SELECT vec_id, v, nrm, c_id FROM (
        |    SELECT n.vec_id, n.v, n.nrm, cent.c_id,
        |      row_number() OVER (PARTITION BY n.vec_id
        |        ORDER BY list_dot_product(n.v, cent.cv) / (n.nrm * cent.cn) DESC, cent.c_id) AS crk
        |    FROM n, cent) WHERE crk = 1),
        |scored AS (
        |  SELECT q.vec_id AS query_id, q.c_id AS cluster, c.vec_id AS neighbor_id,
        |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos_sim,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_dot_product(q.v, c.v) / (q.nrm * c.nrm) DESC, c.vec_id) AS rk
        |  FROM assign q JOIN assign c ON c.c_id = q.c_id AND c.vec_id <> q.vec_id
        |  WHERE q.$QueryFilter)
        |SELECT query_id, cluster, rk, neighbor_id, round(cos_sim, 6) AS cos_sim
        |FROM scored WHERE rk <= $TopK
        |ORDER BY query_id, rk""".stripMargin) { (s, dir) =>
      val n = emb(s, dir).select(col("vec_id"), asDouble.as("v"))
      val cent = n.filter(col("vec_id") % 64 === 0)
        .select(col("vec_id").as("c_id"), col("v").as("cv"))
      ivfProbeOf(n, cent)
    },

    // ---- q76: IVF with a TRAINED codebook (k-means) ---------------------
    // q54's md5-derived codebook proves the probe plan shape; real vector
    // pipelines train centroids. Spherical k-means, Lloyd's iterations
    // with FIXED seed and FIXED round count so the oracle can recompute
    // training exactly: seed centroids = every 64th vector (q54's seed),
    // two assign→mean rounds, then the same inverted-list top-k probe.
    // Centroid means are rounded to 6 dp each round — double summation
    // order differs between engines in the low bits (~1e-13), and the
    // rounding pins both to identical codebooks before the next assign.
    // Empty clusters drop naturally (no mean row) on both engines.
    // Scale posture: each assign is a broadcast(K centroids) map-side
    // argmax via max_by (partial-agg combinable); each update is one
    // shuffle on (c_id, dim) — K·dims rows out. Training touches the
    // corpus 2R+1 times with NO corpus×corpus join anywhere; the probe
    // is q54's cluster-equi-join.
    Q("q76_ivf_trained",
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |c0 AS (SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM n WHERE vec_id % 64 = 0),
        |dims AS (SELECT unnest(range(1, $Dims + 1)) AS i),
        |a1 AS (SELECT vec_id, v, nrm, c_id FROM (
        |  SELECT n.vec_id, n.v, n.nrm, c0.c_id,
        |    row_number() OVER (PARTITION BY n.vec_id
        |      ORDER BY list_dot_product(n.v, c0.cv) / (n.nrm * c0.cn) DESC, c0.c_id) AS crk
        |  FROM n, c0) WHERE crk = 1),
        |c1 AS (SELECT c_id, list(m ORDER BY i) AS cv FROM (
        |  SELECT a.c_id, d.i, round(avg(a.v[d.i]), 6) AS m
        |  FROM a1 a, dims d GROUP BY a.c_id, d.i) GROUP BY c_id),
        |c1n AS (SELECT c_id, cv, sqrt(list_dot_product(cv, cv)) AS cn FROM c1),
        |a2 AS (SELECT vec_id, v, nrm, c_id FROM (
        |  SELECT n.vec_id, n.v, n.nrm, c1n.c_id,
        |    row_number() OVER (PARTITION BY n.vec_id
        |      ORDER BY list_dot_product(n.v, c1n.cv) / (n.nrm * c1n.cn) DESC, c1n.c_id) AS crk
        |  FROM n, c1n) WHERE crk = 1),
        |c2 AS (SELECT c_id, list(m ORDER BY i) AS cv FROM (
        |  SELECT a.c_id, d.i, round(avg(a.v[d.i]), 6) AS m
        |  FROM a2 a, dims d GROUP BY a.c_id, d.i) GROUP BY c_id),
        |c2n AS (SELECT c_id, cv, sqrt(list_dot_product(cv, cv)) AS cn FROM c2),
        |af AS (SELECT vec_id, v, nrm, c_id FROM (
        |  SELECT n.vec_id, n.v, n.nrm, c2n.c_id,
        |    row_number() OVER (PARTITION BY n.vec_id
        |      ORDER BY list_dot_product(n.v, c2n.cv) / (n.nrm * c2n.cn) DESC, c2n.c_id) AS crk
        |  FROM n, c2n) WHERE crk = 1),
        |scored AS (
        |  SELECT q.vec_id AS query_id, q.c_id AS cluster, c.vec_id AS neighbor_id,
        |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos_sim,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_dot_product(q.v, c.v) / (q.nrm * c.nrm) DESC, c.vec_id) AS rk
        |  FROM af q JOIN af c ON c.c_id = q.c_id AND c.vec_id <> q.vec_id
        |  WHERE q.$QueryFilter)
        |SELECT query_id, cluster, rk, neighbor_id, round(cos_sim, 6) AS cos_sim
        |FROM scored WHERE rk <= $TopK
        |ORDER BY query_id, rk""".stripMargin) { (s, dir) =>
      val n = emb(s, dir).select(col("vec_id"), asDouble.as("v"))
      // Lloyd's update: elementwise mean over the cluster, one shuffle on
      // (c_id, dim); posexplode is 0-based vs the oracle's 1-based v[i],
      // but both orderings reassemble the same dimension sequence
      def centUpdate(asg: DataFrame): DataFrame =
        asg.select(col("c_id"), posexplode(col("v")).as(Seq("pos", "x")))
          .groupBy("c_id", "pos").agg(round(avg("x"), 6).as("m"))
          .groupBy("c_id")
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
            p => p.getField("m")).as("cv"))
      val c0 = n.filter(col("vec_id") % 64 === 0)
        .select(col("vec_id").as("c_id"), col("v").as("cv"))
      // pin each codebook: K rows, but read by the NEXT full-corpus
      // assign (ivfAssign pins its output itself) — without pinning
      // every round recomputes all prior rounds
      val c1 = centUpdate(ivfAssign(n, c0)).localCheckpoint(true)
      val c2 = centUpdate(ivfAssign(n, c1)).localCheckpoint(true)
      // final assignment feeds both sides of the probe self-join
      ivfProbeOfAssigned(ivfAssign(n, c2))
    },

    // ---- q79: semantic dedup (SemDeDup-style) ---------------------------
    // Embedding-space deduplication: cluster with the coarse IVF
    // codebook (the shared ivfAssign — one broadcast argmax pass), then
    // compare ONLY within-cluster pairs and drop the higher vec_id of
    // every pair above the cosine threshold. The cluster equi-join is
    // what makes this corpus-scale: candidate pairs are Σ|cluster|²,
    // never corpus² — the same bound SemDeDup exploits at web scale.
    // τ=0.4 is corpus-relative: these synthetic embeddings are
    // near-orthogonal (max within-cluster cosine ≈0.48); real text
    // embeddings concentrate near 1 and use τ≈0.95+ — the parameter
    // moves, the plan does not. Output: each dropped vector, its lowest
    // surviving partner, and its best within-cluster similarity.
    Q("q79_semantic_dedup",
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |cent AS (SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM n WHERE vec_id % 64 = 0),
        |assign AS (
        |  SELECT vec_id, v, nrm, c_id FROM (
        |    SELECT n.vec_id, n.v, n.nrm, cent.c_id,
        |      row_number() OVER (PARTITION BY n.vec_id
        |        ORDER BY list_dot_product(n.v, cent.cv) / (n.nrm * cent.cn) DESC, cent.c_id) AS crk
        |    FROM n, cent) WHERE crk = 1),
        |p AS (
        |  SELECT a.vec_id AS i, b.vec_id AS j,
        |    list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cs
        |  FROM assign a JOIN assign b ON a.c_id = b.c_id AND a.vec_id < b.vec_id
        |  WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.4)
        |SELECT j AS vec_id, min(i) AS kept_id, round(max(cs), 6) AS max_cos
        |FROM p GROUP BY j ORDER BY vec_id""".stripMargin) { (s, dir) =>
      val n = emb(s, dir).select(col("vec_id"), asDouble.as("v"))
      val cent = n.filter(col("vec_id") % 64 === 0)
        .select(col("vec_id").as("c_id"), col("v").as("cv"))
      val assign = ivfAssign(n, cent)
      val a = assign.select(col("c_id"), col("vec_id").as("i"), col("v").as("vi"))
      val b = assign.select(col("c_id"), col("vec_id").as("j"), col("v").as("vj"))
      a.join(b, Seq("c_id")).filter(col("i") < col("j"))
        .withColumn("cs", expr("cosine_sim(vi, vj)"))
        .filter(col("cs") >= 0.4)
        .groupBy("j")
        .agg(min("i").as("kept_id"), round(max("cs"), 6).as("max_cos"))
        .select(col("j").as("vec_id"), col("kept_id"), col("max_cos"))
        .orderBy("vec_id")
    },

    // ---- q84: multi-probe IVF ANN (nprobe=2, oracle-gated) --------------
    // q54 probes only the query's own cluster, silently losing true
    // neighbors across quantization-cell boundaries; q84 is the
    // production fix — each query scores its 2 nearest centroids' lists.
    // Same equi-join plan (see ivfProbeMulti); recall@k vs q33 ground
    // truth at P=1/2/4 is measured by ScaleBench (SCALING_LOCAL.json
    // `ann_recall`).
    Q("q84_ann_ivf_multiprobe",
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |cent AS (SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM n WHERE vec_id % 64 = 0),
        |assign AS (
        |  SELECT vec_id, v, nrm, c_id FROM (
        |    SELECT n.vec_id, n.v, n.nrm, cent.c_id,
        |      row_number() OVER (PARTITION BY n.vec_id
        |        ORDER BY list_dot_product(n.v, cent.cv) / (n.nrm * cent.cn) DESC, cent.c_id) AS crk
        |    FROM n, cent) WHERE crk = 1),
        |qp AS (
        |  SELECT query_id, qv, qnrm, cluster FROM (
        |    SELECT a.vec_id AS query_id, a.v AS qv, a.nrm AS qnrm, cent.c_id AS cluster,
        |      row_number() OVER (PARTITION BY a.vec_id
        |        ORDER BY list_dot_product(a.v, cent.cv) / (a.nrm * cent.cn) DESC, cent.c_id) AS crk
        |    FROM assign a, cent WHERE a.$QueryFilter) WHERE crk <= 2),
        |scored AS (
        |  SELECT qp.query_id, c.vec_id AS neighbor_id,
        |    list_dot_product(qp.qv, c.v) / (qp.qnrm * c.nrm) AS cos_sim,
        |    row_number() OVER (PARTITION BY qp.query_id
        |      ORDER BY list_dot_product(qp.qv, c.v) / (qp.qnrm * c.nrm) DESC, c.vec_id) AS rk
        |  FROM qp JOIN assign c ON c.c_id = qp.cluster AND c.vec_id <> qp.query_id)
        |SELECT query_id, rk, neighbor_id, round(cos_sim, 6) AS cos_sim
        |FROM scored WHERE rk <= $TopK
        |ORDER BY query_id, rk""".stripMargin) { (s, dir) =>
      val n = emb(s, dir).select(col("vec_id"), asDouble.as("v"))
      val cent = n.filter(col("vec_id") % 64 === 0)
        .select(col("vec_id").as("c_id"), col("v").as("cv"))
      ivfProbeMulti(ivfAssign(n, cent), cent, nprobe = 2)
    },

    // ---- q93: multi-probe semantic dedup (SemDeDup × nprobe=2) ----------
    // q79's one remaining recall gap: a near-duplicate pair that
    // straddles a quantization-cell boundary is never compared, because
    // single-probe only pairs vectors sharing a HOME cluster. Here every
    // vector also probes its 2nd-nearest centroid's list
    // (ivfAssignMulti — N-row exchanges, never the N·K window), and a
    // pair is compared when either member's probe set covers the
    // other's home cluster. The search join stays a cluster equi-join
    // (candidates Σ|cluster|²·P, never corpus²), and the final groupBy
    // is duplicate-insensitive (min/max), so the same unordered pair
    // surfacing through two probe paths needs no pre-distinct. Output
    // schema matches q79; rows are a superset (boundary pairs found).
    Q("q93_semdedup_multiprobe",
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |cent AS (SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM n WHERE vec_id % 64 = 0),
        |probe AS (
        |  SELECT vec_id, v, nrm, c_id, crk FROM (
        |    SELECT n.vec_id, n.v, n.nrm, cent.c_id,
        |      row_number() OVER (PARTITION BY n.vec_id
        |        ORDER BY list_dot_product(n.v, cent.cv) / (n.nrm * cent.cn) DESC, cent.c_id) AS crk
        |    FROM n, cent) WHERE crk <= 2),
        |home AS (SELECT vec_id, v, nrm, c_id FROM probe WHERE crk = 1),
        |p AS (
        |  SELECT least(a.vec_id, b.vec_id) AS i, greatest(a.vec_id, b.vec_id) AS j,
        |    list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cs
        |  FROM probe a JOIN home b ON a.c_id = b.c_id AND a.vec_id <> b.vec_id
        |  WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.4)
        |SELECT j AS vec_id, min(i) AS kept_id, round(max(cs), 6) AS max_cos
        |FROM p GROUP BY j ORDER BY vec_id""".stripMargin) { (s, dir) =>
      val n = emb(s, dir).select(col("vec_id"), asDouble.as("v"))
      val cent = n.filter(col("vec_id") % 64 === 0)
        .select(col("vec_id").as("c_id"), col("v").as("cv"))
      val probes = ivfAssignMulti(n, cent, nprobe = 2).localCheckpoint(true)
      val a = probes.select(col("c_id"), col("vec_id").as("pi"),
        col("v").as("vi"))
      val b = probes.filter(col("probe_rank") === 1)
        .select(col("c_id"), col("vec_id").as("pj"), col("v").as("vj"))
      a.join(b, Seq("c_id")).filter(col("pi") =!= col("pj"))
        .withColumn("cs", expr("cosine_sim(vi, vj)"))
        .filter(col("cs") >= 0.4)
        .select(least(col("pi"), col("pj")).as("i"),
          greatest(col("pi"), col("pj")).as("j"), col("cs"))
        .groupBy("j")
        .agg(min("i").as("kept_id"), round(max("cs"), 6).as("max_cos"))
        .select(col("j").as("vec_id"), col("kept_id"), col("max_cos"))
        .orderBy("vec_id")
    },

    // ---- q83: hierarchical two-level IVF assignment (oracle-gated) ------
    // The two-level coarse quantizer (ivfAssignHierarchical) expressed
    // end-to-end against a DuckDB oracle: √K md5-sampled pivots (with
    // the guaranteed-nonempty min-c_id fallback), exact centroid→pivot
    // parents, vector→pivot argmax, then vector→child-centroid argmax —
    // every tie broken (cos DESC, id ASC) identically on both engines.
    // This is the gate the operator lacked while spec-only: the full
    // assignment (vec_id, l1_id, c_id) is hash-compared, so an empty
    // pivot sample or a drifted argmax can't hide.
    Q("q83_ann_ivf_hierarchical", {
      val md5Int = (c: String) => s"('0x'||substr(md5(CAST($c AS VARCHAR)),1,15))::BIGINT"
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |cent AS (SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM n WHERE vec_id % 64 = 0),
        |st AS (SELECT greatest(1, CAST(round(sqrt(count(*))) AS BIGINT)) AS step FROM cent),
        |l1s AS (SELECT c_id AS l1_id, cv AS l1v, cn AS l1n FROM cent, st
        |        WHERE ${md5Int("c_id")} % step = 0),
        |l1 AS (SELECT * FROM l1s UNION ALL
        |       SELECT c_id, cv, cn FROM cent
        |       WHERE c_id = (SELECT min(c_id) FROM cent)
        |         AND NOT EXISTS (SELECT 1 FROM l1s)),
        |cp AS (SELECT c_id, cv, cn, l1_id FROM (
        |  SELECT cent.c_id, cent.cv, cent.cn, l1.l1_id,
        |    row_number() OVER (PARTITION BY cent.c_id
        |      ORDER BY list_dot_product(cent.cv, l1.l1v) / (cent.cn * l1.l1n) DESC, l1.l1_id) AS rk
        |  FROM cent, l1) WHERE rk = 1),
        |vl1 AS (SELECT vec_id, v, nrm, l1_id FROM (
        |  SELECT n.vec_id, n.v, n.nrm, l1.l1_id,
        |    row_number() OVER (PARTITION BY n.vec_id
        |      ORDER BY list_dot_product(n.v, l1.l1v) / (n.nrm * l1.l1n) DESC, l1.l1_id) AS rk
        |  FROM n, l1) WHERE rk = 1),
        |af AS (SELECT vec_id, l1_id, c_id FROM (
        |  SELECT vl1.vec_id, vl1.l1_id, cp.c_id,
        |    row_number() OVER (PARTITION BY vl1.vec_id
        |      ORDER BY list_dot_product(vl1.v, cp.cv) / (vl1.nrm * cp.cn) DESC, cp.c_id) AS rk
        |  FROM vl1 JOIN cp ON cp.l1_id = vl1.l1_id) WHERE rk = 1)
        |SELECT vec_id, l1_id, c_id FROM af ORDER BY vec_id""".stripMargin
    }) { (s, dir) =>
      val n = emb(s, dir).select(col("vec_id"), asDouble.as("v"))
      val cent = n.filter(col("vec_id") % 64 === 0)
        .select(col("vec_id").as("c_id"), col("v").as("cv"))
      ivfAssignHierarchicalPlan(n, cent)
        .select("vec_id", "l1_id", "c_id")
        .orderBy("vec_id")
    },

    // ---- q64: int8 embedding quantization -------------------------------
    // Symmetric per-vector int8 quantization (the storage/serving format
    // for billion-vector indexes: 4× smaller than fp32, SIMD-dot-product
    // friendly): scale = 127/max|v_i|, q_i = floor(v_i·scale), plus the
    // per-vector reconstruction L1 error as the quality control column.
    // floor (not round-half-*) keeps the arithmetic bit-identical across
    // engines; production round-to-nearest-even is a one-line swap with
    // the same plan. Pure per-row HOF expressions — zero shuffle before
    // the presentation sort; the error fold runs left-to-right on both
    // engines so the double accumulation is order-identical.
    Q("q64_embedding_quantize",
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS amax FROM e),
        |sc AS (SELECT vec_id, v, CASE WHEN amax = 0 THEN 0.0 ELSE 127.0 / amax END AS scale FROM m),
        |qz AS (SELECT vec_id, v, scale,
        |         list_transform(v, x -> CAST(floor(x * scale) AS INTEGER)) AS qvec
        |       FROM sc)
        |SELECT vec_id, round(scale, 6) AS scale,
        |  array_to_string(qvec, ',') AS qvec_csv,
        |  round(CASE WHEN scale = 0 THEN 0.0 ELSE
        |    list_sum(list_transform(range(1, len(v) + 1),
        |      i -> abs(qvec[i] / scale - v[i]))) / len(v) END, 6) AS l1_err
        |FROM qz ORDER BY vec_id""".stripMargin) { (s, dir) =>
      val amax = array_max(transform(col("v"), x => abs(x)))
      val qvec = transform(col("v"), x => floor(x * col("scale")).cast("int"))
      val err = aggregate(
        zip_with(col("qvec"), col("v"), (q, x) => abs(q / col("scale") - x)),
        lit(0.0d), (acc, x) => acc + x) / size(col("v"))
      emb(s, dir)
        .select(col("vec_id"), asDouble.as("v"))
        .withColumn("amax", amax)
        .withColumn("scale",
          when(col("amax") === 0, lit(0.0)).otherwise(lit(127.0) / col("amax")))
        .withColumn("qvec", qvec)
        // The driver's correctness harness hashes via pandas sort, which
        // rejects raw ARRAY cells — serialize the vector to CSV text on
        // both sides (array_join here == DuckDB array_to_string).
        .select(col("vec_id"), round(col("scale"), 6).as("scale"),
          array_join(transform(col("qvec"), _.cast("string")), ",").as("qvec_csv"),
          round(when(col("scale") === 0, lit(0.0)).otherwise(err), 6).as("l1_err"))
        .orderBy("vec_id")
    },

    // ---- q87: random-projection dimensionality reduction -----------------
    // Johnson-Lindenstrauss reduction before ANN: project 64-dim
    // embeddings onto 16 Achlioptas ±1 directions (y_j = <v, s_j>/√16) —
    // the standard cheap pre-index step that cuts every downstream
    // distance computation and index byte 4×, at a bounded cosine
    // distortion the spec measures. The sign matrix is md5-parity-seeded
    // so DuckDB rebuilds it from the same strings, but on the Spark side
    // it is a driver-side LITERAL folded into whole-stage codegen — the
    // executor hashes NOTHING and the operator is map-only (the 100 TB
    // plan is scan → project → sort, no exchange but the presentation
    // sort). Output is exploded to (vec_id, dim, y) scalar rows for the
    // driver's pandas hash (q64's array-cell lesson).
    Q("q87_random_projection",
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |p AS (SELECT e.vec_id, j.j AS dim,
        |        round(list_sum(list_transform(range(0, 64), i ->
        |          e.v[i + 1] * (CASE WHEN (('0x' || substr(md5('rp:' || CAST(j.j AS VARCHAR)
        |                 || ':' || CAST(i AS VARCHAR)), 1, 1))::BIGINT) % 2 = 0
        |            THEN 1.0 ELSE -1.0 END))) / 4.0, 6) AS y
        |      FROM e, (SELECT unnest(range(0, 16)) AS j) j)
        |SELECT vec_id, CAST(dim AS INT) AS dim, y FROM p
        |ORDER BY vec_id, dim""".stripMargin) { (s, dir) =>
      emb(s, dir).select(col("vec_id"), asDouble.as("v"))
        .select(col("vec_id"),
          posexplode(transform(rpProject(col("v")), y => round(y, 6))))
        .select(col("vec_id"), col("pos").cast("int").as("dim"), col("col").as("y"))
        .orderBy("vec_id", "dim")
    },

    // ---- q99: product quantization + ADC scan ---------------------------
    // The memory path past int8 (q64): split the 64-dim vector into
    // M=8 subspaces of 8 dims, learn Ks=16 centroids per subspace
    // (seeded deterministically — the 16 smallest vec_id % 32 = 0
    // vectors' subvectors; q76 shows how Lloyd refinement would pin
    // rounds), and store each vector as 8 four-bit codes: 8 bytes
    // instead of 256 — a 100 TB embedding corpus becomes ~3 TB of
    // codes. Search is the classic ADC scan: each query precomputes an
    // M×Ks table of subspace L2² distances to every centroid, and a
    // corpus row's approximate distance is EIGHT TABLE LOOKUPS — no
    // per-pair float math at all. Plan shape: encode is a broadcast-K
    // join + partial-agg min_by (N·M rows through one exchange, same
    // shape as ivfAssign); the scan joins the corpus codes against the
    // BROADCAST per-query tables (Q·M·Ks longs) and sums lookups
    // map-side, so the only corpus-sized exchange is the per-query
    // top-k window — identical to the q33 baseline it replaces.
    // Determinism: distance-table entries are quantized to integer
    // MICRO-UNITS (floor(d2·1e6 + 0.5) as long) so the cross-subspace
    // sum is exact integer arithmetic — engine-independent regardless
    // of addition order; the raw d2 doubles feeding floor() are
    // left-to-right folds of identical inputs on both engines.
    Q("q99_pq_adc",
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |ms AS (SELECT unnest(range(0, $PqM)) AS m),
        |seeds AS (SELECT v, rk FROM (
        |  SELECT v, row_number() OVER (ORDER BY vec_id) AS rk
        |  FROM e WHERE vec_id % $PqSeedStep = 0) WHERE rk <= $PqKs),
        |cent AS (SELECT ms.m, CAST(s.rk - 1 AS INT) AS k,
        |    list_transform(range(1, ${PqSub + 1}), i -> s.v[ms.m * $PqSub + i]) AS cv
        |  FROM seeds s, ms),
        |sub AS (SELECT e.vec_id, ms.m,
        |    list_transform(range(1, ${PqSub + 1}), i -> e.v[ms.m * $PqSub + i]) AS sv
        |  FROM e, ms),
        |enc AS (SELECT vec_id, m, k FROM (
        |  SELECT sub.vec_id, sub.m, cent.k,
        |    row_number() OVER (PARTITION BY sub.vec_id, sub.m
        |      ORDER BY list_sum(list_transform(range(0, $PqSub),
        |        i -> (sv[i + 1] - cv[i + 1]) * (sv[i + 1] - cv[i + 1]))) ASC,
        |        cent.k) AS rr
        |  FROM sub JOIN cent ON cent.m = sub.m) WHERE rr = 1),
        |dtab AS (SELECT q.vec_id AS query_id, c.m, c.k,
        |    CAST(floor(list_sum(list_transform(range(0, $PqSub),
        |      i -> (q.sv[i + 1] - c.cv[i + 1]) * (q.sv[i + 1] - c.cv[i + 1])))
        |      * 1000000 + 0.5) AS BIGINT) AS d2u
        |  FROM sub q JOIN cent c ON c.m = q.m WHERE q.$QueryFilter),
        |scored AS (SELECT d.query_id, enc.vec_id AS neighbor_id,
        |    CAST(sum(d.d2u) AS BIGINT) AS d2u
        |  FROM enc JOIN dtab d ON d.m = enc.m AND d.k = enc.k
        |  WHERE enc.vec_id <> d.query_id
        |  GROUP BY d.query_id, enc.vec_id),
        |ranked AS (SELECT query_id, neighbor_id, d2u,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY d2u ASC, neighbor_id) AS rk
        |  FROM scored)
        |SELECT query_id, rk, neighbor_id, round(d2u / 1000000.0, 6) AS approx_d2
        |FROM ranked WHERE rk <= $TopK
        |ORDER BY query_id, rk""".stripMargin) { (s, dir) =>
      val n = emb(s, dir).select(col("vec_id"), asDouble.as("v"))
      val (codes, dtab) = pqArtifacts(n)
      pqScan(codes, dtab)
        .select(col("query_id"), col("rk"), col("neighbor_id"),
          round(col("d2u") / 1e6, 6).as("approx_d2"))
        .orderBy("query_id", "rk")
    },

    // ---- q100: binary sign quantization + exact rerank ------------------
    // The cheapest vector signature there is: one SIGN BIT per
    // dimension — 64 dims pack into two 32-bit halves (8 bytes, same
    // footprint as q99's codes, zero training). Candidate generation
    // is Hamming distance over the packed words: two XORs + two
    // popcounts per pair, integer-only — the form a columnar scan
    // vectorizes to ~1 ns/pair, which is why binary prefilter + exact
    // rerank is the standard serving layout for billion-vector
    // corpora. Per query: Hamming top-R (R=$BqR) over the signature
    // scan, THEN fetch only those R full vectors and rerank by exact
    // cosine for the final top-k — the corpus-sized stage touches
    // 8-byte signatures; 64-dim floats are read for R rows per query.
    // Determinism: Hamming is integer; packing uses power-of-two
    // doubles (exact to 2^31) cast to long identically on both
    // engines; ties broken by neighbor_id at BOTH windows.
    Q("q100_binary_quant_rerank",
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |b AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
        |    CAST(list_sum(list_transform(range(0, 32), i ->
        |      CASE WHEN v[i + 1] > 0 THEN CAST(power(2.0, i) AS BIGINT)
        |           ELSE 0 END)) AS BIGINT) AS b1,
        |    CAST(list_sum(list_transform(range(32, 64), i ->
        |      CASE WHEN v[i + 1] > 0 THEN CAST(power(2.0, i - 32) AS BIGINT)
        |           ELSE 0 END)) AS BIGINT) AS b2
        |  FROM e),
        |h AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    bit_count(xor(q.b1, c.b1)) + bit_count(xor(q.b2, c.b2)) AS hamming
        |  FROM b q JOIN b c ON c.vec_id <> q.vec_id
        |  WHERE q.$QueryFilter),
        |cand AS (SELECT query_id, neighbor_id, hamming,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY hamming ASC, neighbor_id) AS hrk
        |  FROM h),
        |rr AS (SELECT c.query_id, c.neighbor_id, c.hamming,
        |    list_dot_product(q.v, n.v) / (q.nrm * n.nrm) AS cos_sim
        |  FROM cand c
        |  JOIN b q ON q.vec_id = c.query_id
        |  JOIN b n ON n.vec_id = c.neighbor_id
        |  WHERE c.hrk <= $BqR),
        |ranked AS (SELECT query_id, neighbor_id, hamming, cos_sim,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos_sim DESC, neighbor_id) AS rk
        |  FROM rr)
        |SELECT query_id, rk, neighbor_id, CAST(hamming AS INT) AS hamming,
        |  round(cos_sim, 6) AS cos_sim
        |FROM ranked WHERE rk <= $TopK
        |ORDER BY query_id, rk""".stripMargin) { (s, dir) =>
      val n = emb(s, dir).select(col("vec_id"), asDouble.as("v"))
      // sign-pack 32 dims starting at `off` into one long: bit i set iff
      // v[off+i] > 0. power-of-two doubles are exact to 2^31, so the
      // cast-to-long sum is the identical integer on both engines.
      def packBits(off: Int): Column = aggregate(
        zip_with(slice(col("v"), off + 1, 32), sequence(lit(0), lit(31)),
          (x, i) => when(x > 0, pow(lit(2.0d), i).cast("long"))
            .otherwise(lit(0L))),
        lit(0L), (acc, x) => acc + x)
      val b = n.select(col("vec_id"), col("v"),
        packBits(0).as("b1"), packBits(32).as("b2"))
      // the corpus-sized scan carries ONLY (vec_id, b1, b2) — 8 signature
      // bytes per row; full 64-float vectors never enter the Hamming stage
      val sig = b.select(col("vec_id"), col("b1"), col("b2"))
      val qs = b.filter(expr(QueryFilter))
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("b1").as("qb1"), col("b2").as("qb2"))
      val hw = Window.partitionBy(col("query_id"))
        .orderBy(col("hamming").asc, col("neighbor_id"))
      val cand = sig.withColumnRenamed("vec_id", "neighbor_id")
        .join(broadcast(qs.select(col("query_id"), col("qb1"), col("qb2"))),
          col("neighbor_id") =!= col("query_id"))
        .withColumn("hamming",
          bit_count(col("qb1").bitwiseXOR(col("b1"))) +
            bit_count(col("qb2").bitwiseXOR(col("b2"))))
        .withColumn("hrk", row_number().over(hw))
        .filter(col("hrk") <= BqR)
        .select(col("query_id"), col("neighbor_id"), col("hamming"))
      // rerank: only Q×R candidate rows fetch their full vector (equi-join
      // against the broadcast candidate list), then exact cosine top-k
      val rw = Window.partitionBy(col("query_id"))
        .orderBy(col("cos_sim").desc, col("neighbor_id"))
      n.select(col("vec_id").as("neighbor_id"), col("v"))
        .join(broadcast(cand), Seq("neighbor_id"))
        .join(broadcast(qs.select(col("query_id"), col("qv"))), Seq("query_id"))
        .withColumn("cos_sim", expr("cosine_sim(qv, v)"))
        .withColumn("rk", row_number().over(rw).cast("long"))
        .filter(col("rk") <= TopK)
        .select(col("query_id"), col("rk"), col("neighbor_id"),
          col("hamming").cast("int").as("hamming"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy("query_id", "rk")
    },

    // ---- q130: embedding OUTLIER detection (assign ⊕ exact quantile) ----
    // The corpus-hygiene pass before clustering-based curation: distance
    // of every vector to its assigned centroid, flag everything past the
    // exact p99 — garbage embeddings, encoder failures, off-distribution
    // content. Composes two proven machines: the IVF broadcast argmax
    // assign (q54, cosine via the codegen cosine_sim expr) and q123's
    // histogram-narrowed exact selection over micro-unit INTEGER
    // distances (round((1-cos)·1e6)) — integerizing makes the p99
    // threshold exact and cross-engine stable, and the whole pass is
    // broadcast-join + map + three bounded hash aggs: no sort, no
    // corpus×corpus, no buffer-everything percentile.
    Q("q130_embedding_outliers",
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |cent AS (SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM n
        |         WHERE vec_id % 64 = 0),
        |assign AS (
        |  SELECT vec_id, c_id, cos FROM (
        |    SELECT n.vec_id, cent.c_id,
        |      list_dot_product(n.v, cent.cv) / (n.nrm * cent.cn) AS cos,
        |      row_number() OVER (PARTITION BY n.vec_id
        |        ORDER BY list_dot_product(n.v, cent.cv) / (n.nrm * cent.cn)
        |          DESC, cent.c_id) AS crk
        |    FROM n, cent) WHERE crk = 1),
        |d AS (SELECT vec_id, c_id,
        |    CAST(round((1 - cos) * 1000000) AS BIGINT) AS d_micro FROM assign),
        |thr AS (SELECT d_micro AS t FROM (
        |    SELECT d_micro, row_number() OVER (ORDER BY d_micro) AS rn FROM d)
        |  WHERE rn = (SELECT CAST(ceil(0.99 * count(*)) AS BIGINT) FROM d))
        |SELECT d.vec_id, d.c_id AS cluster, d.d_micro
        |FROM d, thr WHERE d.d_micro > thr.t
        |ORDER BY vec_id""".stripMargin) { (s, dir) =>
      val vecs = emb(s, dir).select(col("vec_id"), asDouble.as("v"))
      val cent = vecs.filter(col("vec_id") % 64 === 0)
        .select(col("vec_id").as("c_id"), col("v").as("cv"))
      val d = vecs.join(broadcast(cent))
        .withColumn("_csim", expr("cosine_sim(v, cv)"))
        .groupBy(col("vec_id"))
        .agg(max_by(col("c_id"), struct(col("_csim"), -col("c_id"))).as("cluster"),
          max(col("_csim")).as("cos"))
        .select(col("vec_id"), col("cluster"),
          round((lit(1.0d) - col("cos")) * 1000000, 0).cast("long").as("d_micro"))
        .localCheckpoint(true) // pinned: quantile pass + filter both read it
      val n = d.count()
      val k = (BigDecimal("0.99") * n)
        .setScale(0, BigDecimal.RoundingMode.CEILING).toLong
      val thr = ExactQuantile.kthSmallest(d, "d_micro", Map("p99" -> k))("p99")
      d.filter(col("d_micro") > thr).orderBy("vec_id")
    },

    // ---- q178: incremental IVF index maintenance ------------------------
    // The streaming-ANN upkeep path: new vectors (every 5th id — "this
    // hour's arrivals") are assigned to the EXISTING codebook without
    // retraining — one broadcast-K map-side argmax over the delta only,
    // the O(batch) operation that keeps a serving index fresh between
    // (rare, offline) retrains. The report is the retrain-trigger
    // dashboard: per-cluster base/delta populations, growth, and
    // centroid-affinity drift (new points sitting farther from their
    // centroid than old ones ⇒ the codebook no longer spans the data).
    // Per-row similarity quantizes to micro-unit longs (floor(cos·1e6
    // + 0.5)) so the per-cluster means are exact-integer sums with one
    // final division, and the drift subtraction happens on those two
    // deterministic quotients.
    Q("q178_ivf_incremental",
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |cent AS (SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM n
        |         WHERE vec_id % 64 = 0 AND vec_id % 5 <> 0),
        |asg AS (SELECT vec_id, c_id, su, vec_id % 5 = 0 AS is_delta FROM (
        |    SELECT nn.vec_id, cent.c_id,
        |      CAST(floor(list_dot_product(nn.v, cent.cv) / (nn.nrm * cent.cn)
        |        * 1000000 + 0.5) AS BIGINT) AS su,
        |      row_number() OVER (PARTITION BY nn.vec_id
        |        ORDER BY list_dot_product(nn.v, cent.cv) / (nn.nrm * cent.cn)
        |          DESC, cent.c_id) AS crk
        |    FROM n nn, cent) WHERE crk = 1),
        |g AS (SELECT c_id,
        |        sum(CASE WHEN is_delta THEN 0 ELSE 1 END) AS n_base,
        |        sum(CASE WHEN is_delta THEN 1 ELSE 0 END) AS n_delta,
        |        sum(CASE WHEN is_delta THEN 0 ELSE su END) AS sb,
        |        sum(CASE WHEN is_delta THEN su ELSE 0 END) AS sd
        |      FROM asg GROUP BY 1)
        |SELECT c_id AS cluster, CAST(n_base AS BIGINT) AS n_base,
        |  CAST(n_delta AS BIGINT) AS n_delta,
        |  round(CAST(n_delta AS DOUBLE) / nullif(n_base, 0), 6) AS growth,
        |  round(CAST(sb AS DOUBLE) / nullif(n_base, 0) / 1000000.0, 6)
        |    AS mean_sim_base,
        |  round(CAST(sd AS DOUBLE) / nullif(n_delta, 0) / 1000000.0, 6)
        |    AS mean_sim_delta
        |FROM g ORDER BY cluster""".stripMargin) { (s, dir) =>
      val vecs = emb(s, dir).select(col("vec_id"), asDouble.as("v"))
      val cent = vecs
        .filter(col("vec_id") % 64 === 0 && col("vec_id") % 5 =!= 0)
        .select(col("vec_id").as("c_id"), col("v").as("cv"))
      vecs.join(broadcast(cent))
        .withColumn("_csim", expr("cosine_sim(v, cv)"))
        .groupBy(col("vec_id"))
        .agg(max_by(col("c_id"), struct(col("_csim"), -col("c_id"))).as("c_id"),
          max(col("_csim")).as("cos"))
        .select(col("vec_id"), col("c_id"),
          floor(col("cos") * 1e6 + 0.5).cast("long").as("su"),
          (col("vec_id") % 5 === 0).as("is_delta"))
        .groupBy(col("c_id"))
        .agg(
          sum(when(col("is_delta"), 0L).otherwise(1L)).as("n_base"),
          sum(when(col("is_delta"), 1L).otherwise(0L)).as("n_delta"),
          sum(when(col("is_delta"), 0L).otherwise(col("su"))).as("sb"),
          sum(when(col("is_delta"), col("su")).otherwise(0L)).as("sd"))
        .select(col("c_id").as("cluster"), col("n_base"), col("n_delta"),
          when(col("n_base") === 0, lit(null).cast("double"))
            .otherwise(round(col("n_delta").cast("double") / col("n_base"), 6))
            .as("growth"),
          when(col("n_base") === 0, lit(null).cast("double"))
            .otherwise(round(col("sb").cast("double") / col("n_base") / 1e6, 6))
            .as("mean_sim_base"),
          when(col("n_delta") === 0, lit(null).cast("double"))
            .otherwise(round(col("sd").cast("double") / col("n_delta") / 1e6, 6))
            .as("mean_sim_delta"))
        .orderBy("cluster")
    },

    // ---- q191: IVF recall/cost tuning table -----------------------------
    // The q172 evaluation for the ANN family: per nprobe ∈ {1,2,4},
    // mean recall@5 of the multi-probe IVF search against the exact
    // brute-force top-5, plus the mean candidates scanned per query —
    // the recall-vs-cost curve an IVF deployment is tuned with (the
    // same table SCALING_LOCAL samples, here oracle-gated). Probe legs
    // are the SHIPPED ivfProbeMulti plan (broadcast-K centroid ranking
    // + cluster equi-join — query side multiplies by P, corpus side
    // never); the exact reference is q33's bounded brute force
    // (broadcast queries — n/100 rows — against the corpus; the eval's
    // ground truth, loudly not the production path). Recall and
    // scanned-count are integer sums with ONE final division, so no
    // float summation order can drift between engines.
    Q("q191_ivf_recall_eval",
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |cent AS (SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM n WHERE vec_id % 64 = 0),
        |assign AS (
        |  SELECT vec_id, v, nrm, c_id FROM (
        |    SELECT n.vec_id, n.v, n.nrm, cent.c_id,
        |      row_number() OVER (PARTITION BY n.vec_id
        |        ORDER BY list_dot_product(n.v, cent.cv) / (n.nrm * cent.cn) DESC, cent.c_id) AS crk
        |    FROM n, cent) WHERE crk = 1),
        |qs AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n
        |       WHERE $QueryFilter),
        |exact AS (SELECT query_id, neighbor_id FROM (
        |    SELECT qs.query_id AS query_id, c.vec_id AS neighbor_id,
        |      row_number() OVER (PARTITION BY qs.query_id
        |        ORDER BY list_dot_product(qs.qv, c.v) / (qs.qn * c.nrm) DESC, c.vec_id) AS rk
        |    FROM qs, n c WHERE c.vec_id <> qs.query_id)
        |  WHERE rk <= $TopK),
        |qc AS (SELECT query_id, cluster, crk FROM (
        |    SELECT qs.query_id, cent.c_id AS cluster,
        |      row_number() OVER (PARTITION BY qs.query_id
        |        ORDER BY list_dot_product(qs.qv, cent.cv) / (qs.qn * cent.cn) DESC, cent.c_id) AS crk
        |    FROM qs, cent) WHERE crk <= 4),
        |ps AS (SELECT unnest([1, 2, 4]) AS nprobe),
        |probe AS (SELECT nprobe, query_id, neighbor_id FROM (
        |    SELECT ps.nprobe, qc.query_id, c.vec_id AS neighbor_id,
        |      row_number() OVER (PARTITION BY ps.nprobe, qc.query_id
        |        ORDER BY list_dot_product(q2.qv, c.v) / (q2.qn * c.nrm) DESC, c.vec_id) AS rk
        |    FROM ps JOIN qc ON qc.crk <= ps.nprobe
        |    JOIN assign c ON c.c_id = qc.cluster AND c.vec_id <> qc.query_id
        |    JOIN qs q2 ON q2.query_id = qc.query_id)
        |  WHERE rk <= $TopK),
        |hits AS (SELECT p.nprobe, p.query_id, count(*) AS h
        |  FROM probe p JOIN exact x
        |    ON x.query_id = p.query_id AND x.neighbor_id = p.neighbor_id
        |  GROUP BY 1, 2),
        |csz AS (SELECT c_id, count(*) AS csz FROM assign GROUP BY 1),
        |scans AS (SELECT ps.nprobe, qc.query_id, sum(csz.csz) - 1 AS scanned
        |  FROM ps JOIN qc ON qc.crk <= ps.nprobe
        |  JOIN csz ON csz.c_id = qc.cluster
        |  GROUP BY 1, 2),
        |base AS (SELECT ps.nprobe, qs.query_id FROM ps, qs)
        |SELECT CAST(base.nprobe AS INT) AS nprobe,
        |  CAST(count(*) AS BIGINT) AS n_queries,
        |  round(CAST(coalesce(sum(h.h), 0) AS DOUBLE)
        |    / (count(*) * $TopK), 6) AS recall_at_5,
        |  round(CAST(coalesce(sum(s.scanned), 0) AS DOUBLE) / count(*), 6)
        |    AS mean_scanned
        |FROM base
        |LEFT JOIN hits h ON h.nprobe = base.nprobe AND h.query_id = base.query_id
        |LEFT JOIN scans s ON s.nprobe = base.nprobe AND s.query_id = base.query_id
        |GROUP BY 1 ORDER BY nprobe""".stripMargin) { (s, dir) =>
      import s.implicits._
      val n = emb(s, dir).select(col("vec_id"), asDouble.as("v"))
      val cent = n.filter(col("vec_id") % 64 === 0)
        .select(col("vec_id").as("c_id"), col("v").as("cv"))
      val assign = ivfAssign(n, cent).localCheckpoint(true) // 5 consumers
      // exact ground truth: q33's bounded brute force (broadcast queries)
      val qv = n.filter(expr(QueryFilter))
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      val exW = Window.partitionBy(col("query_id"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
      val exact = broadcast(qv).join(n, col("vec_id") =!= col("query_id"))
        .withColumn("cos_sim", expr("cosine_sim(qv, v)"))
        .withColumn("rk", row_number().over(exW))
        .filter(col("rk") <= TopK)
        .select(col("query_id"), col("vec_id").as("neighbor_id"))
        .localCheckpoint(true)
      val nprobes = Seq(1, 2, 4)
      // ONE probe join at the largest nprobe, centroid rank kept: the
      // nprobe=1/2 candidate sets are exactly the crk<=p subsets (each
      // neighbor lives in one cluster, so no candidate repeats), so the
      // smaller rungs re-rank a filtered copy of the checkpointed
      // candidate frame instead of re-running the probe join per rung —
      // same rows, same (cos desc, neighbor) tie-break as ivfProbeMulti
      val crkW = Window.partitionBy(col("query_id"))
        .orderBy(col("_csim").desc, col("cluster"))
      val q4 = assign.filter(expr(QueryFilter))
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
        .join(broadcast(cent.select(col("c_id").as("cluster"), col("cv"))))
        .withColumn("_csim", expr("cosine_sim(qv, cv)"))
        .withColumn("crk", row_number().over(crkW))
        .filter(col("crk") <= nprobes.max)
        .select(col("query_id"), col("qv"), col("cluster"), col("crk"))
        .localCheckpoint(true) // tiny; read by the probe join AND `qc`
      val cands = q4
        .join(assign.select(col("vec_id").as("neighbor_id"), col("v"),
          col("c_id").as("cluster")), Seq("cluster"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("cos_sim", expr("cosine_sim(qv, v)"))
        .select(col("query_id"), col("crk"), col("neighbor_id"), col("cos_sim"))
        .localCheckpoint(true)
      val rkW = Window.partitionBy(col("query_id"))
        .orderBy(col("cos_sim").desc, col("neighbor_id"))
      val probes = nprobes.map { p =>
        cands.filter(col("crk") <= p)
          .withColumn("rk", row_number().over(rkW))
          .filter(col("rk") <= TopK)
          .select(lit(p).as("nprobe"), col("query_id"), col("neighbor_id"))
      }.reduce(_ unionByName _)
      val hits = probes.join(exact, Seq("query_id", "neighbor_id"))
        .groupBy("nprobe", "query_id").agg(count(lit(1)).as("h"))
      // scanned candidates: top-P cluster sizes minus self (the home
      // cluster is always centroid-rank 1 under the shared tie-break)
      val csize = assign.groupBy("c_id").agg(count(lit(1)).as("csz"))
      // the scanned-candidates leg reuses the checkpointed q4 ranking
      val qc = q4.select(col("query_id"), col("cluster"), col("crk"))
      val qcs = qc.join(csize, qc("cluster") === csize("c_id"))
        .select(col("query_id"), col("crk"), col("csz"))
        .localCheckpoint(true) // one 3-way fan-out over a tiny frame
      val scans = nprobes.map { p =>
        qcs.filter(col("crk") <= p).groupBy("query_id")
          .agg((sum(col("csz")) - 1).as("scanned"))
          .select(lit(p).as("nprobe"), col("query_id"), col("scanned"))
      }.reduce(_ unionByName _)
      val base = nprobes.map { p =>
        assign.filter(expr(QueryFilter))
          .select(lit(p).as("nprobe"), col("vec_id").as("query_id"))
      }.reduce(_ unionByName _)
      base.join(hits, Seq("nprobe", "query_id"), "left")
        .join(scans, Seq("nprobe", "query_id"), "left")
        .groupBy("nprobe")
        .agg(count(lit(1)).as("n_queries"),
          sum(coalesce(col("h"), lit(0L))).as("sh"),
          sum(coalesce(col("scanned"), lit(0L))).as("ss"))
        .select(col("nprobe"), col("n_queries"),
          round(col("sh").cast("double") / (col("n_queries") * TopK), 6)
            .as("recall_at_5"),
          round(col("ss").cast("double") / col("n_queries"), 6)
            .as("mean_scanned"))
        .orderBy("nprobe")
    },

    // ---- q206: Johnson-Lindenstrauss random projection 64 → 16 ---------
    // The dimensionality-reduction leg of the ANN family: a seeded
    // ±1 Rademacher projection (Achlioptas 2003 — the database-friendly
    // JL construction) folds 64-dim embeddings to 16 dims, and the
    // report measures exactly what JL promises: squared-distance
    // distortion on a fixed probe-pair panel. The sign matrix is a
    // FOLDABLE expression (md5-parity of "i:j" — Catalyst constant-
    // folds it once at plan time; the oracle derives the identical
    // matrix from the same md5s), projection is one map-side
    // transform/fold per row — no shuffle, no UDF — and distortion =
    // d²_proj / (16·d²_orig) with both folds running in identical
    // element order, so the doubles agree bit-for-bit before the one
    // shared rounding.
    Q("q206_jl_projection",
      """WITH smat AS (SELECT list_transform(range(0,16), i ->
        |    list_transform(range(0,64), j ->
        |      CASE WHEN ('0x'||substr(md5(CAST(i AS VARCHAR)||':'
        |          ||CAST(j AS VARCHAR)),1,15))::BIGINT % 2 = 0
        |        THEN 1.0 ELSE -1.0 END)) AS m),
        |v AS (SELECT vec_id,
        |        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
        |      FROM embeddings),
        |p AS (SELECT vec_id, vd, list_transform(m, srow ->
        |        list_sum(list_transform(range(1,65), k -> vd[k] * srow[k])))
        |        AS pv
        |      FROM v, smat WHERE vec_id % 50 = 0 OR vec_id % 50 = 1),
        |pairs AS (SELECT a.vec_id AS pair_id,
        |        list_sum(list_transform(range(1,65),
        |          k -> (a.vd[k] - b.vd[k]) * (a.vd[k] - b.vd[k]))) AS d2o,
        |        list_sum(list_transform(range(1,17),
        |          k -> (a.pv[k] - b.pv[k]) * (a.pv[k] - b.pv[k]))) AS d2p
        |      FROM p a JOIN p b ON b.vec_id = a.vec_id + 1
        |      WHERE a.vec_id % 50 = 0)
        |SELECT pair_id, round(d2o, 4) AS d2_orig, round(d2p, 4) AS d2_proj,
        |  round(d2p / (16.0 * d2o), 4) AS distortion
        |FROM pairs ORDER BY pair_id""".stripMargin) { (s, dir) =>
      // the sign matrix is a pure function of md5("i:j") — computed
      // once on the driver (java MessageDigest md5 ≡ Spark md5 ≡ DuckDB
      // md5 on the same bytes) and embedded as a nested array LITERAL,
      // so the executed plan carries constants, not per-row hashing
      // (plan-pinned: no md5 survives); the oracle derives the
      // identical matrix from the same md5s in SQL
      val md = java.security.MessageDigest.getInstance("MD5")
      def sign(i: Int, j: Int): Double = {
        val hex = md.digest(s"$i:$j".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 15)
        if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0 else -1.0
      }
      val signs: Seq[Seq[Double]] =
        (0 until 16).map(i => (0 until 64).map(j => sign(i, j)))
      val p = emb(s, dir)
        .filter(col("vec_id") % 50 === 0 || col("vec_id") % 50 === 1)
        .withColumn("vd",
          transform(col("embedding"), x => x.cast("double")))
        .withColumn("m", typedLit(signs))
        .withColumn("pv", expr("transform(m, srow -> " +
          "aggregate(zip_with(vd, srow, (a, b) -> a * b), " +
          "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x))"))
        .select(col("vec_id"), col("vd"), col("pv"))
      val a = p.select(col("vec_id").as("pair_id"),
        col("vd").as("vda"), col("pv").as("pva"))
        .filter(col("pair_id") % 50 === 0)
      val b = p.select((col("vec_id") - 1).as("pair_id"),
        col("vd").as("vdb"), col("pv").as("pvb"))
        .filter(col("pair_id") % 50 === 0)
      a.join(b, "pair_id")
        .withColumn("d2o", expr("aggregate(zip_with(vda, vdb, " +
          "(x, y) -> (x - y) * (x - y)), CAST(0.0 AS DOUBLE), " +
          "(acc, x) -> acc + x)"))
        .withColumn("d2p", expr("aggregate(zip_with(pva, pvb, " +
          "(x, y) -> (x - y) * (x - y)), CAST(0.0 AS DOUBLE), " +
          "(acc, x) -> acc + x)"))
        .select(col("pair_id"), round(col("d2o"), 4).as("d2_orig"),
          round(col("d2p"), 4).as("d2_proj"),
          round(col("d2p") / (lit(16.0) * col("d2o")), 4).as("distortion"))
        .orderBy("pair_id")
    }
  )
}
