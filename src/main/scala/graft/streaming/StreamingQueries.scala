package graft.streaming

import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}

/** Oracle-gated batch drive of the incremental streaming near-dup store
  * (q94) — the component that was spec-only since round 2. The query
  * runs the REAL `IncrementalDedup.processBatch` pipeline (signature
  * store on disk, manifest commits, zone-map-pruned probes, stale
  * re-ingest rewrite) through five deterministic batches and
  * hash-compares every emitted verdict against a DuckDB oracle that
  * recomputes the same MinHash-banded semantics declaratively:
  *
  *   batches 1-3: the corpus split by doc_id % 3 (every doc once);
  *   batch 4:     doc_id % 10 = 0 RE-INGESTED with changed text (the
  *                stale-rewrite path: their store rows must be replaced)
  *                + doc_id % 10 = 5 replayed byte-identical (the
  *                idempotent no-op path);
  *   batch 5:     doc_id % 10 = 1 replayed — its verdicts are computed
  *                AGAINST the post-re-ingest store, so a stale v1 row
  *                surviving batch 4's rewrite, or a replay row
  *                duplicated by batch 4's no-op, changes est_jaccard
  *                and fails the hash.
  *
  * Verdict semantics mirrored by the oracle (see `processBatch`): for
  * doc x of batch b, candidates are store rows (latest signature per
  * doc from batches < b, minus docs in batch b) plus in-batch rows with
  * doc_id < x, matched on any shared LSH band bucket; est = fraction of
  * the 8 minhash components agreeing, kept at ≥ 0.5; best match = max
  * est, ties to the lowest dup_of.
  */
object StreamingQueries {
  private val K = 8
  private val normSql = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  private val q94Sql: String = {
    val mhSelect = (0 until K)
      .map(i => s"min(md5('$i:' || s)) AS mh$i").mkString(", ")
    val mhCols = (0 until K).map(i => s"mh$i").mkString(", ")
    val bands = (0 until K / 2)
      .map(b => s"md5(mh${2 * b} || mh${2 * b + 1}) AS band$b").mkString(", ")
    val bandCols = (0 until K / 2).map(b => s"band$b").mkString(", ")
    val eqSum = (0 until K)
      .map(i => s"CASE WHEN x.mh$i = t.mh$i THEN 1 ELSE 0 END").mkString(" + ")
    val bandMatch = (0 until K / 2)
      .map(b => s"x.band$b = t.band$b").mkString(" OR ")
    s"""WITH bd AS (
      |  SELECT 1 AS batch, doc_id, text FROM documents WHERE doc_id % 3 = 0
      |  UNION ALL SELECT 2, doc_id, text FROM documents WHERE doc_id % 3 = 1
      |  UNION ALL SELECT 3, doc_id, text FROM documents WHERE doc_id % 3 = 2
      |  UNION ALL SELECT 4, doc_id, text || ' reingested update v2 content'
      |    FROM documents WHERE doc_id % 10 = 0
      |  UNION ALL SELECT 4, doc_id, text FROM documents WHERE doc_id % 10 = 5
      |  UNION ALL SELECT 5, doc_id, text FROM documents WHERE doc_id % 10 = 1),
      |sh AS (SELECT DISTINCT batch, doc_id,
      |  unnest(list_transform(range(1, len(string_split($normSql,' ')) - 1),
      |    i -> array_to_string(list_slice(string_split($normSql,' '), i, i+2),' '))) AS s
      |  FROM bd),
      |sig AS (SELECT batch, doc_id, $mhSelect FROM sh GROUP BY batch, doc_id),
      |sigb AS (SELECT *, $bands FROM sig),
      |pb AS (SELECT DISTINCT batch FROM sigb),
      |stv AS (SELECT pbatch, doc_id, $mhCols, $bandCols FROM (
      |  SELECT p.batch AS pbatch, s.doc_id, $mhCols, $bandCols,
      |    row_number() OVER (PARTITION BY p.batch, s.doc_id
      |      ORDER BY s.batch DESC) AS rn
      |  FROM pb p JOIN sigb s ON s.batch < p.batch) WHERE rn = 1),
      |tgt AS (
      |  SELECT v.pbatch, v.doc_id, TRUE AS is_store, $mhCols, $bandCols
      |  FROM stv v WHERE NOT EXISTS (
      |    SELECT 1 FROM sigb q WHERE q.batch = v.pbatch AND q.doc_id = v.doc_id)
      |  UNION ALL
      |  SELECT batch, doc_id, FALSE, $mhCols, $bandCols FROM sigb),
      |pairs AS (
      |  SELECT x.batch, x.doc_id, t.doc_id AS dup_of,
      |    CAST($eqSum AS DOUBLE) / $K AS est_jaccard
      |  FROM sigb x JOIN tgt t ON t.pbatch = x.batch
      |    AND (t.is_store OR t.doc_id < x.doc_id)
      |    AND ($bandMatch)
      |  WHERE CAST($eqSum AS DOUBLE) / $K >= 0.5)
      |SELECT batch, doc_id, dup_of, est_jaccard FROM (
      |  SELECT *, row_number() OVER (PARTITION BY batch, doc_id
      |    ORDER BY est_jaccard DESC, dup_of) AS rk FROM pairs) WHERE rk = 1
      |ORDER BY batch, doc_id""".stripMargin
  }

  val defs: Seq[Q] = Seq(
    Q("q94_incremental_dedup", q94Sql) { (s, dir) =>
      val base = Tables.load(s, dir, "documents").select("doc_id", "text")
      // fresh store per run — the query IS the store drive, so a rerun
      // (Bench's min-of-2) must start from the same empty state
      val root = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(System.getProperty("java.io.tmpdir")),
        "graft_q94_store")
      val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(root, true)
      val batches = Seq(
        1 -> base.filter(col("doc_id") % 3 === 0),
        2 -> base.filter(col("doc_id") % 3 === 1),
        3 -> base.filter(col("doc_id") % 3 === 2),
        4 -> base.filter(col("doc_id") % 10 === 0)
          .withColumn("text",
            concat(col("text"), lit(" reingested update v2 content")))
          .unionByName(base.filter(col("doc_id") % 10 === 5)),
        5 -> base.filter(col("doc_id") % 10 === 1))
      batches.map { case (i, b) =>
        // strict: each processBatch runs (and commits) before the next
        IncrementalDedup.processBatch(b, root.toString)
          .withColumn("batch", lit(i))
      }.reduce(_ unionByName _)
        .select(col("batch"), col("doc_id"), col("dup_of"), col("est_jaccard"))
        .orderBy("batch", "doc_id")
    })
}
