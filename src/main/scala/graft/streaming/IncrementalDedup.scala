package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

import graft.operators.Dedup

/** Incremental near-duplicate detection over a document STREAM — the
  * production shape of q30/q59: new docs arrive continuously and must be
  * checked against everything already accepted, without ever rescanning
  * the corpus.
  *
  * Design (per micro-batch, inside `foreachBatch`):
  *   1. MinHash-band signatures of the batch docs (map-side per doc —
  *      `Dedup.minhashBandedSignatures`, identical arithmetic to q30, so
  *      batch and backfill classify identically);
  *   2. LSH bucket join of batch signatures against the signature STORE
  *      plus the batch itself (earlier-id-wins within a batch). The join
  *      touches only matching (band, bucket) groups — per-batch cost is
  *      O(batch × bucket collision rate), independent of corpus size;
  *   3. verdicts emitted: each new doc's best match ≥ threshold;
  *   4. batch signatures appended to the store (append-mostly — the
  *      store is the index and grows with the corpus: ~426 bytes/doc
  *      measured on disk at 5k-row batch files (SCALING_LOCAL.json
  *      `streaming`; parquet footer overhead amortizes toward the raw
  *      ~100-byte signature as files grow), partition-prunable by band
  *      bucket at scale. Appended ONLY after
  *      verdict output so a failed batch retries cleanly — re-detection
  *      is idempotent; a replayed identical batch is filtered by an
  *      exact-signature anti-join, and a doc_id RE-INGESTED with changed
  *      text replaces its stale store row, see `processBatch`).
  *
  * Store compaction: blind appends accumulate small files; the same
  * rare-compaction policy as the SCD2 segment log applies (rewrite when
  * file count crosses a threshold), amortized O(1) per batch.
  */
object IncrementalDedup {
  /** q30's threshold: candidate pairs at ≥ half the signature agreeing. */
  val DefaultThreshold = 0.5

  private def storeSigs(spark: org.apache.spark.sql.SparkSession,
                        storeDir: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(storeDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // self-heal a compaction interrupted between delete and rename: the
    // side dir is only ever a COMPLETE compacted copy (it is fully
    // written before the live dir is touched), so promoting it is safe
    val side = new org.apache.hadoop.fs.Path(storeDir + CompactSuffix)
    if (!fs.exists(p) && fs.exists(side)) fs.rename(side, p)
    if (fs.exists(p) && fs.listStatus(p).nonEmpty) Some(spark.read.parquet(storeDir))
    else None
  }

  /** Process one micro-batch of (doc_id, text): emit duplicate verdicts
    * (doc_id, dup_of, est_jaccard) against the store and earlier batch
    * docs, then append the batch's signatures to the store. Callable
    * directly (batch mode) or from `stream`'s foreachBatch. */
  def processBatch(batchDocs: DataFrame, storeDir: String,
                   threshold: Double = DefaultThreshold): DataFrame = {
    val spark = batchDocs.sparkSession
    val batchSigs = Dedup.minhashBandedSignatures(batchDocs).persist()

    val store = storeSigs(spark, storeDir)
    // candidate targets: the store + earlier batch ids. Store rows whose
    // doc_id is IN the current batch are replay residue (a retried batch
    // whose signatures were already appended): keep only the batch-row
    // copy of those docs, or the earlier member of a within-batch pair
    // would match the later member's STORE row — bypassing the
    // earlier-id-wins guard below and flipping it from unique to dup on
    // replay. With the residue removed, a replay joins against exactly
    // the first run's candidate set, so verdicts are bit-identical.
    val target = store match {
      case Some(st) => st
        .join(batchSigs.select("doc_id"), Seq("doc_id"), "left_anti")
        .withColumn("is_store", lit(true))
        .unionByName(batchSigs.withColumn("is_store", lit(false)))
      case None => batchSigs.withColumn("is_store", lit(false))
    }
    val x = Dedup.explodeBandBuckets(batchSigs).as("x")
    val y = Dedup.explodeBandBuckets(target).as("y")
    val est = Dedup.sigAgreement("x", "y")
    // self-match guard: on batch REPLAY the store already holds this
    // batch's signatures, so without the doc_id inequality every
    // replayed doc would match its own store row at est=1.0 and verdicts
    // would flip (unique docs flagged as dups) — breaking the idempotent
    // replay contract
    val verdicts = x
      .join(y,
        col("x.band_idx") === col("y.band_idx") &&
          col("x.bucket") === col("y.bucket") &&
          col("y.doc_id") =!= col("x.doc_id") &&
          (col("y.is_store") || col("y.doc_id") < col("x.doc_id")))
      .select(col("x.doc_id").as("doc_id"), col("y.doc_id").as("dup_of"),
        est.as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      // best match per doc: highest agreement, ties to the lowest id
      // (struct max is lexicographic: est_jaccard first, then -dup_of)
      .groupBy("doc_id")
      .agg(max(struct(col("est_jaccard"), (-col("dup_of")).as("neg"))).as("best"))
      .select(col("doc_id"), (-col("best.neg")).as("dup_of"),
        col("best.est_jaccard").as("est_jaccard"))
    // Pin the verdicts BEFORE mutating the store: the append below
    // invalidates (by path) any cache over the store read, and a plain
    // persist would silently recompute against the post-append store —
    // matching every doc to its own freshly appended signature.
    // localCheckpoint truncates the lineage eagerly, so the result is
    // immune to the recache.
    val out = verdicts.localCheckpoint(true)

    // Store maintenance — re-ingest semantics (one row per doc_id, the
    // LATEST text wins):
    //  * unseen doc_id             → appended (the common case);
    //  * identical signature again → no-op (idempotent batch replay);
    //  * CHANGED signature (the doc was re-ingested with new text) →
    //    the stale store row is rewritten out (rare, crash-safe via the
    //    compaction side-dir protocol), then the new signature appends.
    // Verdicts above already used the batch copy for in-batch ids, so a
    // replay after any crash point below re-emits identical verdicts.
    store match {
      case Some(st) =>
        val allCols = batchSigs.columns.toSeq
        val exactIds = st.join(batchSigs, allCols, "left_semi").select("doc_id")
        // pin before any rewrite: these read the pre-rewrite store files
        val fresh = batchSigs
          .join(exactIds, Seq("doc_id"), "left_anti").localCheckpoint(true)
        val staleIds = st
          .join(batchSigs.select("doc_id"), Seq("doc_id"), "left_semi")
          .join(batchSigs, allCols, "left_anti")
          .select("doc_id")
        if (!staleIds.isEmpty) {
          val remaining = st.join(staleIds, Seq("doc_id"), "left_anti")
            .localCheckpoint(true)
          val tmp = storeDir + CompactSuffix
          remaining.write.mode(SaveMode.Overwrite).parquet(tmp)
          val p = new org.apache.hadoop.fs.Path(storeDir)
          val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          fs.delete(p, true)
          fs.rename(new org.apache.hadoop.fs.Path(tmp), p)
        }
        fresh.write.mode(SaveMode.Append).parquet(storeDir)
      case None =>
        batchSigs.write.mode(SaveMode.Append).parquet(storeDir)
    }
    batchSigs.unpersist()
    out
  }

  /** Compact the blind-append signature store into `targetFiles` files.
    * Run rarely (every N batches / on file-count threshold) — amortized
    * O(1) per batch; the store contents are unchanged, so detection
    * before and after compaction is identical.
    *
    * Crash safety: the compacted copy is fully written to a side dir
    * BEFORE the live dir is deleted, and `storeSigs` self-heals the one
    * remaining window (crash between delete and rename) by promoting the
    * completed side dir — the store can end up stale-but-present or
    * healed, never lost. */
  def compactStore(spark: org.apache.spark.sql.SparkSession, storeDir: String,
                   targetFiles: Int = 8): Unit =
    storeSigs(spark, storeDir).foreach { st =>
      val tmp = storeDir + CompactSuffix
      // localCheckpoint: the rewrite must not re-read storeDir lazily
      // AFTER the delete below
      val pinned = st.repartition(targetFiles).localCheckpoint(true)
      pinned.write.mode(SaveMode.Overwrite).parquet(tmp)
      val p = new org.apache.hadoop.fs.Path(storeDir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
      fs.rename(new org.apache.hadoop.fs.Path(tmp), p)
    }

  private val CompactSuffix = ".compact"

  /** Wire a streaming (doc_id, text) source through per-batch detection;
    * verdicts are handed to `onVerdicts` (e.g. a sink write). */
  def stream(docs: DataFrame, storeDir: String, checkpointDir: String,
             threshold: Double = DefaultThreshold)(
      onVerdicts: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        onVerdicts(processBatch(batch, storeDir, threshold), id)
      }
}
