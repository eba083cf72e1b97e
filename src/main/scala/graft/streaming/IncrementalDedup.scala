package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
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
  *      bucket at scale. Appended ONLY after verdict output so a failed
  *      batch retries cleanly — re-detection is idempotent; a replayed
  *      identical batch is filtered by an exact-signature anti-join, and
  *      a doc_id RE-INGESTED with changed text replaces its stale store
  *      row, see `processBatch`).
  *
  * Store layout — the same manifest-committed protocol as `Scd2Store`
  * (rename-free, so commit atomicity holds on rename-as-copy stores
  * like S3A):
  * {{{
  *   <store>/_m/m<SEQ>   manifest: the committed directory list, one
  *                       name per line, trailing end-marker; published
  *                       by a CREATE-EXCLUSIVE write of a never-reused
  *                       seq — the close IS the commit
  *   <store>/d<SEQ>/     immutable parquet directories (one per batch
  *                       append / stale-rewrite / compaction)
  * }}}
  * Readers resolve the newest COMPLETE manifest (end-marker present);
  * a crash mid-publish leaves a detectably-partial file that readers
  * skip and the next commit supersedes and GCs. Data directories not
  * referenced by the newest or previous manifest are GC'd at commit
  * (one retained generation for lazy readers, as in `Scd2Store`).
  * Batch appends add one directory each; when the committed directory
  * count passes `CompactThreshold` the store self-compacts (amortized
  * O(1) per batch), keeping read fan-in bounded — same policy as the
  * SCD2 segment log.
  */
object IncrementalDedup {
  /** q30's threshold: candidate pairs at ≥ half the signature agreeing. */
  val DefaultThreshold = 0.5

  /** Committed directory count that triggers an automatic compaction. */
  val CompactThreshold = 64

  private val EndMarker = "end"

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new HPath(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(root: String): HPath = new HPath(root, "_m")

  /** Numbered children `<prefix><id>` of `p`, any order. */
  private def listIds(fs: FileSystem, p: HPath, prefix: String): Seq[(Long, HPath)] =
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath)
      .filter(_.getName.startsWith(prefix))
      .flatMap(q => q.getName.drop(prefix.length).toLongOption.map(_ -> q))

  private case class StoreState(seq: Long, dirs: Seq[String])

  /** Newest COMPLETE manifest (end-marker validated); partial files from
    * crashed publishes are skipped. */
  private def latestState(spark: SparkSession, root: String): Option[StoreState] = {
    val fs = fsOf(spark, root)
    listIds(fs, manifestDir(root), "m").sortBy(-_._1).iterator.flatMap {
      case (seq, p) =>
        val in = fs.open(p)
        val lines =
          try new String(in.readAllBytes(), UTF_8).linesIterator.toSeq
          finally in.close()
        if (lines.lastOption.contains(EndMarker))
          Some(StoreState(seq, lines.dropRight(1).filter(_.nonEmpty)))
        else None
    }.nextOption()
  }

  /** Fresh id strictly above every data dir and manifest ever written
    * (complete or partial), so names are never reused — what makes
    * create-exclusive publishes and crash-residue GC race-free under
    * the single-writer-per-store contract (Structured Streaming's
    * one-active-batch guarantee). */
  private def nextId(fs: FileSystem, root: String): Long =
    ((listIds(fs, new HPath(root), "d") ++ listIds(fs, manifestDir(root), "m"))
      .map(_._1) :+ 0L).max + 1

  /** Publish `dirs` as the committed store contents: create-exclusive
    * manifest write, then GC of everything the new or PREVIOUS manifest
    * doesn't reference. No renames anywhere. */
  private def commit(spark: SparkSession, root: String, dirs: Seq[String]): Unit = {
    val fs = fsOf(spark, root)
    fs.mkdirs(manifestDir(root))
    val prev = latestState(spark, root)
    val seq = nextId(fs, root)
    val dest = new HPath(manifestDir(root), s"m$seq")
    val out = fs.create(dest, false) // exclusive: fails if the name exists
    try out.write((dirs :+ EndMarker).mkString("\n").getBytes(UTF_8))
    finally out.close()
    // GC below only removes UNREFERENCED paths — a crash here leaves
    // harmless garbage, cleaned by the next commit
    val keepDirs = dirs.toSet ++ prev.fold(Set.empty[String])(_.dirs.toSet)
    listIds(fs, new HPath(root), "d").map(_._2)
      .filterNot(p => keepDirs.contains(p.getName))
      .foreach(p => fs.delete(p, true))
    val keepM = Set(seq) ++ prev.map(_.seq)
    listIds(fs, manifestDir(root), "m")
      .filterNot { case (s, _) => keepM.contains(s) }
      .foreach { case (_, p) => fs.delete(p, false) }
  }

  /** Committed directory names, for maintenance and tests. */
  private[streaming] def committedDirs(spark: SparkSession, root: String): Seq[String] =
    latestState(spark, root).fold(Seq.empty[String])(_.dirs)

  /** The committed signature store as one DataFrame (None when empty). */
  private[graft] def storeSigs(spark: SparkSession, storeDir: String): Option[DataFrame] = {
    val dirs = committedDirs(spark, storeDir)
    if (dirs.isEmpty) None
    else Some(spark.read.parquet(
      dirs.map(d => new HPath(storeDir, d).toString): _*))
  }

  /** Write a frame to a fresh immutable directory, returning its name.
    * The directory is invisible (unreferenced) until a manifest commit
    * includes it; residue from crashed attempts is GC'd later. */
  private def writeDir(spark: SparkSession, root: String, df: DataFrame): String = {
    val name = s"d${nextId(fsOf(spark, root), root)}"
    df.write.mode(SaveMode.Overwrite)
      .parquet(new HPath(root, name).toString)
    name
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
    // Pin the verdicts BEFORE mutating the store: the commit below can
    // GC directories a lazy plan over the pre-commit store would read.
    // localCheckpoint truncates the lineage eagerly, so the result is
    // immune to the store mutation.
    val out = verdicts.localCheckpoint(true)

    // Store maintenance — re-ingest semantics (one row per doc_id, the
    // LATEST text wins):
    //  * unseen doc_id             → appended (the common case);
    //  * identical signature again → no-op (idempotent batch replay —
    //    no write, no commit);
    //  * CHANGED signature (the doc was re-ingested with new text) →
    //    the store is rewritten without the stale rows (rare; the
    //    rewrite directory is invisible until the manifest commit
    //    publishes it, so a crash at any point leaves the old store).
    // Verdicts above already used the batch copy for in-batch ids, so a
    // replay after any crash point below re-emits identical verdicts.
    store match {
      case Some(st) =>
        val allCols = batchSigs.columns.toSeq
        val exactIds = st.join(batchSigs, allCols, "left_semi").select("doc_id")
        // pin before any commit: these read the pre-commit store dirs
        val fresh = batchSigs
          .join(exactIds, Seq("doc_id"), "left_anti").localCheckpoint(true)
        val staleIds = st
          .join(batchSigs.select("doc_id"), Seq("doc_id"), "left_semi")
          .join(batchSigs, allCols, "left_anti")
          .select("doc_id")
        val hasFresh = !fresh.isEmpty
        if (!staleIds.isEmpty) {
          val remaining = st.join(staleIds, Seq("doc_id"), "left_anti")
            .localCheckpoint(true)
          val dirs = Seq(writeDir(spark, storeDir, remaining)) ++
            (if (hasFresh) Seq(writeDir(spark, storeDir, fresh)) else Seq.empty)
          commit(spark, storeDir, dirs)
        } else if (hasFresh) {
          val d = writeDir(spark, storeDir, fresh)
          commit(spark, storeDir, committedDirs(spark, storeDir) :+ d)
        }
      case None =>
        if (!batchSigs.isEmpty)
          commit(spark, storeDir, Seq(writeDir(spark, storeDir, batchSigs)))
    }
    batchSigs.unpersist()
    // bound read fan-in: one directory per batch accumulates — fold
    // rarely, amortized O(1) per batch (same policy as the SCD2 log)
    if (committedDirs(spark, storeDir).size > CompactThreshold)
      compactStore(spark, storeDir)
    out
  }

  /** Compact the store's accumulated batch directories into one
    * `targetFiles`-file directory. Run rarely (auto-triggered past
    * `CompactThreshold`, or manually) — the store contents are
    * unchanged, so detection before and after compaction is identical.
    * Crash safety: the compacted directory is invisible until the
    * manifest commit publishes it; a crash leaves the old manifest
    * current and the next attempt writes a fresh directory. */
  def compactStore(spark: SparkSession, storeDir: String,
                   targetFiles: Int = 8): Unit =
    storeSigs(spark, storeDir).foreach { st =>
      // localCheckpoint: the write must not re-read the old store dirs
      // lazily AFTER the commit below GCs them
      val pinned = st.repartition(targetFiles).localCheckpoint(true)
      commit(spark, storeDir, Seq(writeDir(spark, storeDir, pinned)))
    }

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
