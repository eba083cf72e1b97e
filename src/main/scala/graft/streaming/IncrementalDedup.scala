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
  *   2. LSH bucket join of batch signatures against a RANGE-PRUNED
  *      read of the signature STORE plus the batch itself
  *      (earlier-id-wins within a batch). The store is laid out
  *      exploded — one row per (doc, band) — in files SORTED and
  *      range-split by (band_idx, bh = md5-hash of the bucket into
  *      `BucketPartitions` sub-buckets), each file's key range
  *      recorded in the manifest (a zone map). The per-batch read
  *      selects only the files whose range intersects the batch's own
  *      bucket keys: rows read ≈ store × min(1, touched/256), and the
  *      join itself then touches only matching (band, bucket) groups.
  *      Per-batch cost is O(batch × bucket collision rate) for the
  *      join and O(store × touched-fraction) for the scan — for
  *      trickle batches (the streaming regime) the touched fraction is
  *      tiny; for bulk batches it approaches 1, which is the regime
  *      where the batch itself is corpus-sized and a scan is inherent;
  *   3. verdicts emitted: each new doc's best match ≥ threshold;
  *   4. batch rows appended to the store (append-mostly — the store is
  *      the index and grows with the corpus; 4 exploded rows per doc,
  *      with the mh columns dictionary-encoded so the on-disk cost
  *      stays near the raw signature. Appended ONLY after verdict
  *      output so a failed batch retries cleanly — re-detection is
  *      idempotent; a replayed identical batch is filtered by an
  *      exact-signature anti-join, and a doc_id RE-INGESTED with
  *      changed text replaces its stale store rows, see
  *      `processBatch`).
  *
  * Store layout — the same manifest-committed protocol as `Scd2Store`
  * (rename-free, so commit atomicity holds on rename-as-copy stores
  * like S3A):
  * {{{
  *   <store>/_m/m<SEQ>   manifest: one committed FILE per line as
  *                       "<relpath>\t<minKey>\t<maxKey>" (the zone
  *                       map), trailing end-marker; published by a
  *                       CREATE-EXCLUSIVE write of a never-reused seq
  *                       — the close IS the commit
  *   <store>/d<SEQ>/part-*.parquet
  *                       PROBE INDEX: immutable exploded rows (one per
  *                       doc×band), sorted + range-split by the pid
  *                       key band_idx·BucketPartitions + bh; what the
  *                       per-batch candidate join prunes on
  *   <store>/r<SEQ>/part-*.parquet
  *                       DOC REGISTRY: one row per doc (doc_id +
  *                       signature), sorted + range-split by the
  *                       doc-hash dh — what the replay /
  *                       stale-re-ingest check prunes on (a doc_id
  *                       lookup can't prune the bucket-keyed index,
  *                       and scanning it per batch would re-introduce
  *                       the O(store) cost the layout exists to kill)
  * }}}
  * Both kinds are listed in the SAME manifest, so a batch's index
  * append and registry append commit atomically. The manifest IS the
  * file index (Iceberg's manifest-list idea, reduced to one file): a
  * reader never lists the filesystem, and pruning is an exact
  * driver-side selection over the recorded key ranges. Files — not
  * key=value directories — keep the small-batch write at ONE file per
  * store kind instead of one per touched partition leaf, which is
  * what keeps per-batch latency flat as batches accumulate (measured:
  * the 256-leaf directory layout cost ~320 new files per batch and
  * grew batch latency linearly with batch count).
  *
  * Readers resolve the newest COMPLETE manifest (end-marker present);
  * a crash mid-publish leaves a detectably-partial file that readers
  * skip and the next commit supersedes and GCs. Data directories not
  * referenced by the newest or previous manifest are GC'd at commit
  * (one retained generation for lazy readers, as in `Scd2Store`).
  * Batch appends add one directory each; when the committed directory
  * count passes `CompactThreshold` the store self-compacts, keeping
  * read fan-in bounded — same policy as the SCD2 segment log (a
  * size-tiered policy would cut the rewrite amplification further;
  * the fold here is rare enough that the simple policy wins on
  * auditability).
  */
object IncrementalDedup {
  /** q30's threshold: candidate pairs at ≥ half the signature agreeing. */
  val DefaultThreshold = 0.5

  /** Committed directory count that triggers an automatic compaction. */
  val CompactThreshold = 64

  /** Bucket-hash domain WITHIN each band — 4 bands × 64 = 256 prunable
    * pid values. Sized so a trickle batch (a handful of docs → a few
    * dozen bucket keys) prunes to a few percent of the store.
    * md5-derived like every other hash in the repo. */
  val BucketPartitions = 64

  /** Doc-hash domain for the registry's zone map — a batch of B docs
    * touches ≤ min(B, 64) dh values. */
  val DocPartitions = 64

  /** Target rows per written store file — the range-split granularity.
    * Mutable ONLY as a test seam (specs shrink it to force multi-file
    * stores at toy scale). */
  private[graft] var TargetRowsPerFile: Long = 1_000_000L

  private val EndMarker = "end"

  /** Exploded store row key — `band_idx * BucketPartitions + bh`: the
    * sort/range-split key of index files and the coordinate of their
    * manifest zone map. */
  private def pidCol: org.apache.spark.sql.Column =
    col("band_idx") * BucketPartitions + col("bh")

  /** Attach the bucket-hash partition column to exploded signature rows. */
  private[graft] def withBh(exploded: DataFrame): DataFrame =
    exploded.withColumn("bh",
      pmod(conv(substring(col("bucket"), 1, 15), 16, 10).cast("long"),
        lit(BucketPartitions.toLong)).cast("int"))

  /** Attach the doc-hash partition column to per-doc signature rows. */
  private def withDh(docSigs: DataFrame): DataFrame =
    docSigs.withColumn("dh",
      pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long"), lit(DocPartitions.toLong)).cast("int"))

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new HPath(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(root: String): HPath = new HPath(root, "_m")

  /** Numbered children `<prefix><id>` of `p`, any order. */
  private def listIds(fs: FileSystem, p: HPath, prefix: String): Seq[(Long, HPath)] =
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath)
      .filter(_.getName.startsWith(prefix))
      .flatMap(q => q.getName.drop(prefix.length).toLongOption.map(_ -> q))

  /** One committed data file: ROOT-RELATIVE path plus its zone map —
    * the [lo, hi] range of the file's pruning key (pid for `d` index
    * files, dh for `r` registry files; files are SORTED by that key, so
    * the range is tight). */
  private case class FileEntry(path: String, lo: Int, hi: Int) {
    def dir: String = path.takeWhile(_ != '/')
    def line: String = s"$path\t$lo\t$hi"
  }

  private case class StoreState(seq: Long, files: Seq[FileEntry]) {
    def dirs: Seq[String] = files.map(_.dir).distinct
  }

  /** Parse one manifest line, FAILING LOUDLY on malformed input: inside
    * an end-marker-validated (i.e. complete) manifest, a line that isn't
    * `path\tlo\thi` means corruption — silently dropping it would shrink
    * the committed file set and re-accept previously-seen duplicates,
    * the exact wrong-answer failure the store exists to prevent (same
    * fail-loud rule as Scd2Store's complete-but-corrupt manifests). */
  private def parseEntry(line: String): FileEntry =
    (line.split('\t') match {
      case Array(p, lo, hi) =>
        for (l <- lo.toIntOption; h <- hi.toIntOption) yield FileEntry(p, l, h)
      case _ => None
    }).getOrElse(throw new java.io.IOException(
      s"corrupt line in complete (end-marker-present) dedup-store manifest: " +
        s"'$line' is not path\\tlo\\thi"))

  /** Test-only read-race injection: invoked with the manifest path just
    * before open; a hook that deletes the file simulates a reader racing
    * a concurrent commit's manifest GC. */
  private[streaming] var readpoint: HPath => Unit = _ => ()

  /** Newest COMPLETE manifest (end-marker validated); partial files from
    * crashed publishes are skipped. A file that VANISHED between list and
    * open (reader racing a commit's manifest GC — a newer manifest exists
    * that the stale listing doesn't contain) triggers a re-list, exactly
    * as in `Scd2Store.latestManifest`: falling back to a lower seq would
    * exhaust to None (an empty store — silently re-accepting every dup). */
  private def latestState(spark: SparkSession, root: String): Option[StoreState] = {
    val fs = fsOf(spark, root)
    var attempts = 0
    while (attempts < 8) {
      var raced = false
      val found = listIds(fs, manifestDir(root), "m").sortBy(-_._1).iterator.flatMap {
        case (seq, p) =>
          try {
            readpoint(p)
            val in = fs.open(p)
            val lines =
              try new String(in.readAllBytes(), UTF_8).linesIterator.toSeq
              finally in.close()
            if (lines.lastOption.contains(EndMarker))
              Some(StoreState(seq,
                lines.dropRight(1).filter(_.nonEmpty).map(parseEntry)))
            else None
          } catch {
            case _: java.io.FileNotFoundException => raced = true; None
          }
      }.nextOption()
      if (found.isDefined || !raced) return found
      attempts += 1
    }
    throw new java.io.IOException(
      s"manifest listing for $root kept vanishing across 8 re-lists — " +
        "GC racing faster than reads can complete")
  }

  /** Fresh id strictly above every data dir and manifest ever written
    * (complete or partial), so names are never reused — what makes
    * create-exclusive publishes and crash-residue GC race-free under
    * the single-writer-per-store contract (Structured Streaming's
    * one-active-batch guarantee). */
  private def nextId(fs: FileSystem, root: String): Long =
    ((listIds(fs, new HPath(root), "d") ++ listIds(fs, new HPath(root), "r") ++
      listIds(fs, manifestDir(root), "m"))
      .map(_._1) :+ 0L).max + 1

  /** Publish `files` (with their zone maps) as the committed store
    * contents: create-exclusive manifest write, then GC of every data
    * DIRECTORY the new or PREVIOUS manifest doesn't reference. No
    * renames anywhere. */
  /** Test seam: runs between seq resolution and the exclusive manifest
    * create — the window where a concurrent writer's commit can land
    * (mirrors `Scd2Store.failpoint`). */
  private[streaming] var prePublish: () => Unit = () => ()

  private def commit(spark: SparkSession, root: String, files: Seq[FileEntry]): Unit = {
    val fs = fsOf(spark, root)
    fs.mkdirs(manifestDir(root))
    val prev = latestState(spark, root)
    // Manifest seq from the MANIFEST listing alone (highest ever seen,
    // complete or partial, +1 — Scd2Store's rule), NOT the shared
    // dir/manifest counter: two concurrent writers must resolve the
    // SAME next seq so the second create-exclusive write fails loudly.
    // Under the shared counter each writer's fresh data dirs pushed its
    // manifest seq past the other's and the older commit was silently
    // superseded — a lost update, not a conflict error.
    val seq = (listIds(fs, manifestDir(root), "m").map(_._1) :+ 0L).max + 1
    val dest = new HPath(manifestDir(root), s"m$seq")
    prePublish()
    val out = fs.create(dest, false) // exclusive: fails if the name exists
    try out.write((files.map(_.line) :+ EndMarker).mkString("\n").getBytes(UTF_8))
    finally out.close()
    // GC below only removes UNREFERENCED paths — a crash here leaves
    // harmless garbage, cleaned by the next commit. Granularity is the
    // d<SEQ>/r<SEQ> directory: directories are immutable once committed.
    val keepDirs = files.map(_.dir).toSet ++
      prev.fold(Set.empty[String])(_.dirs.toSet)
    (listIds(fs, new HPath(root), "d") ++ listIds(fs, new HPath(root), "r"))
      .map(_._2)
      .filterNot(p => keepDirs.contains(p.getName))
      .foreach(p => fs.delete(p, true))
    val keepM = Set(seq) ++ prev.map(_.seq)
    listIds(fs, manifestDir(root), "m")
      .filterNot { case (s, _) => keepM.contains(s) }
      .foreach { case (_, p) => fs.delete(p, false) }
  }

  /** Committed file entries. */
  private def committedFiles(spark: SparkSession, root: String): Seq[FileEntry] =
    latestState(spark, root).fold(Seq.empty[FileEntry])(_.files)

  /** Committed directory names, for maintenance and tests. */
  private[streaming] def committedDirs(spark: SparkSession, root: String): Seq[String] =
    latestState(spark, root).fold(Seq.empty[String])(_.dirs)

  /** Read a set of committed files as ONE scan — plain paths, uniform
    * schema, NO filesystem listing anywhere on the read path: the
    * manifest IS the file index. */
  private def readFiles(spark: SparkSession, storeDir: String,
                        files: Seq[FileEntry]): Option[DataFrame] = {
    if (files.isEmpty) return None
    // _k is the stored copy of the sort key (kept so file footers carry
    // its min/max statistics — the zone-map source); data readers never
    // want it. Dropping a missing column is a no-op, so pre-_k stores
    // read unchanged.
    Some(spark.read.parquet(
      files.map(f => new HPath(storeDir, f.path).toString): _*).drop("_k"))
  }

  private def readDirs(spark: SparkSession, storeDir: String,
                       prefix: String): Option[DataFrame] =
    readFiles(spark, storeDir,
      committedFiles(spark, storeDir).filter(_.path.startsWith(prefix)))

  /** The committed DOC REGISTRY as one DataFrame (None when empty): one
    * row per doc (doc_id, mh0..mh{k-1}, dh) — the per-doc signature
    * view. The band columns are pure functions of the mh columns, so
    * equality on mh alone is exactly signature equality. */
  private[graft] def storeSigs(spark: SparkSession, storeDir: String): Option[DataFrame] =
    readDirs(spark, storeDir, "r")

  /** The committed PROBE INDEX as one DataFrame (None when empty):
    * exploded rows (doc_id, mh0..mh{k-1}, bucket, band_idx, bh) with
    * band_idx/bh recovered from the directory layout as partition
    * columns. */
  private[graft] def storeIndex(spark: SparkSession, storeDir: String): Option[DataFrame] =
    readDirs(spark, storeDir, "d")

  /** The index read a probe batch actually performs: only the
    * (band_idx, bh) partition directories in `pids` — a filter on
    * partition columns alone, pruned at planning time. Exposed for the
    * spec and the scale harness to measure rows-read against store
    * size. */
  /** Zone-map file selection: keep files whose [lo, hi] key range
    * contains any wanted key. */
  private def rangeHit(files: Seq[FileEntry], keys: Seq[Int]): Seq[FileEntry] = {
    val sorted = keys.sorted
    files.filter(f => {
      // any key in [lo, hi]? — binary search for the first key ≥ lo
      val i = java.util.Arrays.binarySearch(sorted.toArray, f.lo)
      val at = if (i >= 0) i else -i - 1
      at < sorted.length && sorted(at) <= f.hi
    })
  }

  private[graft] def storeProbe(spark: SparkSession, storeDir: String,
                                pids: Seq[Int]): Option[DataFrame] = {
    val hit = rangeHit(
      committedFiles(spark, storeDir).filter(_.path.startsWith("d")), pids)
    // zone maps select candidate FILES; the residual filter makes the
    // row set exact (a file's range can cover keys the batch lacks)
    readFiles(spark, storeDir, hit).map(_.filter(pidCol.isin(pids: _*)))
  }

  /** The registry read a batch's replay/stale check performs: only the
    * files whose dh range intersects the batch's (exact manifest-level
    * selection). When the registry exists but no file matches, an EMPTY
    * frame (not None) is returned — the distinction between "no store
    * yet" (first batch: plain append) and "store present, these docs
    * unseen". */
  private def registryProbe(spark: SparkSession, storeDir: String,
                            dhs: Seq[Int]): Option[DataFrame] = {
    val reg = committedFiles(spark, storeDir).filter(_.path.startsWith("r"))
    if (reg.isEmpty) return None
    val hit = rangeHit(reg, dhs)
    readFiles(spark, storeDir, hit)
      .map(_.filter(col("dh").isin(dhs: _*)))
      .orElse(readFiles(spark, storeDir, reg.take(1)).map(_.limit(0)))
  }

  /** Touched partition ids of a batch's exploded rows — bounded by the
    * 4×`BucketPartitions` = 256-value pid domain, so the collect is a
    * constant-size driver read regardless of batch size. */
  private def touchedPids(exploded: DataFrame): Seq[Int] =
    exploded.select(pidCol.cast("int").as("pid")).distinct()
      .collect().map(_.getInt(0)).toSeq

  /** Both touched-partition HISTOGRAMS of a batch in ONE job: the pid
    * cells of the exploded index rows (≤ 4×`BucketPartitions`) unioned
    * with the dh cells of the registry rows (≤ `DocPartitions`). The
    * keys drive the store/registry pruning exactly as the two distinct
    * collects did; the counts additionally size the append writes below
    * (each registry row explodes to exactly `bands` index rows, so no
    * later sizing scan is needed). Output stays bounded by the two
    * partition domains — never batch-sized. */
  private def touchedHist(exploded: DataFrame, docSigs: DataFrame)
      : Array[(String, Int, Long)] =
    exploded.groupBy(pidCol.cast("int").as("k")).agg(count(lit(1)).as("c"))
      .withColumn("kind", lit("p"))
      .unionByName(docSigs.groupBy(col("dh").as("k"))
        .agg(count(lit(1)).as("c")).withColumn("kind", lit("d")))
      .collect().map(r => (r.getString(2), r.getInt(0), r.getLong(1)))

  /** Write a frame to a fresh immutable directory as range-split sorted
    * files and return its manifest entries: rows are range-partitioned
    * on `key` into ceil(rows / TargetRowsPerFile) files (ONE file for a
    * typical micro-batch — the flat-latency property; the 256-leaf
    * directory layout this replaced wrote ~320 files per batch and
    * made batch latency grow linearly with batch count), sorted by
    * (`key`, `tiebreak`) within each file, and each file's [min, max]
    * key is read back as its manifest zone map — ONE bounded read at
    * WRITE time so the read path never lists or probes anything. The
    * directory is invisible (unreferenced) until a manifest commit
    * includes its files; residue from crashed attempts is GC'd later. */
  private def writeSorted(spark: SparkSession, root: String, prefix: String,
                          df: DataFrame, key: org.apache.spark.sql.Column,
                          tiebreak: String,
                          knownRows: Option[Long] = None): Seq[FileEntry] = {
    val fs = fsOf(spark, root)
    val name = s"$prefix${nextId(fs, root)}"
    // sizing: callers that already know the exact row count (the batch
    // append derives it from the bounded touched-partition histograms)
    // pass it in, making this write a SINGLE data pass; otherwise one
    // sizing count runs first (stale rewrite / compaction, whose inputs
    // are localCheckpoint'd so the count reads pinned blocks)
    val rows = knownRows.getOrElse(df.count())
    val nFiles = math.max(1L, (rows + TargetRowsPerFile - 1) / TargetRowsPerFile).toInt
    val destPath = new HPath(root, name)
    // the write itself. The sort key is KEPT as the stored
    // _k column so every file's parquet footer carries exact min/max
    // statistics for it — the zone maps below are then a driver-side
    // METADATA read of the footers, not a third scan of the batch
    // (which at high batch rates was ~⅓ of per-batch write cost).
    val keyed = df.withColumn("_k", key.cast("int"))
    // single-file micro-batch (the overwhelmingly common case): a
    // 1-partition repartitionByRange still runs its hidden range-
    // SAMPLING job plus a full exchange before the write — a coalesce
    // to one partition needs neither (the in-partition sort is the
    // same), which drops two of the ~8 jobs each store append pays
    val parts =
      if (nFiles == 1) keyed.coalesce(1)
      else keyed.repartitionByRange(nFiles, col("_k"))
    parts
      .sortWithinPartitions(col("_k"), col(tiebreak))
      .write.mode(SaveMode.Overwrite)
      .parquet(destPath.toString)
    val conf = spark.sparkContext.hadoopConfiguration
    fs.listStatus(destPath).toSeq.map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
      .flatMap(p => graft.core.Footers.intRange(p, conf, "_k")
        .map { case (lo, hi) => FileEntry(s"$name/${p.getName}", lo, hi) })
      .sortBy(_.path)
  }

  /** Index write: exploded rows range-split by pid, bucket tiebreak. */
  private def writeIndexDir(spark: SparkSession, root: String, df: DataFrame,
                            knownRows: Option[Long] = None): Seq[FileEntry] =
    writeSorted(spark, root, "d", df, pidCol, "bucket", knownRows)

  /** Registry write: per-doc rows range-split by dh, doc_id tiebreak. */
  private def writeRegistryDir(spark: SparkSession, root: String, df: DataFrame,
                               knownRows: Option[Long] = None): Seq[FileEntry] =
    writeSorted(spark, root, "r", df, col("dh"), "doc_id", knownRows)

  /** Process one micro-batch of (doc_id, text): emit duplicate verdicts
    * (doc_id, dup_of, est_jaccard) against the store and earlier batch
    * docs, then append the batch's signatures to the store. Callable
    * directly (batch mode) or from `stream`'s foreachBatch.
    * `compactAfter` overrides the auto-compaction trigger — the q98
    * gate shrinks it so a short drive crosses real fold boundaries. */
  def processBatch(batchDocs: DataFrame, storeDir: String,
                   threshold: Double = DefaultThreshold,
                   compactAfter: Int = CompactThreshold,
                   precomputedSigs: Option[DataFrame] = None): DataFrame = {
    import graft.core.Prof
    val spark = batchDocs.sparkSession
    // `precomputedSigs` lets a caller driving SEVERAL stores over the
    // same batches (q94/q98 share identical 5-batch ingest) pay the
    // shingle/minhash aggregation once: signatures are a pure function
    // of the batch text, so a spilled copy is store-independent.
    val batchSigs = precomputedSigs
      .getOrElse(Dedup.minhashBandedSignatures(batchDocs)).persist()
    // the batch in store-row shapes: exploded index rows + registry rows
    val xRows = withBh(Dedup.explodeBandBuckets(batchSigs)).persist()
    val batchReg = withDh(batchSigs.drop(
      batchSigs.columns.filter(_.startsWith("band")): _*)).persist()
    // profiling-only materialization: attributes the signature build
    // separately from the probe that would otherwise trigger it lazily
    if (Prof.enabled) Prof("q94 sig build") { batchSigs.count() }

    // ONE bounded job materializes both persisted batch shapes and
    // returns the touched pid/dh histograms: the keys drive the store
    // and registry pruning, the counts size the append writes (the two
    // distinct-collects this replaces each ran their own job).
    val hist = Prof("q94 touched") { touchedHist(xRows, batchReg) }
    val pids = hist.collect { case ("p", k, _) => k }.toSeq
    val dhs = hist.collect { case ("d", k, _) => k }.toSeq
    val xTotal = hist.collect { case ("p", _, c) => c }.sum
    val regTotal = hist.collect { case ("d", _, c) => c }.sum
    // exploded index rows per registry row — exact: posexplode of the
    // band-column array emits one row per band, unconditionally
    val bands = batchSigs.columns.count(_.startsWith("band")).toLong

    // candidate targets: the PRUNED store index (only the partitions the
    // batch's own buckets hash into — the read that stays O(touched) as
    // the store grows) + earlier batch ids. Store rows whose doc_id is
    // IN the current batch are replay residue (a retried batch whose
    // signatures were already appended): keep only the batch-row copy of
    // those docs, or the earlier member of a within-batch pair would
    // match the later member's STORE row — bypassing the earlier-id-wins
    // guard below and flipping it from unique to dup on replay. With the
    // residue removed, a replay joins against exactly the first run's
    // candidate set, so verdicts are bit-identical. No candidate is lost
    // to pruning: a matching store row shares the batch row's bucket,
    // hence its (band_idx, bh) partition.
    val store = Prof("q94 probe") { storeProbe(spark, storeDir, pids) }
    val target = store match {
      case Some(st) => st
        .join(batchSigs.select("doc_id"), Seq("doc_id"), "left_anti")
        .withColumn("is_store", lit(true))
        .unionByName(xRows.withColumn("is_store", lit(false)))
      case None => xRows.withColumn("is_store", lit(false))
    }
    val x = xRows.as("x")
    val y = target.as("y")
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
    // Replay and stale detection are doc_id lookups, so they prune the
    // DOC REGISTRY by the batch's dh partitions (≤ min(batch, 64) of
    // them) — never a scan of either store kind. An identical replay's
    // registry rows land in the same dh partitions (same doc_ids), so
    // the pruned read always sees them.
    val sigCols = batchReg.columns.toSeq.filterNot(_ == "dh")
    val reg = Prof("q94 registry probe") {
      registryProbe(spark, storeDir, dhs)
    }
    // The replay/stale flags: the registry probe joins the batch once
    // on doc_id and a null-safe all-columns equality flag splits
    // exact-replay ids (signature unchanged) from stale ids (changed
    // text); registry rows are unique per doc_id on both sides, so the
    // doc_id join + flag is exactly that partition of ids.
    val sigOnly = sigCols.filterNot(_ == "doc_id")
    val flagsOpt = reg.map { rg =>
      rg.as("r").join(batchReg.as("n"), Seq("doc_id"))
        .select(col("doc_id"),
          sigOnly.map(c => col(s"r.$c") <=> col(s"n.$c"))
            .reduce(_ && _).as("is_exact"))
    }

    // Pin the verdicts AND the flags in ONE job BEFORE mutating the
    // store: both read pre-commit store directories that the commit
    // below can GC from under a lazy plan. localCheckpoint truncates
    // the lineage eagerly, so the results are immune to the mutation.
    // (Two separate checkpoints here were two jobs; the union is the
    // same two independent subtrees scheduled once.)
    val vTypes = verdicts.schema.fields.map(f => f.name -> f.dataType).toMap
    val tagged = verdicts
      .withColumn("is_exact", lit(null).cast("boolean"))
      .withColumn("_t", lit("v"))
    val pinned = Prof("q94 verdicts") {
      flagsOpt.fold(tagged) { f =>
        tagged.unionByName(f.select(col("doc_id"),
          lit(null).cast(vTypes("dup_of")).as("dup_of"),
          lit(null).cast(vTypes("est_jaccard")).as("est_jaccard"),
          col("is_exact"), lit("f").as("_t")))
      }.localCheckpoint(true)
    }
    val out = pinned.filter(col("_t") === "v")
      .select("doc_id", "dup_of", "est_jaccard")
    val flags = pinned.filter(col("_t") === "f")
      .select(col("doc_id"), col("is_exact"))
    // exact-replay / stale counts: one bounded job over the pinned
    // flags (replaces the two isEmpty gates AND — with the histogram
    // counts above — both writeSorted sizing scans of the fresh path)
    val (exactCnt, staleCnt) =
      if (flagsOpt.isEmpty) (0L, 0L)
      else {
        val fc = flags.groupBy("is_exact").count().collect()
          .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
        (fc.getOrElse(true, 0L), fc.getOrElse(false, 0L))
      }

    // Store maintenance — re-ingest semantics (one registry row per
    // doc_id, the LATEST text wins):
    //  * unseen doc_id             → appended (the common case);
    //  * identical signature again → no-op (idempotent batch replay —
    //    no write, no commit);
    //  * CHANGED signature (the doc was re-ingested with new text) →
    //    both store kinds are rewritten without the stale rows (rare;
    //    the rewrite directories are invisible until the manifest
    //    commit publishes them, so a crash at any point leaves the old
    //    store).
    // Verdicts above already used the batch copy for in-batch ids, so a
    // replay after any crash point below re-emits identical verdicts.
    // The fresh frames stay LAZY and are executed exactly once (their
    // write): their lineage reads only the persisted batch frames plus
    // the checkpointed flags, never a store directory, so the commit's
    // GC cannot invalidate them.
    Prof("q94 maintain+commit") {
      if (staleCnt > 0) {
        // stale rewrite: the one full-store pass, taken only when a
        // doc actually changed text (rare); both kinds fold to one
        // fresh directory each, committed together. These DO read the
        // pre-commit store, but stay LAZY: every execution (the sizing
        // count, the write) happens BEFORE the commit GCs the old
        // directories, and NOT pinning them means the store is never
        // buffered wholesale in executor blocks — at production store
        // sizes a re-scan of immutable parquet beats checkpointing the
        // entire store.
        val exactIds = flags.filter(col("is_exact")).select("doc_id")
        val staleIds = flags.filter(!col("is_exact")).select("doc_id")
        val newIdx = storeIndex(spark, storeDir).get
          .join(staleIds, Seq("doc_id"), "left_anti")
          .unionByName(xRows.join(exactIds, Seq("doc_id"), "left_anti"))
        val newReg = storeSigs(spark, storeDir).get
          .join(staleIds, Seq("doc_id"), "left_anti")
          .unionByName(batchReg.join(exactIds, Seq("doc_id"), "left_anti"))
        commit(spark, storeDir,
          writeIndexDir(spark, storeDir, newIdx) ++
            writeRegistryDir(spark, storeDir, newReg))
      } else if (regTotal > exactCnt) {
        // fresh-only append (the common case): row counts are exact
        // from the touched histograms, so each write is a single pass
        // with no sizing scan; with zero replays the batch frames are
        // appended as-is, no anti-join in the plan at all
        val (freshIdx, freshReg) =
          if (exactCnt == 0L) (xRows, batchReg)
          else {
            val exactIds = flags.filter(col("is_exact")).select("doc_id")
            (xRows.join(exactIds, Seq("doc_id"), "left_anti"),
              batchReg.join(exactIds, Seq("doc_id"), "left_anti"))
          }
        val added = writeIndexDir(spark, storeDir, freshIdx,
          Some(xTotal - bands * exactCnt)) ++
          writeRegistryDir(spark, storeDir, freshReg,
            Some(regTotal - exactCnt))
        commit(spark, storeDir, committedFiles(spark, storeDir) ++ added)
      }
      // regTotal == exactCnt: every batch doc is an identical replay
      // (or the batch is empty) — no write, no commit
    }
    batchSigs.unpersist(); xRows.unpersist(); batchReg.unpersist()
    // bound read fan-in: two directories per batch accumulate — fold
    // rarely, amortized O(1) per batch (same policy as the SCD2 log)
    if (committedDirs(spark, storeDir).size > compactAfter)
      Prof("q94 compact") { compactStore(spark, storeDir) }
    out
  }

  /** Compact the store's accumulated batch directories into one
    * directory per kind (index + registry, each still partitioned by
    * its pruning key, one file per leaf). Run rarely (auto-triggered
    * past `CompactThreshold`, or manually) — the store contents are
    * unchanged, so detection before and after compaction is identical.
    * Crash safety: the compacted directories are invisible until the
    * manifest commit publishes them; a crash leaves the old manifest
    * current and the next attempt writes fresh directories. */
  def compactStore(spark: SparkSession, storeDir: String): Unit = {
    // localCheckpoint: the writes must not re-read the old store dirs
    // lazily AFTER the commit below GCs them
    val idx = storeIndex(spark, storeDir).map(_.localCheckpoint(true))
    val reg = storeSigs(spark, storeDir).map(_.localCheckpoint(true))
    if (idx.isDefined || reg.isDefined)
      commit(spark, storeDir,
        idx.toSeq.flatMap(df => writeIndexDir(spark, storeDir, df)) ++
          reg.toSeq.flatMap(df => writeRegistryDir(spark, storeDir, df)))
  }

  /** Measurement hook (spec + scale harness): the index rows a probe of
    * `batchDocs` reads under partition pruning vs the full index, plus
    * the touched/total leaf-partition counts. */
  private[graft] case class ProbeFootprint(
      rowsRead: Long, rowsTotal: Long, touchedLeaves: Int, totalLeaves: Int)
  private[graft] def probeFootprint(spark: SparkSession, storeDir: String,
                                    batchDocs: DataFrame): ProbeFootprint = {
    val x = withBh(Dedup.explodeBandBuckets(Dedup.minhashBandedSignatures(batchDocs)))
    val pids = touchedPids(x)
    ProbeFootprint(
      rowsRead = storeProbe(spark, storeDir, pids).map(_.count()).getOrElse(0L),
      rowsTotal = storeIndex(spark, storeDir).map(_.count()).getOrElse(0L),
      touchedLeaves = pids.size,
      totalLeaves = 4 * BucketPartitions)
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
