package graft.sds

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Schemas.MaxBlockNum

/** SCD Type 2 merge machinery (SURVEY.md §2.4, W1-W5).
  *
  * Tables are block-interval versioned: a row is valid on
  * `[start_block_num, end_block_num)`, the live version has
  * `end_block_num = MAX_BLOCK_NUM` (reference `src/event_handler.rs`
  * at_block impls). All operations below are set-wise DataFrame
  * transformations — a whole micro-batch of blocks merges in one pass
  * (window over version starts), no per-row driver loops — so the same
  * code scales from the local test store to a cluster; at 100 TB the
  * store layer would be swapped for Delta/Iceberg MERGE while this
  * version-chaining logic stays identical.
  *
  * Versioning model: `entityKey` is the close-out scope (the parent
  * entity's PK). An update at block b replaces the entity's child-row set
  * wholesale: previous versions close at b (W2), and re-applying the same
  * block is a no-op (exactly-once via idempotent merge, SURVEY §7.4).
  */
object Scd2 {

  /** Merge a batch of new entity versions into an existing SCD2 table.
    *
    * @param existing  current table contents
    * @param updates   new rows stamped (start_block_num=b, end_block_num=MAX)
    * @param entityKey columns identifying the entity whose version chain
    *                  advances (e.g. organization_id for contacts)
    * @param versionEvents optional extra (entityKey..., start_block_num)
    *                  version markers: a parent entity updated at block b
    *                  versions its child-row set even when the new set is
    *                  EMPTY — without the marker, removed children would
    *                  never close (no update row ⇒ no chain event)
    */
  def merge(existing: DataFrame, updates: DataFrame, entityKey: Seq[String],
            versionEvents: Option[DataFrame] = None): DataFrame = {
    val cols = existing.columns.toSeq
    val keyCols = entityKey.map(col)
    val versionCols = entityKey :+ "start_block_num"

    // Version events of this batch: every (entityKey, start) that has new
    // rows, plus the explicit markers.
    val newVersions = versionEvents.fold(
      updates.select(versionCols.map(col): _*))(ev =>
        updates.select(versionCols.map(col): _*)
          .unionByName(ev.select(versionCols.map(col): _*)))
      .distinct()

    // A version event replaces any stored rows of the same entity version
    // wholesale → idempotent replay.
    val kept = existing.join(newVersions, versionCols, "left_anti")

    val combined = kept.select(cols.map(col): _*)
      .unionByName(updates.select(cols.map(col): _*))

    // Close-out (W2): each version ends where the entity's next version
    // event occurs; rows already closed earlier (assertion DELETE, W3)
    // keep their earlier end. Markers participate as chain events so an
    // empty replacement set still closes the previous rows.
    val w = Window.partitionBy(keyCols: _*).orderBy(col("start_block_num"))
    val versions = combined
      .select(versionCols.map(col): _*).distinct()
      .unionByName(newVersions)
      .distinct()
      .withColumn("_next_start", lead(col("start_block_num"), 1).over(w))

    combined
      .join(versions, versionCols)
      .withColumn("end_block_num",
        least(col("end_block_num"), coalesce(col("_next_start"), lit(MaxBlockNum))))
      .select(cols.map(col): _*)
  }

  /** W3: close rows matched by `keyCol` at the earliest delete falling
    * inside their validity interval — no replacement row. Handles
    * multiple deletes (and delete/re-create chains) within one batch:
    * each row is clamped by its own earliest applicable delete, not a
    * batch-global minimum. Requires (keyCol, start_block_num) to
    * identify rows (true for assertions). `deletes` = (block_num,
    * <keyCol>); tiny per batch → broadcast. */
  def applyDeletes(table: DataFrame, deletes: DataFrame, keyCol: String): DataFrame = {
    val cols = table.columns.toSeq
    val d = broadcast(deletes.select(col(keyCol).as("_del_key"),
      col("block_num").as("_del_block")))
    val clamps = table.select(col(keyCol), col("start_block_num"), col("end_block_num"))
      .join(d, col(keyCol) === col("_del_key") &&
        col("start_block_num") <= col("_del_block") &&
        col("end_block_num") > col("_del_block"))
      .groupBy(col(keyCol), col("start_block_num"))
      .agg(min(col("_del_block")).as("_clamp"))
    table
      .join(broadcast(clamps), Seq(keyCol, "start_block_num"), "left")
      .withColumn("end_block_num",
        when(col("_clamp").isNotNull, least(col("end_block_num"), col("_clamp")))
          .otherwise(col("end_block_num")))
      .select(cols.map(col): _*)
  }

  /** W4 fork rewind: drop versions born at or after the fork point and
    * re-open versions that were closed by orphaned blocks. */
  def rewind(table: DataFrame, forkBlock: Long): DataFrame =
    table
      .filter(col("start_block_num") < forkBlock)
      .withColumn("end_block_num",
        when(col("end_block_num") >= forkBlock, lit(MaxBlockNum))
          .otherwise(col("end_block_num")))
}

/** Parquet-backed store for the SDS reporting tables — incremental
  * live/history layout (SURVEY.md §4 partitioning, taken further):
  *
  * ```
  * <root>/<table>/live/v<N>/     one row per live entity; rewritten per
  *                               batch, LIVE pointer flips atomically
  * <root>/<table>/history/b<T>/  rows CLOSED by batch T; append-only
  * <root>/blocks/v<N>/           commit log (small, versioned rewrite)
  * ```
  *
  * Why: SCD2 history is immutable except at a fork — only the live set
  * changes per batch. Appending the newly-closed rows and rewriting just
  * the (bounded) live set makes per-batch write cost O(live + batch),
  * INDEPENDENT of history depth — the property that keeps ingest flat at
  * 100 TB of accumulated history. Current-state queries read `live/`
  * alone; as-of/history queries union both.
  *
  * Exactly-once: a history directory is named by its batch's max block
  * and never rewritten once committed (`_SUCCESS`); replaying the last
  * batch (the streaming-checkpoint recovery contract — at most one
  * uncommitted batch re-runs) skips the committed append and recomputes
  * the identical live set. A fork rewind compacts history (rare, W4).
  * Production swap-in: Delta/Iceberg MERGE keeps this exact layout idea
  * as partition `live = end_block_num = MAX`.
  */
final class Scd2Store(spark: SparkSession, root: String) {
  import java.nio.file.{Files, Paths, Path}
  import scala.jdk.CollectionConverters._

  private def dir(name: String): Path = Paths.get(root, name)
  private def livePointer(name: String): Path = dir(name).resolve("LIVE")
  private def historyDir(name: String): Path = dir(name).resolve("history")

  private def currentVersion(name: String): Option[Int] =
    if (Files.exists(livePointer(name)))
      Some(Files.readString(livePointer(name)).trim.toInt)
    else None

  private def empty(name: String): DataFrame = {
    val schema = if (name == "blocks") Schemas.blocksTable else Schemas.tables(name)._1
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** NIO streams hold a directory fd until closed — always scope them. */
  private def withStream[A](s: java.util.stream.Stream[Path])(f: Iterator[Path] => A): A =
    try f(s.iterator.asScala) finally s.close()

  private def hasParquet(p: Path): Boolean =
    Files.exists(p) && withStream(Files.walk(p))(
      _.exists(_.getFileName.toString.endsWith(".parquet")))

  /** Committed history batch directories. */
  private def historyPaths(name: String): Seq[String] =
    if (!Files.isDirectory(historyDir(name))) Seq.empty
    else withStream(Files.list(historyDir(name)))(
      _.filter(p => !p.getFileName.toString.endsWith("-staging") &&
        Files.exists(p.resolve("_SUCCESS")) && hasParquet(p))
        .map(_.toString).toSeq.sorted)

  /** Live-state view (Q1): one row per entity, read from the live set
    * alone — cost independent of history depth. */
  def live(name: String): DataFrame =
    currentVersion(name) match {
      case Some(v) =>
        val p = dir(name).resolve(s"live/v$v")
        if (hasParquet(p)) spark.read.parquet(p.toString) else empty(name)
      case None => empty(name)
    }

  def table(name: String): DataFrame = {
    if (name == "blocks") return blocks()
    val hist = historyPaths(name)
    if (hist.isEmpty) live(name)
    else live(name).unionByName(spark.read.parquet(hist: _*))
  }

  private def writeLive(name: String, df: DataFrame): Unit = {
    val prev = currentVersion(name)
    val next = prev.getOrElse(-1) + 1
    val target = dir(name).resolve(s"live/v$next")
    df.write.mode("overwrite").parquet(target.toString)
    Files.createDirectories(dir(name))
    Files.writeString(livePointer(name), next.toString)
    prev.foreach(v => deleteRecursively(dir(name).resolve(s"live/v$v")))
  }

  // ---- blocks commit log: append-only segment layout -------------------
  //
  // <root>/blocks/segs/s<T>/  one segment per batch (tag T = batch max
  // block), never rewritten once committed; reads reconcile last-id-wins
  // by segment tag. Why: the old versioned-rewrite layout re-wrote the
  // whole chain every batch — O(chain) write amplification that grows
  // forever; appending a segment is O(batch), and a rare fold (fork, or
  // segment count past BlockCompactThreshold) keeps read fan-in bounded.

  private def blockSegRoot: Path = dir("blocks").resolve("segs")

  private def blockSegPaths: Seq[Path] =
    if (!Files.isDirectory(blockSegRoot)) Seq.empty
    else withStream(Files.list(blockSegRoot))(
      _.filter(p => !p.getFileName.toString.endsWith("-staging") &&
        Files.exists(p.resolve("_SUCCESS")) && hasParquet(p))
        .toSeq.sortBy(_.getFileName.toString))

  /** Reconciled commit log: last block_id per block_num wins, by segment
    * tag (D4 across batches). Distributed — nothing driver-side. */
  def blocks(): DataFrame = {
    val segs = blockSegPaths
    if (segs.isEmpty) empty("blocks")
    else spark.read.parquet(segs.map(_.toString): _*)
      .groupBy("block_num")
      .agg(max_by(col("block_id"), col("_seg")).as("block_id"))
  }

  /** W5 append: one O(batch) segment, idempotent by committed tag (replay
    * of the last checkpointed batch skips the write). */
  def appendBlocks(batch: DataFrame, tag: Long): Unit = {
    val target = blockSegRoot.resolve(s"s$tag")
    if (!Files.exists(target.resolve("_SUCCESS"))) {
      deleteRecursively(target) // partial write from a crash
      batch.withColumn("_seg", lit(2 * tag))
        .write.mode("overwrite").parquet(target.toString)
    }
    if (blockSegPaths.size > Scd2Store.BlockCompactThreshold)
      compactBlocks(blocks(), tag)
  }

  /** Fold the log into one segment — fork rewind (W4) or periodic
    * compaction.
    *
    * Crash ordering: the staging write EXECUTES the read of the old
    * segments (fold fully materialized first), the fold is PROMOTED
    * before any old segment is deleted, and only then are the old
    * segments removed. A crash at any point leaves a readable log:
    * before the move → old segments intact (fold re-derivable); after
    * the move, mid-delete → fold + leftover old segments, which
    * `blocks()` reconciles by max `_seg` (the fold's tag is highest, so
    * it wins for every block_num it covers). The one visible remnant —
    * fork-orphaned block_nums absent from a rewound fold but present in
    * a leftover segment — is healed when Structured Streaming replays
    * the uncommitted batch and re-runs this compaction. The commit log
    * is never empty or lost. */
  def compactBlocks(full: DataFrame, tag: Long): Unit = {
    val staging = blockSegRoot.resolve(s"c$tag-staging")
    deleteRecursively(staging)
    // rank 2·tag+1 vs a plain segment's 2·tag: a fold STRICTLY outranks
    // the same-tag segment it folded, so the crash window between the
    // move and old-segment deletion can never leave a max_by tie — a
    // fork-rewound fold deterministically wins over the orphan segment
    // it superseded
    full.withColumn("_seg", lit(2 * tag + 1))
      .write.mode("overwrite").parquet(staging.toString)
    val old = blockSegPaths // captured before the fold becomes visible
    deleteRecursively(blockSegRoot.resolve(s"c$tag"))
    Files.move(staging, blockSegRoot.resolve(s"c$tag"))
    old.foreach(deleteRecursively)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      withStream(Files.walk(p))(_.toSeq.reverse.foreach(Files.delete))

  /** Apply a merged batch result: newly-closed rows append to history
    * (idempotent: skipped when batch `tag` already committed), the live
    * remainder rewrites the live set. */
  def applyMerged(name: String, merged: DataFrame, tag: Long): Unit = {
    merged.persist()
    try {
      val target = historyDir(name).resolve(s"b$tag")
      val committed = Files.exists(target.resolve("_SUCCESS"))
      if (!committed) {
        deleteRecursively(target) // partial write from a crash
        val closed = merged.filter(col("end_block_num") =!= MaxBlockNum)
        if (!closed.isEmpty)
          closed.write.mode("overwrite").parquet(target.toString)
      }
      writeLive(name, merged.filter(col("end_block_num") === MaxBlockNum))
    } finally merged.unpersist()
  }

  /** Fork path (W4): the rewound table replaces everything — history is
    * compacted into one directory and the live set rewritten. A crash in
    * the middle of the (rare) compaction can require replaying from one
    * batch earlier; the transactional production store (Delta/Iceberg)
    * closes that window. */
  def compactTo(name: String, full: DataFrame, tag: Long): Unit = {
    full.persist()
    try {
      val closed = full.filter(col("end_block_num") =!= MaxBlockNum)
      val staging = historyDir(name).resolve(s"compact$tag-staging")
      deleteRecursively(staging)
      val hasClosed = !closed.isEmpty
      if (hasClosed) closed.write.mode("overwrite").parquet(staging.toString)
      writeLive(name, full.filter(col("end_block_num") === MaxBlockNum))
      historyPaths(name).foreach(p => deleteRecursively(Paths.get(p)))
      if (hasClosed)
        Files.move(staging, historyDir(name).resolve(s"b$tag"))
    } finally full.unpersist()
  }

  /** Point-in-time view (Q2): state as of block b. */
  def asOf(name: String, block: Long): DataFrame =
    table(name).filter(col("start_block_num") <= block && col("end_block_num") > block)

  /** Highest stored block (catch-up cursor, `src/main.rs:57-63`). */
  def maxBlock(): Option[Long] = {
    val rows = table("blocks").agg(max("block_num")).collect()
    Option(rows(0).get(0)).map(_.asInstanceOf[Long])
  }

  /** S3: last `count` known block ids, newest first; genesis fallback
    * NULL_BLOCK_ID (`src/subscriber.rs:20-21,153-178`). */
  def lastKnownBlockIds(count: Int = graft.sources.Negotiate.KnownCount): Seq[String] = {
    val ids = table("blocks").orderBy(col("block_num").desc)
      .select("block_id").limit(count).collect().map(_.getString(0)).toSeq
    if (ids.isEmpty) Seq(graft.sources.Negotiate.NullBlockId) else ids
  }
}

object Scd2Store {
  /** Segment count that triggers a blocks-log fold: high enough that the
    * amortized rewrite cost stays O(1) per batch, low enough that the
    * read fan-in (one parquet listing per segment) stays trivial. */
  val BlockCompactThreshold = 64
}
