package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog and then runs far away home"
  private val nearCopy =
    "the quick brown fox jumps over the lazy dog and then runs far away house"
  private val unrelated =
    "completely different words about spark shuffles joins aggregates and windows"

  private def docsDf(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("doc_id", "text")

  test("cross-batch and within-batch near-dups detected; store appends are idempotent") {
    val store = tempDir("inc-dedup-store") + "/sigs"

    // batch 1: two originals
    val v1 = IncrementalDedup.processBatch(docsDf(1L -> base, 2L -> unrelated), store)
    assert(v1.isEmpty, "first batch has no duplicates")

    // batch 2: near-copy of doc 1, exact copy of doc 2, a fresh doc,
    // and a within-batch pair (20 ~ 21: 21 should point at 20)
    val batchPair =
      "rivers mountains valleys forests deserts oceans islands cliffs meadows plains tundra glaciers"
    val v2 = IncrementalDedup.processBatch(
      docsDf(10L -> nearCopy, 11L -> unrelated, 12L -> (base + " entirely novel suffix words appended here making it long enough to differ"),
        20L -> batchPair, 21L -> batchPair), store)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(v2(10L) === 1L, s"near-copy should match doc 1: $v2")
    assert(v2(11L) === 2L, s"exact copy should match doc 2: $v2")
    assert(v2(21L) === 20L, s"within-batch dup should point at earlier id: $v2")
    assert(!v2.contains(20L), "the earlier doc of a within-batch pair is not a dup")

    // replaying batch 2 re-emits IDENTICAL verdicts (self-matches against
    // the already-appended signatures are excluded) and does not grow the
    // store
    val sizeBefore = spark.read.parquet(store).count()
    val replay = IncrementalDedup.processBatch(
      docsDf(10L -> nearCopy, 11L -> unrelated), store)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(replay === Map(10L -> 1L, 11L -> 2L),
      s"replay verdicts must be stable, got $replay")
    assert(spark.read.parquet(store).count() === sizeBefore, "replay grew the store")

    // compaction: same contents, bounded file count, detection unchanged
    IncrementalDedup.compactStore(spark, store, targetFiles = 2)
    assert(spark.read.parquet(store).count() === sizeBefore, "compaction changed contents")
    val files = new java.io.File(store).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files <= 2, s"$files files after compaction")
    val v3 = IncrementalDedup.processBatch(docsDf(30L -> nearCopy), store)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(v3(30L) === 1L, s"post-compaction detection: $v3")

    // crash-window self-heal: simulate dying between compaction's delete
    // and rename — live dir gone, completed side dir present
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val side = new org.apache.hadoop.fs.Path(store + ".compact")
    assert(fs.rename(new org.apache.hadoop.fs.Path(store), side))
    val healed = IncrementalDedup.processBatch(docsDf(31L -> nearCopy), store)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(healed(31L) === 1L, s"store not recovered from side dir: $healed")
  }

  test("changed-text re-ingest replaces the stored signature (latest wins)") {
    val store = tempDir("inc-dedup-update") + "/sigs"

    // doc 1 enters with `base` text
    IncrementalDedup.processBatch(docsDf(1L -> base), store)
    val sigV1 = spark.read.parquet(store).filter(col("doc_id") === 1L)
      .drop("doc_id").collect().toSeq
    assert(sigV1.size === 1)

    // doc 1 is RE-INGESTED with unrelated text: exactly one store row
    // remains for it, holding the NEW signature
    IncrementalDedup.processBatch(docsDf(1L -> unrelated), store)
    val rows = spark.read.parquet(store).filter(col("doc_id") === 1L)
      .drop("doc_id").collect().toSeq
    assert(rows.size === 1, s"expected one row for doc 1, got ${rows.size}")
    assert(rows !== sigV1, "stale signature survived the re-ingest")

    // future docs match the NEW text, not the old
    val vNew = IncrementalDedup.processBatch(docsDf(5L -> unrelated), store)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(vNew(5L) === 1L, s"new text should match updated doc 1: $vNew")
    val vOld = IncrementalDedup.processBatch(docsDf(6L -> base), store)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!vOld.contains(6L), s"old text must no longer match doc 1: $vOld")
  }

  test("streaming path: foreachBatch over MemoryStream produces the same verdicts") {
    val store = tempDir("inc-dedup-stream") + "/sigs"
    val ckpt = tempDir("inc-dedup-ckpt")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    mem.addData(1L -> base, 2L -> unrelated)

    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    def drain(): Unit = {
      val q = IncrementalDedup.stream(
        mem.toDF.toDF("doc_id", "text"), store, ckpt) { (verdicts, _) =>
        collected ++= verdicts.collect().map(r => (r.getLong(0), r.getLong(1)))
      }.start()
      q.awaitTermination()
    }
    drain()
    assert(collected.isEmpty, "no dups in the seed batch")

    mem.addData(10L -> nearCopy)
    drain()
    assert(collected.toList === List(10L -> 1L))
  }
}
