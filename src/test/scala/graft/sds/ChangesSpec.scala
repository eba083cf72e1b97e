package graft.sds

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The SCD2 store's CDC change feed (`Scd2Store.changes`): the
  * incremental-consumer reconstruction contract and the manifest-tag
  * read pruning that makes a near-head poll O(batches-since-cursor). */
class ChangesSpec extends SparkSpec {
  import spark.implicits._

  private def rows(ids: Seq[Int], block: Long, tag: String) =
    ids.map(i => (f"std$i%04d", s"org${i % 5}", s"name-$tag-$i",
      block, Schemas.MaxBlockNum))
      .toDF("standard_id", "organization_id", "name",
        "start_block_num", "end_block_num")

  /** Three batches: 40 entities born at 10; 15 of them re-versioned at
    * 20; 10 others re-versioned at 30. */
  private def mkStore(): Scd2Store = {
    val store = new Scd2Store(spark, tempDir("changes"))
    val b1 = rows(0 until 40, 10, "v1")
    store.applyMerged("standards", Scd2.merge(
      store.table("standards"), b1, Seq("standard_id")), tag = 10)
    val b2 = rows(0 until 15, 20, "v2")
    store.applyMerged("standards", Scd2.merge(
      store.table("standards"), b2, Seq("standard_id")), tag = 20)
    val b3 = rows(20 until 30, 30, "v3")
    store.applyMerged("standards", Scd2.merge(
      store.table("standards"), b3, Seq("standard_id")), tag = 30)
    store
  }

  test("changes(since): opened/closed classification is exact") {
    val store = mkStore()
    val ch = store.changes("standards", since = 15)
      .select("standard_id", "start_block_num", "end_block_num", "change_type")
      .as[(String, Long, Long, String)].collect().toSet
    // opened after 15: the 15 v2 rows (start 20, open) and 10 v3 rows
    // (start 30, open); plus nothing else
    val opened = ch.filter(_._4 == "opened")
    assert(opened.map(_._1).count(_ => true) == 25)
    assert(opened.forall(r => r._2 > 15))
    // closed after 15: v1 rows of the 15 re-versioned at 20 (end 20) and
    // of the 10 re-versioned at 30 (end 30) — 25 pre-images
    val closed = ch.filter(_._4 == "closed")
    assert(closed.size == 25)
    assert(closed.forall(r => r._2 <= 15 && r._3 > 15 &&
      r._3 != Schemas.MaxBlockNum))
  }

  test("changes(since) reconstructs live(): asOf(since) \\ closed ∪ open-opened") {
    val store = mkStore()
    val since = 15L
    val key = Seq("standard_id", "start_block_num")
    val ch = store.changes("standards", since)
    val closedKeys = ch.filter(col("change_type") === "closed").select(key.map(col): _*)
    val openedOpen = ch.filter(col("change_type") === "opened" &&
      col("end_block_num") === Schemas.MaxBlockNum).drop("change_type")
    val reconstructed = store.asOf("standards", since)
      .join(closedKeys, key, "left_anti")
      .unionByName(openedOpen)
      .select("standard_id", "name", "start_block_num")
      .as[(String, String, Long)].collect().toSet
    val live = store.live("standards")
      .select("standard_id", "name", "start_block_num")
      .as[(String, String, Long)].collect().toSet
    assert(reconstructed == live)
  }

  test("near-head changes() prunes to batches since the cursor") {
    // history dirs tagged 20 and 30 (batch 1 closes nothing → no b10)
    val store = mkStore()
    val (total, read) = store.changesFootprint("standards", since = 25)
    assert(total == 2, s"expected 2 history dirs, got $total")
    assert(read == 1, s"cursor at 25 must read only the b30 dir, got $read")
    // and the pruned read still classifies correctly
    val ch = store.changes("standards", 25)
      .groupBy("change_type").count()
      .as[(String, Long)].collect().toMap
    assert(ch("opened") == 10 && ch("closed") == 10)
  }
}
