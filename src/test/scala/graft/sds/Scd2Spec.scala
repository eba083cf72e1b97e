package graft.sds

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import Schemas.MaxBlockNum

/** Set-wise SCD2 merge semantics (W2/W3/W4) including the invariants from
  * SURVEY.md §5: versions of an entity partition `[first_block, MAX)`
  * minus deleted gaps, exactly one live row per entity, no overlaps. */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def agentsDf(rows: (String, String, Long, Long)*): DataFrame =
    rows.toSeq.toDF("public_key", "name", "start_block_num", "end_block_num")
      .select(col("public_key"), lit(null).cast("string").as("organization_id"),
        col("name"), lit(0L).as("timestamp"), col("start_block_num"), col("end_block_num"))

  private def versionsOf(df: DataFrame, key: String): Seq[(String, Long, Long)] =
    df.select(col("public_key"), col("start_block_num"), col("end_block_num"))
      .filter(col("public_key") === key)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._2)

  test("W2: new version closes the live row") {
    val existing = agentsDf(("k1", "v1", 1L, MaxBlockNum))
    val updates = agentsDf(("k1", "v2", 5L, MaxBlockNum))
    val merged = Scd2.merge(existing, updates, Seq("public_key"))
    assert(versionsOf(merged, "k1") === Seq(("k1", 1L, 5L), ("k1", 5L, MaxBlockNum)))
  }

  test("W2: multi-block chain within one batch closes intermediates") {
    val existing = agentsDf(("k1", "v1", 1L, MaxBlockNum))
    val updates = agentsDf(("k1", "v2", 3L, MaxBlockNum), ("k1", "v3", 7L, MaxBlockNum))
    val merged = Scd2.merge(existing, updates, Seq("public_key"))
    assert(versionsOf(merged, "k1") ===
      Seq(("k1", 1L, 3L), ("k1", 3L, 7L), ("k1", 7L, MaxBlockNum)))
  }

  test("idempotence: re-applying the same version replaces, not duplicates") {
    val existing = agentsDf(("k1", "v2", 5L, MaxBlockNum), ("k1", "v1", 1L, 5L))
    val updates = agentsDf(("k1", "v2", 5L, MaxBlockNum))
    val merged = Scd2.merge(existing, updates, Seq("public_key"))
    assert(versionsOf(merged, "k1") === Seq(("k1", 1L, 5L), ("k1", 5L, MaxBlockNum)))
  }

  test("wholesale child replacement: dropped child rows close at the new version") {
    // contacts keyed by organization_id: org o1 had 2 contacts, new
    // version at block 4 keeps only one.
    val contacts = Seq(
      ("o1", "alice", "p", "en", 1L, MaxBlockNum),
      ("o1", "bob", "p", "en", 1L, MaxBlockNum))
      .toDF("organization_id", "name", "phone_number", "language_code",
        "start_block_num", "end_block_num")
    val updates = Seq(("o1", "alice", "p2", "en", 4L, MaxBlockNum))
      .toDF("organization_id", "name", "phone_number", "language_code",
        "start_block_num", "end_block_num")
    val merged = Scd2.merge(contacts, updates, Seq("organization_id"))
    val live = merged.filter(col("end_block_num") === MaxBlockNum).collect()
    assert(live.map(_.getString(1)).toSeq === Seq("alice"))
    assert(live.head.getString(2) === "p2")
    val closed = merged.filter(col("end_block_num") =!= MaxBlockNum)
      .select("name", "end_block_num").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(closed === Set(("alice", 4L), ("bob", 4L)))
  }

  test("W3: delete closes the live row without replacement; recreate leaves a gap") {
    val assertions = Seq(
      ("a1", "addr1", "k", "Factory", "obj", 1L, MaxBlockNum))
      .toDF("assertion_id", "address", "assertor_pub_key", "assertion_type",
        "object_id", "start_block_num", "end_block_num")
      .withColumn("data_id", lit(null).cast("string"))
      .select("assertion_id", "address", "assertor_pub_key", "assertion_type",
        "object_id", "data_id", "start_block_num", "end_block_num")
    val deletes = Seq((4L, "addr1")).toDF("block_num", "address")
    val afterDelete = Scd2.applyDeletes(assertions, deletes, "address")
    assert(afterDelete.select("end_block_num").as[Long].collect().toSeq === Seq(4L))

    // recreate at block 9: gap [4, 9) stays deleted
    val recreated = Seq(("a1", "addr1", "k", "Factory", "obj", null, 9L, MaxBlockNum))
      .asInstanceOf[Seq[(String, String, String, String, String, String, Long, Long)]]
      .toDF("assertion_id", "address", "assertor_pub_key", "assertion_type",
        "object_id", "data_id", "start_block_num", "end_block_num")
    val merged = Scd2.merge(afterDelete, recreated, Seq("assertion_id"))
    val spans = merged.select("start_block_num", "end_block_num")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    assert(spans === Seq((1L, 4L), (9L, MaxBlockNum)))
  }

  test("W3: delete of an already-closed interval is a no-op (replay safe)") {
    val assertions = Seq(("a1", "addr1", "k", "Factory", "obj", "d", 1L, 4L))
      .toDF("assertion_id", "address", "assertor_pub_key", "assertion_type",
        "object_id", "data_id", "start_block_num", "end_block_num")
    val deletes = Seq((4L, "addr1")).toDF("block_num", "address")
    val out = Scd2.applyDeletes(assertions, deletes, "address")
    assert(out.select("end_block_num").as[Long].collect().toSeq === Seq(4L))
  }

  test("W4: rewind drops forked versions and re-opens rows closed by them") {
    val existing = agentsDf(
      ("k1", "v1", 1L, 6L), ("k1", "v2", 6L, MaxBlockNum), // closed by forked block 6
      ("k2", "w1", 2L, MaxBlockNum))
    val rewound = Scd2.rewind(existing, 6L)
    assert(versionsOf(rewound, "k1") === Seq(("k1", 1L, MaxBlockNum)))
    assert(versionsOf(rewound, "k2") === Seq(("k2", 2L, MaxBlockNum)))
  }

  test("invariants: one live row per entity, no interval overlaps") {
    val existing = agentsDf(("k1", "v1", 1L, MaxBlockNum), ("k2", "w1", 2L, MaxBlockNum))
    val updates = agentsDf(
      ("k1", "v2", 3L, MaxBlockNum), ("k1", "v3", 8L, MaxBlockNum),
      ("k2", "w2", 5L, MaxBlockNum), ("k3", "x1", 6L, MaxBlockNum))
    val merged = Scd2.merge(existing, updates, Seq("public_key")).persist()

    val liveCounts = merged.filter(col("end_block_num") === MaxBlockNum)
      .groupBy("public_key").count().select("count").as[Long].collect()
    assert(liveCounts.forall(_ == 1L))

    // no overlaps: within an entity, each end == next start
    val bad = merged
      .withColumn("next_start",
        lead(col("start_block_num"), 1).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("public_key").orderBy("start_block_num")))
      .filter(col("next_start").isNotNull && col("end_block_num") > col("next_start"))
    assert(bad.isEmpty)
    merged.unpersist()
  }
}
