package graft.sds

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import Fixtures._
import Schemas.MaxBlockNum

/** End-to-end pipeline tests (SURVEY.md §5 plan item 2): fixture event
  * batches → decode → SCD2 store, covering multi-block batches, update
  * close-out, fork rewind, assertion delete, heartbeat no-op, idempotent
  * replay, and the streaming (MemoryStream → foreachBatch) wiring. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def newStore(): Scd2Store = new Scd2Store(spark, tempDir("sds-store"))

  private def apply1(store: Scd2Store, batches: String*): Unit =
    Pipeline.applyBatch(store, spark.createDataset(batches).toDF("value"))

  test("minimum end-to-end slice (SURVEY §7.2): ingest org+cert, join live views") {
    val store = newStore()
    apply1(store,
      batch(1, "b1", Seq(
        Change(orgAddress(FactoryId), "SET", container(factoryJson())),
        Change(certAddress(CertId), "SET", container(certificateJson())))))

    val joined = store.live("certificates").as("c")
      .join(store.live("organizations").as("o"),
        col("c.factory_id") === col("o.organization_id"))
      .select("c.certificate_id", "o.name")
    assert(joined.collect().map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq((CertId, "test")))
    assert(store.maxBlock() === Some(1L))
  }

  test("update in a later block closes the previous version") {
    val store = newStore()
    apply1(store, batch(1, "b1", Seq(Change(agentAddress(PublicKey), "SET",
      container(agentJson(name = "old"))))))
    apply1(store, batch(4, "b4", Seq(Change(agentAddress(PublicKey), "SET",
      container(agentJson(name = "new"))))))

    val versions = store.table("agents")
      .select("name", "start_block_num", "end_block_num")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sortBy(_._2)
    assert(versions === Seq(("old", 1L, 4L), ("new", 4L, MaxBlockNum)))
    assert(store.asOf("agents", 2).select("name").as[String].collect().toSeq === Seq("old"))
    assert(store.live("agents").select("name").as[String].collect().toSeq === Seq("new"))
  }

  test("multi-block micro-batch applies in block order") {
    val store = newStore()
    apply1(store,
      batch(1, "b1", Seq(Change(agentAddress(PublicKey), "SET", container(agentJson(name = "v1"))))),
      batch(3, "b3", Seq(Change(agentAddress(PublicKey), "SET", container(agentJson(name = "v2"))))),
      batch(6, "b6", Seq(Change(agentAddress(PublicKey), "SET", container(agentJson(name = "v3"))))))
    val versions = store.table("agents")
      .select("name", "start_block_num", "end_block_num")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sortBy(_._2)
    assert(versions === Seq(("v1", 1L, 3L), ("v2", 3L, 6L), ("v3", 6L, MaxBlockNum)))
    assert(store.lastKnownBlockIds() === Seq("b6", "b3", "b1"))
  }

  test("D2/W5: heartbeat batch is a complete no-op") {
    val store = newStore()
    apply1(store, heartbeat)
    assert(store.table("blocks").isEmpty)
    assert(store.table("agents").isEmpty)
    assert(store.lastKnownBlockIds() === Seq("0000000000000000"))
  }

  test("idempotence: replaying a processed batch changes nothing") {
    val store = newStore()
    val b = batch(2, "b2", Seq(Change(agentAddress(PublicKey), "SET", container(agentJson()))))
    apply1(store, b)
    apply1(store, b)
    assert(store.table("agents").count() === 1)
    assert(store.table("blocks").count() === 1)
  }

  test("W3 e2e: assertion DELETE closes; recreate leaves a deleted gap") {
    val store = newStore()
    val addr = assertionStateAddress(AssertionId)
    apply1(store, batch(1, "b1", Seq(Change(addr, "SET", container(assertionJson(address = addr))))))
    apply1(store, batch(4, "b4", Seq(Change(addr, "DELETE", ""))))
    assert(store.live("assertions").isEmpty)
    assert(store.asOf("assertions", 2).count() === 1)

    apply1(store, batch(9, "b9", Seq(Change(addr, "SET", container(assertionJson(address = addr))))))
    val spans = store.table("assertions").select("start_block_num", "end_block_num")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    assert(spans === Seq((1L, 4L), (9L, MaxBlockNum)))
    assert(store.asOf("assertions", 5).isEmpty) // the deleted gap
  }

  test("W4 e2e: fork replaces a block and rewinds its effects") {
    val store = newStore()
    apply1(store, batch(1, "b1", Seq(Change(agentAddress(PublicKey), "SET", container(agentJson(name = "v1"))))))
    apply1(store, batch(2, "b2", Seq(Change(agentAddress(PublicKey), "SET", container(agentJson(name = "v2-orphan"))))))
    // fork: block 2 re-arrives with a different id and different payload
    apply1(store, batch(2, "b2'", Seq(Change(agentAddress("other_key"), "SET",
      container(agentJson(publicKey = "other_key", name = "fork"))))))

    val agents = store.live("agents").select("public_key", "name")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(agents === Set((PublicKey, "v1"), ("other_key", "fork")))
    // v1 was closed by orphaned block 2 → re-opened
    val v1 = store.table("agents").filter(col("name") === "v1")
      .select("end_block_num").as[Long].collect().toSeq
    assert(v1 === Seq(MaxBlockNum))
    val blocks = store.table("blocks").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(blocks === Set((1L, "b1"), (2L, "b2'")))
  }

  test("child rows absent from a new parent version close at that version") {
    val store = newStore()
    // block 1: certifying body with 1 contact, 1 auth, 1 accreditation
    apply1(store, batch(1, "b1",
      Seq(Change(orgAddress(CertOrgId), "SET", container(certifyingBodyJson())))))
    // block 5: same org re-written with NO contacts/auths/accreditations
    val bare = s"""{"id":"$CertOrgId","name":"renamed","organization_type":"CERTIFYING_BODY"}"""
    apply1(store, batch(5, "b5", Seq(Change(orgAddress(CertOrgId), "SET", container(bare)))))

    assert(store.live("contacts").isEmpty)
    assert(store.live("authorizations").isEmpty)
    assert(store.live("accreditations").isEmpty)
    // the removed children are still visible as-of block 2
    assert(store.asOf("contacts", 2).count() === 1)
    assert(store.asOf("accreditations", 2).count() === 1)
    val contactEnd = store.table("contacts").select("end_block_num").as[Long].collect()
    assert(contactEnd.toSeq === Seq(5L))
    assert(store.live("organizations").select("name").as[String].collect().toSeq === Seq("renamed"))
  }

  test("delete → recreate → delete within one batch closes at the last delete") {
    val store = newStore()
    val addr = assertionStateAddress(AssertionId)
    apply1(store,
      batch(1, "b1", Seq(Change(addr, "SET", container(assertionJson(address = addr))))),
      batch(2, "b2", Seq(Change(addr, "DELETE", ""))),
      batch(3, "b3", Seq(Change(addr, "SET", container(assertionJson(address = addr))))),
      batch(4, "b4", Seq(Change(addr, "DELETE", ""))))
    val spans = store.table("assertions").select("start_block_num", "end_block_num")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    assert(spans === Seq((1L, 2L), (3L, 4L)))
    assert(store.live("assertions").isEmpty)
  }

  test("strict mode rejects unknown entity infix (AnotherFamily)") {
    val store = newStore()
    val weird = Addressing.Namespace + "ff" + "0" * 62
    val ex = intercept[Exception] {
      apply1(store, batch(1, "b1", Seq(Change(weird, "SET", container(agentJson())))))
    }
    assert(ex.getMessage.contains("no entity type"))
  }

  test("streaming wiring: MemoryStream → foreachBatch → store") {
    val store = newStore()
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[String]
    val query = Pipeline.start(mem.toDS(), store, tempDir("sds-ckpt"))
    try {
      mem.addData(batch(1, "b1", Seq(Change(agentAddress(PublicKey), "SET", container(agentJson(name = "s1"))))))
      query.processAllAvailable()
      mem.addData(batch(2, "b2", Seq(Change(agentAddress(PublicKey), "SET", container(agentJson(name = "s2"))))))
      query.processAllAvailable()
    } finally query.stop()

    val versions = store.table("agents")
      .select("name", "start_block_num", "end_block_num")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sortBy(_._2)
    assert(versions === Seq(("s1", 1L, 2L), ("s2", 2L, MaxBlockNum)))
  }
}
