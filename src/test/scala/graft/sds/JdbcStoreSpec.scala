package graft.sds

import org.apache.spark.sql.functions._

import graft.SparkSpec
import Fixtures._
import Schemas.MaxBlockNum

/** The JDBC sink adapter (reference Postgres-parity path) driven through
  * the SAME pipeline merge cases as the parquet store — embedded Derby,
  * real transactions, real spark.read.jdbc reads. */
class JdbcStoreSpec extends SparkSpec {
  import spark.implicits._

  private def newStore(maxTxRows: Int = 1_000_000): JdbcScd2Store = {
    val db = s"memory:graft_${java.util.UUID.randomUUID().toString.take(8)}"
    new JdbcScd2Store(spark, s"jdbc:derby:$db;create=true", maxTxRows)
  }

  private def apply1(store: SdsStore, batches: String*): Unit =
    Pipeline.applyBatch(store, spark.createDataset(batches).toDF("value"))

  /** as-of via the generic SCD2 predicate (the adapter has no manifest
    * pruning — an as-of over JDBC is just the validity filter). */
  private def asOf(store: SdsStore, name: String, b: Long) =
    store.table(name)
      .filter(col("start_block_num") <= b && col("end_block_num") > b)

  test("minimum end-to-end slice through JDBC: ingest org+cert, join live views") {
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
  }

  test("update in a later block closes the previous version (JDBC)") {
    val store = newStore()
    apply1(store, batch(1, "b1", Seq(Change(agentAddress(PublicKey), "SET",
      container(agentJson(name = "old"))))))
    apply1(store, batch(4, "b4", Seq(Change(agentAddress(PublicKey), "SET",
      container(agentJson(name = "new"))))))
    val versions = store.table("agents")
      .select("name", "start_block_num", "end_block_num")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._2)
    assert(versions === Seq(("old", 1L, 4L), ("new", 4L, MaxBlockNum)))
    assert(asOf(store, "agents", 2).select("name").as[String].collect().toSeq === Seq("old"))
    assert(store.live("agents").select("name").as[String].collect().toSeq === Seq("new"))
  }

  test("multi-block micro-batch applies in block order (JDBC)") {
    val store = newStore()
    apply1(store,
      batch(1, "b1", Seq(Change(agentAddress(PublicKey), "SET", container(agentJson(name = "v1"))))),
      batch(3, "b3", Seq(Change(agentAddress(PublicKey), "SET", container(agentJson(name = "v2"))))),
      batch(6, "b6", Seq(Change(agentAddress(PublicKey), "SET", container(agentJson(name = "v3"))))))
    val versions = store.table("agents")
      .select("name", "start_block_num", "end_block_num")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._2)
    assert(versions === Seq(("v1", 1L, 3L), ("v2", 3L, 6L), ("v3", 6L, MaxBlockNum)))
  }

  test("heartbeat batch is a complete no-op (JDBC)") {
    val store = newStore()
    apply1(store, heartbeat)
    assert(store.table("blocks").isEmpty)
    assert(store.table("agents").isEmpty)
  }

  test("idempotence: replaying a processed batch changes nothing (JDBC)") {
    val store = newStore()
    val b = batch(2, "b2", Seq(Change(agentAddress(PublicKey), "SET", container(agentJson()))))
    apply1(store, b)
    apply1(store, b)
    assert(store.table("agents").count() === 1)
    assert(store.table("blocks").count() === 1)
  }

  test("assertion DELETE closes; recreate leaves a deleted gap (JDBC)") {
    val store = newStore()
    val addr = assertionStateAddress(AssertionId)
    apply1(store, batch(1, "b1", Seq(Change(addr, "SET", container(assertionJson(address = addr))))))
    apply1(store, batch(4, "b4", Seq(Change(addr, "DELETE", ""))))
    assert(store.live("assertions").isEmpty)
    assert(asOf(store, "assertions", 2).count() === 1)
    apply1(store, batch(9, "b9", Seq(Change(addr, "SET", container(assertionJson(address = addr))))))
    val spans = store.table("assertions").select("start_block_num", "end_block_num")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    assert(spans === Seq((1L, 4L), (9L, MaxBlockNum)))
    assert(asOf(store, "assertions", 5).isEmpty)
  }

  test("fork replaces a block and rewinds its effects (JDBC)") {
    val store = newStore()
    apply1(store, batch(1, "b1", Seq(Change(agentAddress(PublicKey), "SET", container(agentJson(name = "v1"))))))
    apply1(store, batch(2, "b2", Seq(Change(agentAddress(PublicKey), "SET", container(agentJson(name = "v2-orphan"))))))
    apply1(store, batch(2, "b2'", Seq(Change(agentAddress("other_key"), "SET",
      container(agentJson(publicKey = "other_key", name = "fork"))))))
    val agents = store.live("agents").select("public_key", "name")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(agents === Set((PublicKey, "v1"), ("other_key", "fork")))
    val v1 = store.table("agents").filter(col("name") === "v1")
      .select("end_block_num").as[Long].collect().toSeq
    assert(v1 === Seq(MaxBlockNum))
    val blocks = store.table("blocks").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(blocks === Set((1L, "b1"), (2L, "b2'")))
  }

  test("child rows absent from a new parent version close at that version (JDBC)") {
    val store = newStore()
    apply1(store, batch(1, "b1",
      Seq(Change(orgAddress(CertOrgId), "SET", container(certifyingBodyJson())))))
    val bare = s"""{"id":"$CertOrgId","name":"renamed","organization_type":"CERTIFYING_BODY"}"""
    apply1(store, batch(5, "b5", Seq(Change(orgAddress(CertOrgId), "SET", container(bare)))))
    assert(store.live("contacts").isEmpty)
    assert(asOf(store, "contacts", 2).count() === 1)
    val contactEnd = store.table("contacts").select("end_block_num").as[Long].collect()
    assert(contactEnd.toSeq === Seq(5L))
    assert(store.live("organizations").select("name").as[String].collect().toSeq === Seq("renamed"))
  }

  test("transaction bound is LOUD, and a failed transaction rolls back cleanly") {
    val store = newStore(maxTxRows = 3)
    // 1 agent fits; the bound trips on a synthetic 4-row applyMerged
    apply1(store, batch(1, "b1", Seq(Change(agentAddress(PublicKey), "SET",
      container(agentJson(name = "v1"))))))
    val before = store.table("agents").collect().toSeq
    val wide = store.table("agents")
    val four = wide.unionByName(wide).unionByName(wide).unionByName(wide)
    val e = intercept[IllegalArgumentException] {
      store.applyMerged("agents", four, 2L)
    }
    assert(e.getMessage.contains("single-connection"))
    // oversized VARCHAR triggers a mid-transaction SQL failure → rollback
    val bad = store.live("agents")
      .withColumn("name", lit("x" * 9000))
    intercept[Exception] { store.applyMerged("agents", bad, 3L) }
    assert(store.table("agents").collect().toSeq === before,
      "failed transaction must leave the committed state untouched")
  }
}
