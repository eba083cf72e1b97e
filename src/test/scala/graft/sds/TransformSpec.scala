package graft.sds

import graft.SparkSpec
import Fixtures._
import Schemas.MaxBlockNum

/** 1:1 port of the reference's 7 transform unit tests
  * (`src/event_handler.rs:454-629`) plus decode-stage cases, driven
  * through the full JSON decode pipeline instead of direct protobuf
  * structs — so D1-D10 are covered on the way to T1-T6. */
class TransformSpec extends SparkSpec {
  import spark.implicits._

  private def changesOf(batches: String*): org.apache.spark.sql.DataFrame =
    Decode.stateChanges(Decode.withBlock(Decode.parseEnvelope(
      spark.createDataset(batches).toDF("value"))))

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  // test_cert_body_at_block (:456)
  test("certifying body → org + accreditation + authorization + contact, no address") {
    val sc = changesOf(batch(1, "b1",
      Seq(Change(orgAddress(CertOrgId), "SET", container(certifyingBodyJson())))))
    sc.persist()

    assert(rows(Decode.organizations(sc)) ===
      Seq(Seq(CertOrgId, "test", "CertifyingBody", 1L, MaxBlockNum)))
    assert(rows(Decode.accreditations(sc)) ===
      Seq(Seq(CertOrgId, StandardId, "test", StandardsBodyId, 1L, 2L, 1L, MaxBlockNum)))
    assert(rows(Decode.authorizations(sc)) ===
      Seq(Seq(CertOrgId, PublicKey, "Admin", 1L, MaxBlockNum)))
    assert(rows(Decode.contacts(sc)) ===
      Seq(Seq(CertOrgId, "test", "test", "test", 1L, MaxBlockNum)))
    assert(Decode.addresses(sc).isEmpty)
    sc.unpersist()
  }

  // test_factory_at_block (:502)
  test("factory → org + contact + address (street_line_2 NULL), no accreditations/auths") {
    val sc = changesOf(batch(1, "b1",
      Seq(Change(orgAddress(FactoryId), "SET", container(factoryJson())))))
    sc.persist()

    assert(rows(Decode.organizations(sc)) ===
      Seq(Seq(FactoryId, "test", "Factory", 1L, MaxBlockNum)))
    assert(rows(Decode.contacts(sc)) ===
      Seq(Seq(FactoryId, "test", "test", "test", 1L, MaxBlockNum)))
    assert(rows(Decode.addresses(sc)) ===
      Seq(Seq(FactoryId, "test", null, "test", "test", "test", "test", 1L, MaxBlockNum)))
    assert(Decode.accreditations(sc).isEmpty)
    assert(Decode.authorizations(sc).isEmpty)
    sc.unpersist()
  }

  // test_agent_at_block (:542)
  test("agent → row with Some(organization_id)") {
    val sc = changesOf(batch(1, "b1",
      Seq(Change(agentAddress(PublicKey), "SET", container(agentJson())))))
    assert(rows(Decode.agents(sc)) ===
      Seq(Seq(PublicKey, OrgId, "test", 1L, 1L, MaxBlockNum)))
  }

  test("agent with empty organization_id → NULL") {
    val sc = changesOf(batch(1, "b1",
      Seq(Change(agentAddress(PublicKey), "SET", container(agentJson(orgId = ""))))))
    assert(rows(Decode.agents(sc)) ===
      Seq(Seq(PublicKey, null, "test", 1L, 1L, MaxBlockNum)))
  }

  // test_certificate_at_block (:557)
  test("certificate → row") {
    val sc = changesOf(batch(1, "b1",
      Seq(Change(certAddress(CertId), "SET", container(certificateJson())))))
    assert(rows(Decode.certificates(sc)) ===
      Seq(Seq(CertId, CertOrgId, FactoryId, StandardId, "test", 1L, 2L, 1L, MaxBlockNum)))
  }

  // test_request_at_block (:575)
  test("request → row with status Open") {
    val sc = changesOf(batch(1, "b1",
      Seq(Change(requestAddress(RequestId), "SET", container(requestJson())))))
    assert(rows(Decode.requests(sc)) ===
      Seq(Seq(RequestId, FactoryId, StandardId, "Open", 1L, 1L, MaxBlockNum)))
  }

  // test_standard_at_block (:591)
  test("standard → standard + standard_version") {
    val sc = changesOf(batch(1, "b1",
      Seq(Change(standardAddress(StandardId), "SET", container(standardJson())))))
    sc.persist()
    assert(rows(Decode.standards(sc)) ===
      Seq(Seq(StandardId, StandardsBodyId, "test", 1L, MaxBlockNum)))
    assert(rows(Decode.standardVersions(sc)) ===
      Seq(Seq(StandardId, "test", "test", "test", 1L, 1L, MaxBlockNum)))
    sc.unpersist()
  }

  // test_assertion_at_block (:616)
  test("assertion → row with data_id NULL") {
    val sc = changesOf(batch(1, "b1",
      Seq(Change(assertionStateAddress(AssertionId), "SET", container(assertionJson())))))
    assert(rows(Decode.assertions(sc)) ===
      Seq(Seq(AssertionId, AssertionAddress, PublicKey, "Factory", FactoryId, null, 1L, MaxBlockNum)))
  }

  // ---- decode-stage coverage (D2, D4, D7, D9) ---------------------------

  test("D2: heartbeat batch produces no blocks and no changes") {
    val env = Decode.withBlock(Decode.parseEnvelope(
      spark.createDataset(Seq(heartbeat)).toDF("value")))
    assert(env.isEmpty)
  }

  test("D4: last block-commit event wins") {
    val twoCommits =
      """{"events":[
        |{"eventType":"sawtooth/block-commit","attributes":[{"key":"block_num","value":"1"},{"key":"block_id","value":"b1"}]},
        |{"eventType":"sawtooth/block-commit","attributes":[{"key":"block_num","value":"2"},{"key":"block_id","value":"b2"}]}]}"""
        .stripMargin.replace("\n", "")
    val blocks = Decode.blocks(Decode.withBlock(Decode.parseEnvelope(
      spark.createDataset(Seq(twoCommits)).toDF("value")))).collect()
    assert(blocks.map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((2L, "b2")))
  }

  test("D7: out-of-namespace addresses are filtered") {
    val foreign = "f" * 70
    val sc = changesOf(batch(1, "b1", Seq(
      Change(foreign, "SET", container(agentJson())),
      Change(agentAddress(PublicKey), "SET", container(agentJson())))))
    assert(sc.count() === 1)
  }

  test("D8: unknown infix inside the namespace is surfaced") {
    val weird = Addressing.Namespace + "ff" + "0" * 62
    val sc = changesOf(batch(1, "b1", Seq(Change(weird, "SET", container(agentJson())))))
    assert(Decode.unknownAddresses(sc).count() === 1)
  }

  test("D9: assertion DELETE yields a delete op, not a row") {
    val addr = assertionStateAddress(AssertionId)
    val sc = changesOf(batch(5, "b5", Seq(Change(addr, "DELETE", ""))))
    sc.persist()
    assert(Decode.assertions(sc).isEmpty)
    assert(rows(Decode.assertionDeletes(sc)) === Seq(Seq(5L, addr)))
    sc.unpersist()
  }

  test("malformed payloads: bad JSON yields no rows, never a crash") {
    // The reference PANICS on malformed protobuf (`unpack_data`,
    // src/event_handler.rs:119-125). Distributed batches can't usefully
    // fail-fast per record; our from_json decode maps malformed payloads
    // to NULL → zero rows for that change (documented deviation, same
    // family as the factory-address null-tolerance, SURVEY §7.4).
    val sc = changesOf(batch(1, "b1", Seq(
      Change(agentAddress(PublicKey), "SET", "not json at all"),
      Change(agentAddress("k2"), "SET", container(agentJson(publicKey = "k2"))))))
    sc.persist()
    assert(sc.count() === 2)                      // both changes decoded to StateChange
    assert(Decode.agents(sc).count() === 1)       // only the valid payload yields a row
    sc.unpersist()
  }

  test("malformed block-commit: non-numeric block_num fails fast") {
    // matches the reference's typed EventParseError on block_num parse
    // (src/event_handler.rs:81-84): crash-stop, restart resumes from the
    // blocks cursor. ANSI cast gives us exactly that semantics.
    val bad = """{"events":[{"eventType":"sawtooth/block-commit",""" +
      """"attributes":[{"key":"block_num","value":"not_a_number"},{"key":"block_id","value":"b"}]}]}"""
    val ex = intercept[Exception] {
      Decode.withBlock(Decode.parseEnvelope(
        spark.createDataset(Seq(bad)).toDF("value"))).collect()
    }
    assert(ex.getMessage.contains("CAST_INVALID_INPUT") ||
      Option(ex.getCause).exists(_.getMessage.contains("CAST_INVALID_INPUT")))
  }

  test("enum defaults: unset org type / role / status map to Unset*") {
    val orgJson = s"""{"id":"x","name":"n","organization_type":"UNSET_TYPE","authorizations":[{"public_key":"k","role":"UNSET_ROLE"}]}"""
    val sc = changesOf(batch(1, "b1", Seq(
      Change(orgAddress("x"), "SET", container(orgJson)),
      Change(requestAddress("r"), "SET", container(requestJson(id = "r", status = "UNSET_STATUS"))))))
    sc.persist()
    assert(rows(Decode.organizations(sc)) === Seq(Seq("x", "n", "UnsetType", 1L, MaxBlockNum)))
    assert(rows(Decode.authorizations(sc)) === Seq(Seq("x", "k", "UnsetRole", 1L, MaxBlockNum)))
    assert(rows(Decode.requests(sc).select("request_id", "status")) === Seq(Seq("r", "UnsetStatus")))
    sc.unpersist()
  }
}
