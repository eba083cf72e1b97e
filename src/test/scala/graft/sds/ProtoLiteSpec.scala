package graft.sds

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.SparkSpec

/** Wire-format codec checks: a protobuf-encoded entity must decode to
  * EXACTLY the rows the JSON-mirror fixture produces through the same
  * `from_json` schema — proving the staged-decode pipeline runs
  * unchanged on wire input (D1 without the blocked toolchain). */
class ProtoLiteSpec extends SparkSpec {
  import spark.implicits._

  private def parsed(json: String, schema: StructType) =
    Seq(json).toDF("j")
      .select(from_json(col("j"), schema).as("m"))
      .select("m.*").collect()(0)

  private def assertWireMatchesJson(values: Map[String, Any], fixtureJson: String,
                                    schema: StructType): Unit = {
    val wireJson = ProtoLite.decodeToJson(ProtoLite.encode(values, schema), schema)
    assert(parsed(wireJson, schema) === parsed(fixtureJson, schema),
      s"wire=$wireJson\njson=$fixtureJson")
  }

  test("factory organization: nested address, enum, absent optionals") {
    import Fixtures._
    assertWireMatchesJson(
      Map(
        "id" -> FactoryId, "name" -> "test", "organization_type" -> "FACTORY",
        "contacts" -> Seq(Map("name" -> "test", "phone_number" -> "test",
          "language_code" -> "test")),
        // authorizations absent; street_line_2 absent inside the address
        "factory_details" -> Map("address" -> Map(
          "street_line_1" -> "test", "city" -> "test",
          "state_province" -> "test", "country" -> "test",
          "postal_code" -> "test"))),
      factoryJson(), Schemas.organization)
  }

  test("certifying body: repeated accreditations with varint longs") {
    import Fixtures._
    assertWireMatchesJson(
      Map(
        "id" -> CertOrgId, "name" -> "test",
        "organization_type" -> "CERTIFYING_BODY",
        "contacts" -> Seq(Map("name" -> "test", "phone_number" -> "test",
          "language_code" -> "test")),
        "authorizations" -> Seq(Map("public_key" -> PublicKey, "role" -> "ADMIN")),
        "certifying_body_details" -> Map("accreditations" -> Seq(Map(
          "standard_id" -> StandardId, "standard_version" -> "test",
          "accreditor_id" -> StandardsBodyId,
          "valid_from" -> 1L, "valid_to" -> 2L)))),
      certifyingBodyJson(), Schemas.organization)
  }

  test("agent, certificate, request, standard, assertion round-trips") {
    import Fixtures._
    assertWireMatchesJson(
      Map("public_key" -> PublicKey, "organization_id" -> OrgId,
        "name" -> "test", "timestamp" -> 1L),
      agentJson(), Schemas.agent)
    assertWireMatchesJson(
      Map("id" -> CertId, "certifying_body_id" -> CertOrgId,
        "factory_id" -> FactoryId, "standard_id" -> StandardId,
        "standard_version" -> "test", "valid_from" -> 1L, "valid_to" -> 2L),
      certificateJson(), Schemas.certificate)
    assertWireMatchesJson(
      Map("id" -> RequestId, "factory_id" -> FactoryId,
        "standard_id" -> StandardId, "status" -> "OPEN", "request_date" -> 1L),
      requestJson(), Schemas.request)
    assertWireMatchesJson(
      Map("id" -> StandardId, "organization_id" -> StandardsBodyId,
        "name" -> "test", "versions" -> Seq(Map("version" -> "test",
          "link" -> "test", "description" -> "test", "approval_date" -> 1L))),
      standardJson(), Schemas.standard)
    assertWireMatchesJson(
      Map("id" -> AssertionId, "address" -> AssertionAddress,
        "assertor_pub_key" -> PublicKey, "assertion_type" -> "FACTORY",
        "object_id" -> FactoryId),
      assertionJson(), Schemas.assertion)
  }

  test("robustness: unknown trailing fields are skipped; long strings use multi-byte varints") {
    // encode with an EXTENDED schema (extra trailing string field) and
    // decode with the production schema — forward compatibility
    val extended = StructType(Schemas.agent.fields :+
      org.apache.spark.sql.types.StructField("future_field",
        org.apache.spark.sql.types.StringType))
    val big = "x" * 300 // length needs a 2-byte varint
    val wire = ProtoLite.encode(
      Map("public_key" -> "pk", "organization_id" -> "o", "name" -> big,
        "timestamp" -> 123456789012345L, "future_field" -> "ignored"),
      extended)
    val json = ProtoLite.decodeToJson(wire, Schemas.agent)
    val row = parsed(json, Schemas.agent)
    assert(row.getString(2) === big)
    assert(row.getLong(3) === 123456789012345L)
  }

  test("end-to-end: a wire-format container drives the existing container schema") {
    import Fixtures._
    // container { repeated entries = 1 } around two wire-encoded agents
    val a1 = Map("public_key" -> "k1", "organization_id" -> OrgId,
      "name" -> "n1", "timestamp" -> 1L)
    val a2 = Map("public_key" -> "k2", "organization_id" -> OrgId,
      "name" -> "n2", "timestamp" -> 2L)
    val containerSchema = Schemas.container(Schemas.agent)
    val wire = ProtoLite.encode(Map("entries" -> Seq(a1, a2)), containerSchema)
    val json = ProtoLite.decodeToJson(wire, containerSchema)
    val viaWire = parsed(json, containerSchema)
    val viaJson = parsed(
      container(agentJson("k1", OrgId, "n1", 1), agentJson("k2", OrgId, "n2", 2)),
      containerSchema)
    assert(viaWire === viaJson)
  }
}
