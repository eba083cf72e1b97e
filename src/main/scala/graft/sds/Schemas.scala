package graft.sds

import org.apache.spark.sql.types._

/** Schemas for the SDS pipeline.
  *
  * Wire format: the sandbox has no validator/protobuf runtime, so event
  * batches arrive as JSON documents mirroring the protobuf structure 1:1
  * (SURVEY.md §1.5: "fixtures use JSON lines + from_json(schema)").
  * Nested payloads stay nested *strings* — an event's `data` is a JSON
  * StateChangeList, a state change's `value` is a JSON entity container —
  * mirroring protobuf's bytes-in-bytes layering so the decode pipeline
  * (D1) exercises real staged deserialization.
  *
  * Entity message shapes follow the protobuf definitions referenced at
  * `src/event_handler.rs:6` (fields as used in the transforms,
  * `src/event_handler.rs:205-437`).
  *
  * Real protobuf wire decode: the TOOLCHAIN is environment-blocked
  * (`from_protobuf` lives in the absent `spark-protobuf` module, no
  * standalone `protobuf-java`, no `protoc`, offline resolution), so the
  * wire FORMAT is implemented directly — `ProtoLite` decodes varint /
  * length-delimited messages driven by these same StructTypes and emits
  * the mirror JSON, making binary input a one-expression prefix to the
  * unchanged staged pipeline (`ProtoLiteSpec` proves wire ≡ JSON on
  * every entity). On a cluster with the connector jar the swap to
  * descriptor-based `from_protobuf(col, messageName, descriptorFile)`
  * stays mechanical — `Decode` never looks at the wire format past this
  * module.
  */
object Schemas {

  /** `MAX_BLOCK_NUM` sentinel for the live SCD2 row version
    * (`src/event_handler.rs:9` [inferred: i64::MAX]). */
  val MaxBlockNum: Long = Long.MaxValue

  // ---- envelope (sawtooth EventList / Event / StateChangeList) ----------

  val attribute: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("value", StringType)))

  val event: StructType = StructType(Seq(
    StructField("eventType", StringType),
    StructField("attributes", ArrayType(attribute)),
    StructField("data", StringType)))           // JSON StateChangeList

  val eventBatch: StructType = StructType(Seq(
    StructField("events", ArrayType(event))))

  val stateChange: StructType = StructType(Seq(
    StructField("address", StringType),
    StructField("changeType", StringType),      // SET | DELETE
    StructField("value", StringType)))          // JSON entity container

  val stateChangeList: StructType = StructType(Seq(
    StructField("state_changes", ArrayType(stateChange))))

  // ---- entity protobuf-mirror schemas -----------------------------------

  val contact: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("phone_number", StringType),
    StructField("language_code", StringType)))

  val authorization: StructType = StructType(Seq(
    StructField("public_key", StringType),
    StructField("role", StringType)))           // ADMIN | TRANSACTOR | UNSET_ROLE

  val accreditation: StructType = StructType(Seq(
    StructField("standard_id", StringType),
    StructField("standard_version", StringType),
    StructField("accreditor_id", StringType),
    StructField("valid_from", LongType),
    StructField("valid_to", LongType)))

  val factoryAddress: StructType = StructType(Seq(
    StructField("street_line_1", StringType),
    StructField("street_line_2", StringType),
    StructField("city", StringType),
    StructField("state_province", StringType),
    StructField("country", StringType),
    StructField("postal_code", StringType)))

  val organization: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("organization_type", StringType), // CERTIFYING_BODY | STANDARDS_BODY | FACTORY | INGESTION | UNSET_TYPE
    StructField("contacts", ArrayType(contact)),
    StructField("authorizations", ArrayType(authorization)),
    StructField("certifying_body_details", StructType(Seq(
      StructField("accreditations", ArrayType(accreditation))))),
    StructField("factory_details", StructType(Seq(
      StructField("address", factoryAddress))))))

  val agent: StructType = StructType(Seq(
    StructField("public_key", StringType),
    StructField("organization_id", StringType),
    StructField("name", StringType),
    StructField("timestamp", LongType)))

  val certificate: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("certifying_body_id", StringType),
    StructField("factory_id", StringType),
    StructField("standard_id", StringType),
    StructField("standard_version", StringType),
    StructField("valid_from", LongType),
    StructField("valid_to", LongType)))

  val request: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("factory_id", StringType),
    StructField("standard_id", StringType),
    StructField("status", StringType),          // OPEN | IN_PROGRESS | CLOSED | CERTIFIED | UNSET_STATUS | PRE_CERTIFIED
    StructField("request_date", LongType)))

  val standardVersion: StructType = StructType(Seq(
    StructField("version", StringType),
    StructField("link", StringType),
    StructField("description", StringType),
    StructField("approval_date", LongType)))

  val standard: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("organization_id", StringType),
    StructField("name", StringType),
    StructField("versions", ArrayType(standardVersion))))

  val assertion: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("address", StringType),
    StructField("assertor_pub_key", StringType),
    StructField("assertion_type", StringType),  // STANDARD | CERTIFICATE | FACTORY | UNSET_TYPE
    StructField("object_id", StringType),
    StructField("data_id", StringType)))

  /** Every on-chain value is a Container with repeated `entries`
    * (`src/transformer.rs:8-41`, D10). */
  def container(entity: StructType): StructType =
    StructType(Seq(StructField("entries", ArrayType(entity))))

  // ---- output (reporting-DB) table schemas ------------------------------
  // Column sets per SURVEY.md §1.2; every table additionally carries
  // start_block_num/end_block_num (SCD2 interval).

  private def scd2(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t) } ++ Seq(
      StructField("start_block_num", LongType, nullable = false),
      StructField("end_block_num", LongType, nullable = false)))

  val organizationsTable: StructType = scd2(
    "organization_id" -> StringType, "name" -> StringType,
    "organization_type" -> StringType)

  val accreditationsTable: StructType = scd2(
    "organization_id" -> StringType, "standard_id" -> StringType,
    "standard_version" -> StringType, "accreditor_id" -> StringType,
    "valid_from" -> LongType, "valid_to" -> LongType)

  val addressesTable: StructType = scd2(
    "organization_id" -> StringType, "street_line_1" -> StringType,
    "street_line_2" -> StringType, "city" -> StringType,
    "state_province" -> StringType, "country" -> StringType,
    "postal_code" -> StringType)

  val authorizationsTable: StructType = scd2(
    "organization_id" -> StringType, "public_key" -> StringType,
    "role" -> StringType)

  val contactsTable: StructType = scd2(
    "organization_id" -> StringType, "name" -> StringType,
    "phone_number" -> StringType, "language_code" -> StringType)

  val agentsTable: StructType = scd2(
    "public_key" -> StringType, "organization_id" -> StringType,
    "name" -> StringType, "timestamp" -> LongType)

  val certificatesTable: StructType = scd2(
    "certificate_id" -> StringType, "certifying_body_id" -> StringType,
    "factory_id" -> StringType, "standard_id" -> StringType,
    "standard_version" -> StringType, "valid_from" -> LongType,
    "valid_to" -> LongType)

  val requestsTable: StructType = scd2(
    "request_id" -> StringType, "factory_id" -> StringType,
    "standard_id" -> StringType, "status" -> StringType,
    "request_date" -> LongType)

  val standardsTable: StructType = scd2(
    "standard_id" -> StringType, "organization_id" -> StringType,
    "name" -> StringType)

  val standardVersionsTable: StructType = scd2(
    "standard_id" -> StringType, "version" -> StringType,
    "link" -> StringType, "description" -> StringType,
    "approval_date" -> LongType)

  val assertionsTable: StructType = scd2(
    "assertion_id" -> StringType, "address" -> StringType,
    "assertor_pub_key" -> StringType, "assertion_type" -> StringType,
    "object_id" -> StringType, "data_id" -> StringType)

  val blocksTable: StructType = StructType(Seq(
    StructField("block_num", LongType, nullable = false),
    StructField("block_id", StringType)))

  /** table name → (schema, SCD2 version-chain scope for Scd2.merge).
    *
    * The scope is the PARENT entity's key, not the child row's PK: a new
    * version of an organization replaces its whole child-row set
    * (contacts/authorizations/accreditations/address), so a child row
    * absent from the new version must close at the new version's block.
    * Scd2.merge's wholesale replacement + close-out both operate per
    * scope — keying a child by its full PK would leave removed children
    * live forever. */
  val tables: Map[String, (StructType, Seq[String])] = Map(
    "organizations" -> (organizationsTable, Seq("organization_id")),
    "accreditations" -> (accreditationsTable, Seq("organization_id")),
    "addresses" -> (addressesTable, Seq("organization_id")),
    "authorizations" -> (authorizationsTable, Seq("organization_id")),
    "contacts" -> (contactsTable, Seq("organization_id")),
    "agents" -> (agentsTable, Seq("public_key")),
    "certificates" -> (certificatesTable, Seq("certificate_id")),
    "requests" -> (requestsTable, Seq("request_id")),
    "standards" -> (standardsTable, Seq("standard_id")),
    "standard_versions" -> (standardVersionsTable, Seq("standard_id")),
    "assertions" -> (assertionsTable, Seq("assertion_id")))
}
