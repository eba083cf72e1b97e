package graft.sds

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import Addressing.Infix
import Schemas.MaxBlockNum

/** Decode + transform stage of the SDS pipeline (SURVEY.md §2.2-2.3),
  * expressed entirely as declarative DataFrame ops — every step below is
  * codegen-friendly (no UDFs), so Catalyst fuses the whole
  * decode→filter→explode→project chain into one whole-stage-codegen span
  * per output table.
  *
  * Stages (reference `src/event_handler.rs`):
  *  - D1  staged JSON decode (`unpack_data`, :119-125) via `from_json`
  *  - D2  heartbeat drop (:28-38,43-52)
  *  - D3/D4 block-commit parse, last()-wins (:62-94)
  *  - D5/D6 state-delta filter + flatten (:96-112)
  *  - D7  namespace re-check (:100,109,114-117)
  *  - D8  address-type dispatch (:134-202)
  *  - D9  SET/DELETE branch, assertions only (:176-195)
  *  - D10 container un-nesting (`src/transformer.rs:8-41`)
  *  - T1-T6 per-entity transforms (:205-437)
  */
object Decode {

  /** Raw JSON batch lines (one EventList per row, column `value`) →
    * parsed envelope with `events` array (D1 outer layer). */
  def parseEnvelope(raw: DataFrame): DataFrame =
    raw.select(from_json(col("value"), Schemas.eventBatch).getField("events").as("events"))

  private def lastCommitAttr(events: Column, key: String): Column = {
    // D3+D4: filter to block-commit events, take the LAST one (highest
    // block wins, reference `.last()` at :88), then its first attribute
    // with the given key (reference takes `[0]`, :81). `get` (0-based)
    // instead of `element_at`: ANSI mode makes element_at THROW on an
    // empty array, while get yields NULL so a commit-less batch surfaces
    // as a null block for Pipeline's strict check.
    val commits = filter(events, e => e.getField("eventType") === "sawtooth/block-commit")
    val last = get(commits, size(commits) - 1)
    get(filter(last.getField("attributes"), a => a.getField("key") === key), lit(0))
      .getField("value")
  }

  /** Envelope → one row per non-heartbeat batch: (block_num, block_id,
    * events, _seq). Heartbeats (empty event list, D2) are dropped here;
    * batches with events but no parseable block-commit keep a NULL block
    * and are rejected by Pipeline.applyBatch (reference errors at
    * :89-93). `_seq` preserves arrival order for last-wins tie-breaks. */
  def withBlock(envelope: DataFrame): DataFrame =
    envelope
      .filter(size(col("events")) > 0)
      .withColumn("_seq", monotonically_increasing_id())
      .withColumn("block_num", lastCommitAttr(col("events"), "block_num").cast("long"))
      .withColumn("block_id", lastCommitAttr(col("events"), "block_id"))

  /** Blocks table rows for the batch (W5 input), with arrival order. */
  def blocks(withBlockDf: DataFrame): DataFrame =
    withBlockDf.select(col("block_num"), col("block_id"), col("_seq"))

  /** D5→D6→D7: state-delta events → flattened namespace-filtered
    * StateChange rows: (block_num, address, change_type, value). Rows
    * from commit-less batches (null block) are excluded — the pipeline's
    * strict check rejects such batches before getting here. */
  def stateChanges(withBlockDf: DataFrame): DataFrame =
    withBlockDf
      .filter(col("block_num").isNotNull && col("block_id").isNotNull)
      .select(col("block_num"),
        explode(filter(col("events"),
          e => e.getField("eventType") === "sawtooth/state-delta")).as("ev"))
      .select(col("block_num"),
        explode(from_json(col("ev.data"), Schemas.stateChangeList)
          .getField("state_changes")).as("sc"))
      .select(col("block_num"),
        col("sc.address").as("address"),
        col("sc.changeType").as("change_type"),
        col("sc.value").as("value"))
      .filter(Addressing.inNamespace(col("address")))

  /** Addresses inside the namespace whose infix matches no known entity
    * type — the reference's AnotherFamily hard error (:196-200). */
  def unknownAddresses(sc: DataFrame): DataFrame =
    sc.filter(!Addressing.infixCol(col("address")).isin(Infix.all: _*))

  // ---- shared transform helpers -----------------------------------------

  /** Fold an enum mapping into a when-chain; protobuf absent/unknown →
    * the UNSET default (protobuf enum default is variant 0). */
  private def mapEnum(c: Column, m: Seq[(String, String)], unset: String): Column =
    m.foldLeft(None: Option[Column]) { case (acc, (k, v)) =>
      Some(acc.fold(when(c === k, v))(_.when(c === k, v)))
    }.get.otherwise(unset)

  /** "" (and protobuf-absent null) → NULL convention (SURVEY §1.2). */
  private def emptyToNull(c: Column): Column = when(c === "", lit(null)).otherwise(c)

  private val stamp: Seq[Column] = Seq(
    col("block_num").as("start_block_num"),
    lit(MaxBlockNum).as("end_block_num"))

  /** D8 dispatch + D9 SET filter + D1 inner decode + D10 un-nest:
    * state changes of one entity type → (block_num, e) exploded entries. */
  private def entries(sc: DataFrame, infix: String, entity: org.apache.spark.sql.types.StructType): DataFrame =
    sc.filter(Addressing.infixCol(col("address")) === infix &&
        col("change_type") === "SET")
      .select(col("block_num"),
        explode(from_json(col("value"), Schemas.container(entity))
          .getField("entries")).as("e"))

  // ---- T1: Organization → organizations + 4 child tables ----------------

  private val orgTypeMap = Seq(
    "CERTIFYING_BODY" -> "CertifyingBody",
    "STANDARDS_BODY" -> "StandardsBody",
    "FACTORY" -> "Factory",
    "INGESTION" -> "Ingestion")

  private def orgEntries(sc: DataFrame): DataFrame =
    entries(sc, Infix.Organization, Schemas.organization)

  def organizations(sc: DataFrame): DataFrame =
    orgEntries(sc).select(Seq(
      col("e.id").as("organization_id"),
      col("e.name").as("name"),
      mapEnum(col("e.organization_type"), orgTypeMap, "UnsetType").as("organization_type")) ++ stamp: _*)

  /** Accreditations only for CERTIFYING_BODY orgs (:236-257). */
  def accreditations(sc: DataFrame): DataFrame =
    orgEntries(sc)
      .filter(col("e.organization_type") === "CERTIFYING_BODY")
      .select(col("block_num"), col("e.id").as("organization_id"),
        explode(col("e.certifying_body_details.accreditations")).as("a"))
      .select(Seq(
        col("organization_id"),
        col("a.standard_id").as("standard_id"),
        col("a.standard_version").as("standard_version"),
        col("a.accreditor_id").as("accreditor_id"),
        coalesce(col("a.valid_from"), lit(0L)).as("valid_from"),
        coalesce(col("a.valid_to"), lit(0L)).as("valid_to")) ++ stamp: _*)

  /** Address only for FACTORY orgs (:289-318). The reference `.unwrap()`s
    * (panics) on a factory without an address (:315); we null-tolerate by
    * emitting no row — documented deviation (SURVEY §7.4), fail-fast on
    * malformed input is not a useful semantic for a distributed batch. */
  def addresses(sc: DataFrame): DataFrame =
    orgEntries(sc)
      .filter(col("e.organization_type") === "FACTORY" &&
        col("e.factory_details.address").isNotNull)
      .select(Seq(
        col("e.id").as("organization_id"),
        col("e.factory_details.address.street_line_1").as("street_line_1"),
        emptyToNull(col("e.factory_details.address.street_line_2")).as("street_line_2"),
        col("e.factory_details.address.city").as("city"),
        emptyToNull(col("e.factory_details.address.state_province")).as("state_province"),
        col("e.factory_details.address.country").as("country"),
        emptyToNull(col("e.factory_details.address.postal_code")).as("postal_code")) ++ stamp: _*)

  private val roleMap = Seq("ADMIN" -> "Admin", "TRANSACTOR" -> "Transactor")

  def authorizations(sc: DataFrame): DataFrame =
    orgEntries(sc)
      .select(col("block_num"), col("e.id").as("organization_id"),
        explode(col("e.authorizations")).as("a"))
      .select(Seq(
        col("organization_id"),
        col("a.public_key").as("public_key"),
        mapEnum(col("a.role"), roleMap, "UnsetRole").as("role")) ++ stamp: _*)

  def contacts(sc: DataFrame): DataFrame =
    orgEntries(sc)
      .select(col("block_num"), col("e.id").as("organization_id"),
        explode(col("e.contacts")).as("c"))
      .select(Seq(
        col("organization_id"),
        col("c.name").as("name"),
        col("c.phone_number").as("phone_number"),
        col("c.language_code").as("language_code")) ++ stamp: _*)

  // ---- T2: Agent ---------------------------------------------------------

  def agents(sc: DataFrame): DataFrame =
    entries(sc, Infix.Agent, Schemas.agent).select(Seq(
      col("e.public_key").as("public_key"),
      emptyToNull(col("e.organization_id")).as("organization_id"),
      col("e.name").as("name"),
      coalesce(col("e.timestamp"), lit(0L)).as("timestamp")) ++ stamp: _*)

  // ---- T3: Certificate ---------------------------------------------------

  def certificates(sc: DataFrame): DataFrame =
    entries(sc, Infix.Certificate, Schemas.certificate).select(Seq(
      col("e.id").as("certificate_id"),
      col("e.certifying_body_id").as("certifying_body_id"),
      col("e.factory_id").as("factory_id"),
      col("e.standard_id").as("standard_id"),
      col("e.standard_version").as("standard_version"),
      coalesce(col("e.valid_from"), lit(0L)).as("valid_from"),
      coalesce(col("e.valid_to"), lit(0L)).as("valid_to")) ++ stamp: _*)

  // ---- T4: Request -------------------------------------------------------

  private val statusMap = Seq(
    "OPEN" -> "Open", "IN_PROGRESS" -> "InProgress", "CLOSED" -> "Closed",
    "CERTIFIED" -> "Certified", "PRE_CERTIFIED" -> "PreCertified")

  def requests(sc: DataFrame): DataFrame =
    entries(sc, Infix.Request, Schemas.request).select(Seq(
      col("e.id").as("request_id"),
      col("e.factory_id").as("factory_id"),
      col("e.standard_id").as("standard_id"),
      mapEnum(col("e.status"), statusMap, "UnsetStatus").as("status"),
      coalesce(col("e.request_date"), lit(0L)).as("request_date")) ++ stamp: _*)

  // ---- T5: Standard + versions ------------------------------------------

  private def standardEntries(sc: DataFrame): DataFrame =
    entries(sc, Infix.Standard, Schemas.standard)

  def standards(sc: DataFrame): DataFrame =
    standardEntries(sc).select(Seq(
      col("e.id").as("standard_id"),
      col("e.organization_id").as("organization_id"),
      col("e.name").as("name")) ++ stamp: _*)

  def standardVersions(sc: DataFrame): DataFrame =
    standardEntries(sc)
      .select(col("block_num"), col("e.id").as("standard_id"),
        explode(col("e.versions")).as("v"))
      .select(Seq(
        col("standard_id"),
        col("v.version").as("version"),
        col("v.link").as("link"),
        col("v.description").as("description"),
        coalesce(col("v.approval_date"), lit(0L)).as("approval_date")) ++ stamp: _*)

  // ---- T6: Assertion (+ D9 DELETE branch) -------------------------------

  private val assertionTypeMap = Seq(
    "STANDARD" -> "Standard", "CERTIFICATE" -> "Certificate", "FACTORY" -> "Factory")

  def assertions(sc: DataFrame): DataFrame =
    entries(sc, Infix.Assertion, Schemas.assertion).select(Seq(
      col("e.id").as("assertion_id"),
      col("e.address").as("address"),
      col("e.assertor_pub_key").as("assertor_pub_key"),
      mapEnum(col("e.assertion_type"), assertionTypeMap, "UnsetType").as("assertion_type"),
      col("e.object_id").as("object_id"),
      emptyToNull(col("e.data_id")).as("data_id")) ++ stamp: _*)

  /** DELETE state changes for assertions → (block_num, address) close-out
    * ops (D9/W3, `src/event_handler.rs:185-191`). */
  def assertionDeletes(sc: DataFrame): DataFrame =
    sc.filter(Addressing.infixCol(col("address")) === Infix.Assertion &&
        col("change_type") === "DELETE")
      .select(col("block_num"), col("address"))

  /** Version markers for child tables (see Scd2.merge versionEvents):
    * every organization / standard update in the batch, whether or not
    * it carries child rows — an update with an EMPTY child set must
    * still close the previous children. */
  def orgVersionEvents(sc: DataFrame): DataFrame =
    orgEntries(sc).select(col("e.id").as("organization_id"),
      col("block_num").as("start_block_num")).distinct()

  def standardVersionEvents(sc: DataFrame): DataFrame =
    standardEntries(sc).select(col("e.id").as("standard_id"),
      col("block_num").as("start_block_num")).distinct()

  /** All SCD2 table extractors keyed by table name. */
  val extractors: Map[String, DataFrame => DataFrame] = Map(
    "organizations" -> organizations,
    "accreditations" -> accreditations,
    "addresses" -> addresses,
    "authorizations" -> authorizations,
    "contacts" -> contacts,
    "agents" -> agents,
    "certificates" -> certificates,
    "requests" -> requests,
    "standards" -> standards,
    "standard_versions" -> standardVersions,
    "assertions" -> assertions)
}
