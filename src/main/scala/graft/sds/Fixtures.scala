package graft.sds

/** JSON fixture builders mirroring the reference's protobuf test builders
  * (`src/event_handler.rs:631-747`, constants :443-452). Values are JSON
  * documents layered exactly like the wire format (see Schemas scaladoc).
  */
object Fixtures {
  val PublicKey = "test_public_key"
  val OrgId = "test_org"
  val CertOrgId = "test_cert_org"
  val FactoryId = "test_factory"
  val StandardsBodyId = "test_standards_body"
  val CertId = "test_cert"
  val RequestId = "test_request"
  val StandardId = "test_standard"
  val AssertionId = "test_assertion"
  val AssertionAddress = "some_state_address"

  /** JSON string literal with escaping. */
  def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c => c.toString
    } + "\""

  final case class Change(address: String, changeType: String, value: String)

  def stateChangeList(changes: Seq[Change]): String =
    changes.map(c =>
        s"""{"address":"${c.address}","changeType":"${c.changeType}","value":${jstr(c.value)}}""")
      .mkString("""{"state_changes":[""", ",", "]}")

  /** One EventList batch: block-commit + one state-delta event. */
  def batch(blockNum: Long, blockId: String, changes: Seq[Change]): String = {
    val delta =
      if (changes.isEmpty) ""
      else
        s""",{"eventType":"sawtooth/state-delta","attributes":[],"data":${jstr(stateChangeList(changes))}}"""
    s"""{"events":[{"eventType":"sawtooth/block-commit","attributes":[""" +
      s"""{"key":"block_num","value":"$blockNum"},{"key":"block_id","value":"$blockId"}]}""" +
      delta + "]}"
  }

  /** Heartbeat ping: empty EventList (`src/event_handler.rs:30,43-52`). */
  val heartbeat = """{"events":[]}"""

  def container(entitiesJson: String*): String =
    s"""{"entries":[${entitiesJson.mkString(",")}]}"""

  // ---- entity builders (mirroring make_* helpers) -----------------------

  /** make_agent (:631). */
  def agentJson(publicKey: String = PublicKey, orgId: String = OrgId,
                name: String = "test", timestamp: Long = 1): String =
    s"""{"public_key":"$publicKey","organization_id":"$orgId","name":"$name","timestamp":$timestamp}"""

  /** make_certifying_body (:641): 1 contact, 1 accreditation, 1 ADMIN auth. */
  def certifyingBodyJson(id: String = CertOrgId): String =
    s"""{"id":"$id","name":"test","organization_type":"CERTIFYING_BODY",""" +
      s""""contacts":[{"name":"test","phone_number":"test","language_code":"test"}],""" +
      s""""authorizations":[{"public_key":"$PublicKey","role":"ADMIN"}],""" +
      s""""certifying_body_details":{"accreditations":[{"standard_id":"$StandardId",""" +
      s""""standard_version":"test","accreditor_id":"$StandardsBodyId","valid_from":1,"valid_to":2}]}}"""

  /** make_factory (:671): 1 contact, address with street_line_2 unset. */
  def factoryJson(id: String = FactoryId): String =
    s"""{"id":"$id","name":"test","organization_type":"FACTORY",""" +
      s""""contacts":[{"name":"test","phone_number":"test","language_code":"test"}],""" +
      s""""factory_details":{"address":{"street_line_1":"test","city":"test",""" +
      s""""state_province":"test","country":"test","postal_code":"test"}}}"""

  /** make_certificate (:696). */
  def certificateJson(id: String = CertId): String =
    s"""{"id":"$id","certifying_body_id":"$CertOrgId","factory_id":"$FactoryId",""" +
      s""""standard_id":"$StandardId","standard_version":"test","valid_from":1,"valid_to":2}"""

  /** make_request (:709). */
  def requestJson(id: String = RequestId, status: String = "OPEN"): String =
    s"""{"id":"$id","status":"$status","standard_id":"$StandardId",""" +
      s""""factory_id":"$FactoryId","request_date":1}"""

  /** make_standard (:720): 1 version. */
  def standardJson(id: String = StandardId): String =
    s"""{"id":"$id","organization_id":"$StandardsBodyId","name":"test",""" +
      s""""versions":[{"version":"test","link":"test","description":"test","approval_date":1}]}"""

  /** make_assertion (:738): FACTORY assertion, data_id unset. The
    * `address` field is the assertion's own state address (the reference's
    * DeleteAssertion closes rows by state address,
    * `src/event_handler.rs:185-191`, so the stored column must carry it —
    * the reference unit test's "some_state_address" plays the same role). */
  def assertionJson(id: String = AssertionId, objectId: String = FactoryId,
                    address: String = AssertionAddress): String =
    s"""{"id":"$id","address":"$address","assertor_pub_key":"$PublicKey",""" +
      s""""assertion_type":"FACTORY","object_id":"$objectId"}"""

  // convenient addresses
  def orgAddress(id: String): String = Addressing.makeAddress(Addressing.Infix.Organization, id)
  def agentAddress(key: String): String = Addressing.makeAddress(Addressing.Infix.Agent, key)
  def certAddress(id: String): String = Addressing.makeAddress(Addressing.Infix.Certificate, id)
  def requestAddress(id: String): String = Addressing.makeAddress(Addressing.Infix.Request, id)
  def standardAddress(id: String): String = Addressing.makeAddress(Addressing.Infix.Standard, id)
  def assertionStateAddress(id: String): String = Addressing.makeAddress(Addressing.Infix.Assertion, id)
}
