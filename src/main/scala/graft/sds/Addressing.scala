package graft.sds

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sawtooth state-address scheme for the certificate_registry family.
  *
  * Reference: `src/event_handler.rs:5` imports `get_family_namespace_prefix`
  * and `get_address_type` from consensource-common (not vendored). Shape
  * reconstructed from public Sawtooth conventions [inferred]: an address is
  * 70 hex chars = 6-char family prefix (first 6 of sha256(family name)) +
  * 2-char entity-type infix + 62 chars of hashed entity id.
  *
  * The infix→entity mapping below is our own stable assignment (the
  * reference's exact constants live in the un-vendored common crate); all
  * fixtures and the dispatch (`src/event_handler.rs:134-202`, D8) use it
  * consistently.
  */
object Addressing {
  val FamilyName = "certificate_registry"

  private def sha256Hex(s: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** 6-hex-char family namespace prefix (server-side subscription filter
    * `^{namespace}`, `src/subscriber.rs:205-223`). */
  val Namespace: String = sha256Hex(FamilyName).take(6)

  object Infix {
    val Agent = "00"
    val Certificate = "01"
    val Organization = "02"
    val Request = "03"
    val Standard = "04"
    val Assertion = "05"
    val all: Seq[String] = Seq(Agent, Certificate, Organization, Request, Standard, Assertion)
  }

  /** Full 70-char address for an entity id (fixture builder). */
  def makeAddress(infix: String, entityId: String): String =
    Namespace + infix + sha256Hex(entityId).take(62)

  /** Column expr: 2-char entity-type infix of an address (D8 dispatch,
    * `src/event_handler.rs:139`). substring is 1-based. */
  def infixCol(address: Column): Column = substring(address, 7, 2)

  /** Namespace membership re-check (D7, `src/event_handler.rs:100,109`).
    * startsWith compiles to a cheap StartsWith predicate that Catalyst can
    * push into the scan; semantically identical to the reference's
    * `^{namespace}` regex. */
  def inNamespace(address: Column): Column = address.startsWith(Namespace)
}
