package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

/** The EXACT wire frames the validator event connector speaks — encode /
  * decode implemented and tested; only the raw socket is absent in this
  * environment (no ZMQ native lib offline). A production deployment
  * plugs a DEALER socket's send/recv into [[respondViaFrames]] and the
  * rest of the connector ([[Negotiate]], `BlockLogSource`'s offset
  * logic, the decode pipeline) runs unchanged.
  *
  * Framing (Sawtooth validator protocol, public `validator.proto` /
  * `client_event.proto` / `events.proto`; reference usage
  * `/root/reference/src/subscriber.rs:58-106`):
  *
  *  - Transport: one ZMQ DEALER socket connected to the validator's
  *    ROUTER endpoint (e.g. `tcp://validator:4004`). Every application
  *    message is a SINGLE ZMQ frame containing one serialized `Message`
  *    envelope — no multipart framing beyond ROUTER's identity frame.
  *  - Envelope `Message`: field 1 `message_type` (enum varint), field 2
  *    `correlation_id` (string — a fresh UUID per request; the response
  *    echoes it), field 3 `content` (bytes — the serialized payload).
  *  - Message types used by the subscriber:
  *      CLIENT_EVENTS_SUBSCRIBE_REQUEST    = 500
  *      CLIENT_EVENTS_SUBSCRIBE_RESPONSE   = 501
  *      CLIENT_EVENTS_UNSUBSCRIBE_REQUEST  = 502
  *      CLIENT_EVENTS_UNSUBSCRIBE_RESPONSE = 503
  *      CLIENT_EVENTS                      = 504 (unsolicited EventList
  *                                                pushes after OK)
  *  - `ClientEventsSubscribeRequest`: field 1 repeated
  *    `EventSubscription`, field 2 repeated string
  *    `last_known_block_ids` (the ≤10-id newest-first window
  *    [[Negotiate.window]] produces, genesis `NULL_BLOCK_ID` fallback).
  *  - `EventSubscription`: field 1 `event_type` string
  *    (`sawtooth/block-commit`, `sawtooth/state-delta`), field 2
  *    repeated `EventFilter`.
  *  - `EventFilter`: field 1 `key` ("address"), field 2 `match_string`
  *    (`^` + namespace prefix), field 3 `filter_type` enum varint
  *    (REGEX_ANY = 3) — the S2 server-side namespace filter.
  *  - `ClientEventsSubscribeResponse`: field 1 `status` enum varint
  *    (OK = 1, INVALID_FILTER = 2, UNKNOWN_BLOCK = 3), field 2
  *    `response_message` string.
  *  - After OK, each CLIENT_EVENTS frame's content is an `EventList`
  *    whose events feed the existing D1 decode (`sds.ProtoLite` /
  *    `sds.Decode`) unchanged.
  */
object ZmqWire {

  // message_type values (validator.proto, public)
  val ClientEventsSubscribeRequest = 500
  val ClientEventsSubscribeResponse = 501
  val ClientEventsUnsubscribeRequest = 502
  val ClientEventsUnsubscribeResponse = 503
  val ClientEvents = 504

  // ClientEventsSubscribeResponse.Status (client_event.proto)
  val StatusOk = 1
  val StatusInvalidFilter = 2
  val StatusUnknownBlock = 3

  // EventFilter.FilterType (events.proto)
  val FilterRegexAny = 3

  val BlockCommitEventType = "sawtooth/block-commit"
  val StateDeltaEventType = "sawtooth/state-delta"

  // ---- low-level writers -------------------------------------------------

  private def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def writeTag(out: ByteArrayOutputStream, fieldNo: Int, wire: Int): Unit =
    writeVarint(out, (fieldNo.toLong << 3) | wire)

  private def writeBytes(out: ByteArrayOutputStream, fieldNo: Int, b: Array[Byte]): Unit = {
    writeTag(out, fieldNo, 2); writeVarint(out, b.length.toLong); out.write(b, 0, b.length)
  }

  private def writeString(out: ByteArrayOutputStream, fieldNo: Int, s: String): Unit =
    writeBytes(out, fieldNo, s.getBytes(UTF_8))

  private def writeEnum(out: ByteArrayOutputStream, fieldNo: Int, v: Int): Unit =
    if (v != 0) { writeTag(out, fieldNo, 0); writeVarint(out, v.toLong) }

  // ---- low-level reader --------------------------------------------------

  private final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var out = 0L
      while (true) {
        require(pos < end, "truncated frame: varint runs past frame end")
        val b = buf(pos); pos += 1
        out |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return out
        shift += 7
        require(shift < 64, "varint too long")
      }
      out
    }
    def delimited(): (Int, Int) = {
      val len64 = varint()
      require(len64 >= 0 && len64 <= (end - pos).toLong,
        "length-delimited field overruns frame")
      val len = len64.toInt
      val s = pos; pos += len
      (s, s + len)
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 1 =>
        require(pos + 8 <= end, "truncated frame: fixed64 runs past frame end")
        pos += 8
      case 2 => delimited()
      case 5 =>
        require(pos + 4 <= end, "truncated frame: fixed32 runs past frame end")
        pos += 4
      case t => throw new IllegalArgumentException(s"unsupported wire type $t")
    }
  }

  // ---- payload encoders --------------------------------------------------

  private def eventFilter(key: String, matchString: String, filterType: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeString(out, 1, key)
    writeString(out, 2, matchString)
    writeEnum(out, 3, filterType)
    out.toByteArray
  }

  private def eventSubscription(eventType: String,
                                filters: Seq[Array[Byte]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeString(out, 1, eventType)
    filters.foreach(writeBytes(out, 2, _))
    out.toByteArray
  }

  /** `ClientEventsSubscribeRequest` content bytes: the block-commit
    * subscription + the namespace-filtered state-delta subscription +
    * the known-id window (reference `build_subscription_request`). */
  def subscribeRequest(lastKnownBlockIds: Seq[String],
                       namespacePrefix: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeBytes(out, 1, eventSubscription(BlockCommitEventType, Nil))
    writeBytes(out, 1, eventSubscription(StateDeltaEventType,
      Seq(eventFilter("address", "^" + namespacePrefix, FilterRegexAny))))
    lastKnownBlockIds.foreach(writeString(out, 2, _))
    out.toByteArray
  }

  /** `ClientEventsUnsubscribeRequest` content: an empty message. */
  def unsubscribeRequest(): Array[Byte] = Array.emptyByteArray

  /** Full single-frame `Message` envelope. */
  def envelope(messageType: Int, correlationId: String,
               content: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeEnum(out, 1, messageType)
    writeString(out, 2, correlationId)
    writeBytes(out, 3, content)
    out.toByteArray
  }

  // ---- decoders ----------------------------------------------------------

  final case class Envelope(messageType: Int, correlationId: String,
                            content: Array[Byte])

  def parseEnvelope(frame: Array[Byte]): Envelope = {
    val r = new Reader(frame, 0, frame.length)
    var mt = 0; var cid = ""; var content = Array.emptyByteArray
    while (r.hasMore) {
      val tag = r.varint()
      val (field, wire) = ((tag >>> 3).toInt, (tag & 7).toInt)
      field match {
        case 1 => mt = r.varint().toInt
        case 2 => val (s, e) = r.delimited(); cid = new String(frame, s, e - s, UTF_8)
        case 3 => val (s, e) = r.delimited(); content = java.util.Arrays.copyOfRange(frame, s, e)
        case _ => r.skip(wire)
      }
    }
    Envelope(mt, cid, content)
  }

  /** `ClientEventsSubscribeResponse.status` from content bytes. */
  def parseSubscribeStatus(content: Array[Byte]): Int = {
    val r = new Reader(content, 0, content.length)
    var status = 0
    while (r.hasMore) {
      val tag = r.varint()
      val (field, wire) = ((tag >>> 3).toInt, (tag & 7).toInt)
      if (field == 1 && wire == 0) status = r.varint().toInt else r.skip(wire)
    }
    status
  }

  /** Decoded view of a subscribe-request frame — what a validator (or a
    * loopback test double) reads off the wire. */
  final case class SubscribeRequest(eventTypes: Seq[String],
                                    addressFilters: Seq[String],
                                    lastKnownBlockIds: Seq[String])

  def parseSubscribeRequest(content: Array[Byte]): SubscribeRequest = {
    val types = Seq.newBuilder[String]
    val filters = Seq.newBuilder[String]
    val ids = Seq.newBuilder[String]
    val r = new Reader(content, 0, content.length)
    while (r.hasMore) {
      val tag = r.varint()
      val (field, wire) = ((tag >>> 3).toInt, (tag & 7).toInt)
      field match {
        case 1 =>
          val (s, e) = r.delimited()
          val sub = new Reader(content, s, e)
          while (sub.hasMore) {
            val t2 = sub.varint()
            val (f2, w2) = ((t2 >>> 3).toInt, (t2 & 7).toInt)
            f2 match {
              case 1 =>
                val (ss, se) = sub.delimited()
                types += new String(content, ss, se - ss, UTF_8)
              case 2 =>
                val (fs, fe) = sub.delimited()
                val fr = new Reader(content, fs, fe)
                while (fr.hasMore) {
                  val t3 = fr.varint()
                  val (f3, w3) = ((t3 >>> 3).toInt, (t3 & 7).toInt)
                  if (f3 == 2 && w3 == 2) {
                    val (ms, me) = fr.delimited()
                    filters += new String(content, ms, me - ms, UTF_8)
                  } else fr.skip(w3)
                }
              case _ => sub.skip(w2)
            }
          }
        case 2 =>
          val (s, e) = r.delimited()
          ids += new String(content, s, e - s, UTF_8)
        case _ => r.skip(wire)
      }
    }
    SubscribeRequest(types.result(), filters.result(), ids.result())
  }

  /** `ClientEventsSubscribeResponse` content bytes (test doubles /
    * loopback validators). */
  def subscribeResponse(status: Int, message: String = ""): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeEnum(out, 1, status)
    if (message.nonEmpty) writeString(out, 2, message)
    out.toByteArray
  }

  /** Adapt a FRAME-level transport (send one envelope frame, receive the
    * response frame — in production, a ZMQ DEALER send/recv pair) into
    * [[Negotiate]]'s respond function: the full production handshake is
    * then `Negotiate.negotiate(knownIds, respondViaFrames(transport,
    * ns))`. Correlation ids are fresh UUIDs; a response whose
    * correlation id does not echo the request's is a protocol error. */
  def respondViaFrames(transport: Array[Byte] => Array[Byte],
                       namespacePrefix: String)
      : Seq[String] => Negotiate.Response = { window =>
    val cid = java.util.UUID.randomUUID().toString
    val reply = transport(envelope(ClientEventsSubscribeRequest, cid,
      subscribeRequest(window, namespacePrefix)))
    val env = parseEnvelope(reply)
    if (env.messageType != ClientEventsSubscribeResponse)
      Negotiate.Invalid(s"unexpected message_type ${env.messageType}")
    else if (env.correlationId != cid)
      Negotiate.Invalid(s"correlation id mismatch: ${env.correlationId}")
    else parseSubscribeStatus(env.content) match {
      case StatusOk => Negotiate.Ok
      case StatusUnknownBlock => Negotiate.UnknownBlock
      case s => Negotiate.Invalid(s"status $s")
    }
  }
}
