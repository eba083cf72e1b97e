package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The validator wire protocol: exact byte layout of the subscribe
  * handshake frames, envelope round-trips, and the full fork-point
  * negotiation driven FRAME-LEVEL against a loopback validator that
  * parses the real bytes (everything but the socket). */
class ZmqWireSpec extends AnyFunSuite {
  import ZmqWire._

  test("envelope bytes: exact layout of tag/varint/length-delimited fields") {
    val frame = envelope(ClientEventsSubscribeRequest, "abc", Array[Byte](1, 2))
    // field 1 (message_type, varint): tag 0x08, 500 = 0xF4 0x03
    assert((frame(0) & 0xff) === 0x08)
    assert((frame(1) & 0xff) === 0xf4 && (frame(2) & 0xff) === 0x03)
    // field 2 (correlation_id, len-delim): tag 0x12, len 3, "abc"
    assert((frame(3) & 0xff) === 0x12 && frame(4) === 3)
    assert(new String(frame.slice(5, 8), "UTF-8") === "abc")
    // field 3 (content, len-delim): tag 0x1A, len 2, payload
    assert((frame(8) & 0xff) === 0x1a && frame(9) === 2)
    assert(frame.slice(10, 12).toSeq === Seq[Byte](1, 2))
    assert(frame.length === 12)
    val env = parseEnvelope(frame)
    assert(env.messageType === ClientEventsSubscribeRequest)
    assert(env.correlationId === "abc")
    assert(env.content.toSeq === Seq[Byte](1, 2))
  }

  test("subscribe request carries both subscriptions, the regex filter, and the id window") {
    val req = parseSubscribeRequest(
      subscribeRequest(Seq("id9", "id8", Negotiate.NullBlockId), "531035"))
    assert(req.eventTypes === Seq(BlockCommitEventType, StateDeltaEventType))
    assert(req.addressFilters === Seq("^531035"))
    assert(req.lastKnownBlockIds === Seq("id9", "id8", Negotiate.NullBlockId))
  }

  test("subscribe response status round-trips, proto3 zero-default included") {
    assert(parseSubscribeStatus(subscribeResponse(StatusOk)) === StatusOk)
    assert(parseSubscribeStatus(subscribeResponse(StatusUnknownBlock)) === StatusUnknownBlock)
    assert(parseSubscribeStatus(subscribeResponse(0)) === 0)
  }

  test("full negotiation over real frames against a parsing loopback validator") {
    // validator knows only "old1"; the subscriber's newest 20 ids are
    // unknown → two UNKNOWN_BLOCK shifts, then OK on the third window
    val known = (0 until 20).map(i => s"new$i") ++ Seq("old1", "old0")
    var requests = 0
    val validator: Array[Byte] => Array[Byte] = { frame =>
      requests += 1
      val env = parseEnvelope(frame)
      assert(env.messageType === ClientEventsSubscribeRequest)
      val req = parseSubscribeRequest(env.content)
      assert(req.addressFilters === Seq("^531035"))
      val status =
        if (req.lastKnownBlockIds.exists(Set("old1", Negotiate.NullBlockId)))
          StatusOk
        else StatusUnknownBlock
      envelope(ClientEventsSubscribeResponse, env.correlationId,
        subscribeResponse(status))
    }
    val out = Negotiate.negotiate(known, respondViaFrames(validator, "531035"))
    assert(out === Right(Seq("old1", "old0")))
    assert(requests === 3)
  }

  test("malformed frames fail with a descriptive protocol error, not an array overrun") {
    val good = envelope(ClientEventsSubscribeRequest, "abc", Array[Byte](1, 2))
    // every MID-FIELD truncation must be a clean require(); cuts at a
    // field boundary (3 = after message_type, 8 = after correlation_id)
    // are legal proto3 frames with default-valued trailing fields
    for (cut <- (1 until good.length).filterNot(Set(3, 8))) {
      val e = intercept[IllegalArgumentException] {
        parseEnvelope(good.take(cut))
      }
      assert(e.getMessage != null)
    }
    // length-delimited field claiming more bytes than the frame holds
    val lie = good.clone(); lie(4) = 100.toByte // correlation_id len 3 → 100
    assert(intercept[IllegalArgumentException](parseEnvelope(lie))
      .getMessage.contains("overruns"))
    // huge varint length that would wrap negative as an Int
    val neg = Array[Byte](0x12, 0xff.toByte, 0xff.toByte, 0xff.toByte,
      0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0x7f)
    assert(intercept[IllegalArgumentException](parseEnvelope(neg))
      .getMessage.contains("overruns"))
    // unknown fixed64/fixed32 fields get skipped — but only within bounds
    val fx64short = Array[Byte](0x39, 1, 2, 3) // field 7, wire 1, 3 of 8 bytes
    assert(intercept[IllegalArgumentException](parseEnvelope(fx64short))
      .getMessage.contains("fixed64"))
    val fx32short = Array[Byte](0x3d, 1, 2) // field 7, wire 5, 2 of 4 bytes
    assert(intercept[IllegalArgumentException](parseEnvelope(fx32short))
      .getMessage.contains("fixed32"))
    // varint with an endless continuation bit
    val endless = Array[Byte](0x08, 0x80.toByte)
    assert(intercept[IllegalArgumentException](parseEnvelope(endless))
      .getMessage.contains("truncated"))
  }

  test("correlation-id mismatch and wrong message type are protocol errors") {
    val badCid: Array[Byte] => Array[Byte] = { _ =>
      envelope(ClientEventsSubscribeResponse, "not-the-cid",
        subscribeResponse(StatusOk))
    }
    assert(Negotiate.negotiate(Seq("a"), respondViaFrames(badCid, "ns")).isLeft)
    val badType: Array[Byte] => Array[Byte] = { frame =>
      envelope(ClientEvents, parseEnvelope(frame).correlationId,
        subscribeResponse(StatusOk))
    }
    assert(Negotiate.negotiate(Seq("a"), respondViaFrames(badType, "ns")).isLeft)
  }
}
