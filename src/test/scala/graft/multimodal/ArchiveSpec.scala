package graft.multimodal

import graft.SparkSpec
import Archive.GzipCodec

/** RFC 1952 member walk: round-trips, optional header fields, trailer
  * verification, truncation/corruption rejection, zip-bomb bound. */
class ArchiveSpec extends SparkSpec {
  import spark.implicits._

  private def members(payloads: Seq[String]): Array[Byte] =
    GzipCodec.encodeMembers(payloads.map(_.getBytes("US-ASCII")))

  test("multi-member round-trip: every payload back, in order") {
    val ps = Seq("first record", "second", "", "fourth with more bytes " * 50)
    val got = GzipCodec.walkMembers(members(ps))
      .getOrElse(fail("container did not walk"))
    assert(got.map(m => new String(m.payload, "US-ASCII")) === ps.toVector)
  }

  test("members with FNAME and FEXTRA fields still walk (framing skipped)") {
    // hand-frame one member with FNAME+FEXTRA around a stored deflate of "hi"
    val body = {
      val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      d.setInput("hi".getBytes("US-ASCII")); d.finish()
      val buf = new Array[Byte](64); val n = d.deflate(buf); d.end()
      buf.take(n)
    }
    val crc = new java.util.zip.CRC32(); crc.update("hi".getBytes("US-ASCII"))
    def le32(v: Long) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val member =
      Array[Byte](0x1f.toByte, 0x8b.toByte, 8, (0x08 | 0x04).toByte, // FNAME|FEXTRA
        0, 0, 0, 0, 0, 0) ++
        Array[Byte](3, 0) ++ Array[Byte](1, 2, 3) ++ // FEXTRA: xlen=3 + 3 bytes
        "rec.warc".getBytes("US-ASCII") ++ Array[Byte](0) ++ // FNAME, NUL-terminated
        body ++ le32(crc.getValue) ++ le32(2)
    val got = GzipCodec.walkMembers(member ++ members(Seq("tail")))
      .getOrElse(fail("framed member did not walk"))
    assert(got.map(m => new String(m.payload, "US-ASCII")) === Vector("hi", "tail"))
  }

  test("corrupt CRC, wrong ISIZE, truncation, and junk are all rejected") {
    val good = members(Seq("payload one", "payload two"))
    val badCrc = good.clone()
    badCrc(good.length - 8) = (badCrc(good.length - 8) ^ 0xff).toByte
    assert(GzipCodec.walkMembers(badCrc).isEmpty, "flipped CRC must fail")
    val badIsize = good.clone()
    badIsize(good.length - 4) = (badIsize(good.length - 4) ^ 0xff).toByte
    assert(GzipCodec.walkMembers(badIsize).isEmpty, "flipped ISIZE must fail")
    assert(GzipCodec.walkMembers(good.take(good.length - 3)).isEmpty, "truncated trailer")
    assert(GzipCodec.walkMembers(good.take(12)).isEmpty, "truncated body")
    assert(GzipCodec.walkMembers("not gzip at all".getBytes("US-ASCII")).isEmpty)
    assert(GzipCodec.walkMembers(Array.empty[Byte]).isEmpty)
  }

  test("zip-bomb guard: inflation past maxBytes refuses the container") {
    val big = members(Seq("x" * 100000))
    assert(GzipCodec.walkMembers(big, maxBytes = 1000).isEmpty)
    assert(GzipCodec.walkMembers(big, maxBytes = 200000).isDefined)
  }

  test("q193 fixture: member count / bytes / sha match the closed form") {
    val docs = Seq((4L, "alpha beta"), (5L, "gamma")).toDF("doc_id", "text")
    val out = Archive.ingestArchives(Archive.synthWarcGzs(docs))
      .collect().map(r => r.media_id -> r).toMap
    // doc 4: 2 members "alpha beta:0","alpha beta:1"; doc 5: 3 members
    assert(out(4L).n_members === 2)
    assert(out(4L).total_bytes === 2L * ("alpha beta".length + 2))
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update("alpha beta:0alpha beta:1".getBytes("US-ASCII"))
    assert(out(4L).payload_sha === md.digest().map("%02x".format(_)).mkString)
    assert(out(5L).n_members === 3)
  }
}
