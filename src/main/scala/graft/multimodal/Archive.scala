package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multi-member gzip container support — the WARC/WET shape web-scale
  * text corpora actually arrive in (one gzip MEMBER per record,
  * members concatenated into one file, readers seek member
  * boundaries). The walk is a real RFC 1952 parse: per member, the
  * 10-byte header (magic, CM=8, flags), the optional FEXTRA / FNAME /
  * FCOMMENT / FHCRC fields skipped by their own framing, a raw-deflate
  * body inflated with `Inflater(nowrap)`, then the CRC32 + ISIZE
  * trailer — both VERIFIED, so a corrupt member fails the row instead
  * of propagating garbage.
  *
  * Scale posture: identical to every other codec leg — partition-local
  * `mapPartitions`, containers never shuffle, per-member output bounded
  * by [[Media.MaxDecodedBytes]] against hostile (zip-bomb) payloads.
  */
object Archive {

  /** One decoded member: its uncompressed payload. */
  final case class Member(payload: Array[Byte])

  object GzipCodec {
    private val Magic0 = 0x1f
    private val Magic1 = 0x8b

    /** ENCODE: one gzip member per payload, concatenated — the WARC
      * convention. Standard library writer (GZIPOutputStream) per
      * member; the reader below must walk real headers/trailers. */
    def encodeMembers(payloads: Seq[Array[Byte]]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      payloads.foreach { p =>
        val gz = new java.util.zip.GZIPOutputStream(out)
        gz.write(p); gz.finish()
      }
      out.toByteArray
    }

    /** Walk every member of a concatenated-gzip container. None if any
      * member is structurally invalid, fails CRC/ISIZE verification, or
      * inflates past `maxBytes` total (zip-bomb guard). */
    def walkMembers(b: Array[Byte],
                    maxBytes: Long = Media.MaxDecodedBytes): Option[Vector[Member]] = try {
      def u8(i: Int) = b(i) & 0xff
      def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
      def le32(i: Int): Long =
        (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) |
          (u8(i + 3).toLong << 24)) & 0xffffffffL
      var pos = 0
      var total = 0L
      var members = Vector.empty[Member]
      if (b.length == 0) return None
      while (pos < b.length) {
        // ---- RFC 1952 member header ----
        if (pos + 10 > b.length) return None
        if (u8(pos) != Magic0 || u8(pos + 1) != Magic1) return None
        if (u8(pos + 2) != 8) return None // CM must be deflate
        val flg = u8(pos + 3)
        pos += 10 // MTIME/XFL/OS carry no framing
        if ((flg & 0x04) != 0) { // FEXTRA: 2-byte length + payload
          if (pos + 2 > b.length) return None
          val xlen = le16(pos); pos += 2 + xlen
        }
        if ((flg & 0x08) != 0) { // FNAME: zero-terminated
          while (pos < b.length && b(pos) != 0) pos += 1
          pos += 1
        }
        if ((flg & 0x10) != 0) { // FCOMMENT: zero-terminated
          while (pos < b.length && b(pos) != 0) pos += 1
          pos += 1
        }
        if ((flg & 0x02) != 0) pos += 2 // FHCRC
        if (pos > b.length) return None
        // ---- raw deflate body ----
        val inf = new java.util.zip.Inflater(true)
        inf.setInput(b, pos, b.length - pos)
        val chunk = new Array[Byte](8192)
        val body = new java.io.ByteArrayOutputStream()
        while (!inf.finished()) {
          val n = inf.inflate(chunk)
          if (n == 0 && inf.needsInput()) { inf.end(); return None } // truncated
          total += n
          if (total > maxBytes) { inf.end(); return None }
          body.write(chunk, 0, n)
        }
        val consumed = (b.length - pos) - inf.getRemaining
        pos += consumed
        inf.end()
        val payload = body.toByteArray
        // ---- trailer: CRC32 + ISIZE, both verified ----
        if (pos + 8 > b.length) return None
        val crc = new java.util.zip.CRC32()
        crc.update(payload)
        if (le32(pos) != crc.getValue) return None
        if (le32(pos + 4) != (payload.length.toLong & 0xffffffffL)) return None
        pos += 8
        members :+= Member(payload)
      }
      Some(members)
    } catch { case _: Exception => None }
  }

  /** Deterministic WARC-shaped fixtures from `documents`: doc d becomes
    * a container of (d%3 + 1) gzip members, member j carrying the
    * ASCII payload `text || ':' || j` — so member count, total
    * uncompressed bytes and the concatenated-payload sha256 are all
    * closed-form in the oracle while the engine must EARN them through
    * the real header/inflate/trailer walk. */
  def synthWarcGzs(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (d, text) =>
        val m = (d % 3 + 1).toInt
        // UTF-8, NOT US-ASCII: the oracle computes octet_length/sha256
        // over encode(text) (UTF-8 bytes); ASCII would mangle any
        // non-ASCII corpus char to '?' and break byte-level parity
        val payloads = (0 until m).map(j => s"$text:$j".getBytes("UTF-8"))
        (d, GzipCodec.encodeMembers(payloads))
      }).toDF("media_id", "content")
  }

  /** Per-container ingest row. */
  final case class ArchiveStats(media_id: Long, n_members: Int,
                                total_bytes: Long, payload_sha: String)

  /** WARC-GZIP INGEST: walk each container's members, verify every
    * trailer, report member count / uncompressed size / content sha256
    * over the concatenated payloads. Partition-local; unparsable or
    * corrupt containers → (-1, -1, ""). */
  def ingestArchives(media: DataFrame): Dataset[ArchiveStats] = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        GzipCodec.walkMembers(bytes) match {
          case Some(ms) =>
            val md = java.security.MessageDigest.getInstance("SHA-256")
            var total = 0L
            ms.foreach { m => md.update(m.payload); total += m.payload.length }
            ArchiveStats(id, ms.length, total,
              md.digest().map("%02x".format(_)).mkString)
          case None => ArchiveStats(id, -1, -1L, "")
        }
      })
  }
}
