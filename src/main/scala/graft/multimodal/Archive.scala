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
    Media.spread(docs).select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (d, text) =>
        val m = (d % 3 + 1).toInt
        // UTF-8, NOT US-ASCII: the oracle computes octet_length/sha256
        // over encode(text) (UTF-8 bytes); ASCII would mangle any
        // non-ASCII corpus char to '?' and break byte-level parity
        val payloads = (0 until m).map(j => s"$text:$j".getBytes("UTF-8"))
        (d, GzipCodec.encodeMembers(payloads))
      }).toDF("media_id", "content")
  }

  object TarCodec {
    private val BlockSize = 512

    private def octal(v: Long, width: Int): Array[Byte] = {
      // POSIX numeric field: zero-padded octal, NUL terminator
      val s = java.lang.Long.toOctalString(v)
      val b = new Array[Byte](width)
      val pad = width - 1 - s.length
      var i = 0
      while (i < pad) { b(i) = '0'; i += 1 }
      s.getBytes("US-ASCII").copyToArray(b, pad)
      b(width - 1) = 0
      b
    }

    /** ENCODE one POSIX ustar archive: per file a 512-byte header
      * (name, octal size, ustar magic, REAL checksum over the header
      * with the chksum field blanked to spaces) + content padded to a
      * 512 boundary, then the two all-zero terminator blocks. */
    def encode(files: Seq[(String, Array[Byte])]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      files.foreach { case (name, content) =>
        val h = new Array[Byte](BlockSize)
        val nb = name.getBytes("US-ASCII")
        nb.copyToArray(h, 0) // name[100]
        octal(420, 8).copyToArray(h, 100) // mode 0644
        octal(0, 8).copyToArray(h, 108) // uid
        octal(0, 8).copyToArray(h, 116) // gid
        octal(content.length.toLong, 12).copyToArray(h, 124) // size
        octal(0, 12).copyToArray(h, 136) // mtime
        java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum blank
        h(156) = '0' // typeflag: regular file
        "ustar".getBytes("US-ASCII").copyToArray(h, 257) // magic + NUL
        h(263) = '0'; h(264) = '0' // version "00"
        var sum = 0L
        var i = 0
        while (i < BlockSize) { sum += (h(i) & 0xff); i += 1 }
        val cs = octal(sum, 7)
        cs.copyToArray(h, 148); h(155) = ' '
        out.write(h)
        out.write(content)
        val rem = content.length % BlockSize
        if (rem != 0) out.write(new Array[Byte](BlockSize - rem))
      }
      out.write(new Array[Byte](2 * BlockSize)) // end-of-archive
      out.toByteArray
    }

    /** One extracted tar entry. */
    final case class Entry(name: String, payload: Array[Byte])

    private def parseOctal(b: Array[Byte], off: Int, len: Int): Option[Long] = {
      var v = 0L
      var i = off
      val end = off + len
      // skip leading spaces/NULs, read octal digits, stop at NUL/space
      while (i < end && (b(i) == ' ' || b(i) == 0)) i += 1
      var any = false
      while (i < end && b(i) >= '0' && b(i) <= '7') {
        v = v * 8 + (b(i) - '0'); i += 1; any = true
      }
      if (any) Some(v) else None
    }

    /** Walk a ustar archive: per header verify the magic and the
      * CHECKSUM (sum of header bytes with chksum blanked), parse the
      * octal size, slice the content, skip its padding; stop at the
      * all-zero terminator block. None on any structural violation or
      * if total extracted bytes exceed `maxBytes` (tar-bomb guard). */
    def walk(b: Array[Byte],
             maxBytes: Long = Media.MaxDecodedBytes): Option[Vector[Entry]] = try {
      var pos = 0
      var total = 0L
      var entries = Vector.empty[Entry]
      if (b.length < 2 * BlockSize) return None
      var done = false
      while (!done) {
        if (pos + BlockSize > b.length) return None
        if (b.slice(pos, pos + BlockSize).forall(_ == 0)) { done = true }
        else {
          // magic "ustar" at 257
          if (pos + 263 > b.length) return None
          val magic = new String(b, pos + 257, 5, "US-ASCII")
          if (magic != "ustar") return None
          val stored = parseOctal(b, pos + 148, 8).getOrElse(return None)
          var sum = 0L
          var i = 0
          while (i < BlockSize) {
            val v = if (i >= 148 && i < 156) ' '.toLong else (b(pos + i) & 0xff).toLong
            sum += v; i += 1
          }
          if (sum != stored) return None
          val size = parseOctal(b, pos + 124, 12).getOrElse(return None)
          total += size
          if (total > maxBytes) return None
          var ne = 0
          while (ne < 100 && b(pos + ne) != 0) ne += 1
          val name = new String(b, pos, ne, "US-ASCII")
          val cstart = pos + BlockSize
          if (cstart + size > b.length) return None
          entries :+= Entry(name, b.slice(cstart, cstart + size.toInt))
          val padded = ((size + BlockSize - 1) / BlockSize) * BlockSize
          pos = cstart + padded.toInt
        }
      }
      Some(entries)
    } catch { case _: Exception => None }
  }

  /** Deterministic tar fixtures from `documents`: doc d becomes a ustar
    * archive of (d%3 + 1) files, file j named `doc<d>/part<j>.txt`
    * carrying the UTF-8 payload `text || ':' || j` — file count, total
    * content bytes and the name/payload sha256s are all closed-form in
    * the oracle while the engine must EARN them through the real
    * header/checksum/padding walk. */
  def synthTars(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    Media.spread(docs).select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (d, text) =>
        val m = (d % 3 + 1).toInt
        val files = (0 until m).map(j =>
          (s"doc$d/part$j.txt", s"$text:$j".getBytes("UTF-8")))
        (d, TarCodec.encode(files))
      }).toDF("media_id", "content")
  }

  /** Per-tar ingest row. */
  final case class TarStats(media_id: Long, n_files: Int,
                            total_bytes: Long, names_sha: String,
                            payload_sha: String)

  /** TAR INGEST: walk each ustar container, verify every header
    * checksum, report file count / content bytes / sha256 over the
    * concatenated names and payloads (entry order). Partition-local;
    * unparsable containers → (-1, -1, "", ""). */
  def ingestTars(media: DataFrame): Dataset[TarStats] = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        TarCodec.walk(bytes) match {
          case Some(es) =>
            def hex(d: Array[Byte]) = d.map("%02x".format(_)).mkString
            val mdN = java.security.MessageDigest.getInstance("SHA-256")
            val mdP = java.security.MessageDigest.getInstance("SHA-256")
            var total = 0L
            es.foreach { e =>
              mdN.update(e.name.getBytes("UTF-8"))
              mdP.update(e.payload); total += e.payload.length
            }
            TarStats(id, es.length, total, hex(mdN.digest()), hex(mdP.digest()))
          case None => TarStats(id, -1, -1L, "", "")
        }
      })
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
