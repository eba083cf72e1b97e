package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (driver mandate, SURVEY.md §2.6): treat
  * image/audio/video as opaque `binary` columns with typed metadata, and
  * run decode / feature-extract / resize / frame-sample as distributed
  * per-partition transforms.
  *
  * The Spark-side plumbing — schema, partition-preserving mapPartitions,
  * batch shape, typed Encoders — is real and tested. The codec calls are
  * STUBS (this environment has no image/audio libraries): `StubCodec`
  * derives deterministic fake pixels/frames from the bytes so tests can
  * assert exact outputs. Swapping in a real codec changes only the
  * function bodies marked "stub", not the dataflow.
  *
  * Scale posture: media blobs never pass through a shuffle — decode and
  * feature extraction are mapPartitions stages fused after the scan, and
  * only small fixed-width feature rows (not blobs) flow into downstream
  * joins/aggregations. Partition sizing is byte-based
  * (`spark.sql.files.maxPartitionBytes`), which is what bounds executor
  * memory when rows are multi-MB blobs.
  */
object Media {

  /** A media object: opaque payload + typed metadata. */
  case class MediaRow(
      media_id: Long,
      kind: String,             // image | audio | video
      content: Array[Byte],     // opaque encoded payload
      mime: String,
      width: Int,               // images/video; 0 when n/a
      height: Int,
      duration_ms: Long)        // audio/video; 0 for images

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),
    StructField("content", BinaryType),
    StructField("mime", StringType),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  /** Fixed-width per-media features — the only thing that flows into
    * downstream relational ops. */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      size_bytes: Long,
      sha: String,              // content fingerprint
      mean_intensity: Double,   // stub-decoded pixel mean
      n_frames: Int)

  /** Deterministic stand-in for the real codec layer. Every function is
    * pure on the payload bytes, so outputs are reproducible in tests. */
  object StubCodec {
    /** stub: "decode" = interpret payload bytes as pixel intensities. */
    def decodeIntensities(content: Array[Byte]): Array[Double] =
      content.map(b => (b & 0xff) / 255.0)

    /** stub: sample every `stride`-th byte as a "frame". */
    def sampleFrames(content: Array[Byte], stride: Int): Array[Array[Byte]] =
      content.grouped(math.max(stride, 1)).map(g => Array(g.head)).toArray

    /** stub: "resize" = truncate/pad the payload to w*h bytes. */
    def resize(content: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val out = new Array[Byte](w * h)
      System.arraycopy(content, 0, out, 0, math.min(content.length, out.length))
      out
    }

    def sha256(content: Array[Byte]): String =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(content).map("%02x".format(_)).mkString
  }

  /** Decode + feature-extract: partition-local, no shuffle, blobs dropped
    * from the output row. The real version would call the codec inside
    * the same mapPartitions shape (one codec init per partition, not per
    * row — the reason this is mapPartitions and not map). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init would go here (expensive handle reuse)
      rows.map { m =>
        val px = StubCodec.decodeIntensities(m.content)
        MediaFeatures(
          media_id = m.media_id,
          kind = m.kind,
          size_bytes = m.content.length.toLong,
          sha = StubCodec.sha256(m.content),
          mean_intensity = if (px.isEmpty) 0.0 else px.sum / px.length,
          n_frames = StubCodec.sampleFrames(m.content, 1024).length)
      }
    }
  }

  /** Resize stage: payload-to-payload, partition-local. */
  def resizeAll(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(m =>
      m.copy(content = StubCodec.resize(m.content, w, h), width = w, height = h)))
  }

  /** REAL pure-JVM image header codec — no native libraries, so it runs
    * in any executor as-is. Parses (format, width, height) from the
    * leading bytes of PNG (IHDR chunk, big-endian), GIF87a/89a (logical
    * screen descriptor, little-endian), and JPEG (marker-segment scan to
    * the first start-of-frame). This replaces the stubbed decode step
    * for the dimension-extraction path; full pixel decode stays behind
    * `StubCodec` (no image libs in this environment). */
  object ImageCodec {
    /** (format, width, height) if the payload starts with a recognized
      * image header; None for unknown/truncated/corrupt bytes. */
    def dimensions(b: Array[Byte]): Option[(String, Int, Int)] = {
      def u8(i: Int) = b(i) & 0xff
      def be32(i: Int) = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
      def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
      def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
      if (b.length >= 24 && u8(0) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
          b(3) == 'G' && u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a &&
          u8(7) == 0x0a && b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
        Some(("png", be32(16), be32(20)))
      else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
          b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
        Some(("gif", le16(6), le16(8)))
      else if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
        // walk the marker segments to the first SOFn (C0-CF minus the
        // non-frame C4/C8/CC); dimensions sit at +4 (height), +6 (width)
        // past the marker code. Two legal-JPEG subtleties (ITU T.81
        // §B.1.1.2): (a) any number of extra 0xFF FILL bytes may pad
        // before a marker code — skip them all, don't reject; (b) EOI
        // (0xD9) and SOS (0xDA) carry no frame header after them that
        // this scan may read — EOI has NO length field at all (reading
        // one grabs garbage) and past SOS lies entropy-coded data, so
        // both terminate the walk with "no SOF found".
        var i = 2
        var out: Option[(String, Int, Int)] = None
        var ok = true
        while (ok && out.isEmpty && i + 1 < b.length) {
          if (u8(i) != 0xff) ok = false
          else {
            var j = i + 1
            while (j < b.length && u8(j) == 0xff) j += 1 // consecutive 0xFF = fill
            if (j >= b.length) ok = false
            else {
              val marker = u8(j)
              if (marker == 0x00) ok = false // stuffed byte: not legal before SOS
              else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8)) i = j + 1
              else if (marker == 0xd9 || marker == 0xda) ok = false // EOI / SOS
              else if (j + 2 >= b.length) ok = false
              else {
                val len = be16(j + 1)
                if (len < 2) ok = false
                else if (marker >= 0xc0 && marker <= 0xcf &&
                    marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
                  if (j + 8 < b.length) out = Some(("jpeg", be16(j + 6), be16(j + 4)))
                  else ok = false // truncated SOF
                } else i = j + 1 + len
              }
            }
          }
        }
        out
      } else None
    }
  }

  /** Parsed header row — fixed-width, shuffle-friendly. */
  case class MediaHeader(media_id: Long, format: String, width: Int, height: Int)

  /** Header parse over a (media_id, content: binary) frame: the same
    * partition-local mapPartitions shape as `extractFeatures` (one codec
    * init per partition), with the REAL `ImageCodec` doing the byte
    * work. Unrecognized payloads map to ("unknown", -1, -1) instead of
    * failing the job — corrupt media is data, not an error. */
  def parseHeaders(media: DataFrame): Dataset[MediaHeader] = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition codec init would go here (expensive handle reuse)
        rows.map { case (id, bytes) =>
          val (f, w, h) = ImageCodec.dimensions(bytes).getOrElse(("unknown", -1, -1))
          MediaHeader(id, f, w, h)
        }
      }
  }

  /** Deterministic VALID image payloads from `documents` (the sandbox
    * ships no binary fixtures): every row gets a structurally-correct
    * PNG, GIF89a, or JPEG(JFIF+SOF0) header blob whose dimensions are
    * arithmetic in (doc_id, n_chars) — so the DuckDB oracle can predict
    * exactly what the REAL parser must extract from the bytes. Payload
    * construction is pure codegen'd expressions (hex/unhex/concat). */
  def synthHeaders(docs: DataFrame): DataFrame = {
    val w = (col("doc_id") % 1024 + 16).cast("int")
    val h = (col("n_chars") % 768 + 16).cast("int")
    val w32 = lpad(hex(w), 8, "0"); val h32 = lpad(hex(h), 8, "0")
    val w16 = lpad(hex(w), 4, "0"); val h16 = lpad(hex(h), 4, "0")
    def le(hx: Column): Column = concat(substring(hx, 3, 2), substring(hx, 1, 2))
    val png = unhex(concat(lit("89504E470D0A1A0A0000000D49484452"),
      w32, h32, lit("0806000000")))
    val gif = unhex(concat(lit("474946383961"), le(w16), le(h16), lit("F70000")))
    val jpg = unhex(concat(
      lit("FFD8FFE000104A46494600010100000100010000FFC0001108"),
      h16, w16, lit("03012200021101031101")))
    docs.select(col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, png)
        .when(col("doc_id") % 3 === 1, gif)
        .otherwise(jpg).as("content"))
  }

  /** Build a synthetic media table from `documents` (the sandbox has no
    * binary fixtures): payload = UTF-8 bytes of the text. Deterministic,
    * so feature extraction is oracle-checkable end-to-end. */
  def fromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
      encode(col("text"), "UTF-8").as("content"),
      lit("application/octet-stream").as("mime"),
      lit(64).as("width"), lit(64).as("height"),
      (col("n_chars") * 10).as("duration_ms"))
      .as[MediaRow]
  }
}
