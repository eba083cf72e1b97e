package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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
