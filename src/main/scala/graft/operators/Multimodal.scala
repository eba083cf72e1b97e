package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}
import graft.multimodal.{Archive, Media, Video}

/** Driver-contract surface for the multimodal plumbing (SURVEY.md §2.6).
  * The media table is derived deterministically from `documents`
  * (payload = UTF-8 bytes), so the typed mapPartitions decode/feature
  * pipeline is end-to-end oracle-checkable: DuckDB recomputes the same
  * features straight from the text.
  *
  * Oracle parity contract: the corpus is ASCII and non-empty (true for
  * the fixtures) — the oracle's per-code-point `ascii()` equals the
  * stub's per-byte intensity only for single-byte characters, and
  * DuckDB's `list_avg` of an empty list is NULL where the stub emits
  * 0.0. A real codec replaces the whole comparison anyway. */
object Multimodal {

  /** DuckDB CTE chain ending in `ph(doc_id, phash, n_above)` — the
    * relational recomputation of the 8×8 aHash grid over the closed-form
    * gradient fixture (pixel = a + x + y). Shared verbatim by q122 and
    * q139 so the two oracles can never drift. */
  private val phashSqlCtes: String =
    """m AS (SELECT doc_id, CAST((doc_id % 16 + 2) * 2 AS BIGINT) AS w,
      |    CAST((doc_id % 8 + 2) * 2 AS BIGINT) AS h,
      |    doc_id % 64 AS a FROM documents),
      |px AS (SELECT doc_id, w, h, (i % w) AS x, (i // w) AS y,
      |    a + (i % w) + (i // w) AS v
      |  FROM m, unnest(range(w * h)) t(i)),
      |bs AS (SELECT doc_id, ((y * 8) // h) * 8 + ((x * 8) // w) AS b,
      |    sum(v) AS sv, count(*) AS c
      |  FROM px GROUP BY 1, 2),
      |tot AS (SELECT doc_id, sum(sv) AS ts, sum(c) AS tc FROM bs GROUP BY 1),
      |bits AS (SELECT g.doc_id, g.b,
      |    CASE WHEN bs.sv IS NOT NULL AND bs.sv * t2.tc > t2.ts * bs.c
      |         THEN 1 ELSE 0 END AS bit
      |  FROM (SELECT doc_id, i AS b FROM tot, unnest(range(64)) t(i)) g
      |  LEFT JOIN bs ON bs.doc_id = g.doc_id AND bs.b = g.b
      |  JOIN tot t2 ON t2.doc_id = g.doc_id),
      |ph AS (SELECT doc_id, string_agg(CAST(bit AS VARCHAR), '' ORDER BY b) AS phash,
      |    sum(bit) AS n_above
      |  FROM bits GROUP BY 1)""".stripMargin

  /** q28's normalized-text key, shared with the text leg of q190 so the
    * two oracles can never drift. */
  private val dedupNormSql: String = Dedup.normSql

  val defs: Seq[Q] = Seq(
    Q("q42_multimodal_features",
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS size_bytes,
        |  sha256(text) AS sha,
        |  round(list_avg(list_transform(range(1, length(text)+1),
        |    i -> ascii(substr(text, i, 1)))) / 255, 9) AS mean_intensity,
        |  CAST((octet_length(encode(text)) + 1023) // 1024 AS INT) AS n_frames
        |FROM documents
        |ORDER BY media_id""".stripMargin) { (s, dir) =>
      val media = Media.fromDocuments(Tables.load(s, dir, "documents"))
      Media.extractFeatures(media).toDF()
        .withColumn("mean_intensity", round(col("mean_intensity"), 9))
        .orderBy("media_id")
    },

    // q77: REAL image header decode. Every document row becomes a
    // structurally-valid PNG / GIF89a / JPEG(SOF0) header blob whose
    // dimensions are arithmetic in (doc_id, n_chars); the Spark side
    // must recover format/width/height by actually PARSING those bytes
    // (Media.ImageCodec inside the mapPartitions codec shape), while
    // the oracle predicts the same values from the arithmetic alone —
    // any parser bug (endianness, offset, marker walk) hash-mismatches.
    Q("q77_media_header_parse",
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'png'
        |       WHEN doc_id % 3 = 1 THEN 'gif' ELSE 'jpeg' END AS format,
        |  CAST(doc_id % 1024 + 16 AS INT) AS width,
        |  CAST(n_chars % 768 + 16 AS INT) AS height
        |FROM documents
        |ORDER BY media_id""".stripMargin) { (s, dir) =>
      val blobs = Media.synthHeaders(Tables.load(s, dir, "documents"))
      Media.parseHeaders(blobs).toDF().orderBy("media_id")
    },

    // q85: REAL full PNG pixel decode. Every document row becomes a
    // complete valid greyscale PNG — stored-deflate IDAT with correct
    // zlib adler32 and chunk CRCs, scanlines forward-filtered through
    // all four non-trivial filters — whose pixel values are arithmetic
    // in doc_id (pixel(x,y) = doc_id%200 + y). The Spark side must
    // actually inflate and unfilter the bytes (Media.PngCodec inside
    // the partition-local codec shape); the oracle predicts the decoded
    // mean intensity in closed form with the SAME integer-sum / double-
    // division arithmetic, so any inflate/unfilter/indexing bug
    // hash-mismatches. sum(pixels) = w·(h·a + h·(h-1)/2), exact.
    Q("q85_png_pixel_decode",
      """SELECT doc_id AS media_id,
        |  CAST(doc_id % 32 + 4 AS INT) AS width,
        |  CAST(doc_id % 16 + 4 AS INT) AS height,
        |  round(CAST((doc_id % 32 + 4) * ((doc_id % 16 + 4) * (doc_id % 200)
        |      + (doc_id % 16 + 4) * (doc_id % 16 + 3) / 2) AS DOUBLE)
        |    / ((doc_id % 32 + 4) * (doc_id % 16 + 4) * 255.0), 6) AS mean_intensity
        |FROM documents
        |ORDER BY media_id""".stripMargin) { (s, dir) =>
      val pngs = Media.synthPngs(Tables.load(s, dir, "documents"))
      Media.decodePngs(pngs).toDF()
        .withColumn("mean_intensity", round(col("mean_intensity"), 6))
        .orderBy("media_id")
    },

    // q88: REAL full GIF pixel decode. Every document row becomes a
    // complete valid GIF89a — 256-entry gray-ramp palette, image data
    // REAL-LZW-compressed (variable code width, dictionary growth) —
    // whose pixel indices are arithmetic in doc_id (pixel(x,y) =
    // doc_id%64 + x + y, gray-ramp palette makes index == intensity).
    // The Spark side must actually run the LZW decoder and palette
    // mapping (Media.GifCodec inside the partition-local codec shape);
    // the oracle predicts the decoded mean intensity in closed form:
    // sum(pixels) = w·h·a + h·w(w-1)/2 + w·h(h-1)/2, exact integers.
    Q("q88_gif_pixel_decode",
      """SELECT doc_id AS media_id,
        |  CAST(doc_id % 32 + 4 AS INT) AS width,
        |  CAST(doc_id % 16 + 4 AS INT) AS height,
        |  round(CAST((doc_id % 32 + 4) * (doc_id % 16 + 4) * (doc_id % 64)
        |      + (doc_id % 16 + 4) * ((doc_id % 32 + 4) * (doc_id % 32 + 3) / 2)
        |      + (doc_id % 32 + 4) * ((doc_id % 16 + 4) * (doc_id % 16 + 3) / 2) AS DOUBLE)
        |    / ((doc_id % 32 + 4) * (doc_id % 16 + 4) * 255.0), 6) AS mean_intensity
        |FROM documents
        |ORDER BY media_id""".stripMargin) { (s, dir) =>
      val gifs = Media.synthGifs(Tables.load(s, dir, "documents"))
      Media.decodeGifs(gifs).toDF()
        .withColumn("mean_intensity", round(col("mean_intensity"), 6))
        .orderBy("media_id")
    },

    // q89: REAL baseline JPEG pixel decode. Every document row becomes
    // a complete valid grayscale JPEG through the encoder's FULL lossy
    // pipeline (FDCT → quantize → zigzag → canonical Huffman → byte
    // stuffing); the Spark side must run the full inverse (Huffman
    // decode from the file's DHT, DC prediction, EXTEND, dequantize,
    // IDCT). The fixtures are block-constant images — the one input
    // class where the lossy pipeline is bit-exact (AC = 0 exactly,
    // DC a multiple of 8) — so the oracle predicts the decoded mean in
    // closed form: sum = 64·(W·H·a + 3H·W(W-1)/2 + 5W·H(H-1)/2) over
    // W×H blocks with block pixel a+3bx+5by. The noisy/cropped paths
    // are round-trip property-tested (±2 quantization bound) instead.
    Q("q89_jpeg_pixel_decode",
      """WITH m AS (SELECT doc_id, (doc_id % 4 + 1) AS bw, (doc_id % 2 + 1) AS bh,
        |                  (doc_id % 128) AS a FROM documents)
        |SELECT doc_id AS media_id,
        |  CAST(bw * 8 AS INT) AS width,
        |  CAST(bh * 8 AS INT) AS height,
        |  round(CAST(64 * (bw * bh * a + 3 * bh * (bw * (bw - 1) / 2)
        |      + 5 * bw * (bh * (bh - 1) / 2)) AS DOUBLE)
        |    / (64 * bw * bh * 255.0), 6) AS mean_intensity
        |FROM m ORDER BY media_id""".stripMargin) { (s, dir) =>
      val jpegs = Media.synthJpegs(Tables.load(s, dir, "documents"))
      Media.decodeJpegs(jpegs).toDF()
        .withColumn("mean_intensity", round(col("mean_intensity"), 6))
        .orderBy("media_id")
    },

    // q96: REAL COLOR (3-component 4:2:0 YCbCr) baseline JPEG decode —
    // the web-dominant layout. Every document row becomes a complete
    // valid color JPEG (interleaved [4×Y Cb Cr] MCUs, separate
    // luma/chroma quant + Huffman tables, per-component DC prediction)
    // through the encoder's full lossy pipeline; the Spark side must
    // run the full inverse — interleaved-MCU entropy decode, per-plane
    // dequantize+IDCT, chroma upsample, YCbCr→RGB with round-then-clamp
    // per channel. Fixtures are block-constant in every plane (the
    // bit-exact input class, ALSO upsampling-kernel-independent), so
    // the oracle predicts the per-channel means in closed form over the
    // 8×8 luma block grid, mirroring the JFIF conversion and the
    // sum/(n·255) mean arithmetic exactly (floor(x+0.5) = JVM
    // Math.round; sum over blocks ×64 = sum over pixels).
    Q("q96_jpeg_color_decode",
      """WITH m AS (SELECT doc_id, CAST(doc_id % 2 + 1 AS INT) * 2 AS bw,
        |                  doc_id % 128 AS a,
        |                  doc_id % 96 + 80 AS cb, (doc_id * 7) % 96 + 80 AS cr
        |           FROM documents),
        |g AS (SELECT m.*, bx.range AS bx, by.range AS by
        |      FROM m, range(0, 4) bx, range(0, 2) by
        |      WHERE bx.range < m.bw),
        |px AS (SELECT doc_id, bw,
        |  LEAST(255, GREATEST(0, CAST(floor(a + 3*bx + 5*by
        |    + 1.402 * (cr - 128) + 0.5) AS INT))) AS r,
        |  LEAST(255, GREATEST(0, CAST(floor(a + 3*bx + 5*by
        |    - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5) AS INT))) AS g,
        |  LEAST(255, GREATEST(0, CAST(floor(a + 3*bx + 5*by
        |    + 1.772 * (cb - 128) + 0.5) AS INT))) AS b
        |  FROM g)
        |SELECT doc_id AS media_id,
        |  CAST(bw * 8 AS INT) AS width, CAST(16 AS INT) AS height,
        |  round(CAST(64 * sum(r) AS DOUBLE) / (bw * 8 * 16 * 255.0), 6) AS mean_r,
        |  round(CAST(64 * sum(g) AS DOUBLE) / (bw * 8 * 16 * 255.0), 6) AS mean_g,
        |  round(CAST(64 * sum(b) AS DOUBLE) / (bw * 8 * 16 * 255.0), 6) AS mean_b
        |FROM px GROUP BY doc_id, bw ORDER BY media_id""".stripMargin) { (s, dir) =>
      val jpegs = Media.synthColorJpegs(Tables.load(s, dir, "documents"))
      Media.decodeColorJpegs(jpegs).toDF()
        .withColumn("mean_r", round(col("mean_r"), 6))
        .withColumn("mean_g", round(col("mean_g"), 6))
        .withColumn("mean_b", round(col("mean_b"), 6))
        .orderBy("media_id")
    },

    // q116: FRAME SAMPLING over animated GIFs — the multimodal mandate's
    // frame-sample op on the one multi-frame format decodable pure-JVM.
    // Every document row becomes a real animated GIF89a (doc_id%4+2
    // full-canvas frames, graphic-control extensions between them, real
    // LZW per frame); the engine decodes ALL frames partition-locally,
    // keeps every 2nd, and reports the pooled sampled-frame intensity.
    // Frame f's pixels are a + 7f + x + y, so the sampled pool's sum is
    // closed-form: k·(w·h·a + h·w(w-1)/2 + w·h(h-1)/2) + 7·w·h·k·(k-1)
    // with k = ceil(F/2) sampled frames — exact integers on both sides.
    Q("q116_gif_frame_sample",
      """WITH m AS (SELECT doc_id,
        |    CAST(doc_id % 32 + 4 AS BIGINT) AS w,
        |    CAST(doc_id % 16 + 4 AS BIGINT) AS h,
        |    doc_id % 64 AS a,
        |    CAST(doc_id % 4 + 2 AS BIGINT) AS f FROM documents),
        |k AS (SELECT *, (f + 1) // 2 AS ks FROM m)
        |SELECT doc_id AS media_id,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(f AS INT) AS n_frames, CAST(ks AS INT) AS n_sampled,
        |  round(CAST(ks * (w * h * a + h * (w * (w - 1) // 2)
        |      + w * (h * (h - 1) // 2)) + 7 * w * h * ks * (ks - 1)
        |    AS DOUBLE) / (ks * w * h * 255.0), 6) AS mean_intensity
        |FROM k ORDER BY media_id""".stripMargin) { (s, dir) =>
      val gifs = Media.synthAnimatedGifs(Tables.load(s, dir, "documents"))
      Media.sampleGifFrames(gifs, stride = 2).toDF()
        .withColumn("mean_intensity", round(col("mean_intensity"), 6))
        .orderBy("media_id")
    },

    // q117: REAL AUDIO feature extraction — the multimodal mandate's
    // audio leg with an actual codec instead of the byte-sampling stub.
    // Every document row becomes a complete valid RIFF/WAVE file (mono
    // PCM16 @ 8 kHz, an integer sawtooth); the engine parses the chunk
    // structure, decodes the PCM samples, and extracts duration / peak /
    // RMS / zero-crossings partition-locally. The fixture waveform is
    // pure integer arithmetic, so the oracle REGENERATES the identical
    // samples with a range() and aggregates them — sample-exact
    // verification of the whole decode path, with RMS the only double
    // (sqrt of an exact integer ratio, rounded on both sides).
    Q("q117_wav_features",
      """WITH m AS (SELECT doc_id,
        |    CAST(doc_id % 1000 + 500 AS BIGINT) AS n,
        |    CAST(doc_id % 50 + 10 AS BIGINT) AS p,
        |    CAST((doc_id % 8 + 1) * 1000 AS BIGINT) AS a FROM documents),
        |s AS (SELECT doc_id, n, i,
        |    ((i % p) * 2 * a) // p - a AS v
        |  FROM m, unnest(range(n)) t(i)),
        |sc AS (SELECT doc_id, n, v,
        |    lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
        |  FROM s)
        |SELECT doc_id AS media_id,
        |  CAST(max(n) AS INT) AS n_samples,
        |  CAST(max(n) * 1000 // 8000 AS BIGINT) AS duration_ms,
        |  CAST(max(abs(v)) AS INT) AS peak,
        |  round(sqrt(CAST(sum(v * v) AS DOUBLE) / max(n)), 4) AS rms,
        |  CAST(sum(CASE WHEN pv IS NOT NULL AND pv * v < 0
        |                THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
        |FROM sc GROUP BY doc_id ORDER BY media_id""".stripMargin) { (s, dir) =>
      val wavs = Media.synthWavs(Tables.load(s, dir, "documents"))
      Media.wavFeatures(wavs).toDF()
        .withColumn("rms", round(col("rms"), 4))
        .orderBy("media_id")
    },

    // q118: REAL image RESIZE — the last multimodal-mandate op (decode /
    // feature-extract / frame-sample / RESIZE). Even-dimension GIF
    // fixtures decode (real LZW) and box-downsample 2×: each output
    // pixel is the exact integer mean of its 2×2 block. With pixels
    // a+x+y every block mean is exactly a+2bx+2by+1 (no floor loss), so
    // the resized image is itself closed-form and the oracle predicts
    // its mean: sum = w'h'(a+1) + h'w'(w'−1) + w'h'(h'−1) over the
    // w'×h' output. A wrong block offset, a row-stride bug, or a
    // rounding difference in the resampler shifts the mean and fails
    // the hash.
    Q("q118_image_resize",
      """WITH m AS (SELECT doc_id,
        |    CAST((doc_id % 16 + 2) * 2 AS BIGINT) AS w,
        |    CAST((doc_id % 8 + 2) * 2 AS BIGINT) AS h,
        |    doc_id % 64 AS a FROM documents),
        |r AS (SELECT doc_id, w, h, a, w // 2 AS ow, h // 2 AS oh FROM m)
        |SELECT doc_id AS media_id,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(ow AS INT) AS out_width, CAST(oh AS INT) AS out_height,
        |  round(CAST(ow * oh * (a + 1) + oh * (ow * (ow - 1))
        |      + ow * (oh * (oh - 1)) AS DOUBLE)
        |    / (ow * oh * 255.0), 6) AS mean_intensity
        |FROM r ORDER BY media_id""".stripMargin) { (s, dir) =>
      val gifs = Media.synthEvenGifs(Tables.load(s, dir, "documents"))
      Media.resizeGifs(gifs, k = 2).toDF()
        .withColumn("mean_intensity", round(col("mean_intensity"), 6))
        .orderBy("media_id")
    },

    // q119: AUDIO SILENCE SEGMENTATION (VAD-lite) — the signal-level op
    // an audio-corpus pipeline runs before transcription: cut the PCM
    // into full 160-sample frames, exact integer energy per frame,
    // classify zero-energy frames as silence, and report counts plus
    // the LONGEST consecutive silent run (the gaps-and-islands part the
    // oracle does relationally). Fixtures alternate sawtooth bursts
    // with silences of (doc_id%4+1)·200 samples — silent runs reach 4-5
    // frames — and frames straddle burst edges: only frames fully
    // inside a silent stretch are zero-energy, so a frame-offset bug or
    // an off-by-one in the run logic fails the hash.
    Q("q119_audio_silence",
      """WITH m AS (SELECT doc_id,
        |    CAST(doc_id % 1000 + 500 AS BIGINT) AS n,
        |    CAST(doc_id % 50 + 10 AS BIGINT) AS p,
        |    CAST((doc_id % 8 + 1) * 1000 AS BIGINT) AS a,
        |    CAST((doc_id % 4 + 1) * 200 AS BIGINT) AS st FROM documents),
        |s AS (SELECT doc_id, i // 160 AS fr,
        |    CASE WHEN (i // st) % 2 = 1 THEN 0
        |         ELSE ((i % p) * 2 * a) // p - a END AS v
        |  FROM m, unnest(range(160 * (n // 160))) t(i)),
        |fe AS (SELECT doc_id, fr, CAST(sum(v * v) AS BIGINT) AS e
        |  FROM s GROUP BY 1, 2),
        |runs AS (SELECT doc_id, count(*) AS run_len FROM (
        |    SELECT doc_id, fr,
        |      fr - row_number() OVER (PARTITION BY doc_id ORDER BY fr) AS grp
        |    FROM fe WHERE e = 0)
        |  GROUP BY doc_id, grp)
        |SELECT f.doc_id AS media_id,
        |  CAST(count(*) AS INT) AS n_frames,
        |  CAST(sum(CASE WHEN f.e = 0 THEN 1 ELSE 0 END) AS INT) AS n_silent,
        |  CAST(coalesce(max(r.longest), 0) AS INT) AS longest_silent_run,
        |  CAST(sum(f.e) AS BIGINT) AS total_energy
        |FROM fe f LEFT JOIN (
        |  SELECT doc_id, max(run_len) AS longest FROM runs GROUP BY 1) r
        |  ON r.doc_id = f.doc_id
        |GROUP BY f.doc_id ORDER BY media_id""".stripMargin) { (s, dir) =>
      val wavs = Media.synthBurstWavs(Tables.load(s, dir, "documents"))
      Media.vadFeatures(wavs).toDF().orderBy("media_id")
    },

    // q122: IMAGE NEAR-DUP DETECTION via perceptual average-hash — the
    // standard first pass of an image-corpus dedup pipeline (decode →
    // fixed 8×8-grid aHash → group identical fingerprints). The Spark
    // side hashes REAL decoded GIF pixels in a map-only per-image
    // kernel (Media.perceptualHashes — integer-exact threshold, no
    // float bits) and then groups on the 64-char hash; the oracle
    // recomputes the same grid relationally from the closed-form
    // gradient fixture (pixel = a + x + y). Grouping on the hash keeps
    // the plan a single hash groupBy at any corpus size — no pairwise
    // comparisons ever materialize.
    Q("q122_image_phash_dedup",
      s"""WITH $phashSqlCtes
        |SELECT phash, CAST(count(*) AS BIGINT) AS n_images,
        |  min(doc_id) AS canonical_id, CAST(min(n_above) AS INT) AS n_above
        |FROM ph GROUP BY 1 ORDER BY phash""".stripMargin) { (s, dir) =>
      val gifs = Media.synthEvenGifs(Tables.load(s, dir, "documents"))
      Media.perceptualHashes(gifs).toDF()
        .groupBy("phash")
        .agg(count(lit(1)).as("n_images"),
          min(col("media_id")).as("canonical_id"),
          min(col("n_above")).cast("int").as("n_above"))
        .orderBy("phash")
    },

    // q139: NEAR-duplicate images — banded Hamming over DISTINCT
    // perceptual hashes. q122 groups EXACT fingerprint matches; real
    // image near-dups (recompressions, slight crops) land a few bits
    // apart, so this is the SimHash pigeonhole (q31/q44) on the image
    // modality — applied at the FINGERPRINT level, the shape that
    // survives scale: group docs by phash first (q122's agg), band-join
    // only the DISTINCT fingerprints (4 bands of 16 bits), and compute
    // each surviving pair's Hamming ONCE. Doc-level banding pays the
    // 64-step verify per doc-pair and goes quadratic in duplicate-class
    // sizes (measured: one 40M-pair task at sf0.1 under the first
    // formulation); fingerprint-level work is quadratic only in
    // DISTINCT images per band bucket. Pigeonhole guarantees a clean
    // shared band for Hamming ≤ 3; 4-6 errors may spread across all
    // four bands — the standard pHash recall trade, and the oracle
    // applies the SAME banding, so the gate compares identical
    // semantics. Output is group-level: both canonical ids, the
    // distance, and the doc-pair count the near-dup relation implies.
    Q("q139_image_phash_neardup",
      s"""WITH $phashSqlCtes,
        |grp AS (SELECT phash, min(doc_id) AS canonical_id,
        |    CAST(count(*) AS BIGINT) AS n FROM ph GROUP BY 1),
        |bnd AS (SELECT phash, b,
        |    substr(phash, CAST(b * 16 + 1 AS INT), 16) AS bv
        |  FROM grp, unnest(range(4)) t(b)),
        |cp AS (SELECT DISTINCT a.phash AS p1, c.phash AS p2
        |  FROM bnd a JOIN bnd c ON a.b = c.b AND a.bv = c.bv
        |    AND a.phash < c.phash),
        |hm AS (SELECT p1, p2, len(list_filter(range(1, 65),
        |    i -> substr(p1, CAST(i AS INT), 1) <> substr(p2, CAST(i AS INT), 1)))
        |    AS hamming FROM cp)
        |SELECT g1.canonical_id AS canonical1, g2.canonical_id AS canonical2,
        |  CAST(hm.hamming AS INT) AS hamming, g1.n * g2.n AS n_cross_pairs
        |FROM hm JOIN grp g1 ON g1.phash = hm.p1
        |        JOIN grp g2 ON g2.phash = hm.p2
        |WHERE hm.hamming BETWEEN 1 AND 6
        |ORDER BY canonical1, canonical2""".stripMargin) { (s, dir) =>
      val gifs = Media.synthEvenGifs(Tables.load(s, dir, "documents"))
      val grp = Media.perceptualHashes(gifs).toDF()
        .groupBy("phash")
        .agg(min(col("media_id")).as("canonical_id"), count(lit(1)).as("n"))
        .localCheckpoint(true) // decode once; bands + both join-backs read it
      val bnd = grp
        .select(col("phash"), explode(sequence(lit(0), lit(3))).as("b"))
        .withColumn("bv", expr("substring(phash, b * 16 + 1, 16)"))
      val cp = bnd.as("a").join(bnd.as("c"),
          col("a.b") === col("c.b") && col("a.bv") === col("c.bv") &&
            col("a.phash") < col("c.phash"))
        .select(col("a.phash").as("p1"), col("c.phash").as("p2"))
        .distinct()
        // pin the pair set BEFORE the interpreted hamming fold — without
        // this Catalyst pushes the fold into the band-join condition and
        // evaluates it once per RAW band match instead of once per pair
        .localCheckpoint(true)
      cp.withColumn("hamming", expr(
          "size(filter(sequence(1, 64), " +
            "i -> substring(p1, i, 1) != substring(p2, i, 1)))"))
        .filter(col("hamming").between(1, 6))
        .join(grp.select(col("phash").as("p1"),
          col("canonical_id").as("canonical1"), col("n").as("n1")), "p1")
        .join(grp.select(col("phash").as("p2"),
          col("canonical_id").as("canonical2"), col("n").as("n2")), "p2")
        .select(col("canonical1"), col("canonical2"),
          col("hamming").cast("int").as("hamming"),
          (col("n1") * col("n2")).as("n_cross_pairs"))
        .orderBy("canonical1", "canonical2")
    },

    // q183: REAL VIDEO FRAME SAMPLING — MJPEG-in-AVI, pure JVM. Every
    // document row becomes a complete valid AVI container (RIFF LIST
    // hdrl/avih/strl + LIST movi with one '00dc' MJPEG chunk per frame
    // + idx1), each frame a real baseline JPEG through the full lossy
    // encoder. The engine walks the chunk tree by size (the q117 WAV
    // RIFF technique), decodes every 2nd frame through the full
    // Huffman+IDCT inverse (the q89 decoder), and reports the pooled
    // sampled-frame intensity. Frame f's 8×8 block (bx,by) is constant
    // at a+3bx+5by+7f — block-constant frames survive the lossy JPEG
    // pipeline bit-exactly, so the oracle is closed-form: per sampled
    // frame 64·(bw·bh·a + 3bh·Σbx + 5bw·Σby) plus 64·bw·bh·7f pooled
    // over sampled f ∈ {0,2,…} (Σf = ks(ks−1) for ks sampled frames).
    Q("q183_avi_frame_sample",
      """WITH m AS (SELECT doc_id, (doc_id % 4 + 1) AS bw, (doc_id % 2 + 1) AS bh,
        |    (doc_id % 64) AS a, CAST(doc_id % 4 + 2 AS BIGINT) AS f FROM documents),
        |k AS (SELECT *, (f + 1) // 2 AS ks FROM m)
        |SELECT doc_id AS media_id,
        |  CAST(bw * 8 AS INT) AS width,
        |  CAST(bh * 8 AS INT) AS height,
        |  CAST(f AS INT) AS n_frames,
        |  CAST(ks AS INT) AS n_sampled,
        |  round(CAST(64 * ks * (bw * bh * a + 3 * bh * (bw * (bw - 1) // 2)
        |      + 5 * bw * (bh * (bh - 1) // 2))
        |      + 64 * bw * bh * 7 * ks * (ks - 1)
        |    AS DOUBLE) / (ks * 64 * bw * bh * 255.0), 6) AS mean_intensity
        |FROM k ORDER BY media_id""".stripMargin) { (s, dir) =>
      val avis = Video.synthMjpegAvis(Tables.load(s, dir, "documents"))
      Video.sampleAviFrames(avis, stride = 2).toDF()
        .withColumn("mean_intensity", round(col("mean_intensity"), 6))
        .orderBy("media_id")
    },

    // q185: VIDEO SHOT STATISTICS — within-video frame dedup + change
    // detection, the report a video curation pipeline keys sampling
    // decisions on. Fixtures repeat frames in PAIRS (frame f's base is
    // a + 7·(f/2)), so the engine must prove — through the full
    // container walk + JPEG decode — that it can tell bit-identical
    // frames from changed ones: distinct = shots = ceil(nf/2), and the
    // mean per-pixel |delta| across consecutive pairs is exactly
    // 7·(shots−1)/(nf−1) because every boundary shifts EVERY pixel by
    // 7 and every within-shot pair by 0.
    Q("q185_video_shot_stats",
      """WITH m AS (SELECT doc_id, CAST(doc_id % 4 + 2 AS BIGINT) AS f
        |           FROM documents),
        |k AS (SELECT *, (f + 1) // 2 AS shots FROM m)
        |SELECT doc_id AS media_id,
        |  CAST(f AS INT) AS n_frames,
        |  CAST(shots AS INT) AS n_distinct,
        |  CAST(shots AS INT) AS n_shots,
        |  round(7.0 * (shots - 1) / (f - 1), 6) AS mean_frame_delta
        |FROM k ORDER BY media_id""".stripMargin) { (s, dir) =>
      val avis = Video.synthShotAvis(Tables.load(s, dir, "documents"))
      Video.shotStats(avis).toDF()
        .withColumn("mean_frame_delta", round(col("mean_frame_delta"), 6))
        .orderBy("media_id")
    },

    // q186: EXACT VIDEO DEDUP — the q28 exact-dedup shape on the video
    // modality: decode every frame, fingerprint the ordered frame
    // content, ONE hash groupBy on the 16-byte fingerprint (never
    // pairwise), reported as a dup-group-size histogram. The fixture
    // derives every video parameter from g = doc_id − doc_id%3, so
    // videos are bit-identical exactly when g ≡ g' (mod 64) — the
    // oracle counts those congruence classes while the engine has to
    // EARN the same histogram through the codec path.
    Q("q186_video_exact_dedup",
      """WITH v AS (SELECT ((doc_id - doc_id % 3) % 64) AS cls
        |           FROM documents),
        |g AS (SELECT cls, count(*) AS sz FROM v GROUP BY cls)
        |SELECT CAST(sz AS INT) AS group_size,
        |  CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(sz * count(*) AS BIGINT) AS n_videos
        |FROM g GROUP BY sz ORDER BY group_size""".stripMargin) { (s, dir) =>
      val avis = Video.synthGroupAvis(Tables.load(s, dir, "documents"))
      Video.videoDupGroups(avis)
    },

    // q188: VIDEO NEAR-DUP via keyframe perceptual hash — the q139
    // banded-Hamming shape on the video modality, completing the
    // exact(q186)/shot(q185)/near-dup ladder video now shares with
    // text and images. The engine EARNS each fingerprint through the
    // real container walk + baseline-JPEG decode of frame 0 + the
    // shared integer aHash; fixtures cluster in groups of 4 whose
    // keyframes differ by 1-3 flipped 8×8 blocks (closed-form bit
    // pattern — see Video.synthKeyframeAvis), so the oracle predicts
    // every hash bit relationally and both sides band identically.
    Q("q188_video_phash_neardup",
      s"""WITH m AS (SELECT doc_id, (doc_id - doc_id % 4) AS g,
        |           (doc_id % 4) AS mm FROM documents),
        |bits AS (SELECT doc_id, b,
        |    CASE WHEN (((b % 8) * 3 + (b // 8) * 5 + g % 97) % 7 < 3)
        |              <> (b < mm) THEN 1 ELSE 0 END AS bit
        |  FROM m, unnest(range(64)) t(b)),
        |ph AS (SELECT doc_id,
        |    string_agg(CAST(bit AS VARCHAR), '' ORDER BY b) AS phash
        |  FROM bits GROUP BY 1),
        |${bandSqlTail(64, 4, 6)}""".stripMargin) { (s, dir) =>
      val avis = Video.synthKeyframeAvis(Tables.load(s, dir, "documents"))
      val grp = Video.keyframePhashes(avis).toDF()
        .groupBy("phash")
        .agg(min(col("media_id")).as("canonical_id"), count(lit(1)).as("n"))
        .localCheckpoint(true) // decode once; bands + both join-backs read it
      bandedHammingPairs(grp, nBits = 64, nBands = 4, maxHam = 6)
    },

    // q189: AUDIO NEAR-DUP via acoustic fingerprint — the same banded
    // Hamming pass on the audio modality: REAL WAV decode → 160-sample
    // frame energies (integer-exact) → energy-delta-sign bit string →
    // band join on DISTINCT fingerprints. Fixtures walk a stepped
    // amplitude whose up/down sequence IS the closed-form 32-bit
    // fingerprint (see Media.synthSteppedWavs), group members sitting
    // Hamming 1-3 apart; 4 bands of 8 bits pigeonhole-guarantee recall
    // at Hamming ≤ 3 — the same trade as the image leg, applied by
    // both engines.
    Q("q189_audio_fingerprint_neardup",
      s"""WITH m AS (SELECT doc_id, (doc_id - doc_id % 4) AS g,
        |           (doc_id % 4) AS mm FROM documents),
        |bits AS (SELECT doc_id, f,
        |    CASE WHEN ((3 * f + g % 89) % 7 < 3) <> (f < mm)
        |         THEN 1 ELSE 0 END AS bit
        |  FROM m, unnest(range(32)) t(f)),
        |ph AS (SELECT doc_id,
        |    string_agg(CAST(bit AS VARCHAR), '' ORDER BY f) AS phash
        |  FROM bits GROUP BY 1),
        |${bandSqlTail(32, 4, 4)}""".stripMargin) { (s, dir) =>
      val wavs = Media.synthSteppedWavs(Tables.load(s, dir, "documents"))
      val grp = Media.audioFingerprints(wavs).toDF()
        .withColumnRenamed("afp", "phash")
        .groupBy("phash")
        .agg(min(col("media_id")).as("canonical_id"), count(lit(1)).as("n"))
        .localCheckpoint(true) // decode once; bands + both join-backs read it
      bandedHammingPairs(grp, nBits = 32, nBands = 4, maxHam = 4)
    },

    // q190: CROSS-MODAL DEDUP CAPSTONE — one report tying the exact-
    // fingerprint dedup ladder together across every modality the
    // engine owns: text (q28's normalized-text md5), image (q122's
    // aHash over real GIF decode), audio (q189's energy-delta
    // fingerprint over real WAV decode), video (q186's whole-video
    // content fingerprint over the ordered decoded frames). Each leg is
    // a map-only fingerprint + ONE hash groupBy — the identical plan
    // shape at any corpus size — unioned into per-modality dup-rate
    // rows, the first dashboard a multimodal corpus curation run
    // reads. The oracle recomputes each leg's GROUP STRUCTURE in
    // closed form (fingerprint VALUES differ for video/image — group
    // identity is what the fixtures pin, per the q186/q122 invariants).
    Q("q190_multimodal_dedup_report",
      s"""WITH tfp AS (SELECT 'text' AS modality, md5($dedupNormSql) AS fp
        |             FROM documents),
        |$phashSqlCtes,
        |ifp AS (SELECT 'image' AS modality, phash AS fp FROM ph),
        |am AS (SELECT doc_id, (doc_id - doc_id % 4) AS g,
        |       (doc_id % 4) AS mm FROM documents),
        |abits AS (SELECT doc_id, f,
        |    CASE WHEN ((3 * f + g % 89) % 7 < 3) <> (f < mm)
        |         THEN 1 ELSE 0 END AS bit
        |  FROM am, unnest(range(32)) t(f)),
        |afp AS (SELECT 'audio' AS modality,
        |    string_agg(CAST(bit AS VARCHAR), '' ORDER BY f) AS fp
        |  FROM abits GROUP BY doc_id),
        |vfp AS (SELECT 'video' AS modality,
        |    CAST((doc_id - doc_id % 3) % 64 AS VARCHAR) AS fp
        |  FROM documents),
        |u AS (SELECT * FROM tfp UNION ALL SELECT * FROM ifp
        |      UNION ALL SELECT * FROM afp UNION ALL SELECT * FROM vfp),
        |grps AS (SELECT modality, fp, count(*) AS sz FROM u GROUP BY 1, 2)
        |SELECT modality,
        |  CAST(sum(sz) AS BIGINT) AS n_items,
        |  CAST(coalesce(sum(CASE WHEN sz >= 2 THEN sz END), 0) AS BIGINT)
        |    AS n_dup_items,
        |  CAST(coalesce(sum(CASE WHEN sz >= 2 THEN 1 END), 0) AS BIGINT)
        |    AS n_dup_groups,
        |  round(CAST(coalesce(sum(CASE WHEN sz >= 2 THEN sz END), 0) AS DOUBLE)
        |    / sum(sz), 6) AS dup_frac
        |FROM grps GROUP BY modality ORDER BY modality""".stripMargin) { (s, dir) =>
      import s.implicits._
      val d = Tables.load(s, dir, "documents")
      def report(modality: String,
                 fps: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
        fps.groupBy("fp").agg(count(lit(1)).as("sz"))
          .agg(sum(col("sz")).as("n_items"),
            coalesce(sum(when(col("sz") >= 2, col("sz"))), lit(0L))
              .as("n_dup_items"),
            coalesce(sum(when(col("sz") >= 2, 1L)), lit(0L))
              .as("n_dup_groups"))
          .select(lit(modality).as("modality"), col("n_items"),
            col("n_dup_items"), col("n_dup_groups"),
            round(col("n_dup_items").cast("double") / col("n_items"), 6)
              .as("dup_frac"))
      val text = report("text",
        d.select(md5(Dedup.norm(col("text"))).as("fp")))
      val image = report("image",
        Media.perceptualHashes(Media.synthEvenGifs(d)).toDF()
          .select(col("phash").as("fp")))
      val audio = report("audio",
        Media.audioFingerprints(Media.synthSteppedWavs(d)).toDF()
          .select(col("afp").as("fp")))
      val video = report("video",
        Video.synthGroupAvis(d)
          .select(col("media_id"), col("content")).as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (_, b) =>
            Video.videoFingerprint(b).getOrElse("unparsable")
          }).toDF("fp"))
      text.unionByName(image).unionByName(audio).unionByName(video)
        .orderBy("modality")
    },

    // q193: WARC-GZIP INGEST — the container format web-scale text
    // corpora actually arrive in (WARC/WET: one gzip MEMBER per record,
    // members concatenated, readers walk member boundaries). The engine
    // EARNS every row through a real RFC 1952 walk — header + optional
    // fields by their own framing, raw-deflate inflate, CRC32 + ISIZE
    // trailers VERIFIED — while the oracle predicts member count, total
    // uncompressed bytes and the concatenated-payload sha256 in closed
    // form from the fixture arithmetic (member j of doc d carries
    // `text:j`, ASCII). Partition-local mapPartitions like every codec
    // leg; containers never shuffle; inflate bounded against zip bombs.
    Q("q193_warc_gzip_ingest",
      """WITH m AS (SELECT doc_id, text, (doc_id % 3 + 1) AS nm FROM documents),
        |cat AS (SELECT doc_id,
        |    string_agg(text || ':' || j, '' ORDER BY j) AS payload
        |  FROM m, unnest(range(nm)) t(j) GROUP BY doc_id)
        |SELECT m.doc_id AS media_id, CAST(m.nm AS INT) AS n_members,
        |  CAST(m.nm * (octet_length(encode(m.text)) + 2) AS BIGINT)
        |    AS total_bytes,
        |  sha256(cat.payload) AS payload_sha
        |FROM m JOIN cat USING (doc_id)
        |ORDER BY media_id""".stripMargin) { (s, dir) =>
      val gzs = Archive.synthWarcGzs(Tables.load(s, dir, "documents"))
      Archive.ingestArchives(gzs).toDF().orderBy("media_id")
    },

    // q215: TAR INGEST — the other container corpora ship in (HF
    // datasets, ImageNet shards, WebDataset are all tarballs). The
    // engine EARNS every row through a real POSIX ustar walk — magic
    // verified, the HEADER CHECKSUM recomputed over the 512-byte block
    // with the chksum field blanked, octal size fields parsed, content
    // padding skipped, terminator blocks honored — while the oracle
    // predicts file count, total content bytes and the concatenated
    // name/payload sha256s in closed form from the fixture arithmetic
    // (file j of doc d is `doc<d>/part<j>.txt` carrying `text:j`).
    // Partition-local mapPartitions like every codec leg; containers
    // never shuffle; extraction bounded against tar bombs.
    Q("q215_tar_ingest",
      """WITH m AS (SELECT doc_id, text, (doc_id % 3 + 1) AS nm FROM documents),
        |cat AS (SELECT doc_id,
        |    string_agg('doc' || doc_id || '/part' || j || '.txt', ''
        |      ORDER BY j) AS names,
        |    string_agg(text || ':' || j, '' ORDER BY j) AS payload
        |  FROM m, unnest(range(nm)) t(j) GROUP BY doc_id)
        |SELECT m.doc_id AS media_id, CAST(m.nm AS INT) AS n_files,
        |  CAST(m.nm * (octet_length(encode(m.text)) + 2) AS BIGINT)
        |    AS total_bytes,
        |  sha256(cat.names) AS names_sha,
        |  sha256(cat.payload) AS payload_sha
        |FROM m JOIN cat USING (doc_id)
        |ORDER BY media_id""".stripMargin) { (s, dir) =>
      val tars = Archive.synthTars(Tables.load(s, dir, "documents"))
      Archive.ingestTars(tars).toDF().orderBy("media_id")
    }
  )

  /** Banded-Hamming near-dup pair report over DISTINCT fingerprints —
    * the q139 plan shape factored for reuse across modalities: band the
    * distinct hashes (`nBands` substrings of `nBits/nBands`), equi-join
    * per band, compute each surviving pair's Hamming ONCE, then join
    * canonical ids and cross-pair counts back. Quadratic only in
    * distinct fingerprints per band bucket — never in docs. Expects
    * `grp(phash, canonical_id, n)` already checkpointed by the caller
    * (the decode must not rerun per consumer). */
  private[graft] def bandedHammingPairs(grp: org.apache.spark.sql.DataFrame,
                                 nBits: Int, nBands: Int,
                                 maxHam: Int): org.apache.spark.sql.DataFrame = {
    val bw = nBits / nBands
    val bnd = grp
      .select(col("phash"), explode(sequence(lit(0), lit(nBands - 1))).as("b"))
      .withColumn("bv", expr(s"substring(phash, b * $bw + 1, $bw)"))
    val cp = bnd.as("a").join(bnd.as("c"),
        col("a.b") === col("c.b") && col("a.bv") === col("c.bv") &&
          col("a.phash") < col("c.phash"))
      .select(col("a.phash").as("p1"), col("c.phash").as("p2"))
      .distinct()
      // pin the pair set BEFORE the interpreted hamming fold (q139 note:
      // Catalyst would otherwise evaluate it once per RAW band match)
      .localCheckpoint(true)
    cp.withColumn("hamming", expr(
        s"size(filter(sequence(1, $nBits), " +
          "i -> substring(p1, i, 1) != substring(p2, i, 1)))"))
      .filter(col("hamming").between(1, maxHam))
      .join(grp.select(col("phash").as("p1"),
        col("canonical_id").as("canonical1"), col("n").as("n1")), "p1")
      .join(grp.select(col("phash").as("p2"),
        col("canonical_id").as("canonical2"), col("n").as("n2")), "p2")
      .select(col("canonical1"), col("canonical2"),
        col("hamming").cast("int").as("hamming"),
        (col("n1") * col("n2")).as("n_cross_pairs"))
      .orderBy("canonical1", "canonical2")
  }

  /** The oracle-side mirror of [[bandedHammingPairs]]: the shared CTE
    * tail from a `ph(doc_id, phash)` CTE to the final pair report, so
    * the two modalities' oracles cannot drift from each other (q122/
    * q139 keep their original verbatim-shared chain). */
  private def bandSqlTail(nBits: Int, nBands: Int, maxHam: Int): String = {
    val bw = nBits / nBands
    s"""grp AS (SELECT phash, min(doc_id) AS canonical_id,
       |    CAST(count(*) AS BIGINT) AS n FROM ph GROUP BY 1),
       |bnd AS (SELECT phash, b,
       |    substr(phash, CAST(b * $bw + 1 AS INT), $bw) AS bv
       |  FROM grp, unnest(range($nBands)) t(b)),
       |cp AS (SELECT DISTINCT a.phash AS p1, c.phash AS p2
       |  FROM bnd a JOIN bnd c ON a.b = c.b AND a.bv = c.bv
       |    AND a.phash < c.phash),
       |hm AS (SELECT p1, p2, len(list_filter(range(1, ${nBits + 1}),
       |    i -> substr(p1, CAST(i AS INT), 1) <> substr(p2, CAST(i AS INT), 1)))
       |    AS hamming FROM cp)
       |SELECT g1.canonical_id AS canonical1, g2.canonical_id AS canonical2,
       |  CAST(hm.hamming AS INT) AS hamming, g1.n * g2.n AS n_cross_pairs
       |FROM hm JOIN grp g1 ON g1.phash = hm.p1
       |        JOIN grp g2 ON g2.phash = hm.p2
       |WHERE hm.hamming BETWEEN 1 AND $maxHam
       |ORDER BY canonical1, canonical2""".stripMargin
  }
}
