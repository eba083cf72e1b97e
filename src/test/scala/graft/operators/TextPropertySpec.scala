package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.multimodal.Media

/** Property checks for the subtle per-row folds behind q80/q77: the
  * sorted-run `topWordCount` fold must equal a reference max-frequency
  * count on ANY word list, and the image header codec must round-trip
  * ANY dimensions through the same byte layouts q77 synthesizes. Cases
  * drawn with fixed seeds (deterministic CI). */
class TextPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("topWordCount equals the reference max word frequency on random lists") {
    val genWords: Gen[List[String]] = for {
      n <- Gen.choose(1, 120)
      ws <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "dd", "eee", "f g".trim))
    } yield ws
    val cases = samples(genWords, 60)
    val df = cases.zipWithIndex.map { case (ws, i) => (i.toLong, ws) }
      .toDF("id", "ws")
      .select(col("id"), Text.topWordCount(col("ws")).as("top"))
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cases.zipWithIndex.foreach { case (ws, i) =>
      val expect = ws.groupBy(identity).values.map(_.size).max.toLong
      assert(got(i.toLong) === expect, s"case $i: $ws")
    }
  }

  test("maxRunLength equals the reference longest-consecutive-run on random lists") {
    val genWords: Gen[List[String]] = for {
      n <- Gen.choose(1, 120)
      ws <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "dd"))
    } yield ws
    val cases = samples(genWords, 60)
    val df = cases.zipWithIndex.map { case (ws, i) => (i.toLong, ws) }
      .toDF("id", "ws")
      .select(col("id"), Text.maxRunLength(col("ws")).as("run"))
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cases.zipWithIndex.foreach { case (ws, i) =>
      // reference: fold the list counting consecutive equals
      val expect = ws.foldLeft(("", 0, 0)) { case ((prev, run, best), w) =>
        val r = if (w == prev) run + 1 else 1
        (w, r, math.max(best, r))
      }._3.toLong
      assert(got(i.toLong) === expect, s"case $i: $ws")
    }
  }

  test("q86 n-gram repetition metrics match a reference count on a crafted doc") {
    // 'x y x y x y': 5 2-grams, top "x y" appears 3 -> 0.6; 4 3-grams,
    // 2 distinct -> dup3 = 0.5; no consecutive repeats. 'a a a b':
    // stuck-key run of 3. The clean doc needs >= 23 2-grams for
    // top2 < 0.045 to be satisfiable, so it gets 30 distinct words.
    val clean = (1 to 30).map(i => s"w$i").mkString(" ")
    val d = Seq((1L, "x y x y x y"), (2L, "a a a b"), (3L, clean))
      .toDF("doc_id", "text")
    val outDir = java.nio.file.Files.createTempDirectory("q86").toString
    d.write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val rows = graft.SparkEntry.queries("q86_repetition_filter")(spark, outDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getLong(3), r.getInt(4)))).toMap
    assert(rows(1L) === ((0.6, 0.5, 1L, 0)), s"looping doc: ${rows(1L)}")
    assert(rows(2L)._3 === 3L, "stuck-key run of 3")
    assert(rows(2L)._4 === 0, "run of 3 fails the gate")
    assert(rows(3L) === ((0.034483, 0.0, 1L, 1)), s"clean doc keeps: ${rows(3L)}")
  }

  test("GifCodec round-trips random images through real LZW, all decoder paths") {
    // three regimes: tiny palettes (runs → KwKwK), full-range noise
    // (dictionary growth + width bumps), and a big structured image
    // (table-full → CLEAR mid-stream). Decode must invert encode
    // byte-exactly in each.
    val genCase: Gen[(Int, Int, Int)] = for {
      w <- Gen.choose(1, 40)
      h <- Gen.choose(1, 30)
      palette <- Gen.oneOf(2, 4, 256)
    } yield (w, h, palette)
    samples(genCase, 40).zipWithIndex.foreach { case ((w, h, pal), k) =>
      val rnd = new scala.util.Random(k)
      val px = Array.fill(w * h)((rnd.nextInt(pal) & 0xff).toByte)
      val gif = Media.GifCodec.encodeGray(w, h, (x, y) => px(y * w + x) & 0xff)
      val got = Media.GifCodec.decode(gif)
        .getOrElse(fail(s"case $k ($w x $h, palette $pal): decode failed"))
      assert(got.width === w && got.height === h)
      assert(got.pixels.toSeq === px.toSeq, s"case $k ($w x $h, palette $pal)")
    }
    // 300×200 noise: 60k pixels forces the 4096-entry table to fill and
    // the encoder to CLEAR mid-stream; decoder must resync
    val rnd = new scala.util.Random(99)
    val big = Array.fill(300 * 200)((rnd.nextInt(256) & 0xff).toByte)
    val gif = Media.GifCodec.encodeGray(300, 200, (x, y) => big(y * 300 + x) & 0xff)
    val got = Media.GifCodec.decode(gif).getOrElse(fail("big image: decode failed"))
    assert(got.pixels.toSeq === big.toSeq, "table-full CLEAR resync")
  }

  test("JpegCodec: block-constant images decode bit-exactly; noise within ±2") {
    // block-constant: the lossy pipeline is exact (AC identically 0, DC
    // an exact multiple of 8) — the q89 oracle's premise
    for (seed <- 0 until 10) {
      val rnd = new scala.util.Random(seed)
      val bw = rnd.nextInt(4) + 1; val bh = rnd.nextInt(3) + 1
      val w = bw * 8; val h = bh * 8
      val vals = Array.fill(bh, bw)(rnd.nextInt(256))
      val jpg = Media.JpegCodec.encodeGrayBaseline(w, h, (x, y) => vals(y / 8)(x / 8))
      val got = Media.JpegCodec.decode(jpg)
        .getOrElse(fail(s"seed $seed: decode failed"))
      assert(got.width === w && got.height === h)
      for (y <- 0 until h; x <- 0 until w)
        assert((got.pixels(y * w + x) & 0xff) === vals(y / 8)(x / 8),
          s"seed $seed pixel ($x,$y)")
    }
    // arbitrary noise + non-multiple-of-8 dims (cropped edge blocks):
    // the full AC path — Huffman run/size, ZRL, EOB, EXTEND, IDCT —
    // with only quantization rounding as the error budget
    for (seed <- 10 until 25) {
      val rnd = new scala.util.Random(seed)
      val w = rnd.nextInt(38) + 3; val h = rnd.nextInt(27) + 2
      val px = Array.fill(h, w)(rnd.nextInt(256))
      val jpg = Media.JpegCodec.encodeGrayBaseline(w, h, (x, y) => px(y)(x))
      val got = Media.JpegCodec.decode(jpg)
        .getOrElse(fail(s"seed $seed: decode failed ($w x $h)"))
      assert(got.width === w && got.height === h)
      var worst = 0
      for (y <- 0 until h; x <- 0 until w)
        worst = math.max(worst, math.abs((got.pixels(y * w + x) & 0xff) - px(y)(x)))
      assert(worst <= 2, s"seed $seed ($w x $h): worst pixel error $worst")
    }
  }

  test("PngCodec: Adam7-interlaced images deinterlace to the exact pixels") {
    // random images across dims from 1×1 (six of seven passes empty) to
    // larger-than-8 grids (every pass populated); the decoded image must
    // equal the source EXACTLY — any scatter/offset/filter bug shows as
    // a pixel mismatch, which the permutation-invariant q85 mean can't
    for (seed <- 0 until 20) {
      val rnd = new scala.util.Random(seed)
      val w = rnd.nextInt(36) + 1; val h = rnd.nextInt(24) + 1
      val px = Array.fill(h, w)(rnd.nextInt(256))
      val png = Media.PngCodec.encodeStoredGray(w, h, (x, y) => px(y)(x),
        interlaced = true)
      val got = Media.PngCodec.decode(png)
        .getOrElse(fail(s"seed $seed: interlaced decode failed ($w x $h)"))
      assert(got.width === w && got.height === h)
      for (y <- 0 until h; x <- 0 until w)
        assert((got.pixels(y * w + x) & 0xff) === px(y)(x),
          s"seed $seed pixel ($x,$y) of ${w}x$h")
      // and the interlaced bytes differ from the plain layout (i.e. the
      // encoder really wrote Adam7, not a pass-through)
      if (w > 1 && h > 1)
        assert(!png.sameElements(
          Media.PngCodec.encodeStoredGray(w, h, (x, y) => px(y)(x))))
    }
  }

  test("GifCodec: a local color table takes precedence and round-trips") {
    for (seed <- 0 until 10) {
      val rnd = new scala.util.Random(seed)
      val w = rnd.nextInt(30) + 2; val h = rnd.nextInt(20) + 2
      val px = Array.fill(h, w)(rnd.nextInt(256))
      val gif = Media.GifCodec.encodeGray(w, h, (x, y) => px(y)(x),
        localPalette = true)
      val got = Media.GifCodec.decode(gif)
        .getOrElse(fail(s"seed $seed: LCT decode failed"))
      assert(got.width === w && got.height === h)
      for (y <- 0 until h; x <- 0 until w)
        assert((got.pixels(y * w + x) & 0xff) === px(y)(x),
          s"seed $seed pixel ($x,$y)")
    }
  }

  test("JpegCodec color 4:2:0: block-constant planes decode bit-exactly") {
    def conv(yv: Int, cb: Int, cr: Int): (Int, Int, Int) = {
      def clamp(v: Long) = math.max(0L, math.min(255L, v)).toInt
      (clamp(math.round(yv + 1.402 * (cr - 128))),
        clamp(math.round(yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))),
        clamp(math.round(yv + 1.772 * (cb - 128))))
    }
    for (seed <- 0 until 10) {
      val rnd = new scala.util.Random(seed)
      val mw = rnd.nextInt(3) + 1; val mh = rnd.nextInt(2) + 1
      val w = mw * 16; val h = mh * 16
      val yVals = Array.fill(h / 8, w / 8)(rnd.nextInt(256))
      val cb = rnd.nextInt(256); val cr = rnd.nextInt(256)
      val jpg = Media.JpegCodec.encodeColor420Baseline(w, h,
        (x, y) => yVals(y / 8)(x / 8), cb, cr)
      val got = Media.JpegCodec.decodeColor(jpg)
        .getOrElse(fail(s"seed $seed: color decode failed"))
      assert(got.width === w && got.height === h)
      for (y <- 0 until h; x <- 0 until w) {
        val (er, eg, eb) = conv(yVals(y / 8)(x / 8), cb, cr)
        val i = y * w + x
        assert((got.r(i) & 0xff) === er, s"seed $seed R ($x,$y)")
        assert((got.g(i) & 0xff) === eg, s"seed $seed G ($x,$y)")
        assert((got.b(i) & 0xff) === eb, s"seed $seed B ($x,$y)")
      }
    }
    // noisy luma through the full interleaved AC path: quantization
    // rounding (±2 on Y) propagates through the conversion — small bound
    val rnd = new scala.util.Random(42)
    val w = 48; val h = 32
    val px = Array.fill(h, w)(rnd.nextInt(256))
    val jpg = Media.JpegCodec.encodeColor420Baseline(w, h, (x, y) => px(y)(x), 90, 160)
    val got = Media.JpegCodec.decodeColor(jpg).getOrElse(fail("noisy color decode"))
    var worst = 0
    for (y <- 0 until h; x <- 0 until w) {
      val (er, eg, eb) = conv(px(y)(x), 90, 160)
      val i = y * w + x
      worst = math.max(worst, math.abs((got.r(i) & 0xff) - er))
      worst = math.max(worst, math.abs((got.g(i) & 0xff) - eg))
      worst = math.max(worst, math.abs((got.b(i) & 0xff) - eb))
    }
    assert(worst <= 4, s"worst channel error $worst")
    // a grayscale file through the color API: R = G = B = Y
    val gray = Media.JpegCodec.encodeGrayBaseline(16, 8, (x, y) => (x * 16 + y * 8) % 256)
    val gc = Media.JpegCodec.decodeColor(gray).getOrElse(fail("gray via color API"))
    assert(gc.r.toSeq === gc.g.toSeq && gc.g.toSeq === gc.b.toSeq)
    assert(gc.r.toSeq === Media.JpegCodec.decode(gray).get.pixels.toSeq)
  }

  test("ImageCodec round-trips random dimensions through PNG/GIF/JPEG layouts") {
    def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def be16(v: Int) = Array((v >> 8).toByte, v.toByte)
    def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    val genDims = for {
      w <- Gen.choose(1, 65535)
      h <- Gen.choose(1, 65535)
    } yield (w, h)
    samples(genDims, 80).foreach { case (w, h) =>
      val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
        0, 0, 0, 0x0d, 'I', 'H', 'D', 'R') ++ be32(w) ++ be32(h) ++
        Array[Byte](8, 6, 0, 0, 0)
      assert(Media.ImageCodec.dimensions(png) === Some(("png", w, h)), s"png $w x $h")
      val gif = "GIF89a".getBytes("US-ASCII") ++ le16(w) ++ le16(h) ++
        Array[Byte](0xf7.toByte, 0, 0)
      assert(Media.ImageCodec.dimensions(gif) === Some(("gif", w, h)), s"gif $w x $h")
      val jpg = Array[Byte](0xff.toByte, 0xd8.toByte,
        0xff.toByte, 0xe0.toByte, 0x00, 0x10) ++ Array.fill[Byte](14)(0) ++
        Array[Byte](0xff.toByte, 0xc0.toByte, 0x00, 0x11, 0x08) ++
        be16(h) ++ be16(w) ++
        Array[Byte](3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
      assert(Media.ImageCodec.dimensions(jpg) === Some(("jpeg", w, h)), s"jpeg $w x $h")
    }
  }
}
