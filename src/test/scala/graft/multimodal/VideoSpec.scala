package graft.multimodal

import graft.SparkSpec
import Media.JpegCodec
import Video.AviCodec

/** MJPEG-in-AVI: container round-trip, chunk-walk robustness against
  * hostile/truncated payloads, stride sampling, and the closed-form
  * block-constant fixture the q183 oracle relies on. */
class VideoSpec extends SparkSpec {
  import spark.implicits._

  private def frame(w: Int, h: Int, base: Int): Array[Byte] =
    JpegCodec.encodeGrayBaseline(w, h, (x, y) => base + 3 * (x / 8) + 5 * (y / 8))

  test("AVI round-trip: geometry, declared frames, payloads byte-identical") {
    val frames = (0 until 4).map(f => frame(16, 8, 10 + 7 * f))
    val avi = AviCodec.encodeMjpeg(16, 8, fps = 10, frames)
    val c = AviCodec.parse(avi).getOrElse(fail("container did not parse"))
    assert((c.width, c.height) === (16, 8))
    assert(c.declaredFrames === 4)
    assert(c.framePayloads.length === 4)
    frames.zip(c.framePayloads).foreach { case (in, out) =>
      assert(in.toSeq === out.toSeq, "movi chunk payload differs from input")
    }
  }

  test("odd-sized frame chunks get the RIFF pad byte and still walk cleanly") {
    // force an odd JPEG byte length by trying bases until one is odd
    val odd = (0 until 64).map(b => frame(8, 8, b)).find(_.length % 2 == 1)
      .getOrElse(fail("no odd-length JPEG among 64 bases — fixture assumption broke"))
    val avi = AviCodec.encodeMjpeg(8, 8, 10, Seq(odd, odd, odd))
    assert(avi.length % 2 === 0)
    val c = AviCodec.parse(avi).getOrElse(fail("padded container did not parse"))
    assert(c.framePayloads.length === 3)
    assert(c.framePayloads.forall(_.toSeq == odd.toSeq))
  }

  test("decoded frames are bit-exact for block-constant MJPEG (q89 technique)") {
    val frames = (0 until 3).map(f => frame(32, 16, 20 + 7 * f))
    val c = AviCodec.parse(AviCodec.encodeMjpeg(32, 16, 10, frames)).get
    val all = AviCodec.sampleDecodedFrames(c, stride = 1)
    assert(all.length === 3)
    all.zipWithIndex.foreach { case (p, f) =>
      assert((p.width, p.height) === (32, 16))
      for (y <- 0 until 16; x <- 0 until 32)
        assert((p.pixels(y * 32 + x) & 0xff) === 20 + 7 * f + 3 * (x / 8) + 5 * (y / 8),
          s"frame $f pixel ($x,$y)")
    }
    // stride 2 keeps frames 0 and 2
    val sampled = AviCodec.sampleDecodedFrames(c, stride = 2)
    assert(sampled.length === 2)
    assert((sampled(0).pixels(0) & 0xff) === 20)
    assert((sampled(1).pixels(0) & 0xff) === 20 + 14)
  }

  test("hostile payloads: non-RIFF, truncated, lying sizes all parse to None or stop clean") {
    assert(AviCodec.parse("not a movie".getBytes("UTF-8")) === None)
    assert(AviCodec.parse(Array.emptyByteArray) === None)
    // RIFF but not AVI
    val wav = Media.WavCodec.encodePcm16(8000, Array[Short](1, 2, 3))
    assert(AviCodec.parse(wav) === None)
    val good = AviCodec.encodeMjpeg(8, 8, 10, Seq(frame(8, 8, 5)))
    // every truncation either fails or yields a consistent partial walk
    for (cut <- 0 until good.length by 7) {
      AviCodec.parse(good.take(cut)) match {
        case Some(c) => assert(c.framePayloads.length <= 1)
        case None => ()
      }
    }
    // a movi chunk lying about its size (overrunning the buffer)
    val lying = good.clone()
    val moviAt = { // find '00dc' fourcc
      val s = lying.indexOfSlice("00dc".getBytes("US-ASCII")); assert(s > 0); s
    }
    lying(moviAt + 4) = 0xff.toByte; lying(moviAt + 5) = 0xff.toByte
    lying(moviAt + 6) = 0xff.toByte; lying(moviAt + 7) = 0x7f.toByte
    AviCodec.parse(lying) match { // stops clean, no frames collected past the lie
      case Some(c) => assert(c.framePayloads.isEmpty)
      case None => ()
    }
  }

  test("frame-count cap bounds the walk on a hostile frame count") {
    val one = frame(8, 8, 1)
    val avi = AviCodec.encodeMjpeg(8, 8, 10, Vector.fill(50)(one))
    assert(AviCodec.parse(avi, maxFrames = 10).get.framePayloads.length === 10)
  }

  test("sampleAviFrames: Dataset op pools sampled intensities; junk rows -1") {
    val avi = AviCodec.encodeMjpeg(8, 8, 10,
      (0 until 4).map(f => frame(8, 8, 100 + 7 * f)))
    val rows = Video.sampleAviFrames(
      Seq((1L, avi), (2L, "junk".getBytes("UTF-8"))).toDF("media_id", "content"),
      stride = 2).collect().sortBy(_.media_id)
    assert(rows(0).n_frames === 4 && rows(0).n_sampled === 2)
    // frames 0 and 2: means 100 and 114 → pooled 107
    assert(math.abs(rows(0).mean_intensity - 107.0 / 255.0) < 1e-9)
    assert(rows(1).n_frames === -1 && rows(1).mean_intensity === -1.0)
  }

  test("extractFeatures: AVI payloads get the REAL frame walk, not the stub") {
    val avi = AviCodec.encodeMjpeg(8, 8, 10,
      (0 until 5).map(f => frame(8, 8, 10 + 7 * f)))
    val row = Media.MediaRow(9L, "video", avi, "video/x-msvideo", 8, 8, 500L)
    val f = Media.extractFeatures(Seq(row).toDS()).collect().head
    assert(f.n_frames === 5)
    // pooled mean over all 5 frames: base 10 + 7f → mean 10 + 14 = 24
    assert(math.abs(f.mean_intensity - 24.0 / 255.0) < 1e-9)
  }

  test("shot stats: repeated frames collapse to shots, delta is exact") {
    // frames with bases 10,10,17,17,24 → 3 shots, distinct 3, deltas
    // over 4 consecutive pairs: 0,7,0,7 → mean 3.5
    val frames = Seq(10, 10, 17, 17, 24).map(frame(8, 8, _))
    val avi = AviCodec.encodeMjpeg(8, 8, 10, frames)
    val r = Video.shotStats(Seq((1L, avi)).toDF("media_id", "content"))
      .collect().head
    assert(r.n_frames === 5 && r.n_distinct === 3 && r.n_shots === 3)
    assert(math.abs(r.mean_frame_delta - 3.5) < 1e-9)
    // a single-frame video: 1 shot, no pairs, delta 0
    val one = Video.shotStats(Seq((2L, AviCodec.encodeMjpeg(8, 8, 10,
      Seq(frame(8, 8, 5))))).toDF("media_id", "content")).collect().head
    assert(one.n_frames === 1 && one.n_shots === 1 && one.mean_frame_delta === 0.0)
  }

  test("video dedup: identical content groups, any pixel change splits") {
    val a = AviCodec.encodeMjpeg(8, 8, 10, Seq(frame(8, 8, 1), frame(8, 8, 8)))
    val b = AviCodec.encodeMjpeg(8, 8, 10, Seq(frame(8, 8, 1), frame(8, 8, 8)))
    val c = AviCodec.encodeMjpeg(8, 8, 10, Seq(frame(8, 8, 1), frame(8, 8, 9)))
    assert(Video.videoFingerprint(a) === Video.videoFingerprint(b))
    assert(Video.videoFingerprint(a) !== Video.videoFingerprint(c))
    val hist = Video.videoDupGroups(
      Seq((1L, a), (2L, b), (3L, c)).toDF("media_id", "content"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(hist.toSeq === Seq((1, 1L, 1L), (2, 1L, 2L)))
  }

  test("q186 fixture: g ≡ g' (mod 64) is exactly video identity") {
    val ids = Seq(0L, 1L, 2L, 192L, 3L, 67L) // g: 0,0,0,192,3,66
    val fps = Video.synthGroupAvis(ids.toDF("doc_id"))
      .as[(Long, Array[Byte])].collect().toMap
      .view.mapValues(b => Video.videoFingerprint(b).get).toMap
    assert(fps(0L) === fps(1L) && fps(1L) === fps(2L), "triple shares g")
    assert(fps(0L) === fps(192L), "g=192 ≡ 0 (mod 64) collides by design")
    assert(fps(0L) !== fps(3L), "g=3 differs")
    assert(fps(3L) !== fps(67L), "g=66 vs 3: different class")
  }

  test("q183 fixture closed form holds for a hand-checked doc_id") {
    val d = 7L // bw=4, bh=2, a=7, nf=1+2=... d%4+2 = 5? 7%4=3 → nf=5
    val avis = Video.synthMjpegAvis(Seq(d).toDF("doc_id"))
    val r = Video.sampleAviFrames(avis, stride = 2).collect().head
    val (bw, bh, a, nf) = (4L, 2L, 7L, 5L)
    val ks = (nf + 1) / 2
    assert(r.width === 32 && r.height === 16)
    assert(r.n_frames === nf && r.n_sampled === ks)
    val expected = (64 * ks * (bw * bh * a + 3 * bh * (bw * (bw - 1) / 2)
      + 5 * bw * (bh * (bh - 1) / 2)) + 64 * bw * bh * 7 * ks * (ks - 1)
      ).toDouble / (ks * 64 * bw * bh * 255.0)
    assert(math.abs(r.mean_intensity - expected) < 1e-12)
  }

  test("q188 fixture: decoded keyframe phash is the closed-form bit pattern") {
    val ids = Seq(40L, 41L, 42L, 43L) // one group: g=40, m=0..3
    val phs = Video.keyframePhashes(Video.synthKeyframeAvis(ids.toDF("doc_id")))
      .collect().map(p => p.media_id -> p.phash).toMap
    def expectBits(d: Long): String = {
      val g = d - d % 4; val m = (d % 4).toInt
      (0 until 64).map { b =>
        val bx = b % 8; val by = b / 8
        val hi = (((3 * bx + 5 * by + (g % 97)) % 7 < 3) != (b < m))
        if (hi) '1' else '0'
      }.mkString
    }
    ids.foreach { d =>
      assert(phs(d) === expectBits(d), s"doc $d phash diverged from closed form")
    }
    // prefix-flip geometry: members sit Hamming |m1-m2| apart
    def ham(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    assert(ham(phs(40L), phs(43L)) === 3)
    assert(ham(phs(41L), phs(42L)) === 1)
  }

  test("keyframePhashes: unparsable and frame-less payloads map to sentinel") {
    val junk = Seq(
      (1L, "not an avi".getBytes("US-ASCII")),
      (2L, AviCodec.encodeMjpeg(8, 8, 10, Seq.empty)) // valid container, 0 frames
    ).toDF("media_id", "content")
    val out = Video.keyframePhashes(junk).collect().map(p => p.media_id -> p).toMap
    assert(out(1L).phash === "" && out(1L).n_above === -1)
    assert(out(2L).phash === "" && out(2L).n_above === -1)
  }
}
