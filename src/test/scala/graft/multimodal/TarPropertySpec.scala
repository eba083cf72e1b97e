package graft.multimodal

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import Archive.TarCodec

/** Property check for the ustar codec: encode→walk must round-trip ANY
  * file set (names ≤ 100 ASCII chars, arbitrary binary contents
  * straddling block boundaries), and single-byte corruption anywhere in
  * a header must be rejected by the checksum. Cases drawn with fixed
  * seeds (deterministic CI). */
class TarPropertySpec extends SparkSpec {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val genFile: Gen[(String, Array[Byte])] = for {
    nameLen <- Gen.choose(1, 60)
    name <- Gen.listOfN(nameLen, Gen.alphaNumChar).map(_.mkString)
    // sizes biased to 512-boundary neighborhoods where padding bugs live
    size <- Gen.oneOf(Gen.choose(0, 32), Gen.choose(500, 525),
      Gen.choose(1010, 1040))
    bytes <- Gen.listOfN(size, Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield (name, bytes.toArray)

  private val genArchive: Gen[List[(String, Array[Byte])]] = for {
    n <- Gen.choose(1, 6)
    fs <- Gen.listOfN(n, genFile)
  } yield fs

  test("encode→walk round-trips any file set (names, bytes, order)") {
    samples(genArchive, 40).foreach { fs =>
      val got = TarCodec.walk(TarCodec.encode(fs))
        .getOrElse(fail(s"did not walk: ${fs.map(_._1)}"))
      assert(got.length === fs.length)
      got.zip(fs).foreach { case (e, (name, bytes)) =>
        assert(e.name === name)
        assert(e.payload.toSeq === bytes.toSeq)
      }
    }
  }

  test("single-byte header corruption is rejected by the checksum") {
    val arch = TarCodec.encode(Seq(("steady.txt", Array.fill(700)('x'.toByte))))
    // every byte of the first header that participates in the checksum:
    // flip it and the walk must fail (untouched positions 148-155 are
    // the checksum field itself — flipping those breaks the compare too)
    val positions = samples(Gen.choose(0, 511), 40).distinct
    positions.foreach { pos =>
      val bad = arch.clone()
      bad(pos) = (bad(pos) ^ 0x01).toByte
      assert(TarCodec.walk(bad).isEmpty,
        s"flip at header byte $pos must fail the checksum or framing")
    }
  }
}
