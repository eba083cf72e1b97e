package graft.multimodal

import graft.SparkSpec
import Archive.TarCodec

/** POSIX ustar walk: round-trips, 512-byte padding, header-checksum
  * verification, truncation/corruption rejection, tar-bomb bound. */
class TarSpec extends SparkSpec {
  import spark.implicits._

  private def tar(files: Seq[(String, String)]): Array[Byte] =
    TarCodec.encode(files.map { case (n, c) => (n, c.getBytes("US-ASCII")) })

  test("multi-file round-trip: names and payloads back, in order") {
    val fs = Seq("a.txt" -> "first record", "dir/b.txt" -> "second",
      "c.bin" -> "", "d.txt" -> ("long content " * 100)) // > 1 block
    val got = TarCodec.walk(tar(fs)).getOrElse(fail("archive did not walk"))
    assert(got.map(e => e.name -> new String(e.payload, "US-ASCII")) ===
      fs.toVector)
  }

  test("content padding: sizes straddling the 512 boundary round-trip") {
    for (n <- Seq(0, 1, 511, 512, 513, 1024, 1025)) {
      val c = "y" * n
      val got = TarCodec.walk(tar(Seq("f" -> c, "tail" -> "z")))
        .getOrElse(fail(s"size $n did not walk"))
      assert(got.map(_.payload.length) === Vector(n, 1))
    }
  }

  test("corrupt checksum, bad magic, truncation, junk are all rejected") {
    val good = tar(Seq("a" -> "payload one", "b" -> "payload two"))
    val badCk = good.clone()
    badCk(149) = (badCk(149) ^ 0x01).toByte // checksum field of header 1
    assert(TarCodec.walk(badCk).isEmpty, "corrupt checksum must fail")
    val badName = good.clone()
    badName(0) = (badName(0) ^ 0x01).toByte // name participates in checksum
    assert(TarCodec.walk(badName).isEmpty, "name flip breaks the checksum")
    val badMagic = good.clone()
    badMagic(257) = 'X'.toByte
    assert(TarCodec.walk(badMagic).isEmpty, "bad magic must fail")
    assert(TarCodec.walk(good.take(700)).isEmpty, "truncated content")
    assert(TarCodec.walk(good.take(100)).isEmpty, "truncated header")
    assert(TarCodec.walk("not a tar archive".getBytes("US-ASCII")).isEmpty)
    assert(TarCodec.walk(Array.empty[Byte]).isEmpty)
  }

  test("tar-bomb guard: extraction past maxBytes refuses the archive") {
    val big = tar(Seq("big" -> ("x" * 100000)))
    assert(TarCodec.walk(big, maxBytes = 1000).isEmpty)
    assert(TarCodec.walk(big, maxBytes = 200000).isDefined)
  }

  test("q215 fixture: file count / bytes / shas match the closed form") {
    val docs = Seq((4L, "alpha beta"), (5L, "gamma")).toDF("doc_id", "text")
    val out = Archive.ingestTars(Archive.synthTars(docs))
      .collect().map(r => r.media_id -> r).toMap
    // doc 4: 2 files (4%3+1); doc 5: 3 files
    assert(out(4L).n_files === 2)
    assert(out(4L).total_bytes === 2L * ("alpha beta".length + 2))
    assert(out(5L).n_files === 3)
    def sha(s: String) = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      md.digest(s.getBytes("US-ASCII")).map("%02x".format(_)).mkString
    }
    assert(out(4L).names_sha === sha("doc4/part0.txtdoc4/part1.txt"))
    assert(out(4L).payload_sha === sha("alpha beta:0alpha beta:1"))
    assert(out(5L).payload_sha === sha("gamma:0gamma:1gamma:2"))
  }
}
