package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** NfcNormalize: codegen path ≡ interpreted path ≡ java.text.Normalizer,
  * null propagation, and SQL registration via GraftExtensions. */
class NfcNormalizeSpec extends AnyFunSuite with SparkSpec {

  private val cases = Seq(
    "cafe\u0301",      // decomposed acute: NFC composes to U+00E9
    "caf\u00e9",       // already composed: unchanged
    "u\u0308ber",      // decomposed diaeresis
    "A\u030angstr\u00f6m", // decomposed ring -> U+00C5
    "\u212b",          // ANGSTROM SIGN: NFC maps to U+00C5
    "plain ascii stays",
    "")

  test("matches java.text.Normalizer on composed/decomposed/compat cases") {
    val s = spark
    import s.implicits._
    val got = cases.toDF("raw")
      .select(expr("nfc_normalize(raw)")).as[String].collect()
    val want = cases.map(c =>
      java.text.Normalizer.normalize(c, java.text.Normalizer.Form.NFC))
    assert(got.toSeq === want)
    // the decomposed rows genuinely shrank (the fixture carries signal)
    assert(want(0).length < cases(0).length)
    assert(want(4) === "\u00c5")
  }

  test("interpreted eval path matches codegen output") {
    val lit = org.apache.spark.sql.catalyst.expressions.Literal
    cases.foreach { c =>
      val out = NfcNormalize(lit(org.apache.spark.unsafe.types.UTF8String
        .fromString(c))).eval(null)
      assert(out.toString ===
        java.text.Normalizer.normalize(c, java.text.Normalizer.Form.NFC))
    }
  }

  test("null in, null out; non-string input rejected at analysis") {
    val s = spark
    import s.implicits._
    val r = Seq[Option[String]](None, Some("x")).toDF("raw")
      .select(expr("nfc_normalize(raw)")).as[Option[String]].collect()
    assert(r.toSeq === Seq(None, Some("x")))
    val err = intercept[Exception] {
      Seq(1).toDF("n").select(expr("nfc_normalize(n)")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("nfc_normalize"))
  }
}
