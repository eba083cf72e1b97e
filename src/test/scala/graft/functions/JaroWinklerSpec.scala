package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Pins the native jaro_winkler expression to the textbook definition
  * (and thereby to DuckDB's jaro_winkler_similarity — q199's oracle
  * hash-gates the parity end-to-end on real candidate pairs). */
class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double = JaroWinkler.sim(a, b)

  test("classic literature pairs (Winkler 1990 examples)") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
  }

  test("edges: equality, empties, zero matches, window exclusion") {
    assert(jw("abc", "abc") === 1.0)
    assert(jw("", "") === 0.0) // DuckDB convention: empty-empty is 0
    assert(jw("x", "") === 0.0)
    assert(jw("abcdef", "uvwxyz") === 0.0)
    // 'ab' vs 'ba': window = max(2,2)/2-1 = 0, so neither char can
    // match despite both being present
    assert(jw("ab", "ba") === 0.0)
  }

  test("odd transposition-mismatch count floors like DuckDB") {
    // 'abcdef' vs 'bcadef': match skeletons abcdef / bcadef differ at 3
    // positions (a 3-cycle) — an ODD mismatch count, so the t/2 term is
    // fractional under the floating-point variant some implementations
    // use (jaro would be 0.9166…). DuckDB floors it (t DIV 2 = 1 ⇒
    // jaro = (1 + 1 + 5/6)/3 = 0.9444…; probed directly against
    // duckdb's jaro_winkler_similarity — no common prefix, so no
    // Winkler boost muddies the value). This pins the floor semantics
    // the q199 oracle gate doesn't reach (its pairs are tail
    // truncations with t ≈ 0).
    assert(math.abs(jw("abcdef", "bcadef") - 0.9444444444444445) < 1e-12)
    // same 3-cycle behind a 1-char common prefix, so the floored t also
    // feeds the Winkler boost: DuckDB jaro_winkler_similarity(
    // 'pabcdef','pbcadef') = 0.9571428571428572 (floating t/2 would
    // give 0.9357…)
    assert(math.abs(jw("pabcdef", "pbcadef") - 0.9571428571428572) < 1e-12)
  }

  test("boost applies only above the 0.7 jaro threshold") {
    // jaro('abxxxxxx','abyyyyyy') = 0.5 with common prefix 2: no boost
    assert(jw("abxxxxxx", "abyyyyyy") === 0.5)
    // jaro('abcdxyz','abcdqrs') = 5/7 > 0.7, prefix 4: boosted
    assert(math.abs(jw("abcdxyz", "abcdqrs") - 0.8285714285714286) < 1e-12)
    // prefix contribution caps at 4 chars even when 7 match
    assert(math.abs(jw("prefix_same", "prefix_diff") - 0.8545454545454545) < 1e-12)
  }

  test("properties: symmetry, range, identity (seeded random pairs)") {
    val token: Gen[String] =
      Gen.chooseNum(0, 12).flatMap(n => Gen.stringOfN(n, Gen.alphaChar))
    val pairs = (0 until 300).flatMap { i =>
      for {
        a <- token(Gen.Parameters.default, Seed(i.toLong))
        b <- token(Gen.Parameters.default, Seed(1000L + i))
      } yield (a, b)
    }
    assert(pairs.size >= 250)
    pairs.foreach { case (a, b) =>
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0, s"range violated for ($a, $b)")
      assert(s === jw(b, a), s"asymmetric for ($a, $b)")
      if (a == b && a.nonEmpty) assert(s === 1.0)
    }
  }

  test("expression evaluates inside a query = static method") {
    import spark.implicits._
    val rows = Seq(("martha", "marhta"), ("small ring", "small rin"),
      ("", ""), ("ab", "ba")).toDF("a", "b")
      .selectExpr("a", "b", "jaro_winkler(a, b) AS s")
      .collect()
    rows.foreach(r =>
      assert(r.getDouble(2) === jw(r.getString(0), r.getString(1))))
  }
}
