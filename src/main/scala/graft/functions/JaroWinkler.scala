package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity as a native Catalyst expression.
  *
  * Record linkage's classic scorer (Winkler 1990, building on Jaro
  * 1989): the Jaro similarity — matches within a max(|a|,|b|)/2-1
  * window, transpositions counted over the match skeleton — boosted by
  * 0.1 * common-prefix-length (capped at 4) * (1 - jaro) when jaro
  * exceeds the 0.7 threshold. Spark ships levenshtein but nothing in
  * the Jaro family; a UDF would pay the serializer per candidate pair,
  * and linkage runs this on every blocked pair. This expression is one
  * static call inside whole-stage codegen.
  *
  * Semantics are pinned to the textbook definition, verified
  * empirically equal to DuckDB's `jaro_winkler_similarity` (the oracle
  * counterpart) on threshold, prefix-cap, transposition, and
  * zero-match edge cases — see q199's oracle gate.
  *
  * Registered as SQL function `jaro_winkler` by
  * [[graft.ext.GraftExtensions]].
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler requires (string, string), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.sim(
      a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler.sim($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[JaroWinkler].getName, null, "jaro_winkler",
    "_FUNC_(a, b) - Jaro-Winkler similarity in [0,1]", "")

  /** Textbook Jaro-Winkler; O(|a|*window) with two small bitset-free
    * boolean arrays — candidate pairs arrive pre-blocked, so strings
    * are short relative to the corpus. Static so codegen can call it
    * without an outer-class capture. */
  def sim(a: String, b: String): Double = {
    if (a == b) return if (a.isEmpty) 0.0 else 1.0
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var matches = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb, i + window + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!mb(j) && b.charAt(j) == a.charAt(i)) {
          ma(i) = true; mb(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val jaro = (m / la + m / lb + (m - t / 2) / m) / 3.0
    if (jaro > 0.7) {
      var p = 0
      val pmax = math.min(4, math.min(la, lb))
      while (p < pmax && a.charAt(p) == b.charAt(p)) p += 1
      jaro + 0.1 * p * (1.0 - jaro)
    } else jaro
  }
}
