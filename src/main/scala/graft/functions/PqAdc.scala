package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native asymmetric-distance-computation (ADC) lookup for product
  * quantization: given a vector's M subspace codes and a query's M×Ks
  * table of quantized subspace distances, returns
  * `Σ_m tables[m][codes[m]]` as one long.
  *
  * This is the hottest scalar of a PQ scan — executed once per
  * (query, corpus row). The higher-order formulation
  * (`aggregate(zip_with(codes, sequence(...), ...), ...)`) allocates a
  * lambda frame per element and stays interpreted; `doGenCode` here
  * emits a single fused int loop inside whole-stage codegen, which is
  * the difference between a memory-bound scan and a
  * lambda-dispatch-bound one at corpus scale (same preference order as
  * [[CosineSim]]: native Expression > HOF > UDF).
  *
  * Null/domain discipline: a null code, a null subtable, a null table
  * entry, or a code outside its subtable's range yields null (the
  * codes-vs-codebook contract is the caller's; null is the safe
  * surface for a violated one).
  *
  * Registered as SQL function `pq_adc` by [[graft.ext.GraftExtensions]].
  */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(LongType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "pq_adc requires (array<int> codes, array<array<bigint>> tables), " +
          s"got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc"
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val tables = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (tables.numElements() < m) return null
    var sum = 0L
    var i = 0
    while (i < m) {
      if (codes.isNullAt(i) || tables.isNullAt(i)) return null
      val c = codes.getInt(i)
      val sub = tables.getArray(i)
      if (c < 0 || c >= sub.numElements() || sub.isNullAt(c)) return null
      sum += sub.getLong(c)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, tables) => {
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val sub = ctx.freshName("sub")
      val sum = ctx.freshName("sum")
      val bad = ctx.freshName("bad")
      s"""
         |int $m = $codes.numElements();
         |long $sum = 0L;
         |boolean $bad = $tables.numElements() < $m;
         |if (!$bad) {
         |  for (int $i = 0; $i < $m; $i++) {
         |    if ($codes.isNullAt($i) || $tables.isNullAt($i)) { $bad = true; break; }
         |    int $c = $codes.getInt($i);
         |    org.apache.spark.sql.catalyst.util.ArrayData $sub = $tables.getArray($i);
         |    if ($c < 0 || $c >= $sub.numElements() || $sub.isNullAt($c)) { $bad = true; break; }
         |    $sum += $sub.getLong($c);
         |  }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

object PqAdc {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[PqAdc].getName, null, "pq_adc",
    "_FUNC_(codes, tables) - sum of tables[m][codes[m]] over m (PQ ADC distance)", "")
}
