package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: dot product of two numeric vectors in one
  * tight generated loop — the codegen'd replacement for the
  * `aggregate(zip_with(x, y, (p, q) -> p * q), 0.0D, (acc, v) -> acc + v)`
  * higher-order-function fold (ops.Similarity.dot and the PQ/SQ paths).
  *
  * Value parity with the HOF form it replaces, verified element by
  * element (ExpressionSpec):
  *  - accumulation is LEFT-TO-RIGHT in double, identical IEEE order to
  *    `aggregate`'s fold, so results are bit-identical;
  *  - float elements widen to double before the multiply (the HOF form
  *    wrote `CAST(p AS DOUBLE) * q` — the float side promotes);
  *  - either input NULL → NULL (BinaryExpression null intolerance);
  *  - length mismatch → NULL (zip_with pads the short side with NULLs,
  *    the product goes NULL, and the sum absorbs it to NULL);
  *  - any NULL element → NULL (same absorption);
  *  - two empty arrays → 0.0 (the fold's zero).
  *
  * Why an Expression and not the HOF: HigherOrderFunction lambdas are
  * interpreted per element with boxing — at N·m codebook probes per
  * vector the fold was the hot path's dominant CPU (measured ~1.8 s per
  * PQ assignment pipeline at sf0.1); this loop runs inside whole-stage
  * codegen. Preference order per SURVEY §4: built-in > native Expression
  * with doGenCode > UDF.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isNumArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def isFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isNumArray(left.dataType) && isNumArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"dot_product expects two array<float|double> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val xf = isFloat(left.dataType)
    val yf = isFloat(right.dataType)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xi * yi
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val getX =
        if (isFloat(left.dataType)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY =
        if (isFloat(right.dataType)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      // same guards as nullSafeEval: ragged or null-element input → null
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ($getX) * ($getY);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $acc;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column API; requires a session built with [[GraftExtensions]]. */
  def dot_product(a: Column, b: Column): Column =
    call_function("dot_product", a, b)
}
