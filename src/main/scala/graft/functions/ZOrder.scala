package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: 2-D Morton (z-order) key — the low 16
  * bits of each coordinate bit-interleaved into a 32-bit value (as
  * long). Sorting / range-partitioning a table by this key co-locates
  * rows that are close in BOTH dimensions, so min/max row-group stats
  * prune 2-D predicates at scan time — the standard layout optimization
  * for a 100 TB fact table queried by two independent keys (DataBricks
  * OPTIMIZE ZORDER, Iceberg sort orders, etc. all compute exactly this).
  *
  * The interleave is the classic magic-number bit spread (4 shift-mask
  * rounds per coordinate, fully branch-free) rather than a 16-step loop,
  * and runs inside whole-stage codegen. The identical arithmetic is
  * expressible as plain int64 shift/mask SQL, which is what the DuckDB
  * oracle and the equality-twin test use — bit operations are exact in
  * both engines, so the query is fully hash-checkable.
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"zorder2 expects two bigint arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = ZOrder2.spread(a.asInstanceOf[Long] & 0xFFFFL)
    val y = ZOrder2.spread(b.asInstanceOf[Long] & 0xFFFFL)
    x | (y << 1)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("zx")
      val y = ctx.freshName("zy")
      def spread(v: String): String =
        s"""$v = ($v | ($v << 8)) & 0x00FF00FFL;
           |$v = ($v | ($v << 4)) & 0x0F0F0F0FL;
           |$v = ($v | ($v << 2)) & 0x33333333L;
           |$v = ($v | ($v << 1)) & 0x55555555L;""".stripMargin
      s"""
         |long $x = $a & 0xFFFFL;
         |long $y = $b & 0xFFFFL;
         |${spread(x)}
         |${spread(y)}
         |${ev.value} = $x | ($y << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {
  /** Spread the low 16 bits of v to even bit positions 0,2,…,30. */
  def spread(v0: Long): Long = {
    var v = v0
    v = (v | (v << 8)) & 0x00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0FL
    v = (v | (v << 2)) & 0x33333333L
    v = (v | (v << 1)) & 0x55555555L
    v
  }

  /** Column API; requires a session built with [[GraftExtensions]]. */
  def zorder2(a: Column, b: Column): Column = call_function("zorder2", a, b)

  /** The same spread as portable SQL over an int64 expression — used by
    * the DuckDB oracle and the Spark-arithmetic equality twin, so all
    * three formulations share one arithmetic definition. */
  def spreadSql(e: String): String = {
    // force the chain into int64 from the first operand: fed an INT32
    // column, the whole spread would otherwise stay 32-bit and the
    // final `<< 1` in zorderSql silently wraps negative for y ≥ 32768
    // while the native ZOrder2 returns the positive long (r12 review)
    val s0 = s"((CAST($e AS BIGINT)) & 65535)"
    val s1 = s"(($s0 | ($s0 << 8)) & 16711935)"      // 0x00FF00FF
    val s2 = s"(($s1 | ($s1 << 4)) & 252645135)"     // 0x0F0F0F0F
    val s3 = s"(($s2 | ($s2 << 2)) & 858993459)"     // 0x33333333
    s"(($s3 | ($s3 << 1)) & 1431655765)"             // 0x55555555
  }

  def zorderSql(x: String, y: String): String =
    s"(${spreadSql(x)} | (${spreadSql(y)} << 1))"
}
