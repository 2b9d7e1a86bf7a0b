package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expression: q_markov_attribution's 12-round absorbing-chain
  * power iteration over ONE removal chain's transition edges, in a
  * compiled loop.
  *
  * Input: array<struct<cur: string, nxt: string, p12: bigint>> — the
  * chain's transition list with probabilities on the 1e-12 lattice.
  * Output: the probability mass on 'conv' after 12 steps from 'start'
  * (NULL when no mass ever reaches 'conv' — the join-semantics twin of
  * "no q12 row").
  *
  * Replaces (value-identically) 12 join+aggregate rounds over ≤180-row
  * frames — ~24 scheduler-bound tiny stages, ~1.3 s of the query at
  * sf0.1. A chained-Project map-fold formulation was tried first and
  * abandoned: each round referenced the previous round's map expression
  * three times, and the optimizer's project handling blew up on the
  * 12-level chain. This loop applies the IDENTICAL per-term lattice
  * arithmetic the joins performed — t = floor(p(cur) · (p12/1e12) ·
  * 1e12 + 0.5) summed per nxt as exact int64 (order-free), p′ = s12 /
  * 1e12, entries existing exactly where the join produced a row — so
  * the unchanged DuckDB oracle pins the equivalence.
  */
case class MarkovConvReach(child: Expression) extends UnaryExpression {

  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(StructType(fields), _) if fields.length == 3 =>
      fields(0).dataType == StringType && fields(1).dataType == StringType &&
        fields(2).dataType == LongType
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "markov_conv_reach expects array<struct<cur: string, nxt: string, p12: bigint>>, " +
        s"got ${child.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  /** NULL when 'conv' is unreached — so `eval` may return null even for
    * non-null input. */
  override def nullable: Boolean = true

  override def prettyName: String = "markov_conv_reach"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val cur = new Array[String](n)
    val nxt = new Array[String](n)
    val p12 = new Array[Long](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 3)
      cur(i) = row.getUTF8String(0).toString
      nxt(i) = row.getUTF8String(1).toString
      p12(i) = row.getLong(2)
      i += 1
    }
    var p: Map[String, Double] = Map("start" -> 1.0)
    var round = 0
    while (round < 12) {
      // int64 lattice sums per nxt, entries only where a join row existed
      val s12 = scala.collection.mutable.HashMap.empty[String, Long]
      var e = 0
      while (e < n) {
        p.get(cur(e)) match {
          case Some(pc) =>
            val t = math.floor(pc * (p12(e).toDouble / 1e12) * 1e12 + 0.5).toLong
            s12.update(nxt(e), s12.getOrElse(nxt(e), 0L) + t)
          case None => ()
        }
        e += 1
      }
      p = s12.iterator.map { case (k, v) => k -> v.toDouble / 1e12 }.toMap
      round += 1
    }
    p.get("conv") match {
      case Some(v) => v
      case None => null
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val expr = ctx.addReferenceObj("markovExpr", this, classOf[MarkovConvReach].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val res = ctx.freshName("res")
      s"""
         |Object $res = $expr.reachOrNull($c);
         |if ($res == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ((Double) $res).doubleValue();
         |}
       """.stripMargin
    })
  }

  /** Codegen entry point (public so generated code can call it). */
  def reachOrNull(input: Any): Any = nullSafeEval(input)

  override protected def withNewChildInternal(newChild: Expression): MarkovConvReach =
    copy(child = newChild)
}

object MarkovConvReach {
  /** Column API; requires a session built with [[GraftExtensions]]. */
  def markov_conv_reach(c: Column): Column = call_function("markov_conv_reach", c)
}
