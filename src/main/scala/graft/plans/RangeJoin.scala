package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, BindReferences, Expression, JoinedRow, Predicate, TernaryExpression,
  UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** The whole-operator extension path (SURVEY §4 preference (c)): a range
  * join planned as a custom physical operator.
  *
  * `interval_match(v, lo, hi)` is an ordinary codegen'd predicate —
  * `lo <= v AND v < hi` — so any query using it is CORRECT under
  * Spark's default planning (it lands in a BroadcastNestedLoopJoin
  * residual). [[RangeJoinStrategy]] additionally pattern-matches an
  * inner join whose entire condition is one `interval_match` with the
  * probe on the stream side and the bounds on the build side, and plans
  * [[BroadcastRangeJoinExec]] instead: build intervals sorted by `lo`
  * once on the driver, probes binary-search them — O(log n + hits) per
  * row vs the nested-loop's O(n). At a 25-row bands dim that is noise;
  * at a 100k-interval dim (IP→geo maps, price tiers, histogram bands)
  * it is the difference between a usable operator and a quadratic one.
  * If the shape doesn't match (extra conjuncts, probe on the build
  * side), the strategy declines and Spark's planner takes over — the
  * predicate still evaluates, so behavior degrades gracefully in
  * performance only, never in semantics.
  */
case class IntervalMatch(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"interval_match expects (double, double, double), got " +
        children.map(_.dataType.simpleString).mkString(", "))

  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "interval_match"

  // closed-open [lo, hi) — the band convention, composable without overlap
  override protected def nullSafeEval(v: Any, lo: Any, hi: Any): Any = {
    val x = v.asInstanceOf[Double]
    lo.asInstanceOf[Double] <= x && x < hi.asInstanceOf[Double]
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, lo, hi) => s"$lo <= $v && $v < $hi")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): IntervalMatch =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Plans an inner join whose whole condition is `interval_match(v, lo,
  * hi)` — probe column from the left (stream) side, interval bounds from
  * the right (build) side — as [[BroadcastRangeJoinExec]]. Any other
  * shape returns Nil and the default planner applies. */
class RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Join(left, right, Inner, Some(im @ IntervalMatch(v, lo, hi)), _)
        if v.references.subsetOf(left.outputSet) &&
          lo.references.subsetOf(right.outputSet) &&
          hi.references.subsetOf(right.outputSet) &&
          // the exec driver-collects + broadcasts the build side, so
          // claim the join only when the optimizer's size estimate fits
          // the broadcast threshold — an oversized interval dim falls
          // through to Spark's own BNLJ plan instead of OOMing the
          // driver (r12 review); <= 0 means broadcasting is disabled
          {
            val thr = org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
            thr > 0 && right.stats.sizeInBytes <= thr
          } =>
      BroadcastRangeJoinExec(v, lo, hi, planLater(left), planLater(right)) :: Nil
    case _ => Nil
  }
}

/** Broadcast interval join: the build side (assumed dimension-sized,
  * like any broadcast side) is materialized once, sorted by `lo`, and
  * shipped to every task; each probe row binary-searches the last
  * interval with `lo <= v` and walks left only while the running prefix
  * max of `hi` can still cover `v` — so non-overlapping intervals cost
  * exactly one probe and overlapping ones cost O(hits). The stream side
  * is never shuffled, never sorted: one narrow pass, like every other
  * broadcast join in the library.
  */
case class BroadcastRangeJoinExec(
    v: Expression, lo: Expression, hi: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def doExecute(): RDD[InternalRow] = {
    // build: collect + sort the dimension once (driver), broadcast arrays
    val loB = BindReferences.bindReference(lo, right.output)
    val hiB = BindReferences.bindReference(hi, right.output)
    val built = right.executeCollect().flatMap { r =>
      val l = loB.eval(r)
      val h = hiB.eval(r)
      if (l == null || h == null) None
      else {
        val ld = l.asInstanceOf[Double]
        val hd = h.asInstanceOf[Double]
        // a NaN bound matches nothing under interval_match (every
        // comparison is false) — but left in the build it would poison
        // the prefix-max (math.max propagates NaN) and stop the
        // leftward walk early, silently DROPPING matches from other
        // intervals (r12 review); filter it like the nulls
        if (ld.isNaN || hd.isNaN) None else Some((ld, hd, r))
      }
    }.sortBy(_._1)
    val los = built.map(_._1)
    val his = built.map(_._2)
    val rows = built.map(_._3)
    // prefixMaxHi(i) = max(hi(0..i)): once it drops below the probe, no
    // earlier interval can match and the leftward walk stops
    val prefixMaxHi = new Array[Double](his.length)
    var m = Double.NegativeInfinity
    var i = 0
    while (i < his.length) { m = math.max(m, his(i)); prefixMaxHi(i) = m; i += 1 }
    val bc = sparkContext.broadcast((los, his, prefixMaxHi, rows))
    val vBound = BindReferences.bindReference(v, left.output)
    val out = output

    left.execute().mapPartitions { iter =>
      val (losA, hisA, pmax, dimRows) = bc.value
      val joined = new JoinedRow
      val project = UnsafeProjection.create(out, out)
      iter.flatMap { probe =>
        val pv = vBound.eval(probe)
        if (pv == null || losA.isEmpty) Iterator.empty
        else {
          val x = pv.asInstanceOf[Double]
          // last index with lo <= x
          var idx = java.util.Arrays.binarySearch(losA, x)
          if (idx >= 0) { while (idx + 1 < losA.length && losA(idx + 1) <= x) idx += 1 }
          else idx = -idx - 2 // insertion point - 1
          new Iterator[InternalRow] {
            private var j = idx
            private def seek(): Unit = {
              while (j >= 0 && pmax(j) > x && !(losA(j) <= x && x < hisA(j))) j -= 1
              if (j >= 0 && pmax(j) <= x) j = -1 // nothing earlier can cover x
            }
            seek()
            override def hasNext: Boolean = j >= 0 && losA(j) <= x && x < hisA(j)
            override def next(): InternalRow = {
              val r = project(joined(probe, dimRows(j)))
              j -= 1; seek()
              r
            }
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastRangeJoinExec =
    copy(left = newLeft, right = newRight)
}
