package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, typedLit}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native in-row product-quantization encode (r19): for a 64-dim double
  * vector and a TRAINED codebook (per subspace j ∈ 0..3, the surviving
  * (code, cv) rows in ascending code order), emit the 64-dim
  * reconstruction — the concatenation over j of the argmax-scoring
  * codebook vector.
  *
  * This replaces the corpus-wide `pqSub explode → broadcast codebook
  * join → struct-max argmax → groupBy(vec_id) collect` encode pipeline
  * (4 generated rows + 1 shuffle + 1 collect_list per vector) with ONE
  * codegen'd expression per row; the codebook rows (≤ 4·64, a trained
  * model like KMeans' clusterCenters) are collected to the driver once
  * per query and ride into codegen as a reference object.
  *
  * Arithmetic replicated EXACTLY from the DataFrame form it replaces
  * (ops.Similarity.pqAssign — TwinAndPropertySpec pins equality on the
  * real corpus):
  *  - per (j, code): sc6 = (long) floor((dot(sv, cv) − ‖cv‖²/2)·1e6 + 0.5),
  *    where dot is the same LEFT-TO-RIGHT double fold as `dot_product`
  *    over sv = de[16j .. 16j+16) and ‖cv‖²/2 is precomputed per
  *    codebook row with the identical fold (the pqAssign broadcast-build
  *    `cvv` column);
  *  - the winner is max by (sc6, −code): an ascending-code scan that
  *    replaces only on STRICTLY greater sc6 — ties keep the lowest code,
  *    exactly the struct-max decision;
  *  - output element (16j + t) = winner_cv(t), doubles verbatim.
  *
  * Inputs outside the trained shape return NULL: a null vector, a
  * vector whose length ≠ Σ_j subDim, or a null element (the corpus
  * invariant — generated embeddings are dense 64-dim — is pinned by the
  * equivalence test; the old pipeline produced no row at all for such
  * inputs and its consumers inner-joined them away, so NULL here is
  * only reachable off the declared corpus).
  *
  * SQL shape: pq_encode(de, cvs, cvvs) where cvs/cvvs are FOLDABLE
  * nested-array literals (the collected codebook) — literals so the
  * expression stays a pure function of its children for plan
  * canonicalization; the constants are extracted once per (driver)
  * instance and shipped to codegen as one reference object.
  */
case class PqEncode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  // float inputs widen per element before the multiply — exact, the
  // same promotion the `transform(embedding, x -> CAST(x AS DOUBLE))`
  // view applied before slicing (so feeding the raw float column is
  // bit-identical and skips that interpreted per-element lambda)
  private def isNumArray(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
    case _ => false
  }
  @transient private lazy val inputIsFloat: Boolean = first.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val cvsOk = second.dataType match {
      case ArrayType(ArrayType(ArrayType(DoubleType, _), _), _) => true
      case _ => false
    }
    val cvvsOk = third.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    if (isNumArray(first.dataType) && cvsOk && cvvsOk &&
        second.foldable && third.foldable)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        "pq_encode expects (array<float|double>, foldable array<array<array<double>>>, " +
          s"foldable array<array<double>>), got (${first.dataType.simpleString}, " +
          s"${second.dataType.simpleString}, ${third.dataType.simpleString})")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "pq_encode"

  /** codebook(j)(r) = r-th surviving cv of subspace j, ascending code
    * order; cvv(j)(r) its precomputed ‖cv‖²/2. Extracted once from the
    * foldable children. */
  @transient private lazy val cvs: Array[Array[Array[Double]]] = {
    val a = second.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(a.numElements()) { j =>
      val sj = a.getArray(j)
      Array.tabulate(sj.numElements())(r => sj.getArray(r).toDoubleArray())
    }
  }
  @transient private lazy val cvvs: Array[Array[Double]] = {
    val a = third.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(a.numElements())(j => a.getArray(j).toDoubleArray())
  }

  /** The shared scan kernel — also the codegen'd body below. */
  def encode(de: ArrayData): Any = {
    val nsub = cvs.length
    if (nsub == 0) return new GenericArrayData(Array.empty[Any])
    val subDim = if (cvs(0).length > 0) cvs(0)(0).length else 0
    if (de.numElements() != nsub * subDim) return null
    var t = 0
    val n = de.numElements()
    while (t < n) { if (de.isNullAt(t)) return null; t += 1 }
    val out = new Array[Any](nsub * subDim)
    var j = 0
    while (j < nsub) {
      val rows = cvs(j)
      val vvs = cvvs(j)
      var best = -1
      var bestSc = Long.MinValue
      var r = 0
      while (r < rows.length) {
        val cv = rows(r)
        var acc = 0.0
        var i = 0
        while (i < subDim) {
          val x = if (inputIsFloat) de.getFloat(j * subDim + i).toDouble
                  else de.getDouble(j * subDim + i)
          acc += x * cv(i)
          i += 1
        }
        val sc6 = math.floor((acc - vvs(r)) * 1e6 + 0.5).toLong
        if (sc6 > bestSc) { bestSc = sc6; best = r }
        r += 1
      }
      if (best < 0) return null // subspace with no codebook rows
      val w = rows(best)
      var i = 0
      while (i < subDim) { out(j * subDim + i) = w(i); i += 1 }
      j += 1
    }
    new GenericArrayData(out)
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val de = first.eval(input)
    if (de == null) null else encode(de.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the whole scan runs through the interpreted kernel via ONE
    // reference-object call per row: the kernel is a tight primitive
    // loop over driver-side double[][] constants (no per-element
    // Catalyst eval), so a hand-inlined codegen body would duplicate
    // 40 lines for no measurable gain — the expensive part (the
    // 64-codes × 16-dim multiply-adds) is identical JIT-compiled code
    // either way.
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val self = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    val deCode = first.genCode(ctx)
    val result = ctx.freshName("pqResult")
    ev.copy(code =
      code"""
        ${deCode.code}
        boolean ${ev.isNull} = true;
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${deCode.isNull}) {
          Object $result = $self.encode(${deCode.value});
          if ($result != null) {
            ${ev.isNull} = false;
            ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $result;
          }
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PqEncode =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PqEncode {
  /** Column API over a DRIVER-COLLECTED codebook: cvs(j) lists the
    * surviving codebook vectors of subspace j in ascending code order,
    * cvvs(j) the matching precomputed ‖cv‖²/2 values (compute them with
    * the same left-to-right fold as `dot_product` for bit parity with
    * the pqAssign broadcast build). Requires a session built with
    * [[GraftExtensions]]. */
  def pq_encode(de: Column, cvs: Seq[Seq[Seq[Double]]],
                cvvs: Seq[Seq[Double]]): Column =
    call_function("pq_encode", de, typedLit(cvs), typedLit(cvvs))
}
