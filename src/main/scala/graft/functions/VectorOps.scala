package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dot product over `array<double>` as a native Catalyst expression.
  *
  * The built-in composition `aggregate(zip_with(a, b, _*_), 0.0, _+_)` is
  * interpreted (higher-order functions don't codegen) and allocates an
  * intermediate array per row — at ~10⁵-10⁹ candidate pairs in ANN/near-dup
  * verification that interpretation dominates the job. This is a single
  * fused loop, codegen'd via a static call, with the same strict
  * left-to-right accumulation order (bit-deterministic doubles).
  */
case class DotProductExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes() = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product needs (array<double>, array<double>), got $other")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.dot($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)

  override def prettyName: String = "dot_product"
}

/** Elementwise divide of an `array<double>` by a scalar — the
  * normalization kernel (`v / ‖v‖`). The built-in rendering
  * `transform(v, x -> x / nrm)` is a higher-order function: unsupported
  * by whole-stage codegen, and ONE such node drags every projection
  * fused with it into interpreted eval — which, with [[DotProductExpr]]
  * dots and probe ranks living in the SAME scan-side stage, taxed the
  * entire ANN/dedup query family (the r14-measured HOF penalty). Same
  * shape as [[DotProductExpr]]: a fused loop codegen'd via a static
  * call, arithmetic identical to the transform (one IEEE divide per
  * element, in order) so results are bit-equal.
  */
case class VectorDivExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes() = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), DoubleType) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vector_div needs (array<double>, double), got $other")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.div(a.asInstanceOf[ArrayData], b.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.div($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)

  override def prettyName: String = "vector_div"
}

object VectorOps {
  import org.apache.spark.sql.functions._

  def dotProduct(a: Column, b: Column): Column =
    bridge.column(DotProductExpr(bridge.expression(a), bridge.expression(b)))

  def vectorDiv(v: Column, s: Column): Column =
    bridge.column(VectorDivExpr(bridge.expression(v), bridge.expression(s)))

  /** Sign-bit coarse quantizer shared by the LSH/IVF paths: packs the signs
    * of `bits` consecutive dimensions starting at `startDim` into a small
    * int bucket key. Dimensions past the end of a short vector read as
    * null, which quantizes as a 0-bit.
    */
  def signBucket(v: Column, startDim: Int, bits: Int): Column =
    (0 until bits).map { i =>
      when(element_at(v, startDim + i + 1) >= 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** One IEEE divide per element, in order — bit-equal to
    * `transform(v, x -> x / s)`. */
  def div(a: ArrayData, s: Double): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = a.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = a.getDouble(i) / s; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Strict left-to-right accumulation; length = min(|a|, |b|). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}
