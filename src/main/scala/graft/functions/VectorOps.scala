package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

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

/** Two-level probe-cell selection against a BROADCAST hierarchy — the
  * coarse-assignment form of every ≥[[Similarity.twoLevelThreshold]]
  * path: folding every centroid into plan literals bloats the task
  * binary AND the plan tree (analysis, codegen source, explain output
  * all carry cells·dim doubles — the measured A/B in SCALE.md r15 shows
  * the literal form losing at every cell count and OOMing at 855),
  * where this node is ONE expression whose payload ships once per
  * executor as a TorrentBroadcast. Returns the top-`n` cell ids of the
  * row's vector
  * under the identical two-level rule the literal form evaluates —
  * super ranking and candidate ordering both via Double.compare +
  * lowest-id tie-break, matching the sort_array struct order and the
  * first-max argmax ([[VectorOps.probeCells]] kernel; the n=1,
  * probeSupers=1 case IS the assignment argmax). Codegen'd via a static
  * call like [[DotProductExpr]], so the scan stage stays whole-stage
  * compiled.
  */
case class CellProbeExpr(child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[VectorOps.BroadcastHierarchy],
    probeSupers: Int, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cell_probe needs array<double>, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    VectorOps.probeCells(v.asInstanceOf[ArrayData], bc.value, probeSupers, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftHierBc", bc,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorOps.probeCells($c, " +
        s"$ref.value(), $probeSupers, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)

  override def prettyName: String = "cell_probe"
}

object VectorOps {
  import org.apache.spark.sql.functions._

  /** The broadcast payload of [[CellProbeExpr]]: the super-centroids,
    * each super's child cell ids (cid-ascending), and the child
    * centroid vectors in the same order — derived once driver-side from
    * the trained centroids ([[Similarity.superQuantizer]]'s rule) and
    * shipped once per executor.
    */
  final case class BroadcastHierarchy(supers: Array[Array[Double]],
      childIds: Array[Array[Int]], childVecs: Array[Array[Array[Double]]])
    extends Serializable

  /** The [[CellProbeExpr]] kernel: score the √cells supers, keep the top
    * `probeSupers` (Double.compare desc, first-max = lowest sid on
    * ties), score ONLY their children, return the `n` best cell ids
    * (negated-score asc, cid asc — Double.compare, so -0.0/NaN order
    * exactly matches the literal form's sort_array struct compare).
    * Per row ~probeSupers·√cells + √cells dots — the same flop bound as
    * the literal two-level form.
    */
  def probeCells(v: ArrayData, hier: AnyRef, probeSupers: Int,
      n: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val h = hier.asInstanceOf[BroadcastHierarchy]
    val s = h.supers.length
    val ss = new Array[Double](s)
    var i = 0
    while (i < s) { ss(i) = dotV(v, h.supers(i)); i += 1 }
    val p = math.min(probeSupers, s)
    val picked = new Array[Int](p)
    val usedS = new Array[Boolean](s)
    var j = 0
    while (j < p) {
      var best = -1
      var k = 0
      while (k < s) {
        if (!usedS(k) &&
          (best < 0 || java.lang.Double.compare(ss(k), ss(best)) > 0)) best = k
        k += 1
      }
      usedS(best) = true; picked(j) = best; j += 1
    }
    var total = 0
    j = 0
    while (j < p) { total += h.childIds(picked(j)).length; j += 1 }
    val negs = new Array[Double](total)
    val cids = new Array[Int](total)
    var t = 0
    j = 0
    while (j < p) {
      val sid = picked(j)
      val ids = h.childIds(sid)
      val vecs = h.childVecs(sid)
      var c = 0
      while (c < ids.length) {
        negs(t) = -dotV(v, vecs(c)); cids(t) = ids(c); t += 1; c += 1
      }
      j += 1
    }
    val m = math.min(n, total)
    val out = new Array[Int](m)
    val usedC = new Array[Boolean](total)
    var r = 0
    while (r < m) {
      var best = -1
      var c = 0
      while (c < total) {
        if (!usedC(c) && (best < 0 || {
          val cmp = java.lang.Double.compare(negs(c), negs(best))
          cmp < 0 || (cmp == 0 && cids(c) < cids(best))
        })) best = c
        c += 1
      }
      usedC(best) = true; out(r) = cids(best); r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  private def dotV(a: ArrayData, b: Array[Double]): Double = {
    val n = math.min(a.numElements(), b.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b(i); i += 1 }
    acc
  }

  def cellProbe(v: Column,
      bc: org.apache.spark.broadcast.Broadcast[BroadcastHierarchy],
      probeSupers: Int, n: Int): Column =
    bridge.column(CellProbeExpr(bridge.expression(v), bc, probeSupers, n))

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
