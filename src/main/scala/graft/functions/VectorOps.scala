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

/** Per-query ADC lookup table against BROADCAST PQ codebooks — the
  * scan-side LUT build of the distributed PQ search arms. The driver-side
  * arms precompute LUT[m·ksub] per collected query row; above the
  * `maxQueries` switch the query frame never lands on the driver, so this
  * node computes the identical table inside the query-side scan: entry
  * `i = dot(v[subspace(i)], codebook(i/ksub)(i%ksub))`, strict
  * left-to-right accumulation — bit-equal to [[Similarity]]'s driver
  * `adcLut` (same slice clamping on short vectors). The codebooks are
  * m·ksub·subDim doubles (KBs) and ship once per executor as a
  * TorrentBroadcast, exactly the [[CellProbeExpr]] payload discipline;
  * codegen'd via a static call so the projection stays whole-stage
  * compiled.
  */
case class AdcLutExpr(child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[VectorOps.BroadcastBooks])
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"adc_lut needs array<double>, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    VectorOps.adcLutKernel(v.asInstanceOf[ArrayData], bc.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBooksBc", bc,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorOps.adcLutKernel($c, $ref.value());")
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)

  override def prettyName: String = "adc_lut"
}

/** The scan-side ADC score fold — Σ_mm lut[mm·ksub + codes[mm]] — as a
  * native codegen'd expression. The built-in rendering
  * `aggregate(zip_with(codes, sequence(0, m-1), ...), 0.0, _+_)` is TWO
  * nested higher-order functions: unsupported by whole-stage codegen,
  * per-row array allocation, interpreted eval of every lookup — and it
  * sits on the hottest row count in the PQ family (candidates ≫ corpus ≫
  * queries; the round-17 pqbatch probe at 70k queries × ~2400 candidates
  * each did not finish inside 50 minutes on the HOF form). Same strict
  * left-to-right accumulation in subspace order, same NULL contract as
  * the HOF chain (null/short/over-long codes, null elements → NULL
  * score), codegen'd via a static call. ONE documented divergence: a
  * code past the LUT's range (impossible from a consistent encode —
  * codes < ksub always index inside an m·ksub LUT) scores NULL here
  * where Spark 4's ANSI element_at would throw; a scan kernel must not
  * abort a 100 TB job on one corrupt row.
  */
case class AdcFoldExpr(left: Expression, right: Expression,
    m: Int, ksub: Int) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes() = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"adc_fold needs (array<int> codes, array<double> lut), got $other")
  }

  override def nullSafeEval(c: Any, l: Any): Any =
    VectorOps.adcFoldBoxed(c.asInstanceOf[ArrayData],
      l.asInstanceOf[ArrayData], m, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) => s"""
      java.lang.Double graftAdc = graft.functions.VectorOps.adcFoldBoxed(
        $c, $l, $m, $ksub);
      if (graftAdc == null) { ${ev.isNull} = true; }
      else { ${ev.value} = graftAdc.doubleValue(); }""")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)

  override def prettyName: String = "adc_fold"
}

/** Scan-side PQ ENCODE — per subspace, argmin L2 distance over the
  * broadcast codebook (strict <, ties to the lowest code) — as one
  * native expression. The literal-folded form is m·ksub
  * `aggregate(zip_with(slice(...)))` sub-distance HOFs per row (512 at
  * the m=16/ksub=32 default): interpreted, allocation-heavy, and the
  * whole index-build scan drops out of whole-stage codegen. Identical
  * arithmetic (left-to-right (x−c)² folds) and NULL contract (a
  * subspace the vector does not fully cover, or with a null element,
  * encodes NULL — the zip_with-padding outcome); codebooks ship as the
  * [[AdcLutExpr]] TorrentBroadcast payload.
  */
case class PqCodesExpr(child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[VectorOps.BroadcastBooks])
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)

  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_codes needs array<double>, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    VectorOps.pqCodesKernel(v.asInstanceOf[ArrayData], bc.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBooksBc", bc,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorOps.pqCodesKernel($c, $ref.value());")
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)

  override def prettyName: String = "pq_codes"
}

object VectorOps {
  import org.apache.spark.sql.functions._

  /** The broadcast payload of [[AdcLutExpr]]: the trained per-subspace PQ
    * codebooks, `books(m)(code)` a subDim-vector — KBs, shipped once per
    * executor.
    */
  final case class BroadcastBooks(books: Array[Array[Array[Double]]])
    extends Serializable

  /** The [[AdcFoldExpr]] kernel. Boxed return: the fold is NULL whenever
    * the HOF chain it replaces would be — codes length ≠ m (zip_with
    * null-padding), a null code, an index outside the LUT
    * (element_at's null), a null LUT slot.
    */
  def adcFoldBoxed(codes: ArrayData, lut: ArrayData,
      m: Int, ksub: Int): java.lang.Double = {
    if (codes.numElements() != m) return null
    val lutLen = lut.numElements()
    var acc = 0.0
    var mm = 0
    while (mm < m) {
      if (codes.isNullAt(mm)) return null
      val idx = mm * ksub + codes.getInt(mm)
      if (idx < 0 || idx >= lutLen || lut.isNullAt(idx)) return null
      acc += lut.getDouble(idx)
      mm += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** The [[PqCodesExpr]] kernel: per subspace, left-to-right (x−c)² fold
    * against each codeword, strict < argmin (first minimum = lowest
    * code — array_position's first-match rule), NULL for any subspace
    * the vector does not fully cover or that contains a null element.
    */
  def pqCodesKernel(v: ArrayData,
      booksRef: AnyRef): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val books = booksRef.asInstanceOf[BroadcastBooks].books
    val m = books.length
    val ksub = books(0).length
    val subDim = books(0)(0).length
    val n = v.numElements()
    val out = new Array[Any](m)
    var mm = 0
    while (mm < m) {
      val off = mm * subDim
      var nullSub = off + subDim > n
      var d = 0
      while (!nullSub && d < subDim) {
        if (v.isNullAt(off + d)) nullSub = true
        d += 1
      }
      if (nullSub) out(mm) = null
      else {
        var best = 0
        var bestD = java.lang.Double.MAX_VALUE
        var kk = 0
        while (kk < ksub) {
          val cw = books(mm)(kk)
          var acc = 0.0
          var i = 0
          while (i < subDim) {
            val x = v.getDouble(off + i) - cw(i)
            acc += x * x
            i += 1
          }
          if (kk == 0 || acc < bestD) { best = kk; bestD = acc }
          kk += 1
        }
        out(mm) = best
      }
      mm += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def adcFold(codes: Column, lut: Column, m: Int, ksub: Int): Column =
    bridge.column(AdcFoldExpr(bridge.expression(codes),
      bridge.expression(lut), m, ksub))

  def pqCodesCol(v: Column,
      bc: org.apache.spark.broadcast.Broadcast[BroadcastBooks]): Column =
    bridge.column(PqCodesExpr(bridge.expression(v), bc))

  /** The [[AdcLutExpr]] kernel: LUT[i] = dot of the row vector's
    * (i/ksub)-th subspace slice against codeword i%ksub, left-to-right
    * accumulation, slice clamped at the vector end (short vectors
    * contribute fewer terms — Array.slice semantics, matching the
    * driver-side build).
    */
  def adcLutKernel(v: ArrayData,
      booksRef: AnyRef): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val books = booksRef.asInstanceOf[BroadcastBooks].books
    val m = books.length
    val ksub = books(0).length
    val subDim = books(0)(0).length
    val n = v.numElements()
    val out = new Array[Double](m * ksub)
    var i = 0
    while (i < out.length) {
      val cw = books(i / ksub)(i % ksub)
      val off = (i / ksub) * subDim
      var acc = 0.0
      var d = 0
      while (d < subDim && off + d < n) {
        acc += v.getDouble(off + d) * cw(d); d += 1
      }
      out(i) = acc
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def adcLut(v: Column,
      bc: org.apache.spark.broadcast.Broadcast[BroadcastBooks]): Column =
    bridge.column(AdcLutExpr(bridge.expression(v), bc))

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
