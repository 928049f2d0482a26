package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** MinHash signature as a native Catalyst expression: all `numHashes`
  * minima over a shingle set computed in ONE pass per document.
  *
  * The composition alternative — explode shingles × hashes, shuffle, and
  * groupBy(doc, seed).min — moves |shingles|×numHashes narrow rows through
  * an exchange per signature build. Computing the signature where the
  * shingle array already lives removes that shuffle entirely; the only
  * remaining exchange in MinHash-LSH is the band-bucket join.
  *
  * Hash family: one FNV-1a base hash per shingle, then the classic
  * universal family h_s(x) = a_s * x + b_s with per-seed constants drawn
  * from splitmix64 — deterministic, seedless RNG-free, public knowledge
  * (Steele et al., "Fast splittable pseudorandom number generators",
  * OOPSLA 2014).
  */
case class MinHashSigExpr(child: Expression, numHashes: Int) extends UnaryExpression {
  // plan-time bounds check: failing here is a driver-side error, not a
  // repeated task failure after the corpus has already been scanned
  require(numHashes >= 1 && numHashes <= MinHash.MaxSeeds,
    s"numHashes must be in [1, ${MinHash.MaxSeeds}], got $numHashes")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_sig needs array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    MinHash.signature(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHash.signature($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHash {

  def minhashSignature(shingles: Column, numHashes: Int): Column =
    bridge.column(MinHashSigExpr(bridge.expression(shingles), numHashes))

  /** splitmix64 output function — mixes a seed into a well-distributed
    * 64-bit constant.
    */
  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Per-seed multipliers/offsets, computed once per JVM. */
  val MaxSeeds = 256
  private val A: Array[Long] =
    Array.tabulate(MaxSeeds)(s => splitmix64(2L * s) | 1L) // odd multipliers
  private val B: Array[Long] =
    Array.tabulate(MaxSeeds)(s => splitmix64(2L * s + 1L))

  def signature(shingles: ArrayData, numHashes: Int): ArrayData = {
    require(numHashes <= MaxSeeds, s"numHashes > $MaxSeeds")
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val base = SimHash.fnv1a64(shingles.getUTF8String(i).getBytes)
        var s = 0
        while (s < numHashes) {
          val h = A(s) * base + B(s)
          if (h < mins(s)) mins(s) = h
          s += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
