package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SimHash as a native Catalyst expression — the one operator here that a
  * composition of built-ins can't express in a single pass (64 bit-counters
  * folded over a token array).
  *
  * Per Charikar's similarity-estimation scheme (STOC 2002): hash every
  * token to 64 bits; for each bit position accumulate +1/-1 votes across
  * tokens; the signature's bit b is 1 iff the vote is positive. Hamming
  * distance between signatures estimates angular distance between the
  * token multisets.
  *
  * Token hash = FNV-1a 64-bit over UTF-8 bytes — stable, seedless, public.
  * Codegen: `doGenCode` emits a static call to [[SimHash.compute]], so the
  * expression stays inside whole-stage codegen instead of falling back to
  * interpreted eval.
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 needs array<string>, got $other")
    }
  }

  override def nullSafeEval(input: Any): Any =
    SimHash.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash {

  /** Expose the expression as a Column-level function. */
  def simhash64(tokens: Column): Column =
    bridge.column(SimHash64Expr(bridge.expression(tokens)))

  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime  = 0x100000001b3L

  /** FNV-1a 64-bit over UTF-8 bytes. */
  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = fnv1a64(tokens.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Convenience: UTF8String variant for direct use. */
  def computeOne(token: UTF8String): Long = fnv1a64(token.getBytes)
}
