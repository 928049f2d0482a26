package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash over a string's code points as a native Catalyst
  * expression: `h_{i+1} = (h_i * 31 + cp_i) mod P` with `P = 2^58 - 27`
  * (prime). The classic Karp–Rabin/Java-`hashCode` construction widened to a
  * 58-bit prime field — the largest modulus for which `h * 31 + cp` cannot
  * overflow a signed 64-bit long, so the same arithmetic is reproducible in
  * any engine with 64-bit integers (the DuckDB oracle replays it with
  * `list_reduce` over `unicode(...)` code points; xxhash-style mixers, by
  * contrast, need unsigned 64-bit multiply).
  *
  * Used for document fingerprinting (SURVEY §7.2 step 10 "document
  * fingerprinting (rolling hash)"): callers normalize first (see
  * [[TextAnalysis.fingerprint]]).
  *
  * NULL semantics: null-propagating (null text → null fingerprint), the
  * standard scalar-function contract — unlike `xxhash64`, whose seed makes
  * it total. Callers grouping by fingerprint see all null-text rows in one
  * null group on both engines, so the DuckDB oracle needs no special-casing.
  */
case class RollingHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes() = child.dataType match {
    case StringType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash needs string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    RollingHash.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHashExpr =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash"
}

/** ALL W-code-point sliding-window hashes of a string in O(len) — the
  * Karp–Rabin anchor kernel behind substring-level dedup
  * ([[Dedup.substringDedup]]): one pass decodes the code points, one
  * pass rolls `h' = (h − cp_out·31^{W-1})·31 + cp_in` in NATURAL
  * mod-2^64 long arithmetic (wrapping multiply/subtract — no division,
  * no 128-bit ops). Unlike [[RollingHashExpr]] these hashes are an
  * ENGINE-INTERNAL pre-screen only: candidates are re-verified on the
  * exact window text before any removal decision, so no oracle ever
  * replays this arithmetic and collisions cost a verify, never a wrong
  * answer. Returns one long per window (empty array when the text is
  * shorter than W). Codegen'd via a static call ([[DotProductExpr]]'s
  * pattern).
  */
case class WindowHashesExpr(child: Expression, w: Int)
  extends UnaryExpression {
  require(w >= 2, s"window length must be >= 2, got $w")
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes() = child.dataType match {
    case StringType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"window_hashes needs string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    RollingHash.windowHashes(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.windowHashes($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): WindowHashesExpr =
    copy(child = newChild)

  override def prettyName: String = "window_hashes"
}

object RollingHash {

  /** Largest prime ≤ 2^58: (P-1)*31 + maxCodePoint < 2^63, so the update
    * never overflows a signed long.
    */
  val Modulus: Long = 288230376151711717L

  def rollingHash(s: Column): Column =
    bridge.column(RollingHashExpr(bridge.expression(s)))

  def windowHashesCol(s: Column, w: Int): Column =
    bridge.column(WindowHashesExpr(bridge.expression(s), w))

  /** Static entry point for [[WindowHashesExpr]]: decode code points
    * once, roll once — O(len) total, wrapping mod-2^64 arithmetic. */
  def windowHashes(s: UTF8String,
      w: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val cps = codePoints(s)
    val n = cps.length
    if (n < w)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        new Array[Long](0))
    var pow = 1L // 31^(w-1) mod 2^64
    var k = 1
    while (k < w) { pow *= 31L; k += 1 }
    val out = new Array[Long](n - w + 1)
    var h = 0L
    var i = 0
    while (i < w) { h = h * 31L + cps(i); i += 1 }
    out(0) = h
    var p = 1
    while (p <= n - w) {
      h = (h - cps(p - 1) * pow) * 31L + cps(p + w - 1)
      out(p) = h
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** UTF-8 → code-point array ([[compute]]'s decode loop, materialized
    * once so the rolling pass is pure long arithmetic). */
  private def codePoints(s: UTF8String): Array[Int] = {
    val n = s.numBytes()
    val out = new Array[Int](s.numChars())
    var i = 0
    var c = 0
    while (i < n) {
      val b0 = s.getByte(i) & 0xFF
      var cp = b0
      var len = 1
      if (b0 >= 0x80) {
        if ((b0 & 0xE0) == 0xC0) { cp = b0 & 0x1F; len = 2 }
        else if ((b0 & 0xF0) == 0xE0) { cp = b0 & 0x0F; len = 3 }
        else if ((b0 & 0xF8) == 0xF0) { cp = b0 & 0x07; len = 4 }
        var j = 1
        while (j < len && i + j < n) {
          cp = (cp << 6) | (s.getByte(i + j) & 0x3F)
          j += 1
        }
      }
      out(c) = cp
      c += 1
      i += len
    }
    out
  }

  /** Static entry point shared by interpreted eval and generated code.
    * Iterates CODE POINTS (not UTF-16 chars) so supplementary-plane text
    * hashes identically to engines that walk unicode scalars. Decodes them
    * straight from the UTF8String's bytes — no per-row String allocation in
    * what is a hot scan-side loop at 100 TB.
    */
  def compute(s: UTF8String): Long = {
    val n = s.numBytes()
    var h = 0L
    var i = 0
    while (i < n) {
      val b0 = s.getByte(i) & 0xFF
      var cp = b0
      var len = 1
      if (b0 >= 0x80) {
        if ((b0 & 0xE0) == 0xC0) { cp = b0 & 0x1F; len = 2 }
        else if ((b0 & 0xF0) == 0xE0) { cp = b0 & 0x0F; len = 3 }
        else if ((b0 & 0xF8) == 0xF0) { cp = b0 & 0x07; len = 4 }
        // else: not a valid UTF-8 lead byte (stray continuation byte or
        // 0xF8+): hash the byte itself and advance one — bounded behavior
        // on malformed input instead of swallowing the next 3 bytes.
        // Spark strings are valid UTF-8, so this arm never fires for them.
        var j = 1
        while (j < len && i + j < n) {
          cp = (cp << 6) | (s.getByte(i + j) & 0x3F)
          j += 1
        }
      }
      h = (h * 31L + cp) % Modulus
      i += len
    }
    h
  }
}
