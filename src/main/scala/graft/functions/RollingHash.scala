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

object RollingHash {

  /** Largest prime ≤ 2^58: (P-1)*31 + maxCodePoint < 2^63, so the update
    * never overflows a signed long.
    */
  val Modulus: Long = 288230376151711717L

  def rollingHash(s: Column): Column =
    bridge.column(RollingHashExpr(bridge.expression(s)))

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
