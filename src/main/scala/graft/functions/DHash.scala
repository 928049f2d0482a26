package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit difference-hash (dHash) signatures — the perceptual-fingerprint
  * kernel shared by the pixel-level image path
  * ([[Multimodal.imageDhash]]: decode → 9×8 box-mean grid) and the
  * deterministic content fallback ([[TextDhashExpr]]: 72 evenly spaced
  * code-point samples as the grid). The grid geometry is the classic
  * dHash: 9 columns × 8 rows of brightness, one bit per ADJACENT column
  * pair (`right > left`), 64 bits total — near-identical inputs differ in
  * few bits, so near-duplicates surface with the same banded-Hamming
  * machinery SimHash uses ([[Dedup.bandedHammingPairs]]).
  *
  * Bit layout: bit `k = row*8 + col` (LSB-first) is set iff
  * `grid(row, col+1) > grid(row, col)` — strict `>`, so a constant input
  * packs to 0 and the DuckDB replay (sum of `power(2, k)` in HUGEINT,
  * then the two's-complement fold to signed BIGINT) is exact.
  */
case class TextDhashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes() = child.dataType match {
    case StringType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"text_dhash needs string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    DHash.computeText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DHash.computeText($c)")

  override protected def withNewChildInternal(newChild: Expression): TextDhashExpr =
    copy(child = newChild)

  override def prettyName: String = "text_dhash"
}

object DHash {

  /** Grid geometry: `Cols` brightness samples per row, `Rows` rows,
    * `Cols - 1` difference bits per row — 8×8 = 64 bits.
    */
  val Cols = 9
  val Rows = 8

  def textDhash(s: Column): Column =
    bridge.column(TextDhashExpr(bridge.expression(s)))

  /** Pack a row-major `Rows`×`Cols` brightness grid into the 64-bit
    * signature: bit `r*8 + c` ⇔ `g(r*Cols + c + 1) > g(r*Cols + c)`.
    */
  def packGrid(g: Array[Int]): Long = {
    require(g.length == Rows * Cols, s"grid must be ${Rows * Cols} samples")
    var sig = 0L
    var r = 0
    while (r < Rows) {
      var c = 0
      while (c < Cols - 1) {
        if (g(r * Cols + c + 1) > g(r * Cols + c)) sig |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    sig
  }

  /** Pack a grid given per-cell (brightness sum, pixel count) — the
    * box-mean image path. Means compare EXACTLY via cross-multiplication
    * (`sum_b·cnt_a > sum_a·cnt_b`), no division, no floats. Bound: safe
    * while `sum·cnt < 2^63`, i.e. images up to ~2^27 pixels per cell —
    * far beyond any sane thumbnail grid.
    */
  def packGridSums(sum: Array[Long], cnt: Array[Long]): Long = {
    require(sum.length == Rows * Cols && cnt.length == Rows * Cols,
      s"grid must be ${Rows * Cols} cells")
    var sig = 0L
    var r = 0
    while (r < Rows) {
      var c = 0
      while (c < Cols - 1) {
        val i = r * Cols + c
        if (sum(i + 1) * cnt(i) > sum(i) * cnt(i + 1)) sig |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    sig
  }

  /** The content-fallback signature: code points of the (caller-normalized)
    * text, reduced mod 256 to a brightness sequence, sampled at 72 evenly
    * spaced positions (`sample j = cp[⌊j·n/72⌋]`) into the 9×8 grid, then
    * [[packGrid]]. Deterministic, engine-portable (the DuckDB oracle
    * replays it with `unicode(...) % 256` list arithmetic), and — like
    * [[RollingHash.compute]] — decoded straight from the UTF8String bytes:
    * no per-row String allocation in a scan-side loop. Empty input packs
    * to 0; callers filter empty/NULL text (a signature must describe
    * content, and the SQL replay mirrors the same WHERE).
    */
  def computeText(s: UTF8String): Long = {
    val nChars = s.numChars()
    if (nChars == 0) return 0L
    val cps = new Array[Int](nChars)
    val nBytes = s.numBytes()
    var i = 0
    var w = 0
    while (i < nBytes) {
      val b0 = s.getByte(i) & 0xFF
      var cp = b0
      var len = 1
      if (b0 >= 0x80) {
        if ((b0 & 0xE0) == 0xC0) { cp = b0 & 0x1F; len = 2 }
        else if ((b0 & 0xF0) == 0xE0) { cp = b0 & 0x0F; len = 3 }
        else if ((b0 & 0xF8) == 0xF0) { cp = b0 & 0x07; len = 4 }
        // malformed lead byte: keep the byte, advance one (see RollingHash)
        var j = 1
        while (j < len && i + j < nBytes) {
          cp = (cp << 6) | (s.getByte(i + j) & 0x3F)
          j += 1
        }
      }
      cps(w) = cp % 256
      w += 1
      i += len
    }
    val g = new Array[Int](Rows * Cols)
    var j = 0
    while (j < Rows * Cols) {
      g(j) = cps(((j.toLong * w) / (Rows * Cols)).toInt)
      j += 1
    }
    packGrid(g)
  }
}
