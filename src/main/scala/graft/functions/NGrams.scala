package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles as a native Catalyst expression.
  *
  * A built-in composition (`transform(sequence(...), i => concat_ws(...,
  * element_at(t, i+j)))`) is correct but catastrophically slow: higher-order
  * functions are interpreted, and every expression embedded in the lambda
  * body — including the tokenizing `split` — re-evaluates per element,
  * turning one tokenize per document into one per n-gram per reference
  * (~200× at 70 tokens). This expression does one pass over the token array
  * in JVM code and participates in whole-stage codegen via a static call.
  */
case class NGramsExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ngrams needs array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    NGrams.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NGrams.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NGramsExpr =
    copy(child = newChild)

  override def prettyName: String = "word_ngrams"
}

object NGrams {

  /** Column-level function: distinct n-grams of a token array. */
  def wordNGrams(tokens: Column, n: Int = 3): Column =
    bridge.column(NGramsExpr(bridge.expression(tokens), n))

  private val Space = UTF8String.fromString(" ")

  /** One-pass distinct n-grams; insertion order preserved (deterministic).
    * Shared by interpreted eval and generated code.
    */
  def compute(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= len - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      var ok = true
      while (j < n) {
        val s = if (tokens.isNullAt(i + j)) null else tokens.getUTF8String(i + j)
        if (s == null) ok = false
        parts(j) = s
        j += 1
      }
      if (ok) seen.add(UTF8String.concatWs(Space, parts: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}
