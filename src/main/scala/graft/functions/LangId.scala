package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Marker-lexicon language identification as a native Catalyst expression.
  *
  * The built-in composition (`size(filter(toks, array_contains(markers, t)))`
  * once per language) is correct but slow: higher-order functions are
  * interpreted, and the 5-language argmax walks the token array five times
  * per row — the round-1 bench's single most expensive query (8.2 s of a
  * 63 s total at sf0.1). This expression makes ONE pass over the token
  * array, scoring every language via a shared hash lookup, and participates
  * in whole-stage codegen through a static call — the same pattern as
  * [[NGramsExpr]].
  */
case class LangIdExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  /** NULL input identifies as "und", not NULL: language-ID is a total
    * classification (the pre-rebuild HOF composition behaved this way, and a
    * null-propagating variant silently reshapes downstream groupBys).
    */
  override def nullable: Boolean = false

  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"lang_id needs array<string>, got $other")
  }

  override def eval(input: InternalRow): Any = child.eval(input) match {
    case null => LangId.Und
    case arr  => LangId.compute(arr.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val javaType = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
      .javaType(dataType)
    ev.copy(
      code = code"""
        ${c.code}
        $javaType ${ev.value} = ${c.isNull}
          ? graft.functions.LangId.Und()
          : graft.functions.LangId.compute(${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)

  override def prettyName: String = "lang_id"
}

object LangId {

  /** Tiny per-language stopword/marker lexicons. Markers are DISJOINT
    * across languages (asserted below) so a single token→language map
    * suffices; ties in the vote break toward the earlier language in this
    * order, and a zero score yields "und".
    */
  val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "with"),
    "de" -> Seq("der", "die", "und", "ist", "mit"),
    "es" -> Seq("el", "los", "y", "es", "con"),
    "fr" -> Seq("le", "les", "et", "est", "avec"),
    "zh" -> Seq("的", "是", "了", "在", "和"))

  private val langs: Array[UTF8String] =
    Markers.map { case (lang, _) => UTF8String.fromString(lang) }.toArray

  /** Public (not private) so generated code can reach the static forwarder. */
  val Und: UTF8String = UTF8String.fromString("und")

  /** token → language index; built once, read-only after class init, so
    * safe to share across executor threads and codegen'd calls.
    */
  private val markerToLang: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    Markers.zipWithIndex.foreach { case ((_, words), i) =>
      words.foreach { w =>
        val key = UTF8String.fromString(w)
        require(m.put(key, i) == null, s"marker '$w' is not disjoint")
      }
    }
    m
  }

  /** Column-level function: best-scoring language of a token array. */
  def langIdFromTokens(tokens: Column): Column =
    bridge.column(LangIdExpr(bridge.expression(tokens)))

  /** One pass, one hash probe per token, all languages scored together.
    * Shared by interpreted eval and generated code.
    */
  def compute(tokens: ArrayData): UTF8String = {
    val scores = new Array[Int](langs.length)
    val len = tokens.numElements()
    var i = 0
    while (i < len) {
      if (!tokens.isNullAt(i)) {
        val lang = markerToLang.get(tokens.getUTF8String(i))
        if (lang != null) scores(lang) += 1
      }
      i += 1
    }
    var best = 0
    var j = 1
    while (j < scores.length) {
      if (scores(j) > scores(best)) best = j // strict > ⇒ earlier lang wins ties
      j += 1
    }
    if (scores(best) > 0) langs(best) else Und
  }
}
