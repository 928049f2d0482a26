package graft

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions registration for the engine's native expressions,
  * making them first-class SQL functions:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)            // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * ...
  * spark.sql("SELECT rolling_hash(text), lang_id(split(text, '\\s+')) FROM docs")
  * }}}
  *
  * Registered: `rolling_hash(str)`, `lang_id(array<string>)`,
  * `simhash64(array<string>)`, `word_ngrams(array<string>[, n])`,
  * `minhash_signature(array<string>[, k])`, `dot_product(arr, arr)`,
  * `nfc_normalize(str)`, `text_dhash(str)`,
  * `blocklist_matches(str, array<string>)`.
  * The SQL surface evaluates the exact same codegen'd expressions as the
  * Column API — no parallel implementation to drift.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  /** Install the functions into an ALREADY-RUNNING session (extensions only
    * apply at session build time).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (ident, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, inf, builder)
    }

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name expects a literal INT, got $other")
  }

  private def boolArg(e: Expression, name: String): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(
      s"$name expects a literal BOOLEAN, got $other")
  }

  /** A literal string-array argument — configuration, not data (the pattern
    * list compiles into the expression like `minhash_signature`'s k).
    * Enforces the same contract as the Column surface
    * ([[graft.functions.Blocklist.matches]]): at least one pattern, none
    * empty — an empty pattern would match at every character position and
    * an empty list would silently screen nothing.
    */
  private def stringArrayArg(e: Expression, name: String): Array[String] = {
    val arr = stringArrayLit(e, name)
    require(arr.nonEmpty, s"$name needs at least one pattern")
    require(arr.forall(_.nonEmpty), s"$name: empty pattern")
    arr
  }

  private def stringArrayLit(e: Expression, name: String): Array[String] = e match {
    case org.apache.spark.sql.catalyst.expressions.CreateArray(children, _)
        if children.forall(_.isInstanceOf[Literal]) =>
      children.map {
        case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
        case other => throw new IllegalArgumentException(
          s"$name expects literal STRINGs in the array, got $other")
      }.toArray
    case Literal(arr: org.apache.spark.sql.catalyst.util.ArrayData,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType, _)) =>
      arr.toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)
    case other => throw new IllegalArgumentException(
      s"$name expects a literal ARRAY<STRING>, got $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "misc_funcs", "1.0.0", "", "built-in")

  private def fn(name: String, usage: String, arity: Int => Boolean,
      build: Seq[Expression] => Expression):
      (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) =
    (FunctionIdentifier(name), info(name, usage), { args =>
      require(arity(args.length), s"$name: unexpected argument count ${args.length}")
      build(args)
    })

  private val functions: Seq[
      (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder)] = Seq(
    fn("rolling_hash",
      "rolling_hash(str) - 58-bit prime-field polynomial code-point hash",
      _ == 1, args => RollingHashExpr(args.head)),
    fn("lang_id",
      "lang_id(tokens) - marker-lexicon language guess ('und' when unknown)",
      _ == 1, args => LangIdExpr(args.head)),
    fn("simhash64",
      "simhash64(tokens) - Charikar 64-bit similarity signature",
      _ == 1, args => SimHash64Expr(args.head)),
    fn("word_ngrams",
      "word_ngrams(tokens[, n]) - distinct word n-grams (default trigrams)",
      n => n == 1 || n == 2,
      args => NGramsExpr(args.head,
        if (args.length == 2) intArg(args(1), "word_ngrams") else 3)),
    fn("minhash_signature",
      "minhash_signature(shingles[, k]) - k universal-hash minima (default 32)",
      n => n == 1 || n == 2,
      args => MinHashSigExpr(args.head,
        if (args.length == 2) intArg(args(1), "minhash_signature") else 32)),
    fn("dot_product",
      "dot_product(a, b) - fused left-to-right double-array dot product",
      _ == 2, args => DotProductExpr(args(0), args(1))),
    fn("nfc_normalize",
      "nfc_normalize(str) - Unicode canonical composition (NFC)",
      _ == 1, args => NfcNormalizeExpr(args.head)),
    fn("text_dhash",
      "text_dhash(str) - 64-bit content dHash (9x8 code-point grid)",
      _ == 1, args => TextDhashExpr(args.head)),
    fn("blocklist_matches",
      "blocklist_matches(str, array('p1', ...)[, normalized]) - single-pass " +
        "Aho-Corasick screen; returns the patterns present, in pattern-list " +
        "order; normalized=true folds NFC+lowercase on both sides",
      n => n == 2 || n == 3, args => BlocklistMatchesExpr(args.head,
        stringArrayArg(args(1), "blocklist_matches"),
        args.length == 3 && boolArg(args(2), "blocklist_matches"))),
    fn("blocklist_count",
      "blocklist_count(str, array('p1', ...)[, normalized]) - total greedy " +
        "non-overlapping occurrences across the pattern list, one pass; " +
        "normalized=true folds NFC+lowercase on both sides",
      n => n == 2 || n == 3, args => BlocklistCountExpr(args.head,
        stringArrayArg(args(1), "blocklist_count"),
        args.length == 3 && boolArg(args(2), "blocklist_count"))))
}
