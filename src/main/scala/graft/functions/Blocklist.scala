package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Blocklist screening: which of a fixed phrase list appears in each
  * document — the policy-filter stage of a curation pipeline (profanity /
  * unsafe-content / license-string lists run to thousands of phrases).
  *
  * The naive plan is K `contains()` calls per row — K passes over every
  * document, and at 100 TB with a realistic K in the thousands that is the
  * dominant scan cost. This is the single-pass shape instead: the phrase
  * list compiles ONCE into an Aho-Corasick automaton (goto/fail/output
  * trie — Aho & Corasick, CACM 1975), carried into codegen as a reference
  * object like the BPE merge table ([[BpeEncodeExpr]]), and every document
  * is scanned exactly once regardless of K.
  *
  * Two matching modes, both one automaton pass per row:
  *  - literal (default): case-sensitive containment — the same predicate
  *    as `instr(text, p) > 0`, which is what the DuckDB oracle replays
  *    per pattern.
  *  - normalized: NFC + ROOT-locale lowercase applied to the patterns at
  *    automaton build and to each document at scan — how real blocklists
  *    match ("Slow Scan" must flag "slow scan", NFC "café" must flag the
  *    decomposed "café"). Matched output still reports the ORIGINAL
  *    pattern strings. Oracle shape:
  *    `instr(lower(nfc_normalize(text)), lower(nfc_normalize(p))) > 0`.
  *
  * Scale shape: no join, no shuffle, no UDF — a codegen'd per-row
  * expression evaluated inside the scan stage; the automaton (KBs) rides
  * with the plan. Output is the matched patterns in PATTERN-LIST order
  * (each at most once), so downstream `size(...)` / `get(..., 0)` give the
  * flag count and the highest-priority hit deterministically.
  */
object Blocklist {

  /** Matched patterns of `text` in pattern-list order (presence, each at
    * most once). Null text → null; empty pattern list is rejected at build
    * time (an always-empty screen is a configuration bug).
    * `normalized = true` matches case/NFC-insensitively (see class doc).
    */
  def matches(text: Column, patterns: Seq[String],
      normalized: Boolean = false): Column = {
    require(patterns.nonEmpty, "blocklist needs at least one pattern")
    require(patterns.forall(_.nonEmpty), "empty blocklist pattern")
    org.apache.spark.sql.graft.bridge.column(BlocklistMatchesExpr(
      org.apache.spark.sql.graft.bridge.expression(text), patterns.toArray,
      normalized))
  }

  /** Total OCCURRENCE count across the pattern list — greedy leftmost
    * non-overlapping per pattern (each pattern counted independently),
    * which is exactly the count `replace(text, p, '')` length arithmetic
    * yields, so the DuckDB oracle replays it with string builtins (in
    * normalized mode, over the lowered/NFC'd text and patterns). Same
    * single pass as [[matches]].
    */
  def countMatches(text: Column, patterns: Seq[String],
      normalized: Boolean = false): Column = {
    require(patterns.nonEmpty, "blocklist needs at least one pattern")
    require(patterns.forall(_.nonEmpty), "empty blocklist pattern")
    org.apache.spark.sql.graft.bridge.column(BlocklistCountExpr(
      org.apache.spark.sql.graft.bridge.expression(text), patterns.toArray,
      normalized))
  }

  /** The normalized-mode folding: NFC then ROOT-locale lowercase — the
    * composition the oracle replays as `lower(nfc_normalize(s))`.
    */
  private def fold(s: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      .toLowerCase(java.util.Locale.ROOT)

  /** Per-thread automaton memo keyed by pattern-array IDENTITY (the
    * [[Bpe.encodeWords]] cache pattern): the automaton builds once per
    * task thread per expression instance, never per row, and concurrent
    * queries with different blocklists cannot cross-read. Identity keying
    * also separates the two modes — each expression instance owns its own
    * array copy with its mode fixed at construction.
    */
  private val automata = new ThreadLocal[java.util.IdentityHashMap[AnyRef, Automaton]] {
    override def initialValue() = new java.util.IdentityHashMap()
  }
  private val MaxCachedAutomata = 8

  private def automaton(patterns: Array[String], normalized: Boolean): Automaton = {
    val cache = automata.get()
    var ac = cache.get(patterns)
    if (ac == null) {
      if (cache.size >= MaxCachedAutomata) cache.clear()
      ac = new Automaton(patterns, normalized)
      cache.put(patterns, ac)
    }
    ac
  }

  /** Static kernel behind [[BlocklistMatchesExpr]] — called from both
    * interpreted eval and generated code. Reports ORIGINAL pattern strings
    * in both modes.
    */
  def matchedPatterns(text: UTF8String, patterns: Array[String],
      normalized: Boolean): ArrayData = {
    val hit = automaton(patterns, normalized).scan(text.toString)
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef](4)
    var i = 0
    while (i < patterns.length) {
      if (hit.get(i)) out += UTF8String.fromString(patterns(i))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Static kernel behind [[BlocklistCountExpr]]. */
  def countOccurrences(text: UTF8String, patterns: Array[String],
      normalized: Boolean): Long =
    automaton(patterns, normalized).countScan(text.toString)

  /** Aho-Corasick goto/fail/output automaton over UTF-16 code units.
    * Matching on code units is exact for literal containment: a pattern
    * occurs as a char subsequence iff it occurs as a substring (surrogate
    * pairs are two fixed units like any other chars). In normalized mode
    * the trie holds the FOLDED patterns and `scan`/`countScan` fold the
    * text once up front — still one pass; positions and lengths are in the
    * folded string, matching the oracle's replace-arithmetic over
    * `lower(nfc_normalize(text))`.
    */
  private final class Automaton(patterns: Array[String], normalized: Boolean) {
    // the strings actually compiled into the trie (folded in normalized
    // mode) — countScan's start/end arithmetic must use THESE lengths
    private val keys: Array[String] =
      if (normalized) patterns.map(fold) else patterns

    private val children = scala.collection.mutable.ArrayBuffer
      .empty[java.util.HashMap[Character, Integer]]
    private val fail = scala.collection.mutable.ArrayBuffer.empty[Int]
    // pattern ids matched on REACHING each node (its own endings plus, after
    // the BFS fold below, everything its fail chain ends)
    private val out = scala.collection.mutable.ArrayBuffer.empty[java.util.BitSet]

    private def newNode(): Int = {
      children += new java.util.HashMap()
      fail += 0
      out += new java.util.BitSet(keys.length)
      children.size - 1
    }

    newNode() // root = 0
    // phase 1: trie of all patterns
    for ((p, pid) <- keys.zipWithIndex) {
      var node = 0
      var i = 0
      while (i < p.length) {
        val c = p.charAt(i)
        val nxt = children(node).get(c)
        val next = if (nxt == null) {
          val created = newNode(); children(node).put(c, created); created
        } else nxt.intValue()
        node = next
        i += 1
      }
      out(node).set(pid)
    }
    // phase 2: BFS failure links; each node's output set absorbs its fail
    // target's (already complete — BFS order), so scan() never walks the
    // fail chain to collect outputs
    private val queue = new java.util.ArrayDeque[Integer]()
    children(0).forEach { (_, child) => queue.add(child) } // depth-1 fail = 0
    while (!queue.isEmpty) {
      val node = queue.poll().intValue()
      children(node).forEach { (c, childBoxed) =>
        val child = childBoxed.intValue()
        var f = fail(node)
        while (f != 0 && !children(f).containsKey(c)) f = fail(f)
        val target = children(f).get(c)
        fail(child) = if (target != null && target.intValue() != child) target.intValue() else 0
        out(child).or(out(fail(child)))
        queue.add(childBoxed)
      }
    }

    private def input(text: String): String =
      if (normalized) fold(text) else text

    /** One pass over `text`; returns the presence bit per pattern id. */
    def scan(rawText: String): java.util.BitSet = {
      val text = input(rawText)
      val hit = new java.util.BitSet(keys.length)
      var node = 0
      var i = 0
      val n = text.length
      while (i < n) {
        val c = text.charAt(i)
        var next = children(node).get(c)
        while (next == null && node != 0) {
          node = fail(node)
          next = children(node).get(c)
        }
        if (next != null) node = next.intValue()
        hit.or(out(node))
        i += 1
      }
      hit
    }

    /** One pass over `text`; total greedy-leftmost NON-OVERLAPPING
      * occurrences across all patterns (each counted independently). A
      * match of pattern p ending at 1-based position e counts iff its
      * start exceeds p's previous counted end — the same leftmost-greedy
      * rule string `replace` applies, so `(len(t) - len(replace(t, p,
      * ''))) / len(p)` replays the per-pattern count exactly (over the
      * folded text/patterns in normalized mode).
      */
    def countScan(rawText: String): Long = {
      val text = input(rawText)
      val lastEnd = new Array[Int](keys.length)
      var total = 0L
      var node = 0
      var i = 0
      val n = text.length
      while (i < n) {
        val c = text.charAt(i)
        var next = children(node).get(c)
        while (next == null && node != 0) {
          node = fail(node)
          next = children(node).get(c)
        }
        if (next != null) node = next.intValue()
        val ending = out(node)
        var pid = ending.nextSetBit(0)
        while (pid >= 0) {
          val start = i + 2 - keys(pid).length // 1-based match start
          if (start > lastEnd(pid)) { total += 1; lastEnd(pid) = i + 1 }
          pid = ending.nextSetBit(pid + 1)
        }
        i += 1
      }
      total
    }
  }
}

/** Single-pass multi-pattern screen as a native Catalyst expression:
  * string → array<string> of the blocklist patterns present (pattern-list
  * order). The pattern list is configuration, not data — it rides into
  * codegen as a reference object ([[BpeEncodeExpr]] pattern).
  */
case class BlocklistMatchesExpr(child: Expression, patterns: Array[String],
    normalized: Boolean = false)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes() = child.dataType match {
    case StringType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"blocklist_matches needs string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    Blocklist.matchedPatterns(input.asInstanceOf[UTF8String], patterns, normalized)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("patterns", patterns, "java.lang.String[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Blocklist.matchedPatterns($c, $ref, $normalized)")
  }

  override protected def withNewChildInternal(newChild: Expression): BlocklistMatchesExpr =
    copy(child = newChild)

  override def prettyName: String = "blocklist_matches"
}

/** Total greedy-leftmost non-overlapping occurrence count across the
  * pattern list, one pass per row ([[BlocklistMatchesExpr]]'s counting
  * sibling).
  */
case class BlocklistCountExpr(child: Expression, patterns: Array[String],
    normalized: Boolean = false)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes() = child.dataType match {
    case StringType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"blocklist_count needs string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    Blocklist.countOccurrences(input.asInstanceOf[UTF8String], patterns, normalized)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("patterns", patterns, "java.lang.String[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Blocklist.countOccurrences($c, $ref, $normalized)")
  }

  override protected def withNewChildInternal(newChild: Expression): BlocklistCountExpr =
    copy(child = newChild)

  override def prettyName: String = "blocklist_count"
}
