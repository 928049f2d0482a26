package graft

import graft.functions.Blocklist
import org.apache.spark.sql.functions._

/** Aho-Corasick blocklist screen: semantics pinned against the naive
  * per-pattern `contains` reference (the predicate the DuckDB oracle
  * replays as `instr`), including the overlap cases a trie-with-failure
  * implementation classically gets wrong.
  */
class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  private def viaSpark(texts: Seq[String], pats: Seq[String]): Seq[List[String]] =
    texts.toDF("text")
      .select(Blocklist.matches(col("text"), pats).as("m"))
      .collect().map(_.getSeq[String](0).toList).toSeq

  test("matched patterns in pattern-list order, each at most once") {
    val pats = Seq("ab", "bc", "abc", "zz")
    val texts = Seq("xabcx", "ab ab ab", "zzzz", "nope", "bcab", "")
    assert(viaSpark(texts, pats) ===
      texts.map(t => pats.filter(t.contains).toList))
  }

  test("property: automaton presence == naive contains (overlapping patterns, shared prefixes)") {
    val rnd = new scala.util.Random(42)
    def randStr(n: Int) = Seq.fill(n)("abc" (rnd.nextInt(3))).mkString
    // hand-picked overlap traps (nested, self-overlapping, shared-prefix,
    // pattern = suffix of another) + random fuzz
    val pats = (Seq("a", "aa", "aba", "cab", "bbb", "abcabc", "bca") ++
      Seq.fill(8)(randStr(1 + rnd.nextInt(4)))).distinct
    val texts = Seq.fill(300)(randStr(rnd.nextInt(40)))
    assert(viaSpark(texts, pats) ===
      texts.map(t => pats.filter(t.contains).toList))
  }

  test("multi-word phrases match across token boundaries; misses stay clean") {
    val pats = Seq("slow scan", "big table", "drop database")
    val texts = Seq(
      "the slow scan hit a big table today",
      "slow scans only", // "slow scan" IS a substring of "slow scans"
      "big-table is hyphenated")
    assert(viaSpark(texts, pats) === Seq(
      List("slow scan", "big table"), List("slow scan"), Nil))
  }

  test("null text yields null; non-BMP characters (surrogate pairs) match exactly") {
    val pats = Seq("café", "🎉!") // café, 🎉!
    val rows = Seq(Some("un café 🎉!"), None).toDF("text")
      .select(Blocklist.matches(col("text"), pats).as("m"))
      .collect()
    assert(rows(0).getSeq[String](0).toList === pats.toList)
    assert(rows(1).isNullAt(0))
  }

  test("countMatches = greedy leftmost non-overlapping indexOf count (replace semantics)") {
    // the naive reference every oracle uses: repeated indexOf with the
    // cursor jumping past each counted match
    def refCount(t: String, p: String): Long = {
      var c = 0L; var i = t.indexOf(p)
      while (i >= 0) { c += 1; i = t.indexOf(p, i + p.length) }
      c
    }
    val rnd = new scala.util.Random(7)
    def randStr(n: Int) = Seq.fill(n)("abc" (rnd.nextInt(3))).mkString
    // self-overlapping patterns are where greedy-vs-all-ends diverges —
    // "aa" in "aaaa" must count 2 (replace semantics), not 3 (AC ends)
    val pats = (Seq("aa", "aba", "a", "bb", "cabc") ++
      Seq.fill(6)(randStr(1 + rnd.nextInt(3)))).distinct
    val texts = Seq("aaaa", "ababab", "") ++ Seq.fill(300)(randStr(rnd.nextInt(40)))
    val got = texts.toDF("text")
      .select(Blocklist.countMatches(col("text"), pats).as("n"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === texts.map(t => pats.map(p => refCount(t, p)).sum))
  }

  test("SQL surface: blocklist_matches registered via GraftExtensions") {
    GraftExtensions.register(spark)
    val m = spark.sql(
      "SELECT blocklist_matches('a big table scan', array('big table', 'zz')) AS m")
      .head().getSeq[String](0).toList
    assert(m === List("big table"))
    val n = spark.sql(
      "SELECT blocklist_count('aa aa aa', array('aa', 'zz')) AS n")
      .head().getLong(0)
    assert(n === 3L)
  }

  test("rejects empty configuration") {
    intercept[IllegalArgumentException](Blocklist.matches(col("text"), Nil))
    intercept[IllegalArgumentException](Blocklist.matches(col("text"), Seq("ok", "")))
  }

  test("normalized mode: case + NFC fold on both sides, original patterns reported") {
    // decomposed é (e + U+0301) in the TEXT, precomposed É in the PATTERN:
    // literal matching must miss, normalized matching must hit — and the
    // reported match is the ORIGINAL pattern string, not the folded form
    val decomposed = "visit the café tomorrow"
    val pats = Seq("CAFÉ", "Big Table", "tomorrow")
    val texts = Seq(decomposed, "a BIG   table", "a big table scan", "nothing")

    assert(viaSpark(texts, pats) === Seq(List("tomorrow"), Nil, Nil, Nil),
      "literal mode must stay case/NFC sensitive")

    val got = texts.toDF("text")
      .select(Blocklist.matches(col("text"), pats, normalized = true).as("m"))
      .collect().map(_.getSeq[String](0).toList).toSeq
    assert(got === Seq(
      List("CAFÉ", "tomorrow"), // é composes, case folds; original strings out
      Nil,                      // internal whitespace is NOT collapsed
      List("Big Table"),
      Nil))
  }

  test("normalized countMatches folds once and keeps replace-arithmetic semantics") {
    // folded text "aa aa aa" — 'AA' counts 3 greedy non-overlapping hits;
    // folded self-overlap "aaaa" counts 2, not 3
    val got = Seq("Aa aA AA", "aAaA").toDF("text")
      .select(Blocklist.countMatches(col("text"), Seq("AA"), normalized = true).as("n"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(3L, 2L))
  }

  test("SQL surface: optional normalized flag") {
    GraftExtensions.register(spark)
    assert(spark.sql(
      "SELECT blocklist_matches('a BIG Table scan', array('big table'), true) AS m")
      .head().getSeq[String](0).toList === List("big table"))
    assert(spark.sql(
      "SELECT blocklist_count('AA aa', array('aa'), true) AS n")
      .head().getLong(0) === 2L)
    // flag must be a literal boolean — configuration, not data
    assertThrows[Exception](spark.sql(
      "SELECT blocklist_count('x', array('x'), length('y') > 0)").collect())
  }
}
