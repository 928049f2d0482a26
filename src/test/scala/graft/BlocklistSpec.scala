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
}
