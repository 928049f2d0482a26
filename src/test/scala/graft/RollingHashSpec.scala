package graft

import graft.functions.{RollingHash, RollingHashExpr, TextAnalysis}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.unsafe.types.UTF8String

/** Pins the RollingHash fingerprint to known values so any change to the
  * hash (algorithm, modulus, code-point walk) fails loudly — the r3 swap
  * from xxhash64 changed every emitted fingerprint with no test noticing.
  * Expected values independently recomputed ((h*31+cp) mod 2^58-27 over
  * unicode code points), matching the DuckDB oracle's list_reduce replay.
  */
class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  private val pinned = Seq(
    "" -> 0L,
    "abc" -> 96354L,
    "hello world" -> 88006926820958916L,
    // U+1F600 (supplementary plane): one code point, not two UTF-16 chars
    "a😀b" -> 4077187L,
    "The  Quick\tBrown " -> 32154026783392889L)

  test("compute matches pinned reference values (incl. supplementary plane)") {
    pinned.foreach { case (s, expected) =>
      assert(RollingHash.compute(UTF8String.fromString(s)) == expected, s"for '$s'")
    }
  }

  test("interpreted eval and codegen path agree") {
    val viaDf = pinned.map(_._1).toDF("text")
      .select(RollingHash.rollingHash($"text").as("h"))
      .as[Long].collect().toSeq
    val viaEval = pinned.map { case (s, _) =>
      RollingHashExpr(Literal(UTF8String.fromString(s),
        org.apache.spark.sql.types.StringType)).eval(null).asInstanceOf[Long]
    }
    assert(viaDf == viaEval && viaDf == pinned.map(_._2))
  }

  test("windowHashes: one rolled hash per window, equal to a direct " +
      "per-window fold, multi-byte included; short text -> empty") {
    // direct reference: mod-2^64 polynomial of each window's code points
    def ref(s: String, w: Int): Seq[Long] = {
      val cps = s.codePoints().toArray
      if (cps.length < w) Seq.empty
      else (0 to cps.length - w).map { p =>
        var h = 0L
        (p until p + w).foreach(i => h = h * 31L + cps(i))
        h
      }
    }
    for (s <- Seq("abcabcabcd", "naïve café über 🎉 piñata data",
        "aaaaaaaaaa", "short"); w <- Seq(2, 4, 7)) {
      val viaDf = Seq(s).toDF("text")
        .select(RollingHash.windowHashesCol($"text", w).as("hs"))
        .as[Seq[Long]].head()
      assert(viaDf == ref(s, w), s"windowHashes('$s', $w)")
    }
    assert(Seq("ab").toDF("text")
      .select(RollingHash.windowHashesCol($"text", 7).as("hs"))
      .as[Seq[Long]].head().isEmpty)
  }

  test("substringDedup: keep-first span removal at any offset; overlaps " +
      "merge; full-duplicate doc empties; untouched docs pass through") {
    import graft.functions.Dedup
    // doc 1 holds the canonical passage; doc 2 repeats it mid-text (an
    // offset no chunk/line boundary aligns with); doc 3 IS the passage;
    // doc 4 shares nothing. W=10, passage length 20 -> 11 duplicate
    // windows per copy merging into ONE 20-char span.
    val passage = "ABCDEFGHIJKLMNOPQRST"
    val docs = Seq(
      (1L, s"the head $passage the tail"),
      (2L, s"xx $passage and more words here"),
      (3L, passage),
      (4L, "совершенно unrelated text body"))
      .toDF("doc_id", "text")
    val out = Dedup.substringDedup(docs, windowLen = 10)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSeq
    // doc 1: first occurrence by (doc_id, pos) -> untouched
    assert(out(0) == ((1L, 38L, 0L, 0L, s"the head $passage the tail")))
    // doc 2: the repeat excised as ONE merged span — and the maximal
    // repeat is 22 chars, both flanking spaces included (doc 1 also has
    // space-passage-space), which no boundary-aligned dedup would see
    assert(out(1) == ((2L, 43L, 1L, 22L, "xxand more words here")))
    // doc 3: entirely a later duplicate -> '' (never NULL/passthrough)
    assert(out(2) == ((3L, 20L, 1L, 20L, "")))
    // doc 4: no repeats -> passthrough (multi-byte text, code-point math)
    assert(out(3) == ((4L, 30L, 0L, 0L, "совершенно unrelated text body")))
  }

  test("substringScrub: benchmark text excised wherever it appears (all " +
      "copies, any offset); benchmark-free docs pass through") {
    import graft.functions.Dedup
    val evalq = "WHATISTHECAPITALOFFRANCE" // 24 chars, W=10
    val corpus = Seq(
      (1L, s"intro $evalq outro"),            // one copy
      (2L, s"a $evalq b $evalq c"),           // two copies, BOTH go
      (3L, "nothing shared with the benchmark here"),
      (4L, evalq))                            // doc IS the eval item
      .toDF("doc_id", "text")
    // bench flanks the item with NON-space chars, so the maximal shared
    // substring is exactly the 24-char eval text (the windowHashes spec
    // above already pins flank-inclusive sharing)
    val bench = Seq((900L, s"Q:${evalq}A: Paris"))
      .toDF("bench_id", "text")
    val out = Dedup.substringScrub(corpus, bench, windowLen = 10)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getString(4)))
      .toSeq
    assert(out(0) == ((1L, 1L, 24L, "intro  outro")))
    assert(out(1) == ((2L, 2L, 48L, "a  b  c")),
      "EVERY copy is excised — no keep-first in decontamination")
    assert(out(2) == ((3L, 0L, 0L, "nothing shared with the benchmark here")))
    assert(out(3) == ((4L, 1L, 24L, "")))
  }

  test("fingerprint = hash of trim/collapse/lower normalization; null propagates") {
    val out = Seq((1L, "The  Quick\tBrown "), (2L, null: String))
      .toDF("doc_id", "text")
      .select($"doc_id", TextAnalysis.fingerprint($"text").as("fp"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(out(1L).contains(21128203578335326L))
    assert(out(2L).isEmpty, "null text must yield null fingerprint (documented contract)")
  }
}
