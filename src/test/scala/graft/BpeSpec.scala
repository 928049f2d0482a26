package graft

import graft.functions.Bpe
import org.apache.spark.sql.functions._

/** BPE merge induction — pinned against the worked example of Sennrich et
  * al. (ACL 2016), plus determinism and encode-path properties.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the paper's histogram: low x5, lower x2, newest x6, widest x3 —
  // rendered as documents so the word-count pass is exercised too
  private def paperCorpus = Seq(
    (1L, Seq.fill(5)("low").mkString(" ")),
    (2L, Seq.fill(2)("lower").mkString(" ")),
    (3L, Seq.fill(6)("newest").mkString(" ")),
    (4L, Seq.fill(3)("widest").mkString(" ")))
    .toDF("doc_id", "text")

  test("learned merge sequence matches the Sennrich worked example") {
    val (merges, hist) = Bpe.learnMerges(paperCorpus, numMerges = 5)
    assert(merges.map(m => (m.left, m.right, m.freq)) == Seq(
      // (e,s) ties (s,t) and (t,</w>) at 9 — lexicographic left wins
      ("e", "s", 9L),
      ("es", "t", 9L),
      ("est", "</w>", 9L),
      ("l", "o", 7L),
      ("lo", "w", 7L)))
    assert(merges.map(_.rank) == Seq(0, 1, 2, 3, 4))
    val seg = hist.collect().map(w => w.word -> w.syms).toMap
    assert(seg("low") == Seq("low", "</w>"))
    assert(seg("lower") == Seq("low", "e", "r", "</w>"))
    assert(seg("newest") == Seq("n", "e", "w", "est</w>"))
    assert(seg("widest") == Seq("w", "i", "d", "est</w>"))
    hist.unpersist()
  }

  test("merge table persists and reloads rank-sorted (the tokenizer artifact)") {
    val (merges, hist) = Bpe.learnMerges(paperCorpus, numMerges = 5)
    hist.unpersist()
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_artifact").toString
    Bpe.saveMerges(spark, merges, dir)
    val back = Bpe.loadMerges(spark, dir)
    assert(back === merges, "artifact round-trip must be lossless and rank-sorted")
    // the reloaded table drives encode identically to the in-memory one
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val enc = Seq("lowest").toDF("w")
      .select(Bpe.encode(split(col("w"), " "), back).as("sub"))
      .head().getSeq[String](0)
    assert(enc === Seq("low", "est</w>"))
  }

  test("pair frequencies: exact corpus counts with end marker") {
    val pf = Bpe.pairFrequencies(Bpe.wordHistogram(paperCorpus))
      .as[(String, String, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    // 'e','s' appears in newest (x6) and widest (x3) = 9; 's','t' same;
    // 'w','</w>' only in low x5
    assert(pf(("e", "s")) == 9L)
    assert(pf(("s", "t")) == 9L)
    assert(pf(("w", Bpe.EndMarker)) == 5L)
    // 'l','o' in low x5 and lower x2 = 7
    assert(pf(("l", "o")) == 7L)
  }

  test("merge application is greedy left-to-right and non-overlapping") {
    assert(Bpe.applyMerge(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(Bpe.applyMerge(Seq("a", "b", "a", "b"), "a", "b") == Seq("ab", "ab"))
    assert(Bpe.applyMerge(Seq("x"), "a", "b") == Seq("x"))
    // segmentWord replays the learned sequence on unseen words
    val merges = Seq(Bpe.Merge(0, "e", "s", 9L), Bpe.Merge(1, "es", "t", 9L))
    assert(Bpe.segmentWord("best", merges) ==
      Seq("b", "est", "</w>"))
  }

  test("min pair frequency stops induction before singleton noise") {
    val (merges, hist) = Bpe.learnMerges(
      Seq((1L, "aa aa zq")).toDF("doc_id", "text"),
      numMerges = 10, minPairFreq = 2L)
    // (a,a) freq 2 and (a,</w>) freq 2 merge-chain; the zq tail (freq 1)
    // must never generate a merge
    assert(merges.nonEmpty)
    assert(merges.forall(_.freq >= 2L))
    assert(!merges.exists(m => m.left.contains("z") || m.right.contains("q")))
    hist.unpersist()
  }

  test("token counts: vocabulary words use learned segmentation, OOV falls back") {
    val (_, hist) = Bpe.learnMerges(paperCorpus, numMerges = 5)
    val fresh = Seq(
      (10L, "low lower newest"),
      (11L, "zebra")) // OOV: 5 chars + 1 = 6
      .toDF("doc_id", "text")
    val out = Bpe.tokenCounts(fresh, hist)
      .orderBy("doc_id").as[(Long, Long)].collect().toMap
    // low → 2 syms, lower → 4, newest → 4
    assert(out(10L) == 10L)
    assert(out(11L) == 6L)
    hist.unpersist()
  }

  test("encode expression: segmentWord parity per word, codegen ≡ interpreted, empty words drop") {
    val merges = Seq(
      Bpe.Merge(0, "l", "o", 0L),
      Bpe.Merge(1, "lo", "w", 0L),
      Bpe.Merge(2, "e", "s", 0L))
    val out = Seq((1L, Seq("low", "lowest", "", "we")))
      .toDF("doc_id", "toks")
      .select($"doc_id", Bpe.encode($"toks", merges).as("sub"))
      .as[(Long, Seq[String])].collect().head._2
    val expected = Seq("low", "lowest", "we")
      .flatMap(w => Bpe.segmentWord(w, merges))
    assert(out == expected, s"$out vs $expected")
    assert(out == Seq("low", "</w>", "low", "es", "t", "</w>", "w", "e", "</w>"))
    // interpreted eval agrees with the codegen path
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val direct = Bpe.encodeWords(
      ArrayData.toArrayData(Array(UTF8String.fromString("lowest"))),
      merges.map(m => Array(m.left, m.right)).toArray, byteLevel = false)
    assert((0 until direct.numElements())
      .map(i => direct.getUTF8String(i).toString) ==
      Seq("low", "es", "t", "</w>"))
    // trained-table roundtrip: encode length ≡ tokenCounts for in-vocab text
    val (learned, hist) = Bpe.learnMerges(paperCorpus, numMerges = 5)
    val doc = Seq((1L, "low lower newest")).toDF("doc_id", "text")
    val viaExpr = doc.select(size(Bpe.encode(
        graft.functions.TextAnalysis.tokens($"text"), learned)).cast("long"))
      .as[Long].head()
    val viaVocab = Bpe.tokenCounts(doc, hist).as[(Long, Long)].head()._2
    assert(viaExpr == viaVocab, "expression and vocabulary-join paths must agree")
    hist.unpersist()
  }

  test("local trainer == distributed trainer (q_text_bpe_encode's config path)") {
    // q_text_bpe_encode embeds graft.oracles.PipelineOracles.bpeMerges (learned driver-side,
    // no SparkSession) as shared literals in both engines; this pins the
    // local trainer to the distributed one on the exact seed corpus, so
    // the embedded config can never drift from what learnMerges would say.
    val seedDf = graft.oracles.PipelineOracles.bpeSeedCorpus.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val (dist, hist) = Bpe.learnMerges(seedDf, numMerges = 32)
    assert(graft.oracles.PipelineOracles.bpeMerges == dist,
      "learnMergesLocal diverged from learnMerges on the seed corpus")
    assert(graft.oracles.PipelineOracles.bpeMerges.nonEmpty)
    // the config actually compresses corpus-register words
    assert(Bpe.segmentWord("customer", graft.oracles.PipelineOracles.bpeMerges).length <
      "customer".length + 1)
    // non-ASCII seeds are rejected (argmax tie-break order would diverge)
    intercept[IllegalArgumentException] {
      Bpe.learnMergesLocal(Seq("café"), 1)
    }
    hist.unpersist()
  }

  test("byte-level mode: zero-OOV round-trip on non-BMP fixtures; local == distributed") {
    import graft.functions.Bpe
    // the byte alphabet covers all 256 values with BMP printables
    assert(Bpe.byteSymbols.length == 256)
    assert(Bpe.byteSymbols.distinct.length == 256, "byte symbols must be distinct")
    assert(Bpe.byteSymbols.forall(s => s.length == 1 && !s.charAt(0).isWhitespace),
      "every byte symbol is one printable BMP char")
    assert(Bpe.byteSymbols(104) == "h", "printable ASCII maps to itself")

    // round-trip: encode -> decode is the identity for ANY input word —
    // ASCII, accented Latin (2-byte UTF-8), CJK (3-byte), non-BMP emoji
    // (4-byte) — under an arbitrary trained merge table (merges only
    // concatenate symbols; bytes are never lost)
    val merges = graft.oracles.PipelineOracles.bpeBytesMerges
    assert(merges.nonEmpty)
    for (w <- Seq("data", "café", "naïve", "日本語", "🎉data", "a🚀b", "ß"))
      assert(Bpe.decodeBytes(Bpe.segmentWord(w, merges, byteLevel = true)) == w,
        s"byte-level round-trip must be identity for '$w'")
    // multi-byte merges were actually learned from the non-ASCII seed
    // repeats (merge symbols containing non-ASCII byte chars — the
    // continuation bytes of UTF-8 sequences)
    assert(merges.exists(m => (m.left + m.right).exists(_ > 0x7f.toChar)),
      "seed repeats must induce merges over multi-byte-sequence symbols")

    // zero-OOV: a word sharing nothing with the seed still encodes (into
    // its byte singletons + end marker) and round-trips
    val oov = "Ωμέγα"
    val seg = Bpe.segmentWord(oov, merges, byteLevel = true)
    assert(Bpe.decodeBytes(seg) == oov)

    // local trainer == distributed trainer in byte mode on the NON-ASCII
    // seed (allowed: the byte alphabet is BMP, where Java and UTF-8
    // orders agree — the char-level ASCII restriction does not apply)
    val seedDf = graft.oracles.PipelineOracles.bpeBytesSeedCorpus.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val (dist, hist) = Bpe.learnMerges(seedDf, numMerges = 40, byteLevel = true)
    assert(graft.oracles.PipelineOracles.bpeBytesMerges == dist,
      "byte-level learnMergesLocal diverged from learnMerges on the seed")
    hist.unpersist()

    // native expression == driver-side reference per word
    val doc = Seq((1L, "naïve 🎉data unseen")).toDF("doc_id", "text")
    val viaExpr = doc.select(Bpe.encode(
        graft.functions.TextAnalysis.tokens($"text"), merges,
        byteLevel = true)).as[Seq[String]].head()
    val viaRef = Seq("naïve", "🎉data", "unseen")
      .flatMap(w => Bpe.segmentWord(w, merges, byteLevel = true))
    assert(viaExpr == viaRef, s"expression $viaExpr != reference $viaRef")
  }

  test("byte-level round-trip survives literal '</w>' content (HTML-ish " +
      "corpora): the end marker is out-of-band") {
    // merges learned on repeated "</w>"-bearing words assemble
    // content-derived "</w>" INSIDE symbols; a substring-strip decode
    // would silently drop those four bytes
    val merges = Bpe.learnMergesLocal(
      Seq.fill(6)("</w> a</w>b x</w> </w> html</w>tag").map(identity),
      numMerges = 24, byteLevel = true)
    assert(merges.nonEmpty)
    for (w <- Seq("</w>", "a</w>b", "x</w>", "html</w>tag", "pre</w>post",
        "</w></w>", "café</w>")) {
      val seg = Bpe.segmentWord(w, merges, byteLevel = true)
      assert(Bpe.decodeBytes(seg) == w,
        s"round-trip must be identity for '$w' (got " +
          s"'${Bpe.decodeBytes(seg)}' via $seg)")
    }
    // a content-derived "</w>" really did land inside a learned symbol
    // (else this test exercises nothing)
    val assembled = Seq("</w>", "a</w>b", "x</w>").exists { w =>
      Bpe.segmentWord(w, merges, byteLevel = true)
        .exists(s => s.stripSuffix(Bpe.ByteEndMarker).contains("</w>"))
    }
    assert(assembled, "fixture must assemble a content '</w>' in a symbol")
    // the marker char itself can never be CONTENT: it is outside the
    // byte alphabet, so no input word can introduce it
    assert(!Bpe.byteSymbols.contains(Bpe.ByteEndMarker))
  }

  test("non-BMP characters segment by code point, never by UTF-16 unit") {
    // U+1F600 (😀) is a surrogate pair in UTF-16; a code-unit split would
    // produce two unpaired-surrogate symbols (malformed strings that also
    // diverge from DuckDB's string_split(word, ''), which splits code
    // points). U+20BB7 (𠮷, CJK-Ext-B) likewise.
    val word = "a😀b𠮷" // a😀b𠮷
    assert(Bpe.initialSyms(word) ==
      Seq("a", "😀", "b", "𠮷", Bpe.EndMarker))
    // driver-side encoder and native expression agree on the alphabet
    assert(Bpe.segmentWord(word, Nil) == Bpe.initialSyms(word))
    val out = Seq((1L, Seq(word))).toDF("doc_id", "toks")
      .select(Bpe.encode($"toks", Nil).as("sub"))
      .as[Seq[String]].collect().head
    assert(out == Bpe.initialSyms(word))
    // merges learned over non-BMP symbols are whole code points
    val corpus = Seq((1L, "😀😀😀 😀😀😀"))
      .toDF("doc_id", "text")
    val (learned, hist) = Bpe.learnMerges(corpus, numMerges = 1, minPairFreq = 1L)
    assert(learned.head.left == "😀" &&
      learned.head.right == "😀",
      s"merge symbols must be whole code points, got ${learned.head}")
    hist.unpersist()
  }

  test("wordpiece training: likelihood ratio picks the rarer-parts pair over the raw-frequency winner") {
    import graft.functions.WordPiece
    // "th" appears 4×, but t and h are everywhere (the+that+tha...);
    // "qz" appears 3× and q/z appear NOWHERE else: ratio 3/(3·3) = 1/3
    // beats 4/(f(t)·f(h)) by orders of magnitude. Raw-frequency BPE
    // would fuse (t, ##h) first; WordPiece must fuse (q, ##z) first.
    val seed = Seq(
      "the the that that qz qz qz",
      "tat hat hah tah")
    val vocab = WordPiece.learnVocabLocal(seed, numMerges = 1,
      minPairFreq = 2L)
    assert(vocab.contains("qz"), s"expected the likelihood winner qz in $vocab")
    assert(!vocab.exists(v => v == "th" || v == "ha" || v == "ta"),
      s"a raw-frequency pair got fused first: $vocab")
    // and the BPE trainer on the same corpus picks a raw-frequency
    // winner (the (a,t) pair at freq 4 — lexicographic first of the
    // freq-4 tie set), pinning that the two regimes genuinely differ
    val bpeFirst = Bpe.learnMergesLocal(seed, numMerges = 1)
    assert((bpeFirst.head.left, bpeFirst.head.right) != ("q", "z"),
      "BPE must not pick the likelihood winner on this corpus")
    assert(bpeFirst.head.freq == 4L)
  }

  test("wordpiece apply: greedy longest match, ## continuations, [UNK], expression ≡ driver") {
    import graft.functions.WordPiece
    val vocab = Seq("a", "b", "x", "##a", "##b", "ab", "##ab", "##bb")
    // greedy: 'abab' -> ab ##ab (longest first), 'abbb' -> ab ##bb,
    // 'ba' -> b ##a, 'axb' -> [UNK] ('x' has no ## form)
    assert(WordPiece.segmentWord("abab", vocab) == Seq("ab", "##ab"))
    assert(WordPiece.segmentWord("abbb", vocab) == Seq("ab", "##bb"))
    assert(WordPiece.segmentWord("ba", vocab) == Seq("b", "##a"))
    assert(WordPiece.segmentWord("axb", vocab) == Seq(WordPiece.Unk))
    assert(WordPiece.segmentWord("xa", vocab) == Seq("x", "##a"))
    // the native expression agrees with the driver reference word for word
    val words = Seq("abab", "abbb", "ba", "axb", "xa", "ab")
    val viaExpr = Seq((1L, words)).toDF("doc_id", "toks")
      .select(WordPiece.encode($"toks", vocab).as("sub"))
      .as[Seq[String]].collect().head
    assert(viaExpr == words.flatMap(w => WordPiece.segmentWord(w, vocab)))
    // determinism: training twice yields the identical vocabulary
    val seed = Seq("scan the table", "scan the row", "the scan the scan")
    assert(WordPiece.learnVocabLocal(seed, 8) ==
      WordPiece.learnVocabLocal(seed, 8))
    // artifact round-trip (the saveMerges deployment shape): order and
    // content survive, and the loaded vocabulary segments identically
    val trained = WordPiece.learnVocabLocal(seed, 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_wp_vocab")
    WordPiece.saveVocab(spark, trained, dir.toString)
    val loaded = WordPiece.loadVocab(spark, dir.toString)
    assert(loaded == trained)
    assert(words.flatMap(w => WordPiece.segmentWord(w, loaded)) ==
      words.flatMap(w => WordPiece.segmentWord(w, trained)))
  }

  test("wordpiece training: Unicode-general seed — whole codepoints, UTF-8 tie-break, deterministic") {
    import graft.functions.WordPiece
    // non-BMP input seeds whole codepoints, never split surrogate halves
    assert(WordPiece.initialSyms("😀a") == Seq("😀", "##a"))
    assert(WordPiece.initialSyms("über") == Seq("ü", "##b", "##e", "##r"))
    // tie-break is UTF-8 binary (codepoint) order, NOT Java's UTF-16
    // code-unit order: 'ｚ' (U+FF5A) < '😀' (U+1F600) by codepoint, but a
    // UTF-16 comparison ranks the surrogate pair LOWER (0xD83D < 0xFF5A).
    // Both candidate pairs tie exactly (freq 2, all symbol freqs 2), so
    // the fused winner reveals which order the trainer uses — and it must
    // match what a DuckDB / byte-order replay of training would pick.
    val tieSeed = Seq("ｚｚ ｚｚ 😀😀 😀😀")
    val tieVocab = WordPiece.learnVocabLocal(tieSeed, numMerges = 1,
      minPairFreq = 2L)
    assert(tieVocab.contains("ｚｚ"),
      s"UTF-8 tie-break must fuse the smaller codepoint pair first: $tieVocab")
    assert(!tieVocab.contains("😀😀"),
      s"UTF-16 code-unit order leaked into the tie-break: $tieVocab")
    // multilingual seed: deterministic training, likelihood ordering still
    // favors rarer-parts pairs, and apply round-trips through the native
    // expression (the former ASCII-only require threw on all of this)
    val seed = Seq(
      "der Ofen der Ölofen Öl Öl Öl",
      "schön schön grün grün füße füße")
    val v1 = WordPiece.learnVocabLocal(seed, 6)
    val v2 = WordPiece.learnVocabLocal(seed, 6)
    assert(v1 == v2, "non-ASCII training must be deterministic")
    val wordsU = Seq("ｚｚ😀", "über", "schön", "Öl")
    val viaExpr = Seq((1L, wordsU)).toDF("doc_id", "toks")
      .select(WordPiece.encode($"toks", v1 ++ tieVocab).as("sub"))
      .as[Seq[String]].collect().head
    assert(viaExpr ==
      wordsU.flatMap(w => WordPiece.segmentWord(w, v1 ++ tieVocab)),
      "expression and driver reference must agree on non-ASCII input")
    // greedy matching never tiles across a broken surrogate: a word whose
    // only cover would require splitting 😀 in half is [UNK], not garbage
    assert(WordPiece.segmentWord("😀", Seq("a")) == Seq(WordPiece.Unk))
  }
}
