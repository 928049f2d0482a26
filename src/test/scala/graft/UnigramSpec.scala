package graft

import graft.functions.Unigram
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer trainer (Kudo 2018): the worked EM fixture, the
  * likelihood-loss pruning rule, Viterbi apply, and local ≡ distributed
  * histogram equality — the BpeSpec discipline for the other training
  * regime.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  test("EM round matches the hand-worked forward-backward fixture") {
    // ONE word "ab" (count 1), pieces {a, b, ab} seeded at 1/3 each.
    //   forward:  α0=1, α1=P(a)=1/3, α2=α1·P(b)+α0·P(ab)=1/9+1/3=4/9
    //   expected: E[a]=E[b]=(1/9)/(4/9)=1/4, E[ab]=(1/3)/(4/9)=3/4
    //   M-step:   z=5/4 → P(a)=P(b)=1/5, P(ab)=3/5
    val vocab = Unigram.trainLocal(Seq(("ab", 1L)), vocabSize = 3,
      seedSize = 8, maxPieceLen = 2, emIters = 1)
    val m = vocab.map(v => v.piece -> v.logProb).toMap
    assert(m.keySet == Set("a", "b", "ab"))
    assert(math.abs(m("ab") - math.log(0.6)) < 1e-12,
      s"P(ab) after one EM round must be exactly 3/5, got ${math.exp(m("ab"))}")
    assert(math.abs(m("a") - math.log(0.2)) < 1e-12)
    assert(math.abs(m("b") - math.log(0.2)) < 1e-12)
    // the trained order is (logProb desc, piece asc)
    assert(vocab.head.piece == "ab")
  }

  test("pruning drops the lowest-likelihood-loss piece, never a character") {
    // "cd" outweighs "ab" 10:1 — at vocabSize 5 (4 chars + 1 multi) the
    // pruner must sacrifice "ab"
    val vocab = Unigram.trainLocal(Seq(("ab", 1L), ("cd", 10L)),
      vocabSize = 5, seedSize = 8, maxPieceLen = 2, emIters = 2,
      pruneKeep = 0.75)
    val pieces = vocab.map(_.piece).toSet
    assert(pieces.contains("cd"), "the high-count piece must survive")
    assert(!pieces.contains("ab"), "the low-loss piece must be pruned")
    assert(Set("a", "b", "c", "d").subsetOf(pieces),
      "single characters are never pruned")
    assert(vocab.size == 5)
  }

  test("viterbi apply: max-probability segmentation, deterministic ties, OOV floor") {
    val vocab = Seq(
      Unigram.VocabPiece("ab", math.log(0.6)),
      Unigram.VocabPiece("a", math.log(0.2)),
      Unigram.VocabPiece("b", math.log(0.2)))
    assert(Unigram.segmentWord("abab", vocab, maxPieceLen = 2) ==
      Seq("ab", "ab"))
    assert(Unigram.segmentWord("aba", vocab, maxPieceLen = 2) ==
      Seq("ab", "a"))
    // characters absent from the vocabulary pass through at the floor
    assert(Unigram.segmentWord("xy", vocab, maxPieceLen = 2) ==
      Seq("x", "y"))
    assert(Unigram.segmentWord("", vocab).isEmpty)
  }

  test("seedCandidates ≡ the local substring histogram; train ≡ trainLocal") {
    val docs = Seq(
      (1L, "riverbank river"),
      (2L, "river bank"),
      (3L, "bank")).toDF("doc_id", "text")
    val got = Unigram.seedCandidates(docs, maxPieceLen = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // local replay of the same relation
    val words = Seq("riverbank" -> 1L, "river" -> 2L, "bank" -> 2L)
    val want = scala.collection.mutable.HashMap.empty[String, Long]
    for ((w, c) <- words; i <- 0 until w.length;
         l <- 1 to math.min(3, w.length - i))
      want(w.substring(i, i + l)) =
        want.getOrElse(w.substring(i, i + l), 0L) + c
    assert(got == want.toMap,
      "distributed seed relation must equal the local substring histogram")
    // the distributed trainer is the local trainer over the same histogram
    val viaDf = Unigram.train(docs, vocabSize = 20, seedSize = 16,
      maxPieceLen = 3, emIters = 2)
    val viaLocal = Unigram.trainLocal(
      words.sortBy(_._1), vocabSize = 20, seedSize = 16,
      maxPieceLen = 3, emIters = 2)
    assert(viaDf == viaLocal, "train(docs) must equal trainLocal(histogram)")
  }

  test("train fails LOUDLY when the word histogram exceeds maxHistogramWords") {
    // the Bpe.learnMergesLocal discipline: the driver-side histogram
    // collect must be guarded by a named budget, not a silent OOM
    val docs = Seq((1L, "riverbank river bank")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Unigram.train(docs, vocabSize = 20, seedSize = 16,
        maxPieceLen = 3, emIters = 1, maxHistogramWords = 2L)
    }
    assert(e.getMessage.contains("maxHistogramWords"),
      s"failure must name the knob: ${e.getMessage}")
    // at the budget boundary (3 distinct words, budget 3) it trains fine
    val ok = Unigram.train(docs, vocabSize = 20, seedSize = 16,
      maxPieceLen = 3, emIters = 1, maxHistogramWords = 3L)
    assert(ok.nonEmpty)
  }

  test("native score expression: Viterbi log-prob per doc, OOV floor, matches segmentWord") {
    val vocab = Seq(
      Unigram.VocabPiece("ab", math.log(0.6)),
      Unigram.VocabPiece("a", math.log(0.2)),
      Unigram.VocabPiece("b", math.log(0.2)))
    val docs = Seq(
      (1L, "abab ab"),     // 2·ln0.6 + ln0.6
      (2L, "abx"),         // ln0.6 + floor (x is OOV)
      (3L, "")).toDF("doc_id", "text")
    val out = docs.select($"doc_id",
        Unigram.scoreTokens(
          org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.trim($"text"), "\\s+"),
          vocab).as("s"))
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(1L) - 3 * math.log(0.6)) < 1e-12)
    assert(math.abs(out(2L) - (math.log(0.6) + Unigram.OovFloor)) < 1e-3,
      s"OOV char must take the floor penalty: ${out(2L)}")
    assert(out(3L) == 0.0, "empty text scores zero")
    // the expression's max equals the score of segmentWord's argmax
    val lp = vocab.map(v => v.piece -> v.logProb).toMap
    val segScore = Unigram.segmentWord("abab", vocab, maxPieceLen = 2)
      .map(p => lp.getOrElse(p, Unigram.OovFloor)).sum
    assert(math.abs(out(1L) - (segScore + math.log(0.6))) < 1e-12,
      "expression score must equal the argmax segmentation's score")
  }

  test("vocab artifact round-trips through save/load") {
    val vocab = Unigram.trainLocal(Seq(("ab", 3L), ("cd", 2L)),
      vocabSize = 6, seedSize = 8, maxPieceLen = 2, emIters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_uni_vocab")
      .resolve("vocab").toString
    Unigram.saveVocab(spark, vocab, dir)
    assert(Unigram.loadVocab(spark, dir) == vocab)
  }
}
