package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** UNIGRAM-LM tokenizer induction (Kudo 2018; SentencePiece's other
  * production training regime, beside [[Bpe]]'s merge induction): start
  * from a large seed vocabulary of frequent substrings, fit piece
  * probabilities by EM over every possible segmentation of every word,
  * then PRUNE the pieces whose removal costs the corpus likelihood
  * least, until the target vocabulary size — the opposite direction of
  * BPE's bottom-up merging, and the regime that gives every word a
  * probabilistic segmentation instead of a single greedy one.
  *
  * Scale discipline (the [[Bpe.learnMergesLocal]] contract): the corpus
  * is touched ONCE for the exact word histogram (token-keyed aggregate,
  * Zipf-bounded distinct words); seeding, EM, and pruning then run
  * driver-side over that bounded histogram. The corpus-scale input
  * relation — substring candidate frequencies over the histogram — is
  * exposed as [[seedCandidates]] and oracle-gated by
  * q_text_unigram_vocab exactly as q_text_bpe_pairs gates the BPE
  * trainer's pair relation; the EM arithmetic itself is pinned by a
  * worked fixture in UnigramSpec (cross-engine float replay of an EM
  * loop is not a meaningful oracle).
  *
  * Reference behavior: `backend` has no tokenizer surface — this module
  * is part of the LLM-pipeline brief (tokenizer training beside BPE).
  */
object Unigram {

  /** One vocabulary entry of a trained unigram LM: the piece and its
    * natural-log probability under the final M-step.
    */
  final case class VocabPiece(piece: String, logProb: Double)

  /** The one corpus-scale touch: frequencies of every substring of
    * length 1..`maxPieceLen` of every word, weighted by the word's exact
    * corpus count — the seed-candidate relation the trainer prunes from.
    * Pure scan-side expression work (tokens → word histogram → substring
    * explode → piece-keyed aggregate): cost is histogram words ×
    * O(len·maxPieceLen) pieces, never corpus-squared, and the piece key
    * is the only shuffle currency. Output: (piece, freq).
    */
  def seedCandidates(docs: DataFrame, maxPieceLen: Int = 4,
      textCol: String = "text"): DataFrame = {
    require(maxPieceLen >= 1, "maxPieceLen must be at least 1")
    docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .select(explode(expr(
        s"""flatten(transform(sequence(1, length(word)), i ->
           |  transform(sequence(1, least($maxPieceLen, length(word) - i + 1)),
           |    l -> substring(word, i, l))))""".stripMargin)).as("piece"),
        col("cnt"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("freq"))
  }

  /** Train a unigram-LM vocabulary over a corpus: ONE corpus scan for the
    * word histogram (collected driver-side in (word asc) order — the
    * deterministic [[Bpe.learnMerges]] discipline), then [[trainLocal]].
    * `maxHistogramWords` is the loud driver-heap bound — the same
    * contract as [[Bpe.learnMergesLocal]]: the histogram is
    * Heaps-bounded (~corpus^0.5 distinct words) but at 100 TB that is
    * ~10^8 rows, and an unbounded collect would be a silent driver OOM
    * instead of a documented failure with a named knob.
    */
  def train(docs: DataFrame, vocabSize: Int, seedSize: Int = 512,
      maxPieceLen: Int = 4, emIters: Int = 2, pruneKeep: Double = 0.75,
      textCol: String = "text",
      maxHistogramWords: Long = 20000000L): Seq[VocabPiece] = {
    val histDf = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .persist() // count + collect share one corpus scan
    try {
      val nWords = histDf.count()
      require(nWords <= maxHistogramWords,
        s"word histogram has $nWords distinct words > budget " +
          s"$maxHistogramWords — raise maxHistogramWords (driver heap " +
          "permitting) or pre-filter the corpus")
      val hist = histDf
        .orderBy("word")
        .collect()
        .map(r => (r.getString(0), r.getLong(1)))
        .toSeq
      trainLocal(hist, vocabSize, seedSize, maxPieceLen, emIters, pruneKeep)
    } finally { histDf.unpersist(); () }
  }

  /** The driver-local trainer over a bounded (word, count) histogram —
    * deterministic: no RNG, fixed iteration counts, total orders on
    * every cut.
    *
    *  1. SEED: all single characters (never pruned — full coverage is an
    *     invariant) plus the `seedSize` most frequent multi-character
    *     substrings of length ≤ `maxPieceLen` (freq desc, piece asc).
    *  2. EM (`emIters` rounds per phase): E-step computes each piece's
    *     EXPECTED count over every segmentation of every word by
    *     forward–backward over the word lattice (exact for a unigram
    *     model — not the Viterbi-only hard-EM shortcut); M-step
    *     renormalizes expected counts into probabilities.
    *  3. PRUNE: for each multi-char piece, the likelihood loss of
    *     removing it = Σ_w count_w·(LL_w − LL_w without the piece),
    *     recomputed only over words containing the piece; drop the
    *     lowest-loss pieces, keeping `pruneKeep` of the survivors per
    *     round (never below `vocabSize`), re-fit, repeat until the
    *     vocabulary reaches `vocabSize`.
    *
    * Returns (piece, ln prob) sorted (logProb desc, piece asc).
    */
  def trainLocal(words: Seq[(String, Long)], vocabSize: Int,
      seedSize: Int = 512, maxPieceLen: Int = 4, emIters: Int = 2,
      pruneKeep: Double = 0.75): Seq[VocabPiece] = {
    require(vocabSize >= 1, "vocabSize must be positive")
    require(pruneKeep > 0.0 && pruneKeep < 1.0, "pruneKeep must be in (0,1)")
    require(words.nonEmpty, "empty word histogram")

    // seed: weighted substring frequencies (the seedCandidates relation,
    // replayed locally)
    val subFreq = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    for ((w, c) <- words; i <- 0 until w.length;
         l <- 1 to math.min(maxPieceLen, w.length - i)) {
      val p = w.substring(i, i + l)
      subFreq(p) = subFreq.getOrElse(p, 0L) + c
    }
    val chars = subFreq.keysIterator.filter(_.length == 1).toSeq.sorted
    val multiSeed = subFreq.iterator.filter(_._1.length > 1).toSeq
      .sortBy { case (p, f) => (-f, p) }
      .take(seedSize).map(_._1)
    require(vocabSize >= chars.size,
      s"vocabSize $vocabSize below the ${chars.size}-char alphabet — " +
        "single characters are never pruned")

    var vocab: Map[String, Double] = {
      val seed = chars ++ multiSeed
      val tot = seed.iterator.map(subFreq(_)).sum.toDouble
      seed.iterator.map(p => p -> subFreq(p) / tot).toMap
    }

    // forward pass: alpha(j) = marginal probability of c[0..j); skipping
    // `skip` replays the lattice without one piece (the pruning loss)
    def forward(w: String, probs: Map[String, Double],
        skip: String): Array[Double] = {
      val n = w.length
      val alpha = new Array[Double](n + 1)
      alpha(0) = 1.0
      var j = 1
      while (j <= n) {
        var l = 1; var acc = 0.0
        while (l <= maxPieceLen && l <= j) {
          val p = w.substring(j - l, j)
          if (p != skip) {
            val pr = probs.getOrElse(p, 0.0)
            if (pr > 0.0) acc += alpha(j - l) * pr
          }
          l += 1
        }
        alpha(j) = acc
        j += 1
      }
      alpha
    }

    def emRound(probs: Map[String, Double]): Map[String, Double] = {
      val expect = scala.collection.mutable.HashMap.empty[String, Double]
      for ((w, c) <- words) {
        val n = w.length
        val alpha = forward(w, probs, skip = null)
        if (alpha(n) > 0.0) {
          // backward: beta(j) = marginal probability of c[j..n)
          val beta = new Array[Double](n + 1)
          beta(n) = 1.0
          var j = n - 1
          while (j >= 0) {
            var l = 1; var acc = 0.0
            while (l <= maxPieceLen && j + l <= n) {
              val pr = probs.getOrElse(w.substring(j, j + l), 0.0)
              if (pr > 0.0) acc += pr * beta(j + l)
              l += 1
            }
            beta(j) = acc
            j -= 1
          }
          // expected count of the piece spanning [i, i+l):
          // alpha(i)·P(p)·beta(i+l) / alpha(n), weighted by corpus count
          var i = 0
          while (i < n) {
            var l = 1
            while (l <= maxPieceLen && i + l <= n) {
              val p = w.substring(i, i + l)
              val pr = probs.getOrElse(p, 0.0)
              if (pr > 0.0) {
                val e = alpha(i) * pr * beta(i + l) / alpha(n) * c
                if (e > 0.0) expect(p) = expect.getOrElse(p, 0.0) + e
              }
              l += 1
            }
            i += 1
          }
        }
      }
      val tot = expect.valuesIterator.sum
      // pieces with zero expectation drop out of the model here — but
      // single chars are re-floored so coverage never breaks
      val floored = chars.iterator.map(ch =>
        ch -> math.max(expect.getOrElse(ch, 0.0), 1e-12)).toMap
      val multis = expect.iterator
        .filter { case (p, e) => p.length > 1 && e > 0.0 }.toMap
      val z = floored.valuesIterator.sum + multis.valuesIterator.sum
      (floored ++ multis).map { case (p, e) => p -> e / z }
    }

    def fit(probs: Map[String, Double]): Map[String, Double] =
      (1 to emIters).foldLeft(probs)((p, _) => emRound(p))

    vocab = fit(vocab)
    var multiCount = vocab.keysIterator.count(_.length > 1)
    while (chars.size + multiCount > vocabSize && multiCount > 0) {
      // pruning loss per multi-char piece over the words containing it
      val losses = vocab.keysIterator.filter(_.length > 1).map { p =>
        var loss = 0.0
        for ((w, c) <- words if w.contains(p)) {
          val withP = forward(w, vocab, skip = null).last
          val without = forward(w, vocab, skip = p).last
          if (withP > 0.0)
            loss += c * (math.log(withP) -
              (if (without > 0.0) math.log(without) else math.log(1e-300)))
        }
        (p, loss)
      }.toSeq.sortBy { case (p, l) => (-l, p) }
      // keep pruneKeep of the multis, never below the target, and always
      // at least one fewer than now (strict progress → termination)
      val target = vocabSize - chars.size
      val keepN = math.max(target, math.min(multiCount - 1,
        math.floor(multiCount * pruneKeep).toInt))
      val kept = losses.take(keepN).map(_._1).toSet
      vocab = vocab.filter { case (p, _) => p.length == 1 || kept(p) }
      val z = vocab.valuesIterator.sum
      vocab = vocab.map { case (p, pr) => p -> pr / z }
      vocab = fit(vocab)
      multiCount = vocab.keysIterator.count(_.length > 1)
    }
    vocab.iterator
      .map { case (p, pr) => VocabPiece(p, math.log(pr)) }
      .toSeq.sortBy(v => (-v.logProb, v.piece))
  }

  /** Viterbi segmentation of one word under a trained vocabulary: the
    * max-probability piece sequence (ties: fewer pieces, then the
    * lexicographically smallest final piece — total, deterministic).
    * Characters absent from the vocabulary (apply-time OOV) pass through
    * as single-char pieces at a floor score, so segmentation never
    * fails. The tokenizer-APPLY primitive for the unigram regime.
    */
  def segmentWord(word: String, vocab: Seq[VocabPiece],
      maxPieceLen: Int = 4): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    val lp = vocab.iterator.map(v => v.piece -> v.logProb).toMap
    val floor = -1e9
    val lmax = math.max(maxPieceLen,
      if (vocab.isEmpty) 1 else vocab.iterator.map(_.piece.length).max)
    val n = word.length
    // (score, pieceCount, piece) per boundary; -1 length = unreached
    val best = Array.fill(n + 1)((Double.NegativeInfinity, Int.MaxValue, ""))
    best(0) = (0.0, 0, "")
    for (j <- 1 to n) {
      var l = 1
      while (l <= lmax && l <= j) {
        val p = word.substring(j - l, j)
        val s = lp.get(p) match {
          case Some(v) => Some(v)
          case None if l == 1 => Some(floor)
          case None => None
        }
        s.foreach { v =>
          val cand = (best(j - l)._1 + v, best(j - l)._2 + 1, p)
          val cur = best(j)
          val better = cand._1 > cur._1 ||
            (cand._1 == cur._1 && (cand._2 < cur._2 ||
              (cand._2 == cur._2 && cand._3 < cur._3)))
          if (better) best(j) = cand
        }
        l += 1
      }
    }
    // reconstruct right-to-left
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var j = n
    while (j > 0) {
      val p = best(j)._3
      out.prepend(p)
      j -= p.length
    }
    out.toSeq
  }

  /** Corpus-scale tokenizer APPLY for the unigram regime: the document's
    * max-probability (Viterbi) segmentation LOG-PROBABILITY under a
    * trained vocabulary — the number a perplexity-style quality filter
    * or a tokenizer-comparison sweep consumes per document. A native
    * codegen expression (the [[Bpe.encode]] discipline): the vocabulary
    * rides in as a codegen reference object, every document scores
    * inside its scan partition — no join, no shuffle, no UDF — and the
    * per-word DP memoizes per task thread (Zipf: distinct words ≪
    * occurrences).
    *
    * The SCORE is emitted rather than the segmentation because the max
    * is tie-independent (two segmentations of equal probability have
    * equal score by definition), which makes the number replayable
    * cross-engine to the bit — the q_text_unigram_score oracle replays
    * the identical DP in SQL with the same IEEE doubles. Word scores
    * fold left-to-right in token order; OOV characters score the
    * [[OovFloor]] penalty (segmentation never fails).
    */
  def scoreTokens(tokens: org.apache.spark.sql.Column,
      vocab: Seq[VocabPiece]): org.apache.spark.sql.Column = {
    val sorted = vocab.sortBy(v => (-v.logProb, v.piece))
    org.apache.spark.sql.graft.bridge.column(UnigramScoreExpr(
      org.apache.spark.sql.graft.bridge.expression(tokens),
      sorted.map(_.piece).toArray, sorted.map(_.logProb).toArray))
  }

  /** Log-score assigned to an apply-time OOV character. */
  val OovFloor: Double = -1.0e9

  private val MaxCachedWords = 1 << 16
  private val MaxCachedVocabs = 8
  private val scoreCache = new ThreadLocal[java.util.IdentityHashMap[
      AnyRef, (java.util.HashMap[String, java.lang.Double], Int,
        java.util.HashMap[String, java.lang.Double])]] {
    override def initialValue() = new java.util.IdentityHashMap()
  }

  /** Static kernel behind [[UnigramScoreExpr]] — called from both
    * interpreted eval and generated code. `pieces`/`logProbs` are
    * parallel arrays; per-thread memo keyed on the pieces array's
    * IDENTITY (the [[Bpe.encodeWords]] cache discipline).
    */
  def scoreWords(tokens: org.apache.spark.sql.catalyst.util.ArrayData,
      pieces: Array[String], logProbs: Array[Double]): Double = {
    val vocabs = scoreCache.get()
    var entry = vocabs.get(pieces)
    if (entry == null) {
      if (vocabs.size >= MaxCachedVocabs) vocabs.clear()
      val lp = new java.util.HashMap[String, java.lang.Double]()
      var i = 0; var lmax = 1
      while (i < pieces.length) {
        lp.put(pieces(i), logProbs(i))
        if (pieces(i).length > lmax) lmax = pieces(i).length
        i += 1
      }
      entry = (lp, lmax, new java.util.HashMap[String, java.lang.Double]())
      vocabs.put(pieces, entry)
    }
    val (lp, lmax, memo) = entry
    var acc = 0.0
    var w = 0
    val n = tokens.numElements()
    while (w < n) {
      val word = tokens.getUTF8String(w)
      if (word != null && word.numChars() > 0) {
        val key = word.toString
        var s = memo.get(key)
        if (s == null) {
          s = viterbiScore(key, lp, lmax)
          if (memo.size >= MaxCachedWords) memo.clear()
          memo.put(key, s)
        }
        acc += s.doubleValue()
      }
      w += 1
    }
    acc
  }

  /** The per-word DP: best(j) = max over piece lengths l of
    * best(j−l) + lp(piece), single chars falling to [[OovFloor]] when
    * absent — O(len · lmax) with no allocation beyond the DP array.
    */
  private def viterbiScore(word: String,
      lp: java.util.HashMap[String, java.lang.Double], lmax: Int): Double = {
    val n = word.length
    val best = new Array[Double](n + 1)
    var j = 1
    while (j <= n) {
      var m = Double.NegativeInfinity
      var l = 1
      val lcap = math.min(lmax, j)
      while (l <= lcap) {
        val p = lp.get(word.substring(j - l, j))
        if (p != null) {
          val c = best(j - l) + p.doubleValue()
          if (c > m) m = c
        } else if (l == 1) {
          val c = best(j - l) + OovFloor
          if (c > m) m = c
        }
        l += 1
      }
      best(j) = m
      j += 1
    }
    best(n)
  }

  /** Persist a trained vocabulary as a tiny parquet artifact (the
    * [[Bpe.saveMerges]] convention: tokenizers are KBs — train once,
    * every encode job loads the table).
    */
  def saveVocab(spark: SparkSession, vocab: Seq[VocabPiece],
      path: String): Unit = {
    import spark.implicits._
    vocab.toDF("piece", "log_prob").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load a [[saveVocab]] artifact, (logProb desc, piece asc)-sorted. */
  def loadVocab(spark: SparkSession, path: String): Seq[VocabPiece] = {
    import spark.implicits._
    spark.read.parquet(path).select("piece", "log_prob")
      .as[(String, Double)]
      .collect().map { case (p, l) => VocabPiece(p, l) }
      .toSeq.sortBy(v => (-v.logProb, v.piece))
  }
}

/** Viterbi log-score as a native Catalyst expression: array<string> words
  * → double total max-segmentation log-probability under a trained
  * unigram vocabulary (parallel piece/log-prob arrays carried as codegen
  * reference objects — configuration, not data; the [[BpeEncodeExpr]]
  * pattern).
  */
case class UnigramScoreExpr(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    pieces: Array[String], logProbs: Array[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types._

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"unigram_score needs array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    Unigram.scoreWords(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      pieces, logProbs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refP = ctx.addReferenceObj("pieces", pieces, "java.lang.String[]")
    val refL = ctx.addReferenceObj("logProbs", logProbs, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Unigram.scoreWords($c, $refP, $refL)")
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): UnigramScoreExpr =
    copy(child = newChild)

  override def prettyName: String = "unigram_score"
}
