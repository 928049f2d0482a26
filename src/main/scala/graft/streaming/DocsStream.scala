package graft.streaming

import graft.functions.{Dedup, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming document-pipeline stages: the dedup/quality operators of the
  * batch layer applied to a `readStream` of documents (schema: doc_id, ts,
  * text). Beyond-parity like the rest of §2.9 — the reference has no
  * streaming — and the LLM-pipeline shape a crawl ingest actually needs:
  * dedup + quality-gate documents AS THEY ARRIVE, not in a nightly batch.
  */
object DocsStream {

  /** Streaming exact dedup: fingerprint the normalized text (the same
    * [[TextAnalysis.fingerprint]] rolling hash as batch) and keep the FIRST
    * occurrence of each fingerprint. `dropDuplicatesWithinWatermark` (not
    * plain `dropDuplicates`) is the scale-critical choice: dedup state for
    * a fingerprint is EVICTED once the watermark passes it, so state is
    * bounded by the watermark horizon instead of growing with every
    * document ever seen — an unbounded crawl would OOM the plain variant.
    * The price is documented: a duplicate arriving later than the
    * watermark delay after its first copy is re-emitted.
    */
  def dedupStream(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("fingerprint", TextAnalysis.fingerprint(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Stream-static incremental dedup: drop arriving documents whose content
    * digest already exists in a STATIC seen-corpus frame (the streaming
    * face of [[graft.functions.Dedup.incrementalExact]] — the SAME digest
    * definition, shared via `Dedup.novelByDigest`, so batch and stream can
    * never disagree about what a duplicate is). Stream-static joins
    * re-execute the static sub-plan on EVERY micro-batch, so the digest
    * collapse is persisted here: the scan+sha2+distinct over the seen
    * corpus is paid on the first batch and each later trigger joins
    * against the cached digest set (caller may `.unpersist()` the second
    * element when the query stops). Compose with [[dedupStream]] to also
    * drop duplicates WITHIN the stream: the static join handles history,
    * the watermarked state handles the live window.
    *
    * @return (deduped stream, the persisted seen-digest frame)
    */
  def incrementalDedupStream(docs: DataFrame, seen: DataFrame,
      textCol: String = "text"): (DataFrame, DataFrame) = {
    val seenHashes = Dedup.seenDigests(seen, textCol).persist()
    (Dedup.novelByDigest(docs, seenHashes, textCol), seenHashes)
  }

  /** Stateless quality gate: score + language-ID each document with the
    * same codegen'd expressions as the batch path and keep those above
    * `minQuality`. Stateless ⇒ identical semantics on stream and batch
    * frames (asserted stream≡batch in StreamingSpec).
    */
  def qualityStream(docs: DataFrame, minQuality: Double): DataFrame =
    docs.select(
      col("*"),
      TextAnalysis.qualityScore(col("text")).as("quality_score"),
      TextAnalysis.langId(col("text")).as("lang"))
      .filter(col("quality_score") >= minQuality)

  /** Stateless CLASSIFIER gate: keep documents the linear quality model
    * admits — [[TextAnalysis.classifierScoreInline]]'s projection form
    * (map-literal weights, scan-side integer fold), so the gate is legal
    * in append mode with no state, no join, and no aggregation, and
    * micro-batch boundaries cannot change any decision: stream ≡ batch
    * exactly (StreamingSpec asserts it against the JOIN-form batch
    * scorer, which also pins the two access paths to each other).
    * Un-scorable documents (NULL/blank text) drop — the gate admits only
    * what it can vouch for. Output: input columns + (n_tokens, score).
    */
  def classifierStream(docs: DataFrame, weights: Seq[(String, Long)],
      bias: Long = 0L, thresholdMicros: Long = 0L,
      textCol: String = "text"): DataFrame = {
    val nTokens = TextAnalysis.classifierNTokens(col(textCol))
    val scoreNum = TextAnalysis.classifierScoreNum(col(textCol), weights, bias)
    // zero-token rows are dropped below, but ANSI mode evaluates the
    // projection first — guard the division exactly like the batch
    // verdict does
    docs.select(col("*"), nTokens.as("n_tokens"),
        when(nTokens === 0, lit(null).cast("double"))
          .otherwise(scoreNum.cast("double") /
            (nTokens.cast("double") * lit(1000000.0))).as("score"))
      .filter(col("n_tokens") > 0 &&
        scoreNum >= lit(thresholdMicros) * col("n_tokens"))
  }

  /** Stateless BLOCKLIST gate: drop documents containing any listed
    * phrase — the same single-pass Aho-Corasick expression as the batch
    * path ([[graft.functions.Blocklist.countMatches]]). A per-document
    * function only, so micro-batch boundaries cannot change any decision
    * and stream ≡ batch exactly (StreamingSpec asserts it).
    */
  def blocklistStream(docs: DataFrame, patterns: Seq[String],
      textCol: String = "text"): DataFrame =
    docs.filter(
      graft.functions.Blocklist.countMatches(col(textCol), patterns) === 0)

  /** Streaming CURATION gate: every micro-batch runs the same composite
    * C4/Gopher verdict as batch [[TextAnalysis.filterVerdict]] and writes
    * the surviving documents (with their verdict stats) to a parquet
    * corpus, one `batch=N` subdirectory per micro-batch —
    * `spark.read.parquet(outDir)` sees the curated corpus with the batch
    * id as a partition column. The verdict needs per-doc aggregates (the
    * repetition arms), which streaming append mode cannot express
    * directly; foreachBatch runs them as batch plans per trigger.
    *
    * Every verdict signal is a function of the document ALONE, so
    * micro-batch boundaries cannot change any decision — stream ≡ batch
    * exactly (StreamingSpec asserts it). Idempotent under failure
    * re-runs: a retried batch N overwrites its own `batch=N` directory
    * instead of appending duplicates. Every trigger writes its `batch=N`
    * directory — including when zero documents survive (or arrive): an
    * empty write normally plans zero tasks and leaves a FILE-LESS
    * directory, which would make `spark.read.parquet(outDir)` fail schema
    * inference if no batch ever kept a document, so the empty arm forces
    * one schema-bearing 0-row parquet file.
    *
    * `expectedLangCol` defaults to None because the module's raw stream
    * schema (doc_id, ts, text) carries no language label — pass
    * `Some("lang")` when the stream does. Verdict stats (token_count,
    * quality_score) REPLACE same-named incoming columns, so composing
    * after [[qualityStream]] re-scores rather than colliding.
    */
  def curateGateSink(docs: DataFrame, outDir: String,
      expectedLangCol: Option[String] = None)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        // persist: the batch subtree otherwise re-executes per action —
        // isEmpty, the verdict's two internal scans, and the join's left side
        val b = batch.toDF().persist()
        try {
          val v = TextAnalysis.filterVerdict(b, expectedLangCol = expectedLangCol)
          val stats = Seq("token_count", "quality_score")
          // verdict stats REPLACE same-named incoming columns (e.g. when
          // composed after qualityStream) instead of colliding in the join
          // persist the joined survivors too: the isEmpty probe and the
          // write are separate actions, and only `b` below the verdict is
          // cached — without this the verdict's aggregate arms + join run
          // twice per trigger
          val out = stats.foldLeft(b)((d, c) => d.drop(c))
            .join(v.filter(col("keep")).select("doc_id", stats: _*), Seq("doc_id"))
            .persist()
          try {
            // repartition(1) on the empty arm: force one task so the write
            // emits a 0-row parquet file WITH schema instead of nothing
            (if (out.isEmpty) out.repartition(1) else out)
              .write.mode("overwrite").parquet(s"$outDir/batch=$id")
          } finally { out.unpersist(); () }
        } finally { b.unpersist(); () }
    }

  /** Streaming LM-quality gate against a PERSISTED bigram model
    * ([[graft.functions.TextAnalysis.writeLmTable]]): each micro-batch
    * scores against the STORED model tables via foreachBatch — the
    * per-doc fold is an aggregation, which as a live streaming aggregate
    * would need watermarked state; per-batch scoring is stateless and
    * reproduces batch semantics exactly (StreamingSpec asserts
    * stream ≡ batch). Documents scoring at or above `minScore` append to
    * a `batch=N`-partitioned corpus; retried batches overwrite their own
    * partition (the [[curateGateSink]] idempotent-sink discipline).
    * Un-scorable documents (fewer than two tokens → no bigram positions,
    * NULL score) are DROPPED — a gate admits what it can vouch for. The
    * model is fixed across batches, so scores are comparable stream-wide:
    * the CCNet deployment shape — train once on clean reference text,
    * gate the crawl as it arrives.
    */
  def lmGateSink(docs: DataFrame, lmName: String, outDir: String,
      minScore: Double, addK: Double = 1.0)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val b = batch.toDF().persist()
        try {
          val keep = TextAnalysis
            .bigramScoreIndexed(b.sparkSession, lmName, b, addK)
            .filter(col("bigram_score") >= minScore)
            .select("doc_id", "n_bigrams", "bigram_score")
          val out = b.join(keep, Seq("doc_id")).persist()
          try {
            (if (out.isEmpty) out.repartition(1) else out)
              .write.mode("overwrite").parquet(s"$outDir/batch=$id")
          } finally { out.unpersist(); () }
        } finally { b.unpersist(); () }
    }

  /** Streaming MIN-K% PROB membership screen against a persisted
    * [[graft.functions.TextAnalysis.writeLmTable]] audit model: each
    * arriving candidate document scores the mean of its bottom-20%
    * per-position probabilities under the STORED model
    * ([[graft.functions.TextAnalysis.minKProbIndexed]]) and is kept iff
    * `min_k_prob < maxMinK` — the leakage-screen deployment of Shi et
    * al. 2024: before admitting crawled text into an EVALUATION set,
    * drop documents the membership test flags as probable training-set
    * members (suspiciously high bottom-k mass). Scoring is
    * per-document, so per-batch screening is stateless and stream ≡
    * batch exactly (StreamingSpec pins it); unscorable documents
    * (< 2 tokens → NULL score) drop — a screen admits what it can vouch
    * for; retried triggers overwrite their own `batch=N` partition.
    */
  def minKGateSink(docs: DataFrame, lmName: String, outDir: String,
      maxMinK: Double, addK: Double = 1.0)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val b = batch.toDF().persist()
        try {
          val keep = TextAnalysis
            .minKProbIndexed(b.sparkSession, lmName, b, addK)
            .filter(col("min_k_prob") < maxMinK)
            .select("doc_id", "n_bigrams", "min_k_prob")
          val out = b.join(keep, Seq("doc_id")).persist()
          try {
            (if (out.isEmpty) out.repartition(1) else out)
              .write.mode("overwrite").parquet(s"$outDir/batch=$id")
          } finally { out.unpersist(); () }
        } finally { b.unpersist(); () }
    }

  /** Streaming GOPHER REPETITION gate (Rae et al. 2021 §A1.1): each
    * arriving document computes the full Table A1 statistic via the
    * scan-side [[graft.functions.TextAnalysis.gopherRepetition]] kernel
    * and is kept iff EVERY signal sits at or under its threshold —
    * defaults are the paper's published caps (0.30/0.30 duplicate
    * line/paragraph fractions, 0.20/0.20 by characters, 0.20/0.18/0.16
    * top-{2,3,4}-gram, 0.15..0.10 duplicate-{5..10}-gram). The signal
    * is per-document, so per-batch scoring is stateless and trigger
    * boundaries cannot change a verdict (StreamingSpec asserts
    * stream ≡ batch); NULL-text documents drop (a gate admits what it
    * can vouch for — the [[lmGateSink]] contract), and a retried
    * trigger re-writes its own `batch=N` partition idempotently.
    */
  def gopherGateSink(docs: DataFrame, outDir: String,
      maxDupLineFrac: Double = 0.30, maxDupParaFrac: Double = 0.30,
      maxDupLineCharFrac: Double = 0.20, maxDupParaCharFrac: Double = 0.20,
      maxTopGramFrac: Seq[Double] = Seq(0.20, 0.18, 0.16),
      maxDupGramFrac: Seq[Double] = Seq(0.15, 0.14, 0.13, 0.12, 0.11, 0.10))
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(maxTopGramFrac.length == 3 && maxDupGramFrac.length == 6,
      "need 3 top-gram and 6 dup-gram thresholds")
    docs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val b = batch.toDF().persist()
        try {
          val keep = gopherKeep(b, maxDupLineFrac, maxDupParaFrac,
            maxDupLineCharFrac, maxDupParaCharFrac, maxTopGramFrac,
            maxDupGramFrac)
          val out = b.join(keep, Seq("doc_id")).persist()
          try {
            (if (out.isEmpty) out.repartition(1) else out)
              .write.mode("overwrite").parquet(s"$outDir/batch=$id")
          } finally { out.unpersist(); () }
        } finally { b.unpersist(); () }
    }
  }

  /** The batch form of [[gopherGateSink]]'s verdict — the keep set as
    * (doc_id) rows, shared by the sink and StreamingSpec's stream ≡
    * batch assertion. */
  private[graft] def gopherKeep(docs: DataFrame,
      maxDupLineFrac: Double, maxDupParaFrac: Double,
      maxDupLineCharFrac: Double, maxDupParaCharFrac: Double,
      maxTopGramFrac: Seq[Double], maxDupGramFrac: Seq[Double]): DataFrame =
    graft.functions.TextAnalysis.gopherVerdict(docs, maxDupLineFrac,
        maxDupParaFrac, maxDupLineCharFrac, maxDupParaCharFrac,
        maxTopGramFrac, maxDupGramFrac)
      .filter(col("keep")).select(col("doc_id"))

  /** Streaming DSIR gate against a persisted importance model
    * ([[graft.functions.Sampling.writeDsirModel]]): each arriving
    * document is scored by the stored hashed-bigram log-ratio table
    * (bucket width from the model's params row) and kept iff its exact
    * BIGINT weight reaches `minWeightQ` — the streaming deployment of
    * DSIR: the model fits ONCE on the reference corpora at ingest and a
    * weight threshold (e.g. [[graft.functions.Sampling.dsirSelect]]'s
    * n-th-best weight on the fit corpus) replaces batch top-n, which an
    * unbounded stream cannot rank. Unscorable docs (< 2 tokens, NULL
    * text → NULL weight) drop, the [[lmGateSink]] contract. Stream ≡
    * batch per trigger (StreamingSpec asserts against
    * `dsirScoreIndexed.filter(weight_q >= minWeightQ)` on the
    * concatenated corpus — scoring is per-document, so trigger
    * boundaries cannot change a verdict); output re-writes its own
    * `batch=N` partition, so a retried trigger is idempotent.
    */
  def dsirGateSink(docs: DataFrame, modelName: String, outDir: String,
      minWeightQ: Long)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val b = batch.toDF().persist()
        try {
          val keep = graft.functions.Sampling
            .dsirScoreIndexed(b.sparkSession, modelName, b)
            .filter(col("weight_q") >= minWeightQ)
            .select("doc_id", "n_feats", "weight_q", "log_weight")
          val out = b.join(keep, Seq("doc_id")).persist()
          try {
            (if (out.isEmpty) out.repartition(1) else out)
              .write.mode("overwrite").parquet(s"$outDir/batch=$id")
          } finally { out.unpersist(); () }
        } finally { b.unpersist(); () }
    }

  /** Streaming MOORE–LEWIS gate against two stored
    * [[graft.functions.TextAnalysis.writeLmTable]] models (target =
    * in-domain, raw = general) — the [[dsirGateSink]] deployment for the
    * cross-entropy-difference selector: both LMs fit ONCE on the
    * reference corpora at ingest, each arriving document scores via
    * [[graft.functions.Sampling.crossEntropyScoreIndexed]] (exact
    * fixed-point diff_q; ce_diff is two IEEE divisions of exact
    * integers, bit-portable), and keeps iff `ce_diff >= minCeDiff` — a
    * threshold (e.g. [[graft.functions.Sampling.crossEntropySelect]]'s
    * n-th-best ce_diff on the fit corpus) replacing batch top-n, which
    * an unbounded stream cannot rank. Unscorable docs (< 2 tokens, NULL
    * text → NULL ce_diff) drop, the [[lmGateSink]] contract. Stream ≡
    * batch per trigger (StreamingSpec asserts against
    * `crossEntropyScoreIndexed.filter(ce_diff >= minCeDiff)` on the
    * concatenated corpus — scoring is per-document against FROZEN
    * models, so trigger boundaries cannot change a verdict); output
    * re-writes its own `batch=N` partition, so a retried trigger is
    * idempotent. Because the models are writeLmTable artifacts, takedown
    * unlearning ([[graft.functions.TextAnalysis.deleteFromLmTable]])
    * applies to the gate's models for free.
    */
  def ceGateSink(docs: DataFrame, targetName: String, rawName: String,
      outDir: String, minCeDiff: Double)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val b = batch.toDF().persist()
        try {
          val keep = graft.functions.Sampling
            .crossEntropyScoreIndexed(b.sparkSession, targetName, rawName, b)
            .filter(col("ce_diff") >= minCeDiff)
            .select("doc_id", "n_bigrams", "diff_q", "ce_diff")
          val out = b.join(keep, Seq("doc_id")).persist()
          try {
            (if (out.isEmpty) out.repartition(1) else out)
              .write.mode("overwrite").parquet(s"$outDir/batch=$id")
          } finally { out.unpersist(); () }
        } finally { b.unpersist(); () }
    }

  /** Streaming NEAR-dup gate against a persisted MinHash index
    * ([[graft.functions.MinhashIndex]]) — the lexical analog of what
    * [[incrementalDedupStream]] does for exact duplicates, closing the
    * batch/stream capability gap: a crawl ingest drops arriving documents
    * whose n-gram Jaccard against ANYTHING already seen reaches
    * `threshold`, and folds every arrival into the index so later batches
    * (and later runs) dedup against it.
    *
    * Semantics per micro-batch (stream ≡ batch, StreamingSpec asserts it
    * against [[graft.functions.Dedup.minhashNearDups]] on the concatenated
    * corpus): a document is DROPPED iff it has an exact-Jaccard ≥
    * `threshold` near-dup among (a) the index contents before this batch —
    * the [[graft.functions.MinhashIndex.screen]] candidates — or (b) a
    * LOWER-id document of the same batch (the batch operator's keep rule:
    * pairs are `doc_a < doc_b`, the higher id drops). Within-batch pairs
    * replay the INDEX's frozen banding geometry, not the batch defaults,
    * so the two candidate generators can never disagree.
    *
    * ALL arriving documents — kept and dropped — upsert into the index:
    * the batch drop rule is "any lower-id neighbor, whether or not that
    * neighbor itself survived", so the index must remember dropped
    * documents too or a chain A≈B≈C (with A≉C) would re-admit C after B
    * dropped, diverging from batch semantics.
    *
    * Idempotent under failure re-runs, BOTH sides: the output re-write
    * overwrites its own `batch=N` partition (the [[curateGateSink]]
    * discipline), and the index upsert first subtracts doc_ids already in
    * `<name>_sets` (a literal IN probe pushed into the bucketed scan, the
    * screen() candidate-read pattern) so a retried trigger appends
    * nothing twice; screen results are likewise filtered to ids outside
    * the current batch so a half-published retry cannot match documents
    * against their own first attempt. Driver-side id lists are bounded by
    * the trigger size — the same contract as screen's `maxCandidates`.
    */
  def minhashGateSink(docs: DataFrame, indexName: String, outDir: String,
      threshold: Double, textCol: String = "text")
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        minhashGateBatch(batch.toDF(), indexName, outDir, id, threshold, textCol)
    }

  /** One [[minhashGateSink]] trigger — exposed so the retry contract is
    * directly testable: calling this twice with the same (batch, id) must
    * leave the output partition AND the index byte-identical to one call.
    */
  private[graft] def minhashGateBatch(batch: DataFrame, indexName: String,
      outDir: String, id: Long, threshold: Double, textCol: String): Unit = {
    import graft.functions.MinhashIndex
    val b = batch.persist()
    try {
      val spark = b.sparkSession
      val (numHashes, bands) = MinhashIndex.geometry(spark, indexName)
      val batchIds = b.select(col("doc_id")).distinct()
        .collect().map(_.getLong(0)).toSeq
      // (a) near-dup of the pre-batch corpus (retry-published ids of
      // THIS batch excluded: they are siblings, handled by rule (b))
      val cross = MinhashIndex
        .screen(spark, indexName, b, threshold, textCol)
        .filter(if (batchIds.isEmpty) lit(true)
          else !col("seen_doc").isin(batchIds: _*))
        .select(col("batch_doc").as("doc_id"))
      // (b) near-dup of a lower-id sibling, under the index's geometry
      val within = Dedup
        .minhashNearDups(b, threshold, numHashes, bands, textCol)
        .select(col("doc_b").as("doc_id"))
      val out = b.join(cross.union(within).distinct(),
        Seq("doc_id"), "left_anti").persist()
      try {
        (if (out.isEmpty) out.repartition(1) else out)
          .write.mode("overwrite").parquet(s"$outDir/batch=$id")
      } finally { out.unpersist(); () }
      // fold the WHOLE batch in, minus ids a failed attempt already
      // published (idempotent replay)
      val present =
        if (batchIds.isEmpty) Set.empty[Long]
        else spark.table(s"${indexName}_sets")
          .filter(col("doc_id").isin(batchIds: _*))
          .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      val novel =
        if (present.isEmpty) b
        else b.filter(!col("doc_id").isin(present.toSeq: _*))
      if (!novel.isEmpty) MinhashIndex.upsert(spark, indexName, novel, textCol)
    } finally { b.unpersist(); () }
  }

  /** STREAMING CRAWL-FRONTIER GATE — the incremental frontier's
    * streaming face ([[graft.functions.TextAnalysis.writeFrontierTable]]
    * family): each micro-batch of `(doc_id, url)` rows screens against
    * the persisted seen-set (`should_fetch` verdicts to
    * `outDir/batch=<id>`) and folds its novel canonicals in. Idempotent
    * replay, both sides (the [[minhashGateBatch]] discipline): the
    * screen excludes frontier rows FIRST SEEN by this batch's own docs
    * (only a half-published prior attempt can have written those, and
    * counting them as seen would flip the replayed verdicts), and the
    * upsert's left-anti probe makes re-folding a no-op.
    */
  def frontierGateSink(urls: DataFrame, frontierName: String, outDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    urls.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        frontierGateBatch(batch.toDF(), frontierName, outDir, id)
    }

  /** One [[frontierGateSink]] trigger — exposed for the StreamingSpec
    * replay pin. */
  private[graft] def frontierGateBatch(batch: DataFrame, frontierName: String,
      outDir: String, id: Long): Unit = {
    import graft.functions.TextAnalysis
    val b = batch.persist()
    try {
      val spark = b.sparkSession
      val batchIds = b.select(col("doc_id")).distinct()
        .collect().map(_.getLong(0)).toSeq
      val verdicts = TextAnalysis.screenFrontier(spark, frontierName, b,
        excludeFirstDocs = batchIds).persist()
      try {
        (if (verdicts.isEmpty) verdicts.repartition(1) else verdicts)
          .write.mode("overwrite").parquet(s"$outDir/batch=$id")
      } finally { verdicts.unpersist(); () }
      TextAnalysis.upsertFrontierTable(spark, frontierName, b)
    } finally { b.unpersist(); () }
  }
}
