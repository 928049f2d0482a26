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
}
