package graft.streaming

import graft.functions.TextAnalysis
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
    * face of [[graft.functions.Dedup.incrementalExact]]). The static side
    * collapses to distinct digests once and joins as a left_anti against
    * each micro-batch — with a seen set that fits in memory this is a
    * broadcast probe per batch, never a stateful store. Compose with
    * [[dedupStream]] to also drop duplicates WITHIN the stream: the static
    * join handles history, the watermarked state handles the live window.
    */
  def incrementalDedupStream(docs: DataFrame, seen: DataFrame,
      textCol: String = "text"): DataFrame = {
    val seenHashes = seen
      .select(sha2(col(textCol), 256).as("content_hash")).distinct()
    docs
      .withColumn("content_hash", sha2(col(textCol), 256))
      .join(seenHashes, Seq("content_hash"), "left_anti")
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
}
