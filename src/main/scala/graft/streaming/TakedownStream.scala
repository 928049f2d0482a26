package graft.streaming

import graft.functions.Takedown
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** STREAMING TAKEDOWN INGEST — opt-out/takedown requests arrive as a
  * stream of `(batch_id, doc_id)` rows (a legal-process queue, an
  * account-deletion topic) and each micro-batch pushes its batches
  * through [[Takedown.deleteEverywhere]] against a fixed artifact
  * registry.
  *
  * Idempotency across RETRIED TRIGGERS (the foreachBatch at-least-once
  * contract) is exactly the orchestrator's per-artifact batch LEDGER: a
  * replayed micro-batch re-issues the same batch_ids, every artifact
  * finds them applied WITH THE SAME ids hash, and the whole trigger is a
  * read-only no-op — load-bearing for the subtractive LM/line-df
  * families, which a blind replay would double-unlearn. No extra state
  * store, no dedup topic.
  *
  * SPLIT-BATCH GUARD: foreachBatch gives no atomic-request-batch
  * guarantee — a source rate limit (Kafka `maxOffsetsPerTrigger`, file
  * `maxFilesPerTrigger`) can split one batch_id's rows across two
  * triggers. The first fragment applies and records its ids hash; the
  * second fragment then arrives as a "duplicate" batch_id with DIFFERENT
  * ids and the ledger throws LOUDLY ([[Takedown.deleteEverywhere]]'s
  * hash validation) instead of silently skipping it — silent
  * non-deletion is the one unacceptable failure here. Operationally:
  * either size the source limits above the request-batch size, or
  * aggregate rows per batch_id upstream (watermark + complete-batch
  * marker) before this sink; a tripped guard names the batch, and the
  * recovery is re-issuing the missing ids under a fresh batchId.
  *
  * Scale shape: takedown requests are legal-process-scale, not
  * corpus-scale — the per-trigger collect is bounded by the LOUD
  * `maxRequestsPerTrigger` (the maxQueries contract), and each family
  * delete stays the O(batch) tombstone append / scoped recompute it is
  * in batch mode (SCALE.md delprobe).
  */
object TakedownStream {

  /** Sink applying each micro-batch's takedown requests. Rows:
    * `batch_id` (string — the request batch's durable identity, NOT the
    * Spark trigger id, so replays and re-sends dedupe by content) and
    * `doc_id` (long). Batches apply in batch_id order, ids sorted —
    * deterministic regardless of trigger packing.
    */
  def takedownGateSink(requests: DataFrame,
      registry: Seq[Takedown.Artifact],
      maxRequestsPerTrigger: Int = 100000): DataStreamWriter[Row] =
    requests.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        val spark = batch.sparkSession
        val rows = batch.toDF()
          .select(col("batch_id").cast("string"), col("doc_id").cast("long"))
          .distinct()
          .orderBy("batch_id", "doc_id")
          .limit(maxRequestsPerTrigger + 1)
          .collect()
        require(rows.length <= maxRequestsPerTrigger,
          s"trigger carries more than maxRequestsPerTrigger=" +
            s"$maxRequestsPerTrigger takedown requests — raise the bound " +
            "or split the feed")
        rows.groupBy(_.getString(0)).toSeq.sortBy(_._1).foreach {
          case (bid, rs) =>
            Takedown.deleteEverywhere(spark, bid,
              rs.map(_.getLong(1)).toSeq, registry)
            ()
        }
    }
}
