package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end corpus CURATION pipeline — the composition a training-data
  * team actually ships, built entirely from this engine's gated operators:
  *
  *  1. policy filter  — [[TextAnalysis.filterVerdict]] (C4/Gopher arms)
  *  2. exact dedup    — min-doc_id representative per content fingerprint
  *  3. domain balance — [[Sampling.domainCap]] per-source quota
  *  4. split          — [[Sampling.hashSplit]] content-keyed train/val/test
  *  5. packing        — [[Sampling.packSequences]] over the train split
  *
  * Stage 1's language arm reads `expectedLangCol` (default `lang`); pass
  * `None` for corpora without language labels, or the column name where
  * the labels live.
  *
  * Output: one manifest row per SURVIVING document — (doc_id, source,
  * token_count, split, pack_id, pack_offset); pack columns are NULL off the
  * train split. `manifest.join(docs, "doc_id")` is the training corpus.
  *
  * Every stage is deterministic and content-keyed, so the whole manifest is
  * rerun-stable and replayable in SQL — the driver oracle replays all five
  * stages in one query and hash-compares the manifest.
  *
  * Scale shape: stages 1–2 are scan-side projections plus the repetition
  * aggregates; stages 2–4 shuffle only narrow (id, hash, source) columns;
  * stage 5 is shard-local. Signals (fingerprint, token count) are
  * recomputed per stage as scan-side projections — carrying them through
  * would save re-hashing at the cost of wider shuffles; an integrated
  * planner could fuse that, and either choice preserves the results.
  */
object Curate {

  def curate(docs: DataFrame, seqTokens: Long = 512, shards: Int = 8,
      maxPerSource: Int = 15,
      splits: Seq[(String, Int)] = Seq(("train", 95), ("val", 3), ("test", 2)),
      textCol: String = "text", sourceCol: String = "source",
      expectedLangCol: Option[String] = Some("lang")): DataFrame = {
    val verdict = TextAnalysis.filterVerdict(docs, textCol, expectedLangCol)
    val kept = docs.select(col("doc_id"), col(sourceCol), col(textCol))
      .join(verdict.filter(col("keep")).select(col("doc_id"), col("token_count")),
        Seq("doc_id"))

    // exact dedup among the kept docs: min doc_id per content fingerprint
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__fp")).orderBy(col("doc_id"))
    val deduped = kept
      .withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__fp")

    val capKeep = Sampling.domainCap(deduped, maxPerSource, sourceCol, textCol)
      .filter(col("keep")).select("doc_id")
    val capped = deduped.join(capKeep, Seq("doc_id"))

    val sp = Sampling.hashSplit(capped, splits, textCol)
    val packed = Sampling.packSequences(
      sp.filter(col("split") === "train").select(col("doc_id"), col(textCol)),
      seqTokens, shards, textCol)
      .select(col("doc_id"), col("pack_id"), col("pack_offset"))

    sp.select(col("doc_id"), col(sourceCol), col("token_count"), col("split"))
      .join(packed, Seq("doc_id"), "left")
  }
}
