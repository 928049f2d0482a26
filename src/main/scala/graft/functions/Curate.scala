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
  * token_count, split, pack_id, pack_offset); the FIRST declared split is
  * the packed (training) split, pack columns are NULL off it.
  * `manifest.join(docs, "doc_id")` is the training corpus.
  *
  * Every stage is deterministic and content-keyed, so the whole manifest is
  * rerun-stable and replayable in SQL — the driver oracle replays all five
  * stages in one query and hash-compares the manifest.
  *
  * Scale shape: ONE LINEAR PLAN — the fingerprint is computed once at the
  * scan and carried; dedup and the domain cap are rank windows over the
  * carried columns (no join-back of a stage onto itself, which would
  * re-execute the whole upstream per stage); the split is a projection off
  * the carried fingerprint; packing is a conditional running sum in the
  * shard window (non-train rows contribute zero), so no self-join attaches
  * pack columns. Stage semantics are shared with the standalone operators
  * — the same `filterVerdict`, the same `splitAssignExpr`, the same
  * (fingerprint, doc_id) orders — so `curate` equals composing them by
  * hand, it just evaluates each input once.
  */
object Curate {

  def curate(docs: DataFrame, seqTokens: Long = 512, shards: Int = 8,
      maxPerSource: Int = 15,
      splits: Seq[(String, Int)] = Seq(("train", 95), ("val", 3), ("test", 2)),
      textCol: String = "text", sourceCol: String = "source",
      expectedLangCol: Option[String] = Some("lang")): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val verdict = TextAnalysis.filterVerdict(docs, textCol, expectedLangCol)
    // text is consumed HERE (fingerprint projection) and dropped before any
    // window: all three shuffles carry only (ids, hash, count) columns
    val kept = docs.select(col("doc_id"), col(sourceCol), col(textCol))
      .join(verdict.filter(col("keep")).select(col("doc_id"), col("token_count")),
        Seq("doc_id"))
      .withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
      .drop(textCol)

    // exact dedup: min doc_id per content fingerprint (rank window, not a
    // groupBy+join-back)
    val wDedup = Window.partitionBy(col("__fp")).orderBy(col("doc_id"))
    val deduped = kept
      .withColumn("__rn", row_number().over(wDedup))
      .filter(col("__rn") === 1)

    // domain cap: same (fingerprint NULLS LAST, doc_id) quota order as
    // Sampling.domainCap, over the carried fingerprint
    val wCap = Window.partitionBy(col(sourceCol))
      .orderBy(col("__fp").asc_nulls_last, col("doc_id"))
    val capped = deduped
      .withColumn("__drank", row_number().over(wCap))
      .filter(col("__drank") <= maxPerSource)
      .withColumn("split", Sampling.splitAssignExpr(
        col("__fp") % Sampling.splitTotal(splits), splits))

    // packing: shard-local running sum where only train rows carry weight —
    // the cumulative sums at train rows equal Sampling.packSequences over
    // the train subset, with no self-join to attach the pack columns
    val wPack = Window.partitionBy(col("__shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val isTrain = col("split") === splits.head._1
    capped
      .withColumn("__shard", col("doc_id") % shards)
      .withColumn("__cum", coalesce(
        sum(when(isTrain, col("token_count")).otherwise(0L)).over(wPack), lit(0L)))
      .select(col("doc_id"), col(sourceCol), col("token_count"), col("split"),
        when(isTrain, floor(col("__cum") / seqTokens).cast("long")).as("pack_id"),
        when(isTrain, col("__cum") % seqTokens).as("pack_offset"))
  }
}
