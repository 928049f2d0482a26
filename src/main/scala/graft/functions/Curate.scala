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

  /** The FULL curation composition (round-16) — [[curate]]'s linear
    * five-stage manifest widened to the production shape a 100 TB
    * operator actually ships, every stage an individually-gated operator:
    *
    *  1. policy filter    — [[TextAnalysis.filterVerdict]] (C4/Gopher arms)
    *  2. near dedup       — [[Dedup.ngramJaccardPairs]] →
    *                        [[Dedup.dedupDecisions]] (exact dups are the
    *                        Jaccard-1.0 pairs of the same shingle set, so
    *                        one clustering pass removes both grades)
    *  3. decontamination  — [[Dedup.decontaminate]] against a benchmark
    *                        frame; docs scrubbed to empty DROP
    *  4. quality buckets  — [[TextAnalysis.qualityScore]] terciles via
    *                        [[Sampling.headMiddleTail]]; the tail bucket
    *                        drops (CCNet's keep-head-and-middle policy)
    *  5. temperature mix  — [[Sampling.temperatureMixture]] at
    *                        `mixNum/mixDen` of the surviving count
    *  6. packing          — [[Sampling.packSequences]] over the mixture
    *
    * Returned as NAMED STAGE THUNKS — each thunk builds its cumulative
    * prefix from scratch, so a probe can time stage boundaries
    * independently (`Stress pipeline`); `curateFull` runs the last thunk.
    *
    * Stage-boundary materialization (the composition question the
    * standalone gates never face): the near-dup DECISION SET and the
    * SCRUBBED TEXT are `localCheckpoint`ed — the two boundaries whose
    * lazy recompute would re-run pair generation / the chunk-match join
    * once per downstream window; every other boundary stays lazy because
    * its recompute is a scan-side projection, cheaper than storing it.
    * (At 100 TB the same two boundaries become stage TABLES —
    * checkpointing is the single-job rendering of that choice; the
    * decision table even has its own persisted form,
    * [[Dedup.writeClusterTable]].)
    *
    * The eager steps inside stage construction (tercile cutoffs from a
    * 256-row id-mix sample, the mixture's budget count) are the same
    * driver-side bounded reads their standalone operators make.
    */
  def curateFullStages(docs0: DataFrame, benchmark: DataFrame,
      jaccardThreshold: Double = 0.5, seqTokens: Long = 512,
      shards: Int = 8, mixNum: Long = 3L, mixDen: Long = 5L,
      textCol: String = "text", sourceCol: String = "source",
      expectedLangCol: Option[String] = Some("lang"))
      : Seq[(String, () => DataFrame)] = {
    val docs = docs0.filter(col(textCol).isNotNull)

    // Every stage's VERDICT is a KB-scale doc_id set; materialize each one
    // EXACTLY ONCE per pipeline instance (lazy vals shared by every thunk
    // and by every reference inside a stage). Without this the expensive
    // scans re-run per reference: filterVerdict (a repetition-stats
    // explode+agg over the corpus) executed 4x per curateFull run —
    // twice inside the dedup pair build, twice more under the scrub
    // join-back — and the quality window re-ran once per mixture
    // reference. Measured at sf0.1 (noop, warm): q_pipeline_curate_full
    // 10.3 s -> 6.1 s with identical output (guide §1.2: remove repeated
    // passes before tuning anything inside them).
    lazy val keptIds = TextAnalysis.filterVerdict(docs, textCol, expectedLangCol)
      .filter(col("keep")).select("doc_id")
      .localCheckpoint(true) // boundary 0: the policy verdict — ids only

    def kept() = docs.join(keptIds, Seq("doc_id"))
      .select(col("doc_id"), col(sourceCol), col(textCol))

    lazy val dedupKeepIds = Dedup.dedupDecisions(kept(),
        Dedup.ngramJaccardPairs(kept().select(col("doc_id"), col(textCol)),
          jaccardThreshold))
      .filter(col("keep")).select("doc_id")
      .localCheckpoint(true) // boundary 1: ids only — KB-scale

    def deduped() = kept().join(dedupKeepIds, Seq("doc_id"))

    lazy val scrubbedCkpt = {
      val d = deduped()
      Dedup.decontaminate(d.select(col("doc_id"), col(textCol)), benchmark)
        .filter(length(col(textCol)) > 0)
        .select(col("doc_id"), col(textCol))
        .join(d.select(col("doc_id"), col(sourceCol)), Seq("doc_id"))
        .localCheckpoint(true) // boundary 2: the rewritten text
    }

    def scrubbed() = scrubbedCkpt

    // boundary 3: the tercile verdict — ids only. The quality window and
    // its driver-side cutoff sample run once; downstream references
    // (budget count, mixture quotas, mixture ranks, the packed join) each
    // re-attach by broadcast join instead of re-scoring the corpus.
    lazy val bucketIds = Sampling.headMiddleTail(
        scrubbed().withColumn("q_score",
          TextAnalysis.qualityScore(col(textCol))),
        scoreCol = "q_score")
      .filter(col("bucket") =!= "tail")
      .select("doc_id")
      .localCheckpoint(true)

    def bucketed() = Sampling.headMiddleTail(
        scrubbed().withColumn("q_score",
          TextAnalysis.qualityScore(col(textCol))),
        scoreCol = "q_score")
      .filter(col("bucket") =!= "tail")

    def bucketedLean() = scrubbed().join(bucketIds, Seq("doc_id"))

    lazy val mixIds = {
      val b = bucketedLean()
      val budget = b.count() * mixNum / mixDen
      Sampling.temperatureMixture(b, budget, sourceCol, textCol)
        .filter(col("keep")).select("doc_id")
        .localCheckpoint(true) // boundary 4: the mixture verdict — ids only
    }

    def mixed() = bucketedLean().join(mixIds, Seq("doc_id"))

    def packed() = Sampling.packSequences(
      mixed().select(col("doc_id"), col(textCol)), seqTokens, shards, textCol)

    Seq(
      "filter" -> (() => kept()),
      "dedup" -> (() => deduped()),
      "decontaminate" -> (() => scrubbed()),
      "quality" -> (() => bucketed()),
      "mixture" -> (() => mixed()),
      "pack" -> (() => packed()))
  }

  /** The composed six-stage manifest — the artifact a training run loads.
    * One row per packed document: (doc_id, token_count, shard, pack_id,
    * pack_offset), token counts measured on the SCRUBBED text.
    */
  def curateFull(docs: DataFrame, benchmark: DataFrame,
      jaccardThreshold: Double = 0.5, seqTokens: Long = 512,
      shards: Int = 8, mixNum: Long = 3L, mixDen: Long = 5L,
      textCol: String = "text", sourceCol: String = "source",
      expectedLangCol: Option[String] = Some("lang")): DataFrame =
    curateFullStages(docs, benchmark, jaccardThreshold, seqTokens, shards,
      mixNum, mixDen, textCol, sourceCol, expectedLangCol).last._2()
}
