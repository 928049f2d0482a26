package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TAKEDOWN ORCHESTRATOR — one deletion batch reaching EVERY registered
  * artifact. A real opt-out/takedown pipeline does not delete from "the
  * corpus": the removed documents also live on in the cluster table, the
  * ANN/PQ index, the BM25 postings, the n-gram LM counts, and the
  * perceptual-hash tables, and MISSING ONE means the content is still
  * findable. `deleteEverywhere` takes one id batch and a registry of the
  * catalog's artifacts and delegates to each family's `deleteFrom*`
  * surface (reference: the reference app has no deletion story at all —
  * this is the 100 TB-pipeline requirement built Spark-first; family
  * mechanics documented at [[TextAnalysis.deleteFromSearchIndex]],
  * [[MinhashIndex.deleteIds]], [[Similarity.deleteFromAnnIndex]],
  * [[Dedup.deleteFromClusterTable]], [[TextAnalysis.deleteFromLmTable]],
  * [[Multimodal.deleteFromPhashTable]]).
  *
  * IDEMPOTENT RE-RUN CONTRACT: every batch carries a caller-chosen
  * `batchId`, and each artifact records applied batches in a
  * `<name>_takedowns` ledger. Re-running a batch (retry after a partial
  * failure, an at-least-once queue) skips artifacts that already applied
  * it — load-bearing for the SUBTRACTIVE families (LM count-unlearning
  * would double-subtract; tombstone families would merely accumulate
  * duplicate rows). The ledger row is written AFTER a successful apply,
  * so a crash between the two re-applies that artifact on retry: exact
  * for tombstone families (reads dedupe), and for the LM family the
  * documented recovery is a rebuild — the torn window is one small write,
  * not the batch. Partial failure: artifacts are applied in registry
  * order and the first failure propagates; the completed prefix is
  * ledger-recorded, so the retry resumes where it failed.
  *
  * Scale shape: the orchestrator adds NOTHING corpus-scale of its own —
  * each family's delete is the O(batch) tombstone append or scoped
  * recompute it already was (SCALE.md delprobe), and the ledger probe is
  * a read of a KB-scale table per artifact.
  */
object Takedown {

  /** One registered artifact. `name` is the family's table-name prefix
    * (the same name its `write*` took); the two content-dependent
    * families carry the frames their delete surfaces need — the cluster
    * table its pair relation (to re-cluster touched components), the LM
    * its deleted documents' text (count-unlearning subtracts the exact
    * occurrences; ids alone cannot reconstruct them once the corpus row
    * is gone, so the caller passes the rows being taken down).
    */
  sealed trait Artifact {
    def name: String
    private[graft] def tag: String
  }
  /** BM25 search index ([[TextAnalysis.writeSearchIndex]]). */
  final case class SearchIndex(name: String) extends Artifact {
    private[graft] def tag = "bm25"
  }
  /** MinHash-LSH dedup index ([[MinhashIndex.write]]). */
  final case class MinhashLsh(name: String) extends Artifact {
    private[graft] def tag = "minhash"
  }
  /** Trained ANN index ([[Similarity.writeAnnIndex]] and the PQ/SQ8
    * stacks sharing its `_deletes` machinery). */
  final case class AnnIndex(name: String) extends Artifact {
    private[graft] def tag = "ann"
  }
  /** Perceptual-hash signature table — image or video
    * ([[Multimodal.writePhashTable]] / `writeVideoSignatureTable`). */
  final case class PhashTable(name: String) extends Artifact {
    private[graft] def tag = "phash"
  }
  /** Persisted duplicate-cluster table ([[Dedup.writeClusterTable]]);
    * `pairs` is the similarity-pair relation for the scoped re-cluster. */
  final case class ClusterTable(name: String, pairs: DataFrame)
      extends Artifact {
    private[graft] def tag = "clusters"
  }
  /** Bigram-LM count tables ([[TextAnalysis.writeLmTable]]);
    * `deletedDocs` must be exactly the (doc_id, text) rows being taken
    * down. */
  final case class LmTable(name: String, deletedDocs: DataFrame)
      extends Artifact {
    private[graft] def tag = "lm"
  }

  /** Apply one takedown batch to every registered artifact. Returns the
    * per-artifact report `(family, name, applied)` — `applied = false`
    * means the ledger showed this batch already reached that artifact
    * and the delete was skipped (the idempotent-retry path).
    */
  def deleteEverywhere(spark: SparkSession, batchId: String, ids: Seq[Long],
      registry: Seq[Artifact]): Seq[(String, String, Boolean)] = {
    require(batchId.nonEmpty, "batchId must be non-empty")
    require(ids.nonEmpty, "empty deletion batch")
    require(registry.nonEmpty, "empty artifact registry")
    val keys = registry.map(a => (a.tag, a.name))
    require(keys.distinct.size == keys.size,
      s"duplicate artifacts in registry: $keys")
    registry.map { a =>
      graft.sources.Tables.requireIdent(a.name)
      val done = alreadyApplied(spark, a.name, a.tag, batchId)
      if (!done) {
        a match {
          case SearchIndex(n) =>
            TextAnalysis.deleteFromSearchIndex(spark, n, ids)
          case MinhashLsh(n) => MinhashIndex.deleteIds(spark, n, ids)
          case AnnIndex(n) => Similarity.deleteFromAnnIndex(spark, n, ids)
          case PhashTable(n) => Multimodal.deleteFromPhashTable(spark, n, ids)
          case ClusterTable(n, pairs) =>
            Dedup.deleteFromClusterTable(spark, n, ids, pairs)
          case LmTable(n, docs) =>
            TextAnalysis.deleteFromLmTable(spark, n, docs)
        }
        recordApplied(spark, a.name, a.tag, batchId, ids.size.toLong)
      }
      (a.tag, a.name, !done)
    }
  }

  /** The amortized PHYSICAL purge across a registry: fold every
    * tombstone-family artifact's `_deletes` into its tables (bytes leave
    * disk here — the compliance end-state) on the compaction cadence,
    * one call. ClusterTable and LmTable are no-ops by design: their
    * deletes are exact in-place rewrites already (no tombstones to
    * fold).
    */
  def compactEverywhere(spark: SparkSession,
      registry: Seq[Artifact]): Unit =
    registry.foreach {
      case SearchIndex(n) => TextAnalysis.compactSearchIndex(spark, n)
      case MinhashLsh(n) => MinhashIndex.compact(spark, n)
      case AnnIndex(n) => Similarity.compactAnnIndex(spark, n)
      case PhashTable(n) => Multimodal.compactPhashTable(spark, n)
      case ClusterTable(_, _) | LmTable(_, _) => ()
    }

  /** COMPLIANCE AUDIT: per artifact, how many LIVE rows (post-tombstone
    * reads — what any consumer can still see) reference the given ids.
    * The number a takedown report quotes; every row must be 0 after
    * [[deleteEverywhere]]. One pruned read per artifact, `ids` joined
    * as a broadcast-scale frame.
    */
  def residualReferences(spark: SparkSession, ids: Seq[Long],
      registry: Seq[Artifact]): Seq[(String, String, Long)] = {
    require(ids.nonEmpty, "empty audit batch")
    import spark.implicits._
    val idsDf = ids.toDF("__id")
    def residual(df: DataFrame, idCol: String): Long =
      df.join(org.apache.spark.sql.functions.broadcast(idsDf),
        col(idCol) === col("__id")).count()
    registry.map { a =>
      val n = a match {
        case SearchIndex(nm) => residual(
          graft.sources.Tables.minusDeletes(spark, nm,
            spark.table(s"${nm}_postings"), "doc_id"), "doc_id")
        case MinhashLsh(nm) => residual(
          graft.sources.Tables.minusDeletes(spark, nm,
            spark.table(s"${nm}_sets"), "doc_id"), "doc_id")
        case AnnIndex(nm) => residual(
          graft.sources.Tables.minusDeletes(spark, nm,
            spark.table(s"${nm}_assignments"), "vec_id"), "vec_id")
        case PhashTable(nm) => residual(
          graft.sources.Tables.minusDeletes(spark, nm,
            spark.table(nm), "doc_id"), "doc_id")
        case ClusterTable(nm, _) =>
          residual(spark.table(s"${nm}_clusters"), "doc_id")
        case LmTable(nm, _) =>
          // count-unlearning leaves no per-doc rows; the auditable residue
          // is a doc-keyed artifact only if the caller persisted one —
          // the LM's own tables are aggregate counts, so residual = 0 by
          // construction once deleteFromLmTable ran (gated by the
          // rebuild-minus-deleted hash equality, q_text_bigram_deleted)
          val _ = nm; 0L
      }
      (a.tag, a.name, n)
    }
  }

  /** Drop an artifact's takedown ledger — pair with the family's own
    * `drop*` when retiring the artifact. */
  def dropLedger(spark: SparkSession, name: String): Unit =
    graft.sources.Tables.dropManagedTables(spark, Seq(s"${name}_takedowns"))

  private def alreadyApplied(spark: SparkSession, name: String, tag: String,
      batchId: String): Boolean =
    spark.catalog.tableExists(s"${name}_takedowns") && {
      !spark.table(s"${name}_takedowns")
        .filter(col("batch_id") === batchId && col("family") === tag)
        .isEmpty
    }

  private def recordApplied(spark: SparkSession, name: String, tag: String,
      batchId: String, nIds: Long): Unit = {
    import spark.implicits._
    Seq((batchId, tag, nIds)).toDF("batch_id", "family", "n_ids")
      .write.mode("append").format("parquet")
      .saveAsTable(s"${name}_takedowns")
  }
}
