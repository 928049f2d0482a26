package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the dataset-versioning audit a training-data
  * pipeline runs between two crawl/curation versions: which documents were
  * added, removed, changed, or carried unchanged. The reference has no
  * versioning surface (its tables are rebuilt in place,
  * backend/create_aggregates.py); this is beyond-parity pipeline tooling.
  *
  * Design-for-scale:
  *  - Each side collapses to (id, 64-bit content hash) BEFORE the join, so
  *    the full-outer shuffle moves 16 bytes/doc, not document text — at
  *    100 TB the diff of two corpus versions shuffles gigabytes, not the
  *    corpora. With both snapshots stored bucketed by `doc_id`
  *    (`Tables.writeBucketed`), the join is zero-shuffle.
  *  - The content hash is `xxhash64`, codegen'd and null-safe (a NULL text
  *    hashes to the seed, so NULL ≡ NULL reads as unchanged — matching the
  *    oracle's `IS NOT DISTINCT FROM` ground truth).
  *  - The verdict column is the only output beyond the id: `added` (id only
  *    in the new snapshot), `removed` (only in the old), `changed` (both,
  *    content differs), `unchanged`.
  *
  * The q_snapshot_diff oracle compares RAW TEXT equality over the same two
  * synthesized snapshots — the stronger claim — so the hash gate doubles as
  * evidence that the 64-bit hash introduces no false verdicts on the
  * corpus.
  */
object Snapshot {

  /** Per-document diff verdict between two snapshots sharing an id column.
    * Pass the column holding document content via `content` (defaults to
    * `text`).
    */
  def diff(oldSnap: DataFrame, newSnap: DataFrame,
      idCol: String = "doc_id", content: String = "text"): DataFrame = {
    def sig(df: DataFrame, tag: String): DataFrame =
      df.select(col(idCol), xxhash64(col(content)).as(s"__h_$tag"))
    val joined = sig(oldSnap, "old")
      .join(sig(newSnap, "new"), Seq(idCol), "full_outer")
    val status: Column = when(col("__h_old").isNull, lit("added"))
      .when(col("__h_new").isNull, lit("removed"))
      .when(col("__h_old") === col("__h_new"), lit("unchanged"))
      .otherwise(lit("changed"))
    joined.select(col(idCol), status.as("status"))
  }
}
