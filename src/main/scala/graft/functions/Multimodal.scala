package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus a batch-shaped decode/feature-extract stage.
  *
  * The Spark-side plumbing is real — schema, partition-preserving
  * mapPartitions over a typed Dataset, iterator-to-iterator batch shape (the
  * same contract a vectorized/Arrow UDF has: no per-row setup cost, safe to
  * hold a decoder per partition). The DECODE STEP IS A STUB: this container
  * has no image/audio codecs, so `decodeBatch` computes deterministic fake
  * features from the raw bytes. Swapping in a real decoder changes only the
  * body of `decodeOne`.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media_type: String, content: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long, media_type: String, n_bytes: Long,
      width: Long, height: Long, channels: Long, duration_frames: Long)

  /** Build a media table from `documents`: bytes = UTF-8 of the text, media
    * type cycles deterministically by doc_id. Stands in for reading a real
    * blob column / object-store pointers.
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("content"))
      .as[MediaRow]
  }

  /** STUB decoder — deterministic fake features derived from byte length.
    * A real implementation would parse the container format here; the
    * surrounding batch shape (iterator in/out, one decoder instance per
    * partition) is the production contract.
    */
  def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] = {
    // A real decoder would be constructed once here, per partition/batch.
    rows.map(decodeOne)
  }

  private def decodeOne(r: MediaRow): MediaFeatures = {
    val n = r.content.length.toLong
    MediaFeatures(
      doc_id = r.doc_id,
      media_type = r.media_type,
      n_bytes = n,
      width = n % 640 + 1,
      height = (n * 7) % 480 + 1,
      channels = if (r.media_type == "audio") 2L else 3L,
      duration_frames = if (r.media_type == "video") n % 30 + 1 else 1L)
  }

  /** Feature extraction over the media table: partition-preserving, no
    * shuffle — each executor decodes its own partitions.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(decodeBatch)
  }
}
