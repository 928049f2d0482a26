package graft.streaming

import graft.functions.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming EMBEDDING ingest against a persisted ANN index
  * ([[graft.functions.Similarity.writeAnnIndex]]) — the semantic analog
  * of [[DocsStream.minhashGateSink]], completing the pattern: every batch
  * dedup capability (exact, lexical near-dup, semantic) has a streaming
  * face that shares its index artifact with the batch path.
  */
object EmbedStream {

  /** Streaming SemDeDup gate: drop arriving vectors whose cosine against
    * anything previously arrived reaches `threshold`, fold every arrival
    * into the index. Semantics per micro-batch (the
    * [[graft.functions.Dedup.semanticDedup]] keep rule, sequentialized):
    * an arriving vector drops iff it has cosine ≥ `threshold` with (a) a
    * SAME-CLUSTER vector already in the index — the SemDeDup
    * within-cluster candidate rule, so the stored read is bucket-pruned
    * to the batch's clusters — or (b) a lower-id same-cluster sibling of
    * its own batch. ALL arrivals upsert (dropped vectors too: the drop
    * rule is "any earlier neighbor, whether or not it survived", so the
    * index must remember dropped arrivals or an A≈B≈C chain with A≉C
    * would re-admit C). Cluster assignment uses the index's FROZEN
    * quantizer ([[graft.functions.Similarity.upsertAnnIndex]]'s
    * documented maintenance trade — rebuild to re-center).
    *
    * Idempotent under failure re-runs, both sides (the
    * [[DocsStream.minhashGateBatch]] discipline): the output partition
    * overwrites itself, screen results exclude ids of the current batch
    * (a half-published retry cannot match vectors against their own
    * first attempt), and the upsert subtracts already-present ids.
    */
  def semanticGateSink(vecs: DataFrame, indexName: String, outDir: String,
      threshold: Double)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    vecs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        semanticGateBatch(batch.toDF(), indexName, outDir, id, threshold)
    }

  /** Streaming DRIFT MONITOR — the ANN retrain-policy check
    * ([[graft.functions.Similarity.centroidDriftIndexed]]) run on every
    * arriving embedding slice: each micro-batch assigns under the
    * index's FROZEN quantizer, compares its cell occupancy against the
    * live stored occupancy, and publishes the per-cell drift report to
    * `outDir/batch=<id>` — the feed an alerting/rebuild trigger tails.
    * READ-ONLY against the index (monitoring must not mutate what it
    * monitors) and idempotent by construction: a replayed trigger
    * recomputes the same report and overwrites the same partition.
    * Empty micro-batches still publish a schema-stable (all-zero-batch)
    * report — silence and "no drift" must be distinguishable.
    */
  def driftMonitorSink(vecs: DataFrame, indexName: String, outDir: String,
      tol: Double = 0.05)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    vecs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        driftMonitorBatch(batch.toDF(), indexName, outDir, id, tol)
    }

  /** One [[driftMonitorSink]] trigger — exposed for the StreamingSpec
    * stream ≡ batch pin. */
  private[graft] def driftMonitorBatch(batch: DataFrame, indexName: String,
      outDir: String, id: Long, tol: Double): Unit = {
    val report = Similarity.centroidDriftIndexed(
      batch.sparkSession, indexName, batch, tol)
    report.coalesce(1).write.mode("overwrite").parquet(s"$outDir/batch=$id")
  }

  /** One [[semanticGateSink]] trigger — exposed so the retry contract is
    * directly testable (StreamingSpec replays a batch twice and asserts
    * byte-identical state).
    */
  private[graft] def semanticGateBatch(batch: DataFrame, indexName: String,
      outDir: String, id: Long, threshold: Double): Unit = {
    val b = batch.persist()
    try {
      val spark = b.sparkSession
      val cents = spark.table(s"${indexName}_centroids").orderBy("cid").collect()
        .map(_.getAs[scala.collection.Seq[Double]]("cv").toArray)
      require(cents.nonEmpty, s"ANN index $indexName has no centroids")
      val batchIds = b.select(col("vec_id")).distinct()
        .collect().map(_.getLong(0)).toSeq
      // assign the batch under the frozen quantizer: a scan-side literal
      // projection, computed once for the two screens AND the write
      val assigned = Similarity.assignBatch(b, cents).persist()
      try {
        val clusters = assigned.select(col("cluster")).distinct()
          .collect().map(_.getInt(0)).toSeq
        // (a) stored same-cluster neighbors — bucket-pruned to the
        // batch's clusters, current-batch ids excluded (retry safety)
        val stored = spark.table(s"${indexName}_assignments")
          .filter(if (clusters.isEmpty) lit(false)
            else col("bucket").isin(clusters.map(Integer.valueOf): _*))
          .filter(if (batchIds.isEmpty) lit(true)
            else !col("vec_id").isin(batchIds: _*))
          .select(col("bucket").as("cluster"),
            col("vec_id").as("seen_id"), col("v").as("sv"))
        val crossDrop = assigned.join(stored, Seq("cluster"))
          .filter(Similarity.dot(col("v"), col("sv")) >= threshold)
          .select(col("vec_id"))
        // (b) lower-id same-cluster sibling at ≥ threshold (rename-then-
        // join: the standard unambiguous self-join idiom)
        val sa = assigned.select(col("cluster").as("cl2"),
          col("vec_id").as("lo"), col("v").as("lv"))
        val withinDrop = assigned.join(sa,
            col("cluster") === col("cl2") && col("lo") < col("vec_id"))
          .filter(Similarity.dot(col("v"), col("lv")) >= threshold)
          .select(col("vec_id"))
        val out = b.join(crossDrop.union(withinDrop).distinct(),
          Seq("vec_id"), "left_anti").persist()
        try {
          (if (out.isEmpty) out.repartition(1) else out)
            .write.mode("overwrite").parquet(s"$outDir/batch=$id")
        } finally { out.unpersist(); () }
        // fold the WHOLE batch in, minus ids a failed attempt already
        // published
        val present =
          if (batchIds.isEmpty) Set.empty[Long]
          else spark.table(s"${indexName}_assignments")
            .filter(col("vec_id").isin(batchIds: _*))
            .select(col("vec_id")).collect().map(_.getLong(0)).toSet
        val novel =
          if (present.isEmpty) b
          else b.filter(!col("vec_id").isin(present.toSeq: _*))
        if (!novel.isEmpty)
          Similarity.upsertAnnIndex(spark, indexName, novel)
      } finally { assigned.unpersist(); () }
    } finally { b.unpersist(); () }
  }
}
