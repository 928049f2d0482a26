package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`) — the
  * beyond-parity ANN operators (SURVEY §7.2 step 10).
  *
  * Scale shape: the query set is small and broadcast; the corpus streams
  * once per top-k run. Scores are computed with `zip_with` + left-fold
  * `aggregate` — a fixed evaluation order, so doubles are bit-deterministic
  * regardless of partitioning.
  */
object Similarity {

  /** Dot product of two equal-length double arrays — native fused-loop
    * expression (see [[VectorOps]]), left-to-right accumulation so doubles
    * are bit-deterministic under any partitioning.
    */
  def dot(a: Column, b: Column): Column = VectorOps.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two double arrays. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** L2-normalize once at the source: pair scoring then needs a single dot
    * per pair instead of dot + two norms — the dominant cost when candidate
    * pairs outnumber vectors by orders of magnitude.
    */
  private[functions] def normalized(df: DataFrame): DataFrame =
    asDouble(df)
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      .filter(col("nrm") > 0)
      .select(col("vec_id"), transform(col("v"), x => x / col("nrm")).as("v"))

  /** Exact brute-force top-k cosine neighbors for each query vector.
    * `queries` is expected to be small (it is broadcast); the corpus side
    * streams through one scan — no shuffle until the final per-query top-k.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = normalized(corpus)
    val q = normalized(queries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val scored = c.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        dot(col("qv"), col("v")).as("score"))
    topKPerQuery(scored, k)
  }

  /** IVF-style approximate top-k: corpus and queries are assigned to
    * sign-bit buckets over the leading dimensions (a deterministic coarse
    * quantizer); each query only scores its own bucket's vectors, probing
    * `probeBits` single-bit flips of its bucket key for recall. At 100 TB
    * the bucketed join replaces the broadcast fan-out with a shuffle on
    * bucket keys, and per-bucket candidate lists stay small.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      signBits: Int = 8, probeBits: Int = 2): DataFrame = {
    require(signBits <= 16)
    def bucketOf(v: Column): Column = VectorOps.signBucket(v, 0, signBits)

    val c = normalized(corpus).withColumn("bucket", bucketOf(col("v")))
    // each query probes its bucket plus single-bit neighbors (multi-probe)
    val probes = array((lit(0) +: (0 until probeBits).map(b => lit(1 << b))): _*)
    val q = normalized(queries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
      .withColumn("qbucket", bucketOf(col("qv")))
      .select(col("query_id"), col("qv"),
        explode(transform(probes, m => col("qbucket").bitwiseXOR(m))).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        dot(col("qv"), col("v")).as("score"))
      // multi-probe can reach the same (query, neighbor) via ≤1 bucket only
      // (buckets partition the corpus), so no dedup needed before ranking
    topKPerQuery(scored, k)
  }

  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "score")
  }
}
