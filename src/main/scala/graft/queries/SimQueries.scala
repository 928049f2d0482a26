package graft.queries

import graft.functions.{Bpe, Dedup, MinhashIndex, Multimodal, Similarity, Takedown, TextAnalysis, Unigram}
import graft.oracles.PipelineOracles._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity / ANN query registrations (q_sim_*) — extracted verbatim from SparkEntry (round-14
  * decomposition, VERDICT r13 item 8): SparkEntry concatenates these
  * module lists, so the driver-contract maps are unchanged while no
  * single file holds the whole registry. The conventions (identical
  * aliases both sides, total ORDER BY, DOUBLE at the money boundary)
  * are documented on [[graft.SparkEntry]].
  */
private[graft] object SimQueries {

  /** Shared oracle of the drift family: the full k-means fit replay
    * (ivfFitCte), the reversed-slice batch normalized and assigned
    * under the SAME tie rule, and the per-cell occupancy report —
    * q_sim_drift_retrain (from-scratch) and q_sim_drift_indexed
    * (persisted quantizer) must both hash-match it.
    */
  private lazy val driftOracle: String =
    ivfFitCte(dim = 64, sampleSize = 256, centroids = 8, iters = 2) +
        ", b0 AS (SELECT vec_id, " +
        "[v[len(v) + 1 - i] FOR i IN range(1, len(v) + 1)] AS v " +
        "FROM e WHERE vec_id % 3 = 1), " +
        "b1 AS (SELECT vec_id, v, sqrt(" +
        foldSumSql("[x * x FOR x IN v]") + ") AS nrm FROM b0), " +
        "bvv AS (SELECT vec_id, [x / nrm FOR x IN v] AS v FROM b1 " +
        "WHERE nrm > 0), " +
        "bass AS (SELECT vec_id, cid AS bucket FROM (" +
        "SELECT bvv.vec_id, c.cid, row_number() OVER (PARTITION BY " +
        s"bvv.vec_id ORDER BY ${dotSql("bvv.v", "c.cv")} DESC, c.cid) " +
        "AS rn FROM bvv CROSS JOIN c2 c) WHERE rn = 1), " +
        "cellz AS (SELECT cid FROM c2), " +
        "ic AS (SELECT bucket AS cid, count(*) AS n_i FROM cass GROUP BY 1), " +
        "bc AS (SELECT bucket AS cid, count(*) AS n_b FROM bass GROUP BY 1), " +
        "rep AS (SELECT cellz.cid AS cluster, " +
        "CAST(COALESCE(n_i, 0) AS BIGINT) AS n_indexed, " +
        "CAST(COALESCE(n_b, 0) AS BIGINT) AS n_batch, " +
        "(SELECT count(*) FROM cass) AS ni, " +
        "(SELECT count(*) FROM bass) AS nb " +
        "FROM cellz LEFT JOIN ic ON ic.cid = cellz.cid " +
        "LEFT JOIN bc ON bc.cid = cellz.cid), " +
        "sh AS (SELECT cluster, n_indexed, n_batch, " +
        "CASE WHEN ni > 0 THEN CAST(n_indexed AS DOUBLE) / " +
        "CAST(ni AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS share_indexed, " +
        "CASE WHEN nb > 0 THEN CAST(n_batch AS DOUBLE) / " +
        "CAST(nb AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS share_batch " +
        "FROM rep) " +
        "SELECT CAST(cluster AS INT) AS cluster, n_indexed, n_batch, " +
        "share_indexed, share_batch, " +
        "share_batch - share_indexed AS shift, " +
        "abs(share_batch - share_indexed) > 0.05 AS drifted " +
        "FROM sh ORDER BY cluster"

  /** Shared oracle of the RRF family: both arms replayed verbatim
    * plus the left-nested IEEE fused sum — q_sim_hybrid_rrf
    * (from-scratch BM25) and q_sim_hybrid_rrf_indexed (persisted
    * postings) must both hash-match it (write→read fidelity for
    * the hybrid stack).
    */
  private lazy val rrfOracle: String =
    s"WITH ${bm25Ctes(Bm25Terms, 1.2, 0.75)}, " +
        "bq AS (SELECT doc_id, CAST(rank AS INT) AS bm25_rank FROM r " +
        "WHERE rank <= 50), " +
        s"$normEmbCte, " +
        "qn AS (SELECT v AS qv FROM nv WHERE vec_id = 0), " +
        "sc AS (SELECT c.vec_id AS doc_id, " +
        dotSql("qv", "c.v") + " AS score FROM nv c, qn WHERE c.vec_id <> 0), " +
        "sq AS (SELECT doc_id, cos_rank FROM (SELECT doc_id, " +
        "CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) " +
        "AS cos_rank FROM sc) WHERE cos_rank <= 50), " +
        "fj AS (SELECT COALESCE(bq.doc_id, sq.doc_id) AS doc_id, " +
        "bm25_rank, cos_rank FROM bq FULL OUTER JOIN sq " +
        "ON bq.doc_id = sq.doc_id), " +
        "fz AS (SELECT doc_id, bm25_rank, cos_rank, " +
        "COALESCE(CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + " +
        "CAST(bm25_rank AS DOUBLE)), CAST(0.0 AS DOUBLE)) + " +
        "COALESCE(CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + " +
        "CAST(cos_rank AS DOUBLE)), CAST(0.0 AS DOUBLE)) AS rrf_score " +
        "FROM fj), " +
        "rr AS (SELECT *, row_number() OVER (ORDER BY rrf_score DESC, " +
        "doc_id) AS rank FROM fz) " +
        "SELECT doc_id, bm25_rank, cos_rank, rrf_score, " +
        "CAST(rank AS INT) AS rank FROM rr WHERE rank <= 10 ORDER BY rank"

  /** Shared CTEs of the BQ family, parameterized by packed width: sign
    * packing of the leading `dims` normalized components into
    * `ceil(dims/32)` words (32 bits per word — the largest addend 2^31
    * stays positive BIGINT in both engines) and the negated-Hamming
    * scored relation `hs`, folded word by word. Pure integer arithmetic
    * until the final cast, so the coarse stage is engine-exact by
    * construction at ANY width.
    */
  private def bqCtes(dims: Int): String = {
    val nWords = (dims + 31) / 32
    def packSql(lo: Int, hi: Int): String =
      (lo until hi).map(i =>
        s"(CASE WHEN v[${i + 1}] > 0 THEN ${1L << (i - lo)} ELSE 0 END)")
        .mkString(" + ")
    val words = (0 until nWords).map { w =>
      val lo = w * 32; val hi = math.min(lo + 32, dims)
      s"CAST(${packSql(lo, hi)} AS BIGINT) AS b$w"
    }.mkString(", ")
    val qWords = (0 until nWords).map(w => s"b$w AS q${w}w").mkString(", ")
    val ham = (0 until nWords)
      .map(w => s"bit_count(xor(c.b$w, q${w}w))").mkString(" + ")
    s"WITH $normEmbCte, " +
      s"cp AS (SELECT vec_id, v, $words FROM nv), " +
      s"qp AS (SELECT vec_id AS query_id, v AS qv, $qWords " +
      "FROM cp WHERE vec_id % 100 = 0), " +
      "hs AS (SELECT query_id, c.vec_id AS neighbor_id, " +
      s"CAST(-($ham) " +
      "AS DOUBLE) AS score FROM cp c, qp WHERE c.vec_id <> query_id)"
  }

  private def bqRefinedOracleAt(dims: Int): String =
    bqCtes(dims) + ", q0 AS (SELECT query_id, qv FROM qp), " +
      shortlistCte("hs", 40, "sl") + ", " + refineTailSql("sl", 10)

  private lazy val bqRefinedOracle: String = bqRefinedOracleAt(64)

  private[graft] val queries: Seq[Q] = Seq(

    Q("q_sim_topk_brute",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") % 100 === 0), k = 10)
          .orderBy("query_id", "rank")
      },
      Some(s"WITH $normEmbCte, " +
        "q AS (SELECT vec_id AS query_id, v AS qv FROM nv WHERE vec_id % 100 = 0), " +
        "sc AS (SELECT query_id, c.vec_id AS neighbor_id, " +
        s"${dotSql("qv", "c.v")} AS score " +
        "FROM nv c, q WHERE c.vec_id <> q.query_id), " +
        topKSql("sc", 10))),


    // Metadata-FILTERED retrieval: each query's neighbors restricted to its
    // own `label` category — the attribute equality turns brute force's
    // broadcast fan-out into a hash equi-join on the attribute (per-query
    // candidates = one category's partition, pruned at the scan).
    Q("q_sim_topk_filtered",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.attributeFilteredTopK(emb,
            emb.filter(col("vec_id") % 100 === 0), k = 10, attrCol = "label")
          .orderBy("query_id", "rank")
      },
      Some("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, " +
        "label FROM embeddings), " +
        "n AS (SELECT vec_id, v, label, sqrt(" +
        foldSumSql("[x * x FOR x IN v]") + ") AS nrm FROM e), " +
        "nv AS (SELECT vec_id, [x / nrm FOR x IN v] AS v, label FROM n " +
        "WHERE nrm > 0), " +
        "q AS (SELECT vec_id AS query_id, v AS qv, label FROM nv " +
        "WHERE vec_id % 100 = 0), " +
        "sc AS (SELECT query_id, c.vec_id AS neighbor_id, " +
        s"${dotSql("qv", "c.v")} AS score FROM nv c " +
        "JOIN q ON c.label = q.label AND c.vec_id <> q.query_id), " +
        topKSql("sc", 10))),


    // Scalar (int8) quantization: per-dim min/max trained by one exact
    // selection aggregate (no k-means), queries scored against the
    // dequantized codes — the 4×-compression / low-distortion point on
    // the quantization curve (PQ holds the 32× end). The oracle replays
    // train, encode, decode, and the dim-ordered score fold.
    Q("q_sim_topk_sq8",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.sqTopK(emb, emb.filter(col("vec_id") % 100 === 0), k = 10)
          .orderBy("query_id", "rank")
      },
      Some(sq8Oracle)),


    // The persisted SQ access path under the same hash gate: build the
    // params+codes tables, answer FROM them, compare against the identical
    // from-scratch oracle — write→read fidelity (every retrieval stack now
    // has a gated persisted path: BM25, IVF, PQ, MinHash, bigram LM, SQ8).
    Q("q_sim_topk_sq8_indexed",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val name = "graft_sq_idx_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        Similarity.writeSqIndex(emb, name)
        try Similarity.sqSearchIndexed(s, name,
            emb.filter(col("vec_id") % 100 === 0), k = 10)
          .orderBy("query_id", "rank").localCheckpoint(true)
        finally Similarity.dropSqIndex(s, name)
      },
      Some(sq8Oracle)),


    // BINARY QUANTIZATION — the 1-bit end of the compression curve:
    // sign bits packed into two 32-bit words, candidates ranked by
    // bit_count(xor) Hamming distance (exact INTEGER arithmetic — the
    // whole coarse stage replays bit-for-bit, no quantizer fit, no
    // float sums). Ties break by neighbor id.
    Q("q_sim_topk_bq",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.bqTopK(emb, emb.filter(col("vec_id") % 100 === 0), k = 10)
          .orderBy("query_id", "rank")
      },
      Some(bqCtes(64) + ", " + topKSql("hs", 10))),


    // Non-64-dim BQ (round-16: the packing formerly hardwired two 32-bit
    // words = dims <= 64, a blocker for production widths): the same
    // Hamming top-k over the leading 48 components — an MRL-style prefix
    // slice — exercising the partial trailing word (32 + 16 bits). The
    // oracle replays the identical ceil(dims/32)-word fold.
    Q("q_sim_topk_bq48",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.bqTopK(emb, emb.filter(col("vec_id") % 100 === 0),
            k = 10, dims = 48)
          .orderBy("query_id", "rank")
      },
      Some(bqCtes(48) + ", " + topKSql("hs", 10))),


    // The production BQ stack: Hamming shortlist → exact full-dim
    // rescore (refineExact) — quantization error costs shortlist
    // membership only, never final order. Same refine replay as the
    // SQ8/MRL/IVFADC refined twins.
    Q("q_sim_topk_bq_refined",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.bqRefinedTopK(emb,
            emb.filter(col("vec_id") % 100 === 0), k = 10, shortlist = 40)
          .orderBy("query_id", "rank")
      },
      Some(bqRefinedOracle)),


    // FULLY-PERSISTED BQ: Hamming shortlist from the stored 8-byte
    // sign-word table, exact rescore from the stored vec_id-bucketed
    // raw vectors — SAME oracle as the from-scratch refined twin
    // (write->read fidelity; the sq8_refined_indexed discipline).
    Q("q_sim_topk_bq_refined_indexed",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val tag = java.util.UUID.randomUUID().toString.replace("-", "")
        val bqName = "graft_bq_idx_" + tag
        val vecName = "graft_bqv_idx_" + tag
        Similarity.writeBqIndex(emb, bqName)
        Similarity.writeVecTable(emb, vecName)
        try Similarity.bqRefinedSearchIndexed(s, bqName, vecName,
            emb.filter(col("vec_id") % 100 === 0), k = 10, shortlist = 40)
          .orderBy("query_id", "rank").localCheckpoint(true)
        finally {
          Similarity.dropBqIndex(s, bqName)
          Similarity.dropVecTable(s, vecName)
        }
      },
      Some(bqRefinedOracle)),


    // The persisted BQ path at a NON-64 width (round-16): the migrated
    // array<bigint> `words` schema written at dims=48, Hamming shortlist
    // read back from it, exact rescore from the stored vectors — gating
    // that the schema migration holds end-to-end where the old two-column
    // (b0, b1) layout could not exist.
    Q("q_sim_topk_bq48_refined_indexed",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val tag = java.util.UUID.randomUUID().toString.replace("-", "")
        val bqName = "graft_bq48_idx_" + tag
        val vecName = "graft_bq48v_idx_" + tag
        Similarity.writeBqIndex(emb, bqName, dims = 48)
        Similarity.writeVecTable(emb, vecName)
        try Similarity.bqRefinedSearchIndexed(s, bqName, vecName,
            emb.filter(col("vec_id") % 100 === 0), k = 10, shortlist = 40,
            dims = 48)
          .orderBy("query_id", "rank").localCheckpoint(true)
        finally {
          Similarity.dropBqIndex(s, bqName)
          Similarity.dropVecTable(s, vecName)
        }
      },
      Some(bqRefinedOracleAt(48))),


    // Two-stage retrieval: SQ8 shortlist (the memory-bound codes scan) →
    // EXACT rescoring of |queries|×40 raw vectors (FAISS IndexRefineFlat
    // semantics). Compression error then only affects shortlist
    // membership, never final order — the oracle replays both stages.
    Q("q_sim_topk_sq8_refined",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.sqRefinedTopK(emb,
            emb.filter(col("vec_id") % 100 === 0), k = 10, shortlist = 40)
          .orderBy("query_id", "rank")
      },
      Some(s"WITH $sq8ScoredCtes, ${shortlistCte("sc", 40, "sl")}, " +
        refineTailSql("sl", 10))),


    // FULLY-PERSISTED two-stage retrieval: ADC shortlist from the stored
    // SQ codes, exact rescore from the stored vec_id-BUCKETED raw-vector
    // table via a shortlist-id IN filter (bucket-pruned point reads —
    // the refine family's deployment shape). Same oracle as the
    // from-scratch refined query = write→read fidelity for BOTH tables.
    Q("q_sim_topk_sq8_refined_indexed",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val tag = java.util.UUID.randomUUID().toString.replace("-", "")
        val sqName = "graft_sqr_idx_" + tag
        val vecName = "graft_vec_idx_" + tag
        Similarity.writeSqIndex(emb, sqName)
        Similarity.writeVecTable(emb, vecName)
        try Similarity.sqRefinedSearchIndexed(s, sqName, vecName,
            emb.filter(col("vec_id") % 100 === 0), k = 10, shortlist = 40)
          .orderBy("query_id", "rank").localCheckpoint(true)
        finally {
          Similarity.dropSqIndex(s, sqName)
          Similarity.dropVecTable(s, vecName)
        }
      },
      Some(s"WITH $sq8ScoredCtes, ${shortlistCte("sc", 40, "sl")}, " +
        refineTailSql("sl", 10))),


    // Matryoshka (prefix-dimension) retrieval: coarse scores over the
    // FIRST 16 of 64 dims (a slice projection — no training pass at all),
    // exact full-dim refine on the 40-deep shortlist.
    Q("q_sim_topk_mrl",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.mrlRefinedTopK(emb,
            emb.filter(col("vec_id") % 100 === 0), k = 10,
            prefixDims = 16, shortlist = 40)
          .orderBy("query_id", "rank")
      },
      Some(s"WITH $normEmbCte, " +
        "q0 AS (SELECT vec_id AS query_id, v AS qv FROM nv " +
        "WHERE vec_id % 100 = 0), " +
        "scp AS (SELECT query_id, c.vec_id AS neighbor_id, " +
        s"${foldSumSql("[q0.qv[i] * c.v[i] FOR i IN range(1, 17)]")} " +
        "AS score FROM nv c, q0 WHERE c.vec_id <> q0.query_id), " +
        s"${shortlistCte("scp", 40, "sl")}, " + refineTailSql("sl", 10))),


    // RETRIEVAL EVAL — MRR + precision@10 of the brute-force stack under
    // label relevance (neighbor relevant ⟺ shares the anchor's label):
    // the per-query eval report beside the recall certificates. Exact
    // counts, exact-rational MRR; nDCG lives in q_sim_eval_ndcg via
    // driver-literal discount weights (no runtime ln on either engine).
    Q("q_sim_eval_mrr",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val qs = emb.filter(col("vec_id") % 100 === 0)
        Similarity.retrievalEval(
            Similarity.bruteForceTopK(emb, qs, k = 10), emb, k = 10)
          .orderBy("query_id")
      },
      Some(s"WITH $normEmbCte, " +
        "q AS (SELECT vec_id AS query_id, v AS qv FROM nv " +
        "WHERE vec_id % 100 = 0), " +
        "sc AS (SELECT query_id, c.vec_id AS neighbor_id, " +
        s"${dotSql("qv", "c.v")} AS score " +
        "FROM nv c, q WHERE c.vec_id <> q.query_id), " +
        "rr AS (SELECT query_id, neighbor_id, " +
        "row_number() OVER (PARTITION BY query_id " +
        "ORDER BY score DESC, neighbor_id) AS rank FROM sc), " +
        "res AS (SELECT * FROM rr WHERE rank <= 10), " +
        "lb AS (SELECT vec_id, label FROM embeddings), " +
        "j AS (SELECT res.query_id, res.rank, " +
        "(ql.label IS NOT NULL AND ql.label = nb.label) AS rel FROM res " +
        "LEFT JOIN lb ql ON ql.vec_id = res.query_id " +
        "LEFT JOIN lb nb ON nb.vec_id = res.neighbor_id), " +
        "g AS (SELECT query_id, count(*) AS n_retrieved, " +
        "sum(CASE WHEN rel THEN 1 ELSE 0 END) AS n_rel, " +
        "min(CASE WHEN rel THEN rank END) AS fr FROM j GROUP BY query_id) " +
        "SELECT query_id, CAST(n_retrieved AS BIGINT) AS n_retrieved, " +
        "CAST(n_rel AS BIGINT) AS n_relevant, " +
        "CAST(n_rel AS DOUBLE) / CAST(10 AS DOUBLE) AS precision_at_k, " +
        "COALESCE(CAST(1 AS DOUBLE) / CAST(fr AS DOUBLE), " +
        "CAST(0 AS DOUBLE)) AS mrr FROM g ORDER BY query_id")),


    // nDCG@10 — the graded-position eval beside precision/MRR. The rank
    // discounts 1/log2(r+1) and their prefix sums are DRIVER-computed
    // literals baked into BOTH engines (neither calls log at runtime —
    // the libm-drift objection in retrievalEval's scaladoc dissolves);
    // per-rank contributions aggregate as max (≤1 row per (query, rank),
    // no float-sum order exists) and fold left-nested in rank order.
    // IDCG normalizes by min(corpus-total relevant, k) — the standard
    // trec_eval rule (round-16 fix; was list-conditional).
    Q("q_sim_eval_ndcg",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val qs = emb.filter(col("vec_id") % 100 === 0)
        Similarity.ndcgAtK(
            Similarity.bruteForceTopK(emb, qs, k = 10), emb, k = 10)
          .orderBy("query_id")
      },
      Some {
        val (ws, ps) = Similarity.ndcgWeights(10)
        def wl(d: Double) = s"CAST('$d' AS DOUBLE)"
        val termCols = (1 to 10).map(r =>
          s"max(CASE WHEN rank = $r AND rel THEN ${wl(ws(r - 1))} " +
            s"ELSE CAST(0.0 AS DOUBLE) END) AS t$r").mkString(", ")
        val idcgCase = "CASE WHEN m = 0 THEN CAST(0.0 AS DOUBLE) " +
          (1 to 10).map(r =>
            s"WHEN m = $r THEN ${wl(ps(r - 1))} ").mkString +
          s"ELSE ${wl(ps(9))} END"
        s"WITH $normEmbCte, " +
          "q AS (SELECT vec_id AS query_id, v AS qv FROM nv " +
          "WHERE vec_id % 100 = 0), " +
          "sc AS (SELECT query_id, c.vec_id AS neighbor_id, " +
          s"${dotSql("qv", "c.v")} AS score " +
          "FROM nv c, q WHERE c.vec_id <> q.query_id), " +
          "rr AS (SELECT query_id, neighbor_id, " +
          "row_number() OVER (PARTITION BY query_id " +
          "ORDER BY score DESC, neighbor_id) AS rank FROM sc), " +
          "res AS (SELECT * FROM rr WHERE rank <= 10), " +
          "lb AS (SELECT vec_id, label FROM embeddings), " +
          "lcn AS (SELECT label, count(*) AS lcnt FROM lb " +
          "WHERE label IS NOT NULL GROUP BY label), " +
          "qt AS (SELECT ql.vec_id AS query_id, " +
          "CAST(COALESCE(lcn.lcnt - 1, 0) AS BIGINT) AS nrt " +
          "FROM lb ql LEFT JOIN lcn ON ql.label = lcn.label " +
          "WHERE ql.vec_id % 100 = 0), " +
          "j AS (SELECT res.query_id, res.rank, " +
          "(ql.label IS NOT NULL AND ql.label = nb.label) AS rel FROM res " +
          "LEFT JOIN lb ql ON ql.vec_id = res.query_id " +
          "LEFT JOIN lb nb ON nb.vec_id = res.neighbor_id), " +
          "g AS (SELECT query_id, " +
          "sum(CASE WHEN rel THEN 1 ELSE 0 END) AS n_rel, " +
          s"$termCols FROM j GROUP BY query_id), " +
          "d AS (SELECT g.query_id, CAST(n_rel AS BIGINT) AS n_relevant, " +
          "qt.nrt AS n_rel_total, LEAST(qt.nrt, 10) AS m, " +
          (1 to 10).map(r => s"t$r").mkString(" + ") + " AS dcg " +
          "FROM g JOIN qt ON g.query_id = qt.query_id), " +
          s"dd AS (SELECT query_id, n_relevant, n_rel_total, dcg, " +
          s"$idcgCase AS idcg FROM d) " +
          "SELECT query_id, n_relevant, n_rel_total, dcg, " +
          "CASE WHEN idcg > 0.0 THEN dcg / idcg " +
          "ELSE CAST(0.0 AS DOUBLE) END AS ndcg " +
          "FROM dd ORDER BY query_id"
      }),


    // HARD-NEGATIVE MINING — contrastive training data: per labeled
    // anchor, the k nearest vectors with a DIFFERENT label (the
    // confusable negatives). The label inequality keeps it a broadcast
    // scoring join (q_sim_topk_brute class); NULL-label rows drop out on
    // both sides.
    Q("q_sim_hard_negatives",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.hardNegatives(emb,
            emb.filter(col("vec_id") % 100 === 0), k = 10)
          .orderBy("query_id", "rank")
      },
      Some("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, " +
        "label FROM embeddings), " +
        "n AS (SELECT vec_id, v, label, sqrt(" +
        foldSumSql("[x * x FOR x IN v]") + ") AS nrm FROM e), " +
        "nv AS (SELECT vec_id, [x / nrm FOR x IN v] AS v, label FROM n " +
        "WHERE nrm > 0), " +
        "q AS (SELECT vec_id AS query_id, v AS qv, label FROM nv " +
        "WHERE vec_id % 100 = 0 AND label IS NOT NULL), " +
        "sc AS (SELECT query_id, c.vec_id AS neighbor_id, " +
        s"${dotSql("qv", "c.v")} AS score FROM nv c " +
        "JOIN q ON c.label <> q.label), " +
        topKSql("sc", 10))),


    // CONTRASTIVE TRIPLETS — the complete training-row factory (the
    // query above mines only the negative half): per labeled anchor, the
    // nearest same-label vector crossed with the 4 nearest
    // different-label vectors, one (anchor, positive, negative) row per
    // combination with the pos−neg margin. One corpus stream scores both
    // arms; one (query, same-flag)-keyed window ranks them; the cross is
    // |anchors|·1·4 bounded rows.
    Q("q_sim_triplets",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.contrastiveTriplets(emb,
            emb.filter(col("vec_id") % 100 === 0),
            positives = 1, negatives = 4)
          .orderBy("query_id", "pos_rank", "neg_rank")
      },
      Some("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, " +
        "label FROM embeddings), " +
        "n AS (SELECT vec_id, v, label, sqrt(" +
        foldSumSql("[x * x FOR x IN v]") + ") AS nrm FROM e), " +
        "nv AS (SELECT vec_id, [x / nrm FOR x IN v] AS v, label FROM n " +
        "WHERE nrm > 0), " +
        "q AS (SELECT vec_id AS query_id, v AS qv, label AS qlabel " +
        "FROM nv WHERE vec_id % 100 = 0 AND label IS NOT NULL), " +
        "sc AS (SELECT query_id, (c.label = qlabel) AS same, " +
        "c.vec_id AS neighbor_id, " +
        s"${dotSql("qv", "c.v")} AS score FROM nv c " +
        "JOIN q ON c.vec_id <> q.query_id WHERE c.label IS NOT NULL), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY query_id, same " +
        "ORDER BY score DESC, neighbor_id) AS rank FROM sc), " +
        "p AS (SELECT query_id, neighbor_id AS positive_id, " +
        "CAST(rank AS INT) AS pos_rank, score AS pos_score FROM r " +
        "WHERE same AND rank <= 1), " +
        "g AS (SELECT query_id, neighbor_id AS negative_id, " +
        "CAST(rank AS INT) AS neg_rank, score AS neg_score FROM r " +
        "WHERE NOT same AND rank <= 4) " +
        "SELECT p.query_id, positive_id, pos_rank, pos_score, " +
        "negative_id, neg_rank, neg_score, " +
        "pos_score - neg_score AS margin " +
        "FROM p JOIN g USING (query_id) " +
        "ORDER BY query_id, pos_rank, neg_rank")),


    // IVF multi-probe: 8 leading sign bits as the coarse quantizer, probes
    // = {bucket, bucket^1, bucket^2}, per-bucket scoring, exact top-k.
    Q("q_sim_topk_ivf",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.ivfTopK(emb, emb.filter(col("vec_id") % 100 === 0), k = 10)
          .orderBy("query_id", "rank")
      },
      Some(s"WITH $normEmbCte, " +
        "c AS (SELECT vec_id, v, CAST(list_sum([CASE WHEN v[j + 1] >= 0 " +
        "THEN CAST(power(2, j) AS BIGINT) ELSE 0 END FOR j IN range(0, 8)]) " +
        "AS BIGINT) AS bucket FROM nv), " +
        "q0 AS (SELECT vec_id AS query_id, v AS qv, bucket AS qbucket " +
        "FROM c WHERE vec_id % 100 = 0), " +
        "q AS (SELECT query_id, qv, xor(qbucket, m) AS bucket " +
        "FROM q0, (SELECT unnest([0, 1, 2]) AS m) mm), " +
        "sc AS (SELECT query_id, c.vec_id AS neighbor_id, " +
        s"${dotSql("qv", "c.v")} AS score " +
        "FROM c JOIN q USING (bucket) WHERE c.vec_id <> q.query_id), " +
        topKSql("sc", 10))),


    // IVF with the TRAINED coarse quantizer (spherical k-means on a
    // 256-vector id-mix sample, 2 Lloyd rounds, 8 centroids, 4 probes —
    // the default probe count tuned against the recall@10 ≥ 0.8 floor;
    // the sample permutation is the shared sampleHashSql). The oracle
    // replays the ENTIRE fit — init, tie-broken assignment, fold-ordered
    // means, renormalization — so a single drifted double anywhere in
    // training would flip an assignment and fail the hash.
    Q("q_sim_topk_ivf_trained",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.ivfTrainedTopK(emb, emb.filter(col("vec_id") % 100 === 0), k = 10)
          .orderBy("query_id", "rank")
      },
      Some(ivfTrainedOracle(dim = 64, sampleSize = 256, centroids = 8,
        iters = 2, nprobe = 4, topk = 10))),


    // The PERSISTED-index graph build: same edges as q_sim_knn_graph
    // (same oracle — write→read fidelity), but both sides of the cell
    // join READ the bucketed assignments table and the fit was paid at
    // writeAnnIndex time. The artifact search, SemDeDup, and the graph
    // build now share. Unique name + eager materialization + finally-drop.
    Q("q_sim_knn_graph_indexed",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val name = "graft_knn_idx_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        Similarity.writeAnnIndex(emb, name, centroids = 8,
          sampleSize = 256, iters = 2)
        try Similarity.knnGraphIndexed(s, name, k = 5, nprobe = 2)
          .orderBy("query_id", "rank").localCheckpoint(true)
        finally Similarity.dropAnnIndex(s, name)
      },
      Some(ivfTrainedScoredCtes(dim = 64, sampleSize = 256, centroids = 8,
        iters = 2, nprobe = 2, queryWhere = "") + ", " + topKSql("sc", 5))),


    // k-NN GRAPH over the whole corpus: every vector's 5 nearest under
    // the trained quantizer's probe pruning — the artifact semantic
    // dedup, graph clustering, and hard-negative mining consume. NO
    // driver-side query collect: the corpus is both sides, probe
    // selection is a scan-side ranking of the literal centroid table
    // (score desc, cid asc — the training tie rule), and the oracle is
    // the trained-IVF replay with the query CTE widened to ALL vectors.
    Q("q_sim_knn_graph",
      (s, d) => Similarity.knnGraph(Tables.embeddings(s, d), k = 5,
          nprobe = 2)
        .orderBy("query_id", "rank"),
      Some(ivfTrainedScoredCtes(dim = 64, sampleSize = 256, centroids = 8,
        iters = 2, nprobe = 2, queryWhere = "") + ", " + topKSql("sc", 5))),

    // The k-NN graph at 96 cells — ABOVE twoLevelThreshold, so member
    // assignment and probe selection run the TWO-LEVEL coarse quantizer
    // (r14): this gate hash-pins the hierarchical rule itself — the
    // super fit over the centroid rows, empty-super drop, the
    // worst-case-coverage probe-super count, and the children-only
    // argmax — via a full DuckDB replay (twoLevelGraphOracle), where the
    // 8-cell graph above pins the flat path.
    Q("q_sim_knn_graph_2lvl",
      (s, d) => Similarity.knnGraph(Tables.embeddings(s, d), k = 5,
          centroids = 96, nprobe = 3, sampleSize = 384, iters = 2)
        .orderBy("query_id", "rank"),
      Some(twoLevelGraphOracle(dim = 64, sampleSize = 384, centroids = 96,
        iters = 2, nprobe = 3, topk = 5))),


    // The PERSISTED trained-IVF index: same fit, same oracle, but the
    // corpus assignment is paid once at writeAnnIndex time and the search
    // reads only the probed cells' buckets — the interactive ANN access
    // path at 100 TB. Unique table name per invocation + eager
    // materialization + finally-drop: the q_text_bm25_indexed pattern
    // (concurrent bench/verify processes share the warehouse).
    Q("q_sim_topk_ivf_indexed",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val name = "graft_ann_idx_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        Similarity.writeAnnIndex(emb, name, centroids = 8,
          sampleSize = 256, iters = 2)
        try Similarity.annSearchIndexed(s, name,
          emb.filter(col("vec_id") % 100 === 0), k = 10, nprobe = 4)
          .orderBy("query_id", "rank").localCheckpoint(true)
        finally Similarity.dropAnnIndex(s, name)
      },
      Some(ivfTrainedOracle(dim = 64, sampleSize = 256, centroids = 8,
        iters = 2, nprobe = 4, topk = 10))),


    // INCREMENTAL ANN index maintenance: build the index on the first 300
    // vectors, UPSERT the rest as an ingest batch — assigned against the
    // persisted centroids, appended under the table's bucket spec,
    // O(batch) not O(corpus) — then search the grown index. The quantizer
    // is FROZEN at build time (the standard IVF maintenance trade), so the
    // oracle replays exactly that contract: the k-means fit samples ONLY
    // the initial slice (sampleWhere) while assignment and scoring cover
    // initial ∪ batch. The hash gate therefore proves the full upsert
    // semantics — frozen-quantizer assignment of the batch + pruned search
    // over the grown index. (Upsert ≡ one full rebuild additionally holds
    // whenever the union's training sample is contained in the initial
    // corpus — BucketedSpec pins that equivalence on a fixture built to
    // satisfy the containment.)
    Q("q_sim_topk_ivf_upsert",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val name = "graft_ann_ups_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        Similarity.writeAnnIndex(emb.filter(col("vec_id") < 300), name,
          centroids = 8, sampleSize = 256, iters = 2)
        try {
          Similarity.upsertAnnIndex(s, name, emb.filter(col("vec_id") >= 300))
          Similarity.annSearchIndexed(s, name,
            emb.filter(col("vec_id") % 100 === 0), k = 10, nprobe = 4)
            .orderBy("query_id", "rank").localCheckpoint(true)
        } finally Similarity.dropAnnIndex(s, name)
      },
      Some(ivfTrainedOracle(dim = 64, sampleSize = 256, centroids = 8,
        iters = 2, nprobe = 4, topk = 10,
        sampleWhere = "WHERE vec_id < 300"))),


    // TARGETED DELETION from the ANN index — the upsert gate's MIRROR,
    // exercising BOTH deletion halves through one hash: exact clones of
    // every query vector are upserted (each would answer at cosine 1.0,
    // rank 1), tombstoned via deleteFromAnnIndex, then COMPACTED (the
    // staged bucket-spec rewrite physically purges them), and the search
    // over the rewritten table must answer exactly the frozen-quantizer
    // oracle over the original corpus.
    Q("q_sim_topk_ivf_deleted",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val qs = emb.filter(col("vec_id") % 100 === 0)
        val name = "graft_ann_del_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        Similarity.writeAnnIndex(emb, name, centroids = 8,
          sampleSize = 256, iters = 2)
        val cloneIds = qs.select("vec_id").collect()
          .map(_.getLong(0) + 10000000L).toSeq
        try {
          Similarity.upsertAnnIndex(s, name,
            qs.select((col("vec_id") + 10000000L).as("vec_id"),
              col("embedding")))
          Similarity.deleteFromAnnIndex(s, name, cloneIds)
          Similarity.compactAnnIndex(s, name)
          Similarity.annSearchIndexed(s, name, qs, k = 10, nprobe = 4)
            .orderBy("query_id", "rank").localCheckpoint(true)
        } finally Similarity.dropAnnIndex(s, name)
      },
      Some(ivfTrainedOracle(dim = 64, sampleSize = 256, centroids = 8,
        iters = 2, nprobe = 4, topk = 10))),


    // RECALL@10 of the trained-IVF path against brute force — the
    // evaluation operator that turns an ANN configuration claim into a
    // measured, oracle-certified number per query (and lets a deployment
    // tune nprobe/centroids against real recall instead of folklore). The
    // oracle replays BOTH retrieval stacks and the intersection count.
    Q("q_sim_recall_ivf",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val qs = emb.filter(col("vec_id") % 100 === 0)
        Similarity.recallAtK(
          Similarity.ivfTrainedTopK(emb, qs, k = 10),
          Similarity.bruteForceTopK(emb, qs, k = 10), k = 10)
          .orderBy("query_id")
      },
      Some(ivfRecallOracle(dim = 64, sampleSize = 256, centroids = 8,
        iters = 2, nprobe = 4, topk = 10))),


    // RECALL@10 of the plain-PQ ADC stack — quantization loss as a
    // measured number (what m/ksub buy or cost), same oracle-certified
    // evaluation shape as q_sim_recall_ivf. Runs at the recall-tuned
    // default config (m=16/ksub=32, 16× compression) — the max-compression
    // point (m=8/ksub=16) is pinned by the q_sim_topk_pq* family.
    Q("q_sim_recall_pq",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val qs = emb.filter(col("vec_id") % 100 === 0)
        Similarity.recallAtK(
          Similarity.pqTopK(emb, qs, k = 10, m = 16, ksub = 32,
            sampleSize = 256, iters = 2),
          Similarity.bruteForceTopK(emb, qs, k = 10), k = 10)
          .orderBy("query_id")
      },
      Some(pqRecallOracle(dim = 64, m = 16, ksub = 32, sampleSize = 256,
        iters = 2, topk = 10))),


    // RECALL@10 of the composed IVF+PQ stack — the production ANN shape's
    // end-to-end accuracy (cell-pruning misses + quantization loss
    // together), the number a deployment tunes nprobe/m/ksub against.
    Q("q_sim_recall_ivfpq",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val qs = emb.filter(col("vec_id") % 100 === 0)
        Similarity.recallAtK(
          Similarity.ivfPqTopK(emb, qs, k = 10, centroids = 8, nprobe = 4,
            m = 16, ksub = 32, sampleSize = 256, iters = 2),
          Similarity.bruteForceTopK(emb, qs, k = 10), k = 10)
          .orderBy("query_id")
      },
      Some(ivfPqRecallOracle(dim = 64, sampleSize = 256, centroids = 8,
        m = 16, ksub = 32, iters = 2, nprobe = 4, topk = 10))),


    // RECALL@10 of the TRUE-IVFADC stack (residual encoding) at the SAME
    // bits as q_sim_recall_ivfpq — the residual-vs-raw recall gain as two
    // oracle-certified numbers side by side (BucketedSpec asserts the
    // ordering; this query certifies the values).
    Q("q_sim_recall_ivfpq_res",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val qs = emb.filter(col("vec_id") % 100 === 0)
        Similarity.recallAtK(
          Similarity.ivfPqResidualTopK(emb, qs, k = 10, centroids = 8,
            nprobe = 4, m = 16, ksub = 32, sampleSize = 256, iters = 2),
          Similarity.bruteForceTopK(emb, qs, k = 10), k = 10)
          .orderBy("query_id")
      },
      Some(ivfPqResRecallOracle(dim = 64, sampleSize = 256, centroids = 8,
        m = 16, ksub = 32, iters = 2, nprobe = 4, topk = 10))),


    // The PERSISTED ground-truth variants of the three heaviest recall
    // rows: brute-force exact top-10 of the pinned eval set is a build
    // artifact (writeGroundTruth, query_id-bucketed), and every
    // quantizer-configuration evaluation re-READS it instead of
    // re-scanning the corpus per run — the index discipline applied to
    // evaluation. SAME oracles as the one-shot twins: hash equality
    // certifies write→read fidelity of the truth table end-to-end
    // through the recall arithmetic. Unique name + eager
    // materialization + finally-drop (the q_text_bm25_indexed pattern).
    Q("q_sim_recall_pq_indexed",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val qs = emb.filter(col("vec_id") % 100 === 0)
        val name = "graft_gt_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        Similarity.writeGroundTruth(emb, qs, k = 10, name)
        try Similarity.recallAtKIndexed(s, name,
            Similarity.pqTopK(emb, qs, k = 10, m = 16, ksub = 32,
              sampleSize = 256, iters = 2), k = 10)
          .orderBy("query_id").localCheckpoint(true)
        finally Similarity.dropGroundTruth(s, name)
      },
      Some(pqRecallOracle(dim = 64, m = 16, ksub = 32, sampleSize = 256,
        iters = 2, topk = 10))),


    Q("q_sim_recall_ivfpq_indexed",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val qs = emb.filter(col("vec_id") % 100 === 0)
        val name = "graft_gt_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        Similarity.writeGroundTruth(emb, qs, k = 10, name)
        try Similarity.recallAtKIndexed(s, name,
            Similarity.ivfPqTopK(emb, qs, k = 10, centroids = 8, nprobe = 4,
              m = 16, ksub = 32, sampleSize = 256, iters = 2), k = 10)
          .orderBy("query_id").localCheckpoint(true)
        finally Similarity.dropGroundTruth(s, name)
      },
      Some(ivfPqRecallOracle(dim = 64, sampleSize = 256, centroids = 8,
        m = 16, ksub = 32, iters = 2, nprobe = 4, topk = 10))),


    Q("q_sim_recall_ivfpq_res_indexed",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val qs = emb.filter(col("vec_id") % 100 === 0)
        val name = "graft_gt_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        Similarity.writeGroundTruth(emb, qs, k = 10, name)
        try Similarity.recallAtKIndexed(s, name,
            Similarity.ivfPqResidualTopK(emb, qs, k = 10, centroids = 8,
              nprobe = 4, m = 16, ksub = 32, sampleSize = 256, iters = 2),
            k = 10)
          .orderBy("query_id").localCheckpoint(true)
        finally Similarity.dropGroundTruth(s, name)
      },
      Some(ivfPqResRecallOracle(dim = 64, sampleSize = 256, centroids = 8,
        m = 16, ksub = 32, iters = 2, nprobe = 4, topk = 10))),


    // PRODUCT QUANTIZATION top-k: 64-dim floats → 8 sub-codes (32× memory
    // cut), search = code scan + per-query lookup tables (ADC). The
    // memory-bound regime's ANN at 100 TB — the codes table fits where
    // the raw vectors don't. Oracle replays all 8 per-subspace k-means
    // fits, the corpus encode, and the LUT-equivalent sub-dot sums.
    Q("q_sim_topk_pq",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.pqTopK(emb, emb.filter(col("vec_id") % 100 === 0),
          k = 10, m = 8, ksub = 16, sampleSize = 256, iters = 2)
          .orderBy("query_id", "rank")
      },
      Some(pqOracle(dim = 64, m = 8, ksub = 16, sampleSize = 256,
        iters = 2, topk = 10))),


    // The PERSISTED PQ index: same fit, same oracle, but train+encode are
    // paid at writePqIndex time and the search scans only the ~30×-smaller
    // codes table — the interactive ADC access path (the ivf_indexed /
    // bm25_indexed pattern: unique name per invocation, finally-drop).
    Q("q_sim_topk_pq_indexed",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val name = "graft_pq_idx_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        Similarity.writePqIndex(emb, name, m = 8, ksub = 16,
          sampleSize = 256, iters = 2)
        try Similarity.pqSearchIndexed(s, name,
          emb.filter(col("vec_id") % 100 === 0), k = 10)
          .orderBy("query_id", "rank").localCheckpoint(true)
        finally Similarity.dropPqIndex(s, name)
      },
      Some(pqOracle(dim = 64, m = 8, ksub = 16, sampleSize = 256,
        iters = 2, topk = 10))),


    // IVF + PQ composed: coarse cells prune the scan to nprobe/centroids
    // of the corpus, PQ codes + lookup tables score what remains — the
    // production ANN shape (IO fraction and per-row arithmetic both drop).
    // The oracle composes both fit chains verbatim and scores only the
    // probed cells' codes.
    Q("q_sim_topk_ivfpq",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.ivfPqTopK(emb, emb.filter(col("vec_id") % 100 === 0),
          k = 10, centroids = 8, nprobe = 4, m = 8, ksub = 16,
          sampleSize = 256, iters = 2)
          .orderBy("query_id", "rank")
      },
      Some(ivfPqOracle(dim = 64, sampleSize = 256, centroids = 8,
        m = 8, ksub = 16, iters = 2, nprobe = 4, topk = 10))),


    // TRUE IVFADC (Jégou et al. 2011): same cell pruning + code budget as
    // q_sim_topk_ivfpq, but codes quantize the residual to the assigned
    // coarse centroid and the score adds the per-(query, cell) base term
    // dot(q, c) before ranking. The oracle replays the residual fit/encode
    // over the residual relations verbatim and the base-plus-fold score.
    Q("q_sim_topk_ivfpq_res",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.ivfPqResidualTopK(emb,
          emb.filter(col("vec_id") % 100 === 0),
          k = 10, centroids = 8, nprobe = 4, m = 8, ksub = 16,
          sampleSize = 256, iters = 2)
          .orderBy("query_id", "rank")
      },
      Some(ivfPqResOracle(dim = 64, sampleSize = 256, centroids = 8,
        m = 8, ksub = 16, iters = 2, nprobe = 4, topk = 10))),


    // IVFADC + REFINE — the full production retrieval stack: cell pruning
    // bounds candidates, residual-PQ ADC scores codes, and only the
    // 40-deep shortlist touches raw vectors for the EXACT final order
    // (refine is what ADC distortion needs; IVF-Flat's exact candidate
    // scores would gain nothing). Max-compression m=8/ksub=16 — the
    // config where refine matters most.
    Q("q_sim_topk_ivfadc_refined",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.ivfAdcRefinedTopK(emb,
            emb.filter(col("vec_id") % 100 === 0),
            k = 10, shortlist = 40, centroids = 8, nprobe = 4,
            m = 8, ksub = 16, sampleSize = 256, iters = 2)
          .orderBy("query_id", "rank")
      },
      Some(ivfPqResScoredCtes(dim = 64, sampleSize = 256, centroids = 8,
        m = 8, ksub = 16, iters = 2, nprobe = 4) + ", " +
        s"${shortlistCte("sc", 40, "sl")}, " + refineTailSql("sl", 10))),


    // The PERSISTED IVFADC index: same fit, same oracle — train+encode
    // paid at writeIvfPqResIndex time, search reads only the probed
    // cells' buckets of the m-int codes table (bucket pruning × ADC, the
    // production ANN access shape). Hash equality against the one-shot
    // oracle certifies write→read fidelity.
    Q("q_sim_topk_ivfpq_res_indexed",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val name = "graft_ivfadc_idx_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        Similarity.writeIvfPqResIndex(emb, name, centroids = 8, m = 8,
          ksub = 16, sampleSize = 256, iters = 2)
        try Similarity.ivfPqResSearchIndexed(s, name,
          emb.filter(col("vec_id") % 100 === 0), k = 10, nprobe = 4)
          .orderBy("query_id", "rank").localCheckpoint(true)
        finally Similarity.dropIvfPqResIndex(s, name)
      },
      Some(ivfPqResOracle(dim = 64, sampleSize = 256, centroids = 8,
        m = 8, ksub = 16, iters = 2, nprobe = 4, topk = 10))),


    // IVF cell-balance report: per trained cell, member count / id range /
    // corpus share — probe cost IS share summed over probed cells, so a
    // skewed fit silently inflates every search; this query makes that
    // drift a number (the re-fit cadence signal). The oracle replays the
    // fit + assignment and the integer-exact share division.
    Q("q_sim_cell_stats",
      (s, d) => Similarity.cellStats(Tables.embeddings(s, d),
          centroids = 8, sampleSize = 256, iters = 2)
        .orderBy("cluster"),
      Some(ivfFitCte(dim = 64, sampleSize = 256, centroids = 8, iters = 2) +
        " SELECT CAST(bucket AS INT) AS cluster, " +
        "CAST(count(*) AS BIGINT) AS n_members, " +
        "min(vec_id) AS min_vec, max(vec_id) AS max_vec, " +
        "CAST(count(*) AS DOUBLE) / CAST((SELECT count(*) FROM cass) AS DOUBLE) " +
        "AS share " +
        "FROM cass GROUP BY bucket ORDER BY cluster")),


    // CENTROID-OCCUPANCY DRIFT — the retrain-policy check of the ANN
    // index lifecycle (write → upsert → delete → compact → EVALUATE →
    // retrain): a "new batch" is synthesized as the %3==1 slice with
    // REVERSED embeddings (a genuine distribution shift both engines
    // construct identically), assigned under the FROZEN quantizer, and
    // compared cell-by-cell against the training occupancy. Integer
    // counts + two divisions per cell keep the whole report replayable;
    // the oracle re-runs the complete k-means fit (the q_sim_cell_stats
    // discipline) plus the batch assignment under the same tie rule.
    Q("q_sim_drift_retrain",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val batch = emb.filter(col("vec_id") % 3 === 1)
          .withColumn("embedding", reverse(col("embedding")))
        Similarity.centroidDrift(emb, batch, centroids = 8,
          sampleSize = 256, iters = 2, tol = 0.05)
          .orderBy("cluster")
      },
      Some(driftOracle)),


    // The PERSISTED-index drift path under the SAME oracle (write→read
    // fidelity, the q_sim_topk_ivf_indexed discipline): indexed
    // occupancy from the live assignments read, batch assigned under
    // the STORED centroids, report hash-equal to the from-scratch
    // monitor. This is exactly what the streaming face
    // (EmbedStream.driftMonitorSink) runs per micro-batch.
    Q("q_sim_drift_indexed",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val batch = emb.filter(col("vec_id") % 3 === 1)
          .withColumn("embedding", reverse(col("embedding")))
        val name = "graft_drift_idx_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        Similarity.writeAnnIndex(emb, name)
        try Similarity.centroidDriftIndexed(s, name, batch, tol = 0.05)
          .orderBy("cluster").localCheckpoint(true)
        finally Similarity.dropAnnIndex(s, name)
      },
      Some(driftOracle)),


    // DIVERSITY SELECTION — greedy farthest-point traversal (k-center
    // seeding): lowest id first, then 5× the remaining vector with the
    // SMALLEST max-cosine to anything selected. The oracle unrolls all
    // six picks as CTEs (the k-means-replay discipline applied to
    // farthest-first); nearest_sel_cos is the coverage-radius curve.
    Q("q_sim_diversity",
      (s, d) => Similarity.diversitySelect(Tables.embeddings(s, d), k = 6)
        .orderBy("sel_rank"),
      Some {
        val k = 6
        val sb = new StringBuilder(s"WITH $normEmbCte, ")
        sb ++= "p1 AS (SELECT vec_id, v FROM nv ORDER BY vec_id LIMIT 1)"
        for (i <- 2 to k) {
          val prevs = (1 until i).map(j => s"p$j")
          val mc =
            if (prevs.size == 1) dotSql("nv.v", "p1.v")
            else "greatest(" +
              prevs.map(p => dotSql("nv.v", s"$p.v")).mkString(", ") + ")"
          val excl = prevs.map(p => s"nv.vec_id <> $p.vec_id")
            .mkString(" AND ")
          sb ++= s", c$i AS (SELECT nv.vec_id AS vec_id, nv.v AS v, " +
            s"$mc AS mc FROM nv, ${prevs.mkString(", ")} WHERE $excl)"
          sb ++= s", p$i AS (SELECT vec_id, v, mc FROM c$i " +
            "ORDER BY mc, vec_id LIMIT 1)"
        }
        sb ++= " SELECT CAST(1 AS INT) AS sel_rank, vec_id, " +
          "CAST(NULL AS DOUBLE) AS nearest_sel_cos FROM p1"
        for (i <- 2 to k)
          sb ++= s" UNION ALL SELECT CAST($i AS INT) AS sel_rank, " +
            s"vec_id, mc AS nearest_sel_cos FROM p$i"
        sb ++= " ORDER BY sel_rank"
        sb.toString
      }),


    // Two-stage HYBRID retrieval: BM25 top-50 lexical candidates (stage 1,
    // corpus-wide but term-df-bounded) reranked by embedding cosine to a
    // query vector (stage 2, touches 50 rows). The candidate set and the
    // 1-row query vector broadcast; the corpus streams once per stage.
    // Both stages' scores surface (bm25_rank + cosine + final rank), and
    // the oracle replays the full two-stage stack — the rational-idf BM25
    // chain feeding the fold-left cosine — in one composed query.
    Q("q_sim_hybrid_rerank",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val cands = TextAnalysis.bm25Search(Tables.documents(s, d), Bm25Terms, k = 50)
        Similarity.rerankCandidates(cands, emb,
          emb.filter(col("vec_id") === 0), k = 10)
          .orderBy("rank")
      },
      Some(s"WITH ${bm25Ctes(Bm25Terms, 1.2, 0.75)}, " +
        "cand AS (SELECT doc_id, CAST(rank AS INT) AS bm25_rank FROM r " +
        "WHERE rank <= 50), " +
        s"$normEmbCte, " +
        "qn AS (SELECT v AS qv FROM nv WHERE vec_id = 0), " +
        "sc AS (SELECT cand.doc_id, bm25_rank, " +
        dotSql("qv", "nv.v") + " AS cosine " +
        "FROM cand JOIN nv ON nv.vec_id = cand.doc_id CROSS JOIN qn), " +
        "rr AS (SELECT *, row_number() OVER (ORDER BY cosine DESC, doc_id) " +
        "AS rank FROM sc) " +
        "SELECT doc_id, bm25_rank, cosine, CAST(rank AS INT) AS rank " +
        "FROM rr WHERE rank <= 10 ORDER BY rank")),


    // RECIPROCAL-RANK FUSION hybrid retrieval — the OTHER hybrid mode
    // (q_sim_hybrid_rerank re-scores; RRF fuses independent rank lists
    // score-free): BM25 top-50 and brute-cosine top-50 meet only as
    // ranks, fused as 1/(60+r_lex) + 1/(60+r_sem) with absent arms
    // contributing 0 — so a lexical-only hit stays retrievable, which
    // rerank (inner join on the embedding) cannot do. Both arms are
    // candidate-list-sized; the fuse is a KB-scale full-outer join. The
    // oracle replays both arms verbatim (the bm25 CTE chain + the
    // brute-cosine window) and the same left-nested IEEE fused sum.
    Q("q_sim_hybrid_rrf",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val lex = TextAnalysis.bm25Search(Tables.documents(s, d), Bm25Terms, k = 50)
        val sem = Similarity.bruteForceTopK(
            emb, emb.filter(col("vec_id") === 0), k = 50)
          .select(col("neighbor_id").as("doc_id"), col("rank"))
        Similarity.rrfFuse(Seq("bm25" -> lex, "cos" -> sem), k = 10)
          .orderBy("rank")
      },
      Some(rrfOracle)),


    // THREE-ARM RRF — lexical + semantic + a QUALITY PRIOR (the
    // curation-time hybrid: candidates that are lexically relevant,
    // semantically close, AND from the corpus's high-quality stratum
    // fuse ahead). The prior arm is the top-50 docs by the certified
    // quality score; the fused sum folds (bm25 + cos) + quality
    // left-nested in arm order. Items any single arm surfaces remain
    // retrievable — the N-arm generalization the 2-arm gate cannot pin.
    Q("q_sim_hybrid_rrf3",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val emb = Tables.embeddings(s, d)
        val lex = TextAnalysis.bm25Search(docs, Bm25Terms, k = 50)
        val sem = Similarity.bruteForceTopK(
            emb, emb.filter(col("vec_id") === 0), k = 50)
          .select(col("neighbor_id").as("doc_id"), col("rank"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("__qs").desc, col("doc_id"))
        val prior = docs.filter(col("text").isNotNull)
          .select(col("doc_id"),
            TextAnalysis.qualityScore(col("text")).as("__qs"))
          .orderBy(col("__qs").desc, col("doc_id")).limit(50)
          .withColumn("rank", row_number().over(w))
          .select("doc_id", "rank")
        Similarity.rrfFuse(
            Seq("bm25" -> lex, "cos" -> sem, "quality" -> prior), k = 10)
          .orderBy("rank")
      },
      Some(s"WITH ${bm25Ctes(Bm25Terms, 1.2, 0.75)}, " +
        "bq AS (SELECT doc_id, CAST(rank AS INT) AS bm25_rank FROM r " +
        "WHERE rank <= 50), " +
        s"$normEmbCte, " +
        "qn AS (SELECT v AS qv FROM nv WHERE vec_id = 0), " +
        "sc AS (SELECT c.vec_id AS doc_id, " +
        dotSql("qv", "c.v") + " AS score FROM nv c, qn WHERE c.vec_id <> 0), " +
        "sq AS (SELECT doc_id, cos_rank FROM (SELECT doc_id, " +
        "CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) " +
        "AS cos_rank FROM sc) WHERE cos_rank <= 50), " +
        "qs0 AS (SELECT doc_id, " + qualityScoreSql + " AS qsv " +
        "FROM documents WHERE text IS NOT NULL), " +
        "qb AS (SELECT doc_id, quality_rank FROM (SELECT doc_id, " +
        "CAST(row_number() OVER (ORDER BY qsv DESC, doc_id) AS INT) " +
        "AS quality_rank FROM qs0) WHERE quality_rank <= 50), " +
        "fj1 AS (SELECT COALESCE(bq.doc_id, sq.doc_id) AS doc_id, " +
        "bm25_rank, cos_rank FROM bq FULL OUTER JOIN sq " +
        "ON bq.doc_id = sq.doc_id), " +
        "fj2 AS (SELECT COALESCE(fj1.doc_id, qb.doc_id) AS doc_id, " +
        "bm25_rank, cos_rank, quality_rank FROM fj1 FULL OUTER JOIN qb " +
        "ON fj1.doc_id = qb.doc_id), " +
        "fz AS (SELECT doc_id, bm25_rank, cos_rank, quality_rank, " +
        "(COALESCE(CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + " +
        "CAST(bm25_rank AS DOUBLE)), CAST(0.0 AS DOUBLE)) + " +
        "COALESCE(CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + " +
        "CAST(cos_rank AS DOUBLE)), CAST(0.0 AS DOUBLE))) + " +
        "COALESCE(CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + " +
        "CAST(quality_rank AS DOUBLE)), CAST(0.0 AS DOUBLE)) AS rrf_score " +
        "FROM fj2), " +
        "rr AS (SELECT *, row_number() OVER (ORDER BY rrf_score DESC, " +
        "doc_id) AS rank FROM fz) " +
        "SELECT doc_id, bm25_rank, cos_rank, quality_rank, rrf_score, " +
        "CAST(rank AS INT) AS rank FROM rr WHERE rank <= 10 ORDER BY rank")),


    // Hybrid RRF from the PERSISTED lexical index: the bm25 arm answers
    // from the bucketed postings tables (bm25SearchIndexed), the
    // semantic arm and the fuse are unchanged — SAME oracle as
    // q_sim_hybrid_rrf, so hash equality certifies write→read fidelity
    // THROUGH the fusion arithmetic (the deployed hybrid-search shape:
    // per-query work is a postings read + a vector top-k + a KB fuse).
    Q("q_sim_hybrid_rrf_indexed",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val name = "graft_rrf_idx_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        TextAnalysis.writeSearchIndex(Tables.documents(s, d), name)
        try {
          val lex = TextAnalysis.bm25SearchIndexed(s, name, Bm25Terms, k = 50)
          val sem = Similarity.bruteForceTopK(
              emb, emb.filter(col("vec_id") === 0), k = 50)
            .select(col("neighbor_id").as("doc_id"), col("rank"))
          Similarity.rrfFuse(Seq("bm25" -> lex, "cos" -> sem), k = 10)
            .orderBy("rank").localCheckpoint(true)
        } finally TextAnalysis.dropSearchIndex(s, name)
      },
      Some(rrfOracle)),


    // Semantic contamination screen: every non-benchmark vector's max
    // cosine against the 10-vector "benchmark" slice (vec_id % 50 = 0) —
    // the paraphrase-leak check the trigram screen can't do. Benchmark
    // broadcasts; the corpus never shuffles (scan-side partial max).
    Q("q_sim_contamination",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Dedup.semanticContamination(
          emb.filter(col("vec_id") % 50 =!= 0),
          emb.filter(col("vec_id") % 50 === 0),
          threshold = 0.35)
          .orderBy("vec_id")
      },
      Some(s"WITH $normEmbCte, " +
        "b AS (SELECT vec_id AS bench_id, v AS bv FROM nv WHERE vec_id % 50 = 0), " +
        "c AS (SELECT vec_id, v FROM nv WHERE vec_id % 50 <> 0), " +
        "m AS (SELECT c.vec_id, max(" + dotSql("c.v", "b.bv") + ") AS max_bench_sim " +
        "FROM c CROSS JOIN b GROUP BY c.vec_id) " +
        // COALESCE mirrors the operator's documented empty/all-zero-norm-
        // benchmark contract (max_bench_sim NULL → contaminated FALSE) even
        // though the gated corpus never exercises it
        "SELECT vec_id, max_bench_sim, " +
        "COALESCE(max_bench_sim >= 0.35, false) AS contaminated " +
        "FROM m ORDER BY vec_id"))
  )
}
