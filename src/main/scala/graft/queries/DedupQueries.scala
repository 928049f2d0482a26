package graft.queries

import graft.functions.{Bpe, Dedup, MinhashIndex, Multimodal, Similarity, Takedown, TextAnalysis, Unigram}
import graft.oracles.PipelineOracles._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication + takedown query registrations (q_dedup_*, q_takedown_*) — extracted verbatim from SparkEntry (round-14
  * decomposition, VERDICT r13 item 8): SparkEntry concatenates these
  * module lists, so the driver-contract maps are unchanged while no
  * single file holds the whole registry. The conventions (identical
  * aliases both sides, total ORDER BY, DOUBLE at the money boundary)
  * are documented on [[graft.SparkEntry]].
  */
private[graft] object DedupQueries {

  private[graft] val queries: Seq[Q] = Seq(

    // Exact dedup with BEST-COPY canonical selection: the doubled corpus's
    // re-keyed copies land in a 'mirror' source, source priority picks the
    // original (the curated-beats-crawl keep rule); every row keeps its
    // verdict + group size. The oracle replays the priority window.
    Q("q_dedup_exact_best",
      (s, d) => {
        val docs = Tables.documents(s, d).select("doc_id", "text", "source")
        val doubled = docs.unionByName(
          docs.select((col("doc_id") + lit(10000L)).as("doc_id"),
            col("text"), lit("mirror").as("source")))
        Dedup.exactBest(doubled,
            when(col("source") === "mirror", 0L).otherwise(1L))
          .orderBy("doc_id")
      },
      Some("WITH d AS (SELECT doc_id, text, source FROM documents " +
        "UNION ALL SELECT doc_id + 10000, text, 'mirror' FROM documents), " +
        "h AS (SELECT doc_id, sha256(text) AS content_hash, " +
        "CAST(CASE WHEN source = 'mirror' THEN 0 ELSE 1 END AS BIGINT) " +
        "AS score FROM d), " +
        "w AS (SELECT *, row_number() OVER (PARTITION BY content_hash " +
        "ORDER BY score DESC, doc_id) AS pick, " +
        "count(*) OVER (PARTITION BY content_hash) AS dup_count FROM h) " +
        "SELECT doc_id, content_hash, score, " +
        "CAST(dup_count AS BIGINT) AS dup_count, pick = 1 AS keep " +
        "FROM w ORDER BY doc_id")),


    // Exact dedup over documents ∪ (re-keyed) documents so duplicate groups
    // actually exist in the corpus.
    Q("q_dedup_exact",
      (s, d) => {
        val docs = Tables.documents(s, d).select("doc_id", "text")
        val doubled = docs.unionByName(
          docs.withColumn("doc_id", col("doc_id") + lit(10000L)))
        Dedup.exact(doubled).orderBy("doc_id")
      },
      Some("WITH d AS (SELECT doc_id, text FROM documents " +
        "UNION ALL SELECT doc_id + 10000, text FROM documents) " +
        "SELECT min(doc_id) AS doc_id, sha256(text) AS content_hash, " +
        "count(*) AS dup_count FROM d GROUP BY sha256(text) ORDER BY doc_id")),


    // CROSS-SOURCE DUPLICATION MATRIX over an engineered overlap corpus
    // (the doubled-corpus idiom, source-rotated: each source's re-keyed
    // copy lands in the NEXT source, so every adjacent pair shares that
    // source's distinct contents). Engine collapses text to a 64-bit hash
    // before the shuffle; the oracle joins on RAW TEXT — the stronger
    // claim — so the gate is also a no-collision certificate.
    Q("q_dedup_cross_matrix",
      (s, d) => {
        val docs0 = Tables.documents(s, d).select("doc_id", "text", "source")
        val rotated = docs0.select(
          (col("doc_id") + 10000L).as("doc_id"), col("text"),
          concat(lit("src"),
            ((substring(col("source"), 4, 10).cast("long") + 1) % 20)
              .cast("string")).as("source"))
        Dedup.crossSourceMatrix(docs0.unionByName(rotated))
          .orderBy("source_a", "source_b")
      },
      Some("WITH d AS (SELECT doc_id, text, source FROM documents " +
        "UNION ALL SELECT doc_id + 10000, text, " +
        "'src' || CAST((CAST(substr(source, 4) AS BIGINT) + 1) % 20 AS VARCHAR) " +
        "FROM documents), " +
        "s AS (SELECT DISTINCT text, source FROM d WHERE text IS NOT NULL), " +
        "sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM s GROUP BY 1), " +
        "p AS (SELECT a.source AS source_a, b.source AS source_b, " +
        "CAST(count(*) AS BIGINT) AS n_shared FROM s a " +
        "JOIN s b ON a.text = b.text AND a.source < b.source GROUP BY 1, 2) " +
        "SELECT source_a, source_b, n_shared, sa.n AS n_a, sb.n AS n_b, " +
        "CAST(n_shared AS DOUBLE) / CAST(least(sa.n, sb.n) AS DOUBLE) " +
        "AS overlap_frac FROM p " +
        "JOIN sz sa ON source_a = sa.source " +
        "JOIN sz sb ON source_b = sb.source " +
        "ORDER BY source_a, source_b")),


    // Chunk-level exact dedup over the doubled corpus (sub-document
    // granularity — every original 16-token window recurs in its re-keyed
    // twin, so dup fractions are exercised corpus-wide; the oracle replays
    // the slice → lower → rolling-hash fold → first-occurrence rank).
    Q("q_dedup_chunks",
      (s, d) => {
        val docs = Tables.documents(s, d).select("doc_id", "text")
        val doubled = docs.unionByName(
          docs.withColumn("doc_id", col("doc_id") + lit(10000L)))
        graft.functions.Dedup.chunkDedup(doubled, chunkTokens = 16)
          .orderBy("doc_id")
      },
      Some("WITH d AS (SELECT doc_id, text FROM documents " +
        "UNION ALL SELECT doc_id + 10000, text FROM documents), " +
        "tk AS (SELECT doc_id, " + toksSql + " AS t FROM d " +
        "WHERE text IS NOT NULL AND len(" + toksSql + ") > 0), " +
        "ck AS (SELECT doc_id, unnest(range(0, (len(t) - 1) // 16 + 1)) " +
        "AS idx, t FROM tk), " +
        // replay fingerprint's FULL canonical form (trim + collapse +
        // lower), not just lower: a leading tab in text survives Spark's
        // space-only trim into a leading empty token, and the joined chunk
        // then starts with a space that normalizedText strips — the oracle
        // must strip it too (same landmine class as the r6 HUGEINT bug)
        "fp AS (SELECT doc_id, idx, list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "[CAST(unicode(c) AS BIGINT) FOR c IN regexp_extract_all(" +
        "lower(regexp_replace(trim(" +
        "array_to_string(t[(idx*16+1):(idx*16+16)], ' ')" +
        "), '\\s+', ' ', 'g')), '.')]), " +
        s"(acc, x) -> (acc * 31 + x) % ${graft.functions.RollingHash.Modulus}) " +
        "AS f FROM ck), " +
        "r AS (SELECT doc_id, row_number() OVER (PARTITION BY f " +
        "ORDER BY doc_id, idx) AS rn FROM fp), " +
        "g AS (SELECT doc_id, count(*) AS n_chunks, " +
        "CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_dup_chunks FROM r GROUP BY 1) " +
        "SELECT d.doc_id, CAST(COALESCE(g.n_chunks, 0) AS BIGINT) AS n_chunks, " +
        "CAST(COALESCE(g.n_dup_chunks, 0) AS BIGINT) AS n_dup_chunks, " +
        "CAST(g.n_dup_chunks AS DOUBLE) / CAST(g.n_chunks AS DOUBLE) " +
        "AS dup_chunk_frac " +
        "FROM d LEFT JOIN g USING (doc_id) ORDER BY d.doc_id")),


    // Duplicate-PASSAGE spans over the containment-style corpus (every 10th
    // doc concatenated with its successor into a re-keyed super-doc): each
    // swallowed document surfaces as a maximal run of consecutive shared
    // 16-token chunks at diagonal start_a − start_b ≠ 0 — span-level
    // exact-substring dedup (the where-and-how-long reading chunk counters
    // can't give). Hot fingerprints (df > 64) are excluded before pairing
    // on both sides.
    Q("q_dedup_passages",
      (s, d) => {
        val docs = Tables.documents(s, d).select("doc_id", "text")
        val concats = docs.as("a").filter(col("doc_id") % 10 === 0)
          .join(docs.as("b"), col("b.doc_id") === col("a.doc_id") + 1)
          .select((col("a.doc_id") + lit(20000L)).as("doc_id"),
            concat(col("a.text"), lit(" "), col("b.text")).as("text"))
        Dedup.duplicatePassages(docs.unionByName(concats),
            chunkTokens = 16, minChunks = 2, maxChunkDf = 64)
          .orderBy("doc_a", "doc_b", "start_a", "start_b")
      },
      Some("WITH d AS (SELECT doc_id, text FROM documents " +
        "UNION ALL SELECT a.doc_id + 20000 AS doc_id, " +
        "a.text || ' ' || b.text AS text FROM documents a " +
        "JOIN documents b ON b.doc_id = a.doc_id + 1 " +
        "WHERE a.doc_id % 10 = 0), " +
        "tk AS (SELECT doc_id, " + toksSql + " AS t FROM d " +
        "WHERE text IS NOT NULL AND len(" + toksSql + ") > 0), " +
        "ck AS (SELECT doc_id, unnest(range(0, (len(t) - 1) // 16 + 1)) " +
        "AS idx, t FROM tk), " +
        // the q_dedup_chunks fingerprint replay: trim + collapse + lower
        // canonical form, 58-bit prime-field rolling hash
        "fp AS (SELECT doc_id, CAST(idx AS BIGINT) AS idx, " +
        "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "[CAST(unicode(c) AS BIGINT) FOR c IN regexp_extract_all(" +
        "lower(regexp_replace(trim(" +
        "array_to_string(t[(idx*16+1):(idx*16+16)], ' ')" +
        "), '\\s+', ' ', 'g')), '.')]), " +
        s"(acc, x) -> (acc * 31 + x) % ${graft.functions.RollingHash.Modulus}) " +
        "AS f FROM ck), " +
        "hot AS (SELECT f FROM fp GROUP BY f HAVING count(*) > 64), " +
        "rare AS (SELECT fp.* FROM fp ANTI JOIN hot USING (f)), " +
        "m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
        "a.idx AS ia, b.idx AS ib FROM rare a " +
        "JOIN rare b ON a.f = b.f AND a.doc_id < b.doc_id), " +
        "r AS (SELECT doc_a, doc_b, ia, ib, ia - ib AS diag, " +
        "ia - row_number() OVER (PARTITION BY doc_a, doc_b, ia - ib " +
        "ORDER BY ia) AS grp FROM m), " +
        "g AS (SELECT doc_a, doc_b, CAST(min(ia) AS BIGINT) AS start_a, " +
        "CAST(min(ib) AS BIGINT) AS start_b, count(*) AS n_chunks " +
        "FROM r GROUP BY doc_a, doc_b, diag, grp) " +
        "SELECT doc_a, doc_b, start_a, start_b, " +
        "CAST(n_chunks AS BIGINT) AS n_chunks, " +
        "CAST(n_chunks * 16 AS BIGINT) AS approx_tokens FROM g " +
        "WHERE n_chunks >= 2 ORDER BY doc_a, doc_b, start_a, start_b")),


    Q("q_dedup_passage_scrub",
      (s, d) => {
        val docs = Tables.documents(s, d).select("doc_id", "text")
        val concats = docs.as("a").filter(col("doc_id") % 10 === 0)
          .join(docs.as("b"), col("b.doc_id") === col("a.doc_id") + 1)
          .select((col("a.doc_id") + lit(20000L)).as("doc_id"),
            concat(col("a.text"), lit(" "), col("b.text")).as("text"))
        val corpus = docs.unionByName(concats)
        Dedup.scrubPassages(corpus,
            Dedup.duplicatePassages(corpus,
              chunkTokens = 16, minChunks = 2, maxChunkDf = 64),
            chunkTokens = 16)
          .orderBy("doc_id")
      },
      Some("WITH d AS (SELECT doc_id, text FROM documents " +
        "UNION ALL SELECT a.doc_id + 20000 AS doc_id, " +
        "a.text || ' ' || b.text AS text FROM documents a " +
        "JOIN documents b ON b.doc_id = a.doc_id + 1 " +
        "WHERE a.doc_id % 10 = 0), " +
        chunkFpCtes("d", "c") + ", " +
        "hot AS (SELECT f FROM cfp GROUP BY f HAVING count(*) > 64), " +
        "rare AS (SELECT cfp.* FROM cfp ANTI JOIN hot USING (f)), " +
        "m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
        "a.idx AS ia, b.idx AS ib FROM rare a " +
        "JOIN rare b ON a.f = b.f AND a.doc_id < b.doc_id), " +
        "r AS (SELECT doc_a, doc_b, ia, ib, ia - ib AS diag, " +
        "ia - row_number() OVER (PARTITION BY doc_a, doc_b, ia - ib " +
        "ORDER BY ia) AS grp FROM m), " +
        "g AS (SELECT doc_a, doc_b, CAST(min(ib) AS BIGINT) AS start_b, " +
        "count(*) AS n_chunks FROM r GROUP BY doc_a, doc_b, diag, grp), " +
        "rm0 AS (SELECT doc_b AS doc_id, " +
        "unnest(range(start_b, start_b + n_chunks)) AS idx FROM g " +
        "WHERE n_chunks >= 2), " +
        "rmd AS (SELECT DISTINCT doc_id, idx FROM rm0), " +
        "rms AS (SELECT doc_id, list(idx ORDER BY idx) AS rms, " +
        "count(*) AS n_removed FROM rmd GROUP BY 1), " +
        "tall AS (SELECT doc_id, " + toksSql + " AS t FROM d), " +
        "base AS (SELECT doc_id, t, CASE WHEN t IS NULL OR len(t) = 0 " +
        "THEN 0 ELSE (len(t) - 1) // 16 + 1 END AS n_chunks FROM tall) " +
        "SELECT b.doc_id, CAST(b.n_chunks AS BIGINT) AS n_chunks, " +
        "CAST(COALESCE(r.n_removed, 0) AS BIGINT) AS n_removed_chunks, " +
        // COALESCE: DuckDB array_to_string([]) is NULL; Spark array_join
        // of an all-chunks-removed doc is '' — pin the Spark semantics
        "CASE WHEN b.t IS NULL THEN NULL WHEN b.n_chunks = 0 THEN '' " +
        "ELSE COALESCE(array_to_string(flatten([b.t[(i*16+1):(i*16+16)] " +
        "FOR i IN range(0, b.n_chunks) " +
        "IF NOT list_contains(COALESCE(r.rms, CAST([] AS BIGINT[])), i)]), " +
        "' '), '') END AS text " +
        "FROM base b LEFT JOIN rms r USING (doc_id) ORDER BY b.doc_id")),


    // Incremental exact dedup: a new batch (every second document, re-keyed)
    // deduped against itself and the already-seen corpus (every third
    // document) — only novel digests survive the anti-join.
    Q("q_dedup_incremental",
      (s, d) => {
        val docs = Tables.documents(s, d).select("doc_id", "text")
        Dedup.incrementalExact(
          docs.filter(col("doc_id") % 2 === 0)
            .withColumn("doc_id", col("doc_id") + lit(10000L)),
          docs.filter(col("doc_id") % 3 === 0))
          .orderBy("doc_id")
      },
      Some("WITH seen AS (SELECT DISTINCT sha256(text) AS content_hash " +
        "FROM documents WHERE doc_id % 3 = 0), " +
        "b AS (SELECT doc_id + 10000 AS doc_id, text FROM documents " +
        "WHERE doc_id % 2 = 0) " +
        // NOT EXISTS, not NOT IN: a NULL digest on either side must behave
        // like Spark's left_anti (null keys never match, rows are kept) —
        // NOT IN would return zero rows the moment `seen` contains one NULL
        "SELECT min(doc_id) AS doc_id, sha256(text) AS content_hash, " +
        "count(*) AS dup_count FROM b " +
        "WHERE NOT EXISTS (SELECT 1 FROM seen s WHERE s.content_hash = sha256(b.text)) " +
        "GROUP BY sha256(text) ORDER BY doc_id")),


    // Cross-corpus near-dup screen: the new batch (every 7th doc) against
    // the disjoint seen corpus — the near-dup analog of incremental dedup.
    Q("q_dedup_incremental_ngram",
      (s, d) => {
        val docs = Tables.documents(s, d).select("doc_id", "text")
        Dedup.crossNgramJaccardPairs(
          docs.filter(col("doc_id") % 7 === 0),
          docs.filter(col("doc_id") % 7 =!= 0), 0.5)
          .orderBy("batch_doc", "seen_doc")
      },
      Some(crossNgramOracle)),


    Q("q_dedup_ngram_jaccard",
      (s, d) => Dedup.ngramJaccardPairs(Tables.documents(s, d), 0.5)
        .orderBy("doc_a", "doc_b"),
      Some(ngramJaccardOracle)),


    // The near-dup COST MODEL as a first-class relation: the exact
    // Σ df·(df−1)/2 candidate-join volume, hottest-shingle df, and the
    // regime ngramJaccardPairs' switch would pick at the production caps
    // — what an operator reads before committing a 100 TB near-dup pass
    // (and the number the round-11 twins ladder showed crossing the
    // threshold between x3 and x10). Caps render from the SAME Scala
    // constants the operator reads (no-silent-divergence rule).
    Q("q_dedup_plan_stats",
      (s, d) => Dedup.dedupPlanStats(Tables.documents(s, d)),
      Some("WITH toks AS (SELECT doc_id, " + toksSql + " AS t " +
        "FROM documents), " +
        "ngrams AS (SELECT doc_id, " +
        "list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] " +
        "FOR i IN range(1, len(t) - 1)]) AS ng FROM toks " +
        "WHERE len(t) >= 3), " +
        "p AS (SELECT doc_id, unnest(ng) AS g FROM ngrams " +
        "WHERE len(ng) > 0), " +
        "dr AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs " +
        "FROM p), " +
        "dft AS (SELECT g, count(*) AS df FROM p GROUP BY 1), " +
        "sr AS (SELECT CAST(count(*) AS BIGINT) AS n_shingles, " +
        "CAST(sum(df) AS BIGINT) AS n_postings, " +
        "CAST(sum(df * (df - 1) // 2) AS BIGINT) AS candidate_join_rows, " +
        "CAST(max(df) AS BIGINT) AS max_df FROM dft) " +
        "SELECT n_docs, n_shingles, n_postings, candidate_join_rows, " +
        "max_df, CASE WHEN candidate_join_rows <= " +
        graft.functions.Dedup.MaxIndexJoinRows +
        " AND max_df <= 1000 THEN 'count-join' " +
        "ELSE 'prefix-filter' END AS regime FROM dr CROSS JOIN sr")),


    // MinHash+LSH emits exactly the verified-Jaccard pairs. The exact
    // oracle demands banding recall ~1 at the 0.5 threshold, so this query
    // runs the high-recall config: 64 minima in 32 bands of 2 gives
    // P(candidate | j) = 1-(1-j²)^32 ≥ 0.9999 at j = 0.5 — oracle equality
    // by construction, not by corpus accident. (The operator's default
    // 32×4 banding is the cheaper production trade: ~0.4 recall at the
    // threshold edge but near-1 for the near-twin pairs dedup targets.)
    Q("q_dedup_minhash_lsh",
      (s, d) => Dedup.minhashNearDups(Tables.documents(s, d), 0.5,
          numHashes = 64, bands = 32)
        .orderBy("doc_a", "doc_b"),
      Some(ngramJaccardOracle)),


    // PERSISTED MinHash-LSH index: the seen corpus (doc_id % 7 ≠ 0) is
    // shingled+signed+banded ONCE at build; the batch screen pays O(batch)
    // signing, a broadcast band join against the stored band table, and a
    // literal-id-pruned read of the candidates' stored shingle sets — the
    // incremental-dedup access path at 100 TB, where re-shingling the seen
    // side per batch (q_dedup_incremental_ngram's live recompute) costs
    // O(corpus). Same high-recall geometry as q_dedup_minhash_lsh, so the
    // screen's verified pair set equals the exhaustive cross-join oracle.
    // Unique table name + eager materialization + finally-drop: the
    // q_sim_topk_ivf_indexed pattern.
    Q("q_dedup_minhash_indexed",
      (s, d) => {
        val docs = Tables.documents(s, d).select("doc_id", "text")
        val name = "graft_mh_idx_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        MinhashIndex.write(docs.filter(col("doc_id") % 7 =!= 0), name)
        try MinhashIndex.screen(s, name,
            docs.filter(col("doc_id") % 7 === 0), 0.5)
          .orderBy("batch_doc", "seen_doc").localCheckpoint(true)
        finally MinhashIndex.drop(s, name)
      },
      Some(crossNgramOracle)),


    // INCREMENTAL index maintenance: build on the even half of the seen
    // corpus, UPSERT the odd half (banded under the index's frozen
    // geometry, appended under the tables' own bucket specs — O(batch),
    // no rebuild), then screen. The grown index must answer exactly like
    // a one-shot build over the union — which is the same exhaustive
    // cross-join oracle — because the banding geometry is data-independent
    // (unlike the ANN quantizer, there is no trained state to freeze, so
    // upsert ≡ rebuild holds unconditionally here).
    Q("q_dedup_minhash_upsert",
      (s, d) => {
        val docs = Tables.documents(s, d).select("doc_id", "text")
        val seen = docs.filter(col("doc_id") % 7 =!= 0)
        val name = "graft_mh_ups_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        MinhashIndex.write(seen.filter(col("doc_id") % 2 === 0), name)
        try {
          MinhashIndex.upsert(s, name, seen.filter(col("doc_id") % 2 =!= 0))
          MinhashIndex.screen(s, name,
              docs.filter(col("doc_id") % 7 === 0), 0.5)
            .orderBy("batch_doc", "seen_doc").localCheckpoint(true)
        } finally MinhashIndex.drop(s, name)
      },
      Some(crossNgramOracle)),


    // TARGETED DELETION from the MinHash index — the upsert gate's
    // MIRROR: the seen side is built WITH exact-copy clones of every
    // batch document (ids +5,000,000 — each would surface as a
    // jaccard-1.0 pair), the clones are then tombstone-deleted, and the
    // screen must answer EXACTLY the cross-join oracle over the original
    // seen corpus. A deletion path that leaks even one tombstoned row
    // back into candidate generation fails the hash.
    Q("q_dedup_minhash_deleted",
      (s, d) => {
        val docs = Tables.documents(s, d).select("doc_id", "text")
        val seen = docs.filter(col("doc_id") % 7 =!= 0)
        val batch = docs.filter(col("doc_id") % 7 === 0)
        val clones = batch.select(
          (col("doc_id") + 5000000L).as("doc_id"), col("text"))
        val name = "graft_mh_del_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        MinhashIndex.write(seen.unionByName(clones), name)
        val cloneIds = batch.select("doc_id").collect()
          .map(_.getLong(0) + 5000000L).toSeq
        try {
          MinhashIndex.deleteIds(s, name, cloneIds)
          MinhashIndex.screen(s, name, batch, 0.5)
            .orderBy("batch_doc", "seen_doc").localCheckpoint(true)
        } finally MinhashIndex.drop(s, name)
      },
      Some(crossNgramOracle)),


    // TAKEDOWN ORCHESTRATOR end-to-end: ONE opt-out batch (every bm25
    // clone + every minhash clone + BQ sign-word clones + a frontier
    // entry) issued through deleteEverywhere must reach ALL FOUR
    // artifact families — and the RETRY of the same batchId must skip
    // everywhere via the ledger (require()s pin applied/skipped in
    // the gated path; a double-applied batch would not change these
    // tombstone reads, but the report contract is what production
    // retries rely on). The BQ and frontier arms are require-gated
    // inside the query (residual 0 + re-fetchability), so the pinned
    // read — both text families' mirror oracles composed into one
    // aligned relation — keeps its hash while the registry exercises
    // the round-16 families (r14 lesson: an artifact missing from the
    // sweep means the content is still findable).
    Q("q_takedown_everywhere",
      (s, d) => {
        val docs = Tables.documents(s, d).select("doc_id", "text")
        val uid = java.util.UUID.randomUUID().toString.replace("-", "")
        val bm = "graft_td_bm25_" + uid
        val mh = "graft_td_mh_" + uid
        val bq = "graft_td_bq_" + uid
        val fr = "graft_td_fr_" + uid
        val bmClones = docs.select(
          (col("doc_id") + 3000000L).as("doc_id"), col("text"))
        TextAnalysis.writeSearchIndex(docs.unionByName(bmClones), bm)
        val seen = docs.filter(col("doc_id") % 7 =!= 0)
        val batch = docs.filter(col("doc_id") % 7 === 0)
        val mhClones = batch.select(
          (col("doc_id") + 5000000L).as("doc_id"), col("text"))
        MinhashIndex.write(seen.unionByName(mhClones), mh)
        val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
        val bqClones = emb.filter(col("vec_id") % 100 === 0).select(
          (col("vec_id") + 9000000L).as("vec_id"), col("embedding"))
        Similarity.writeBqIndex(emb.unionByName(bqClones), bq)
        TextAnalysis.writeFrontierTable(
          docs.select(col("doc_id"),
            concat(lit("https://td.example/doc/"), col("doc_id")).as("url")),
          fr)
        val bmIds = docs.select("doc_id").collect()
          .map(_.getLong(0) + 3000000L).toSeq
        val mhIds = batch.select("doc_id").collect()
          .map(_.getLong(0) + 5000000L).toSeq
        val bqIds = emb.filter(col("vec_id") % 100 === 0)
          .select("vec_id").collect().map(_.getLong(0) + 9000000L).toSeq
        val frIds = docs.select("doc_id").orderBy("doc_id").limit(3)
          .collect().map(_.getLong(0)).toSeq
        try {
          val reg = Seq(Takedown.SearchIndex(bm), Takedown.MinhashLsh(mh),
            Takedown.BqIndex(bq), Takedown.FrontierTable(fr))
          // batch 1: the clone ids (all in disjoint high ranges — none is
          // a live doc, so the pinned bm25/minhash reads keep their hash)
          val cloneIds = bmIds ++ mhIds ++ bqIds
          val first = Takedown.deleteEverywhere(s, "opt-out-1", cloneIds, reg)
          require(first.forall(_._3), s"first run must apply everywhere: $first")
          val retry = Takedown.deleteEverywhere(s, "opt-out-1", cloneIds, reg)
          require(retry.forall(!_._3), s"retry must skip everywhere: $retry")
          require(Takedown.auditRegistry(s, reg).forall(r =>
            !Set(bm, mh, bq, fr).map(_.toLowerCase)(r._2)),
            "the 4-family registry must pass the completeness sweep")
          val resid = Takedown.residualReferences(s, cloneIds, reg)
          require(resid.forall(_._3 == 0L), s"live residue after delete: $resid")
          // batch 2, frontier only: take down three REAL docs — their
          // canonicals must re-open for fetching (the crawl-frontier
          // compliance semantic), require-gated so the text-family reads
          // are untouched
          Takedown.deleteEverywhere(s, "opt-out-2", frIds,
            Seq(Takedown.FrontierTable(fr)))
          require(Takedown.residualReferences(s, frIds,
            Seq(Takedown.FrontierTable(fr))).forall(_._3 == 0L),
            "frontier rows must be gone for the taken-down docs")
          val refetch = TextAnalysis.screenFrontier(s, fr,
              docs.filter(col("doc_id").isin(frIds: _*)).select(col("doc_id"),
                concat(lit("https://td.example/doc/"), col("doc_id")).as("url")))
            .filter(col("should_fetch")).count()
          require(refetch == frIds.size.toLong,
            s"taken-down canonicals must re-open: $refetch of ${frIds.size}")
          val bmRead = TextAnalysis.bm25SearchIndexed(s, bm, Bm25Terms, k = 15)
            .select(lit("bm25").as("family"), col("doc_id").as("a"),
              col("rank").cast("long").as("b"),
              col("n_matched").cast("long").as("n"), col("score").as("x"))
          val mhRead = MinhashIndex.screen(s, mh, batch, 0.5)
            .select(lit("minhash").as("family"), col("batch_doc").as("a"),
              col("seen_doc").as("b"), lit(null).cast("long").as("n"),
              col("jaccard").as("x"))
          bmRead.unionByName(mhRead).orderBy("family", "a", "b")
            .localCheckpoint(true)
        } finally {
          TextAnalysis.dropSearchIndex(s, bm); Takedown.dropLedger(s, bm)
          MinhashIndex.drop(s, mh); Takedown.dropLedger(s, mh)
          Similarity.dropBqIndex(s, bq); Takedown.dropLedger(s, bq)
          TextAnalysis.dropFrontierTable(s, fr); Takedown.dropLedger(s, fr)
        }
      },
      Some(takedownOracle)),


    // TAKEDOWN across the QUANTIZED + SUBTRACTIVE families (the r14
    // verdict's named gap): ONE batch through deleteEverywhere must reach
    // a persisted SQ8 index (tombstoned codes — the read equals the
    // plain-corpus SQ8 replay because exact-copy clones cannot move the
    // min/max params: rebuild-without equality to the bit) AND the
    // incremental line-df state (negative-partial count unlearning — the
    // strip verdicts equal the from-scratch full-corpus replay; the
    // clones carry the cross-page quote line, so a no-op unlearn would
    // flip batch verdicts and fail the hash). The registry-completeness
    // audit is exercised in the gated path: a registry missing the SQ
    // index must NAME it. Retry of the same batchId skips both families
    // via the ids-hashed ledger.
    Q("q_takedown_quantized",
      (s, d) => {
        val uid = java.util.UUID.randomUUID().toString.replace("-", "")
        val sq = "graft_tdq_sq_" + uid
        val ldf = "graft_tdq_ldf_" + uid
        val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
        val qset = emb.filter(col("vec_id") % 100 === 0)
        val sqClones = qset.select(
          (col("vec_id") + 700000L).as("vec_id"), col("embedding"))
        Similarity.writeSqIndex(emb.unionByName(sqClones), sq)
        val wrapped = TextQueries.wrappedBoilerDocs(s, d)
        val seen = wrapped.filter(col("doc_id") % 4 =!= 0)
        val batch = wrapped.filter(col("doc_id") % 4 === 0)
        val ldfClones = seen.select(
          (col("doc_id") + 200000L).as("doc_id"), col("source"),
          concat(lit("a quote cited by a few pages of every site\n" +
            "(c) 2026 "), col("source")).as("text"))
        Dedup.writeLineDfTable(seen.unionByName(ldfClones), ldf)
        val sqIds = qset.select("vec_id").collect()
          .map(_.getLong(0) + 700000L).toSeq
        val ldfIds = seen.select("doc_id").collect()
          .map(_.getLong(0) + 200000L).toSeq
        try {
          val reg = Seq(Takedown.SqIndex(sq), Takedown.LineDf(ldf, ldfClones))
          // completeness audit: a registry missing the SQ index names it
          val missing = Takedown.auditRegistry(s,
            Seq(Takedown.LineDf(ldf, ldfClones)))
          require(missing.contains(("sq", sq.toLowerCase)),
            s"audit must flag the unregistered SQ index: $missing")
          val first = Takedown.deleteEverywhere(s, "quant-1",
            sqIds ++ ldfIds, reg)
          require(first.forall(_._3), s"first run must apply: $first")
          val retry = Takedown.deleteEverywhere(s, "quant-1",
            sqIds ++ ldfIds, reg)
          require(retry.forall(!_._3), s"retry must skip: $retry")
          require(Takedown.residualReferences(s, sqIds ++ ldfIds, reg)
            .forall(_._3 == 0L), "residual references must be zero")
          val sqRead = Similarity.sqSearchIndexed(s, sq, qset, k = 10)
            .select(lit("sq").as("family"), col("query_id").as("a"),
              col("neighbor_id").as("b"), col("rank").cast("long").as("n"),
              col("score").as("x"), lit(null).cast("string").as("t"))
          val ldfRead = Dedup.boilerplateStripAgainst(s, ldf, batch,
              minDocFrac = 0.5, minDocs = 2)
            .select(lit("linedf").as("family"), col("doc_id").as("a"),
              col("n_lines").as("b"), col("n_kept").as("n"),
              lit(null).cast("double").as("x"), col("text").as("t"))
          sqRead.unionByName(ldfRead).orderBy("family", "a", "b")
            .localCheckpoint(true)
        } finally {
          Similarity.dropSqIndex(s, sq); Takedown.dropLedger(s, sq)
          Dedup.dropLineDfTable(s, ldf); Takedown.dropLedger(s, ldf)
        }
      },
      Some(takedownQuantizedOracle)),


    // SUBSTRING-LEVEL exact dedup (Lee et al. 2022 granularity — the one
    // level between chunk and line dedup: repeats need not align to any
    // boundary). Corpus = documents plus engineered part-copies: every
    // 10th doc spawns a clone carrying the doc's first 120 chars at
    // OFFSET 3 ("zz " prefix), so the repeated passage sits at different
    // offsets in the two docs — invisible to tile/chunk alignment,
    // excised here as one merged span. Keep-first by (doc_id, pos): the
    // originals survive untouched, the clones lose their copied prefix.
    // The engine's rolling-hash anchor pass is an internal pre-screen
    // (candidates re-verify on exact window text), so the oracle replays
    // the window/rank/island pipeline directly on window strings.
    Q("q_dedup_substrings",
      (s, d) => {
        val docs = Tables.documents(s, d).select("doc_id", "text")
        val clones = docs.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 30000L).as("doc_id"),
            concat(lit("zz "), expr("substring(text, 1, 120)"),
              lit(" fresh tail "), col("doc_id").cast("string")).as("text"))
        Dedup.substringDedup(docs.unionByName(clones), windowLen = 40)
          .orderBy("doc_id")
      },
      Some("WITH d AS (SELECT doc_id, text FROM documents " +
        "WHERE text IS NOT NULL " +
        "UNION ALL SELECT doc_id + 30000 AS doc_id, " +
        "'zz ' || substring(text, 1, 120) || ' fresh tail ' || " +
        "CAST(doc_id AS VARCHAR) AS text FROM documents " +
        "WHERE doc_id % 10 = 0 AND text IS NOT NULL), " +
        substringWindowsSql("d", "doc_id", "w", 40) + ", " +
        "occ AS (SELECT doc_id, pos, row_number() OVER (" +
        "PARTITION BY win ORDER BY doc_id, pos) AS rk FROM w), " +
        "dup AS (SELECT doc_id, pos FROM occ WHERE rk >= 2), " +
        substringExciseTailSql(40))),


    // INCREMENTAL substring screen against a PERSISTED anchor index —
    // the daily-crawl regime: the seen corpus is hashed ONCE
    // (writeSubstringIndex: bucketed winhash + docs tables), today's
    // batch screens at O(batch + matched). Built on half the seen
    // corpus + UPSERT of the other half (certifies the fold), and the
    // seen side additionally carries EXACT COPIES of every batch doc
    // (ids +400000) that are then tombstone-DELETED: a deletion path
    // that leaked even one clone window back into the screen would
    // excise entire batch documents and fail the hash. The oracle is
    // the from-scratch scrub replay of batch-vs-seen.
    Q("q_dedup_substrings_indexed",
      (s, d) => {
        val docs = Tables.documents(s, d).select("doc_id", "text")
        val seen = docs.filter(col("doc_id") % 4 =!= 0)
        val batch = docs.filter(col("doc_id") % 4 === 0)
        val clones = batch.select(
          (col("doc_id") + 400000L).as("doc_id"), col("text"))
        val name = "graft_ssi_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        Dedup.writeSubstringIndex(
          seen.filter(col("doc_id") % 2 === 0).unionByName(clones), name)
        try {
          Dedup.upsertSubstringIndex(s, name,
            seen.filter(col("doc_id") % 2 =!= 0))
          val cloneIds = batch.select("doc_id").collect()
            .map(_.getLong(0) + 400000L).toSeq
          Dedup.deleteFromSubstringIndex(s, name, cloneIds)
          Dedup.substringScreen(s, name, batch)
            .orderBy("doc_id").localCheckpoint(true)
        } finally Dedup.dropSubstringIndex(s, name)
      },
      Some("WITH d AS (SELECT doc_id, text FROM documents " +
        "WHERE text IS NOT NULL AND doc_id % 4 = 0), " +
        "bz AS (SELECT doc_id AS bench_id, text FROM documents " +
        "WHERE text IS NOT NULL AND doc_id % 4 <> 0), " +
        substringWindowsSql("bz", "bench_id", "bw0", 40) + ", " +
        "bw AS (SELECT DISTINCT win FROM bw0), " +
        substringWindowsSql("d", "doc_id", "w", 40) + ", " +
        "dup AS (SELECT w.doc_id, w.pos FROM w JOIN bw USING (win)), " +
        substringExciseTailSql(40))),


    // SUBSTRING-LEVEL exact DECONTAMINATION: the scrub machinery pointed
    // at a benchmark — an eval set built FROM corpus text (every 17th
    // doc's chars 31..180 wrapped in Q:/A: chrome, the
    // benchmark-derived-from-crawl leakage case) must leave the corpus
    // at EVERY occurrence (no keep-first), character-exact at any
    // offset. The benchmark itself is untouched; corpus docs that share
    // nothing pass through byte-identical.
    Q("q_dedup_substring_scrub",
      (s, d) => {
        val docs = Tables.documents(s, d).select("doc_id", "text")
        val bench = docs.filter(col("doc_id") % 17 === 0)
          .select((col("doc_id") + 900000L).as("bench_id"),
            concat(lit("Q: "), expr("substring(text, 31, 150)"),
              lit(" A: unknown")).as("text"))
        Dedup.substringScrub(docs, bench, windowLen = 40)
          .orderBy("doc_id")
      },
      Some("WITH d AS (SELECT doc_id, text FROM documents " +
        "WHERE text IS NOT NULL), " +
        "bz AS (SELECT doc_id AS bench_id, " +
        "'Q: ' || substring(text, 31, 150) || ' A: unknown' AS text " +
        "FROM documents WHERE doc_id % 17 = 0 AND text IS NOT NULL), " +
        substringWindowsSql("bz", "bench_id", "bw0", 40) + ", " +
        "bw AS (SELECT DISTINCT win FROM bw0), " +
        substringWindowsSql("d", "doc_id", "w", 40) + ", " +
        "dup AS (SELECT w.doc_id, w.pos FROM w JOIN bw USING (win)), " +
        substringExciseTailSql(40))),


    // Asymmetric containment (near-SUPERSET detection) over a corpus with
    // engineered swallows: every 10th document is concatenated with its
    // successor into a re-keyed super-document, so (part, whole) pairs sit
    // at containment 1.0 where Jaccard reads only |A|/|B| and misses them.
    Q("q_dedup_containment",
      (s, d) => {
        val docs = Tables.documents(s, d).select("doc_id", "text")
        val concats = docs.as("a").filter(col("doc_id") % 10 === 0)
          .join(docs.as("b"), col("b.doc_id") === col("a.doc_id") + 1)
          .select((col("a.doc_id") + lit(20000L)).as("doc_id"),
            concat(col("a.text"), lit(" "), col("b.text")).as("text"))
        Dedup.containmentPairs(docs.unionByName(concats), 0.9)
          .orderBy("doc_a", "doc_b")
      },
      Some("WITH d AS (SELECT doc_id, text FROM documents " +
        "UNION ALL SELECT a.doc_id + 20000 AS doc_id, " +
        "a.text || ' ' || b.text AS text FROM documents a " +
        "JOIN documents b ON b.doc_id = a.doc_id + 1 " +
        "WHERE a.doc_id % 10 = 0), " +
        "toks AS (SELECT doc_id, " + toksSql + " AS t FROM d), " +
        "ngr AS (SELECT doc_id, list_distinct(" +
        "[t[i] || ' ' || t[i+1] || ' ' || t[i+2] " +
        "FOR i IN range(1, len(t) - 1)]) AS ng FROM toks WHERE len(t) >= 3), " +
        "posting AS (SELECT doc_id, unnest(ng) AS g, len(ng) AS n FROM ngr), " +
        "pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
        "count(*) AS common, any_value(a.n) AS na, any_value(b.n) AS nb " +
        "FROM posting a JOIN posting b ON a.g = b.g AND a.doc_id < b.doc_id " +
        "GROUP BY 1, 2) " +
        "SELECT doc_a, doc_b, " +
        "CAST(common AS DOUBLE) / na AS containment_a, " +
        "CAST(common AS DOUBLE) / nb AS containment_b FROM pairs " +
        "WHERE greatest(CAST(common AS DOUBLE) / na, " +
        "CAST(common AS DOUBLE) / nb) >= 0.9 " +
        "ORDER BY doc_a, doc_b")),


    // Duplicate clusters: connected components over the near-dup pair set
    // (min-doc_id labels). Oracle: recursive-CTE transitive closure over
    // the same pair SQL.
    Q("q_dedup_clusters",
      (s, d) => Dedup.duplicateClusters(
        Dedup.ngramJaccardPairs(Tables.documents(s, d), 0.5))
        .orderBy("doc_id"),
      Some("WITH RECURSIVE p AS (SELECT doc_a, doc_b FROM " +
        s"($ngramJaccardOracle)), " +
        "e AS (SELECT doc_a AS src, doc_b AS dst FROM p " +
        "UNION SELECT doc_b, doc_a FROM p), " +
        "reach AS (SELECT src, dst FROM e " +
        "UNION SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src) " +
        "SELECT src AS doc_id, least(src, min(dst)) AS cluster_id " +
        "FROM reach GROUP BY src ORDER BY doc_id")),


    // The full dedup verdict: every doc, its cluster (self when unpaired),
    // and the keep flag (cluster min is the kept representative).
    // `filter(keep)` is the deduplicated corpus.
    Q("q_dedup_decisions",
      (s, d) => Dedup.dedupDecisions(
        Tables.documents(s, d),
        Dedup.ngramJaccardPairs(Tables.documents(s, d), 0.5))
        .orderBy("doc_id"),
      Some("WITH RECURSIVE p AS (SELECT doc_a, doc_b FROM " +
        s"($ngramJaccardOracle)), " +
        "e AS (SELECT doc_a AS src, doc_b AS dst FROM p " +
        "UNION SELECT doc_b, doc_a FROM p), " +
        "reach AS (SELECT src, dst FROM e " +
        "UNION SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src), " +
        "cl AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id " +
        "FROM reach GROUP BY src) " +
        "SELECT d.doc_id, COALESCE(cl.cluster_id, d.doc_id) AS cluster_id, " +
        "COALESCE(cl.cluster_id, d.doc_id) = d.doc_id AS keep " +
        "FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id " +
        "ORDER BY d.doc_id")),


    // Duplicate-cluster SIZE HISTOGRAM: how many clusters of each size the
    // near-dup graph produces (singletons included) — the one-glance dedup
    // audit (a fat head of large clusters means boilerplate or a crawler
    // loop; the deduped corpus size is Σ n_clusters).
    Q("q_dedup_cluster_sizes",
      (s, d) => Dedup.dedupDecisions(
          Tables.documents(s, d),
          Dedup.ngramJaccardPairs(Tables.documents(s, d), 0.5))
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("sz"))
        .groupBy(col("sz").as("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"))
        .orderBy("cluster_size"),
      Some(clusterSizesOracle)),


    // The size histogram read from the PERSISTED cluster table instead of
    // an embedded recompute — same oracle as q_dedup_cluster_sizes, so
    // hash equality certifies the stored decisions (write→read fidelity,
    // the q_split_leakage_safe_indexed twin over the same index artifact).
    Q("q_dedup_cluster_sizes_indexed",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val name = "graft_cl_hist_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        Dedup.writeClusterTable(docs, Dedup.ngramJaccardPairs(docs, 0.5), name)
        try Dedup.clusterTable(s, name)
          .groupBy(col("cluster_id"))
          .agg(count(lit(1)).as("sz"))
          .groupBy(col("sz").as("cluster_size"))
          .agg(count(lit(1)).as("n_clusters"))
          .orderBy("cluster_size").localCheckpoint(true)
        finally Dedup.dropClusterTable(s, name)
      },
      Some(clusterSizesOracle)),


    // TARGETED DELETION from the cluster table — the one family where
    // deletion must RE-ELECT: clones carry NEGATIVE ids (-doc_id - 1),
    // so while present they steal both the cluster label (min id) and
    // the keep verdict from every 50th document's cluster; deleting them
    // must hand both back. deleteFromClusterTable re-clusters ONLY the
    // touched components on the surviving-member pair subgraph, and the
    // result must equal the clusters-of-documents-alone recursive-CTE
    // oracle exactly (components can only split when vertices leave, so
    // the scoped recompute IS the full rebuild's answer).
    Q("q_dedup_cluster_sizes_deleted",
      (s, d) => {
        val docs = Tables.documents(s, d).select("doc_id", "text")
        val clones = docs.filter(col("doc_id") % 50 === 0)
          .select((-col("doc_id") - 1).as("doc_id"), col("text"))
        val all = docs.unionByName(clones)
        val pairs = Dedup.ngramJaccardPairs(all, 0.5).localCheckpoint(true)
        val name = "graft_cl_del_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        Dedup.writeClusterTable(all, pairs, name)
        val cloneIds = clones.select("doc_id").collect()
          .map(_.getLong(0)).toSeq
        try {
          Dedup.deleteFromClusterTable(s, name, cloneIds, pairs)
          Dedup.clusterTable(s, name)
            .groupBy(col("cluster_id"))
            .agg(count(lit(1)).as("sz"))
            .groupBy(col("sz").as("cluster_size"))
            .agg(count(lit(1)).as("n_clusters"))
            .orderBy("cluster_size").localCheckpoint(true)
        } finally Dedup.dropClusterTable(s, name)
      },
      Some(clusterSizesOracle)),


    // BLOOM PRE-SCREEN for incremental dedup, both invariant directions
    // in one hash-gated report: the 'overlap' arm screens the batch
    // against a filter built over ALL docs (itself included), so every
    // row MUST come back maybe_seen ∧ actually_seen — the
    // no-false-negative proof; the 'disjoint' arm screens against the
    // doc_id%7≠0 corpus, where rows surface as definitely-new or as
    // measured false positives. The exact text-equality truth rides in
    // each row.
    Q("q_dedup_bloom_screen",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val batch = docs.filter(col("doc_id") % 7 === 0)
        def arm(seen: org.apache.spark.sql.DataFrame, mode: String) =
          Dedup.bloomScreen(batch, Dedup.bloomBuild(seen))
            .join(
              batch.join(seen.select(col("text")).distinct(),
                  Seq("text"), "left_semi")
                .select(col("doc_id"), lit(true).as("actually_seen")),
              Seq("doc_id"), "left")
            .select(lit(mode).as("mode"), col("doc_id"), col("maybe_seen"),
              coalesce(col("actually_seen"), lit(false)).as("actually_seen"))
            .withColumn("false_positive",
              col("maybe_seen") && !col("actually_seen"))
        arm(docs.filter(col("doc_id") % 7 =!= 0), "disjoint")
          .unionByName(arm(docs, "overlap"))
          .orderBy("mode", "doc_id")
      },
      Some(bloomScreenOracle)),


    // BEST-COPY per NEAR-DUP cluster: canonical selection by quality
    // (longest copy, score = n_chars) instead of the arbitrary min-id
    // representative — exactBest lifted from the exact-digest group to
    // the connected component; keep=false rows are the dedup decision
    // list. The oracle replays components + one pick window.
    Q("q_dedup_cluster_best",
      (s, d) => {
        val docs = Tables.documents(s, d)
        Dedup.clusterBest(docs, Dedup.ngramJaccardPairs(docs, 0.5),
            col("n_chars").cast("long"))
          .orderBy("doc_id")
      },
      Some(clusterBestOracle)),


    // SimHash replayed end-to-end in SQL: FNV-1a 64 per token over its
    // UTF-8 BYTES (code points are expanded to UTF-8 in SQL, so multi-byte
    // text hashes identically to the engine's getBytes walk; HUGEINT
    // arithmetic masked to 64 bits — DuckDB BIGINT throws on the wrap the
    // hash relies on), bit votes, 4×16-bit band join, Hamming verify.
    Q("q_dedup_simhash",
      (s, d) => Dedup.simhashNearDups(Tables.documents(s, d), maxHamming = 3)
        .orderBy("doc_a", "doc_b"),
      Some("WITH t AS (SELECT doc_id, " + toksSql + " AS toks FROM documents), " +
        "tok AS (SELECT doc_id, unnest(toks) AS tk FROM t), " +
        "cps AS (SELECT doc_id, tk, " +
        "[unicode(c) FOR c IN regexp_extract_all(tk, '.')] AS cp FROM tok), " +
        "tb AS (SELECT doc_id, flatten([" +
        "CASE WHEN c < 128 THEN [c] " +
        "WHEN c < 2048 THEN [192 + c // 64, 128 + c % 64] " +
        "WHEN c < 65536 THEN [224 + c // 4096, 128 + (c // 64) % 64, 128 + c % 64] " +
        "ELSE [240 + c // 262144, 128 + (c // 4096) % 64, " +
        "128 + (c // 64) % 64, 128 + c % 64] END FOR c IN cp]) AS bs FROM cps), " +
        "th AS (SELECT doc_id, list_reduce(" +
        "list_prepend(CAST(14695981039346656037 AS HUGEINT), " +
        "[CAST(b AS HUGEINT) FOR b IN bs]), " +
        "(acc, x) -> (xor(acc, x) * 1099511628211) % 18446744073709551616) AS h " +
        "FROM tb), " +
        "bits AS (SELECT doc_id, b, sum(CASE WHEN (h // CAST(power(2, b) AS HUGEINT)) " +
        "% 2 = 1 THEN 1 ELSE -1 END) AS vote " +
        "FROM th, (SELECT unnest(range(64)) AS b) bl GROUP BY doc_id, b), " +
        "sig AS (SELECT doc_id, sum(CASE WHEN vote > 0 " +
        "THEN CAST(power(2, b) AS HUGEINT) ELSE CAST(0 AS HUGEINT) END) AS s " +
        "FROM bits GROUP BY doc_id), " +
        "banded AS (SELECT doc_id, s, b AS band, " +
        "CAST((s // CAST(power(2, 16 * b) AS HUGEINT)) % 65536 AS BIGINT) AS chunk " +
        "FROM sig, (SELECT unnest(range(4)) AS b) bb), " +
        "cand AS (SELECT DISTINCT a.doc_id AS doc_a, a.s AS sa, b.doc_id AS doc_b, b.s AS sb " +
        "FROM banded a JOIN banded b ON a.band = b.band AND a.chunk = b.chunk " +
        "AND a.doc_id < b.doc_id), " +
        "ham AS (SELECT doc_a, doc_b, bit_count(xor(sa, sb)) AS hamming FROM cand) " +
        "SELECT doc_a, doc_b, CAST(hamming AS INT) AS hamming FROM ham " +
        "WHERE hamming <= 3 ORDER BY doc_a, doc_b")),


    // Sign-bit LSH bands (width auto-sized from the corpus count exactly as
    // Dedup.embeddingNearDups does) + exact fold-left cosine verify.
    Q("q_dedup_embedding",
      (s, d) => Dedup.embeddingNearDups(Tables.embeddings(s, d), 0.35)
        .orderBy("vec_a", "vec_b"),
      Some(s"WITH $normEmbCte, " +
        "p AS (SELECT least(16, greatest(2, CAST(ceil(" +
        "ln((SELECT count(*) FROM embeddings) / 128.0) / ln(2.0)) AS INT))) AS bpb), " +
        "banded AS (SELECT vec_id, v, b AS band, " +
        "CAST(list_sum([CASE WHEN v[b * bpb + j + 1] >= 0 " +
        "THEN CAST(power(2, j) AS BIGINT) ELSE 0 END FOR j IN range(0, bpb)]) " +
        "AS BIGINT) AS chunk " +
        "FROM nv, p, (SELECT unnest(range(4)) AS b) bb), " +
        "cand AS (SELECT DISTINCT a.vec_id AS vec_a, a.v AS va, " +
        "b.vec_id AS vec_b, b.v AS vb " +
        "FROM banded a JOIN banded b ON a.band = b.band AND a.chunk = b.chunk " +
        "AND a.vec_id < b.vec_id), " +
        s"sc AS (SELECT vec_a, vec_b, ${dotSql("va", "vb")} AS cosine FROM cand) " +
        "SELECT vec_a, vec_b, cosine FROM sc WHERE cosine >= 0.35 " +
        "ORDER BY vec_a, vec_b")),


    // SemDeDup: semantic dedup via the SAME trained quantizer — cluster,
    // then drop any vector with cosine ≥ 0.35 to a lower-id cluster-mate.
    // The oracle replays fit + assignment + the pairwise max, so it gates
    // the training determinism AND the keep rule end to end.
    Q("q_dedup_semantic",
      (s, d) => Dedup.semanticDedup(Tables.embeddings(s, d), threshold = 0.35)
        .orderBy("vec_id"),
      Some(semanticDedupOracle(dim = 64, sampleSize = 256, centroids = 8,
        iters = 2, threshold = 0.35))),


    // SEMANTIC CLUSTERS: connected components over the k-NN graph's
    // ≥0.35-cosine edges — the GROUP artifact (cluster-balanced sampling,
    // per-cluster best copy, diversity audits) where q_dedup_semantic is
    // the per-vector keep verdict; components may span cells through
    // probed-cell edge chains. The oracle composes the trained-IVF knn
    // replay with the recursive-closure CTEs of the text clustering.
    Q("q_dedup_semantic_clusters",
      (s, d) => Dedup.semanticClusters(Tables.embeddings(s, d),
          threshold = 0.35, k = 5, nprobe = 2)
        .orderBy("vec_id"),
      Some("WITH RECURSIVE " +
        ivfTrainedScoredCtes(dim = 64, sampleSize = 256, centroids = 8,
          iters = 2, nprobe = 2, queryWhere = "").stripPrefix("WITH ") + ", " +
        "rk2 AS (SELECT query_id, neighbor_id, score, row_number() OVER " +
        "(PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank " +
        "FROM sc), " +
        "kedge AS (SELECT query_id AS ka, neighbor_id AS kb FROM rk2 " +
        "WHERE rank <= 5 AND score >= 0.35), " +
        "e2 AS (SELECT ka AS src, kb AS dst FROM kedge " +
        "UNION SELECT kb, ka FROM kedge), " +
        "reach2 AS (SELECT src, dst FROM e2 " +
        "UNION SELECT r2.src, e2.dst FROM reach2 r2 JOIN e2 ON r2.dst = e2.src), " +
        "comp2 AS (SELECT src AS vec_id, least(src, min(dst)) AS cluster_id " +
        "FROM reach2 GROUP BY src) " +
        "SELECT em.vec_id, COALESCE(comp2.cluster_id, em.vec_id) " +
        "AS cluster_id FROM embeddings em LEFT JOIN comp2 USING (vec_id) " +
        "ORDER BY em.vec_id")),


    // SemDeDup answered from the PERSISTED ANN index: the k-means fit +
    // corpus assignment (the expensive half at 100 TB) is exactly what
    // writeAnnIndex stores, so the dedup pass reads it instead of
    // re-fitting — search and dedup share one index artifact. Same
    // oracle as q_dedup_semantic = write→read fidelity.
    Q("q_dedup_semantic_indexed",
      (s, d) => {
        val name = "graft_sem_idx_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        Similarity.writeAnnIndex(Tables.embeddings(s, d), name,
          centroids = 8, sampleSize = 256, iters = 2)
        try Dedup.semanticDedupIndexed(s, name, threshold = 0.35)
          .orderBy("vec_id").localCheckpoint(true)
        finally Similarity.dropAnnIndex(s, name)
      },
      Some(semanticDedupOracle(dim = 64, sampleSize = 256, centroids = 8,
        iters = 2, threshold = 0.35)))
  )
}
