package graft.queries

import graft.functions.{Bpe, Dedup, MinhashIndex, Multimodal, Similarity, Takedown, TextAnalysis, Unigram}
import graft.oracles.PipelineOracles._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Remaining pipeline registrations (sampling/splits/packing, quality/privacy, multimodal, events, approx, snapshots) — extracted verbatim from SparkEntry (round-14
  * decomposition, VERDICT r13 item 8): SparkEntry concatenates these
  * module lists, so the driver-contract maps are unchanged while no
  * single file holds the whole registry. The conventions (identical
  * aliases both sides, total ORDER BY, DOUBLE at the money boundary)
  * are documented on [[graft.SparkEntry]].
  */
private[graft] object MiscQueries {

  private[graft] val queries: Seq[Q] = Seq(

    // Heuristic language-ID: marker-hit counts per language, argmax with
    // ties toward the earlier language (LangId.compute's strict `>` scan).
    // The oracle's CASE cascade is the same earliest-argmax: branch k fires
    // only when lang_k >= every later language AND all earlier branches
    // failed (which forces every earlier score strictly below the max).
    // CORPUS MANIFEST (dataset card): per (source, detected lang, split)
    // doc/token/char counts — three already-gated signals (lang-id, the
    // content-keyed hash split, whitespace token count) composed in ONE
    // corpus scan + one tiny aggregate exchange. The oracle re-renders
    // each signal from its individually-gated fragment (the no-silent-
    // divergence rule), with BIGINT casts on the summed counts (DuckDB
    // SUM(BIGINT) → HUGEINT) and NULLS LAST pinned on every sort key.
    Q("q_corpus_manifest",
      (s, d) => graft.functions.DataQuality.corpusManifest(Tables.documents(s, d))
        .orderBy(asc_nulls_last("source"), asc_nulls_last("lang_guess"),
          asc_nulls_last("split")),
      Some(s"WITH $fpCtesBody, " +
        s"t AS (SELECT doc_id, source, CAST(length(text) AS BIGINT) AS n_chars, " +
        s"$toksSql AS toks FROM documents), " +
        "s AS (SELECT doc_id, source, n_chars, " +
        "CAST(len(toks) AS BIGINT) AS token_count, " +
        langMarkerColsSql("toks") + " FROM t), " +
        s"l AS (SELECT doc_id, source, n_chars, token_count, " +
        s"$langGuessCaseSql AS lang_guess FROM s), " +
        "sp AS (SELECT doc_id, CASE WHEN fingerprint IS NULL THEN NULL " +
        "WHEN fingerprint % 100 < 95 THEN 'train' " +
        "WHEN fingerprint % 100 < 98 THEN 'val' ELSE 'test' END AS split FROM fp) " +
        "SELECT source, lang_guess, split, count(*) AS n_docs, " +
        "CAST(sum(token_count) AS BIGINT) AS n_tokens, " +
        "CAST(sum(n_chars) AS BIGINT) AS n_chars " +
        "FROM l JOIN sp USING (doc_id) GROUP BY 1, 2, 3 " +
        "ORDER BY source NULLS LAST, lang_guess NULLS LAST, split NULLS LAST")),


    // Corpus snapshot diff (dataset-versioning audit): two snapshots are
    // synthesized from the corpus — docs ≡5 (mod 7) exist only in the new
    // crawl (added), ≡6 only in the old (removed), ≡3 carry edited text
    // (changed), the rest are identical (unchanged). The engine diffs
    // 64-bit content hashes so the full-outer join shuffles 16 bytes/doc;
    // the ORACLE compares raw text (`IS NOT DISTINCT FROM`, the ground
    // truth) — hash equality therefore also certifies the hash scheme
    // produced zero false verdicts on this corpus.
    Q("q_snapshot_diff",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val oldSnap = docs.filter(col("doc_id") % 7 =!= 5)
        val newSnap = docs.filter(col("doc_id") % 7 =!= 6)
          .withColumn("text",
            when(col("doc_id") % 7 === 3, concat(col("text"), lit(" v2")))
              .otherwise(col("text")))
        graft.functions.Snapshot.diff(oldSnap, newSnap).orderBy("doc_id")
      },
      Some("WITH o AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 5), " +
        "n AS (SELECT doc_id, CASE WHEN doc_id % 7 = 3 THEN text || ' v2' " +
        "ELSE text END AS text FROM documents WHERE doc_id % 7 <> 6) " +
        "SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id, " +
        "CASE WHEN o.doc_id IS NULL THEN 'added' " +
        "WHEN n.doc_id IS NULL THEN 'removed' " +
        "WHEN o.text IS NOT DISTINCT FROM n.text THEN 'unchanged' " +
        "ELSE 'changed' END AS status " +
        "FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id ORDER BY doc_id")),


    // Content-keyed train/val/test split (95/3/2): bucket = fingerprint
    // mod 100, contiguous ranges in declaration order. Content-keyed means
    // exact duplicates can never straddle a split boundary.
    Q("q_split_assign",
      (s, d) => graft.functions.Sampling.hashSplit(
        Tables.documents(s, d).select("doc_id", "text"),
        Seq(("train", 95), ("val", 3), ("test", 2)))
        .select("doc_id", "bucket", "split").orderBy("doc_id"),
      Some(s"$fpCte SELECT doc_id, fingerprint % 100 AS bucket, " +
        "CASE WHEN fingerprint % 100 < 95 THEN 'train' " +
        "WHEN fingerprint % 100 < 98 THEN 'val' ELSE 'test' END AS split " +
        "FROM fp ORDER BY doc_id")),


    // Cluster-aware LEAKAGE-SAFE split: every doc keys on its duplicate
    // cluster's representative id, so near-dups can never straddle
    // train/test — the oracle replays the components recursively and
    // hashes the representative's string rendering through the same
    // rolling-hash machinery as q_split_assign.
    Q("q_split_leakage_safe",
      (s, d) => graft.functions.Sampling.leakageSafeSplit(
        Tables.documents(s, d),
        Dedup.ngramJaccardPairs(Tables.documents(s, d), 0.5),
        Seq(("train", 95), ("val", 3), ("test", 2)))
        .orderBy("doc_id"),
      Some(leakageSafeOracle)),


    // The INDEXED leakage-safe split: the duplicate-cluster table is
    // materialized ONCE ([[graft.functions.Dedup.writeClusterTable]] —
    // doc_id-bucketed, meta published last) and the split reader pays only
    // a table scan + scan-side bucket/split projections, not the pair
    // generation + star contraction the from-scratch path embeds per call.
    // SAME oracle as q_split_leakage_safe, so hash equality certifies
    // write→read fidelity of the persisted clustering (the
    // q_text_bigram_indexed discipline). Unique table name + eager
    // materialization + finally-drop.
    Q("q_split_leakage_safe_indexed",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val name = "graft_cl_idx_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        Dedup.writeClusterTable(docs, Dedup.ngramJaccardPairs(docs, 0.5), name)
        try graft.functions.Sampling.leakageSafeSplitIndexed(s, name,
            Seq(("train", 95), ("val", 3), ("test", 2)))
          .orderBy("doc_id").localCheckpoint(true)
        finally Dedup.dropClusterTable(s, name)
      },
      Some(leakageSafeOracle)),


    // LEAKAGE AUDIT: the same near-dup pair set classified under BOTH
    // split strategies in one report — the content split (per-doc hash)
    // shows cross-split near-dup pairs, the cluster split's leaking rows
    // aggregate to ZERO by construction, and the hash gate certifies the
    // exact count distribution of both. The pair set materializes once
    // (localCheckpoint) and feeds the content audit, the clustering, and
    // the cluster audit.
    Q("q_split_leakage_audit",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val pairs = Dedup.ngramJaccardPairs(docs, 0.5).localCheckpoint(true)
        val splits = Seq(("train", 95), ("val", 3), ("test", 2))
        val content = graft.functions.Sampling.hashSplit(
          docs.select("doc_id", "text"), splits).select("doc_id", "split")
        val cluster = graft.functions.Sampling
          .leakageSafeSplit(docs, pairs, splits).select("doc_id", "split")
        graft.functions.Sampling.leakageAudit(content, pairs)
          .withColumn("method", lit("content"))
          .unionByName(graft.functions.Sampling.leakageAudit(cluster, pairs)
            .withColumn("method", lit("cluster")))
          .select("method", "split_lo", "split_hi", "n_pairs", "leaking")
          .orderBy("method", "split_lo", "split_hi")
      },
      Some(leakageAuditOracle)),


    // Deterministic stratified sampling: strata (doc_id mod 3 as a
    // stand-in source label) kept at 100% / 50% / 10% by content-hash
    // bucket out of 10,000 — reproducible, duplicate-consistent, no RNG.
    Q("q_sample_stratified",
      (s, d) => graft.functions.Sampling.stratifiedSample(
        Tables.documents(s, d).select("doc_id", "text"),
        (col("doc_id") % 3).cast("string"),
        Map("0" -> 1.0, "1" -> 0.5, "2" -> 0.1))
        .select("doc_id").orderBy("doc_id"),
      Some(s"$fpCte SELECT doc_id FROM fp " +
        "WHERE fingerprint % 10000 < " +
        "CASE CAST(doc_id % 3 AS VARCHAR) WHEN '0' THEN 10000 " +
        "WHEN '1' THEN 5000 WHEN '2' THEN 1000 ELSE 0 END " +
        "ORDER BY doc_id")),


    // Per-source quota ("domain cap"): each source keeps its 15 lowest-
    // (fingerprint, doc_id) docs of 25 — the domain-balancing verdict,
    // content-keyed so re-ingest keeps the same documents.
    Q("q_sample_domain_cap",
      (s, d) => graft.functions.Sampling.domainCap(
        Tables.documents(s, d), maxPerSource = 15)
        .orderBy("doc_id"),
      Some(s"$fpCte, r AS (SELECT d.doc_id, d.source, " +
        "row_number() OVER (PARTITION BY d.source " +
        "ORDER BY fingerprint ASC NULLS LAST, d.doc_id) AS domain_rank " +
        "FROM documents d JOIN fp ON d.doc_id = fp.doc_id) " +
        "SELECT doc_id, source, CAST(domain_rank AS INT) AS domain_rank, " +
        "domain_rank <= 15 AS keep FROM r ORDER BY doc_id")),


    // Training-mixture sampling: a 60-doc budget filled 4:2:1:1 from
    // src0..src3 by largest-remainder quotas (src0's quota of 30 exceeds
    // its 25 available docs — the shortfall stays visible, not silently
    // redistributed), selection content-keyed within each source.
    Q("q_sample_mixture",
      (s, d) => graft.functions.Sampling.mixtureSample(
        Tables.documents(s, d), mixParts, totalN = mixTotal)
        .orderBy("doc_id"),
      Some(s"$fpCte, r AS (SELECT d.doc_id, d.source, " +
        "row_number() OVER (PARTITION BY d.source " +
        "ORDER BY fingerprint ASC NULLS LAST, d.doc_id) AS mix_rank " +
        "FROM documents d JOIN fp ON d.doc_id = fp.doc_id) " +
        s"SELECT doc_id, source, mix_rank, $mixQuotaSql AS quota, " +
        s"mix_rank <= $mixQuotaSql AS keep FROM r ORDER BY doc_id")),


    // DATA-CONSTRAINED EPOCH PLAN: a 40k-token budget split 4:2:1:1 over
    // src0..src3 against the corpus's measured per-source token counts —
    // epochs = exact integer ceil(target/available) plus the final partial
    // pass, sources past 4 epochs flagged (the Muennighoff repetition
    // cap). Targets are apportioned ONCE in Scala and rendered into both
    // engines (the mixQuota rule); everything data-dependent is replayed.
    Q("q_sample_epoch_plan",
      (s, d) => graft.functions.Sampling.epochPlan(
        Tables.documents(s, d), epochParts, budgetTokens = epochBudget)
        .orderBy("source"),
      Some("WITH a AS (SELECT source, " +
        s"CAST(sum(len($toksSql)) AS BIGINT) AS available_tokens " +
        "FROM documents WHERE text IS NOT NULL GROUP BY source), " +
        s"w AS (SELECT * FROM (VALUES $epochTargetValuesSql) " +
        "AS v(source, target_tokens)), " +
        "t AS (SELECT coalesce(a.source, w.source) AS source, " +
        "CAST(coalesce(a.available_tokens, 0) AS BIGINT) AS available_tokens, " +
        "CAST(coalesce(w.target_tokens, 0) AS BIGINT) AS target_tokens " +
        "FROM a FULL OUTER JOIN w ON a.source = w.source), " +
        "e AS (SELECT *, CAST(CASE WHEN target_tokens > 0 " +
        "AND available_tokens > 0 THEN " +
        "(target_tokens + available_tokens - 1) // available_tokens " +
        "WHEN target_tokens > 0 AND available_tokens = 0 THEN NULL " +
        "ELSE 0 END AS BIGINT) AS epochs FROM t) " +
        "SELECT source, available_tokens, target_tokens, epochs, " +
        "CAST(CASE WHEN epochs > 0 THEN target_tokens - " +
        "(epochs - 1) * available_tokens " +
        "WHEN epochs IS NULL THEN NULL ELSE 0 END AS BIGINT) " +
        "AS last_epoch_tokens, coalesce(epochs > 4, TRUE) AS over_epoch_cap " +
        "FROM e ORDER BY source")),


    // EPOCH EXPANSION: the plan materialized as the repeated-corpus
    // relation a loader consumes — one row per (document, pass), full
    // passes complete, the final partial pass cut at the token budget in
    // content-rank order (the crossing document included, overshoot
    // bounded by one doc). The 3× budget forces multi-epoch repetition at
    // every SF; the infeasible srcz source correctly contributes nothing.
    Q("q_sample_epoch_expand",
      (s, d) => graft.functions.Sampling.epochExpand(
        Tables.documents(s, d), epochParts, budgetTokens = expandBudget)
        .orderBy("source", "epoch", "doc_id"),
      Some(epochExpandOracle)),


    // TEMPERATURE-scaled mixture (α = 0.5, the UniMax/multilingual
    // up-sampling shape): quotas ∝ √(source count), weights computed FROM
    // THE DATA — one correctly-rounded IEEE sqrt per source into 2^20
    // fixed-point, then exact integer Hamilton apportionment replayed in
    // SQL (floor + largest remainder, ties by source), and the shared
    // content-keyed fingerprint ranking.
    Q("q_sample_temperature",
      (s, d) => graft.functions.Sampling.temperatureMixture(
        Tables.documents(s, d), totalN = 120)
        .orderBy("doc_id"),
      Some(s"$fpCte, " +
        "sct AS (SELECT source, CAST(count(*) AS BIGINT) AS n_source " +
        "FROM documents GROUP BY 1), " +
        "wtd AS (SELECT source, n_source, " +
        "CAST(round(sqrt(CAST(n_source AS DOUBLE)) * 1048576) AS BIGINT) AS wt " +
        "FROM sct), " +
        "tot AS (SELECT source, n_source, wt, " +
        "CAST(sum(wt) OVER () AS BIGINT) AS sum_wt FROM wtd), " +
        "bs AS (SELECT source, n_source, (120 * wt) // sum_wt AS base, " +
        "(120 * wt) % sum_wt AS rem FROM tot), " +
        "lo AS (SELECT *, CAST(120 - sum(base) OVER () AS BIGINT) AS leftover, " +
        "row_number() OVER (ORDER BY rem DESC, source) AS rk FROM bs), " +
        "qt AS (SELECT source, n_source, CAST(base + CASE WHEN rk <= leftover " +
        "THEN 1 ELSE 0 END AS BIGINT) AS quota FROM lo), " +
        "r AS (SELECT d.doc_id, d.source, " +
        "row_number() OVER (PARTITION BY d.source " +
        "ORDER BY fingerprint ASC NULLS LAST, d.doc_id) AS mix_rank " +
        "FROM documents d JOIN fp ON d.doc_id = fp.doc_id) " +
        "SELECT r.doc_id, r.source, qt.n_source, qt.quota, r.mix_rank, " +
        "r.mix_rank <= qt.quota AS keep FROM r JOIN qt USING (source) " +
        "ORDER BY r.doc_id")),


    // Deterministic training-shuffle order (seed 7): pure modular
    // arithmetic both engines evaluate identically — the loader-side
    // epoch shuffle, no RNG state. key = x^5 mod p (non-affine, so epochs
    // are decorrelated permutations, not rotations of one order); every
    // intermediate product of two mod-p residues stays under 2^62.
    Q("q_sample_shuffle_order",
      (s, d) => graft.functions.Sampling.shuffleOrder(
        Tables.documents(s, d).select("doc_id"), seed = 7L)
        .orderBy("doc_id"),
      Some("SELECT doc_id, x4 * x % 2147483647 AS shuffle_key FROM (" +
        "SELECT doc_id, x, x2 * x2 % 2147483647 AS x4 FROM (" +
        "SELECT doc_id, x, x * x % 2147483647 AS x2 FROM (" +
        "SELECT doc_id, ((doc_id % 2147483647 + 7 % 2147483647) " +
        "% 2147483647 + 2147483647) % 2147483647 AS x FROM documents))) " +
        "ORDER BY doc_id")),


    // DSIR data selection (Xie et al., NeurIPS 2023): hashed-bigram
    // importance weights — target = three sources, raw = the whole
    // corpus; fixed-point 2^20-quantized per-bucket log-ratios (the ONLY
    // float step — per-doc weights are exact BIGINT sums over bucket
    // occurrences, so no fold-order pinning is needed), temperature-0
    // top-200 keep flag via a broadcast TakeOrdered threshold (the
    // corpus is never globally sorted). The oracle replays tokenize →
    // bigram → rolling-hash bucket → spine counts → quantized ratio →
    // integer weight sum → rank from scratch.
    Q("q_sample_dsir",
      (s, d) => {
        val docs = Tables.documents(s, d)
        // Materialize the B-row model once (KB-scale): dsirSelect's
        // threshold+flag shape references the scored frame twice, and a
        // lazy model subtree would re-scan both corpora inside each copy.
        val model = graft.functions.Sampling.dsirLogRatios(
            docs,
            docs.filter(col("source").isin(dsirTargetSources: _*)),
            dsirBucketCount)
          .localCheckpoint(true)
        graft.functions.Sampling.dsirSelect(
          graft.functions.Sampling.dsirScore(docs, model, dsirBucketCount),
          dsirKeepN)
          .orderBy("doc_id")
      },
      Some(dsirOracle)),


    // The persisted-model access path under the SAME oracle: fit the
    // DSIR ratio tables once, score the corpus FROM the stored tables
    // (bucket width read from the params row, never trusted from the
    // call site) — hash equality against the identical from-scratch
    // oracle is write→read fidelity for the model artifact (the
    // q_text_bigram_indexed pattern). The model holds per-bucket
    // aggregate counts only — no document content — so it is not a
    // takedown-registry family.
    Q("q_sample_dsir_indexed",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val name = "graft_dsir_idx_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        graft.functions.Sampling.writeDsirModel(s, name, docs,
          docs.filter(col("source").isin(dsirTargetSources: _*)),
          dsirBucketCount)
        try graft.functions.Sampling.dsirSelect(
            graft.functions.Sampling.dsirScoreIndexed(s, name, docs),
            dsirKeepN)
          .orderBy("doc_id").localCheckpoint(true)
        finally graft.functions.Sampling.dropDsirModel(s, name)
      },
      Some(dsirOracle)),


    // MOORE–LEWIS cross-entropy difference selection (ACL 2010) — the
    // classic in-domain data selector, completing the selection family
    // triangle beside the hashed-feature DSIR and the CCNet terciles:
    // two full bigram LMs (target slice + whole corpus), per-occurrence
    // quantized log-prob gaps summed as exact BIGINTs, length-normalized
    // mean thresholded by a broadcast TakeOrdered(200). The scored frame
    // localCheckpoints (narrow) so the two select passes fit the models
    // once.
    Q("q_sample_crossentropy",
      (s, d) => {
        val docs = Tables.documents(s, d)
        graft.functions.Sampling.crossEntropySelect(
          graft.functions.Sampling.crossEntropyScore(
            docs, docs.filter(col("source").isin(dsirTargetSources: _*)))
            .localCheckpoint(true),
          dsirKeepN)
          .orderBy("doc_id")
      },
      Some(crossEntropyOracle)),


    // The persisted Moore–Lewis access path under the SAME oracle: both
    // LMs are writeLmTable artifacts (bucketed c12/c1 tables + the
    // vocab globals row), so scoring reads stored models instead of
    // refitting — hash equality against the identical from-scratch
    // oracle certifies write→read fidelity of BOTH models, and the LM
    // family's exact count-unlearning (deleteFromLmTable) reaches the
    // selection models for free.
    Q("q_sample_crossentropy_indexed",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val tag = java.util.UUID.randomUUID().toString.replace("-", "")
        val (tn, rn) = (s"graft_ce_tgt_$tag", s"graft_ce_raw_$tag")
        TextAnalysis.writeLmTable(
          docs.filter(col("source").isin(dsirTargetSources: _*)), tn)
        TextAnalysis.writeLmTable(docs, rn)
        try graft.functions.Sampling.crossEntropySelect(
            graft.functions.Sampling.crossEntropyScoreIndexed(
              s, tn, rn, docs).localCheckpoint(true),
            dsirKeepN)
          .orderBy("doc_id").localCheckpoint(true)
        finally {
          TextAnalysis.dropLmTable(s, tn)
          TextAnalysis.dropLmTable(s, rn)
        }
      },
      Some(crossEntropyOracle)),


    // CCNet HEAD/MIDDLE/TAIL (Wenzek et al. 2020): LM-quality terciles
    // with cutoffs from a deterministic id-mix SAMPLE of the per-doc
    // scores (never a global sort — corpus assignment is one scan-side
    // CASE against two literal cutoffs). The oracle replays the bigram
    // chain, the sample selection, the rank-k cutoffs, and the CASE.
    Q("q_sample_perplexity_buckets",
      (s, d) => graft.functions.Sampling.headMiddleTail(
        // Materialize the narrow (doc_id, score) frame once: headMiddleTail
        // references it twice (256-row sample pass + bucket pass) and a
        // lazy subtree would re-run the whole bigram-LM chain for the
        // second pass — at 100 TB a 16-byte-per-doc score table is the
        // standard artifact; re-training the LM is not.
        TextAnalysis.bigramScore(Tables.documents(s, d))
          .select("doc_id", "bigram_score").localCheckpoint(true),
        sampleSize = 256)
        .orderBy("doc_id"),
      Some(bigramLmCtes + ", " +
        "dsq AS (SELECT doc_id, s / CAST(n AS DOUBLE) AS bigram_score FROM sc), " +
        "smq AS (SELECT bigram_score FROM dsq " +
        s"ORDER BY ${graft.functions.Similarity.sampleHashSql("doc_id")}, doc_id " +
        "LIMIT 256), " +
        "osq AS (SELECT bigram_score AS sv, " +
        "row_number() OVER (ORDER BY bigram_score DESC) AS rk, " +
        "count(*) OVER () AS nn FROM smq), " +
        "cutq AS (SELECT max(CASE WHEN rk = (nn + 2) // 3 THEN sv END) AS c1, " +
        "max(CASE WHEN rk = (2 * nn + 2) // 3 THEN sv END) AS c2 FROM osq) " +
        "SELECT dsq.doc_id, dsq.bigram_score, " +
        "CASE WHEN dsq.bigram_score >= cutq.c1 THEN 'head' " +
        "WHEN dsq.bigram_score >= cutq.c2 THEN 'middle' ELSE 'tail' END AS bucket " +
        "FROM dsq CROSS JOIN cutq ORDER BY dsq.doc_id")),


    // CHUNK EXTRACTION (RAG/context-window chunker): 32-token windows,
    // 16-token stride — the producer op that materializes overlapping
    // chunks (chunk_text included) for an embedding/retrieval stage. The
    // oracle replays the window arithmetic (⌈(n−w)/s⌉+1 windows, ragged
    // tail) and the 1-based inclusive list slice; every derived integer is
    // BIGINT-cast (range() already yields BIGINT — the HUGEINT rule).
    Q("q_chunk_windows",
      (s, d) => TextAnalysis.chunkWindows(
          Tables.documents(s, d).select("doc_id", "text"),
          windowTokens = 32, stride = 16)
        .orderBy("doc_id", "chunk_idx"),
      Some("WITH tk AS (SELECT doc_id, " + toksSql + " AS t FROM documents " +
        "WHERE text IS NOT NULL AND len(" + toksSql + ") > 0), " +
        "c AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n FROM tk), " +
        "x AS (SELECT doc_id, t, n, unnest(range(0, " +
        "CASE WHEN n <= 32 THEN 1 ELSE (n - 32 + 15) // 16 + 1 END)) AS i " +
        "FROM c) " +
        "SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx, " +
        "CAST(i * 16 AS BIGINT) AS token_start, " +
        "CAST(least(32, n - i * 16) AS BIGINT) AS n_tokens, " +
        "array_to_string(t[(i*16+1):(i*16+32)], ' ') AS chunk_text " +
        "FROM x ORDER BY doc_id, chunk_idx")),


    // Sequence packing: docs → fixed-token training sequences, shard-local
    // running sums (8 shards here; the window sort never sees more than a
    // shard). Quota semantics: a doc belongs to the pack its first token
    // lands in.
    // TOKEN-BALANCED shard assignment: serpentine deal over docs ranked
    // by token count desc — max−min shard imbalance bounded by one doc's
    // tokens. The rank is histogram + per-count window (no global sort);
    // the oracle replays histogram, rank, and the serpentine CASE.
    Q("q_pack_shards",
      (s, d) => graft.functions.Sampling.balancedShards(
        Tables.documents(s, d), shards = 8)
        .orderBy("doc_id"),
      Some("WITH tc AS (SELECT doc_id, " +
        s"CAST(len($toksSql) AS BIGINT) AS token_count FROM documents " +
        "WHERE text IS NOT NULL), " +
        "hist AS (SELECT token_count, count(*) AS c FROM tc GROUP BY 1), " +
        "hc AS (SELECT token_count, CAST(COALESCE(sum(c) OVER (" +
        "ORDER BY token_count DESC ROWS BETWEEN UNBOUNDED PRECEDING AND " +
        "1 PRECEDING), 0) AS BIGINT) AS higher FROM hist), " +
        "rk AS (SELECT tc.doc_id, tc.token_count, hc.higher + " +
        "row_number() OVER (PARTITION BY tc.token_count ORDER BY tc.doc_id) " +
        "AS rank FROM tc JOIN hc USING (token_count)) " +
        "SELECT doc_id, token_count, " +
        "CAST(CASE WHEN ((rank - 1) // 8) % 2 = 0 THEN (rank - 1) % 8 " +
        "ELSE 7 - (rank - 1) % 8 END AS BIGINT) AS shard " +
        "FROM rk ORDER BY doc_id")),


    Q("q_pack_sequences",
      (s, d) => graft.functions.Sampling.packSequences(
        Tables.documents(s, d), seqTokens = 512, shards = 8)
        .orderBy("doc_id"),
      Some("WITH t AS (SELECT doc_id, " +
        s"CAST(len($toksSql) AS BIGINT) AS token_count, " +
        "doc_id % 8 AS shard FROM documents), " +
        "c AS (SELECT *, COALESCE(sum(token_count) OVER (PARTITION BY shard " +
        "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) " +
        "AS cum FROM t) " +
        "SELECT doc_id, token_count, shard, " +
        "CAST(floor(cum / 512.0) AS BIGINT) AS pack_id, " +
        // DuckDB window SUM(BIGINT) → HUGEINT; cast to match Spark's int64.
        "CAST(cum % 512 AS BIGINT) AS pack_offset FROM c ORDER BY doc_id")),


    // LENGTH-BUCKETED BATCHING — packSequences' inference-side twin:
    // batches pad every row to their longest member, so the operator
    // builds BOTH arms (length-sorted vs arrival order) within doc_id%8
    // shards and the gated output IS the measured padding bill per
    // batch. Exact integers until the one pad_frac division.
    Q("q_pack_length_batches",
      (s, d) => graft.functions.Sampling.lengthBatches(
        Tables.documents(s, d), batchSize = 32, shards = 8)
        .orderBy("arm", "shard", "batch_id"),
      Some("WITH t AS (SELECT doc_id, " +
        s"CAST(len($toksSql) AS BIGINT) AS tc, " +
        "doc_id % 8 AS shard FROM documents WHERE text IS NOT NULL), " +
        "a1 AS (SELECT shard, tc, CAST(floor(CAST(row_number() OVER " +
        "(PARTITION BY shard ORDER BY tc DESC, doc_id) - 1 AS DOUBLE) " +
        "/ 32.0) AS BIGINT) AS batch_id FROM t), " +
        "a2 AS (SELECT shard, tc, CAST(floor(CAST(row_number() OVER " +
        "(PARTITION BY shard ORDER BY doc_id) - 1 AS DOUBLE) " +
        "/ 32.0) AS BIGINT) AS batch_id FROM t), " +
        "b AS (SELECT 'length_sorted' AS arm, shard, batch_id, " +
        "count(*) AS n_docs, max(tc) AS max_tokens, " +
        "CAST(sum(tc) AS BIGINT) AS sum_tokens FROM a1 GROUP BY 1, 2, 3 " +
        "UNION ALL SELECT 'arrival' AS arm, shard, batch_id, " +
        "count(*) AS n_docs, max(tc) AS max_tokens, " +
        "CAST(sum(tc) AS BIGINT) AS sum_tokens FROM a2 GROUP BY 1, 2, 3) " +
        "SELECT arm, CAST(shard AS BIGINT) AS shard, batch_id, " +
        "CAST(n_docs AS BIGINT) AS n_docs, max_tokens, sum_tokens, " +
        "n_docs * max_tokens - sum_tokens AS pad_tokens, " +
        "CASE WHEN max_tokens > 0 THEN " +
        "CAST(n_docs * max_tokens - sum_tokens AS DOUBLE) / " +
        "CAST(n_docs * max_tokens AS DOUBLE) " +
        "ELSE CAST(0.0 AS DOUBLE) END AS pad_frac " +
        "FROM b ORDER BY arm, shard, batch_id")),


    // The END-TO-END curation pipeline: filter verdict → exact dedup →
    // domain cap → content-keyed split → train-split packing, one manifest
    // row per surviving document. The oracle replays ALL FIVE stages in a
    // single composed query — the flagship demonstration that the gated
    // operators compose without semantic drift.
    Q("q_pipeline_curate",
      (s, d) => graft.functions.Curate.curate(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some(curateOracle)),


    // The FULL six-stage composition (round-16): filter verdict → near-dup
    // min-id clustering → decontamination against an in-corpus benchmark
    // (every 97th doc) → quality terciles over the SCRUBBED text (tail
    // drops) → temperature mixture at 3/5 of the survivors → 512-token
    // packing. Every stage is an individually-gated operator; this gate
    // certifies the COMPOSITION — stage boundaries, scrubbed-text
    // re-scoring, the mixture's budget arithmetic — against one oracle
    // that replays all six stages relation-by-relation.
    Q("q_pipeline_curate_full",
      (s, d) => {
        val docs = Tables.documents(s, d)
        graft.functions.Curate.curateFull(docs,
            docs.filter(col("doc_id") % 97 === 0).select("doc_id", "text"))
          .orderBy("doc_id")
      },
      Some(curateFullOracle)),


    // WINSORIZED per-source stats — robust corpus reporting: exact
    // discrete percentile cuts (k-th smallest at ⌈p·n⌉, no interpolation
    // formula to drift between engines), clamp, then integer-exact means
    // with one final division each. The oracle replays rank, cuts, clamp,
    // and division op-for-op.
    Q("q_quality_winsorized",
      (s, d) => graft.functions.DataQuality.winsorizedStats(
          Tables.documents(s, d).filter(col("text").isNotNull)
            .select(col("source"),
              size(TextAnalysis.tokens(col("text"))).as("token_count")),
          "token_count", "source")
        .orderBy("source"),
      Some(s"WITH t AS (SELECT source, CAST(len($toksSql) AS BIGINT) AS v " +
        "FROM documents WHERE text IS NOT NULL), " +
        "r AS (SELECT source, v, " +
        "CAST(row_number() OVER (PARTITION BY source ORDER BY v) AS BIGINT) AS rn, " +
        "count(*) OVER (PARTITION BY source) AS n FROM t), " +
        "c AS (SELECT source, " +
        "min(CASE WHEN rn = greatest(1, CAST(ceil(0.05 * n) AS BIGINT)) " +
        "THEN v END) AS lo_cut, " +
        "min(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT) THEN v END) AS hi_cut " +
        "FROM r GROUP BY 1) " +
        "SELECT source, count(*) AS n, lo_cut, hi_cut, " +
        "CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_raw, " +
        "CAST(sum(least(greatest(v, lo_cut), hi_cut)) AS DOUBLE) " +
        "/ CAST(count(*) AS DOUBLE) AS mean_winsorized " +
        "FROM r JOIN c USING (source) GROUP BY source, lo_cut, hi_cut " +
        "ORDER BY source")),


    // K-ANONYMITY enforcement (the quasi-identifier privacy gate that
    // follows the PII scan's direct-identifier scrub): any
    // (nation, segment) class under k=10 customers is re-identifying, so
    // both quasi columns are suppressed on those rows. The class table is
    // combinatorics-bounded (125 classes at every sf) and broadcasts; the
    // oracle replays the null-safe class join and the CASE suppression.
    Q("q_privacy_kanon",
      (s, d) => graft.functions.DataQuality.kAnonymize(
          Tables.customer(s, d), Seq("c_nationkey", "c_mktsegment"), k = 10)
        .orderBy("c_custkey"),
      Some("WITH g AS (SELECT c_nationkey AS qn, c_mktsegment AS qs, " +
        "CAST(count(*) AS BIGINT) AS class_size FROM customer GROUP BY 1, 2) " +
        "SELECT c_custkey, c_name, " +
        "CASE WHEN class_size >= 10 THEN c_nationkey END AS c_nationkey, " +
        "c_acctbal, " +
        "CASE WHEN class_size >= 10 THEN c_mktsegment END AS c_mktsegment, " +
        "class_size, class_size < 10 AS suppressed " +
        "FROM customer JOIN g ON c_nationkey IS NOT DISTINCT FROM qn " +
        "AND c_mktsegment IS NOT DISTINCT FROM qs ORDER BY c_custkey")),


    // l-DIVERSITY audit — the homogeneity-attack check k-anonymity can't
    // see: a class can be k-large yet uniform in its sensitive value.
    // Sensitive = the account-balance band floor(bal/2000) (one IEEE
    // division + floor, identical both engines); NULL sensitive counts
    // as a value of its own (the all-NULL class must read 1, not 0).
    Q("q_privacy_ldiversity",
      (s, d) => graft.functions.DataQuality.lDiversity(
          Tables.customer(s, d), Seq("c_nationkey", "c_mktsegment"),
          floor(col("c_acctbal") / 2000.0), l = 2)
        .orderBy(asc_nulls_last("c_nationkey"),
          asc_nulls_last("c_mktsegment")),
      Some("SELECT c_nationkey, c_mktsegment, " +
        "CAST(count(*) AS BIGINT) AS class_size, " +
        "CAST(count(DISTINCT floor(c_acctbal / 2000.0)) + " +
        "max(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_sensitive, " +
        "(count(DISTINCT floor(c_acctbal / 2000.0)) + " +
        "max(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END)) >= 2 " +
        "AS l_diverse " +
        "FROM customer GROUP BY 1, 2 " +
        "ORDER BY c_nationkey NULLS LAST, c_mktsegment NULLS LAST")),


    // t-CLOSENESS (Li et al., ICDE 2007): the skewness-attack audit the
    // first two privacy gates can't see — ordered-domain EMD between each
    // class's sensitive distribution and the table's, same fixture as
    // l-diversity (customer, quasi = nation × segment, sensitive =
    // 2000-wide acctbal buckets). Per-domain-row gaps quantize ONCE to
    // the 2^-30 grid (the DSIR fixed-point rule) so the per-class sum is
    // an exact BIGINT and the oracle replay is bit-stable; the oracle
    // rebuilds the count table, the ordered global cumulative, the
    // classes × domain spine (null-safe probe), and the quantized fold.
    Q("q_privacy_tcloseness",
      (s, d) => graft.functions.DataQuality.tCloseness(
          Tables.customer(s, d), Seq("c_nationkey", "c_mktsegment"),
          floor(col("c_acctbal") / 2000.0), t = 0.2)
        .orderBy(asc_nulls_last("c_nationkey"),
          asc_nulls_last("c_mktsegment")),
      Some("WITH cv AS (SELECT c_nationkey, c_mktsegment, " +
        "floor(c_acctbal / 2000.0) AS v, count(*) AS cc " +
        "FROM customer GROUP BY 1, 2, 3), " +
        "dom AS (SELECT v, CAST(sum(cc) AS BIGINT) AS gc FROM cv GROUP BY 1), " +
        "domc AS (SELECT v, CAST(sum(gc) OVER (ORDER BY v ASC NULLS LAST " +
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cg, " +
        "CAST(sum(gc) OVER () AS BIGINT) AS nn, " +
        "CAST(count(*) OVER () AS BIGINT) AS m FROM dom), " +
        "cls AS (SELECT c_nationkey, c_mktsegment, " +
        "CAST(sum(cc) AS BIGINT) AS class_size FROM cv GROUP BY 1, 2), " +
        "sp AS (SELECT cls.c_nationkey, cls.c_mktsegment, cls.class_size, " +
        "domc.v, domc.cg, domc.nn, domc.m FROM cls CROSS JOIN domc), " +
        "j AS (SELECT sp.*, COALESCE(cv.cc, 0) AS c FROM sp LEFT JOIN cv " +
        "ON sp.c_nationkey IS NOT DISTINCT FROM cv.c_nationkey " +
        "AND sp.c_mktsegment IS NOT DISTINCT FROM cv.c_mktsegment " +
        "AND sp.v IS NOT DISTINCT FROM cv.v), " +
        "cum AS (SELECT *, CAST(sum(c) OVER (PARTITION BY c_nationkey, " +
        "c_mktsegment ORDER BY v ASC NULLS LAST ROWS UNBOUNDED PRECEDING) " +
        "AS BIGINT) AS ccum FROM j), " +
        "terms AS (SELECT c_nationkey, c_mktsegment, class_size, m, " +
        "CAST(round(abs(CAST(ccum AS DOUBLE) / CAST(class_size AS DOUBLE) - " +
        "CAST(cg AS DOUBLE) / CAST(nn AS DOUBLE)) * 1073741824.0) AS BIGINT) " +
        "AS tq FROM cum), " +
        "cl AS (SELECT c_nationkey, c_mktsegment, class_size, " +
        "CASE WHEN m > 1 THEN CAST(CAST(sum(tq) AS BIGINT) AS DOUBLE) " +
        "/ 1073741824.0 / CAST(m - 1 AS DOUBLE) ELSE 0.0 END AS emd " +
        "FROM terms GROUP BY 1, 2, 3, m) " +
        "SELECT c_nationkey, c_mktsegment, class_size, emd, " +
        "emd <= 0.2 AS t_close FROM cl " +
        "ORDER BY c_nationkey NULLS LAST, c_mktsegment NULLS LAST")),


    // QUALITY-SIGNAL AGREEMENT: exact Spearman rank correlation between
    // the three gated quality signals (heuristic formula, linear
    // classifier, bigram LM) over the deterministic 1024-doc LCG sample
    // — the signal-redundancy audit a filtering ablation runs before
    // composing caps (ρ ≈ 1 ⇒ two signals gate the same documents).
    // Ranks are row_number over (score, doc_id) — the deterministic
    // tie-break variant — and the rank windows run on a KB-scale frame
    // at ANY corpus size (the tercile-sample discipline).
    Q("q_quality_signal_agreement",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val quality = docs.filter(col("text").isNotNull)
          .select(col("doc_id"),
            TextAnalysis.qualityScore(col("text")).as("score"))
        val classifier = TextAnalysis.classifierScoreInline(docs,
            classifierWeights, bias = classifierBias,
            thresholdMicros = classifierThreshold)
          .select(col("doc_id"), col("score"))
        val bigram = TextAnalysis.bigramScore(docs)
          .select(col("doc_id"), col("bigram_score").as("score"))
        graft.functions.DataQuality.signalAgreement(Seq(
            "quality" -> quality, "classifier" -> classifier,
            "bigram" -> bigram))
          .orderBy("pair")
      },
      Some(signalAgreementOracle)),


    // MIN-K% PROB membership audit (Shi et al. ICLR 2024) — the
    // MEMORIZATION side of the privacy ladder: fit the rational bigram
    // LM on the corpus, then score members (the documents themselves)
    // and in-distribution NON-members (token-reversed twins, same
    // unigrams / mostly-novel bigrams) by the mean of their bottom-20%
    // per-position probabilities. Bottom-k selection orders (p, pos),
    // k-of-n is integer arithmetic, the mean folds in sorted order —
    // engine-bit-identical; PipelineSpec pins the member/non-member
    // separation the audit exists to surface.
    Q("q_privacy_min_k_prob",
      (s, d) => {
        val base = Tables.documents(s, d).filter(col("text").isNotNull)
          .select(col("doc_id"), col("text"))
        val cands = base.withColumn("member", lit(true))
          .unionByName(base.select(
              (col("doc_id") + 1000000L).as("doc_id"),
              array_join(reverse(split(col("text"), " ")), " ").as("text"))
            .withColumn("member", lit(false)))
        TextAnalysis.minKProb(base, cands.select("doc_id", "text"))
          .join(cands.select(col("doc_id"), col("member")), Seq("doc_id"))
          .select(col("doc_id"), col("member"), col("n_bigrams"),
            col("min_k_prob"))
          .orderBy("doc_id")
      },
      Some(minKProbOracle)),


    // Min-K against the PERSISTED LM — the published deployment: the
    // audit model trains once (writeLmTable on the corpus under audit),
    // suspect sets stream through stored-model scoring. Same oracle
    // hash as the inline row certifies the access-path swap.
    Q("q_privacy_min_k_prob_indexed",
      (s, d) => {
        val base = Tables.documents(s, d).filter(col("text").isNotNull)
          .select(col("doc_id"), col("text"))
        val cands = base.withColumn("member", lit(true))
          .unionByName(base.select(
              (col("doc_id") + 1000000L).as("doc_id"),
              array_join(reverse(split(col("text"), " ")), " ").as("text"))
            .withColumn("member", lit(false)))
        val name = "graft_mink_idx_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        TextAnalysis.writeLmTable(base, name)
        try TextAnalysis.minKProbIndexed(s, name,
            cands.select("doc_id", "text"))
          .join(cands.select(col("doc_id"), col("member")), Seq("doc_id"))
          .select(col("doc_id"), col("member"), col("n_bigrams"),
            col("min_k_prob"))
          .orderBy("doc_id").localCheckpoint(true)
        finally TextAnalysis.dropLmTable(s, name)
      },
      Some(minKProbOracle)),


    // CANARY EXPOSURE audit (Carlini et al. 2019, "The Secret Sharer"):
    // LCG-generated candidate sequences per repetition class are
    // rendered CONFIGURATION (the classifierWeights discipline); each
    // class's canary is inserted reps ∈ {0,1,4,16} times, the bigram LM
    // refits on corpus+canaries, and the gated number is the canary's
    // per-class RANK among candidates by ordered-product sequence
    // probability — the exact-integer monotone core of the paper's
    // exposure metric. The falling rank across the repetition ladder IS
    // the memorization signal; PipelineSpec pins it.
    Q("q_privacy_canary_rank",
      (s, d) => {
        import s.implicits._
        val cands = canaryCandidates.toDF("reps", "cand_id", "ctext")
        val canaryDocs = canaryCandidates.filter(_._2 == 0)
          .flatMap { case (c, _, t) =>
            (0 until c).map(i => (2000000L + c * 1000L + i, t)) }
          .toDF("doc_id", "text")
        val corpus = Tables.documents(s, d).filter(col("text").isNotNull)
          .select(col("doc_id"), col("text")).unionByName(canaryDocs)
        TextAnalysis.canaryRank(corpus, cands).orderBy("reps")
      },
      Some(canaryRankOracle)),


    // The canary audit against the PERSISTED LM — the deployment that
    // composes with exact unlearning (TakedownSpec closes that loop:
    // deleteFromLmTable on the canaries restores the baseline audit
    // bit-for-bit). Same oracle hash as the inline row certifies the
    // stored-model access path.
    Q("q_privacy_canary_rank_indexed",
      (s, d) => {
        import s.implicits._
        val cands = canaryCandidates.toDF("reps", "cand_id", "ctext")
        val canaryDocs = canaryCandidates.filter(_._2 == 0)
          .flatMap { case (c, _, t) =>
            (0 until c).map(i => (2000000L + c * 1000L + i, t)) }
          .toDF("doc_id", "text")
        val corpus = Tables.documents(s, d).filter(col("text").isNotNull)
          .select(col("doc_id"), col("text")).unionByName(canaryDocs)
        val name = "graft_canary_idx_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        TextAnalysis.writeLmTable(corpus, name)
        try TextAnalysis.canaryRankIndexed(s, name, cands)
          .orderBy("reps").localCheckpoint(true)
        finally TextAnalysis.dropLmTable(s, name)
      },
      Some(canaryRankOracle)),


    // SOFT quality sampling: keep-probability ∝ the classifier score
    // (clamped to [0,1]) keyed on the content hash — the FineWeb-style
    // soft cut that keeps mid-quality documents in proportion instead of
    // discarding them. Composes two certified fragments: the classifier
    // oracle (as a subquery) and the fingerprint-bucket machinery.
    Q("q_sample_soft_quality",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val scored = TextAnalysis.classifierScoreInline(docs,
            classifierWeights, bias = classifierBias,
            thresholdMicros = classifierThreshold)
          .select(col("doc_id"), col("score"))
        graft.functions.Sampling.softQualitySample(
            docs.join(scored, Seq("doc_id")), col("score"))
          .select("doc_id", "score").orderBy("doc_id")
      },
      Some(s"$fpCte, scq AS (SELECT * FROM ($classifierOracle)) " +
        "SELECT f.doc_id, scq.score FROM fp f JOIN scq USING (doc_id) " +
        "WHERE f.fingerprint % 10000 < CAST(round(" +
        "least(greatest(scq.score, 0), 1) * 10000) AS BIGINT) " +
        "ORDER BY f.doc_id")),


    Q("q_multimodal_features",
      (s, d) => Multimodal.extractFeatures(
        Multimodal.mediaFromDocuments(Tables.documents(s, d)))
        .toDF().orderBy("doc_id"),
      Some("SELECT doc_id, " +
        "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' " +
        "ELSE 'video' END AS media_type, " +
        "strlen(text) AS n_bytes, " +
        "strlen(text) % 640 + 1 AS width, " +
        "(strlen(text) * 7) % 480 + 1 AS height, " +
        "CAST(CASE WHEN doc_id % 3 = 1 THEN 2 ELSE 3 END AS BIGINT) AS channels, " +
        "CASE WHEN doc_id % 3 = 2 THEN strlen(text) % 30 + 1 ELSE CAST(1 AS BIGINT) END " +
        "AS duration_frames FROM documents ORDER BY doc_id")),


    // Resize SCHEDULE: fit each image/video into a 320×240 box preserving
    // aspect — integer compares + one exact IEEE division per side, the
    // contract a real resampler plugs into (decode itself stays the
    // stubbed step). Pure projection over the features frame.
    Q("q_multimodal_resize",
      (s, d) => Multimodal.resizePlan(
        Multimodal.extractFeatures(
          Multimodal.mediaFromDocuments(Tables.documents(s, d))),
        targetW = 320, targetH = 240)
        .orderBy("doc_id"),
      Some("WITH f AS (SELECT doc_id, " +
        "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' " +
        "ELSE 'video' END AS media_type, " +
        "strlen(text) % 640 + 1 AS width, " +
        "(strlen(text) * 7) % 480 + 1 AS height FROM documents) " +
        "SELECT doc_id, media_type, CAST(width AS BIGINT) AS width, " +
        "CAST(height AS BIGINT) AS height, " +
        "CASE WHEN width * 240 >= height * 320 THEN CAST(320 AS BIGINT) " +
        "ELSE greatest(CAST(1 AS BIGINT), " +
        "CAST(floor(width * 240 / height) AS BIGINT)) END AS out_width, " +
        "CASE WHEN width * 240 >= height * 320 THEN " +
        "greatest(CAST(1 AS BIGINT), " +
        "CAST(floor(height * 320 / width) AS BIGINT)) " +
        "ELSE CAST(240 AS BIGINT) END AS out_height " +
        "FROM f WHERE media_type IN ('image', 'video') ORDER BY doc_id")),


    // Frame-sample SCHEDULE: 4 evenly spaced frame indexes per video
    // (slot j → ⌊j·frames/4⌋); slots stay explicit so short videos repeat
    // frames instead of shrinking the loader's tensor shape.
    Q("q_multimodal_frames",
      (s, d) => Multimodal.frameSamplePlan(
        Multimodal.extractFeatures(
          Multimodal.mediaFromDocuments(Tables.documents(s, d))), k = 4)
        .orderBy("doc_id", "slot"),
      Some("WITH f AS (SELECT doc_id, strlen(text) % 30 + 1 AS duration_frames " +
        "FROM documents WHERE doc_id % 3 = 2), " +
        "s AS (SELECT doc_id, unnest(range(0, 4)) AS slot, duration_frames " +
        "FROM f) " +
        "SELECT doc_id, CAST(slot AS BIGINT) AS slot, " +
        "CAST(floor(slot * duration_frames / 4) AS BIGINT) AS frame_idx " +
        "FROM s ORDER BY doc_id, slot")),


    // Perceptual 64-bit dHash per document — the multimodal dedup
    // signature. The driver corpus feeds UTF-8 text, so this replays the
    // deterministic CONTENT arm (normalized code points % 256 sampled
    // into the 9×8 grid); the PIXEL arm (ImageIO + native PPM decode,
    // box-mean grid) is pinned by PipelineSpec on real encoded images.
    // The oracle rebuilds the 64-bit word as a HUGEINT power sum and
    // folds it to signed BIGINT — bit-exact against the engine's Long.
    Q("q_multimodal_phash",
      (s, d) => Multimodal.contentDhash(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some(dhashSigCtes +
        " SELECT doc_id, " + dhashSignedSql + " AS dhash " +
        "FROM dsig ORDER BY doc_id")),


    // Near-duplicate pairs over those signatures: the SimHash banding
    // machinery (4×16-bit bands, full-signature Hamming verify) applied
    // to the perceptual hash — never all-pairs. Fixture: the corpus plus
    // a RE-CRAWL of itself under shifted ids (the re-ingest dedup
    // scenario) — every original pairs with its re-crawl at Hamming 0,
    // while this corpus's distinct documents all sit ≥ 13 bits apart
    // (measured), so the expected pair set is exactly the copies.
    Q("q_multimodal_phash_pairs",
      (s, d) => {
        val docs = Tables.documents(s, d).select("doc_id", "text")
        val recrawl = docs.select(
          (col("doc_id") + lit(10000000L)).as("doc_id"), col("text"))
        Multimodal.phashNearDups(
          Multimodal.contentDhash(docs.unionByName(recrawl)), maxHamming = 6)
          .orderBy("doc_a", "doc_b")
      },
      Some("WITH d2 AS (SELECT doc_id, text FROM documents UNION ALL " +
        "SELECT doc_id + 10000000 AS doc_id, text FROM documents), " +
        dhashSigCtesBody("d2") + ", " +
        "banded AS (SELECT doc_id, s, b AS band, " +
        "CAST((s // CAST(power(2, 16 * b) AS HUGEINT)) % 65536 AS BIGINT) AS chunk " +
        "FROM dsig, (SELECT unnest(range(4)) AS b) bb), " +
        "cand AS (SELECT DISTINCT a.doc_id AS doc_a, a.s AS sa, " +
        "b.doc_id AS doc_b, b.s AS sb " +
        "FROM banded a JOIN banded b ON a.band = b.band AND a.chunk = b.chunk " +
        "AND a.doc_id < b.doc_id), " +
        "ham AS (SELECT doc_a, doc_b, bit_count(xor(sa, sb)) AS hamming FROM cand) " +
        "SELECT doc_a, doc_b, CAST(hamming AS INT) AS hamming FROM ham " +
        "WHERE hamming <= 6 ORDER BY doc_a, doc_b")),


    // TARGETED DELETION from the signature table — the upsert gate's
    // MIRROR for the multimodal family (takedowns are precisely where
    // removed media must stop matching): the seen table is written WITH
    // signature clones of every third document (ids +20,000,000 — each
    // would pair with its re-crawl twin at Hamming 0), the clones are
    // tombstone-deleted, and screening the re-crawl (+10,000,000) must
    // yield exactly the batch×originals pair set.
    Q("q_multimodal_phash_deleted",
      (s, d) => {
        val docs = Tables.documents(s, d).select("doc_id", "text")
        val clones = docs.filter(col("doc_id") % 3 === 0).select(
          (col("doc_id") + lit(20000000L)).as("doc_id"), col("text"))
        val batch = docs.select(
          (col("doc_id") + lit(10000000L)).as("doc_id"), col("text"))
        val name = "graft_ph_del_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        Multimodal.writeSignatureTable(
          Multimodal.contentDhash(docs.unionByName(clones)), name)
        val cloneIds = docs.filter(col("doc_id") % 3 === 0)
          .select("doc_id").collect().map(_.getLong(0) + 20000000L).toSeq
        try {
          Multimodal.deleteFromPhashTable(s, name, cloneIds)
          Multimodal.screenSignatures(s, name,
              Multimodal.contentDhash(batch), maxHamming = 6)
            .orderBy("batch_doc", "seen_doc").localCheckpoint(true)
        } finally Multimodal.dropPhashTable(s, name)
      },
      Some("WITH d2 AS (SELECT doc_id, text FROM documents UNION ALL " +
        "SELECT doc_id + 10000000 AS doc_id, text FROM documents), " +
        dhashSigCtesBody("d2") + ", " +
        "banded AS (SELECT doc_id, s, b AS band, " +
        "CAST((s // CAST(power(2, 16 * b) AS HUGEINT)) % 65536 AS BIGINT) AS chunk " +
        "FROM dsig, (SELECT unnest(range(4)) AS b) bb), " +
        "cand AS (SELECT DISTINCT a.doc_id AS batch_doc, a.s AS sa, " +
        "b.doc_id AS seen_doc, b.s AS sb " +
        "FROM banded a JOIN banded b ON a.band = b.band AND a.chunk = b.chunk " +
        "AND a.doc_id >= 10000000 AND b.doc_id < 10000000), " +
        "ham AS (SELECT batch_doc, seen_doc, bit_count(xor(sa, sb)) AS hamming " +
        "FROM cand) " +
        "SELECT batch_doc, seen_doc, CAST(hamming AS INT) AS hamming FROM ham " +
        "WHERE hamming <= 6 ORDER BY batch_doc, seen_doc")),


    // VIDEO (fourth modality), signature arm: each document's normalized
    // text splits into 4 contiguous codepoint segments ("frames" — the
    // frameSamplePlan schedule made real at the content level, the
    // contentDhash convention lifted to sequences) and every segment
    // signs with the same 9×8 dHash as the still-content signature. The
    // PIXEL arm — all stored frames of real animated GIFs through the
    // JDK multi-frame reader, luma + box-mean per sampled frame — is
    // pinned by PipelineSpec on constructed animations (the pixel-vs-
    // content split the still q_multimodal_phash documents). The oracle
    // replays segmentation + per-segment grid + HUGEINT bit fold keyed
    // (doc_id, slot).
    Q("q_multimodal_video_phash",
      (s, d) => Multimodal.contentVideoDhash(Tables.documents(s, d), k = 4)
        .orderBy("doc_id", "slot"),
      Some("WITH dn AS (SELECT doc_id, " +
        "lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS norm " +
        "FROM documents), " +
        "vseg AS (SELECT doc_id, j AS slot, " +
        "substring(norm, (j * length(norm)) // 4 + 1, " +
        "((j + 1) * length(norm)) // 4 - (j * length(norm)) // 4) AS seg " +
        "FROM dn, (SELECT unnest(range(4)) AS j) jj " +
        "WHERE length(norm) > 0), " +
        "vs AS (SELECT doc_id, slot, seg FROM vseg WHERE length(seg) > 0), " +
        "dcp AS (SELECT doc_id, slot, [unicode(c) % 256 FOR c IN " +
        "regexp_extract_all(seg, '.')] AS cp FROM vs), " +
        "dg AS (SELECT doc_id, slot, [cp[(j * len(cp)) // 72 + 1] " +
        "FOR j IN range(0, 72)] AS g FROM dcp), " +
        "dsig AS (SELECT doc_id, slot, " +
        "list_reduce(list_prepend(CAST(0 AS HUGEINT), " +
        "[CASE WHEN g[(k // 8) * 9 + (k % 8) + 2] > g[(k // 8) * 9 + (k % 8) + 1] " +
        "THEN CAST(power(2, k) AS HUGEINT) ELSE CAST(0 AS HUGEINT) END " +
        "FOR k IN range(0, 64)]), (acc, x) -> acc + x) AS s FROM dg) " +
        "SELECT doc_id, CAST(slot AS BIGINT) AS slot, " + dhashSignedSql +
        " AS dhash FROM dsig ORDER BY doc_id, slot")),


    // VIDEO near-dup pairs: banded per-frame Hamming candidates with the
    // SLOT in the band key (only aligned frames of two videos ever meet)
    // + the frame-majority verdict (≥ 3 of 4 slots within Hamming 6).
    // Fixture: the corpus plus its re-crawl under shifted ids — every
    // original pairs with its twin at 4/4 matched frames, while distinct
    // documents need 3 independently colliding quarter-segments to
    // false-positive. The oracle replays candidates, the per-pair
    // matched-slot count, and the majority cut.
    Q("q_multimodal_video_pairs",
      (s, d) => {
        val docs = Tables.documents(s, d).select("doc_id", "text")
        val recrawl = docs.select(
          (col("doc_id") + lit(10000000L)).as("doc_id"), col("text"))
        Multimodal.videoNearDups(
          Multimodal.contentVideoDhash(docs.unionByName(recrawl), k = 4),
          maxHamming = 6, minMatchFrac = 0.75)
          .orderBy("doc_a", "doc_b")
      },
      Some("WITH d2 AS (SELECT doc_id, text FROM documents UNION ALL " +
        "SELECT doc_id + 10000000 AS doc_id, text FROM documents), " +
        "dn AS (SELECT doc_id, " +
        "lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS norm FROM d2), " +
        "vseg AS (SELECT doc_id, j AS slot, " +
        "substring(norm, (j * length(norm)) // 4 + 1, " +
        "((j + 1) * length(norm)) // 4 - (j * length(norm)) // 4) AS seg " +
        "FROM dn, (SELECT unnest(range(4)) AS j) jj " +
        "WHERE length(norm) > 0), " +
        "vs AS (SELECT doc_id, slot, seg FROM vseg WHERE length(seg) > 0), " +
        "dcp AS (SELECT doc_id, slot, [unicode(c) % 256 FOR c IN " +
        "regexp_extract_all(seg, '.')] AS cp FROM vs), " +
        "dg AS (SELECT doc_id, slot, [cp[(j * len(cp)) // 72 + 1] " +
        "FOR j IN range(0, 72)] AS g FROM dcp), " +
        "dsig AS (SELECT doc_id, slot, " +
        "list_reduce(list_prepend(CAST(0 AS HUGEINT), " +
        "[CASE WHEN g[(k // 8) * 9 + (k % 8) + 2] > g[(k // 8) * 9 + (k % 8) + 1] " +
        "THEN CAST(power(2, k) AS HUGEINT) ELSE CAST(0 AS HUGEINT) END " +
        "FOR k IN range(0, 64)]), (acc, x) -> acc + x) AS s FROM dg), " +
        "banded AS (SELECT doc_id, slot, s, b AS band, " +
        "CAST((s // CAST(power(2, 16 * b) AS HUGEINT)) % 65536 AS BIGINT) AS chunk " +
        "FROM dsig, (SELECT unnest(range(4)) AS b) bb), " +
        "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
        "a.slot AS slot, a.s AS sa, b.s AS sb " +
        "FROM banded a JOIN banded b ON a.slot = b.slot " +
        "AND a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id), " +
        "fm AS (SELECT doc_a, doc_b, count(*) AS n_matched FROM cand " +
        "WHERE bit_count(xor(sa, sb)) <= 6 GROUP BY 1, 2), " +
        "ns AS (SELECT doc_id, count(*) AS n FROM dsig GROUP BY 1) " +
        "SELECT doc_a, doc_b, CAST(n_matched AS BIGINT) AS n_matched, " +
        "CAST(greatest(na.n, nb.n) AS BIGINT) AS n_slots, " +
        "CAST(n_matched AS DOUBLE) / greatest(na.n, nb.n) AS match_frac " +
        "FROM fm JOIN ns na ON fm.doc_a = na.doc_id " +
        "JOIN ns nb ON fm.doc_b = nb.doc_id " +
        "WHERE CAST(n_matched AS DOUBLE) / greatest(na.n, nb.n) >= 0.75 " +
        "ORDER BY doc_a, doc_b"))
  )
}
