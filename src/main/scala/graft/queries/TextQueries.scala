package graft.queries

import graft.functions.{Bpe, Dedup, MinhashIndex, Multimodal, Similarity, Takedown, TextAnalysis, Unigram}
import graft.oracles.PipelineOracles._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis / tokenizer query registrations (q_text_*) — extracted verbatim from SparkEntry (round-14
  * decomposition, VERDICT r13 item 8): SparkEntry concatenates these
  * module lists, so the driver-contract maps are unchanged while no
  * single file holds the whole registry. The conventions (identical
  * aliases both sides, total ORDER BY, DOUBLE at the money boundary)
  * are documented on [[graft.SparkEntry]].
  */
private[graft] object TextQueries {

  /** Synthesized per-document URLs for the q_text_url_* gates — every
    * canonicalization trap in one generator, rendered identically into
    * both engines (shared-rendered-constant rule).
    */
  private def synthUrls(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"),
      concat(
        lit("HTTPS://WWW."), col("source"), lit(".Example.COM"),
        when(col("doc_id") % 3 === 0, lit(":443"))
          .when(col("doc_id") % 3 === 1, lit(":8080"))
          .otherwise(lit("")),
        lit("/Posts/"), (col("doc_id") % 25).cast("string"),
        when(col("doc_id") % 5 === 0,
          concat(lit("?utm_source=feed&id="),
            (col("doc_id") % 7).cast("string")))
          .when(col("doc_id") % 5 === 1, lit("/?b=2&a=1&utm_campaign=x"))
          .when(col("doc_id") % 5 === 2, lit("?ref=tw"))
          .when(col("doc_id") % 5 === 3,
            concat(lit("#sec-"), (col("doc_id") % 3).cast("string")))
          .otherwise(lit(""))).as("url"))

  private lazy val urlSynthSql: String =
    "u AS (SELECT doc_id, " +
      "'HTTPS://WWW.' || source || '.Example.COM' || " +
      "CASE WHEN doc_id % 3 = 0 THEN ':443' " +
      "WHEN doc_id % 3 = 1 THEN ':8080' ELSE '' END || " +
      "'/Posts/' || CAST(doc_id % 25 AS VARCHAR) || " +
      "CASE WHEN doc_id % 5 = 0 THEN '?utm_source=feed&id=' || " +
      "CAST(doc_id % 7 AS VARCHAR) " +
      "WHEN doc_id % 5 = 1 THEN '/?b=2&a=1&utm_campaign=x' " +
      "WHEN doc_id % 5 = 2 THEN '?ref=tw' " +
      "WHEN doc_id % 5 = 3 THEN '#sec-' || CAST(doc_id % 3 AS VARCHAR) " +
      "ELSE '' END AS url FROM documents)"

  /** DuckDB replay of [[graft.functions.TextAnalysis.urlNormalize]] —
    * CTEs c1..c3 ending at (doc_id, url, url_canonical). */
  private lazy val urlCanonSql: String =
    "c1 AS (SELECT doc_id, url, " +
      "lower(regexp_extract(trim(url), " +
      "'^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme, " +
      "lower(regexp_extract(trim(url), " +
      "'^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS hostport, " +
      "regexp_extract(trim(url), " +
      "'^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1) AS rest FROM u), " +
      "c2 AS (SELECT doc_id, url, scheme, " +
      "CASE WHEN scheme = 'http' THEN " +
      "regexp_replace(regexp_replace(hostport, '^www\\.', ''), ':80$', '') " +
      "WHEN scheme = 'https' THEN " +
      "regexp_replace(regexp_replace(hostport, '^www\\.', ''), ':443$', '') " +
      "ELSE regexp_replace(hostport, '^www\\.', '') END AS host, " +
      "regexp_extract(rest, '^([^?]*)', 1) AS rawpath, " +
      "regexp_extract(rest, '\\?(.*)$', 1) AS query FROM c1), " +
      "c2b AS (SELECT doc_id, url, scheme, host, rawpath, " +
      "COALESCE(array_to_string(list_sort(list_filter(" +
      "string_split(query, '&'), " +
      "p -> p <> '' AND NOT regexp_matches(p, " +
      "'^(utm_[A-Za-z0-9_]*|ref|fbclid|gclid)='))), '&'), '') AS qs " +
      "FROM c2), " +
      "c3 AS (SELECT doc_id, url, " +
      "CASE WHEN scheme = '' OR scheme IS NULL THEN NULL " +
      "ELSE scheme || '://' || host || " +
      "CASE WHEN regexp_replace(rawpath, '/+$', '') = '' THEN '/' " +
      "ELSE regexp_replace(rawpath, '/+$', '') END || " +
      "CASE WHEN qs = '' THEN '' ELSE '?' || qs END END " +
      "AS url_canonical FROM c2b)"


  /** The multi-line WRAPPED corpus shared by the boilerplate queries and
    * the takedown line-df gate: every document re-lined at 12 words,
    * wrapped in per-source template chrome (banner + copyright footer)
    * plus a cross-page quote on every 7th doc — the fixture whose strip
    * verdicts the oracles replay (the identical construction renders in
    * SQL inside [[graft.oracles.PipelineOracles.boilerIndexedOracle]]).
    */
  private[graft] def wrappedBoilerDocs(s: SparkSession,
      d: String): DataFrame = {
    val relined = expr(
      "concat_ws('\n', transform(" +
        "sequence(0, (size(split(text, ' ')) + 11) div 12 - 1), " +
        "i -> concat_ws(' ', slice(split(text, ' '), i * 12 + 1, 12))))")
    val quote = when(col("doc_id") % 7 === 0,
      lit("a quote cited by a few pages of every site\n")).otherwise(lit(""))
    Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        concat(lit("SUBSCRIBE to our newsletter\n"), quote, relined,
          lit("\n(c) 2026 "), col("source")).as("text"))
  }

  /** The spiked link-graph fixture shared by q_text_domain_rank and
    * q_text_authority_verdict: every 5th doc links a rotating site{0..6}
    * host and every 3rd a shared hub, giving the graph fan-in skew,
    * dangling targets, and multi-edge weights (the oracle renders the
    * identical spike in SQL).
    */
  private def domainRankFixture(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"),
      col("source"),
      concat(col("text"),
        when(pmod(col("doc_id"), lit(5L)) === 0,
          concat(lit(" https://site"),
            pmod(col("doc_id"), lit(7L)).cast("string"),
            lit(".example.com/p"))).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(3L)) === 0,
          lit(" https://hub.example.net/x")).otherwise(lit("")))
        .as("text"))

  private[graft] val queries: Seq[Q] = Seq(
    Q("q_text_stats",
      (s, d) => TextAnalysis.stats(Tables.documents(s, d)).orderBy("doc_id"),
      Some("SELECT doc_id, length(text) AS n_chars, " +
        s"len($toksSql) AS token_count, " +
        "len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS regex_token_count, " +
        s"len($toksSql) + CAST(COALESCE(list_sum(" +
        s"[CAST(floor(greatest(length(x) - 4, 0) / 4.0) AS BIGINT) FOR x IN $toksSql]), 0) " +
        "AS BIGINT) AS subword_count, " +
        "length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS punct_count, " +
        s"len(list_filter($toksSql, x -> x IN $stopSql)) AS stopword_count, " +
        s"$qualityScoreSql AS quality_score " +
        "FROM documents ORDER BY doc_id")),


    // PER-SOURCE PERCENTILE NORMALIZATION of the quality score — raw
    // scores are not comparable across sources, their within-source
    // percentile is ("keep every source's top 30%" becomes one filter).
    // percent_rank ties/single-row semantics are identical in both
    // engines; unscorable (NULL-text) rows drop.
    Q("q_text_score_norm",
      (s, d) => graft.functions.Sampling.percentileNormalize(
          Tables.documents(s, d).select(col("doc_id"), col("source"),
            TextAnalysis.qualityScore(col("text")).as("quality_score")),
          "quality_score", "source")
        .orderBy("doc_id"),
      Some("WITH s AS (SELECT doc_id, source, " +
        s"$qualityScoreSql AS quality_score FROM documents), " +
        "f AS (SELECT * FROM s WHERE quality_score IS NOT NULL) " +
        "SELECT doc_id, source, quality_score, " +
        "percent_rank() OVER (PARTITION BY source " +
        "ORDER BY quality_score ASC) AS pct_rank " +
        "FROM f ORDER BY doc_id")),


    // VOCABULARY GROWTH CURVE (Heaps-law audit): id-mix slices, each
    // term's first slice, new + cumulative vocabulary per slice — the
    // corpus-health check before a tokenizer trains. No global sort:
    // slice assignment is the mix permutation modulo 10.
    Q("q_text_vocab_growth",
      (s, d) => TextAnalysis.vocabularyGrowth(Tables.documents(s, d))
        .orderBy("bucket"),
      Some("WITH d AS (SELECT doc_id, " +
        s"$toksSql AS t, " +
        s"${graft.functions.Similarity.sampleHashSql("doc_id")} % 10 " +
        "AS bucket FROM documents WHERE text IS NOT NULL), " +
        "pb AS (SELECT bucket, count(*) AS n_docs, " +
        "sum(len(t)) AS n_tokens FROM d GROUP BY bucket), " +
        "tm AS (SELECT bucket, unnest(list_distinct(t)) AS term FROM d), " +
        "fs AS (SELECT term, min(bucket) AS bucket FROM tm GROUP BY term), " +
        "nt AS (SELECT bucket, count(*) AS new_terms FROM fs " +
        "GROUP BY bucket), " +
        "sp AS (SELECT unnest(range(0, 10)) AS bucket), " +
        "j AS (SELECT sp.bucket, COALESCE(n_docs, 0) AS n_docs, " +
        "COALESCE(n_tokens, 0) AS n_tokens, " +
        "COALESCE(new_terms, 0) AS new_terms FROM sp " +
        "LEFT JOIN pb USING (bucket) LEFT JOIN nt USING (bucket)) " +
        "SELECT CAST(bucket AS BIGINT) AS bucket, " +
        "CAST(n_docs AS BIGINT) AS n_docs, " +
        "CAST(n_tokens AS BIGINT) AS n_tokens, " +
        "CAST(new_terms AS BIGINT) AS new_terms, " +
        "CAST(sum(new_terms) OVER (ORDER BY bucket) AS BIGINT) " +
        "AS cum_terms FROM j ORDER BY bucket")),


    Q("q_text_langid",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__toks"))
        .select(col("doc_id"),
          TextAnalysis.langIdFromTokens(col("__toks")).as("lang_guess"))
        .orderBy("doc_id"),
      Some("WITH t AS (SELECT doc_id, " + toksSql + " AS toks FROM documents), " +
        "s AS (SELECT doc_id, " + langMarkerColsSql("toks") + " FROM t) " +
        s"SELECT doc_id, $langGuessCaseSql AS lang_guess " +
        "FROM s ORDER BY doc_id")),


    // Rolling-hash fingerprint: the oracle replays RollingHash.compute
    // exactly — left fold of (acc * 31 + codepoint) mod 2^58-27 over the
    // normalized text's code points (the 58-bit prime field is why this is
    // replayable in any 64-bit-integer engine; see RollingHash scaladoc).
    Q("q_text_fingerprint",
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fingerprint"))
        .orderBy("doc_id"),
      Some(s"$fpCte SELECT doc_id, fingerprint FROM fp ORDER BY doc_id")),


    // Keyword extraction: per-doc top-3 terms by exact frequency (integer
    // tf, no floating-point IDF ⇒ cross-engine deterministic).
    Q("q_text_top_terms",
      (s, d) => TextAnalysis.topTerms(Tables.documents(s, d), 3)
        .orderBy("doc_id", "rank"),
      Some("WITH posting AS (SELECT doc_id, unnest(" + toksSql + ") AS term " +
        "FROM documents), " +
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM posting " +
        s"WHERE term NOT IN $stopSql " +
        "AND term <> '' GROUP BY 1, 2), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY doc_id " +
        "ORDER BY tf DESC, term) AS rank FROM tf) " +
        "SELECT doc_id, term, tf, CAST(rank AS INT) AS rank FROM r " +
        "WHERE rank <= 3 ORDER BY doc_id, rank")),


    // Corpus vocabulary: per-term document frequency + total occurrences
    // (integer-only, the tokenizer-training / vocab-pruning statistic).
    Q("q_text_vocabulary",
      (s, d) => TextAnalysis.vocabulary(Tables.documents(s, d))
        .orderBy("term"),
      Some("WITH posting AS (SELECT doc_id, unnest(" + toksSql + ") AS term " +
        "FROM documents) " +
        "SELECT term, count(DISTINCT doc_id) AS doc_freq, " +
        "count(*) AS term_freq FROM posting WHERE term <> '' " +
        "GROUP BY term ORDER BY term")),


    // Unigram-LM tokenizer training statistics (Kudo 2018 — the OTHER
    // production tokenizer regime beside BPE): the weighted substring
    // seed-candidate relation the trainer prunes from — every substring
    // of length ≤ 4 of every word, weighted by exact corpus counts. The
    // EM + likelihood-loss pruning loop is UnigramSpec-pinned (worked
    // forward-backward fixture); this oracles the corpus-scale relation
    // it iterates on, exactly as q_text_bpe_pairs does for the BPE
    // trainer. Top-50 under a TOTAL order (freq desc, piece asc).
    Q("q_text_unigram_vocab",
      (s, d) => Unigram.seedCandidates(Tables.documents(s, d), maxPieceLen = 4)
        .orderBy(col("freq").desc, col("piece"))
        .limit(50),
      Some("WITH words AS (SELECT word, count(*) AS cnt FROM " +
        s"(SELECT unnest($toksSql) AS word FROM documents) " +
        "WHERE word <> '' GROUP BY word), " +
        "ex AS (SELECT unnest(flatten([[substring(word, i, l) " +
        "FOR l IN range(1, least(4, len(word) - i + 1) + 1)] " +
        "FOR i IN range(1, len(word) + 1)])) AS piece, cnt FROM words) " +
        "SELECT piece, CAST(sum(cnt) AS BIGINT) AS freq FROM ex " +
        "GROUP BY 1 ORDER BY freq DESC, piece LIMIT 50")),


    // Corpus-frequency quality score — the CCNet-perplexity stand-in:
    // per-doc mean corpus token frequency, exact integer until ONE final
    // division (no ln — libm would break the cross-engine hash).
    // Tokenizer-training statistics: the exact symbol-pair frequencies the
    // first BPE merge round's argmax reads (word histogram → adjacent char
    // pairs with the paper's </w> end marker, weighted by exact corpus
    // counts). The full greedy loop is BpeSpec-tested; this oracles the
    // corpus-scale relation it iterates on. Top-50 under a TOTAL order
    // (freq desc, l, r) so the cut is deterministic on both engines.
    Q("q_text_bpe_pairs",
      (s, d) => Bpe.pairFrequencies(Bpe.wordHistogram(Tables.documents(s, d)))
        .select(col("l"), col("r"), col("freq"))
        .orderBy(col("freq").desc, col("l"), col("r"))
        .limit(50),
      Some("WITH words AS (SELECT word, count(*) AS cnt FROM " +
        s"(SELECT unnest($toksSql) AS word FROM documents) " +
        "WHERE word <> '' GROUP BY word), " +
        "syms AS (SELECT list_append(string_split(word, ''), '</w>') AS s, " +
        "cnt FROM words), " +
        "ex AS (SELECT unnest([{'l': s[i], 'r': s[i+1]} " +
        "FOR i IN range(1, len(s))]) AS p, cnt FROM syms) " +
        "SELECT p.l AS l, p.r AS r, CAST(sum(cnt) AS BIGINT) AS freq " +
        "FROM ex GROUP BY 1, 2 ORDER BY freq DESC, l, r LIMIT 50")),


    // Tokenizer APPLY at corpus scale: the seed-trained merge table (32
    // merges, BpeSpec-pinned local == distributed trainer) rides into
    // BpeEncodeExpr as a codegen reference object — no join, no shuffle,
    // every document encodes inside its scan partition. Output is the
    // full subword sequence + count per doc; the oracle replays the greedy
    // fold with nested sep-bounded replace() (see bpeEncodeOracle).
    Q("q_text_bpe_encode",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          Bpe.encode(TextAnalysis.tokens(col("text")), bpeMerges).as("sub"))
        .select(col("doc_id"),
          size(col("sub")).cast("long").as("bpe_token_count"),
          concat_ws(" ", col("sub")).as("subwords"))
        .orderBy("doc_id"),
      Some(bpeEncodeOracle)),


    // Tokenizer ARTIFACT round-trip under the ORACLE gate — the
    // [[Bpe.saveMerges]] deployment shape (train once, ship KBs, every
    // downstream job loads the artifact) certified by hash equality with
    // q_text_bpe_encode: the merge table is written to a parquet
    // artifact, loaded back rank-sorted, and the LOADED merges drive the
    // same codegen encode. Rank order is the table's semantics, so any
    // write→read reordering or symbol corruption flips the greedy fold
    // and the hash. BpeSpec pins the round-trip structurally; this row
    // makes it a correctness-gate citizen like every other persisted
    // index family (_postings, _model, _words).
    Q("q_text_bpe_encode_indexed",
      (s, d) => {
        val dir = java.nio.file.Files
          .createTempDirectory("graft_bpe_idx").toString
        Bpe.saveMerges(s, bpeMerges, dir)
        // loadMerges materializes the KB-scale artifact into the codegen
        // reference object, so the temp dir can go before the (lazy)
        // encode runs
        val loaded =
          try Bpe.loadMerges(s, dir)
          finally {
            import java.nio.file.{Files, Path}
            import java.util.Comparator
            Files.walk(Path.of(dir)).sorted(Comparator.reverseOrder())
              .forEach(p => Files.deleteIfExists(p))
          }
        Tables.documents(s, d)
          .select(col("doc_id"),
            Bpe.encode(TextAnalysis.tokens(col("text")), loaded).as("sub"))
          .select(col("doc_id"),
            size(col("sub")).cast("long").as("bpe_token_count"),
            concat_ws(" ", col("sub")).as("subwords"))
          .orderBy("doc_id")
      },
      Some(bpeEncodeOracle)),


    // Tokenizer VOCABULARY-SIZE sweep — the compression curve a
    // tokenizer choice is priced on: the SAME rank-ordered merge table
    // truncated at checkpoints {0, 8, 16, 32} (prefix-truncation IS the
    // tokenizer at that checkpoint, because rank order is the artifact's
    // semantics), each arm re-encoding the corpus and reporting exact
    // token/char totals + chars-per-token. The 0-merge arm is the
    // character-level baseline every curve is read against.
    Q("q_text_bpe_compression_curve",
      (s, d) => {
        val arms = Seq(0, 8, 16, 32).map { k =>
          val t = TextAnalysis.tokens(col("text"))
          Tables.documents(s, d).filter(col("text").isNotNull)
            .select(Bpe.encode(t, bpeMerges.take(k)).as("sub"),
              length(array_join(filter(t, w => length(w) > 0), ""))
                .cast("long").as("__wc"))
            .agg(sum(size(col("sub"))).cast("long").as("total_tokens"),
              sum(col("__wc")).as("total_chars"))
            .select(lit(k.toLong).as("n_merges"), col("total_tokens"),
              col("total_chars"),
              (col("total_chars").cast("double") /
                col("total_tokens").cast("double")).as("chars_per_token"))
        }
        arms.reduce(_ unionByName _).orderBy("n_merges")
      },
      Some(bpeCompressionOracle)),


    // WORDPIECE apply — the THIRD tokenizer regime (BERT's): greedy
    // longest-match-first over a likelihood-ratio-trained vocabulary,
    // ## continuation pieces, hard [UNK] for untileable words — so
    // n_unk is a first-class OOV-rate signal beside the token count.
    // Native expression (vocab as a codegen reference object); the
    // oracle replays the greedy walk as a recursive CTE with scalar
    // transitions over the SAME rendered vocabulary, one chain per
    // distinct word.
    Q("q_text_wordpiece",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          graft.functions.WordPiece.encode(
            TextAnalysis.tokens(col("text")), wpVocab).as("sub"))
        .select(col("doc_id"),
          size(col("sub")).cast("long").as("wp_token_count"),
          size(filter(col("sub"),
            t => t === graft.functions.WordPiece.Unk)).cast("long")
            .as("n_unk"),
          concat_ws(" ", col("sub")).as("subwords"))
        .orderBy("doc_id"),
      Some(wpEncodeOracle)),


    // BYTE-LEVEL tokenizer apply — the zero-OOV production regime
    // (GPT-2's bytes_to_unicode): words pre-map to the closed 256-symbol
    // byte alphabet, so NO input can ever fall outside the vocabulary,
    // and the identical merge-fold machinery runs over byte symbols. The
    // oracle derives each word's byte symbols from hex(encode(word))
    // through the engine-rendered byte->symbol map, then replays the
    // same sep-bounded replace() fold (bpeBytesEncodeOracle).
    Q("q_text_bpe_encode_bytes",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          Bpe.encode(TextAnalysis.tokens(col("text")), bpeBytesMerges,
            byteLevel = true).as("sub"))
        .select(col("doc_id"),
          size(col("sub")).cast("long").as("bpe_token_count"),
          concat_ws(" ", col("sub")).as("subwords"))
        .orderBy("doc_id"),
      Some(bpeBytesEncodeOracle)),


    // Classifier-TRAINING feature relation: per-term positive/negative
    // document frequencies + add-one odds under a deterministic label
    // (even-numbered sources = positive — the provenance-classifier
    // regime: learn to recognize a register). The full-batch GD trainer
    // itself is PipelineSpec-pinned (hand-worked gradient step, two-run
    // determinism, register separation end-to-end through the certified
    // inference paths); this oracles the corpus-scale relation it
    // selects features from — the q_text_bpe_pairs discipline.
    Q("q_text_classifier_logodds",
      (s, d) => TextAnalysis.termLogOdds(Tables.documents(s, d),
          expr("CAST(substring(source, 4) AS INT) % 2 = 0"))
        .orderBy("term"),
      Some("WITH lab AS (SELECT doc_id, " +
        "CAST(substring(source, 4) AS INT) % 2 = 0 AS y, text " +
        "FROM documents), " +
        "posting AS (SELECT doc_id, y, unnest(" + toksSql + ") AS term " +
        "FROM lab), " +
        "agg AS (SELECT term, " +
        "count(DISTINCT CASE WHEN y THEN doc_id END) AS pos_docs, " +
        "count(DISTINCT CASE WHEN NOT y THEN doc_id END) AS neg_docs " +
        "FROM posting WHERE term <> '' GROUP BY term) " +
        "SELECT term, CAST(pos_docs AS BIGINT) AS pos_docs, " +
        "CAST(neg_docs AS BIGINT) AS neg_docs, " +
        "CAST(pos_docs + 1 AS DOUBLE) / CAST(neg_docs + 1 AS DOUBLE) " +
        "AS odds FROM agg ORDER BY term")),


    // Unigram-tokenizer APPLY at corpus scale: each document's Viterbi
    // (max-probability) segmentation log-probability under the fixed
    // seed-trained vocabulary (UnigramSpec pins the trainer; this gates
    // the apply). The native UnigramScoreExpr scores every document
    // inside its scan partition — no join, no shuffle, vocabulary as a
    // codegen reference object — and the SCORE is the gated number
    // because the max is tie-independent, so the DuckDB oracle can
    // replay the identical DP (list_reduce over positions, candidate
    // arms unrolled per piece length, same IEEE doubles from the same
    // Scala training run) and hash-match to the bit.
    Q("q_text_unigram_score",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_words"),
          Unigram.scoreTokens(TextAnalysis.tokens(col("text")), unigramVocab)
            .as("unigram_logprob"))
        .orderBy("doc_id"),
      Some("WITH v AS (SELECT " + unigramMapSql + " AS m), " +
        s"tk AS (SELECT doc_id, $toksSql AS t FROM documents), " +
        "tok AS (SELECT doc_id, u.pos AS pos, u.w AS w FROM " +
        "(SELECT doc_id, unnest([{'pos': i, 'w': t[i]} " +
        "FOR i IN range(1, len(t) + 1)]) AS u FROM tk) q0), " +
        "ws AS (SELECT doc_id, pos, list_reduce(" +
        "list_prepend([CAST(0.0 AS DOUBLE)], " +
        "[[CAST(j AS DOUBLE)] FOR j IN range(1, len(w) + 1)]), " +
        "(acc, x) -> list_append(acc, greatest(" +
        "acc[CAST(x[1] AS INT)] + coalesce(" +
        "m[substring(w, CAST(x[1] AS INT), 1)][1], " +
        "CAST(-1000000000.0 AS DOUBLE)), " +
        "CASE WHEN x[1] >= 2 THEN acc[CAST(x[1] AS INT) - 1] + " +
        "m[substring(w, CAST(x[1] AS INT) - 1, 2)][1] END, " +
        "CASE WHEN x[1] >= 3 THEN acc[CAST(x[1] AS INT) - 2] + " +
        "m[substring(w, CAST(x[1] AS INT) - 2, 3)][1] END, " +
        "CASE WHEN x[1] >= 4 THEN acc[CAST(x[1] AS INT) - 3] + " +
        "m[substring(w, CAST(x[1] AS INT) - 3, 4)][1] END))" +
        ")[len(w) + 1] AS s FROM tok, v), " +
        "doc AS (SELECT doc_id, list_reduce(" +
        "list_prepend(CAST(0.0 AS DOUBLE), list(s ORDER BY pos)), " +
        "(a, x) -> a + x) AS unigram_logprob FROM ws GROUP BY doc_id) " +
        // LEFT JOIN, not inner: a NULL-text document has no tok rows (so
        // no doc row) but the Spark side still emits it with NULL
        // n_words/score — the bpeEncodeOracle discipline (ADVICE r13)
        "SELECT tk.doc_id, CAST(len(tk.t) AS BIGINT) AS n_words, " +
        "doc.unigram_logprob FROM tk LEFT JOIN doc USING (doc_id) " +
        "ORDER BY doc_id")),


    // TOKENIZER FERTILITY per detected language — the tokenizer-fairness
    // audit (a tokenizer trained on one language's register fragments the
    // others into more subwords, inflating their effective cost): per
    // lang_guess, BPE tokens / whitespace tokens and chars / BPE token.
    // Composes three certified signals (lang-id, whitespace count, BPE
    // encode) in one scan + one |langs|-row aggregate; the oracle
    // re-renders each from its gated fragment.
    Q("q_text_fertility",
      (s, d) => Tables.documents(s, d)
        .select(
          TextAnalysis.langId(col("text")).as("lang_guess"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("__ws"),
          size(Bpe.encode(TextAnalysis.tokens(col("text")), bpeMerges))
            .cast("long").as("__bpe"),
          length(col("text")).cast("long").as("__chars"))
        .groupBy("lang_guess")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("__ws")).as("ws_tokens"),
          sum(col("__bpe")).as("bpe_tokens"),
          sum(col("__chars")).as("n_chars"))
        .withColumn("fertility",
          when(col("ws_tokens") > 0,
            col("bpe_tokens").cast("double") / col("ws_tokens").cast("double")))
        .withColumn("chars_per_token",
          when(col("bpe_tokens") > 0,
            col("n_chars").cast("double") / col("bpe_tokens").cast("double")))
        .orderBy("lang_guess"),
      Some(s"WITH tk AS (SELECT doc_id, unnest($toksSql) AS word " +
        "FROM documents), " +
        "seg AS (SELECT doc_id, CAST(len(string_split(trim(" +
        bpeFoldedSql + ", chr(31)), chr(31))) AS BIGINT) AS ns " +
        "FROM tk WHERE word <> ''), " +
        "bp AS (SELECT doc_id, CAST(sum(ns) AS BIGINT) AS bpe FROM seg " +
        "GROUP BY doc_id), " +
        s"sig AS (SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS ws, " +
        "CAST(length(text) AS BIGINT) AS chars, " +
        langMarkerColsSql(toksSql) + " FROM documents), " +
        s"lg AS (SELECT doc_id, ws, chars, $langGuessCaseSql AS lang_guess " +
        "FROM sig), " +
        "j AS (SELECT lg.lang_guess, lg.ws, lg.chars, " +
        "COALESCE(bp.bpe, 0) AS bpe FROM lg " +
        "LEFT JOIN bp USING (doc_id)), " +
        "g AS (SELECT lang_guess, count(*) AS n_docs, " +
        "CAST(sum(ws) AS BIGINT) AS ws_tokens, " +
        "CAST(sum(bpe) AS BIGINT) AS bpe_tokens, " +
        "CAST(sum(chars) AS BIGINT) AS n_chars FROM j GROUP BY lang_guess) " +
        "SELECT lang_guess, n_docs, ws_tokens, bpe_tokens, n_chars, " +
        "CASE WHEN ws_tokens > 0 THEN " +
        "CAST(bpe_tokens AS DOUBLE) / CAST(ws_tokens AS DOUBLE) END " +
        "AS fertility, " +
        "CASE WHEN bpe_tokens > 0 THEN " +
        "CAST(n_chars AS DOUBLE) / CAST(bpe_tokens AS DOUBLE) END " +
        "AS chars_per_token FROM g ORDER BY lang_guess")),


    Q("q_text_unigram_quality",
      (s, d) => TextAnalysis.unigramScore(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some("WITH tk AS (SELECT doc_id, unnest(" + toksSql + ") AS term " +
        "FROM documents), " +
        "v AS (SELECT term, count(*) AS cnt FROM tk GROUP BY 1), " +
        "tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM v), " +
        "sc AS (SELECT tk.doc_id, CAST(sum(v.cnt) AS BIGINT) AS s, " +
        "count(*) AS n FROM tk JOIN v USING (term) GROUP BY 1) " +
        "SELECT d.doc_id, CAST(COALESCE(sc.n, 0) AS BIGINT) AS token_count, " +
        // factors widen to DOUBLE before the multiply, mirroring the Scala
        // side (n*total would overflow int64 at corpus scale)
        "CAST(sc.s AS DOUBLE) / (CAST(sc.n AS DOUBLE) * " +
        "CAST(tot.total AS DOUBLE)) AS unigram_score " +
        "FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id " +
        "CROSS JOIN tot ORDER BY d.doc_id")),


    // CLASSIFIER-based quality filter (the fastText / FineWeb-Edu shape):
    // a broadcast integer micro-unit weight table, exact integer
    // Σ tf·w + bias per document, ONE final division for the surfaced
    // mean-per-token score, and a pure-integer threshold verdict. The
    // oracle renders the weight table as a VALUES CTE and replays the
    // postings join + integer arithmetic.
    Q("q_text_classifier_quality",
      (s, d) => TextAnalysis.classifierScore(Tables.documents(s, d),
          classifierWeights, bias = classifierBias,
          thresholdMicros = classifierThreshold)
        .orderBy("doc_id"),
      Some(classifierOracle)),


    // The SAME linear model as a pure projection (map-literal weights,
    // scan-side integer fold — the shape the streaming gate runs in
    // append mode). Shares q_text_classifier_quality's oracle: hash
    // equality certifies the join and projection access paths agree.
    Q("q_text_classifier_inline",
      (s, d) => TextAnalysis.classifierScoreInline(Tables.documents(s, d),
          classifierWeights, bias = classifierBias,
          thresholdMicros = classifierThreshold)
        .orderBy("doc_id"),
      Some(classifierOracle)),


    // Bigram-LM quality score (order-2 CCNet-style filter): mean smoothed
    // conditional probability of each bigram position under the corpus
    // model — rational arithmetic end-to-end (one IEEE division per
    // position, sorted-fold per-doc sum), so the oracle replays it to the
    // bit with no libm transcendentals (the unigramScore / rational-idf
    // BM25 discipline).
    Q("q_text_bigram_lm",
      (s, d) => TextAnalysis.bigramScore(Tables.documents(s, d), addK = 1.0)
        .orderBy("doc_id"),
      Some(bigramLmOracle)),


    // The persisted-LM access path under the same hash gate: train the
    // model tables, score the corpus FROM the stored tables, compare
    // against the identical from-scratch oracle — write→read fidelity for
    // the LM artifact, the q_text_bm25_indexed pattern.
    Q("q_text_bigram_indexed",
      (s, d) => {
        val name = "graft_lm_idx_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        TextAnalysis.writeLmTable(Tables.documents(s, d), name)
        try TextAnalysis.bigramScoreIndexed(s, name, Tables.documents(s, d))
          .orderBy("doc_id").localCheckpoint(true)
        finally TextAnalysis.dropLmTable(s, name)
      },
      Some(bigramLmOracle)),


    // UNLEARN training documents from the bigram LM — deletion where the
    // removed text shaped MODEL COUNTS, not just an index row: the model
    // trains on the corpus PLUS mutated clones (ids +4,000,000, each
    // appending a clone-unique token), which doubles every bigram count,
    // shifts every context total, AND grows the vocabulary V that the
    // add-k smoothing divides by. Unlearning the clones must restore all
    // four tables exactly — counts are integers, so scoring the original
    // corpus afterward must hash-match the never-trained-on-clones
    // oracle (q_text_bigram_indexed's), which it can only do if model,
    // ctx, vocab AND V all reverted to the bit.
    Q("q_text_bigram_deleted",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val clones = docs.filter(col("text").isNotNull)
          .select((col("doc_id") + 4000000L).as("doc_id"),
            concat(col("text"), lit(" uniqclonetok"),
              col("doc_id").cast("string")).as("text"))
        val name = "graft_lm_del_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        TextAnalysis.writeLmTable(
          docs.select("doc_id", "text").unionByName(clones), name)
        try {
          TextAnalysis.deleteFromLmTable(s, name, clones)
          TextAnalysis.bigramScoreIndexed(s, name, docs)
            .orderBy("doc_id").localCheckpoint(true)
        } finally TextAnalysis.dropLmTable(s, name)
      },
      Some(bigramLmOracle)),


    // Stupid-backoff trigram score (Brants et al. 2007): the model trains
    // on the EVEN half of the corpus and scores everything, so all three
    // arms (trigram head, α-bigram backoff, α²-unigram backoff) fire and
    // are replayed; α constants render from Scala into both engines.
    Q("q_text_trigram_backoff",
      (s, d) => {
        val docs = Tables.documents(s, d)
        TextAnalysis.trigramBackoffScore(docs,
            docs.filter(col("doc_id") % 2 === 0), alpha = 0.4)
          .orderBy("doc_id")
      },
      Some {
        val a = 0.4
        "WITH tk AS (SELECT doc_id, " + toksSql + " AS t FROM documents " +
          "WHERE text IS NOT NULL), " +
          "ttk AS (SELECT doc_id, " + toksSql + " AS t FROM documents " +
          "WHERE text IS NOT NULL AND doc_id % 2 = 0), " +
          "x3 AS (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i " +
          "FROM tk WHERE len(t) >= 3), " +
          "tg AS (SELECT doc_id, CAST(i AS BIGINT) AS pos, t[i] AS w1, " +
          "t[i+1] AS w2, t[i+2] AS w3 FROM x3), " +
          "tx3 AS (SELECT t, unnest(range(1, len(t) - 1)) AS i FROM ttk " +
          "WHERE len(t) >= 3), " +
          "tri AS (SELECT t[i] AS w1, t[i+1] AS w2, t[i+2] AS w3, " +
          "count(*) AS c123 FROM tx3 GROUP BY 1, 2, 3), " +
          "tx2 AS (SELECT t, unnest(range(1, len(t))) AS i FROM ttk " +
          "WHERE len(t) >= 2), " +
          "bi AS (SELECT t[i] AS w1, t[i+1] AS w2, count(*) AS c12 " +
          "FROM tx2 GROUP BY 1, 2), " +
          "uni AS (SELECT w, count(*) AS c FROM " +
          "(SELECT unnest(t) AS w FROM ttk) GROUP BY 1), " +
          "nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni), " +
          "sc AS (SELECT tg.doc_id, count(*) AS k, " +
          "list_reduce(list_prepend(CAST(0 AS DOUBLE), list(" +
          "CASE WHEN COALESCE(tri.c123, 0) > 0 THEN " +
          "CAST(tri.c123 AS DOUBLE) / CAST(b12.c12 AS DOUBLE) " +
          s"WHEN COALESCE(b23.c12, 0) > 0 THEN $a * " +
          "(CAST(b23.c12 AS DOUBLE) / CAST(u2.c AS DOUBLE)) " +
          s"ELSE ${a * a} * (CAST(COALESCE(u3.c, 0) AS DOUBLE) / " +
          "CAST(nn.n AS DOUBLE)) END ORDER BY tg.pos)), " +
          "(acc, x) -> acc + x) AS s " +
          "FROM tg LEFT JOIN tri ON tri.w1 = tg.w1 AND tri.w2 = tg.w2 " +
          "AND tri.w3 = tg.w3 " +
          "LEFT JOIN bi b12 ON b12.w1 = tg.w1 AND b12.w2 = tg.w2 " +
          "LEFT JOIN bi b23 ON b23.w1 = tg.w2 AND b23.w2 = tg.w3 " +
          "LEFT JOIN uni u2 ON u2.w = tg.w2 " +
          "LEFT JOIN uni u3 ON u3.w = tg.w3 " +
          "CROSS JOIN nn GROUP BY 1) " +
          "SELECT d.doc_id, CAST(COALESCE(sc.k, 0) AS BIGINT) AS n_trigrams, " +
          "sc.s / CAST(sc.k AS DOUBLE) AS backoff_score " +
          "FROM documents d LEFT JOIN sc USING (doc_id) ORDER BY d.doc_id"
      }),


    // Composite C4/Gopher filter verdict at default thresholds: keep +
    // ordered reason string per document, every arm replayed in SQL.
    // 372/500 synthetic docs trip at least one check (lang_mismatch
    // dominates — the corpus is English word-soup under non-en labels), so
    // both keep values and multi-reason rows are exercised.
    Q("q_text_filter_verdict",
      (s, d) => TextAnalysis.filterVerdict(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some(filterVerdictOracle)),


    // FILTER-STACK ABLATION: per rejection reason, total firings and
    // UNIQUE rejections (docs the stack would re-admit without that one
    // arm) — redundant arms show up as high-n_rejected/zero-n_unique.
    // The oracle replays the verdict chain and the explode/aggregate.
    Q("q_text_filter_ablation",
      (s, d) => TextAnalysis.filterAblation(
        TextAnalysis.filterVerdict(Tables.documents(s, d)))
        .orderBy("reason"),
      Some(s"WITH $verdictCtes, " +
        "rej AS (SELECT doc_id, string_split(reasons, ',') AS rs FROM v " +
        "WHERE reasons <> ''), " +
        "ab AS (SELECT doc_id, unnest(rs) AS reason, len(rs) = 1 AS solo " +
        "FROM rej) " +
        "SELECT reason, CAST(count(*) AS BIGINT) AS n_rejected, " +
        "CAST(count(*) FILTER (solo) AS BIGINT) AS n_unique " +
        "FROM ab GROUP BY 1 ORDER BY reason")),


    // BM25 ranked retrieval (rational-idf variant — see bm25Search scaladoc)
    // over a mixed-rarity query: 'dup' has df≈25 vs ≈385 for the common
    // terms, so idf weighting visibly reorders the hits. The oracle replays
    // the full pipeline with the SAME Scala-rendered double constants and a
    // term-ordered list_reduce fold.
    Q("q_text_bm25",
      (s, d) => TextAnalysis.bm25Search(Tables.documents(s, d),
        Bm25Terms, k = 15).orderBy("rank"),
      Some(bm25Oracle(Bm25Terms, k = 15, k1 = 1.2, b = 0.75))),


    // The INDEXED access path under the same hash gate: build the bucketed
    // postings index, answer from it, compare against the identical
    // full-scan oracle — write→read fidelity for the index, exactly the
    // q_store_roundtrip pattern (the stored bytes must produce the answer).
    // A UNIQUE table name per invocation (concurrent bench/verify processes
    // share the default warehouse — a fixed name would let one process
    // delete the index another is mid-read of), materialized eagerly so the
    // tables can be dropped before the frame is consumed — no warehouse
    // litter survives the query.
    Q("q_text_bm25_indexed",
      (s, d) => {
        val name = "graft_bm25_idx_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        TextAnalysis.writeSearchIndex(Tables.documents(s, d), name)
        // finally: a UUID name no later run can target must never leak on
        // a failed/interrupted query
        try TextAnalysis.bm25SearchIndexed(s, name, Bm25Terms, k = 15)
          .orderBy("rank").localCheckpoint(true)
        finally TextAnalysis.dropSearchIndex(s, name)
      },
      Some(bm25Oracle(Bm25Terms, k = 15, k1 = 1.2, b = 0.75))),


    // TARGETED DELETION from the BM25 index — the canonical takedown
    // surface, and the hardest stats case: the index is built over the
    // corpus PLUS a full clone (ids +3,000,000), which doubles n_docs,
    // every query term's df, and every matching doc's competition (each
    // clone ties its original's score). Deleting the clones must restore
    // the EXACT original ranking — which only happens if the tombstones
    // correct n_docs, avgdl, and df, not just drop postings rows. Same
    // oracle as q_text_bm25_indexed.
    Q("q_text_bm25_deleted",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val clones = docs.select((col("doc_id") + 3000000L).as("doc_id"),
          col("text"))
        val name = "graft_bm25_del_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        TextAnalysis.writeSearchIndex(
          docs.select("doc_id", "text").unionByName(clones), name)
        val cloneIds = docs.select("doc_id").collect()
          .map(_.getLong(0) + 3000000L).toSeq
        try {
          TextAnalysis.deleteFromSearchIndex(s, name, cloneIds)
          TextAnalysis.bm25SearchIndexed(s, name, Bm25Terms, k = 15)
            .orderBy("rank").localCheckpoint(true)
        } finally TextAnalysis.dropSearchIndex(s, name)
      },
      Some(bm25Oracle(Bm25Terms, k = 15, k1 = 1.2, b = 0.75))),


    // Token-length histogram: corpus length distribution in buckets of 10
    // tokens (the diagnostic behind truncation/packing decisions).
    Q("q_text_length_hist",
      (s, d) => Tables.documents(s, d)
        .select((size(TextAnalysis.tokens(col("text"))) / 10).cast("long")
          .as("bucket_10toks"))
        .groupBy("bucket_10toks").agg(count(lit(1)).as("n_docs"))
        .orderBy("bucket_10toks"),
      Some("SELECT CAST(floor(len(" + toksSql + ") / 10.0) AS BIGINT) " +
        "AS bucket_10toks, count(*) AS n_docs FROM documents " +
        "GROUP BY 1 ORDER BY 1")),


    // Duplicate-passage SCRUB — the removal half of Lee et al.: the spans
    // q_dedup_passages detects are EXCISED from each pair's doc_b side
    // (keep-first: the lower-id copy survives) and the cleaned corpus ships
    // as space-joined kept token slices. The oracle replays the whole
    // chain: the gated runs relation, the per-doc removed-chunk index set,
    // and the list-comprehension slice reconstruction.
    // CORPUS-WIDE LINE dedup (C4's cleaning stage / the RefinedWeb line
    // rule): a line occurring ≥2 times across the corpus keeps only its
    // first (doc_id, idx) occurrence; documents rebuild from surviving
    // lines. The corpus has no newlines, so the fixture re-lines each
    // document into 12-token lines first (deterministic, replayed
    // verbatim) — the duplicate-span families then collide as exact
    // repeated lines (96 at sf0.01, measured).
    // C4 PAGE CLEANING (Raffel et al. 2020 §2.2): the published line
    // rules (terminal punctuation, ≥3 words, no "javascript") and page
    // rules (≥5 sentences after cleaning, no "lorem ipsum", no curly
    // brace). Same 12-token relining as q_text_line_dedup, except each
    // line takes a deterministic terminal-punctuation cycle (i%3 →
    // '.', '?', none — the raw corpus has NO punctuation, so without it
    // the terminal rule would drop every line and gate nothing); the
    // trigger strings are likewise absent, so the fixture injects them
    // (every 5th doc a javascript line, every 11th a lorem-ipsum tail
    // line, every 7th a braced code line) — each rule fires AND each
    // rule's survivors exist. The oracle replays the relining, the
    // punctuation cycle, the injections, the line filter, and the
    // sentence count verbatim.
    Q("q_text_c4_clean",
      (s, d) => {
        val relined = Tables.documents(s, d).select(col("doc_id"), expr(
          "concat_ws('\n', transform(" +
            "sequence(0, (size(split(text, ' ')) + 11) div 12 - 1), " +
            "i -> concat(concat_ws(' ', slice(split(text, ' '), " +
            "i * 12 + 1, 12)), CASE WHEN i % 3 = 0 THEN '.' " +
            "WHEN i % 3 = 1 THEN '?' ELSE '' END)))")
          .as("text"))
        val wrapped = relined.select(col("doc_id"), concat(
          when(col("doc_id") % 5 === 0,
            lit("powered by JavaScript analytics here.\n")).otherwise(lit("")),
          col("text"),
          when(col("doc_id") % 11 === 0,
            lit("\nLorem Ipsum dolor sit amet placeholder.")).otherwise(lit("")),
          when(col("doc_id") % 7 === 0,
            lit("\nfunction f() { return 1; }")).otherwise(lit("")))
          .as("text"))
        TextAnalysis.c4Clean(wrapped).orderBy("doc_id")
      },
      Some("WITH t AS (SELECT doc_id, string_split(text, ' ') AS sp " +
        "FROM documents), " +
        "d2 AS (SELECT doc_id, array_to_string(" +
        "[array_to_string(sp[i*12+1 : least((i+1)*12, len(sp))], ' ') || " +
        "(CASE WHEN i % 3 = 0 THEN '.' WHEN i % 3 = 1 THEN '?' " +
        "ELSE '' END) " +
        "FOR i IN range(0, (len(sp) + 11) // 12)], chr(10)) AS text FROM t), " +
        "w AS (SELECT doc_id, " +
        "(CASE WHEN doc_id % 5 = 0 THEN 'powered by JavaScript analytics " +
        "here.' || chr(10) ELSE '' END) || text || " +
        "(CASE WHEN doc_id % 11 = 0 THEN chr(10) || 'Lorem Ipsum dolor sit " +
        "amet placeholder.' ELSE '' END) || " +
        "(CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'function f() { return " +
        "1; }' ELSE '' END) AS text FROM d2), " +
        "c AS (SELECT doc_id, text, [l FOR l IN string_split(text, chr(10)) " +
        "IF regexp_matches(rtrim(l), '[.!?\"]$') " +
        "AND len(string_split_regex(trim(l), '\\s+')) >= 3 " +
        "AND NOT contains(lower(l), 'javascript')] AS kl FROM w), " +
        "k AS (SELECT doc_id, " +
        "CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines, " +
        "CAST(len(kl) AS BIGINT) AS n_kept, " +
        "COALESCE(array_to_string(kl, chr(10)), '') AS ctext, " +
        "text AS orig FROM c) " +
        "SELECT doc_id, n_lines, n_kept, " +
        "CAST(len(regexp_extract_all(ctext, '[.!?]')) AS BIGINT) " +
        "AS n_sentences, " +
        "(len(regexp_extract_all(ctext, '[.!?]')) >= 5 " +
        "AND NOT contains(lower(orig), 'lorem ipsum') " +
        "AND NOT contains(orig, '{')) AS page_keep, " +
        "ctext AS text FROM k ORDER BY doc_id")),

    // The COMPLETE C4 pipeline (Raffel et al. §2.2, all four rule families
    // in one operator): the q_text_c4_clean fixture plus two injections —
    // every 13th doc a fixed THREE-line promo block (survives the line
    // filter; span dedup keeps only its first ELIGIBLE occurrence — doc 0
    // is %5/%7/%11/%13/%17 all at once, blocked AND page-dropped, so its
    // copy must NOT claim first occurrence: doc 13 keeps, 26/39/... lose
    // theirs), and every 17th doc a bad-words line ("buy cheap pills") —
    // the page-level blocklist drop. The oracle replays cleaning, the
    // blocklist contains(), the 3-line-span rolling-hash fingerprints
    // (lead×2 + the q_dedup_chunks fold), first-occurrence ranking, line
    // removal, and the rebuild verbatim.
    Q("q_text_c4_full",
      (s, d) => {
        val relined = Tables.documents(s, d).select(col("doc_id"), expr(
          "concat_ws('\n', transform(" +
            "sequence(0, (size(split(text, ' ')) + 11) div 12 - 1), " +
            "i -> concat(concat_ws(' ', slice(split(text, ' '), " +
            "i * 12 + 1, 12)), CASE WHEN i % 3 = 0 THEN '.' " +
            "WHEN i % 3 = 1 THEN '?' ELSE '' END)))")
          .as("text"))
        val wrapped = relined.select(col("doc_id"), concat(
          when(col("doc_id") % 5 === 0,
            lit("powered by JavaScript analytics here.\n")).otherwise(lit("")),
          col("text"),
          when(col("doc_id") % 11 === 0,
            lit("\nLorem Ipsum dolor sit amet placeholder.")).otherwise(lit("")),
          when(col("doc_id") % 7 === 0,
            lit("\nfunction f() { return 1; }")).otherwise(lit("")),
          when(col("doc_id") % 13 === 0,
            lit("\nshared promo span line one today.\nshared promo span " +
              "line two today.\nshared promo span line three today."))
            .otherwise(lit("")),
          when(col("doc_id") % 17 === 0,
            lit("\nplease buy cheap pills today friend.")).otherwise(lit("")))
          .as("text"))
        TextAnalysis.c4Full(wrapped, Seq("buy cheap pills")).orderBy("doc_id")
      },
      Some("WITH t AS (SELECT doc_id, string_split(text, ' ') AS sp " +
        "FROM documents), " +
        "d2 AS (SELECT doc_id, array_to_string(" +
        "[array_to_string(sp[i*12+1 : least((i+1)*12, len(sp))], ' ') || " +
        "(CASE WHEN i % 3 = 0 THEN '.' WHEN i % 3 = 1 THEN '?' " +
        "ELSE '' END) " +
        "FOR i IN range(0, (len(sp) + 11) // 12)], chr(10)) AS text FROM t), " +
        "w AS (SELECT doc_id, " +
        "(CASE WHEN doc_id % 5 = 0 THEN 'powered by JavaScript analytics " +
        "here.' || chr(10) ELSE '' END) || text || " +
        "(CASE WHEN doc_id % 11 = 0 THEN chr(10) || 'Lorem Ipsum dolor sit " +
        "amet placeholder.' ELSE '' END) || " +
        "(CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'function f() { return " +
        "1; }' ELSE '' END) || " +
        "(CASE WHEN doc_id % 13 = 0 THEN chr(10) || 'shared promo span " +
        "line one today.' || chr(10) || 'shared promo span line two " +
        "today.' || chr(10) || 'shared promo span line three today.' " +
        "ELSE '' END) || " +
        "(CASE WHEN doc_id % 17 = 0 THEN chr(10) || 'please buy cheap " +
        "pills today friend.' ELSE '' END) AS text FROM d2), " +
        "c AS (SELECT doc_id, text, [l FOR l IN string_split(text, chr(10)) " +
        "IF regexp_matches(rtrim(l), '[.!?\"]$') " +
        "AND len(string_split_regex(trim(l), '\\s+')) >= 3 " +
        "AND NOT contains(lower(l), 'javascript')] AS kl FROM w), " +
        "pg AS (SELECT doc_id, " +
        "COALESCE(array_to_string(kl, chr(10)), '') AS ctext, " +
        "(len(regexp_extract_all(array_to_string(kl, chr(10)), '[.!?]')) " +
        ">= 5 AND NOT contains(lower(text), 'lorem ipsum') " +
        "AND NOT contains(text, '{')) AS page_keep, " +
        "contains(array_to_string(kl, chr(10)), 'buy cheap pills') " +
        "AS blocked FROM c), " +
        "el AS (SELECT doc_id, string_split(ctext, chr(10)) AS sp2 " +
        "FROM pg WHERE page_keep AND NOT blocked), " +
        "lx AS (SELECT doc_id, u.idx AS idx, u.line AS line FROM " +
        "(SELECT doc_id, unnest([{'idx': i - 1, 'line': sp2[i]} " +
        "FOR i IN range(1, len(sp2) + 1)]) AS u FROM el) q0), " +
        "s3 AS (SELECT doc_id, idx, line, " +
        "lead(line, 1) OVER (PARTITION BY doc_id ORDER BY idx) AS l1, " +
        "lead(line, 2) OVER (PARTITION BY doc_id ORDER BY idx) AS l2 " +
        "FROM lx), " +
        "fp AS (SELECT doc_id, idx, " +
        "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "[CAST(unicode(ch) AS BIGINT) FOR ch IN regexp_extract_all(" +
        "lower(regexp_replace(trim(" +
        "line || chr(10) || l1 || chr(10) || l2" +
        "), '\\s+', ' ', 'g')), '.')]), " +
        s"(acc, x) -> (acc * 31 + x) % ${graft.functions.RollingHash.Modulus}) " +
        "AS f FROM s3 WHERE l2 IS NOT NULL), " +
        "dup AS (SELECT doc_id, idx FROM (SELECT doc_id, idx, " +
        "row_number() OVER (PARTITION BY f ORDER BY doc_id, idx) AS rn " +
        "FROM fp) q1 WHERE rn > 1), " +
        "nd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_span_dups " +
        "FROM dup GROUP BY 1), " +
        "rm AS (SELECT DISTINCT doc_id, ridx AS idx FROM " +
        "(SELECT doc_id, unnest(range(idx, idx + 3)) AS ridx FROM dup) q2), " +
        "kept AS (SELECT lx.doc_id, lx.idx, lx.line FROM lx " +
        "LEFT JOIN rm ON lx.doc_id = rm.doc_id AND lx.idx = rm.idx " +
        "WHERE rm.doc_id IS NULL), " +
        "rb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_left, " +
        "string_agg(line, chr(10) ORDER BY idx) AS dtext " +
        "FROM kept GROUP BY 1) " +
        "SELECT pg.doc_id, pg.page_keep, pg.blocked, " +
        "(pg.page_keep AND NOT pg.blocked) AS keep, " +
        "CAST(CASE WHEN pg.page_keep AND NOT pg.blocked " +
        "THEN COALESCE(nd.n_span_dups, 0) ELSE 0 END AS BIGINT) " +
        "AS n_span_dups, " +
        "CAST(CASE WHEN pg.page_keep AND NOT pg.blocked " +
        "THEN len(string_split(pg.ctext, chr(10))) - " +
        "COALESCE(rb.n_left, 0) ELSE 0 END AS BIGINT) AS n_lines_removed, " +
        "CASE WHEN pg.page_keep AND NOT pg.blocked " +
        "THEN COALESCE(rb.dtext, '') ELSE pg.ctext END AS text " +
        "FROM pg LEFT JOIN nd USING (doc_id) LEFT JOIN rb USING (doc_id) " +
        "ORDER BY pg.doc_id")),

    Q("q_text_line_dedup",
      (s, d) => {
        val relined = Tables.documents(s, d).select(col("doc_id"), expr(
          "concat_ws('\n', transform(" +
            "sequence(0, (size(split(text, ' ')) + 11) div 12 - 1), " +
            "i -> concat_ws(' ', slice(split(text, ' '), i * 12 + 1, 12))))")
          .as("text"))
        Dedup.lineDedup(relined, minCount = 2).orderBy("doc_id")
      },
      Some("WITH t AS (SELECT doc_id, string_split(text, ' ') AS sp " +
        "FROM documents), " +
        "d2 AS (SELECT doc_id, array_to_string(" +
        "[array_to_string(sp[i*12+1 : least((i+1)*12, len(sp))], ' ') " +
        "FOR i IN range(0, (len(sp) + 11) // 12)], chr(10)) AS text FROM t), " +
        "ls AS (SELECT doc_id, string_split(text, chr(10)) AS sp2 FROM d2), " +
        "lx AS (SELECT doc_id, u.idx AS idx, u.line AS line FROM " +
        "(SELECT doc_id, unnest([{'idx': i - 1, 'line': sp2[i]} " +
        "FOR i IN range(1, len(sp2) + 1)]) AS u FROM ls) q0), " +
        "lm AS (SELECT doc_id, idx, line, " +
        "row_number() OVER (PARTITION BY line ORDER BY doc_id, idx) AS occ, " +
        "count(*) OVER (PARTITION BY line) AS n_occ FROM lx), " +
        "lk AS (SELECT doc_id, idx, line, (occ = 1 OR n_occ < 2) AS keep FROM lm) " +
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines, " +
        "CAST(count(*) FILTER (keep) AS BIGINT) AS n_kept, " +
        "COALESCE(string_agg(CASE WHEN keep THEN line END, chr(10) " +
        "ORDER BY idx), '') AS text " +
        "FROM lk GROUP BY doc_id ORDER BY doc_id")),


    // PER-SOURCE BOILERPLATE strip — the regime the line rule above can't
    // express: a line in ≥ max(2, ⌈0.5·docs-of-source⌉) distinct documents
    // of the SAME source is that site's template chrome and drops from ALL
    // of them (a banner is content in none of its pages), while a line
    // shared by a MINORITY of a source's pages survives everywhere — even
    // when it is corpus-frequent (lineDedup would keep only its first
    // copy). The fixture wraps each relined doc in a global banner (df =
    // 100% per source → stripped), a per-source footer (likewise), and a
    // quote on every 7th doc (~14% per source → kept), exercising both
    // verdicts; the oracle replays the df threshold line by line.
    Q("q_text_boilerplate",
      (s, d) => {
        val relined = expr(
          "concat_ws('\n', transform(" +
            "sequence(0, (size(split(text, ' ')) + 11) div 12 - 1), " +
            "i -> concat_ws(' ', slice(split(text, ' '), i * 12 + 1, 12))))")
        val quote = when(col("doc_id") % 7 === 0,
          lit("a quote cited by a few pages of every site\n")).otherwise(lit(""))
        val wrapped = Tables.documents(s, d)
          .filter(col("text").isNotNull)
          .select(col("doc_id"), col("source"),
            concat(lit("SUBSCRIBE to our newsletter\n"), quote, relined,
              lit("\n(c) 2026 "), col("source")).as("text"))
        Dedup.boilerplateStrip(wrapped, minDocFrac = 0.5, minDocs = 2)
          .orderBy("doc_id")
      },
      Some("WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS sp " +
        "FROM documents WHERE text IS NOT NULL), " +
        "d2 AS (SELECT doc_id, source, 'SUBSCRIBE to our newsletter' || " +
        "chr(10) || CASE WHEN doc_id % 7 = 0 THEN " +
        "'a quote cited by a few pages of every site' || chr(10) " +
        "ELSE '' END || array_to_string(" +
        "[array_to_string(sp[i*12+1 : least((i+1)*12, len(sp))], ' ') " +
        "FOR i IN range(0, (len(sp) + 11) // 12)], chr(10)) || " +
        "chr(10) || '(c) 2026 ' || source AS text FROM t), " +
        "ls AS (SELECT doc_id, source, string_split(text, chr(10)) AS sp2 " +
        "FROM d2), " +
        "lx AS (SELECT doc_id, source, u.idx AS idx, u.line AS line FROM " +
        "(SELECT doc_id, source, unnest([{'idx': i - 1, 'line': sp2[i]} " +
        "FOR i IN range(1, len(sp2) + 1)]) AS u FROM ls) q0), " +
        "tot AS (SELECT source, count(*) AS n_docs FROM d2 GROUP BY source), " +
        "dfq AS (SELECT source, line, count(DISTINCT doc_id) AS df " +
        "FROM lx GROUP BY source, line), " +
        "lk AS (SELECT lx.doc_id, lx.idx, lx.line, " +
        "(dfq.df < greatest(2, CAST(ceil(0.5 * tot.n_docs) AS BIGINT))) " +
        "AS keep FROM lx JOIN dfq USING (source, line) " +
        "JOIN tot USING (source)) " +
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines, " +
        "CAST(count(*) FILTER (keep) AS BIGINT) AS n_kept, " +
        "COALESCE(string_agg(CASE WHEN keep THEN line END, chr(10) " +
        "ORDER BY idx), '') AS text " +
        "FROM lk GROUP BY doc_id ORDER BY doc_id")),


    // INCREMENTAL boilerplate strip: the per-source (line, df) state is a
    // PERSISTED artifact (writeLineDfTable — partial rows, the daily-
    // rollup discipline: upsert appends, readers sum) and today's batch
    // (doc_id % 4 = 0) screens against seen ∪ batch statistics at
    // O(batch) instead of re-deriving corpus line-df per run. Built on
    // half the seen corpus + UPSERT of the other half, so the gate also
    // certifies the fold. The oracle is the FULL-corpus strip replay
    // restricted to the batch: hash equality proves the incremental
    // verdicts equal the from-scratch ones on the union.
    Q("q_text_boilerplate_indexed",
      (s, d) => {
        val wrapped = wrappedBoilerDocs(s, d)
        val seen = wrapped.filter(col("doc_id") % 4 =!= 0)
        val batch = wrapped.filter(col("doc_id") % 4 === 0)
        val name = "graft_ldf_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        Dedup.writeLineDfTable(seen.filter(col("doc_id") % 2 === 0), name)
        try {
          Dedup.upsertLineDfTable(s, name,
            seen.filter(col("doc_id") % 2 =!= 0))
          Dedup.boilerplateStripAgainst(s, name, batch,
              minDocFrac = 0.5, minDocs = 2)
            .orderBy("doc_id").localCheckpoint(true)
        } finally Dedup.dropLineDfTable(s, name)
      },
      Some(boilerIndexedOracle)),


    // CONTEXT-LENGTH TRUNCATION report — the sequence-length planning
    // aggregate: for each candidate context length, how many documents
    // exceed it and what fraction of corpus tokens a truncate-at-L policy
    // discards. One scan; the candidate lengths are a plan literal and the
    // exchange carries |lens| groups regardless of corpus size. Exact
    // integer counts; the two fractions are single IEEE divisions.
    Q("q_text_truncation",
      (s, d) => TextAnalysis.truncationReport(Tables.documents(s, d),
        Seq(64, 128, 256, 512)).orderBy("context_len"),
      Some("WITH tk AS (SELECT CAST(len(" + toksSql + ") AS BIGINT) AS n " +
        "FROM documents WHERE text IS NOT NULL), " +
        "ln AS (SELECT CAST(unnest([64, 128, 256, 512]) AS BIGINT) " +
        "AS context_len) " +
        "SELECT context_len, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(count(*) FILTER (n > context_len) AS BIGINT) AS n_truncated, " +
        "CAST(count(*) FILTER (n > context_len) AS DOUBLE) / " +
        "CAST(count(*) AS DOUBLE) AS frac_truncated, " +
        "CAST(sum(n) AS BIGINT) AS tokens_total, " +
        "CAST(sum(greatest(n - context_len, 0)) AS BIGINT) AS tokens_lost, " +
        "CAST(sum(greatest(n - context_len, 0)) AS DOUBLE) / " +
        "CAST(sum(n) AS DOUBLE) AS frac_tokens_lost " +
        "FROM tk, ln GROUP BY context_len ORDER BY context_len")),


    // WITHIN-DOCUMENT paragraph dedup — the document-local complement of
    // the corpus-global line rule above (scraper stutter / double-rendered
    // templates inside one page): repeated paragraphs keep their first
    // occurrence, per document, with NO shuffle at all (first-occurrence
    // keep is an array projection). The corpus has no newlines, so the
    // fixture builds each doc as paragraphs [A, B, A, C] from its own
    // 12-token slices — a guaranteed within-doc duplicate, replayed
    // verbatim by the oracle.
    Q("q_text_paragraph_dedup",
      (s, d) => {
        val sp = split(col("text"), " ")
        def para(start: Int) = concat_ws(" ", slice(sp, start, 12))
        val docs = Tables.documents(s, d)
          .filter(col("text").isNotNull)
          .select(col("doc_id"),
            concat_ws("\n", para(1), para(13), para(1), para(25)).as("text"))
        Dedup.paragraphDedup(docs).orderBy("doc_id")
      },
      Some("WITH t AS (SELECT doc_id, string_split(text, ' ') AS sp " +
        "FROM documents WHERE text IS NOT NULL), " +
        // COALESCE each slice: array_to_string([]) is NULL in DuckDB but
        // concat_ws of an empty slice is '' in Spark
        "d2 AS (SELECT doc_id, COALESCE(array_to_string(sp[1:12], ' '), '') " +
        "|| chr(10) || COALESCE(array_to_string(sp[13:24], ' '), '') " +
        "|| chr(10) || COALESCE(array_to_string(sp[1:12], ' '), '') " +
        "|| chr(10) || COALESCE(array_to_string(sp[25:36], ' '), '') " +
        "AS text FROM t), " +
        "ls AS (SELECT doc_id, string_split(text, chr(10)) AS pp FROM d2), " +
        "lx AS (SELECT doc_id, u.idx AS idx, u.para AS para FROM " +
        "(SELECT doc_id, unnest([{'idx': i - 1, 'para': pp[i]} " +
        "FOR i IN range(1, len(pp) + 1)]) AS u FROM ls) q0), " +
        "fo AS (SELECT doc_id, idx, para, " +
        "min(idx) OVER (PARTITION BY doc_id, para) AS fidx FROM lx) " +
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_paras, " +
        "CAST(count(*) FILTER (idx = fidx) AS BIGINT) AS n_kept, " +
        "COALESCE(string_agg(CASE WHEN idx = fidx THEN para END, chr(10) " +
        "ORDER BY idx), '') AS text " +
        "FROM fo GROUP BY doc_id ORDER BY doc_id")),


    // Benchmark decontamination at SPAN level: benchmark docs (every 50th,
    // re-keyed into a disjoint id space) screened against documents ∪ the
    // engineered concat super-docs. Every benchmark doc surfaces twice —
    // its verbatim corpus twin (full run) and its containing super-doc
    // (partial run) — so WHERE and HOW MUCH of the benchmark leaked is the
    // output, not just a per-doc overlap fraction.
    Q("q_text_contamination_spans",
      (s, d) => {
        val docs = Tables.documents(s, d).select("doc_id", "text")
        val concats = docs.as("a").filter(col("doc_id") % 10 === 0)
          .join(docs.as("b"), col("b.doc_id") === col("a.doc_id") + 1)
          .select((col("a.doc_id") + lit(20000L)).as("doc_id"),
            concat(col("a.text"), lit(" "), col("b.text")).as("text"))
        val bench = docs.filter(col("doc_id") % 50 === 0)
          .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text"))
        Dedup.duplicatePassagesAgainst(docs.unionByName(concats), bench,
            chunkTokens = 16, minChunks = 2, maxChunkDf = 64)
          .orderBy("corpus_doc", "bench_doc", "start_corpus", "start_bench")
      },
      Some("WITH d AS (SELECT doc_id, text FROM documents " +
        "UNION ALL SELECT a.doc_id + 20000 AS doc_id, " +
        "a.text || ' ' || b.text AS text FROM documents a " +
        "JOIN documents b ON b.doc_id = a.doc_id + 1 " +
        "WHERE a.doc_id % 10 = 0), " +
        "bd AS (SELECT doc_id + 1000000 AS doc_id, text FROM documents " +
        "WHERE doc_id % 50 = 0), " +
        chunkFpCtes("d", "c") + ", " +
        chunkFpCtes("bd", "b") + ", " +
        "hot AS (SELECT f FROM cfp GROUP BY f HAVING count(*) > 64), " +
        "rare AS (SELECT cfp.* FROM cfp ANTI JOIN hot USING (f)), " +
        "m AS (SELECT r.doc_id AS corpus_doc, b.doc_id AS bench_doc, " +
        "r.idx AS ia, b.idx AS ib FROM rare r JOIN bfp b ON r.f = b.f), " +
        "r2 AS (SELECT corpus_doc, bench_doc, ia, ib, ia - ib AS diag, " +
        "ia - row_number() OVER (PARTITION BY corpus_doc, bench_doc, " +
        "ia - ib ORDER BY ia) AS grp FROM m), " +
        "g AS (SELECT corpus_doc, bench_doc, " +
        "CAST(min(ia) AS BIGINT) AS start_corpus, " +
        "CAST(min(ib) AS BIGINT) AS start_bench, count(*) AS n_chunks " +
        "FROM r2 GROUP BY corpus_doc, bench_doc, diag, grp) " +
        "SELECT corpus_doc, bench_doc, start_corpus, start_bench, " +
        "CAST(n_chunks AS BIGINT) AS n_chunks, " +
        "CAST(n_chunks * 16 AS BIGINT) AS approx_tokens FROM g " +
        "WHERE n_chunks >= 2 " +
        "ORDER BY corpus_doc, bench_doc, start_corpus, start_bench")),


    // DECONTAMINATION end-to-end: the spans screen composed with the
    // scrub — leaked benchmark spans are EXCISED from the corpus (span
    // level, so a page quoting one eval question keeps its other
    // paragraphs; a verbatim benchmark twin comes back as ''). Same
    // fixture as q_text_contamination_spans; the oracle chains the
    // bipartite run detection into the slice reconstruction.
    Q("q_text_decontaminate",
      (s, d) => {
        val docs = Tables.documents(s, d).select("doc_id", "text")
        val concats = docs.as("a").filter(col("doc_id") % 10 === 0)
          .join(docs.as("b"), col("b.doc_id") === col("a.doc_id") + 1)
          .select((col("a.doc_id") + lit(20000L)).as("doc_id"),
            concat(col("a.text"), lit(" "), col("b.text")).as("text"))
        val bench = docs.filter(col("doc_id") % 50 === 0)
          .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text"))
        Dedup.decontaminate(docs.unionByName(concats), bench,
            chunkTokens = 16, minChunks = 2, maxChunkDf = 64)
          .orderBy("doc_id")
      },
      Some("WITH d AS (SELECT doc_id, text FROM documents " +
        "UNION ALL SELECT a.doc_id + 20000 AS doc_id, " +
        "a.text || ' ' || b.text AS text FROM documents a " +
        "JOIN documents b ON b.doc_id = a.doc_id + 1 " +
        "WHERE a.doc_id % 10 = 0), " +
        "bd AS (SELECT doc_id + 1000000 AS doc_id, text FROM documents " +
        "WHERE doc_id % 50 = 0), " +
        chunkFpCtes("d", "c") + ", " +
        chunkFpCtes("bd", "b") + ", " +
        "hot AS (SELECT f FROM cfp GROUP BY f HAVING count(*) > 64), " +
        "rare AS (SELECT cfp.* FROM cfp ANTI JOIN hot USING (f)), " +
        "m AS (SELECT r.doc_id AS corpus_doc, b.doc_id AS bench_doc, " +
        "r.idx AS ia, b.idx AS ib FROM rare r JOIN bfp b ON r.f = b.f), " +
        "r2 AS (SELECT corpus_doc, bench_doc, ia, ib, ia - ib AS diag, " +
        "ia - row_number() OVER (PARTITION BY corpus_doc, bench_doc, " +
        "ia - ib ORDER BY ia) AS grp FROM m), " +
        "g AS (SELECT corpus_doc, bench_doc, " +
        "CAST(min(ia) AS BIGINT) AS start_corpus, count(*) AS n_chunks " +
        "FROM r2 GROUP BY corpus_doc, bench_doc, diag, grp), " +
        "rm0 AS (SELECT corpus_doc AS doc_id, " +
        "unnest(range(start_corpus, start_corpus + n_chunks)) AS idx FROM g " +
        "WHERE n_chunks >= 2), " +
        "rmd AS (SELECT DISTINCT doc_id, idx FROM rm0), " +
        "rms AS (SELECT doc_id, list(idx ORDER BY idx) AS rms, " +
        "count(*) AS n_removed FROM rmd GROUP BY 1), " +
        "tall AS (SELECT doc_id, " + toksSql + " AS t FROM d), " +
        "base AS (SELECT doc_id, t, CASE WHEN t IS NULL OR len(t) = 0 " +
        "THEN 0 ELSE (len(t) - 1) // 16 + 1 END AS n_chunks FROM tall) " +
        "SELECT b.doc_id, CAST(b.n_chunks AS BIGINT) AS n_chunks, " +
        "CAST(COALESCE(r.n_removed, 0) AS BIGINT) AS n_removed_chunks, " +
        "CASE WHEN b.t IS NULL THEN NULL WHEN b.n_chunks = 0 THEN '' " +
        "ELSE COALESCE(array_to_string(flatten([b.t[(i*16+1):(i*16+16)] " +
        "FOR i IN range(0, b.n_chunks) " +
        "IF NOT list_contains(COALESCE(r.rms, CAST([] AS BIGINT[])), i)]), " +
        "' '), '') END AS text " +
        "FROM base b LEFT JOIN rms r USING (doc_id) ORDER BY b.doc_id")),


    // Benchmark-contamination screen: per-document fraction of distinct
    // trigrams that appear in the benchmark slice (every 50th document).
    Q("q_text_contamination",
      (s, d) => {
        val docs = Tables.documents(s, d)
        Dedup.benchmarkContamination(docs, docs.filter(col("doc_id") % 50 === 0))
          .orderBy("doc_id")
      },
      Some("WITH toks AS (SELECT doc_id, " + toksSql + " AS t FROM documents), " +
        "ngrams AS (SELECT doc_id, list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] " +
        "FOR i IN range(1, len(t) - 1)]) AS ng FROM toks WHERE len(t) >= 3), " +
        "bg AS (SELECT DISTINCT unnest(ng) AS g FROM ngrams WHERE doc_id % 50 = 0), " +
        "posting AS (SELECT doc_id, unnest(ng) AS g FROM ngrams), " +
        "hits AS (SELECT doc_id, count(*) AS n_hit FROM posting " +
        "WHERE g IN (SELECT g FROM bg) GROUP BY 1) " +
        "SELECT n.doc_id, len(n.ng) AS n_grams, COALESCE(n_hit, 0) AS n_hit, " +
        "CAST(COALESCE(n_hit, 0) AS DOUBLE) / len(n.ng) AS contamination " +
        "FROM ngrams n LEFT JOIN hits USING (doc_id) ORDER BY doc_id")),


    // Gopher-style repetition filters (Rae et al. §A1.1): fraction of
    // characters under the most frequent word 2-gram, and under redundant
    // occurrences of duplicated 5-grams. Integer-exact until one final
    // double division, so the replay is bit-identical.
    Q("q_text_repetition",
      (s, d) => TextAnalysis.repetitionStats(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some(s"WITH $repCtes " +
        "SELECT t.doc_id, top_2gram, top_2gram_char_frac, " +
        "COALESCE(dup_5gram_char_frac, 0.0) AS dup_5gram_char_frac " +
        "FROM top2 t LEFT JOIN dup5 d ON t.doc_id = d.doc_id " +
        "ORDER BY t.doc_id")),


    // The COMPLETE Gopher repetition table (Rae et al. 2021 Table A1,
    // all twelve §A1.1 signals) over a deterministically INJECTED
    // corpus: documents reflow to 6-word lines / 2-line paragraphs, then
    // doc_id % 5 = 0 re-appends its first paragraph (duplicate paragraph
    // + lines + 5..10-gram spans) and doc_id % 3 = 0 its first line
    // (duplicate line + 5/6-gram spans only) — every signal family fires
    // with survivors AND non-hits at the gate, the q_text_boilerplate
    // injection discipline. Coverage fractions use the paper's
    // position-coverage semantic (DISTINCT covered token positions
    // priced by token length); line/paragraph and top-gram arms are
    // beyond-first counts and the repetitionStats argmax rule. One
    // tagged line+paragraph aggregate, one n=1..10 occurrence explode
    // with a checkpointed count table — see the operator's scaladoc for
    // the 100 TB shape.
    Q("q_text_gopher_repetition",
      (s, d) => {
        // reflow as three codegen-native global regex passes (the
        // transform/slice/array_join HOF form of the same reflow ran
        // interpreted and cost ~2 s of a 2.4 s query): every 6th
        // token-separating space becomes a line break, every 2nd line
        // break a paragraph break, and the injected duplicates are the
        // regex-extracted first line / first paragraph
        val injected = Tables.documents(s, d)
          .filter(col("text").isNotNull)
          .withColumn("__l", regexp_replace(col("text"),
            "(\\S+ \\S+ \\S+ \\S+ \\S+ \\S+) ", "$1\n"))
          .withColumn("__p", regexp_replace(col("__l"),
            "([^\n]+\n[^\n]+)\n", "$1\n\n"))
          .select(col("doc_id"), concat(col("__p"),
            expr("CASE WHEN doc_id % 5 = 0 " +
              "THEN '\\n\\n' || regexp_extract(__p, '^[^\\n]*\\n?[^\\n]*', 0) " +
              "WHEN doc_id % 3 = 0 " +
              "THEN '\\n\\n' || regexp_extract(__l, '^[^\\n]*', 0) " +
              "ELSE '' END")).as("text"))
        TextAnalysis.gopherRepetition(injected).orderBy("doc_id")
      },
      Some(gopherRepOracle)),


    // The Gopher POLICY verdict over the same injected corpus — the
    // exact relation the streaming gate (gopherGateSink) applies per
    // trigger, now oracle-gated: thirteen cap comparisons against the
    // paper's published thresholds, rendered into both engines from the
    // SAME Scala constants. The %3/%5 injection classes fail (their
    // duplicate spans blow the coverage caps); everything else keeps.
    Q("q_text_gopher_verdict",
      (s, d) => {
        val injected = Tables.documents(s, d)
          .filter(col("text").isNotNull)
          .withColumn("__l", regexp_replace(col("text"),
            "(\\S+ \\S+ \\S+ \\S+ \\S+ \\S+) ", "$1\n"))
          .withColumn("__p", regexp_replace(col("__l"),
            "([^\n]+\n[^\n]+)\n", "$1\n\n"))
          .select(col("doc_id"), concat(col("__p"),
            expr("CASE WHEN doc_id % 5 = 0 " +
              "THEN '\\n\\n' || regexp_extract(__p, '^[^\\n]*\\n?[^\\n]*', 0) " +
              "WHEN doc_id % 3 = 0 " +
              "THEN '\\n\\n' || regexp_extract(__l, '^[^\\n]*', 0) " +
              "ELSE '' END")).as("text"))
        TextAnalysis.gopherVerdict(injected).orderBy("doc_id")
      },
      Some(gopherVerdictOracle)),


    // CORPUS-INTERNAL trigram novelty — the diversity audit beside the
    // within-doc repetition screen: per doc, the fraction of its distinct
    // trigrams occurring in NO other document (templated phrasing scores
    // low even when every page is unique). One trigram-keyed exchange;
    // novelty = one IEEE division of exact counts.
    Q("q_text_trigram_novelty",
      (s, d) => TextAnalysis.trigramNovelty(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some(s"WITH tk AS (SELECT doc_id, $toksSql AS t FROM documents " +
        "WHERE text IS NOT NULL), " +
        "g0 AS (SELECT doc_id, list_distinct(" +
        "[array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t) - 1)]) " +
        "AS gs FROM tk), " +
        "gx AS (SELECT doc_id, unnest(gs) AS g FROM g0), " +
        "pd AS (SELECT doc_id, count(*) AS n_tri, " +
        "count(*) FILTER (df = 1) AS n_unique FROM " +
        "(SELECT doc_id, count(*) OVER (PARTITION BY g) AS df FROM gx) " +
        "GROUP BY doc_id) " +
        "SELECT tk.doc_id, " +
        "CAST(COALESCE(n_tri, 0) AS BIGINT) AS n_trigrams, " +
        "CAST(COALESCE(n_unique, 0) AS BIGINT) AS n_unique, " +
        "CASE WHEN n_tri > 0 THEN " +
        "CAST(n_unique AS DOUBLE) / CAST(n_tri AS DOUBLE) END AS novelty " +
        "FROM tk LEFT JOIN pd ON tk.doc_id = pd.doc_id " +
        "ORDER BY tk.doc_id")),


    // PII scrub pass: detection counts + tag redaction, engine-portable
    // regexes (the driver corpus is PII-free, so counts replay as zeros and
    // redaction as identity — the POSITIVE arms are pinned by PipelineSpec
    // fixtures, same contract as the multimodal decoders).
    Q("q_text_pii",
      (s, d) => TextAnalysis.piiScan(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some("SELECT doc_id, " +
        s"CAST(len(regexp_extract_all(text, '${TextAnalysis.EmailRx}')) AS BIGINT) AS n_emails, " +
        s"CAST(len(regexp_extract_all(text, '${TextAnalysis.PhoneRx}')) AS BIGINT) AS n_phones, " +
        s"CAST(len(regexp_extract_all(text, '${TextAnalysis.Ipv4Rx}')) AS BIGINT) AS n_ipv4, " +
        s"regexp_replace(regexp_replace(regexp_replace(text, " +
        s"'${TextAnalysis.EmailRx}', '<EMAIL>', 'g'), " +
        s"'${TextAnalysis.Ipv4Rx}', '<IP>', 'g'), " +
        s"'${TextAnalysis.PhoneRx}', '<PHONE>', 'g') AS redacted " +
        "FROM documents ORDER BY doc_id")),


    // MARKUP STRIP — crawl-edge HTML-ish cleaning: the fixture wraps each
    // doc in tags + entities (corpus text has none), the operator strips
    // tags to spaces, unescapes the four standard entities (&amp; last),
    // collapses whitespace. Both the wrap and the strip replay verbatim.
    Q("q_text_markup",
      (s, d) => {
        val wrapped = Tables.documents(s, d).select(col("doc_id"),
          concat(lit("<div class=\"d\">"), col("text"),
            lit("</div> &amp; <br/>10 &lt; 20")).as("text"))
        TextAnalysis.markupStats(wrapped).orderBy("doc_id")
      },
      Some("WITH w AS (SELECT doc_id, '<div class=\"d\">' || text || " +
        "'</div> &amp; <br/>10 &lt; 20' AS text FROM documents) " +
        "SELECT doc_id, " +
        s"CAST(len(regexp_extract_all(text, '${TextAnalysis.TagRx}')) " +
        "AS BIGINT) AS n_tags, " +
        "CAST(length(text) AS BIGINT) AS n_chars_raw, " +
        "trim(regexp_replace(regexp_replace(regexp_replace(" +
        "regexp_replace(regexp_replace(regexp_replace(text, " +
        s"'${TextAnalysis.TagRx}', ' ', 'g'), " +
        "'&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '\"', 'g'), " +
        "'&amp;', '&', 'g'), '\\s+', ' ', 'g')) AS clean_text, " +
        "CAST(length(trim(regexp_replace(regexp_replace(regexp_replace(" +
        "regexp_replace(regexp_replace(regexp_replace(text, " +
        s"'${TextAnalysis.TagRx}', ' ', 'g'), " +
        "'&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '\"', 'g'), " +
        "'&amp;', '&', 'g'), '\\s+', ' ', 'g'))) AS BIGINT) " +
        "AS n_chars_clean FROM w ORDER BY doc_id")),


    // LINK-DENSITY spam signal (C4 drops link farms): every 5th doc gets
    // two URLs appended; URL count, link-char fraction, spam verdict.
    // LINK-GRAPH DOMAIN AUTHORITY: weighted PageRank over the corpus's
    // outlink graph (source domain → linked host, self-links dropped),
    // 3 fixed power iterations at damping 0.85 with dangling mass
    // redistributed — the Common-Crawl quality prior as an oracle-gated
    // number. The fixture spikes every 5th document with a rotating
    // site{0..6} link and every 3rd with a shared hub link, so the graph
    // has fan-in skew, dangling targets, AND multi-edge weights; the
    // oracle unrolls the same iterations as CTEs with the same pinned
    // fold orders (the k-means-replay discipline applied to PageRank).
    Q("q_text_domain_rank",
      (s, d) => TextAnalysis.domainAuthority(
          domainRankFixture(s, d), iters = 3, damping = 0.85)
        .orderBy("domain"),
      Some(domainRankOracle(iters = 3, damping = 0.85))),


    // AUTHORITY-GATED CURATION ARM: the PageRank prior composed into the
    // filter pipeline — per document, its source domain's authority and
    // keep = rank >= alpha/N (authority at least alpha× the uniform
    // share, the scale-free low-authority drop). Same spiked link-graph
    // fixture as q_text_domain_rank; the oracle re-renders the identical
    // rank CTE chain under one composed query (the q_text_fertility
    // composition discipline).
    Q("q_text_authority_verdict",
      (s, d) => TextAnalysis.authorityVerdict(
          domainRankFixture(s, d), alpha = 0.5, iters = 3, damping = 0.85)
        .orderBy("doc_id"),
      Some(authorityVerdictOracle(iters = 3, damping = 0.85, alpha = 0.5))),


    Q("q_text_links",
      (s, d) => {
        val spiked = Tables.documents(s, d).select(col("doc_id"),
          concat(col("text"),
            when(pmod(col("doc_id"), lit(5L)) === 0,
              lit(" see https://example.com/a and" +
                " https://foo.example.org/path?q=1"))
              .otherwise(lit(""))).as("text"))
        TextAnalysis.linkStats(spiked).orderBy("doc_id")
      },
      Some("WITH w AS (SELECT doc_id, text || CASE WHEN doc_id % 5 = 0 " +
        "THEN ' see https://example.com/a and" +
        " https://foo.example.org/path?q=1' ELSE '' END AS text " +
        "FROM documents) " +
        "SELECT doc_id, " +
        s"CAST(len(regexp_extract_all(text, '${TextAnalysis.UrlRx}')) " +
        "AS BIGINT) AS n_links, " +
        "CAST(length(text) - length(regexp_replace(text, " +
        s"'${TextAnalysis.UrlRx}', '', 'g')) AS BIGINT) AS n_link_chars, " +
        "CAST(length(text) AS BIGINT) AS n_chars, " +
        "CASE WHEN length(text) > 0 THEN " +
        "CAST(length(text) - length(regexp_replace(text, " +
        s"'${TextAnalysis.UrlRx}', '', 'g')) AS DOUBLE) " +
        "/ CAST(length(text) AS DOUBLE) END AS link_char_frac, " +
        "COALESCE(CASE WHEN length(text) > 0 THEN " +
        "CAST(length(text) - length(regexp_replace(text, " +
        s"'${TextAnalysis.UrlRx}', '', 'g')) AS DOUBLE) " +
        "/ CAST(length(text) AS DOUBLE) END " +
        s"> ${TextAnalysis.LinkSpamMin}, false) AS is_link_spam " +
        "FROM w ORDER BY doc_id")),


    // CODE-DETECTION routing signal: every 7th doc gets a code prefix;
    // punctuation + keyword markers per token, is_code at the density
    // threshold — the cheap router in front of the trained classifier.
    Q("q_text_code",
      (s, d) => {
        val spiked = Tables.documents(s, d).select(col("doc_id"),
          concat(
            when(pmod(col("doc_id"), lit(7L)) === 0,
              lit("def f(x): return {x; y()} ")).otherwise(lit("")),
            col("text")).as("text"))
        TextAnalysis.codeSignals(spiked).orderBy("doc_id")
      },
      Some("WITH w AS (SELECT doc_id, CASE WHEN doc_id % 7 = 0 " +
        "THEN 'def f(x): return {x; y()} ' ELSE '' END || text AS text " +
        "FROM documents) " +
        "SELECT doc_id, " +
        s"CAST(len(regexp_extract_all(text, '${TextAnalysis.CodePunctRx}')) " +
        "AS BIGINT) AS n_code_punct, " +
        "CAST(len(regexp_extract_all(text, " +
        s"'${TextAnalysis.CodeKeywordRx}')) AS BIGINT) AS n_code_keywords, " +
        s"CAST(len($toksSql) AS BIGINT) AS token_count, " +
        s"CASE WHEN len($toksSql) > 0 THEN " +
        "CAST(len(regexp_extract_all(text, " +
        s"'${TextAnalysis.CodePunctRx}')) + " +
        "len(regexp_extract_all(text, " +
        s"'${TextAnalysis.CodeKeywordRx}')) AS DOUBLE) " +
        s"/ CAST(len($toksSql) AS DOUBLE) END AS marker_density, " +
        s"COALESCE(CASE WHEN len($toksSql) > 0 THEN " +
        "CAST(len(regexp_extract_all(text, " +
        s"'${TextAnalysis.CodePunctRx}')) + " +
        "len(regexp_extract_all(text, " +
        s"'${TextAnalysis.CodeKeywordRx}')) AS DOUBLE) " +
        s"/ CAST(len($toksSql) AS DOUBLE) END " +
        s">= ${TextAnalysis.CodeMarkerMin}, false) AS is_code " +
        "FROM w ORDER BY doc_id")),


    // ENCODING / MOJIBAKE QA — crawl-ingest hygiene: ASCII fraction,
    // stray control chars, U+FFFD replacement chars, Latin-1-mojibake
    // markers, and a verdict. All four regex classes and the 0.6 ratio
    // threshold render from the SAME Scala constants into both engines;
    // integer-exact until the one final division.
    Q("q_text_encoding",
      (s, d) => TextAnalysis.encodingStats(Tables.documents(s, d))
        .orderBy("doc_id"),
      Some("SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, " +
        s"CAST(len(regexp_extract_all(text, '${TextAnalysis.AsciiRx}')) AS BIGINT) AS n_ascii, " +
        s"CASE WHEN length(text) > 0 THEN " +
        s"CAST(len(regexp_extract_all(text, '${TextAnalysis.AsciiRx}')) AS DOUBLE) " +
        "/ CAST(length(text) AS DOUBLE) END AS ascii_ratio, " +
        s"CAST(len(regexp_extract_all(text, '${TextAnalysis.BadControlRx}')) AS BIGINT) AS n_control, " +
        s"CAST(len(regexp_extract_all(text, '${TextAnalysis.ReplacementRx}')) AS BIGINT) AS n_replacement, " +
        s"CAST(len(regexp_extract_all(text, '${TextAnalysis.MojibakeRx}')) AS BIGINT) AS n_mojibake, " +
        "COALESCE(length(text) > 0 " +
        s"AND len(regexp_extract_all(text, '${TextAnalysis.BadControlRx}')) = 0 " +
        s"AND len(regexp_extract_all(text, '${TextAnalysis.ReplacementRx}')) = 0 " +
        s"AND CAST(len(regexp_extract_all(text, '${TextAnalysis.AsciiRx}')) AS DOUBLE) " +
        s"/ CAST(length(text) AS DOUBLE) >= ${TextAnalysis.AsciiCleanMin}, " +
        "false) AS encoding_ok FROM documents ORDER BY doc_id")),


    // Unicode NFC normalization — the pre-hash canonicalization pass
    // (composed vs decomposed encodings of identical text would dodge
    // every dedup hash). Engine: native expression over java.text
    // .Normalizer; oracle: DuckDB's nfc_normalize — both implement the
    // same Unicode canonical composition, so the replay is the standard
    // itself. Corpus is ASCII-clean (changed all-false); the composed/
    // decomposed positive arms are pinned in PipelineSpec, the PII
    // contract.
    Q("q_text_nfc",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          TextAnalysis.nfc(col("text")).as("normalized"),
          coalesce(TextAnalysis.nfc(col("text")) =!= col("text"), lit(false))
            .as("changed"))
        .orderBy("doc_id"),
      Some("SELECT doc_id, nfc_normalize(text) AS normalized, " +
        "COALESCE(nfc_normalize(text) != text, false) AS changed " +
        "FROM documents ORDER BY doc_id")),


    // BLOCKLIST screening — the policy-filter stage: which of a fixed
    // phrase list appears in each document. Engine: ONE pass per document
    // over an Aho-Corasick automaton carried into codegen as config
    // (functions/Blocklist.scala) — at 100 TB with thousands of phrases
    // this replaces K contains() scans per row with one. Oracle: the same
    // presence predicate replayed per pattern as instr(), first_match as
    // the pattern-order COALESCE — both sides rendered from the ONE
    // BlockPatterns constant.
    Q("q_text_blocklist",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), col("text"),
          graft.functions.Blocklist.matches(col("text"), BlockPatterns).as("m"))
        .select(col("doc_id"),
          size(col("m")).cast("long").as("n_flagged"),
          get(col("m"), lit(0)).as("first_match"),
          (size(col("m")) > 0).as("blocked"),
          // total greedy non-overlapping occurrences — the severity signal
          // (one hit vs fifty); semantics chosen = replace()-arithmetic so
          // the oracle replays it with string builtins
          graft.functions.Blocklist.countMatches(col("text"), BlockPatterns)
            .as("n_hits"))
        .orderBy("doc_id"),
      Some("SELECT doc_id, " +
        "CAST(" + BlockPatterns.map(p =>
          s"(CASE WHEN ${blockHitSql(p)} THEN 1 ELSE 0 END)").mkString(" + ") +
        " AS BIGINT) AS n_flagged, " +
        "COALESCE(" + BlockPatterns.map(p =>
          s"CASE WHEN ${blockHitSql(p)} THEN '$p' END").mkString(", ") +
        ") AS first_match, " +
        "(" + BlockPatterns.map(blockHitSql).mkString(" OR ") + ") AS blocked, " +
        "CAST(" + BlockPatterns.map(p =>
          s"((length(text) - length(replace(text, '$p', ''))) // ${p.length})")
          .mkString(" + ") +
        " AS BIGINT) AS n_hits " +
        "FROM documents ORDER BY doc_id")),


    // CASE/UNICODE-INSENSITIVE blocklist screen: the pattern list is
    // authored in arbitrary case ("DROP Database") and still flags the
    // lowercase corpus — both sides fold NFC + lowercase INSIDE the same
    // single automaton pass (not K lower() passes). first_match reports
    // the ORIGINAL pattern string; the oracle folds text with
    // lower(nfc_normalize(..)) and patterns at SQL-build time from the
    // shared constant.
    Q("q_text_blocklist_ci",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), col("text"),
          graft.functions.Blocklist.matches(col("text"), BlockPatternsCi,
            normalized = true).as("m"))
        .select(col("doc_id"),
          size(col("m")).cast("long").as("n_flagged"),
          get(col("m"), lit(0)).as("first_match"),
          (size(col("m")) > 0).as("blocked"),
          graft.functions.Blocklist.countMatches(col("text"), BlockPatternsCi,
            normalized = true).as("n_hits"))
        .orderBy("doc_id"),
      Some("SELECT doc_id, " +
        "CAST(" + BlockPatternsCi.map(p =>
          s"(CASE WHEN ${blockHitCiSql(p)} THEN 1 ELSE 0 END)").mkString(" + ") +
        " AS BIGINT) AS n_flagged, " +
        "COALESCE(" + BlockPatternsCi.map(p =>
          s"CASE WHEN ${blockHitCiSql(p)} THEN '$p' END").mkString(", ") +
        ") AS first_match, " +
        "(" + BlockPatternsCi.map(blockHitCiSql).mkString(" OR ") + ") AS blocked, " +
        "CAST(" + BlockPatternsCi.map { p =>
          val f = ciFold(p)
          "((length(lower(nfc_normalize(text))) - " +
            s"length(replace(lower(nfc_normalize(text)), '$f', ''))) // ${f.length})"
        }.mkString(" + ") +
        " AS BIGINT) AS n_hits " +
        "FROM documents ORDER BY doc_id")),


    // URL CANONICALIZATION + crawl-frontier dedup: per-doc URLs are
    // synthesized with every trap the canonicalizer must survive (upper
    // scheme/host, www., default vs explicit ports, fragments, tracking
    // params, unsorted params, trailing slashes, NULL sources), and the
    // oracle replays the full normalization chain step for step (RE2-
    // safe patterns; COALESCE mirrors Spark's ''-join of an empty
    // param list). should_fetch = the canonical group's lowest doc_id.
    Q("q_text_url_frontier",
      (s, d) => graft.functions.TextAnalysis.urlFrontier(synthUrls(s, d))
        .orderBy("doc_id"),
      Some(s"WITH $urlSynthSql, $urlCanonSql " +
        "SELECT doc_id, url, url_canonical, " +
        "CAST(CASE WHEN url_canonical IS NULL THEN 1 " +
        "ELSE count(*) OVER (PARTITION BY url_canonical) END AS BIGINT) " +
        "AS n_variants, " +
        "(url_canonical IS NULL OR " +
        "doc_id = min(doc_id) OVER (PARTITION BY url_canonical)) " +
        "AS should_fetch " +
        "FROM c3 ORDER BY doc_id")),


    // The PERSISTED frontier (incremental crawl regime): the seen-set of
    // docs < 400 is written as the url_canonical-bucketed `_frontier`
    // table, the >= 400 slice screens against it ('fresh' arm), folds in
    // via upsert, and a REPLAY of the same slice screens again
    // ('replay' arm — everything parseable now seen, so only NULL
    // canonicals keep should_fetch). The fresh arm hash-equals the
    // one-shot urlFrontier verdict restricted to the slice (batches
    // arrive in doc_id order, so seen-set membership ⟺ an earlier-id
    // occurrence exists) — write→read→upsert fidelity in one gate.
    Q("q_text_url_frontier_indexed",
      (s, d) => {
        val urls = synthUrls(s, d)
        val name = "graft_frontier_idx_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        graft.functions.TextAnalysis.writeFrontierTable(
          urls.filter(col("doc_id") < 400), name)
        try {
          val batch = urls.filter(col("doc_id") >= 400)
          val fresh = graft.functions.TextAnalysis
            .screenFrontier(s, name, batch)
            .withColumn("arm", lit("fresh")).localCheckpoint(true)
          graft.functions.TextAnalysis.upsertFrontierTable(s, name, batch)
          val replay = graft.functions.TextAnalysis
            .screenFrontier(s, name, batch)
            .withColumn("arm", lit("replay")).localCheckpoint(true)
          fresh.unionByName(replay).orderBy("arm", "doc_id")
        } finally graft.functions.TextAnalysis.dropFrontierTable(s, name)
      },
      Some(s"WITH $urlSynthSql, $urlCanonSql, " +
        "f AS (SELECT doc_id, url, url_canonical, " +
        "(url_canonical IS NULL OR " +
        "doc_id = min(doc_id) OVER (PARTITION BY url_canonical)) " +
        "AS should_fetch FROM c3) " +
        "SELECT 'fresh' AS arm, doc_id, url, url_canonical, should_fetch " +
        "FROM f WHERE doc_id >= 400 " +
        "UNION ALL " +
        "SELECT 'replay' AS arm, doc_id, url, url_canonical, " +
        "(url_canonical IS NULL) AS should_fetch " +
        "FROM f WHERE doc_id >= 400 " +
        "ORDER BY arm, doc_id"))
  )
}
