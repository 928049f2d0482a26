package graft.oracles

import graft.functions.{Bpe, TextAnalysis, Unigram}

/** The DuckDB oracle builders and shared tokenizer/classifier CONFIG for
  * the training-data-pipeline queries — extracted from [[graft.SparkEntry]]
  * (which `import`s this object wholesale) so the driver-contract file
  * stays query registrations and the SQL-replay machinery lives here.
  * Everything is `private[graft]`: the oracle text is an internal
  * certification surface, not library API. Dependency is ONE-WAY
  * (SparkEntry → PipelineOracles); the configs trained here (BPE merges,
  * unigram vocab, classifier weights) are the exact literals both the
  * Spark queries and the SQL replays render — the shared-rendered-constant
  * rule that makes the hash gates meaningful.
  */
private[graft] object PipelineOracles {

  /** DuckDB fragment: whitespace tokens of trimmed text. LAZY because the
    * heavy-hitters query in the analytics block above initializes before
    * this declaration — a strict val would interpolate null into its SQL.
    */
  private[graft] lazy val toksSql = "regexp_split_to_array(trim(text), '\\s+')"

  /** Tokenizer CONFIG for q_text_bpe_encode: a fixed ASCII seed corpus in
    * the documents table's register (database English), trained once
    * driver-side by [[Bpe.learnMergesLocal]] — pinned equal to the
    * distributed trainer in BpeSpec. The learned merge table is KBs of
    * configuration, so it renders as literals into BOTH engines
    * (shared-rendered-constant rule), exactly how a production tokenizer
    * ships: trained once, applied corpus-wide.
    */
  private[graft] val bpeSeedCorpus: Seq[String] = Seq(
    "scan the table hash the key merge the batch sort the column",
    "filter the row join the stream group the window order the part",
    "fast query slow query big data small data the vector the value",
    "spark agg line customer dup scan hash join merge sort filter",
    "the query the data the table the row the key the join the scan")
  private[graft] lazy val bpeMerges: Seq[graft.functions.Bpe.Merge] =
    Bpe.learnMergesLocal(bpeSeedCorpus, numMerges = 32)

  /** BYTE-LEVEL tokenizer CONFIG for q_text_bpe_encode_bytes: the same
    * seed register plus non-ASCII lines (accented Latin, a non-BMP
    * emoji), trained with `byteLevel = true` — the GPT-2 regime where
    * the alphabet is the 256 byte symbols and nothing is ever OOV. The
    * non-ASCII repeats force merges whose symbols span multi-byte UTF-8
    * sequences, so the oracle replay exercises the byte mapping, not
    * just ASCII-identity pairs.
    */
  private[graft] val bpeBytesSeedCorpus: Seq[String] = bpeSeedCorpus ++
    Seq.fill(4)("naïve café über naïve café über résumé café naïve über") ++
    Seq.fill(4)("🎉data 🎉data 🎉data señor señor piñata")
  private[graft] lazy val bpeBytesMerges: Seq[graft.functions.Bpe.Merge] =
    Bpe.learnMergesLocal(bpeBytesSeedCorpus, numMerges = 40, byteLevel = true)

  /** WordPiece CONFIG for q_text_wordpiece: the same seed register,
    * 48 likelihood-ratio merges ([[graft.functions.WordPiece
    * .learnVocabLocal]] — exact integer cross-multiplied scores, no
    * floating division in training), rendered into BOTH engines as the
    * vocabulary literal (shared-rendered-constant rule).
    */
  private[graft] lazy val wpVocab: Seq[String] =
    graft.functions.WordPiece.learnVocabLocal(bpeSeedCorpus, numMerges = 48)

  /** The vocabulary as a DuckDB struct-list literal: `raw` = the piece
    * without its `##` marker, `wi` = word-initial form. */
  private[graft] lazy val wpVocabLitSql: String = {
    def lit(s: String) = "'" + s.replace("'", "''") + "'"
    "[" + wpVocab.map { v =>
      val wi = !v.startsWith(graft.functions.WordPiece.ContMarker)
      val raw =
        if (wi) v else v.substring(graft.functions.WordPiece.ContMarker.length)
      s"{'raw': ${lit(raw)}, 'wi': $wi}"
    }.mkString(", ") + "]"
  }

  /** DuckDB replay of greedy longest-match WordPiece over every corpus
    * word: a recursive CTE whose transitions are PURE SCALAR expressions
    * over the vocabulary literal (no join in the recursive term), one
    * chain per DISTINCT word — the engine's per-thread word memo, as SQL.
    * At each position the candidates are the vocabulary pieces of the
    * right position form that prefix-match; the longest wins (at most
    * one piece per length can match, so there is no tie to break);
    * no candidate at any position → the whole word is `[UNK]` — exactly
    * [[graft.functions.WordPiece.segmentWord]].
    */
  private[graft] lazy val wpEncodeOracle: String = {
    val lit = wpVocabLitSql
    val matchCands = s"[v.raw FOR v IN $lit IF v.wi = (pos = 1) AND " +
      "substr(word, CAST(pos AS INT), len(v.raw)) = v.raw]"
    "WITH RECURSIVE " +
      s"tkk AS (SELECT doc_id, unnest($toksSql) AS word, " +
      s"generate_subscripts($toksSql, 1) AS ord FROM documents), " +
      "dw AS (SELECT DISTINCT word FROM tkk WHERE word <> ''), " +
      "st(word, pos, toks) AS (" +
      "SELECT word, CAST(1 AS BIGINT), CAST([] AS VARCHAR[]) FROM dw " +
      "UNION ALL " +
      "SELECT word, " +
      "CASE WHEN bl = 0 THEN len(word) + 1 ELSE pos + bl END, " +
      "CASE WHEN bl = 0 THEN ['[UNK]'] ELSE toks || " +
      "[CASE WHEN pos = 1 THEN bp ELSE '##' || bp END] END " +
      "FROM (SELECT word, pos, toks, " +
      "COALESCE(list_max([len(c) FOR c IN cands]), 0) AS bl, " +
      "([c FOR c IN cands IF len(c) = " +
      "COALESCE(list_max([len(c2) FOR c2 IN cands]), 0)])[1] AS bp " +
      s"FROM (SELECT word, pos, toks, $matchCands AS cands " +
      "FROM st WHERE pos <= len(word)))), " +
      "fin AS (SELECT word, toks FROM st WHERE pos = len(word) + 1), " +
      "seg AS (SELECT t.doc_id, t.ord, f.toks FROM tkk t " +
      "JOIN fin f USING (word) WHERE t.word <> ''), " +
      "agg AS (SELECT doc_id, " +
      "CAST(sum(len(toks)) AS BIGINT) AS wp_token_count, " +
      "CAST(sum(len([t FOR t IN toks IF t = '[UNK]'])) AS BIGINT) AS n_unk, " +
      "string_agg(array_to_string(toks, ' '), ' ' ORDER BY ord) AS subwords " +
      "FROM seg GROUP BY doc_id) " +
      "SELECT d.doc_id, " +
      "CAST(COALESCE(a.wp_token_count, 0) AS BIGINT) AS wp_token_count, " +
      "CAST(COALESCE(a.n_unk, 0) AS BIGINT) AS n_unk, " +
      "COALESCE(a.subwords, '') AS subwords " +
      "FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id " +
      "ORDER BY d.doc_id"
  }

  /** Fixed unigram-LM tokenizer config: trained once driver-side on the
    * SAME seed corpus as the BPE merges (deterministic — no RNG, fixed
    * iterations), then carried into [[graft.functions.UnigramScoreExpr]]
    * as literals AND rendered into the DuckDB oracle as a MAP literal
    * with the identical IEEE doubles (Double.toString round-trips).
    */
  private[graft] lazy val unigramVocab: Seq[graft.functions.Unigram.VocabPiece] =
    Unigram.trainLocal(
      bpeSeedCorpus.flatMap(_.split(" ")).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, g) => (w, g.size.toLong) }
        .toSeq.sortBy(_._1),
      vocabSize = 64, seedSize = 128, maxPieceLen = 4, emIters = 2)


  // string-literal casts, NOT bare numerics: DuckDB parses a bare
  // high-precision literal as DECIMAL first, and DECIMAL(17,16)→DOUBLE
  // loses the last ulp; CAST('…' AS DOUBLE) parses the shortest
  // round-trip rendering straight to the identical IEEE double
  private[graft] lazy val unigramMapSql: String =
    "MAP {" + unigramVocab.sortBy(_.piece).map(v =>
      s"'${v.piece}': CAST('${v.logProb}' AS DOUBLE)").mkString(", ") + "}"

  /** DuckDB replay of the greedy BPE encode. Symbols ride in a
    * U+001F-bounded string ("⟂c1⟂c2⟂…⟂</w>⟂") and each rank's merge is ONE
    * `replace(s, '⟂l⟂r⟂', '⟂lr⟂')`: SQL replace scans left-to-right,
    * non-overlapping, resuming after the replacement — with every symbol
    * sep-bounded that is EXACTLY [[Bpe.applyMerge]]'s greedy semantics
    * (the trailing sep of a replacement doubles as the leading sep of the
    * next candidate, i.e. the scan resumes at symbol i+2). The rank-sorted
    * merge table unrolls into nested replace() calls — a static expression
    * tree, no SQL-side loop. U+001F never occurs in the corpus (verified
    * ASCII-words-only) and Verify's JSON writer escapes control chars.
    */
  /** The greedy BPE encode of `word` as one nested-replace expression --
    * shared by the encode oracle and the fertility oracle (both splice it
    * over a `word` column and split on the U+001F separator).
    */
  private[graft] def bpeFoldedSqlFor(
      merges: Seq[graft.functions.Bpe.Merge]): String = {
    val sep = "\u001f"
    def lit(s: String) = "'" + s.replace("'", "''") + "'"
    val init = s"(${lit(sep)} || array_to_string(string_split(word, ''), " +
      s"${lit(sep)}) || ${lit(sep + Bpe.EndMarker + sep)})"
    merges.sortBy(_.rank).foldLeft(init) { (e, m) =>
      s"replace($e, ${lit(sep + m.left + sep + m.right + sep)}, " +
        s"${lit(sep + m.left + m.right + sep)})"
    }
  }

  private[graft] lazy val bpeFoldedSql: String = bpeFoldedSqlFor(bpeMerges)

  /** DuckDB replay of q_text_bpe_compression_curve: the SAME rank-sorted
    * merge table truncated at each vocabulary checkpoint (rank order is
    * the artifact's semantics, so prefix-truncation IS the tokenizer at
    * that checkpoint), each arm the standard sep-bounded replace() fold.
    */
  private[graft] lazy val bpeCompressionOracle: String = {
    val sep = "\u001f"
    def lit(s: String) = "'" + s.replace("'", "''") + "'"
    val arms = Seq(0, 8, 16, 32).map { k =>
      val folded = bpeFoldedSqlFor(bpeMerges.take(k))
      s"SELECT CAST($k AS BIGINT) AS n_merges, " +
        s"CAST(sum(len(string_split(trim($folded, ${lit(sep)}), " +
        s"${lit(sep)}))) AS BIGINT) AS total_tokens, " +
        "CAST(sum(length(word)) AS BIGINT) AS total_chars " +
        "FROM tk WHERE word <> ''"
    }
    s"WITH tk AS (SELECT doc_id, unnest($toksSql) AS word " +
      "FROM documents WHERE text IS NOT NULL), " +
      "u AS (" + arms.mkString(" UNION ALL ") + ") " +
      "SELECT n_merges, total_tokens, total_chars, " +
      "CAST(total_chars AS DOUBLE) / CAST(total_tokens AS DOUBLE) " +
      "AS chars_per_token FROM u ORDER BY n_merges"
  }

  /** BYTE-LEVEL init segmentation of `word` in DuckDB: the UTF-8 bytes
    * surface as hex pairs (`hex(encode(word))`), each pair maps through
    * the 256-entry byte->symbol MAP rendered from the SAME
    * [[Bpe.byteSymbols]] table the engine uses (shared-rendered-constant
    * rule), and the rank-sorted merge fold is the unchanged sep-bounded
    * replace() chain -- the discipline carries over byte symbols verbatim.
    */
  private[graft] lazy val bpeBytesMapSql: String = {
    def lit(s: String) = "'" + s.replace("'", "''") + "'"
    "MAP {" + (0 to 255).map { b =>
      f"'$b%02X': ${lit(graft.functions.Bpe.byteSymbols(b))}"
    }.mkString(", ") + "}"
  }

  private[graft] lazy val bpeBytesFoldedSql: String = {
    val sep = "\u001f"
    def lit(s: String) = "'" + s.replace("'", "''") + "'"
    val syms = s"[($bpeBytesMapSql)[substring(hex(encode(word)), " +
      "2 * i + 1, 2)][1] " +
      "FOR i IN range(0, CAST(len(hex(encode(word))) AS INT) // 2)]"
    // byte mode appends the out-of-band ByteEndMarker, not "</w>" (whose
    // chars are content byte symbols — the HTML-corpus decode trap)
    val init = s"(${lit(sep)} || array_to_string($syms, ${lit(sep)}) || " +
      s"${lit(sep + Bpe.ByteEndMarker + sep)})"
    bpeBytesMerges.sortBy(_.rank).foldLeft(init) { (e, m) =>
      s"replace($e, ${lit(sep + m.left + sep + m.right + sep)}, " +
        s"${lit(sep + m.left + m.right + sep)})"
    }
  }

  private[graft] lazy val bpeEncodeOracle: String =
    bpeEncodeOracleFrom(bpeFoldedSql)

  private[graft] lazy val bpeBytesEncodeOracle: String =
    bpeEncodeOracleFrom(bpeBytesFoldedSql)

  private def bpeEncodeOracleFrom(folded: String): String = {
    val sep = "\u001f"
    def lit(s: String) = "'" + s.replace("'", "''") + "'"
    s"WITH tk AS (SELECT doc_id, unnest($toksSql) AS word, " +
      s"generate_subscripts($toksSql, 1) AS ord FROM documents), " +
      "seg AS (SELECT doc_id, ord, " +
      s"string_split(trim($folded, ${lit(sep)}), ${lit(sep)}) AS subs " +
      "FROM tk WHERE word <> ''), " +
      "agg AS (SELECT doc_id, " +
      "CAST(sum(len(subs)) AS BIGINT) AS bpe_token_count, " +
      "string_agg(array_to_string(subs, ' '), ' ' ORDER BY ord) AS subwords " +
      "FROM seg GROUP BY doc_id) " +
      "SELECT d.doc_id, " +
      "CAST(COALESCE(a.bpe_token_count, 0) AS BIGINT) AS bpe_token_count, " +
      "COALESCE(a.subwords, '') AS subwords " +
      "FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id " +
      "ORDER BY d.doc_id"
  }

  /** Mixture weights + budget for q_sample_mixture: src0 gets a 30-slot
    * quota against only 25 available docs, exercising the
    * shortfall-without-redistribution arm. Quotas are apportioned ONCE here
    * and rendered into both engines (shared-rendered-constant rule).
    */
  private[graft] val mixParts = Map("src0" -> 4L, "src1" -> 2L, "src2" -> 1L, "src3" -> 1L)
  private[graft] val mixTotal = 60L
  private[graft] lazy val mixQuotaSql: String = {
    val qs = graft.functions.Sampling.apportion(mixParts, mixTotal)
    qs.toSeq.sortBy(_._1)
      .map { case (s, q) => s"WHEN '$s' THEN $q" }
      .mkString("CAST(CASE source ", " ", " ELSE 0 END AS BIGINT)")
  }

  /** Token budget + rendered per-source targets for q_sample_epoch_plan:
    * the same apportion call the operator makes, rendered once into the
    * oracle (data-independent constants — the mixQuota rule).
    */
  private[graft] val epochBudget = 40000L

  /** q_sample_epoch_plan weighs one source that does NOT exist in the
    * corpus ("srcz") so the plan's infeasible arm — a weighted source with
    * zero available tokens keeps its row with NULL epochs and
    * over_epoch_cap TRUE instead of silently losing its budget share —
    * is oracle-gated, not just spec'd.
    */
  private[graft] val epochParts = mixParts + ("srcz" -> 1L)
  private[graft] lazy val epochTargetValuesSql: String = {
    val qs = graft.functions.Sampling.apportion(epochParts, epochBudget)
    qs.toSeq.sortBy(_._1)
      .map { case (s, q) => s"('$s', CAST($q AS BIGINT))" }.mkString(", ")
  }

  /** q_sample_epoch_expand's budget — 3× the plan query's so the
    * expansion exercises MULTI-epoch repetition plus a partial final pass
    * at every SF (at the plan budget most sources fit in one pass).
    */
  private[graft] val expandBudget = 120000L

  /** The epoch-expansion replay: the plan arithmetic (rendered Hamilton
    * targets, measured availability, exact ceil-division epochs), then
    * the corpus ranked by content fingerprint within each source, each
    * row repeated `epochs` times via generate_series, and the final pass
    * cut where the running token total before the document reaches
    * last_epoch_tokens — the crossing document is kept on both engines.
    */
  private[graft] lazy val epochExpandOracle: String = {
    val qs = graft.functions.Sampling.apportion(epochParts, expandBudget)
    val values = qs.toSeq.sortBy(_._1)
      .map { case (s, q) => s"('$s', CAST($q AS BIGINT))" }.mkString(", ")
    fpCte + ", " +
      "a AS (SELECT source, " +
      s"CAST(sum(len($toksSql)) AS BIGINT) AS available_tokens " +
      "FROM documents WHERE text IS NOT NULL GROUP BY source), " +
      s"w AS (SELECT * FROM (VALUES $values) AS v(source, target_tokens)), " +
      "e AS (SELECT a.source, " +
      "CAST((w.target_tokens + a.available_tokens - 1) // a.available_tokens " +
      "AS BIGINT) AS epochs, a.available_tokens, w.target_tokens " +
      "FROM a JOIN w USING (source) " +
      "WHERE w.target_tokens > 0 AND a.available_tokens > 0), " +
      "ee AS (SELECT source, epochs, " +
      "CAST(target_tokens - (epochs - 1) * available_tokens AS BIGINT) " +
      "AS last_epoch_tokens FROM e), " +
      "tok AS (SELECT d.doc_id, d.source, " +
      s"CAST(len($toksSql) AS BIGINT) AS n_tokens, fp.fingerprint " +
      "FROM documents d JOIN fp ON d.doc_id = fp.doc_id " +
      "WHERE d.text IS NOT NULL), " +
      "rk AS (SELECT doc_id, source, n_tokens, " +
      "CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY source " +
      "ORDER BY fingerprint ASC NULLS LAST, doc_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) " +
      "AS cum_before FROM tok), " +
      // epoch replication via a bounded static series (DuckDB's binder
      // rejects both unnest-in-select referenced downstream and lateral
      // generate_series arguments): max(epochs) rows, theta-joined down
      "mx AS (SELECT max(epochs) AS m FROM ee), " +
      "series AS (SELECT unnest(generate_series(1, m)) AS epoch FROM mx), " +
      "x AS (SELECT rk.doc_id, rk.source, rk.n_tokens, rk.cum_before, " +
      "ee.epochs, ee.last_epoch_tokens, s.epoch " +
      "FROM rk JOIN ee USING (source) " +
      "JOIN series s ON s.epoch <= ee.epochs) " +
      "SELECT doc_id, source, CAST(epoch AS BIGINT) AS epoch, n_tokens " +
      "FROM x WHERE epoch < epochs OR cum_before < last_epoch_tokens " +
      "ORDER BY source, epoch, doc_id"
  }

  /** DSIR constants, rendered into BOTH the Scala queries and the oracle
    * SQL (the mixQuota shared-rendered-constant rule): target sources,
    * bucket count, selection size.
    */
  private[graft] val dsirTargetSources = Seq("src0", "src1", "src2")
  private[graft] val dsirBucketCount = 2048
  private[graft] val dsirKeepN = 200

  /** From-scratch DuckDB replay of the full DSIR chain (Sampling
    * .dsirLogRatios → dsirScore → dsirSelect): tokenize, bigram, the
    * 58-bit rolling-hash bucket fold (the fpCte hash over "w1 w2"),
    * target/raw bucket counts on a range(B) spine, the fixed-point
    * quantized log-ratio (round to the 2^20 grid — the ONLY float step;
    * everything after is exact integer arithmetic), per-doc BIGINT weight
    * sums, and the top-n keep flag via a global rank (the oracle may
    * sort; the engine uses a TakeOrdered threshold). Shared verbatim by
    * q_sample_dsir and its persisted twin — hash equality between the two
    * certifies write→read fidelity of the model tables.
    */
  private[graft] lazy val dsirOracle: String = {
    val b = dsirBucketCount
    val targets = inListSql(dsirTargetSources)
    s"WITH tk AS (SELECT doc_id, source, $toksSql AS t FROM documents " +
      s"WHERE text IS NOT NULL AND len($toksSql) >= 2), " +
      "bg AS (SELECT doc_id, source, unnest([t[i] || ' ' || t[i+1] " +
      "FOR i IN range(1, len(t))]) AS g FROM tk), " +
      "hb AS (SELECT doc_id, source, list_reduce(" +
      "list_prepend(CAST(0 AS BIGINT), " +
      "[CAST(unicode(c) AS BIGINT) FOR c IN regexp_extract_all(g, '.')]), " +
      s"(acc, x) -> (acc * 31 + x) % ${graft.functions.RollingHash.Modulus}) " +
      s"% $b AS bucket FROM bg), " +
      s"ctb AS (SELECT bucket, count(*) AS ct FROM hb " +
      s"WHERE source IN $targets GROUP BY 1), " +
      "crb AS (SELECT bucket, count(*) AS cr FROM hb GROUP BY 1), " +
      s"sp AS (SELECT unnest(range(0, $b)) AS bucket), " +
      "cnts AS (SELECT sp.bucket, COALESCE(ct, 0) AS ct, " +
      "COALESCE(cr, 0) AS cr FROM sp " +
      "LEFT JOIN ctb USING (bucket) LEFT JOIN crb USING (bucket)), " +
      "tot AS (SELECT CAST(sum(ct) AS BIGINT) AS nt, " +
      "CAST(sum(cr) AS BIGINT) AS nr FROM cnts), " +
      "lr AS (SELECT bucket, CAST(round((" +
      "ln(CAST(ct + 1 AS DOUBLE) / CAST(cr + 1 AS DOUBLE)) + " +
      s"ln(CAST(nr + $b AS DOUBLE) / CAST(nt + $b AS DOUBLE))) " +
      "* 1048576.0) AS BIGINT) AS lrq FROM cnts CROSS JOIN tot), " +
      "pd AS (SELECT hb.doc_id, count(*) AS n_feats, " +
      "CAST(sum(lrq) AS BIGINT) AS weight_q " +
      "FROM hb JOIN lr USING (bucket) GROUP BY 1), " +
      "sc AS (SELECT d.doc_id, COALESCE(n_feats, 0) AS n_feats, weight_q, " +
      "CAST(weight_q AS DOUBLE) / 1048576.0 AS log_weight " +
      "FROM documents d LEFT JOIN pd USING (doc_id)), " +
      "rk AS (SELECT *, row_number() OVER (" +
      "ORDER BY weight_q DESC NULLS LAST, doc_id) AS rn FROM sc) " +
      "SELECT doc_id, n_feats, weight_q, log_weight, " +
      s"weight_q IS NOT NULL AND rn <= $dsirKeepN AS keep " +
      "FROM rk ORDER BY doc_id"
  }

  /** From-scratch DuckDB replay of Moore–Lewis cross-entropy difference
    * selection (Sampling.crossEntropyScore → crossEntropySelect): fit
    * BOTH add-1 bigram LMs (target = the [[dsirTargetSources]] slice,
    * raw = the whole corpus, each with its own vocabulary), quantize
    * each occurrence's two log-probs to the 2^20 grid, sum the exact
    * integer differences per doc, length-normalize (two exact-int IEEE
    * divisions), and keep the top-[[dsirKeepN]] by (ce_diff desc,
    * doc_id). The oracle may rank globally; the engine thresholds.
    */
  private[graft] lazy val crossEntropyOracle: String = {
    val targets = inListSql(dsirTargetSources)
    s"WITH tk AS (SELECT doc_id, source, $toksSql AS t FROM documents " +
      "WHERE text IS NOT NULL), " +
      "x AS (SELECT doc_id, source, t, unnest(range(1, len(t))) AS i " +
      "FROM tk WHERE len(t) >= 2), " +
      "bg AS (SELECT doc_id, source, t[i] AS w1, t[i+1] AS w2 FROM x), " +
      "c12r AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY 1, 2), " +
      "c1r AS (SELECT w1, CAST(sum(c) AS BIGINT) AS cw FROM c12r " +
      "GROUP BY 1), " +
      "vr AS (SELECT count(DISTINCT term) AS v FROM " +
      "(SELECT unnest(t) AS term FROM tk)), " +
      "c12t AS (SELECT w1, w2, count(*) AS c FROM bg " +
      s"WHERE source IN $targets GROUP BY 1, 2), " +
      "c1t AS (SELECT w1, CAST(sum(c) AS BIGINT) AS cw FROM c12t " +
      "GROUP BY 1), " +
      "vt AS (SELECT count(DISTINCT term) AS v FROM " +
      s"(SELECT unnest(t) AS term FROM tk WHERE source IN $targets)), " +
      "sc AS (SELECT bg.doc_id, count(*) AS n, CAST(sum(" +
      "CAST(round(ln((COALESCE(c12t.c, 0) + 1.0) / " +
      "(COALESCE(c1t.cw, 0) + 1.0 * vt.v)) * 1048576.0) AS BIGINT) - " +
      "CAST(round(ln((COALESCE(c12r.c, 0) + 1.0) / " +
      "(COALESCE(c1r.cw, 0) + 1.0 * vr.v)) * 1048576.0) AS BIGINT)" +
      ") AS BIGINT) AS dq " +
      "FROM bg LEFT JOIN c12t USING (w1, w2) LEFT JOIN c1t USING (w1) " +
      "LEFT JOIN c12r USING (w1, w2) LEFT JOIN c1r USING (w1) " +
      "CROSS JOIN vt CROSS JOIN vr GROUP BY 1), " +
      "rk AS (SELECT d.doc_id, CAST(COALESCE(n, 0) AS BIGINT) " +
      "AS n_bigrams, dq AS diff_q, " +
      "CAST(dq AS DOUBLE) / CAST(n AS DOUBLE) / 1048576.0 AS ce_diff " +
      "FROM documents d LEFT JOIN sc USING (doc_id)), " +
      "rr AS (SELECT *, row_number() OVER (" +
      "ORDER BY ce_diff DESC NULLS LAST, doc_id) AS rn FROM rk) " +
      "SELECT doc_id, n_bigrams, diff_q, ce_diff, " +
      s"ce_diff IS NOT NULL AND rn <= $dsirKeepN AS keep " +
      "FROM rr ORDER BY doc_id"
  }

  /** DuckDB CTE `fp`: the content fingerprint of every document — an exact
    * replay of RollingHash.compute (left fold of acc*31+codepoint mod
    * 2^58-27 over the normalized text). Shared by the fingerprint query and
    * both content-keyed sampling queries.
    */
  private[graft] val fpCte: String = "WITH " + fpCtesBody

  /** [[fpCte]] without the WITH keyword, for composition into larger CTE
    * chains (the curation-pipeline oracle). The fingerprint CTE is named
    * `fp`; its normalization input CTE is `fpn`.
    */
  private[graft] lazy val fpCtesBody: String =
    "fpn AS (SELECT doc_id, " +
      "lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS norm FROM documents), " +
      "fp AS (SELECT doc_id, list_reduce(" +
      "list_prepend(CAST(0 AS BIGINT), " +
      "[CAST(unicode(c) AS BIGINT) FOR c IN regexp_extract_all(norm, '.')]), " +
      s"(acc, x) -> (acc * 31 + x) % ${graft.functions.RollingHash.Modulus}) " +
      "AS fingerprint FROM fpn)"

  /** DuckDB replay of [[graft.functions.DHash.computeText]] over the
    * fingerprint-normalized text: code points % 256 as the brightness
    * sequence, 72 evenly spaced samples into the 9×8 grid, one bit per
    * adjacent-column strict `>`, packed as a HUGEINT power-of-two sum
    * (CTE `dsig(doc_id, s)`; [[dhashSignedSql]] folds `s` to the signed
    * BIGINT the engine's Long carries). Shared by the signature and
    * banded-pairs oracles.
    */
  private[graft] lazy val dhashSigCtes: String = "WITH " + dhashSigCtesBody("documents")

  /** [[dhashSigCtes]] parameterized by the source relation (doc_id, text)
    * and without the WITH keyword, for composition after prefix CTEs.
    */
  private[graft] def dhashSigCtesBody(rel: String): String =
    "dn AS (SELECT doc_id, " +
      s"lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS norm FROM $rel), " +
      "dcp AS (SELECT doc_id, [unicode(c) % 256 FOR c IN " +
      "regexp_extract_all(norm, '.')] AS cp FROM dn WHERE length(norm) > 0), " +
      "dg AS (SELECT doc_id, [cp[(j * len(cp)) // 72 + 1] " +
      "FOR j IN range(0, 72)] AS g FROM dcp), " +
      "dsig AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS HUGEINT), " +
      "[CASE WHEN g[(k // 8) * 9 + (k % 8) + 2] > g[(k // 8) * 9 + (k % 8) + 1] " +
      "THEN CAST(power(2, k) AS HUGEINT) ELSE CAST(0 AS HUGEINT) END " +
      "FOR k IN range(0, 64)]), (acc, x) -> acc + x) AS s FROM dg)"

  /** Two's-complement fold of the `dsig.s` HUGEINT word to signed BIGINT. */
  private[graft] val dhashSignedSql: String =
    "CAST(CASE WHEN s >= CAST(power(2, 63) AS HUGEINT) " +
      "THEN s - CAST(power(2, 64) AS HUGEINT) ELSE s END AS BIGINT)"

  /** DuckDB CTE chain `toks … top2 … dup5`: the Gopher repetition signals
    * (shared by q_text_repetition and the composite filter verdict).
    */
  private[graft] val repCtes: String =
    "toks AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, " +
      s"$toksSql AS t FROM documents), " +
      "g2 AS (SELECT doc_id, n_chars, unnest([t[i] || ' ' || t[i+1] " +
      "FOR i IN range(1, len(t))]) AS g FROM toks), " +
      "c2 AS (SELECT doc_id, g, any_value(n_chars) AS n_chars, " +
      "count(*) AS c FROM g2 GROUP BY 1, 2), " +
      "top2 AS (SELECT doc_id, g AS top_2gram, " +
      "CAST(c * length(g) AS DOUBLE) / n_chars AS top_2gram_char_frac " +
      "FROM (SELECT *, row_number() OVER (PARTITION BY doc_id " +
      "ORDER BY c DESC, g) AS rn FROM c2) WHERE rn = 1), " +
      "g5 AS (SELECT doc_id, n_chars, unnest([t[i] || ' ' || t[i+1] || ' ' || " +
      "t[i+2] || ' ' || t[i+3] || ' ' || t[i+4] " +
      "FOR i IN range(1, len(t) - 3)]) AS g FROM toks), " +
      "c5 AS (SELECT doc_id, g, any_value(n_chars) AS n_chars, " +
      "count(*) AS c FROM g5 GROUP BY 1, 2), " +
      "dup5 AS (SELECT doc_id, CAST(sum((c - 1) * length(g)) AS DOUBLE) " +
      "/ any_value(n_chars) AS dup_5gram_char_frac " +
      "FROM c5 WHERE c > 1 GROUP BY doc_id)"

  /** DuckDB replay of q_text_gopher_repetition's INJECTED corpus — the
    * same three global regex passes as the Spark side: every 6th
    * token-separating space → line break, every 2nd line break →
    * paragraph break, then the two deterministic duplicate injections
    * (doc_id % 5 = 0 re-appends paragraph 1; else doc_id % 3 = 0
    * re-appends line 1 — the %5 branch wins on %15, same CASE order).
    * Patterns use RE2's \n escape; REPLACEMENT newlines are chr(10)
    * because replacement-string escape handling is engine-specific.
    */
  private[graft] val gopherInjSql: String =
    "injl AS (SELECT doc_id, regexp_replace(text, " +
      "'(\\S+ \\S+ \\S+ \\S+ \\S+ \\S+) ', '\\1' || chr(10), 'g') AS l " +
      "FROM documents WHERE text IS NOT NULL), " +
      "injp AS (SELECT doc_id, l, regexp_replace(l, " +
      "'([^\\n]+\\n[^\\n]+)\\n', '\\1' || chr(10) || chr(10), 'g') AS p " +
      "FROM injl), " +
      "inj AS (SELECT doc_id, p || CASE " +
      "WHEN doc_id % 5 = 0 THEN chr(10) || chr(10) || " +
      "regexp_extract(p, '^[^\\n]*\\n?[^\\n]*') " +
      "WHEN doc_id % 3 = 0 THEN chr(10) || chr(10) || " +
      "regexp_extract(l, '^[^\\n]*') " +
      "ELSE '' END AS text FROM injp)"

  /** DuckDB replay of [[graft.functions.TextAnalysis.gopherRepetition]]
    * over the injected corpus — the complete Rae et al. Table A1: tagged
    * line/paragraph duplicate fractions, top-{2,3,4}-gram char fractions
    * (row_number ties on gram ascending = the min_by rule), and
    * position-coverage duplicate-{5..10}-gram char fractions (DISTINCT
    * covered token positions priced by token length). Integer-exact until
    * the final double divisions.
    */
  private[graft] lazy val gopherRepOracle: String = {
    val covCols = (5 to 10).map(n =>
      s"COALESCE(covp.d$n, 0.0) AS dup_${n}gram_char_frac").mkString(", ")
    val covPiv = (5 to 10).map(n =>
      s"max(CASE WHEN n = $n THEN f END) AS d$n").mkString(", ")
    s"WITH $gopherInjSql, " +
      "base AS (SELECT doc_id, text, " +
      "CAST(length(text) AS BIGINT) AS n_chars, " +
      "regexp_split_to_array(trim(text), '\\s+') AS tk FROM inj), " +
      // lines + paragraphs, tagged
      "lu AS (" +
      "SELECT doc_id, 'L' AS tag, unnest(list_filter(" +
      "string_split(text, chr(10)), x -> length(x) > 0)) AS v FROM inj " +
      "UNION ALL SELECT doc_id, 'P' AS tag, unnest(list_filter(" +
      "regexp_split_to_array(text, '\\n{2,}'), x -> length(x) > 0)) AS v " +
      "FROM inj), " +
      "lc AS (SELECT doc_id, tag, v, count(*) AS c FROM lu GROUP BY 1,2,3), " +
      "la AS (SELECT doc_id, tag, sum(c) AS nu, sum(c - 1) AS du, " +
      "sum(c * length(v)) AS uc, sum((c - 1) * length(v)) AS duc " +
      "FROM lc GROUP BY 1, 2), " +
      "lp AS (SELECT doc_id, " +
      "max(CASE WHEN tag = 'L' AND nu > 0 " +
      "THEN CAST(du AS DOUBLE) / nu END) AS lf, " +
      "max(CASE WHEN tag = 'L' AND uc > 0 " +
      "THEN CAST(duc AS DOUBLE) / uc END) AS lcf, " +
      "max(CASE WHEN tag = 'P' AND nu > 0 " +
      "THEN CAST(du AS DOUBLE) / nu END) AS pf, " +
      "max(CASE WHEN tag = 'P' AND uc > 0 " +
      "THEN CAST(duc AS DOUBLE) / uc END) AS pcf FROM la GROUP BY 1), " +
      // all n-gram occurrences, n = 1..10, with 1-based starts
      "occ AS (SELECT doc_id, n_chars, u['n'] AS n, u['s'] AS s, " +
      "u['g'] AS g FROM (SELECT doc_id, n_chars, unnest(flatten(" +
      "[[{'n': n, 's': i, 'g': array_to_string(tk[i : i+n-1], ' ')} " +
      "FOR i IN range(1, len(tk) - n + 2)] FOR n IN range(1, 11)])) AS u " +
      "FROM base) q4), " +
      "cnt AS (SELECT doc_id, n, g, any_value(n_chars) AS n_chars, " +
      "count(*) AS c, list(s) AS starts FROM occ GROUP BY 1, 2, 3), " +
      "topp AS (SELECT doc_id, " +
      "max(CASE WHEN n = 2 THEN f END) AS t2, " +
      "max(CASE WHEN n = 3 THEN f END) AS t3, " +
      "max(CASE WHEN n = 4 THEN f END) AS t4 FROM (" +
      "SELECT doc_id, n, CAST(c * length(g) AS DOUBLE) / n_chars AS f " +
      "FROM (SELECT *, row_number() OVER (PARTITION BY doc_id, n " +
      "ORDER BY c DESC, g) AS rn FROM cnt WHERE n BETWEEN 2 AND 4) q5 " +
      "WHERE rn = 1) q6 GROUP BY doc_id), " +
      "tl AS (SELECT doc_id, unnest(starts) AS pos, " +
      "CAST(length(g) AS BIGINT) AS len FROM cnt WHERE n = 1), " +
      "tc AS (SELECT doc_id, sum(c * length(g)) AS tok_chars FROM cnt " +
      "WHERE n = 1 GROUP BY 1), " +
      "cov0 AS (SELECT DISTINCT doc_id, n, pos FROM (" +
      "SELECT doc_id, n, unnest(flatten([range(s, s + n) FOR s IN starts])) " +
      "AS pos FROM cnt WHERE n >= 5 AND c > 1) q7), " +
      "cov AS (SELECT c0.doc_id, c0.n, sum(tl.len) AS cov_chars " +
      "FROM cov0 c0 JOIN tl ON c0.doc_id = tl.doc_id AND c0.pos = tl.pos " +
      "GROUP BY 1, 2), " +
      s"covp AS (SELECT cov.doc_id, $covPiv FROM (" +
      "SELECT cov.doc_id AS doc_id, cov.n AS n, " +
      "CAST(cov_chars AS DOUBLE) / tok_chars AS f " +
      "FROM cov JOIN tc ON cov.doc_id = tc.doc_id) cov GROUP BY 1) " +
      "SELECT b.doc_id, " +
      "COALESCE(lp.lf, 0.0) AS dup_line_frac, " +
      "COALESCE(lp.lcf, 0.0) AS dup_line_char_frac, " +
      "COALESCE(lp.pf, 0.0) AS dup_para_frac, " +
      "COALESCE(lp.pcf, 0.0) AS dup_para_char_frac, " +
      "COALESCE(topp.t2, 0.0) AS top_2gram_char_frac, " +
      "COALESCE(topp.t3, 0.0) AS top_3gram_char_frac, " +
      "COALESCE(topp.t4, 0.0) AS top_4gram_char_frac, " +
      s"$covCols FROM (SELECT doc_id FROM inj) b " +
      "LEFT JOIN lp ON b.doc_id = lp.doc_id " +
      "LEFT JOIN topp ON b.doc_id = topp.doc_id " +
      "LEFT JOIN covp ON b.doc_id = covp.doc_id " +
      "ORDER BY b.doc_id"
  }

  private[graft] def inListSql(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ", ", ")")

  /** DuckDB stopword list RENDERED FROM [[TextAnalysis.DefaultStopwords]] —
    * a change to the Scala constant flows into every oracle that mentions
    * stopwords, so the two engines cannot silently diverge.
    */
  private[graft] val stopSql = inListSql(TextAnalysis.DefaultStopwords)

  /** Marker-count column list + earliest-argmax CASE, both rendered from
    * [[graft.functions.LangId.Markers]] (same no-silent-divergence rule as
    * [[stopSql]]). The CASE cascade is the earliest-argmax: branch k fires
    * only when lang_k >= every later language and all earlier branches
    * failed.
    */
  private[graft] def langMarkerColsSql(toksExpr: String): String =
    graft.functions.LangId.Markers.map { case (l, ws) =>
      s"len(list_filter($toksExpr, x -> x IN ${inListSql(ws)})) AS $l"
    }.mkString(", ")

  private[graft] val langGuessCaseSql: String = {
    val names = graft.functions.LangId.Markers.map(_._1)
    s"CASE WHEN greatest(${names.mkString(", ")}) = 0 THEN 'und' " +
      names.init.zipWithIndex.map { case (l, i) =>
        "WHEN " + names.drop(i + 1).map(r => s"$l >= $r").mkString(" AND ") +
          s" THEN '$l' "
      }.mkString + s"ELSE '${names.last}' END"
  }

  private[graft] val Bm25Terms = Seq("spark", "window", "dup")

  /** q_text_classifier_quality's exported linear model: integer micro-unit
    * (1e-6) weights over the corpus register — positive on content terms,
    * negative on filler — plus bias and the per-token keep threshold. The
    * model is CONFIGURATION (a trained classifier quantized at export), so
    * like the BPE merge table it renders as literals into BOTH engines.
    */
  private[graft] val classifierWeights: Seq[(String, Long)] = Seq(
    "spark" -> 500000L, "query" -> 400000L, "join" -> 300000L,
    "window" -> 300000L, "agg" -> 200000L, "stream" -> 200000L,
    "vector" -> 150000L, "the" -> -300000L, "a" -> -400000L,
    "slow" -> -250000L, "big" -> -100000L)
  private[graft] val classifierBias = 25000L
  private[graft] val classifierThreshold = 50000L

  /** The linear-classifier replay (weight VALUES table, postings join,
    * exact integer Σ tf·w + bias, one final division, integer threshold)
    * — shared VERBATIM by q_text_classifier_quality (the broadcast-join
    * scorer) and q_text_classifier_inline (the map-literal projection
    * scorer): one oracle, two access paths, hash equality as the proof
    * they agree.
    */
  private[graft] lazy val classifierOracle: String =
    "WITH wt AS (SELECT * FROM (VALUES " +
      classifierWeights.map { case (t, w) =>
        s"('$t', CAST($w AS BIGINT))" }.mkString(", ") +
      ") AS t(term, w)), " +
      "tk AS (SELECT doc_id, unnest(" + toksSql + ") AS term " +
      "FROM documents), " +
      "hit AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS hit " +
      "FROM tk JOIN wt USING (term) GROUP BY 1), " +
      "base AS (SELECT doc_id, CAST(COALESCE(len(" + toksSql + "), 0) " +
      "AS BIGINT) AS n_tokens FROM documents) " +
      "SELECT b.doc_id, b.n_tokens, " +
      s"CAST(COALESCE(h.hit, 0) + $classifierBias AS BIGINT) AS score_num, " +
      "CASE WHEN b.n_tokens = 0 THEN NULL " +
      s"ELSE CAST(COALESCE(h.hit, 0) + $classifierBias AS DOUBLE) / " +
      "(CAST(b.n_tokens AS DOUBLE) * 1000000.0) END AS score, " +
      "CASE WHEN b.n_tokens = 0 THEN FALSE " +
      s"ELSE COALESCE(h.hit, 0) + $classifierBias >= " +
      s"$classifierThreshold * b.n_tokens END AS keep " +
      "FROM base b LEFT JOIN hit h USING (doc_id) ORDER BY b.doc_id"

  /** DuckDB replay of q_quality_signal_agreement: the three
    * individually-gated signal fragments (quality formula, linear
    * classifier, bigram LM) composed into one universe, the
    * deterministic LCG sample, three rank windows over the ≤1024-row
    * sample, and the exact-integer Spearman arithmetic — one arm per
    * signal pair in the Spark side's combinations order.
    */
  private[graft] lazy val signalAgreementOracle: String = {
    val lcg = "((doc_id % 2147483647) * 1103515245 + 12345) % 2147483647"
    def arm(a: String, b: String) =
      s"SELECT '${a}_vs_$b' AS pair, CAST(count(*) AS BIGINT) AS n_docs, " +
        s"CAST(sum((r_$a - r_$b) * (r_$a - r_$b)) AS BIGINT) AS sum_d2, " +
        "CASE WHEN count(*) > 1 THEN 1.0 - " +
        s"6.0 * CAST(sum((r_$a - r_$b) * (r_$a - r_$b)) AS DOUBLE) / " +
        "CAST(count(*) * (count(*) * count(*) - 1) AS DOUBLE) END " +
        "AS spearman_rho FROM r"
    s"WITH ${bigramLmCtes.stripPrefix("WITH ")}, " +
      s"q AS (SELECT doc_id, $qualityScoreSql AS s_quality " +
      "FROM documents WHERE text IS NOT NULL), " +
      "wt AS (SELECT * FROM (VALUES " +
      classifierWeights.map { case (t, w) =>
        s"('$t', CAST($w AS BIGINT))" }.mkString(", ") +
      ") AS t(term, w)), " +
      "tk2 AS (SELECT doc_id, unnest(" + toksSql + ") AS term " +
      "FROM documents), " +
      "hit2 AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS hit " +
      "FROM tk2 JOIN wt USING (term) GROUP BY 1), " +
      "cbase AS (SELECT doc_id, CAST(COALESCE(len(" + toksSql + "), 0) " +
      "AS BIGINT) AS n_tokens FROM documents), " +
      "c AS (SELECT b.doc_id, CASE WHEN b.n_tokens = 0 THEN NULL " +
      s"ELSE CAST(COALESCE(h.hit, 0) + $classifierBias AS DOUBLE) / " +
      "(CAST(b.n_tokens AS DOUBLE) * 1000000.0) END AS s_classifier " +
      "FROM cbase b LEFT JOIN hit2 h USING (doc_id)), " +
      "b2 AS (SELECT doc_id, s / CAST(n AS DOUBLE) AS s_bigram FROM sc), " +
      "j AS (SELECT q.doc_id AS doc_id, s_quality, s_classifier, s_bigram " +
      "FROM q JOIN c ON q.doc_id = c.doc_id " +
      "JOIN b2 ON q.doc_id = b2.doc_id " +
      "WHERE s_classifier IS NOT NULL), " +
      s"smp AS (SELECT * FROM j ORDER BY $lcg, doc_id LIMIT 1024), " +
      "r AS (SELECT doc_id, " +
      "CAST(row_number() OVER (ORDER BY s_quality, doc_id) AS BIGINT) " +
      "AS r_quality, " +
      "CAST(row_number() OVER (ORDER BY s_classifier, doc_id) AS BIGINT) " +
      "AS r_classifier, " +
      "CAST(row_number() OVER (ORDER BY s_bigram, doc_id) AS BIGINT) " +
      "AS r_bigram FROM smp) " +
      arm("quality", "classifier") + " UNION ALL " +
      arm("quality", "bigram") + " UNION ALL " +
      arm("classifier", "bigram") + " ORDER BY pair"
  }

  /** Blocklist phrase set for q_text_blocklist — multi-word phrases so the
    * Aho-Corasick automaton's cross-token matching is exercised, plus one
    * phrase absent from the corpus vocabulary (the never-hit arm). Rendered
    * from THIS constant into both the Spark expression and the DuckDB
    * per-pattern `instr` replay (shared-constant rule).
    */
  private[graft] val BlockPatterns = Seq(
    "slow scan", "big table", "merge batch", "drop database", "vector")
  private[graft] def blockHitSql(p: String) = s"instr(text, '$p') > 0"

  /** Mixed-case phrase set for q_text_blocklist_ci — real blocklists are
    * authored in arbitrary case ("Drop Database") and must still flag the
    * lowercase corpus; matching normalizes NFC + lowercase on BOTH sides.
    * `ciFold` is the Scala rendering of the engine's fold; the oracle
    * replays it as `lower(nfc_normalize(...))` over text while patterns
    * fold at SQL-build time from the SAME constant (shared-constant rule).
    */
  private[graft] val BlockPatternsCi = Seq(
    "Slow Scan", "BIG TABLE", "Merge Batch", "DROP Database", "Vector")
  private[graft] def ciFold(s: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      .toLowerCase(java.util.Locale.ROOT)
  private[graft] def blockHitCiSql(p: String) =
    s"instr(lower(nfc_normalize(text)), '${ciFold(p)}') > 0"

  /** DuckDB replay of [[graft.functions.TextAnalysis.filterVerdict]] at its
    * default thresholds: every signal re-rendered from its already-oracled
    * fragment (quality from q_text_stats, lang-id from q_text_langid,
    * repetition from [[repCtes]]), then the same fixed-order concat_ws of
    * CASE reasons. concat_ws skips NULLs identically in both engines.
    */
  private[graft] val filterVerdictOracle: String =
    s"WITH $verdictCtes " +
      "SELECT doc_id, token_count, quality_score, reasons = '' AS keep, " +
      "reasons FROM v ORDER BY doc_id"

  /** DuckDB replay of [[graft.functions.Curate.curate]] — all five stages
    * (filter verdict, exact dedup by fingerprint, domain cap, hash split,
    * shard-local packing) composed from their individually-gated fragments
    * into one manifest query.
    */
  private[graft] lazy val curateOracle: String =
    s"WITH $verdictCtes, $fpCtesBody, " +
      "kept AS (SELECT d.doc_id, d.source, v.token_count, f.fingerprint " +
      "FROM documents d JOIN v ON d.doc_id = v.doc_id " +
      "JOIN fp f ON d.doc_id = f.doc_id WHERE v.reasons = ''), " +
      "dd AS (SELECT doc_id, source, token_count, fingerprint FROM " +
      "(SELECT *, row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) " +
      "AS rn FROM kept) WHERE rn = 1), " +
      "cap AS (SELECT doc_id, source, token_count, fingerprint FROM " +
      "(SELECT *, row_number() OVER (PARTITION BY source " +
      "ORDER BY fingerprint ASC NULLS LAST, doc_id) AS drank FROM dd) " +
      "WHERE drank <= 15), " +
      "sp AS (SELECT doc_id, source, token_count, " +
      "CASE WHEN fingerprint % 100 < 95 THEN 'train' " +
      "WHEN fingerprint % 100 < 98 THEN 'val' ELSE 'test' END AS split FROM cap), " +
      "tr AS (SELECT doc_id, token_count, doc_id % 8 AS shard FROM sp " +
      "WHERE split = 'train'), " +
      "cum AS (SELECT doc_id, COALESCE(sum(token_count) OVER (PARTITION BY shard " +
      "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) " +
      "AS cum FROM tr), " +
      "pk AS (SELECT doc_id, CAST(floor(cum / 512.0) AS BIGINT) AS pack_id, " +
      // DuckDB window SUM(BIGINT) returns HUGEINT and % keeps it; Spark emits
      // int64 — cast so the driver's hasher sees the same physical type.
      "CAST(cum % 512 AS BIGINT) AS pack_offset FROM cum) " +
      "SELECT s.doc_id, s.source, s.token_count, s.split, pk.pack_id, " +
      "pk.pack_offset FROM sp s LEFT JOIN pk ON s.doc_id = pk.doc_id " +
      "ORDER BY s.doc_id"

  /** CTE chain ending in `v(doc_id, token_count, quality_score, reasons)` —
    * the verdict body shared by q_text_filter_verdict and the end-to-end
    * curation pipeline oracle.
    */
  private[graft] lazy val verdictCtes: String = {
    val mwl = "(CAST(s.wc AS DOUBLE) / CAST(greatest(s.token_count, 1) AS DOUBLE))"
    s"$repCtes, " +
      "sig AS (SELECT doc_id, lang, text IS NULL AS nulltext, " +
      s"CAST(len($toksSql) AS BIGINT) AS token_count, " +
      s"CAST(COALESCE(list_sum([CAST(length(x) AS BIGINT) FOR x IN $toksSql]), 0) " +
      "AS BIGINT) AS wc, " +
      s"len(list_filter($toksSql, x -> x IN $stopSql)) AS swc, " +
      s"0.5 * least(CAST(len($toksSql) AS DOUBLE) / 100.0, 1.0) " +
      "+ 0.3 * (1.0 - CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) " +
      "/ CAST(greatest(length(text), 1) AS DOUBLE)) " +
      s"+ 0.2 * (CAST(len(list_filter($toksSql, x -> x IN $stopSql)) AS DOUBLE) " +
      s"/ greatest(CAST(len($toksSql) AS DOUBLE), 1.0)) AS quality_score, " +
      langMarkerColsSql(toksSql) + " FROM documents), " +
      s"lg AS (SELECT doc_id, $langGuessCaseSql AS lang_guess FROM sig), " +
      "v AS (SELECT s.doc_id, s.token_count, s.quality_score, " +
      "CASE WHEN s.nulltext THEN 'null_text' ELSE concat_ws(','" +
      ", CASE WHEN lg.lang_guess <> s.lang THEN 'lang_mismatch' END" +
      ", CASE WHEN s.quality_score < 0.4 THEN 'low_quality' END" +
      ", CASE WHEN s.swc < 2 THEN 'no_stopwords' END" +
      ", CASE WHEN COALESCE(t2.top_2gram_char_frac, 0.0) > 0.2 THEN 'rep_2gram' END" +
      ", CASE WHEN COALESCE(d5.dup_5gram_char_frac, 0.0) > 0.15 THEN 'rep_5gram' END" +
      ", CASE WHEN s.token_count > 100000 THEN 'too_long' END" +
      ", CASE WHEN s.token_count < 30 THEN 'too_short' END" +
      s", CASE WHEN $mwl < 3.0 OR $mwl > 10.0 THEN 'word_length' END" +
      ") END AS reasons FROM sig s JOIN lg USING (doc_id) " +
      "LEFT JOIN top2 t2 USING (doc_id) LEFT JOIN dup5 d5 USING (doc_id))"
  }

  /** DuckDB replay of [[graft.functions.TextAnalysis.bm25Search]]: same
    * postings/df/global-stats pipeline, same rational idf, contributions
    * folded in term-asc order; double constants (`k1`, `b`, `k1+1`, `1-b`)
    * are rendered from the SAME Scala values both engines consume.
    */
  /** The BM25 CTE chain (ends at `r`: doc_id, n_matched, score, rank) —
    * shared by [[bm25Oracle]] and the hybrid-rerank oracle's stage 1.
    */
  private[graft] def bm25Ctes(terms: Seq[String], k1: Double, b: Double): String = {
    val inList = terms.map(t => s"'$t'").mkString(", ")
    val avg = "(CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    s"d AS (SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS dl, " +
      s"$toksSql AS t FROM documents), " +
      "st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM d), " +
      "p AS (SELECT doc_id, dl, term, count(*) AS tf FROM " +
      "(SELECT doc_id, dl, unnest(t) AS term FROM d) " +
      s"WHERE term IN ($inList) GROUP BY doc_id, dl, term), " +
      "f AS (SELECT term, count(*) AS df FROM p GROUP BY term), " +
      "c AS (SELECT doc_id, term, " +
      "((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) " +
      s"* (CAST(tf AS DOUBLE) * ${k1 + 1.0}) " +
      s"/ (CAST(tf AS DOUBLE) + $k1 * (${1.0 - b} + $b * CAST(dl AS DOUBLE) / $avg)) " +
      "AS c FROM p CROSS JOIN st JOIN f USING (term)), " +
      "s AS (SELECT doc_id, count(*) AS n_matched, " +
      "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(c ORDER BY term)), " +
      "(acc, x) -> acc + x) AS score FROM c GROUP BY doc_id), " +
      "r AS (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM s)"
  }

  private[graft] def bm25Oracle(terms: Seq[String], k: Int, k1: Double, b: Double): String =
    s"WITH ${bm25Ctes(terms, k1, b)} " +
      s"SELECT doc_id, n_matched, score, CAST(rank AS INT) AS rank FROM r " +
      s"WHERE rank <= $k ORDER BY rank"

  /** DuckDB rendering of the exact n-gram Jaccard pair set at threshold 0.5
    * (shared: q_dedup_ngram_jaccard computes it directly; the MinHash+LSH
    * variant verifies every candidate against exact Jaccard, and PipelineSpec
    * pins its banding recall to 100% on corpora of this shape, so the SAME
    * oracle checks q_dedup_minhash_lsh).
    */
  /** Exact batch-vs-seen Jaccard at threshold 0.5 over the doc_id % 7
    * split — the shared oracle of the cross-corpus near-dup family: the
    * live recompute (q_dedup_incremental_ngram), the persisted MinHash
    * index screen (q_dedup_minhash_indexed), and the upsert-grown index
    * (q_dedup_minhash_upsert) must all return exactly this pair set.
    */
  private[graft] val crossNgramOracle: String =
    "WITH toks AS (SELECT doc_id, " + toksSql + " AS t FROM documents), " +
      "ngrams AS (SELECT doc_id, list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] " +
      "FOR i IN range(1, len(t) - 1)]) AS ng FROM toks WHERE len(t) >= 3), " +
      "pa AS (SELECT doc_id, unnest(ng) AS g, len(ng) AS n FROM ngrams " +
      "WHERE doc_id % 7 = 0), " +
      "pb AS (SELECT doc_id, unnest(ng) AS g, len(ng) AS n FROM ngrams " +
      "WHERE doc_id % 7 <> 0), " +
      "pairs AS (SELECT pa.doc_id AS batch_doc, pb.doc_id AS seen_doc, " +
      "count(*) AS common, any_value(pa.n) AS na, any_value(pb.n) AS nb " +
      "FROM pa JOIN pb ON pa.g = pb.g GROUP BY 1, 2) " +
      "SELECT batch_doc, seen_doc, " +
      "CAST(common AS DOUBLE) / (na + nb - common) AS jaccard FROM pairs " +
      "WHERE CAST(common AS DOUBLE) / (na + nb - common) >= 0.5 " +
      "ORDER BY batch_doc, seen_doc"

  /** Composed oracle for q_takedown_everywhere: ONE takedown batch must
    * leave BOTH artifact families answering their plain-corpus oracles —
    * the bm25 ranking and the cross-corpus Jaccard screen union into one
    * aligned relation (family, a, b, n, x), each leg the EXISTING mirror
    * oracle verbatim as a subquery.
    */
  private[graft] lazy val takedownOracle: String =
    "SELECT family, a, b, n, x FROM (" +
      "SELECT 'bm25' AS family, t.doc_id AS a, CAST(t.rank AS BIGINT) AS b, " +
      "t.n_matched AS n, t.score AS x FROM (" +
      bm25Oracle(Bm25Terms, 15, 1.2, 0.75) + ") t " +
      "UNION ALL " +
      "SELECT 'minhash' AS family, u.batch_doc AS a, u.seen_doc AS b, " +
      "CAST(NULL AS BIGINT) AS n, u.jaccard AS x FROM (" +
      crossNgramOracle + ") u" +
      ") q ORDER BY family, a, b"

  private[graft] val ngramJaccardOracle: String =
    "WITH toks AS (SELECT doc_id, " + toksSql + " AS t FROM documents), " +
      "ngrams AS (SELECT doc_id, list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] " +
      "FOR i IN range(1, len(t) - 1)]) AS ng FROM toks WHERE len(t) >= 3), " +
      "posting AS (SELECT doc_id, unnest(ng) AS g, len(ng) AS n FROM ngrams), " +
      "pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common, " +
      "any_value(a.n) AS na, any_value(b.n) AS nb FROM posting a " +
      "JOIN posting b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2) " +
      "SELECT doc_a, doc_b, CAST(common AS DOUBLE) / (na + nb - common) AS jaccard " +
      "FROM pairs WHERE CAST(common AS DOUBLE) / (na + nb - common) >= 0.5 " +
      "ORDER BY doc_a, doc_b"

  /** Shared recursive-CTE transitive-closure prefix over the n-gram
    * Jaccard pair set: CTEs through `wc(doc_id, cluster_id)` — every
    * corpus document with its connected-component label (its own id when
    * unpaired). The front half of the leakage-safe-split and cluster-size
    * oracles, shared verbatim by the from-scratch and the
    * persisted-cluster-table (_indexed) variants so hash equality
    * certifies write→read fidelity of [[graft.functions.Dedup.writeClusterTable]].
    */
  private[graft] lazy val clusterAssignCtes: String =
    "WITH RECURSIVE p AS (SELECT doc_a, doc_b FROM " +
      s"($ngramJaccardOracle)), " +
      "e AS (SELECT doc_a AS src, doc_b AS dst FROM p " +
      "UNION SELECT doc_b, doc_a FROM p), " +
      "reach AS (SELECT src, dst FROM e " +
      "UNION SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src), " +
      "comp AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id " +
      "FROM reach GROUP BY src), " +
      "wc AS (SELECT d.doc_id, COALESCE(comp.cluster_id, d.doc_id) " +
      "AS cluster_id FROM documents d LEFT JOIN comp USING (doc_id))"

  /** The leakage-safe split replay: components via [[clusterAssignCtes]],
    * then the representative id's string rendering through the same
    * rolling-hash bucket machinery as q_split_assign.
    */
  private[graft] lazy val leakageSafeOracle: String =
    clusterAssignCtes + ", " +
      "fp AS (SELECT doc_id, cluster_id, list_reduce(" +
      "list_prepend(CAST(0 AS BIGINT), " +
      "[CAST(unicode(c) AS BIGINT) FOR c IN regexp_extract_all(" +
      "lower(regexp_replace(trim(CAST(cluster_id AS VARCHAR)), " +
      "'\\s+', ' ', 'g')), '.')]), " +
      s"(acc, x) -> (acc * 31 + x) % ${graft.functions.RollingHash.Modulus}) " +
      "AS f FROM wc) " +
      "SELECT doc_id, cluster_id, f % 100 AS bucket, " +
      "CASE WHEN f % 100 < 95 THEN 'train' " +
      "WHEN f % 100 < 98 THEN 'val' ELSE 'test' END AS split " +
      "FROM fp ORDER BY doc_id"

  /** The cluster-size-histogram replay over the same component CTEs. */
  private[graft] lazy val clusterSizesOracle: String =
    clusterAssignCtes + ", " +
      "sz AS (SELECT cluster_id, count(*) AS sz FROM wc GROUP BY 1) " +
      "SELECT sz AS cluster_size, count(*) AS n_clusters FROM sz " +
      "GROUP BY 1 ORDER BY 1"

  /** The leakage-audit replay: BOTH split strategies derive from the same
    * component CTEs — the content split hashes each doc's own text
    * (q_split_assign's fp chain), the cluster split hashes the
    * representative id (q_split_leakage_safe's kfp chain) — and the pair
    * set `p` is classified under each. The cluster arm aggregating to
    * zero cross-split rows is the leakage-safety THEOREM showing up as a
    * hash-gated count distribution.
    */
  private[graft] lazy val leakageAuditOracle: String =
    clusterAssignCtes + ", " + fpCtesBody + ", " +
      "csplit AS (SELECT doc_id, CASE WHEN fingerprint % 100 < 95 THEN 'train' " +
      "WHEN fingerprint % 100 < 98 THEN 'val' ELSE 'test' END AS split FROM fp), " +
      "kfp AS (SELECT doc_id, list_reduce(" +
      "list_prepend(CAST(0 AS BIGINT), " +
      "[CAST(unicode(c) AS BIGINT) FOR c IN regexp_extract_all(" +
      "lower(regexp_replace(trim(CAST(cluster_id AS VARCHAR)), " +
      "'\\s+', ' ', 'g')), '.')]), " +
      s"(acc, x) -> (acc * 31 + x) % ${graft.functions.RollingHash.Modulus}) " +
      "AS f FROM wc), " +
      "ksplit AS (SELECT doc_id, CASE WHEN f % 100 < 95 THEN 'train' " +
      "WHEN f % 100 < 98 THEN 'val' ELSE 'test' END AS split FROM kfp), " +
      "au AS (" +
      "SELECT 'content' AS method, least(a.split, b.split) AS split_lo, " +
      "greatest(a.split, b.split) AS split_hi FROM p " +
      "JOIN csplit a ON p.doc_a = a.doc_id JOIN csplit b ON p.doc_b = b.doc_id " +
      "UNION ALL " +
      "SELECT 'cluster', least(a.split, b.split), greatest(a.split, b.split) " +
      "FROM p JOIN ksplit a ON p.doc_a = a.doc_id " +
      "JOIN ksplit b ON p.doc_b = b.doc_id) " +
      "SELECT method, split_lo, split_hi, CAST(count(*) AS BIGINT) AS n_pairs, " +
      "split_lo <> split_hi AS leaking FROM au GROUP BY 1, 2, 3 " +
      "ORDER BY method, split_lo, split_hi"

  /** The bloom-screen replay: the k=4 probe positions are plain int64
    * arithmetic on the shared fingerprint (no wraparound — exactly why
    * the operator derives them that way), the filter is one bit_or per
    * 32-bit word, the screen min-folds the per-position bit tests, and
    * the exact text-equality truth joins in so the no-false-negative
    * invariant is hash-certified.
    */
  private[graft] lazy val bloomScreenOracle: String = {
    val bits = 65536
    val arms = (0 until 4).map { i =>
      s"SELECT doc_id, (fingerprint * ${2 * i + 1} + " +
        s"${i * 0x9E3779B9L}) % $bits AS idx FROM fpx"
    }
    // one filter/screen/truth chain per mode: 'd' = disjoint seen
    // (doc_id%7≠0), 'o' = overlap seen (every doc)
    def chain(sfx: String, seenWhere: String): String =
      s"bloom$sfx AS (SELECT idx // 32 AS word_idx, " +
        "bit_or(CAST(1 AS BIGINT) << CAST(idx % 32 AS INT)) AS mask " +
        s"FROM pos WHERE $seenWhere GROUP BY 1), " +
        s"hits$sfx AS (SELECT bp.doc_id, " +
        "(COALESCE(b.mask, 0) & bp.bit) = bp.bit AS hit " +
        s"FROM bp LEFT JOIN bloom$sfx b USING (word_idx)), " +
        s"scr$sfx AS (SELECT doc_id, min(hit) AS maybe_seen " +
        s"FROM hits$sfx GROUP BY 1), " +
        s"tr$sfx AS (SELECT d.doc_id, EXISTS (SELECT 1 FROM documents s " +
        s"WHERE ${seenWhere.replace("doc_id", "s.doc_id")} " +
        "AND s.text = d.text) AS actually_seen " +
        "FROM documents d WHERE d.doc_id % 7 = 0 AND d.text IS NOT NULL)"
    def finalSel(sfx: String, mode: String): String =
      s"SELECT '$mode' AS mode, scr$sfx.doc_id, scr$sfx.maybe_seen, " +
        s"tr$sfx.actually_seen, scr$sfx.maybe_seen AND NOT " +
        s"tr$sfx.actually_seen AS false_positive " +
        s"FROM scr$sfx JOIN tr$sfx USING (doc_id)"
    fpCte + ", " +
      "fpx AS (SELECT doc_id, fingerprint FROM fp " +
      "WHERE fingerprint IS NOT NULL), " +
      s"pos AS (${arms.mkString(" UNION ALL ")}), " +
      "bp AS (SELECT doc_id, idx // 32 AS word_idx, " +
      "CAST(1 AS BIGINT) << CAST(idx % 32 AS INT) AS bit " +
      "FROM pos WHERE doc_id % 7 = 0), " +
      chain("d", "doc_id % 7 <> 0") + ", " +
      chain("o", "doc_id >= 0") + " " +
      finalSel("d", "disjoint") + " UNION ALL " + finalSel("o", "overlap") +
      " ORDER BY mode, doc_id"
  }

  /** The cluster-best replay: components, score attach, one pick window —
    * the exactBest discipline lifted to near-dup components.
    */
  private[graft] lazy val clusterBestOracle: String =
    clusterAssignCtes + ", " +
      "sc AS (SELECT d.doc_id, wc.cluster_id, CAST(d.n_chars AS BIGINT) " +
      "AS score FROM documents d JOIN wc ON d.doc_id = wc.doc_id), " +
      "r AS (SELECT *, row_number() OVER (PARTITION BY cluster_id " +
      "ORDER BY score DESC, doc_id) AS pick, " +
      "CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) " +
      "AS cluster_size FROM sc) " +
      "SELECT doc_id, cluster_id, score, cluster_size, pick = 1 AS keep " +
      "FROM r ORDER BY doc_id"

  /** DuckDB CTE chain `e, n, nv`: L2-normalized double embeddings with the
    * exact fold-left accumulation order of the fused [[graft.functions.VectorOps]]
    * dot loop (list_reduce is a left fold), so norms — and every downstream
    * cosine — are bit-identical doubles on both engines.
    */
  private[graft] val normEmbCte: String =
    "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      "n AS (SELECT vec_id, v, sqrt(" + foldSumSql("[x * x FOR x IN v]") +
      ") AS nrm FROM e), " +
      "nv AS (SELECT vec_id, [x / nrm FOR x IN v] AS v FROM n WHERE nrm > 0)"

  /** Left-fold double sum of a DuckDB list expression — the engine-portable
    * rendering of a sequential `acc += x` loop.
    */
  private[graft] def foldSumSql(listExpr: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), $listExpr), (acc, x) -> acc + x)"

  /** Left-fold dot product of two DuckDB double-list expressions. */
  private[graft] def dotSql(a: String, b: String): String =
    foldSumSql(s"[$a[i] * $b[i] FOR i IN range(1, len($b) + 1)]")

  /** DuckDB replay of the whole spherical-k-means fit + corpus assignment
    * (CTEs through `cass(vec_id, v, bucket)`) — the shared front half of the
    * trained-IVF and SemDeDup oracles. Mirrors the Scala training loop step
    * for step: sample = `sampleSize` vec_ids in id-mix order (the shared
    * [[graft.functions.Similarity.sampleHashSql]] de-biasing permutation;
    * `sampleWhere` optionally restricts the training corpus, e.g. the
    * upsert query's frozen-quantizer initial slice); init = lowest-id
    * `centroids` of those; per round, assign by best fold-left dot (ties →
    * lowest cid) then remean (members folded in vec_id order) and
    * L2-renormalize, empty/zero-norm cells keeping the previous centroid;
    * finally assign the corpus.
    */
  private[graft] def ivfFitCte(dim: Int, sampleSize: Int, centroids: Int,
      iters: Int, sampleWhere: String = ""): String = {
    val meanElem = foldSumSql("list_transform(vs, x -> x[i])")
    val rounds = (1 to iters).map { it =>
      s"a$it AS (SELECT vec_id, v, cid FROM (" +
        "SELECT s.vec_id, s.v, c.cid, row_number() OVER (PARTITION BY s.vec_id " +
        s"ORDER BY ${dotSql("s.v", "c.cv")} DESC, c.cid) AS rn " +
        s"FROM samp s CROSS JOIN c${it - 1} c) WHERE rn = 1), " +
        s"g$it AS (SELECT cid, list(v ORDER BY vec_id) AS vs FROM a$it GROUP BY cid), " +
        s"m$it AS (SELECT cid, mv, sqrt(${foldSumSql("[x * x FOR x IN mv]")}) AS nrm " +
        s"FROM (SELECT cid, [$meanElem / len(vs) FOR i IN range(1, ${dim + 1})] AS mv " +
        s"FROM g$it)), " +
        s"c$it AS (SELECT p.cid, CASE WHEN m.cid IS NULL OR m.nrm <= 0 THEN p.cv " +
        "ELSE [x / m.nrm FOR x IN m.mv] END AS cv " +
        s"FROM c${it - 1} p LEFT JOIN m$it m ON p.cid = m.cid)"
    }.mkString(", ")
    s"WITH $normEmbCte, " +
      s"samp AS (SELECT vec_id, v FROM nv $sampleWhere " +
      s"ORDER BY ${graft.functions.Similarity.sampleHashSql("vec_id")}, vec_id " +
      s"LIMIT $sampleSize), " +
      "c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv " +
      s"FROM (SELECT vec_id, v FROM samp ORDER BY vec_id LIMIT $centroids)), " +
      s"$rounds, " +
      "cass AS (SELECT vec_id, v, cid AS bucket FROM (" +
      "SELECT nv.vec_id, nv.v, c.cid, row_number() OVER (PARTITION BY nv.vec_id " +
      s"ORDER BY ${dotSql("nv.v", "c.cv")} DESC, c.cid) AS rn " +
      s"FROM nv CROSS JOIN c$iters c) WHERE rn = 1)"
  }

  private[graft] def ivfTrainedScoredCtes(dim: Int, sampleSize: Int, centroids: Int,
      iters: Int, nprobe: Int, sampleWhere: String = "",
      queryWhere: String = "WHERE vec_id % 100 = 0"): String =
    ivfFitCte(dim, sampleSize, centroids, iters, sampleWhere) + ", " +
      s"q0 AS (SELECT vec_id AS query_id, v AS qv FROM nv $queryWhere), " +
      "qp AS (SELECT query_id, qv, cid AS bucket FROM (" +
      "SELECT q.query_id, q.qv, c.cid, row_number() OVER (PARTITION BY q.query_id " +
      s"ORDER BY ${dotSql("q.qv", "c.cv")} DESC, c.cid) AS rn " +
      s"FROM q0 q CROSS JOIN c$iters c) WHERE rn <= $nprobe), " +
      "sc AS (SELECT query_id, cass.vec_id AS neighbor_id, " +
      s"${dotSql("qp.qv", "cass.v")} AS score " +
      "FROM cass JOIN qp USING (bucket) WHERE cass.vec_id <> qp.query_id)"

  private[graft] def ivfTrainedOracle(dim: Int, sampleSize: Int, centroids: Int,
      iters: Int, nprobe: Int, topk: Int, sampleWhere: String = ""): String =
    ivfTrainedScoredCtes(dim, sampleSize, centroids, iters, nprobe,
      sampleWhere) + ", " + topKSql("sc", topk)

  /** DuckDB replay of the TWO-LEVEL knn graph
    * ([[graft.functions.Similarity.superQuantizer]] +
    * `assignTwoLevel`/`withProbeCells` at `twoLevelThreshold`+ cells):
    * the flat k-means fit CTEs are reused verbatim, then the super fit
    * runs the SAME spherical-Lloyd replay OVER THE CENTROID ROWS (init =
    * first ⌈√cells⌋ centroids by cid, 2 rounds, dot-desc/sid-asc ties,
    * cid-ordered mean folds, empty/zero-norm keep previous), empty
    * supers drop via the final-assignment DISTINCT, the probe-super
    * count replays the worst-case-coverage rule (smallest p whose
    * ascending child-size cumsum ≥ nprobe, +1 margin, capped at the
    * kept-super count), and both the member assignment and the probe
    * selection rank ONLY the chosen supers' children. One drifted double
    * anywhere — a super mean, a kept-set membership, a probe count —
    * moves an edge and fails the hash.
    */
  private[graft] def twoLevelGraphOracle(dim: Int, sampleSize: Int,
      centroids: Int, iters: Int, nprobe: Int, topk: Int): String = {
    val s0 = math.max(2, math.round(math.sqrt(centroids.toDouble)).toInt)
    val meanElem = foldSumSql("list_transform(vs, x -> x[i])")
    val srounds = (1 to 2).map { it =>
      s"sa$it AS (SELECT cid, cv, sid FROM (" +
        "SELECT c.cid, c.cv, s.sid, row_number() OVER (PARTITION BY c.cid " +
        s"ORDER BY ${dotSql("c.cv", "s.sv")} DESC, s.sid) AS rn " +
        s"FROM c$iters c CROSS JOIN su${it - 1} s) WHERE rn = 1), " +
        s"sg$it AS (SELECT sid, list(cv ORDER BY cid) AS vs " +
        s"FROM sa$it GROUP BY sid), " +
        s"sm$it AS (SELECT sid, mv, " +
        s"sqrt(${foldSumSql("[x * x FOR x IN mv]")}) AS nrm " +
        s"FROM (SELECT sid, [$meanElem / len(vs) " +
        s"FOR i IN range(1, ${dim + 1})] AS mv FROM sg$it)), " +
        s"su$it AS (SELECT p.sid, " +
        "CASE WHEN m.sid IS NULL OR m.nrm <= 0 THEN p.sv " +
        "ELSE [x / m.nrm FOR x IN m.mv] END AS sv " +
        s"FROM su${it - 1} p LEFT JOIN sm$it m ON p.sid = m.sid)"
    }.mkString(", ")
    ivfFitCte(dim, sampleSize, centroids, iters) + ", " +
      s"su0 AS (SELECT cid AS sid, cv AS sv FROM c$iters WHERE cid < $s0), " +
      srounds + ", " +
      "sfin AS (SELECT cid, sid FROM (SELECT c.cid, s.sid, " +
      "row_number() OVER (PARTITION BY c.cid " +
      s"ORDER BY ${dotSql("c.cv", "s.sv")} DESC, s.sid) AS rn " +
      s"FROM c$iters c CROSS JOIN su2 s) WHERE rn = 1), " +
      "sk AS (SELECT s.sid, s.sv FROM su2 s " +
      "JOIN (SELECT DISTINCT sid FROM sfin) k ON s.sid = k.sid), " +
      "ssz AS (SELECT sid, count(*) AS sz FROM sfin GROUP BY sid), " +
      "spn AS (SELECT least((SELECT count(*) FROM sk), COALESCE((" +
      "SELECT min(k) FROM (SELECT row_number() OVER (ORDER BY sz, sid) AS k, " +
      "sum(sz) OVER (ORDER BY sz, sid " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum " +
      s"FROM ssz) q0 WHERE cum >= $nprobe), " +
      "(SELECT count(*) FROM ssz)) + 1) AS pp), " +
      "vsup AS (SELECT vec_id, v, sid FROM (SELECT nv.vec_id, nv.v, s.sid, " +
      "row_number() OVER (PARTITION BY nv.vec_id " +
      s"ORDER BY ${dotSql("nv.v", "s.sv")} DESC, s.sid) AS rn " +
      "FROM nv CROSS JOIN sk s) q1 WHERE rn = 1), " +
      "cass2 AS (SELECT vec_id, v, bucket FROM (" +
      "SELECT vs.vec_id, vs.v, f.cid AS bucket, " +
      "row_number() OVER (PARTITION BY vs.vec_id " +
      s"ORDER BY ${dotSql("vs.v", "c.cv")} DESC, c.cid) AS rn " +
      s"FROM vsup vs JOIN sfin f ON f.sid = vs.sid " +
      s"JOIN c$iters c ON c.cid = f.cid) q2 WHERE rn = 1), " +
      "vpick AS (SELECT vec_id, v, sid FROM (SELECT nv.vec_id, nv.v, s.sid, " +
      "row_number() OVER (PARTITION BY nv.vec_id " +
      s"ORDER BY ${dotSql("nv.v", "s.sv")} DESC, s.sid) AS rn " +
      "FROM nv CROSS JOIN sk s) q3 CROSS JOIN spn WHERE rn <= spn.pp), " +
      "vprobe AS (SELECT vec_id, qv, bucket FROM (" +
      "SELECT vp.vec_id, vp.v AS qv, f.cid AS bucket, " +
      "row_number() OVER (PARTITION BY vp.vec_id " +
      s"ORDER BY ${dotSql("vp.v", "c.cv")} DESC, c.cid) AS rn " +
      s"FROM vpick vp JOIN sfin f ON f.sid = vp.sid " +
      s"JOIN c$iters c ON c.cid = f.cid) q4 WHERE rn <= $nprobe), " +
      "sc AS (SELECT p.vec_id AS query_id, m.vec_id AS neighbor_id, " +
      s"${dotSql("p.qv", "m.v")} AS score " +
      "FROM vprobe p JOIN cass2 m USING (bucket) " +
      "WHERE m.vec_id <> p.vec_id), " +
      topKSql("sc", topk)
  }

  /** Left-fold squared L2 distance of two DuckDB double-list expressions —
    * the engine-portable rendering of `acc += (x - c) * (x - c)`.
    */
  private[graft] def l2Sql(a: String, b: String): String =
    foldSumSql(s"[($a[i] - $b[i]) * ($a[i] - $b[i]) FOR i IN range(1, len($b) + 1)]")

  /** DuckDB replay of the WHOLE product-quantization stack
    * ([[graft.functions.Similarity.pqTopK]]): per-subspace plain-k-means
    * fits (min-L2 assignment ties to the lowest code, means folded in
    * vec_id order, empty cells keep their previous centroid), the corpus
    * encode (per-subspace argmin over the trained codebook), and the ADC
    * scoring (per-subspace sub-dots summed in subspace order through the
    * same prepend-0.0 left fold the engine's aggregate() uses). One
    * drifted double anywhere — a fit round, a code, a lookup — flips a
    * rank and fails the hash.
    */
  private[graft] def pqSlice(dim: Int, m: Int)(expr: String, mm: Int): String = {
    val subDim = dim / m
    s"$expr[${mm * subDim + 1}:${(mm + 1) * subDim}]"
  }

  /** The per-subspace PQ fit + corpus-encode CTE chain (`sub<m>`,
    * `pc<m><it>`, `pe<m>`), assuming `nv` and `samp` are already defined —
    * shared by the plain-PQ and IVF+PQ oracles.
    */
  private[graft] def pqSubCtes(dim: Int, m: Int, ksub: Int, iters: Int,
      sampRel: String = "samp", encRel: String = "nv"): String = {
    require(dim % m == 0)
    val subDim = dim / m
    val slice = pqSlice(dim, m) _
    val meanElem = foldSumSql("list_transform(vs, x -> x[i])")
    (0 until m).map { mm =>
      val rounds = (1 to iters).map { it =>
        s"pa$mm$it AS (SELECT vec_id, sv, cid FROM (" +
          "SELECT s.vec_id, s.sv, c.cid, row_number() OVER (PARTITION BY s.vec_id " +
          s"ORDER BY ${l2Sql("s.sv", "c.cv")} ASC, c.cid) AS rn " +
          s"FROM sub$mm s CROSS JOIN pc$mm${it - 1} c) WHERE rn = 1), " +
          s"pg$mm$it AS (SELECT cid, list(sv ORDER BY vec_id) AS vs FROM pa$mm$it GROUP BY cid), " +
          s"pm$mm$it AS (SELECT cid, [$meanElem / len(vs) FOR i IN range(1, ${subDim + 1})] AS mv " +
          s"FROM pg$mm$it), " +
          s"pc$mm$it AS (SELECT p.cid, COALESCE(m.mv, p.cv) AS cv " +
          s"FROM pc$mm${it - 1} p LEFT JOIN pm$mm$it m ON p.cid = m.cid)"
      }.mkString(", ")
      s"sub$mm AS (SELECT vec_id, ${slice("v", mm)} AS sv FROM $sampRel), " +
        s"pc${mm}0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, sv AS cv " +
        s"FROM (SELECT vec_id, sv FROM sub$mm ORDER BY vec_id LIMIT $ksub)), " +
        s"$rounds, " +
        s"pe$mm AS (SELECT vec_id, cid AS code FROM (" +
        "SELECT nv.vec_id, c.cid, row_number() OVER (PARTITION BY nv.vec_id " +
        s"ORDER BY ${l2Sql(slice("nv.v", mm), "c.cv")} ASC, c.cid) AS rn " +
        s"FROM $encRel nv CROSS JOIN pc$mm$iters c) WHERE rn = 1)"
    }.mkString(", ")
  }

  /** The PQ code joins + ADC score fragment shared by both PQ oracles:
    * join each `pe<m>` code and its `pc<m><iters>` centroid, score = the
    * prepend-0.0 left fold over the per-subspace sub-dots (the engine's
    * aggregate() order).
    */
  private[graft] def pqScore(dim: Int, m: Int, iters: Int,
      corpusAlias: String, queryAlias: String): (String, String) = {
    val slice = pqSlice(dim, m) _
    val codeJoins = (0 until m).map(mm =>
      s"JOIN pe$mm ON pe$mm.vec_id = $corpusAlias.vec_id " +
        s"JOIN pc$mm$iters cb$mm ON cb$mm.cid = pe$mm.code").mkString(" ")
    val subDots = (0 until m).map(mm =>
      dotSql(slice(s"$queryAlias.qv", mm), s"cb$mm.cv")).mkString("[", ", ", "]")
    (codeJoins, foldSumSql(subDots))
  }

  private[graft] def pqOracle(dim: Int, m: Int, ksub: Int, sampleSize: Int,
      iters: Int, topk: Int): String = {
    val (codeJoins, score) = pqScore(dim, m, iters, "b", "q0")
    s"WITH $normEmbCte, " +
      s"samp AS (SELECT vec_id, v FROM nv " +
      s"ORDER BY ${graft.functions.Similarity.sampleHashSql("vec_id")}, vec_id " +
      s"LIMIT $sampleSize), " +
      s"${pqSubCtes(dim, m, ksub, iters)}, " +
      "q0 AS (SELECT vec_id AS query_id, v AS qv FROM nv WHERE vec_id % 100 = 0), " +
      s"sc AS (SELECT q0.query_id, b.vec_id AS neighbor_id, $score AS score " +
      s"FROM nv b $codeJoins CROSS JOIN q0 WHERE b.vec_id <> q0.query_id), " +
      topKSql("sc", topk)
  }

  /** IVF+PQ oracle: the coarse trained-IVF chain ([[ivfFitCte]] through
    * `cass`) supplies cell pruning, the PQ chain supplies code scoring —
    * only the probed cells' codes are scored, the real FAISS-IVFPQ access
    * shape (minus residual encoding — codes quantize the raw vectors, the
    * ScaNN-style variant; see [[graft.functions.Similarity.ivfPqTopK]]).
    */
  private[graft] def ivfPqOracle(dim: Int, sampleSize: Int, centroids: Int,
      m: Int, ksub: Int, iters: Int, nprobe: Int, topk: Int): String = {
    val (codeJoins, score) = pqScore(dim, m, iters, "b", "qp")
    ivfFitCte(dim, sampleSize, centroids, iters) + ", " +
      s"${pqSubCtes(dim, m, ksub, iters)}, " +
      "q0 AS (SELECT vec_id AS query_id, v AS qv FROM nv WHERE vec_id % 100 = 0), " +
      "qp AS (SELECT query_id, qv, cid AS bucket FROM (" +
      "SELECT q.query_id, q.qv, c.cid, row_number() OVER (PARTITION BY q.query_id " +
      s"ORDER BY ${dotSql("q.qv", "c.cv")} DESC, c.cid) AS rn " +
      s"FROM q0 q CROSS JOIN c$iters c) WHERE rn <= $nprobe), " +
      s"sc AS (SELECT qp.query_id, b.vec_id AS neighbor_id, $score AS score " +
      s"FROM cass b JOIN qp USING (bucket) $codeJoins " +
      "WHERE b.vec_id <> qp.query_id), " +
      topKSql("sc", topk)
  }

  /** Recall@k oracle: BOTH retrieval paths replayed — the trained-IVF
    * chain (fit CTEs + probe + cell scoring, verbatim from
    * [[ivfTrainedOracle]]) and the brute-force all-pairs ranking (verbatim
    * from q_sim_topk_brute) — then the per-query intersection count and
    * fraction. Hash equality therefore certifies the recall NUMBERS, not
    * just the two result sets.
    */
  /** The shared recall-evaluation tail: top-k the approximate score CTE
    * (`scoredCte`: query_id, neighbor_id, score), replay the brute-force
    * exact ranking over `nv`×`q0` verbatim from q_sim_topk_brute, then the
    * per-query intersection count and fraction — the DuckDB rendering of
    * [[graft.functions.Similarity.recallAtK]]. Appended to each ANN stack's
    * fit/score chain to build that stack's recall oracle.
    */
  private[graft] def recallTailSql(scoredCte: String, topk: Int): String =
    "apr AS (SELECT query_id, neighbor_id FROM (SELECT *, row_number() " +
      "OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank " +
      s"FROM $scoredCte) WHERE rank <= $topk), " +
      "bsc AS (SELECT query_id, c.vec_id AS neighbor_id, " +
      s"${dotSql("qv", "c.v")} AS score " +
      "FROM nv c, q0 WHERE c.vec_id <> q0.query_id), " +
      "br AS (SELECT query_id, neighbor_id FROM (SELECT *, row_number() " +
      "OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank " +
      s"FROM bsc) WHERE rank <= $topk), " +
      "h AS (SELECT query_id, count(*) AS hits FROM apr " +
      "JOIN br USING (query_id, neighbor_id) GROUP BY 1) " +
      "SELECT b.query_id, CAST(COALESCE(h.hits, 0) AS BIGINT) AS n_hits, " +
      s"CAST(COALESCE(h.hits, 0) AS DOUBLE) / CAST($topk AS DOUBLE) AS recall " +
      "FROM (SELECT DISTINCT query_id FROM br) b LEFT JOIN h USING (query_id) " +
      "ORDER BY query_id"

  private[graft] def ivfRecallOracle(dim: Int, sampleSize: Int, centroids: Int,
      iters: Int, nprobe: Int, topk: Int): String =
    ivfFitCte(dim, sampleSize, centroids, iters) + ", " +
      "q0 AS (SELECT vec_id AS query_id, v AS qv FROM nv WHERE vec_id % 100 = 0), " +
      "qp AS (SELECT query_id, qv, cid AS bucket FROM (" +
      "SELECT q.query_id, q.qv, c.cid, row_number() OVER (PARTITION BY q.query_id " +
      s"ORDER BY ${dotSql("q.qv", "c.cv")} DESC, c.cid) AS rn " +
      s"FROM q0 q CROSS JOIN c$iters c) WHERE rn <= $nprobe), " +
      "isc AS (SELECT query_id, cass.vec_id AS neighbor_id, " +
      s"${dotSql("qp.qv", "cass.v")} AS score " +
      "FROM cass JOIN qp USING (bucket) WHERE cass.vec_id <> qp.query_id), " +
      recallTailSql("isc", topk)

  /** Recall@k of the plain-PQ ADC stack vs brute force: the full PQ fit +
    * encode + ADC chain (verbatim from [[pqOracle]]) ranked, intersected
    * with the exact ranking — certifies the quantization-loss NUMBERS.
    */
  private[graft] def pqRecallOracle(dim: Int, m: Int, ksub: Int, sampleSize: Int,
      iters: Int, topk: Int): String = {
    val (codeJoins, score) = pqScore(dim, m, iters, "b", "q0")
    s"WITH $normEmbCte, " +
      s"samp AS (SELECT vec_id, v FROM nv " +
      s"ORDER BY ${graft.functions.Similarity.sampleHashSql("vec_id")}, vec_id " +
      s"LIMIT $sampleSize), " +
      s"${pqSubCtes(dim, m, ksub, iters)}, " +
      "q0 AS (SELECT vec_id AS query_id, v AS qv FROM nv WHERE vec_id % 100 = 0), " +
      s"psc AS (SELECT q0.query_id, b.vec_id AS neighbor_id, $score AS score " +
      s"FROM nv b $codeJoins CROSS JOIN q0 WHERE b.vec_id <> q0.query_id), " +
      recallTailSql("psc", topk)
  }

  /** Recall@k of the composed IVF+PQ stack vs brute force: both fit chains
    * + cell pruning + ADC scoring (verbatim from [[ivfPqOracle]]) ranked,
    * intersected with the exact ranking — the number a deployment tunes
    * (nprobe, m, ksub) against.
    */
  private[graft] def ivfPqRecallOracle(dim: Int, sampleSize: Int, centroids: Int,
      m: Int, ksub: Int, iters: Int, nprobe: Int, topk: Int): String = {
    val (codeJoins, score) = pqScore(dim, m, iters, "b", "qp")
    ivfFitCte(dim, sampleSize, centroids, iters) + ", " +
      s"${pqSubCtes(dim, m, ksub, iters)}, " +
      "q0 AS (SELECT vec_id AS query_id, v AS qv FROM nv WHERE vec_id % 100 = 0), " +
      "qp AS (SELECT query_id, qv, cid AS bucket FROM (" +
      "SELECT q.query_id, q.qv, c.cid, row_number() OVER (PARTITION BY q.query_id " +
      s"ORDER BY ${dotSql("q.qv", "c.cv")} DESC, c.cid) AS rn " +
      s"FROM q0 q CROSS JOIN c$iters c) WHERE rn <= $nprobe), " +
      s"qsc AS (SELECT qp.query_id, b.vec_id AS neighbor_id, $score AS score " +
      s"FROM cass b JOIN qp USING (bucket) $codeJoins " +
      "WHERE b.vec_id <> qp.query_id), " +
      recallTailSql("qsc", topk)
  }

  /** The RESIDUAL-encoding CTE chain (true IVFADC,
    * [[graft.functions.Similarity.ivfPqResidualTopK]]): assign the
    * training sample to the FINAL coarse centroids (argmax dot, ties →
    * lowest cid — the corpus-assignment rule), subtract to get residual
    * sample `rsamp` and residual corpus `rnv`, then run the verbatim
    * per-subspace PQ fit + encode over those relations instead of the
    * raw ones.
    */
  private[graft] def ivfPqResCtes(dim: Int, m: Int, ksub: Int, iters: Int): String =
    // MATERIALIZED: every pe<m> subspace CTE references rnv/rsamp; without
    // the hint DuckDB re-inlines them — m recomputes of the whole coarse
    // k-means chain. Materialization changes cost only, never values.
    "sa AS MATERIALIZED (SELECT vec_id, v, cid FROM (" +
      "SELECT s.vec_id, s.v, c.cid, row_number() OVER (PARTITION BY s.vec_id " +
      s"ORDER BY ${dotSql("s.v", "c.cv")} DESC, c.cid) AS rn " +
      s"FROM samp s CROSS JOIN c$iters c) WHERE rn = 1), " +
      s"rsamp AS MATERIALIZED (SELECT sa.vec_id, [sa.v[i] - c.cv[i] FOR i IN " +
      s"range(1, ${dim + 1})] AS v FROM sa JOIN c$iters c ON sa.cid = c.cid), " +
      s"rnv AS MATERIALIZED (SELECT cass.vec_id, [cass.v[i] - c.cv[i] FOR i IN " +
      s"range(1, ${dim + 1})] AS v FROM cass JOIN c$iters c ON cass.bucket = c.cid), " +
      pqSubCtes(dim, m, ksub, iters, sampRel = "rsamp", encRel = "rnv")

  /** Query probe CTE carrying the per-(query, cell) BASE term dot(q, c) —
    * the same double the probe ranking orders by; residual ADC adds it to
    * the LUT fold so the score replays `dot(q,c) + Σ dot(q_m, book[code])`.
    */
  private[graft] def qpBaseCte(iters: Int, nprobe: Int): String =
    "q0 AS (SELECT vec_id AS query_id, v AS qv FROM nv WHERE vec_id % 100 = 0), " +
      "qp AS (SELECT query_id, qv, cid AS bucket, base FROM (" +
      s"SELECT q.query_id, q.qv, c.cid, ${dotSql("q.qv", "c.cv")} AS base, " +
      "row_number() OVER (PARTITION BY q.query_id " +
      s"ORDER BY ${dotSql("q.qv", "c.cv")} DESC, c.cid) AS rn " +
      s"FROM q0 q CROSS JOIN c$iters c) WHERE rn <= $nprobe)"

  /** True-IVFADC oracle: coarse fit + residual PQ fit/encode + probed-cell
    * ADC scoring with the per-cell base term added before ranking.
    */
  private[graft] def ivfPqResScoredCtes(dim: Int, sampleSize: Int, centroids: Int,
      m: Int, ksub: Int, iters: Int, nprobe: Int): String = {
    val (codeJoins, score) = pqScore(dim, m, iters, "b", "qp")
    ivfFitCte(dim, sampleSize, centroids, iters) + ", " +
      ivfPqResCtes(dim, m, ksub, iters) + ", " +
      qpBaseCte(iters, nprobe) + ", " +
      s"sc AS (SELECT qp.query_id, b.vec_id AS neighbor_id, " +
      s"(qp.base + $score) AS score " +
      s"FROM cass b JOIN qp USING (bucket) $codeJoins " +
      "WHERE b.vec_id <> qp.query_id)"
  }

  private[graft] def ivfPqResOracle(dim: Int, sampleSize: Int, centroids: Int,
      m: Int, ksub: Int, iters: Int, nprobe: Int, topk: Int): String =
    ivfPqResScoredCtes(dim, sampleSize, centroids, m, ksub, iters, nprobe) +
      ", " + topKSql("sc", topk)

  /** Recall@k of the true-IVFADC stack vs brute force — ranked next to
    * [[ivfPqRecallOracle]] so the residual-vs-raw recall gain is itself an
    * oracle-certified number, not a spec-only anecdote.
    */
  private[graft] def ivfPqResRecallOracle(dim: Int, sampleSize: Int, centroids: Int,
      m: Int, ksub: Int, iters: Int, nprobe: Int, topk: Int): String = {
    val (codeJoins, score) = pqScore(dim, m, iters, "b", "qp")
    ivfFitCte(dim, sampleSize, centroids, iters) + ", " +
      ivfPqResCtes(dim, m, ksub, iters) + ", " +
      qpBaseCte(iters, nprobe) + ", " +
      s"rsc AS (SELECT qp.query_id, b.vec_id AS neighbor_id, " +
      s"(qp.base + $score) AS score " +
      s"FROM cass b JOIN qp USING (bucket) $codeJoins " +
      "WHERE b.vec_id <> qp.query_id), " +
      recallTailSql("rsc", topk)
  }

  /** DuckDB replay of [[graft.functions.Dedup.semanticDedup]]: the shared
    * k-means fit + assignment, then per-vector max cosine against lower-id
    * same-cluster vectors; keep = no lower neighbor at ≥ threshold.
    */
  private[graft] def semanticDedupOracle(dim: Int, sampleSize: Int, centroids: Int,
      iters: Int, threshold: Double): String =
    ivfFitCte(dim, sampleSize, centroids, iters) + ", " +
      "p AS (SELECT b.vec_id, max(" + dotSql("a.v", "b.v") + ") AS max_lower_sim " +
      "FROM cass a JOIN cass b ON a.bucket = b.bucket AND a.vec_id < b.vec_id " +
      "GROUP BY b.vec_id) " +
      "SELECT c.vec_id, CAST(c.bucket AS INT) AS cluster, p.max_lower_sim, " +
      s"(p.max_lower_sim IS NULL OR p.max_lower_sim < $threshold) AS keep " +
      "FROM cass c LEFT JOIN p ON c.vec_id = p.vec_id ORDER BY c.vec_id"

  /** Per-query exact top-k ranking shared by the brute/IVF ANN oracles. */
  /** The SQ8 replay — per-dim min/max train, encode, decode, dim-ordered
    * score fold — shared by the one-shot and persisted-index queries
    * (write→read fidelity: the stored tables must answer like a fresh fit).
    */
  private[graft] lazy val sq8ScoredCtes: String =
    s"$normEmbCte, " +
      "dm AS (SELECT i, min(v[i]) AS mn, max(v[i]) AS mx FROM nv, " +
      "(SELECT unnest(range(1, 65)) AS i) GROUP BY i), " +
      "ex AS (SELECT vec_id, i, v[i] AS x FROM nv, " +
      "(SELECT unnest(range(1, 65)) AS i)), " +
      "cd AS (SELECT ex.vec_id, ex.i, CASE WHEN dm.mx - dm.mn > 0 THEN " +
      "round((ex.x - dm.mn) / (dm.mx - dm.mn) * 255.0) ELSE 0 END AS q " +
      "FROM ex JOIN dm USING (i)), " +
      "dec AS (SELECT vec_id, cd.i, " +
      "dm.mn + q / 255.0 * (dm.mx - dm.mn) AS dx " +
      "FROM cd JOIN dm USING (i)), " +
      "q0 AS (SELECT vec_id AS query_id, v AS qv FROM nv " +
      "WHERE vec_id % 100 = 0), " +
      "sc AS (SELECT query_id, dec.vec_id AS neighbor_id, " +
      "list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
      "list(qv[dec.i] * dec.dx ORDER BY dec.i)), (acc, x) -> acc + x) " +
      "AS score FROM dec, q0 WHERE dec.vec_id <> q0.query_id " +
      "GROUP BY 1, 2)"

  private[graft] lazy val sq8Oracle: String =
    s"WITH $sq8ScoredCtes, " + topKSql("sc", 10)

  /** The incremental boilerplate-strip replay (full-corpus line-df over
    * the wrapped fixture, verdicts restricted to the doc_id % 4 = 0
    * batch) — shared verbatim by q_text_boilerplate_indexed and the
    * composed takedown gate, where the post-unlearn state must answer
    * EXACTLY like this from-scratch replay.
    */
  private[graft] lazy val boilerIndexedOracle: String =
    "WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS sp " +
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
      "FROM lk WHERE doc_id % 4 = 0 GROUP BY doc_id ORDER BY doc_id"

  /** The sliding-window CTE of a text relation `src(…, textCol)` →
    * `out(doc-cols…, pos, win)` — shared by the substring-dedup and
    * substring-scrub oracles. */
  private[graft] def substringWindowsSql(src: String, keyCol: String,
      out: String, w: Int): String =
    s"$out AS (SELECT $keyCol, u.pos AS pos, u.win AS win FROM (" +
      s"SELECT $keyCol, unnest([{'pos': p, 'win': substring(text, " +
      s"CAST(p AS INT) + 1, $w)} " +
      s"FOR p IN range(0, greatest(len(text) - ${w - 1}, 0))]) AS u " +
      s"FROM $src) q_$out)"

  /** The island-merge + complement-rebuild SQL tail shared by the
    * substring-dedup and substring-scrub oracles: expects CTEs
    * `d(doc_id, text)` (the corpus) and `dup(doc_id, pos)` (the excised
    * window starts) in scope; emits the final (doc_id, n_chars, n_spans,
    * n_removed, text) relation — the exact replay of
    * [[graft.functions.Dedup]]'s exciseWindows tail. */
  private[graft] def substringExciseTailSql(w: Int): String =
    "isl AS (SELECT doc_id, pos, CASE WHEN pos > COALESCE(" +
      s"max(pos + $w) OVER (PARTITION BY doc_id ORDER BY pos " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) " +
      "THEN 1 ELSE 0 END AS brk FROM dup), " +
      "sids AS (SELECT doc_id, pos, sum(brk) OVER (" +
      "PARTITION BY doc_id ORDER BY pos) AS sid FROM isl), " +
      s"spans AS (SELECT doc_id, sid, min(pos) AS s, max(pos) + $w AS e " +
      "FROM sids GROUP BY 1, 2), " +
      "mids AS (SELECT doc_id, COALESCE(lag(e) OVER (" +
      "PARTITION BY doc_id ORDER BY s), 0) AS ss, s AS se FROM spans), " +
      "tails AS (SELECT doc_id, max(e) AS ss, any_value(len(text)) AS se " +
      "FROM spans JOIN d USING (doc_id) GROUP BY doc_id), " +
      "segs AS (SELECT * FROM mids UNION ALL SELECT * FROM tails), " +
      "kept AS (SELECT doc_id, string_agg(substring(text, " +
      "CAST(ss AS INT) + 1, CAST(se - ss AS INT)), '' ORDER BY ss) " +
      "AS kept FROM segs JOIN d USING (doc_id) WHERE se > ss " +
      "GROUP BY doc_id), " +
      "rem AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans, " +
      "CAST(sum(e - s) AS BIGINT) AS n_removed FROM spans GROUP BY doc_id) " +
      "SELECT d.doc_id, CAST(len(d.text) AS BIGINT) AS n_chars, " +
      "COALESCE(rem.n_spans, CAST(0 AS BIGINT)) AS n_spans, " +
      "COALESCE(rem.n_removed, CAST(0 AS BIGINT)) AS n_removed, " +
      "CASE WHEN rem.n_spans IS NOT NULL THEN COALESCE(kept.kept, '') " +
      "ELSE d.text END AS text " +
      "FROM d LEFT JOIN rem USING (doc_id) LEFT JOIN kept USING (doc_id) " +
      "ORDER BY doc_id"

  /** Composed oracle for q_takedown_quantized: after ONE deleteEverywhere
    * batch, the SQ index must answer the plain-corpus SQ8 replay and the
    * unlearned line-df state must answer the plain incremental-strip
    * replay — both legs the EXISTING oracles verbatim as subqueries,
    * unioned into one aligned relation (family, a, b, n, x, t).
    */
  private[graft] lazy val takedownQuantizedOracle: String =
    "SELECT family, a, b, n, x, t FROM (" +
      "SELECT 'sq' AS family, q.query_id AS a, q.neighbor_id AS b, " +
      "CAST(q.rank AS BIGINT) AS n, q.score AS x, " +
      s"CAST(NULL AS VARCHAR) AS t FROM ($sq8Oracle) q " +
      "UNION ALL " +
      "SELECT 'linedf' AS family, u.doc_id AS a, u.n_lines AS b, " +
      "u.n_kept AS n, CAST(NULL AS DOUBLE) AS x, u.text AS t FROM (" +
      boilerIndexedOracle + ") u" +
      ") z ORDER BY family, a, b"

  /** Per-query shortlist CTE — stage 1 of the refine oracles: top `n` of a
    * scored CTE with the coarse rank carried as `coarse_rank`.
    */
  private[graft] def shortlistCte(scored: String, n: Int, out: String): String =
    s"$out AS (SELECT query_id, neighbor_id, rank AS coarse_rank FROM " +
      "(SELECT *, row_number() OVER (PARTITION BY query_id " +
      s"ORDER BY score DESC, neighbor_id) AS rank FROM $scored) " +
      s"WHERE rank <= $n)"

  /** Stage 2 of the refine oracles: exact full-dim rescoring of a
    * shortlist CTE (expects `nv` and `q0(query_id, qv)` in scope) and the
    * final top-k keeping both ranks — the [[graft.functions.Similarity
    * .refineExact]] replay.
    */
  private[graft] def refineTailSql(shortlist: String, k: Int): String =
    s"rfx AS (SELECT s.query_id, s.neighbor_id, s.coarse_rank, " +
      s"${dotSql("q0.qv", "c.v")} AS score FROM $shortlist s " +
      "JOIN nv c ON c.vec_id = s.neighbor_id " +
      "JOIN q0 ON q0.query_id = s.query_id), " +
      "rr AS (SELECT *, row_number() OVER (PARTITION BY query_id " +
      "ORDER BY score DESC, neighbor_id) AS rank FROM rfx) " +
      "SELECT query_id, neighbor_id, " +
      "CAST(coarse_rank AS INT) AS coarse_rank, " +
      s"CAST(rank AS INT) AS rank, score FROM rr WHERE rank <= $k " +
      "ORDER BY query_id, rank"

  private[graft] def topKSql(scoredCte: String, k: Int): String =
    s"r AS (SELECT *, row_number() OVER (PARTITION BY query_id " +
      "ORDER BY score DESC, neighbor_id) AS rank FROM " + scoredCte + ") " +
      "SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, score " +
      s"FROM r WHERE rank <= $k ORDER BY query_id, rank"

  /** The bigram-LM score replay (rational add-1 model, sorted-fold per-doc
    * sums) — shared verbatim by the self-trained query and the
    * persisted-model query (write→read fidelity: the stored tables must
    * produce the same scores a from-scratch fit does).
    */
  private[graft] val bigramLmCtes: String =
    "WITH tk AS (SELECT doc_id, " + toksSql + " AS t FROM documents " +
      "WHERE text IS NOT NULL), " +
      "x AS (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM tk " +
      "WHERE len(t) >= 2), " +
      "bg AS (SELECT doc_id, CAST(i AS BIGINT) AS pos, t[i] AS w1, " +
      "t[i+1] AS w2 FROM x), " +
      "c12 AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY 1, 2), " +
      "c1 AS (SELECT w1, CAST(sum(c) AS BIGINT) AS cw FROM c12 GROUP BY 1), " +
      "v AS (SELECT count(DISTINCT term) AS v FROM " +
      "(SELECT unnest(t) AS term FROM tk)), " +
      "sc AS (SELECT bg.doc_id, count(*) AS n, " +
      "list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
      "list((CAST(c12.c AS DOUBLE) + 1.0) / " +
      "(CAST(c1.cw AS DOUBLE) + 1.0 * CAST(v.v AS DOUBLE)) " +
      "ORDER BY bg.pos)), (acc, x) -> acc + x) AS s " +
      "FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1) " +
      "CROSS JOIN v GROUP BY 1)"

  /** Shared model-fit CTE chain over CTE `corpus`(doc_id, text): bigram
    * counts c12(w1,w2,c), context totals c1(w1,cw), vocabulary v(v) —
    * the [[bigramLmCtes]] fit re-rendered source-parameterized for the
    * membership/canary audits (their corpus is not the bare documents
    * table).
    */
  private[graft] val lmFitFromCorpusSql: String =
    "tk AS (SELECT doc_id, " + toksSql + " AS t FROM corpus), " +
      "x AS (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM tk " +
      "WHERE len(t) >= 2), " +
      "bg AS (SELECT doc_id, CAST(i AS BIGINT) AS pos, t[i] AS w1, " +
      "t[i+1] AS w2 FROM x), " +
      "c12 AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY 1, 2), " +
      "c1 AS (SELECT w1, CAST(sum(c) AS BIGINT) AS cw FROM c12 GROUP BY 1), " +
      "v AS (SELECT count(DISTINCT term) AS v FROM " +
      "(SELECT unnest(t) AS term FROM tk))"

  /** Smoothed conditional probability under the [[lmFitFromCorpusSql]]
    * model with LEFT-joined counts (unseen bigrams live on the add-1
    * mass — the cross-corpus semantics of TextAnalysis.scoreAgainstLm).
    */
  private[graft] val lmProbSql: String =
    "(CAST(COALESCE(c12.c, 0) AS DOUBLE) + 1.0) / " +
      "(CAST(COALESCE(c1.cw, 0) AS DOUBLE) + 1.0 * CAST(v.v AS DOUBLE))"

  /** DuckDB replay of [[graft.functions.TextAnalysis.minKProb]] for
    * q_privacy_min_k_prob: members are the corpus documents, non-members
    * their token-REVERSED twins (same unigrams, mostly-novel bigrams —
    * the in-distribution non-member the published test is hardest on);
    * per candidate, the mean of the bottom ceil(n/5) per-position
    * probabilities, selection ordered (p, pos), fold in that order.
    */
  private[graft] lazy val minKProbOracle: String =
    "WITH corpus AS (SELECT doc_id, text FROM documents " +
      "WHERE text IS NOT NULL), " +
      lmFitFromCorpusSql + ", " +
      "cand AS (SELECT doc_id, text, TRUE AS member FROM corpus " +
      "UNION ALL SELECT doc_id + 1000000 AS doc_id, " +
      "array_to_string(list_reverse(string_split(text, ' ')), ' ') AS text, " +
      "FALSE AS member FROM corpus), " +
      "ctk AS (SELECT doc_id, " + toksSql + " AS t FROM cand), " +
      "cx AS (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM ctk " +
      "WHERE len(t) >= 2), " +
      "cbg AS (SELECT doc_id, CAST(i AS BIGINT) AS pos, t[i] AS w1, " +
      "t[i+1] AS w2 FROM cx), " +
      s"ps AS (SELECT cbg.doc_id, cbg.pos, $lmProbSql AS p " +
      "FROM cbg LEFT JOIN c12 USING (w1, w2) LEFT JOIN c1 USING (w1) " +
      "CROSS JOIN v), " +
      "ag AS (SELECT doc_id, count(*) AS n, (count(*) + 4) // 5 AS m, " +
      "list(p ORDER BY p, pos) AS ps FROM ps GROUP BY 1), " +
      "res AS (SELECT doc_id, n, list_reduce(" +
      "list_prepend(CAST(0.0 AS DOUBLE), ps[1:m]), " +
      "(acc, x) -> acc + x) / CAST(m AS DOUBLE) AS mk FROM ag) " +
      "SELECT c.doc_id, c.member, " +
      "CAST(COALESCE(res.n, 0) AS BIGINT) AS n_bigrams, " +
      "res.mk AS min_k_prob FROM cand c " +
      "LEFT JOIN res ON c.doc_id = res.doc_id ORDER BY c.doc_id"

  /** DuckDB replay of q_text_gopher_verdict: the FULL repetition oracle
    * as a subquery, thirteen cap comparisons rendered from the SAME
    * Scala constants the operator and the streaming gate read
    * (no-silent-divergence rule; caps as CAST('…' AS DOUBLE) so both
    * engines compare against the identical IEEE value).
    */
  private[graft] lazy val gopherVerdictOracle: String = {
    import graft.functions.TextAnalysis._
    def cap(d: Double) = s"CAST('$d' AS DOUBLE)"
    val conds = Seq(
      s"dup_line_frac <= ${cap(GopherLineFracCap)}",
      s"dup_para_frac <= ${cap(GopherParaFracCap)}",
      s"dup_line_char_frac <= ${cap(GopherLineCharCap)}",
      s"dup_para_char_frac <= ${cap(GopherParaCharCap)}") ++
      (2 to 4).zip(GopherTopGramCaps).map { case (n, t) =>
        s"top_${n}gram_char_frac <= ${cap(t)}" } ++
      (5 to 10).zip(GopherDupGramCaps).map { case (n, t) =>
        s"dup_${n}gram_char_frac <= ${cap(t)}" }
    s"SELECT doc_id, (${conds.mkString(" AND ")}) AS keep " +
      s"FROM ($gopherRepOracle) g ORDER BY doc_id"
  }

  /** Canary-audit CONFIGURATION (the classifierWeights discipline:
    * generated once by the engine's LCG over a fixed corpus-register
    * vocabulary, rendered as literals into both engines). Classes are
    * insertion-repetition counts; candidate 0 of each class is the
    * inserted canary.
    */
  private[graft] val canaryClasses: Seq[Int] = Seq(0, 1, 4, 16)
  private[graft] val canaryCandPerClass: Int = 32
  private[graft] val canaryVocab: Seq[String] = Seq("spark", "query",
    "join", "window", "agg", "stream", "vector", "filter", "merge",
    "sort", "hash", "scan")
  private def canaryLcg(x: Long): Long =
    ((x % 2147483647L) * 1103515245L + 12345L) % 2147483647L
  private[graft] lazy val canaryCandidates: Seq[(Int, Int, String)] =
    for { c <- canaryClasses; k <- 0 until canaryCandPerClass } yield (c, k,
      (0 until 5).map(p => canaryVocab(
        (canaryLcg(c * 100003L + k * 101L + p * 7L + 1L) %
          canaryVocab.size).toInt)).mkString(" "))

  /** DuckDB replay of [[graft.functions.TextAnalysis.canaryRank]] for
    * q_privacy_canary_rank: the rendered candidate table, the canary
    * documents derived from it (reps copies of candidate 0), the refit
    * model over corpus + canaries, ordered-product sequence scores, and
    * the per-class rank of the canary (score DESC, cand_id ASC).
    */
  private[graft] lazy val canaryRankOracle: String = {
    val values = canaryCandidates.map { case (c, k, t) =>
      s"($c, $k, '$t')" }.mkString(", ")
    s"WITH cands(reps, cand_id, ctext) AS (VALUES $values), " +
      "cdocs AS (SELECT CAST(2000000 + reps * 1000 + i AS BIGINT) " +
      "AS doc_id, ctext AS text FROM (SELECT reps, ctext, " +
      "unnest(range(reps)) AS i FROM cands WHERE cand_id = 0) q0), " +
      "corpus AS (SELECT doc_id, text FROM documents " +
      "WHERE text IS NOT NULL " +
      "UNION ALL SELECT doc_id, text FROM cdocs), " +
      lmFitFromCorpusSql + ", " +
      "ctk AS (SELECT reps, cand_id, " +
      "regexp_split_to_array(trim(ctext), '\\s+') AS t FROM cands), " +
      "cx AS (SELECT reps, cand_id, t, unnest(range(1, len(t))) AS i " +
      "FROM ctk), " +
      "cbg AS (SELECT reps, cand_id, CAST(i AS BIGINT) AS pos, " +
      "t[i] AS w1, t[i+1] AS w2 FROM cx), " +
      s"ps AS (SELECT cbg.reps, cbg.cand_id, cbg.pos, $lmProbSql AS p " +
      "FROM cbg LEFT JOIN c12 USING (w1, w2) LEFT JOIN c1 USING (w1) " +
      "CROSS JOIN v), " +
      "sc AS (SELECT reps, cand_id, list_reduce(" +
      "list_prepend(CAST(1.0 AS DOUBLE), list(p ORDER BY pos)), " +
      "(acc, x) -> acc * x) AS s FROM ps GROUP BY 1, 2), " +
      "rk AS (SELECT reps, cand_id, s, row_number() OVER (" +
      "PARTITION BY reps ORDER BY s DESC, cand_id) AS r FROM sc) " +
      "SELECT CAST(rk.reps AS BIGINT) AS reps, " +
      "CAST(cnt.n AS BIGINT) AS n_candidates, " +
      "CAST(rk.r AS BIGINT) AS canary_rank, rk.s AS canary_score " +
      "FROM rk JOIN (SELECT reps, count(*) AS n FROM rk GROUP BY 1) cnt " +
      "USING (reps) WHERE rk.cand_id = 0 ORDER BY reps"
  }

  private[graft] val bigramLmOracle: String =
    bigramLmCtes +
      " SELECT d.doc_id, CAST(COALESCE(sc.n, 0) AS BIGINT) AS n_bigrams, " +
      "sc.s / CAST(sc.n AS DOUBLE) AS bigram_score " +
      "FROM documents d LEFT JOIN sc USING (doc_id) ORDER BY d.doc_id"

  /** The 16-token chunk-fingerprint CTE chain (`<prefix>tk` → `<prefix>ck`
    * → `<prefix>fp`) over source CTE `src` — the q_dedup_chunks rolling
    * hash replay, prefix-parameterized so a bipartite query can chunk two
    * corpora in one statement.
    */
  private[graft] def chunkFpCtes(src: String, prefix: String): String =
    s"${prefix}tk AS (SELECT doc_id, " + toksSql + s" AS t FROM $src " +
      "WHERE text IS NOT NULL AND len(" + toksSql + ") > 0), " +
      s"${prefix}ck AS (SELECT doc_id, " +
      s"unnest(range(0, (len(t) - 1) // 16 + 1)) AS idx, t FROM ${prefix}tk), " +
      s"${prefix}fp AS (SELECT doc_id, CAST(idx AS BIGINT) AS idx, " +
      "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      "[CAST(unicode(c) AS BIGINT) FOR c IN regexp_extract_all(" +
      "lower(regexp_replace(trim(" +
      "array_to_string(t[(idx*16+1):(idx*16+16)], ' ')" +
      "), '\\s+', ' ', 'g')), '.')]), " +
      s"(acc, x) -> (acc * 31 + x) % ${graft.functions.RollingHash.Modulus}) " +
      s"AS f FROM ${prefix}ck)"

  /** The quality-score formula rendered once for every oracle that needs
    * it (q_text_stats, q_text_score_norm) — the TextAnalysis.qualityScore
    * replay.
    */
  /** DuckDB replay of [[TextAnalysis.domainAuthority]] on the spiked-link
    * fixture: the SAME fixed power iterations unroll as CTEs (the
    * ivfFitCte discipline for k-means, applied to PageRank), every
    * floating sum folds in the same pinned order (per-target
    * contributions ORDER BY src, dangling mass ORDER BY domain), and the
    * damping constants render from the SAME Scala doubles via
    * string-casts — so the ranks hash-match to the bit.
    */
  private[graft] def domainRankOracle(iters: Int, damping: Double): String =
    domainRankCtes(iters, damping) + " " +
      s"SELECT r$iters.domain, " +
      "CAST(COALESCE(ind.ind, 0) AS BIGINT) AS in_domains, " +
      "CAST(COALESCE(outd.outd, 0) AS BIGINT) AS out_domains, " +
      s"r$iters.r AS rank FROM r$iters " +
      s"LEFT JOIN ind ON r$iters.domain = ind.dst " +
      s"LEFT JOIN outd ON r$iters.domain = outd.src " +
      "ORDER BY domain"

  /** [[domainAuthority]] composed into the curation pipeline
    * (q_text_authority_verdict): per document, its source domain's rank
    * and keep = rank >= alpha / N -- the same rank CTE chain re-rendered
    * under one oracle, the q_text_fertility composition discipline.
    */
  private[graft] def authorityVerdictOracle(iters: Int, damping: Double,
      alpha: Double): String =
    domainRankCtes(iters, damping) + " " +
      "SELECT d.doc_id, d.source AS domain, " +
      s"r$iters.r AS authority, " +
      s"COALESCE(r$iters.r >= CAST('$alpha' AS DOUBLE) / nn.n, false) " +
      "AS keep " +
      s"FROM documents d LEFT JOIN r$iters ON d.source = r$iters.domain " +
      "CROSS JOIN nn ORDER BY d.doc_id"

  /** The shared WITH-chain: spiked fixture, domain edge list, nodes, the
    * unrolled power iterations r1..r<iters>, and the degree CTEs.
    */
  private def domainRankCtes(iters: Int, damping: Double): String = {
    val base = s"CAST('${1.0 - damping}' AS DOUBLE)"
    val d = s"CAST('$damping' AS DOUBLE)"
    val z = "CAST(0.0 AS DOUBLE)"
    val spike = "text || CASE WHEN doc_id % 5 = 0 THEN " +
      "' https://site' || CAST(doc_id % 7 AS VARCHAR) || '.example.com/p' " +
      "ELSE '' END || CASE WHEN doc_id % 3 = 0 THEN " +
      "' https://hub.example.net/x' ELSE '' END"
    val iterCtes = (1 to iters).map { k =>
      val p = s"r${k - 1}"
      s"c$k AS (SELECT e.dst, e.src, $p.r * e.w / od.outw AS c " +
        s"FROM e JOIN $p ON e.src = $p.domain JOIN od ON e.src = od.src), " +
        s"i$k AS (SELECT dst, list_reduce(list_prepend($z, " +
        "list(c ORDER BY src)), (a, x) -> a + x) AS insum " +
        s"FROM c$k GROUP BY dst), " +
        s"d$k AS (SELECT COALESCE(list_reduce(list_prepend($z, " +
        "list(r ORDER BY domain)), (a, x) -> a + x), " + z + ") AS dm " +
        s"FROM $p WHERE domain NOT IN (SELECT src FROM od)), " +
        s"r$k AS (SELECT nodes.domain, $base / nn.n + $d * " +
        s"(COALESCE(i$k.insum, $z) + d$k.dm / nn.n) AS r " +
        s"FROM nodes CROSS JOIN nn CROSS JOIN d$k " +
        s"LEFT JOIN i$k ON nodes.domain = i$k.dst)"
    }.mkString(", ")
    s"WITH w AS (SELECT doc_id, source, $spike AS text FROM documents " +
      "WHERE text IS NOT NULL AND source IS NOT NULL), " +
      "u AS (SELECT source AS src, unnest(regexp_extract_all(text, " +
      s"'${TextAnalysis.UrlRx}')) AS url FROM w), " +
      "e0 AS (SELECT src, regexp_extract(url, '^https?://([^/?#\\s]+)', 1) " +
      "AS dst FROM u), " +
      "e AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM e0 " +
      "WHERE dst <> '' AND dst <> src GROUP BY 1, 2), " +
      "nodes AS (SELECT DISTINCT domain FROM (" +
      "SELECT src AS domain FROM e UNION ALL SELECT dst FROM e " +
      "UNION ALL SELECT source FROM documents WHERE source IS NOT NULL) q0), " +
      "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes), " +
      "od AS (SELECT src, CAST(sum(w) AS BIGINT) AS outw FROM e GROUP BY 1), " +
      "r0 AS (SELECT domain, CAST('1.0' AS DOUBLE) / nn.n AS r " +
      "FROM nodes CROSS JOIN nn), " +
      iterCtes + ", " +
      "ind AS (SELECT dst, count(DISTINCT src) AS ind FROM e GROUP BY 1), " +
      "outd AS (SELECT src, count(DISTINCT dst) AS outd FROM e GROUP BY 1)"
  }

  /** The SIX-STAGE composed-curation replay (q_pipeline_curate_full,
    * round-16): every stage's individually-gated oracle re-rendered over
    * the PREVIOUS stage's relation — filter ([[verdictCtes]]) → near-dup
    * min-id components (the [[ngramJaccardOracle]] pair chain + the
    * [[clusterAssignCtes]] recursive closure, over the kept docs) →
    * decontamination (the q_text_decontaminate chunk-match + slice
    * reconstruction, corpus = dedup survivors, benchmark = every 97th
    * document) → quality terciles over the SCRUBBED text
    * ([[qualityScoreSql]] + the q_sample_perplexity_buckets id-mix
    * sample/cutoff replay; keep = score ≥ the middle cutoff) →
    * temperature mixture (the q_sample_temperature apportionment replay,
    * budget = ⌊3·n/5⌋ of the survivors, fingerprints over the scrubbed
    * text) → 512-token/8-shard packing (the [[curateOracle]] cum/pack
    * arithmetic). Constants mirror
    * [[graft.functions.Curate.curateFullStages]]' defaults exactly.
    */
  private[graft] lazy val curateFullOracle: String = {
    val mod = graft.functions.RollingHash.Modulus
    val fpFold = "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      "[CAST(unicode(c) AS BIGINT) FOR c IN regexp_extract_all(" +
      "lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), '.')]), " +
      s"(acc, x) -> (acc * 31 + x) % $mod)"
    s"WITH RECURSIVE $verdictCtes, " +
      // stage 1: policy filter
      "kd AS (SELECT d.doc_id, d.source, d.text FROM documents d " +
      "JOIN v ON d.doc_id = v.doc_id WHERE v.reasons = ''), " +
      // stage 2: exact ngram-Jaccard pairs over the kept docs, then the
      // min-id connected-component keep rule
      s"ptk AS (SELECT doc_id, $toksSql AS t FROM kd), " +
      "png AS (SELECT doc_id, list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] " +
      "FOR i IN range(1, len(t) - 1)]) AS ng FROM ptk WHERE len(t) >= 3), " +
      "pps AS (SELECT doc_id, unnest(ng) AS gsh, len(ng) AS n FROM png), " +
      "ppr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common, " +
      "any_value(a.n) AS na, any_value(b.n) AS nb FROM pps a " +
      "JOIN pps b ON a.gsh = b.gsh AND a.doc_id < b.doc_id GROUP BY 1, 2), " +
      "pj AS (SELECT doc_a, doc_b FROM ppr " +
      "WHERE CAST(common AS DOUBLE) / (na + nb - common) >= 0.5), " +
      "pe AS (SELECT doc_a AS src, doc_b AS dst FROM pj " +
      "UNION SELECT doc_b, doc_a FROM pj), " +
      "preach AS (SELECT src, dst FROM pe " +
      "UNION SELECT pr.src, pe.dst FROM preach pr JOIN pe ON pr.dst = pe.src), " +
      "pcomp AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id " +
      "FROM preach GROUP BY src), " +
      "dd AS (SELECT kd.* FROM kd LEFT JOIN pcomp USING (doc_id) " +
      "WHERE COALESCE(pcomp.cluster_id, kd.doc_id) = kd.doc_id), " +
      // stage 3: decontaminate the survivors against the benchmark slice
      "bd AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0), " +
      chunkFpCtes("dd", "c") + ", " + chunkFpCtes("bd", "b") + ", " +
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
      "rms AS (SELECT doc_id, list(idx ORDER BY idx) AS rms FROM rmd GROUP BY 1), " +
      s"tall AS (SELECT doc_id, $toksSql AS t FROM dd), " +
      "base AS (SELECT doc_id, t, CASE WHEN t IS NULL OR len(t) = 0 " +
      "THEN 0 ELSE (len(t) - 1) // 16 + 1 END AS n_chunks FROM tall), " +
      "sc0 AS (SELECT b.doc_id, CASE WHEN b.n_chunks = 0 THEN '' " +
      "ELSE COALESCE(array_to_string(flatten([b.t[(i*16+1):(i*16+16)] " +
      "FOR i IN range(0, b.n_chunks) " +
      "IF NOT list_contains(COALESCE(r.rms, CAST([] AS BIGINT[])), i)]), " +
      "' '), '') END AS text FROM base b LEFT JOIN rms r USING (doc_id)), " +
      "scr AS (SELECT sc0.doc_id, sc0.text, dd.source FROM sc0 " +
      "JOIN dd USING (doc_id) WHERE length(sc0.text) > 0), " +
      // stage 4: quality terciles over the scrubbed text; keep ⟺ not tail
      s"qs AS (SELECT doc_id, source, text, $qualityScoreSql AS q_score FROM scr), " +
      "smq AS (SELECT q_score FROM qs " +
      s"ORDER BY ${graft.functions.Similarity.sampleHashSql("doc_id")}, doc_id " +
      "LIMIT 256), " +
      "osq AS (SELECT q_score AS sv, " +
      "row_number() OVER (ORDER BY q_score DESC) AS rk, " +
      "count(*) OVER () AS nn FROM smq), " +
      "cutq AS (SELECT max(CASE WHEN rk = (2 * nn + 2) // 3 THEN sv END) " +
      "AS c2 FROM osq), " +
      "gq2 AS (SELECT qs.* FROM qs CROSS JOIN cutq WHERE qs.q_score >= cutq.c2), " +
      // stage 5: temperature mixture at budget = (3·n)/5 of the survivors
      "bgt AS (SELECT (count(*) * 3) // 5 AS n FROM gq2), " +
      "sct AS (SELECT source, CAST(count(*) AS BIGINT) AS n_source " +
      "FROM gq2 GROUP BY 1), " +
      "wtd AS (SELECT source, n_source, " +
      "CAST(round(sqrt(CAST(n_source AS DOUBLE)) * 1048576) AS BIGINT) AS wt " +
      "FROM sct), " +
      "tot AS (SELECT source, n_source, wt, " +
      "CAST(sum(wt) OVER () AS BIGINT) AS sum_wt FROM wtd), " +
      "bs AS (SELECT source, n_source, bgt.n AS budget, " +
      "(bgt.n * wt) // sum_wt AS base, (bgt.n * wt) % sum_wt AS rem " +
      "FROM tot CROSS JOIN bgt), " +
      "lo AS (SELECT *, CAST(budget - sum(base) OVER () AS BIGINT) AS leftover, " +
      "row_number() OVER (ORDER BY rem DESC, source) AS rk FROM bs), " +
      "qt AS (SELECT source, CAST(base + CASE WHEN rk <= leftover " +
      "THEN 1 ELSE 0 END AS BIGINT) AS quota FROM lo), " +
      s"mfp AS (SELECT doc_id, $fpFold AS fingerprint FROM gq2), " +
      "mr AS (SELECT gg.doc_id, gg.source, " +
      "row_number() OVER (PARTITION BY gg.source " +
      "ORDER BY fingerprint ASC NULLS LAST, gg.doc_id) AS mix_rank " +
      "FROM gq2 gg JOIN mfp USING (doc_id)), " +
      "mx AS (SELECT mr.doc_id FROM mr JOIN qt USING (source) " +
      "WHERE mix_rank <= quota), " +
      // stage 6: 512-token / 8-shard packing of the mixture
      s"tk2 AS (SELECT gq2.doc_id, CAST(len($toksSql) AS BIGINT) AS token_count, " +
      "gq2.doc_id % 8 AS shard FROM gq2 JOIN mx USING (doc_id)), " +
      "cum2 AS (SELECT doc_id, token_count, shard, " +
      "COALESCE(sum(token_count) OVER (PARTITION BY shard ORDER BY doc_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum FROM tk2) " +
      "SELECT doc_id, token_count, CAST(shard AS BIGINT) AS shard, " +
      "CAST(floor(cum / 512.0) AS BIGINT) AS pack_id, " +
      "CAST(cum % 512 AS BIGINT) AS pack_offset FROM cum2 ORDER BY doc_id"
  }

  private[graft] lazy val qualityScoreSql: String =
    "0.5 * least(CAST(len(" + toksSql + ") AS DOUBLE) / 100.0, 1.0) " +
      "+ 0.3 * (1.0 - CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) " +
      "/ CAST(greatest(length(text), 1) AS DOUBLE)) " +
      s"+ 0.2 * (CAST(len(list_filter($toksSql, x -> x IN $stopSql)) AS DOUBLE) " +
      s"/ greatest(CAST(len($toksSql) AS DOUBLE), 1.0))"
}
