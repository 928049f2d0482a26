package graft

import org.apache.spark.sql.functions._

/** The takedown orchestrator over a MIXED registry — the four families
  * the gated query (q_takedown_everywhere: bm25 + minhash) does not
  * cover: ANN index, cluster table, bigram LM, and perceptual-hash
  * signatures. One id batch reaches all four; reads equal
  * rebuild-without-deleted; the same batchId retried is a ledger skip
  * everywhere (load-bearing for the subtractive LM family, where a
  * double-apply would double-unlearn).
  */
class TakedownSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.{Dedup, Multimodal, Similarity, Takedown, TextAnalysis}

  test("streaming takedown gate: stream ≡ batch, replayed trigger is a ledger no-op") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val uid = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val bm = s"tds_bm_$uid"
    val docs = Seq(
      (1L, "apple banana apple kiwi"),
      (2L, "apple cherry plum plum"),
      (3L, "banana banana banana mango")).toDF("doc_id", "text")
    val clones = Seq(
      (201L, "apple banana apple kiwi"),
      (203L, "banana banana banana mango")).toDF("doc_id", "text")
    TextAnalysis.writeSearchIndex(docs.unionByName(clones), bm, buckets = 2)
    TextAnalysis.writeSearchIndex(docs, s"${bm}_ref", buckets = 2)
    try {
      val registry = Seq(Takedown.SearchIndex(bm))
      val in = MemoryStream[(String, Long)]
      val q = graft.streaming.TakedownStream.takedownGateSink(
          in.toDF().toDF("batch_id", "doc_id"), registry)
        .start()
      try {
        // two request batches arrive across two triggers
        in.addData(("req-a", 201L))
        q.processAllAvailable()
        in.addData(("req-b", 203L), ("req-b", 999L)) // 999 foreign: no-op
        q.processAllAvailable()
        def rows(name: String) =
          TextAnalysis.bm25SearchIndexed(spark, name, Seq("apple", "banana"), 5)
            .collect().map(_.toSeq).toSeq
        assert(rows(bm) == rows(s"${bm}_ref"),
          "streamed takedowns must equal the rebuild-without ranking")
        // a REPLAYED trigger (at-least-once delivery re-sends both
        // batches) is a ledger no-op: reads unchanged, no new ledger rows
        in.addData(("req-a", 201L), ("req-b", 203L), ("req-b", 999L))
        q.processAllAvailable()
        assert(rows(bm) == rows(s"${bm}_ref"))
        val ledger = spark.table(s"${bm}_takedowns")
          .select("batch_id").orderBy("batch_id")
          .as[String].collect().toSeq
        assert(ledger == Seq("req-a", "req-b"),
          s"replay must not re-apply: $ledger")
      } finally q.stop()
    } finally {
      TextAnalysis.dropSearchIndex(spark, bm)
      TextAnalysis.dropSearchIndex(spark, s"${bm}_ref")
      Takedown.dropLedger(spark, bm)
    }
  }

  test("deleteEverywhere: mixed registry end-to-end, idempotent retry, ledger") {
    val uid = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val ann = s"td_ann_$uid"; val cl = s"td_cl_$uid"
    val lm = s"td_lm_$uid"; val ph = s"td_ph_$uid"

    // --- corpus + clones (ids >= 100 are the takedown set) -------------
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "spark engines compile query plans into stages now ok"),
      (4L, "completely different words about cooking pasta dinner yes"))
      .toDF("doc_id", "text")
    // clone 101 bridges docs 1/2's near-dup family; clone 103 twins doc 3
    val cloneDocs = Seq(
      (101L, "the quick brown fox jumps over the lazy dog today"),
      (103L, "spark engines compile query plans into stages now ok"))
      .toDF("doc_id", "text")
    val ids = Seq(101L, 103L, 555L) // 555 is foreign to every artifact

    // ANN: index built on the clean corpus, clones upserted (the frozen-
    // quantizer maintenance path), so post-delete reads can equal a clean
    // build exactly
    val rnd = new scala.util.Random(41)
    val vecs = (0 until 40).map { i =>
      val v = Array.fill(8)(0.05 + rnd.nextDouble() * 0.1)
      v(i % 4) = 1.0 + rnd.nextDouble()
      (i.toLong, v.map(_.toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" % 10 === 0)
    Similarity.writeAnnIndex(vecs, ann, centroids = 4, sampleSize = 32, iters = 2)
    Similarity.upsertAnnIndex(spark, ann,
      queries.select(($"vec_id" + 101L).as("vec_id"), $"embedding"))
    val annIds = queries.select("vec_id").as[Long].collect().map(_ + 101L).toSeq

    // cluster table over corpus ∪ clones (a component the deletion SPLITS)
    val allDocs = docs.unionByName(cloneDocs)
    val pairs = Dedup.ngramJaccardPairs(allDocs, 0.5).localCheckpoint(true)
    Dedup.writeClusterTable(allDocs, pairs, cl, buckets = 2)

    // bigram LM over corpus ∪ clones
    TextAnalysis.writeLmTable(allDocs, lm, buckets = 2)

    // phash signatures over corpus ∪ clones (signature-level write)
    val sigs = Seq((1L, 0x1122334455667788L), (2L, 0x1122334455667789L),
      (3L, 0x0F0F0F0F0F0F0F0FL), (101L, 0x1122334455667788L),
      (103L, 0x0F0F0F0F0F0F0F0EL)).toDF("doc_id", "dhash")
    Multimodal.writeSignatureTable(sigs, ph, buckets = 2)
    val phBatch = Seq((1L, 0x1122334455667788L), (3L, 0x0F0F0F0F0F0F0F0FL))
      .toDF("doc_id", "dhash")

    try {
      val registry = Seq(
        Takedown.AnnIndex(ann),
        Takedown.ClusterTable(cl, pairs),
        Takedown.LmTable(lm, cloneDocs),
        Takedown.PhashTable(ph))
      // duplicate registration is a loud error
      intercept[IllegalArgumentException] {
        Takedown.deleteEverywhere(spark, "b1", ids,
          registry :+ Takedown.PhashTable(ph))
      }

      // the audit can DETECT: before deletion every row-keyed artifact
      // still references the clones (the LM is aggregate-count-keyed, 0
      // by construction)
      val pre = Takedown.residualReferences(spark, ids ++ annIds, registry)
      assert(pre.filter(_._1 != "lm").forall(_._3 > 0L),
        s"pre-delete audit must see the clones: $pre")

      val first = Takedown.deleteEverywhere(spark, "b1", ids ++ annIds, registry)
      assert(first.forall(_._3), s"first run must apply everywhere: $first")

      def reads(): Seq[Seq[Any]] = {
        val a = Similarity.annSearchIndexed(spark, ann, queries, k = 5,
          nprobe = 2).orderBy("query_id", "rank")
          .collect().map(_.toSeq).toSeq
        val c = spark.table(s"${cl}_clusters").orderBy("doc_id")
          .collect().map(_.toSeq).toSeq
        val l = TextAnalysis.bigramScoreIndexed(spark, lm, docs)
          .orderBy("doc_id").collect().map(_.toSeq).toSeq
        val p = Multimodal.screenSignatures(spark, ph, phBatch, maxHamming = 1)
          .orderBy("batch_doc", "seen_doc").collect().map(_.toSeq).toSeq
        a ++ (c ++ (l ++ p))
      }
      val after = reads()

      // rebuild-without-deleted equality, family by family
      val annRef = s"td_annref_$uid"; val clRef = s"td_clref_$uid"
      val lmRef = s"td_lmref_$uid"; val phRef = s"td_phref_$uid"
      Similarity.writeAnnIndex(vecs, annRef, centroids = 4, sampleSize = 32,
        iters = 2)
      val cleanPairs = Dedup.ngramJaccardPairs(docs, 0.5)
      Dedup.writeClusterTable(docs, cleanPairs, clRef, buckets = 2)
      TextAnalysis.writeLmTable(docs, lmRef, buckets = 2)
      Multimodal.writeSignatureTable(sigs.filter($"doc_id" < 100), phRef,
        buckets = 2)
      try {
        val ref =
          Similarity.annSearchIndexed(spark, annRef, queries, k = 5,
              nprobe = 2).orderBy("query_id", "rank")
            .collect().map(_.toSeq).toSeq ++
          (spark.table(s"${clRef}_clusters").orderBy("doc_id")
            .collect().map(_.toSeq).toSeq ++
          (TextAnalysis.bigramScoreIndexed(spark, lmRef, docs)
            .orderBy("doc_id").collect().map(_.toSeq).toSeq ++
          Multimodal.screenSignatures(spark, phRef, phBatch, maxHamming = 1)
            .orderBy("batch_doc", "seen_doc").collect().map(_.toSeq).toSeq))
        assert(after == ref,
          "post-takedown reads must equal rebuild-without-deleted")
      } finally {
        Similarity.dropAnnIndex(spark, annRef)
        Dedup.dropClusterTable(spark, clRef)
        TextAnalysis.dropLmTable(spark, lmRef)
        Multimodal.dropPhashTable(spark, phRef)
      }

      // idempotent retry: same batchId skips everywhere, reads unchanged
      val retry = Takedown.deleteEverywhere(spark, "b1", ids ++ annIds, registry)
      assert(retry.forall(!_._3), s"retry must skip everywhere: $retry")
      assert(reads() == after, "a retried batch must not change any read")

      // ledgers recorded one row per artifact+batch
      for (n <- Seq(ann, cl, lm, ph)) {
        val rows = spark.table(s"${n}_takedowns")
          .select("batch_id", "family").collect().map(_.toSeq).toSeq
        assert(rows.length == 1 && rows.head.head == "b1",
          s"ledger for $n: $rows")
      }

      // compliance audit: zero LIVE rows reference the deleted ids
      val audit = Takedown.residualReferences(spark, ids ++ annIds, registry)
      assert(audit.forall(_._3 == 0L), s"residual references remain: $audit")

      // physical purge: tombstones fold in, reads unchanged, audit still 0
      Takedown.compactEverywhere(spark, registry)
      for (n <- Seq(ann, ph))
        assert(!spark.catalog.tableExists(s"${n}_deletes"),
          s"$n tombstones must be folded by compactEverywhere")
      assert(reads() == after, "compaction must not change any read")
      assert(Takedown.residualReferences(spark, ids ++ annIds, registry)
        .forall(_._3 == 0L))
    } finally {
      Similarity.dropAnnIndex(spark, ann); Takedown.dropLedger(spark, ann)
      Dedup.dropClusterTable(spark, cl); Takedown.dropLedger(spark, cl)
      TextAnalysis.dropLmTable(spark, lm); Takedown.dropLedger(spark, lm)
      Multimodal.dropPhashTable(spark, ph); Takedown.dropLedger(spark, ph)
    }
  }

  // shared quantized-family fixture: 40 clustered 8-dim vectors + 4 clones
  private def quantFixture() = {
    val rnd = new scala.util.Random(43)
    val base = (0 until 40).map { i =>
      val v = Array.fill(8)(0.05 + rnd.nextDouble() * 0.1)
      v(i % 4) = 1.0 + rnd.nextDouble()
      (i.toLong, v.map(_.toFloat).toSeq)
    }
    val clones = base.filter(_._1 % 10 == 0)
      .map { case (id, v) => (id + 500L, v) }
    (base.toDF("vec_id", "embedding"), clones.toDF("vec_id", "embedding"),
      clones.map(_._1))
  }

  test("quantized index families: deleteEverywhere reaches SQ/PQ/IVFADC, " +
      "tombstoned ≡ compacted, residual audit 0") {
    val uid = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val sq = s"td_sq_$uid"; val pq = s"td_pq_$uid"; val iv = s"td_iv_$uid"
    val (vecs, clones, cloneIds) = quantFixture()
    val all = vecs.unionByName(clones)
    val queries = vecs.filter($"vec_id" % 10 === 0)
    Similarity.writeSqIndex(all, sq)
    Similarity.writePqIndex(all, pq, m = 4, ksub = 8, sampleSize = 64)
    Similarity.writeIvfPqResIndex(all, iv, centroids = 4, m = 4, ksub = 8,
      sampleSize = 64, buckets = 2)
    try {
      val registry = Seq(Takedown.SqIndex(sq), Takedown.PqIndex(pq),
        Takedown.IvfPqResIndex(iv))
      def reads(): Seq[Seq[Any]] =
        Similarity.sqSearchIndexed(spark, sq, queries, k = 5)
          .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq ++
          (Similarity.pqSearchIndexed(spark, pq, queries, k = 5)
            .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq ++
          Similarity.ivfPqResSearchIndexed(spark, iv, queries, k = 5,
              nprobe = 2)
            .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq)
      val before = reads()
      val pre = Takedown.residualReferences(spark, cloneIds, registry)
      assert(pre.forall(_._3 > 0L), s"pre-delete audit must see clones: $pre")

      val first = Takedown.deleteEverywhere(spark, "q1", cloneIds, registry)
      assert(first.forall(_._3), s"first run must apply everywhere: $first")
      val after = reads()
      assert(after != before,
        "deleting clone codes must change at least one quantized read")
      assert(Takedown.residualReferences(spark, cloneIds, registry)
        .forall(_._3 == 0L), "live codes must not reference deleted ids")

      // SQ params are exact whole-corpus min/max — copies don't move them,
      // so the SQ read must equal a REBUILD without the clones to the bit
      val sqRef = s"td_sqref_$uid"
      Similarity.writeSqIndex(vecs, sqRef)
      try assert(
        Similarity.sqSearchIndexed(spark, sq, queries, k = 5)
          .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq ==
          Similarity.sqSearchIndexed(spark, sqRef, queries, k = 5)
            .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq,
        "SQ tombstoned reads must equal rebuild-without-deleted")
      finally Similarity.dropSqIndex(spark, sqRef)

      // retry skips; physical purge folds tombstones, reads unchanged
      val retry = Takedown.deleteEverywhere(spark, "q1", cloneIds, registry)
      assert(retry.forall(!_._3), s"retry must skip everywhere: $retry")
      Takedown.compactEverywhere(spark, registry)
      for (n <- Seq(sq, pq, iv))
        assert(!spark.catalog.tableExists(s"${n}_deletes"),
          s"$n tombstones must fold on compactEverywhere")
      assert(reads() == after, "compaction must not change any read")
    } finally {
      Similarity.dropSqIndex(spark, sq); Takedown.dropLedger(spark, sq)
      Similarity.dropPqIndex(spark, pq); Takedown.dropLedger(spark, pq)
      Similarity.dropIvfPqResIndex(spark, iv); Takedown.dropLedger(spark, iv)
    }
  }

  test("ground truth + line-df: deleteEverywhere reaches both; truth rows " +
      "drop on either side; line-df unlearn equals rebuild-without") {
    val uid = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val gt = s"td_gt_$uid"; val ldf = s"td_ldf_$uid"
    val (vecs, clones, cloneIds) = quantFixture()
    val queries = vecs.filter($"vec_id" % 10 === 0)
    // clone 510 IS a query id clone: deleting it must drop rows on the
    // query_id side too, not just neighbor_id
    Similarity.writeGroundTruth(vecs.unionByName(clones),
      queries.unionByName(clones.filter($"vec_id" === 510L)), k = 3,
      name = gt, buckets = 2)

    // seen state = 4 originals + 2 s2 clones carrying "cloned promo
    // line"; the BATCH (new docs, not in the state) has that line too.
    // With clones: s2 n_docs = 4+1, df = 2+1 = 3 ≥ thr 3 → stripped.
    // After unlearning the clones: n_docs = 2+1, df = 0+1 < thr 2 →
    // kept. The takedown provably flips a verdict.
    val seenDocs = Seq(
      (1L, "alpha beta\ncommon s1 footer", "s1"),
      (2L, "gamma delta\ncommon s1 footer", "s1"),
      (3L, "iota kappa\nlambda mu", "s2"),
      (4L, "nu xi\nomicron pi", "s2"))
      .toDF("doc_id", "text", "source")
    val cloneDocs = Seq(
      (103L, "cloned promo line\nrho sigma", "s2"),
      (104L, "cloned promo line\ntau upsilon", "s2"))
      .toDF("doc_id", "text", "source")
    Dedup.writeLineDfTable(seenDocs.unionByName(cloneDocs), ldf, buckets = 2)
    try {
      val registry = Seq(Takedown.GroundTruth(gt),
        Takedown.LineDf(ldf, cloneDocs))
      val batch = Seq(
        (11L, "fresh one\ncommon s1 footer", "s1"),
        (14L, "cloned promo line\nbrand new line", "s2"))
        .toDF("doc_id", "text", "source")
      def strip() = Dedup.boilerplateStripAgainst(spark, ldf, batch)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      val preStrip = strip()
      val pre = Takedown.residualReferences(
        spark, cloneIds ++ Seq(103L, 104L), registry)
      assert(pre.find(_._1 == "gtruth").exists(_._3 > 0L),
        s"pre-delete truth must reference clones: $pre")

      val ids = cloneIds ++ Seq(103L, 104L)
      val first = Takedown.deleteEverywhere(spark, "g1", ids, registry)
      assert(first.forall(_._3), s"first run must apply everywhere: $first")

      // truth: no live row references a deleted id on EITHER side; the
      // 510-keyed query list is gone entirely (shrunken-truth contract)
      assert(Takedown.residualReferences(spark, ids, registry)
        .forall(_._3 == 0L))
      val liveTruth = Similarity.recallAtKIndexed(spark, gt,
        Similarity.bruteForceTopK(vecs, queries, 3), 3)
      assert(liveTruth.filter($"query_id" === 510L).isEmpty,
        "deleted query id must leave the truth")
      assert(liveTruth.count() > 0, "surviving queries still evaluate")

      // line-df: the unlearned state answers EXACTLY like a rebuild
      // without the clones (integer partials — exact to the bit)
      val ldfRef = s"td_ldfref_$uid"
      Dedup.writeLineDfTable(seenDocs, ldfRef, buckets = 2)
      try {
        val refStrip = Dedup.boilerplateStripAgainst(spark, ldfRef, batch)
          .orderBy("doc_id").collect().map(_.toSeq).toSeq
        val postStrip = strip()
        assert(postStrip == refStrip,
          "line-df unlearn must equal rebuild-without-deleted")
        assert(postStrip != preStrip,
          "the clones must have changed strip verdicts (else no-op gate)")
      } finally Dedup.dropLineDfTable(spark, ldfRef)

      // retry skips both (subtractive line-df: load-bearing), compaction
      // folds the truth tombstones physically
      val retry = Takedown.deleteEverywhere(spark, "g1", ids, registry)
      assert(retry.forall(!_._3), s"retry must skip: $retry")
      assert(strip() == strip(), "idempotent reads")
      Takedown.compactEverywhere(spark, registry)
      assert(!spark.catalog.tableExists(s"${gt}_deletes"))
      assert(Takedown.residualReferences(spark, ids, registry)
        .forall(_._3 == 0L))
    } finally {
      Similarity.dropGroundTruth(spark, gt); Takedown.dropLedger(spark, gt)
      Dedup.dropLineDfTable(spark, ldf); Takedown.dropLedger(spark, ldf)
    }
  }

  test("dsir model: deleteEverywhere unlearn equals refit-without; retry " +
      "skips; never-fit batch throws; audit sweep finds the family") {
    import graft.functions.Sampling
    val uid = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val dm = s"td_dsir_$uid"
    // target = in-domain; raw = crawl INCLUDING the two docs that will be
    // taken down — their bigrams shape cr and the totals term
    val target = Seq(
      (1L, "clean science text about physics and method"),
      (2L, "careful method and physics discussion text"))
      .toDF("doc_id", "text")
    val keptRaw = Seq(
      (10L, "random crawl chatter about shoes and sales"),
      (11L, "physics method text buried in crawl noise"))
      .toDF("doc_id", "text")
    val deletedRaw = Seq(
      (12L, "spam spam click here buy now spam spam"),
      (13L, "more spam and sales chatter click now"))
      .toDF("doc_id", "text")
    Sampling.writeDsirModel(spark, dm, keptRaw.unionByName(deletedRaw),
      target, buckets = 64)
    try {
      val registry = Seq(Takedown.DsirModel(dm, deletedRaw, side = "raw"))
      // the family is sweep-visible: drop it from a registry → loud row
      val missing = Takedown.auditRegistry(spark, Seq.empty[Takedown.Artifact]
        :+ Takedown.SearchIndex("nonexistent"))
      assert(missing.contains(("dsir", dm.toLowerCase)),
        s"unregistered DSIR model must be flagged: $missing")

      val pre = spark.table(s"${dm}_ratios")
        .orderBy("bucket").collect().map(_.toSeq).toSeq
      val first = Takedown.deleteEverywhere(spark, "d1",
        Seq(12L, 13L), registry)
      assert(first.forall(_._3), s"first run must apply: $first")

      // the unlearned ratio table equals a refit WITHOUT the deleted
      // docs, row for row including the quantized lrq (integer counts +
      // the shared quantize expression — exact to the bit)
      val ref = s"td_dsirref_$uid"
      Sampling.writeDsirModel(spark, ref, keptRaw, target, buckets = 64)
      try {
        val unlearned = spark.table(s"${dm}_ratios")
          .orderBy("bucket").collect().map(_.toSeq).toSeq
        val refit = spark.table(s"${ref}_ratios")
          .orderBy("bucket").collect().map(_.toSeq).toSeq
        assert(unlearned == refit,
          "DSIR unlearn must equal refit-without-deleted to the bit")
        assert(unlearned != pre,
          "the deleted docs must have changed the model (else no-op gate)")
        // and the scoring face agrees end to end
        val batch = Seq((20L, "physics method text"),
          (21L, "buy now sales chatter")).toDF("doc_id", "text")
        val a = Sampling.dsirScoreIndexed(spark, dm, batch)
          .orderBy("doc_id").collect().map(_.toSeq).toSeq
        val b = Sampling.dsirScoreIndexed(spark, ref, batch)
          .orderBy("doc_id").collect().map(_.toSeq).toSeq
        assert(a == b, "unlearned scoring must equal refit scoring")
      } finally Sampling.dropDsirModel(spark, ref)

      // retry = ledger skip (subtractive family: double-apply would
      // double-subtract) and residual is 0 by construction
      val retry = Takedown.deleteEverywhere(spark, "d1",
        Seq(12L, 13L), registry)
      assert(retry.forall(!_._3), s"retry must skip: $retry")
      assert(Takedown.residualReferences(spark, Seq(12L, 13L), registry)
        .forall(_._3 == 0L))

      // an over-subtraction (here: the FULL original raw corpus against a
      // model that already unlearned deletedRaw — more occurrences than
      // remain, so SOME bucket must go negative by pigeonhole) → loud
      // throw, model unchanged
      val before = spark.table(s"${dm}_ratios")
        .orderBy("bucket").collect().map(_.toSeq).toSeq
      intercept[IllegalArgumentException] {
        Sampling.deleteFromDsirModel(spark, dm,
          keptRaw.unionByName(deletedRaw), side = "raw")
      }
      val after = spark.table(s"${dm}_ratios")
        .orderBy("bucket").collect().map(_.toSeq).toSeq
      assert(before == after, "failed unlearn must not publish")
    } finally {
      Sampling.dropDsirModel(spark, dm); Takedown.dropLedger(spark, dm)
    }
  }

  test("ledger ids-hash guard: a reused batchId with different ids throws " +
      "loudly instead of silently skipping") {
    val uid = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val ph = s"td_hash_$uid"
    val sigs = Seq((1L, 11L), (2L, 22L), (3L, 33L)).toDF("doc_id", "dhash")
    Multimodal.writeSignatureTable(sigs, ph, buckets = 2)
    try {
      val registry = Seq(Takedown.PhashTable(ph))
      Takedown.deleteEverywhere(spark, "b-split", Seq(1L), registry)
      // same ids, any order/dups: canonicalization makes it a clean skip
      val r = Takedown.deleteEverywhere(spark, "b-split", Seq(1L, 1L), registry)
      assert(r.forall(!_._3), "identical id set must skip")
      // the split-trigger fragment: same batchId, different ids → loud
      val e = intercept[IllegalStateException] {
        Takedown.deleteEverywhere(spark, "b-split", Seq(2L), registry)
      }
      assert(e.getMessage.contains("DIFFERENT id set"), e.getMessage)
      // id 2 was NOT silently dropped: a fresh batchId applies it
      val r2 = Takedown.deleteEverywhere(spark, "b-split-2", Seq(2L), registry)
      assert(r2.forall(_._3))
      assert(Takedown.residualReferences(spark, Seq(1L, 2L), registry)
        .forall(_._3 == 0L))
    } finally {
      Multimodal.dropPhashTable(spark, ph); Takedown.dropLedger(spark, ph)
    }
  }

  test("auditRegistry names unregistered artifact families loudly") {
    val uid = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val bm = s"td_aud_bm_$uid"; val sq = s"td_aud_sq_$uid"
    val ldf = s"td_aud_ldf_$uid"; val ssi = s"td_aud_ssi_$uid"
    val docs = Seq((1L, "one two three", "s1"), (2L, "four five six", "s1"))
      .toDF("doc_id", "text", "source")
    val (vecs, _, _) = quantFixture()
    TextAnalysis.writeSearchIndex(docs, bm, buckets = 2)
    Similarity.writeSqIndex(vecs, sq)
    Dedup.writeLineDfTable(docs, ldf, buckets = 2)
    Dedup.writeSubstringIndex(docs, ssi, windowLen = 8, buckets = 2)
    try {
      // full registry → none of OUR names are flagged
      val full = Seq(Takedown.SearchIndex(bm), Takedown.SqIndex(sq),
        Takedown.LineDf(ldf, docs), Takedown.SubstringIndex(ssi))
      val ours = Set(bm, sq, ldf, ssi).map(_.toLowerCase)
      assert(Takedown.auditRegistry(spark, full)
        .forall(r => !ours(r._2)), "registered artifacts must not be flagged")
      // drop the SQ + substring indexes from the registry → NAMED, not
      // silent
      val partial = Seq(Takedown.SearchIndex(bm), Takedown.LineDf(ldf, docs))
      val missing = Takedown.auditRegistry(spark, partial)
      assert(missing.contains(("sq", sq.toLowerCase)),
        s"unregistered SQ index must be flagged: $missing")
      assert(missing.contains(("substr", ssi.toLowerCase)),
        s"unregistered substring index must be flagged: $missing")
      assert(!missing.exists(r => r._2 == bm.toLowerCase && r._1 == "bm25"))
    } finally {
      TextAnalysis.dropSearchIndex(spark, bm)
      Similarity.dropSqIndex(spark, sq)
      Dedup.dropLineDfTable(spark, ldf)
      Dedup.dropSubstringIndex(spark, ssi)
    }
  }

  test("substring index via deleteEverywhere: tombstoned screen equals " +
      "rebuild-without; residual 0; compaction folds") {
    val uid = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val ssi = s"td_ssi_$uid"
    val seen = Seq(
      (1L, "the quick brown fox jumps over the lazy dog at dawn"),
      (2L, "a completely different sentence lives in this document"))
      .toDF("doc_id", "text")
    // clone 101 copies the BATCH doc: if its windows survive deletion,
    // the whole batch doc excises and the equality below fails
    val batch = Seq(
      (11L, "prefix the quick brown fox jumps over the lazy dog at dawn " +
        "suffix")).toDF("doc_id", "text")
    val clones = batch.select(($"doc_id" + 100L).as("doc_id"), $"text")
    Dedup.writeSubstringIndex(seen.unionByName(clones), ssi,
      windowLen = 12, buckets = 2)
    val ref = s"${ssi}_ref"
    Dedup.writeSubstringIndex(seen, ref, windowLen = 12, buckets = 2)
    try {
      val registry = Seq(Takedown.SubstringIndex(ssi))
      assert(Takedown.residualReferences(spark, Seq(111L), registry)
        .forall(_._3 > 0L), "pre-delete audit must see the clone")
      val first = Takedown.deleteEverywhere(spark, "s1", Seq(111L), registry)
      assert(first.forall(_._3))
      def screen(n: String) = Dedup.substringScreen(spark, n, batch)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      val after = screen(ssi)
      assert(after == screen(ref),
        "tombstoned screen must equal rebuild-without-deleted")
      // the seen passage still excises (deletion removed ONLY the clone)
      assert(after.head(3).asInstanceOf[Long] > 0L,
        "the genuinely-seen passage must still be excised")
      assert(Takedown.residualReferences(spark, Seq(111L), registry)
        .forall(_._3 == 0L))
      val retry = Takedown.deleteEverywhere(spark, "s1", Seq(111L), registry)
      assert(retry.forall(!_._3))
      Takedown.compactEverywhere(spark, registry)
      assert(!spark.catalog.tableExists(s"${ssi}_deletes"))
      assert(screen(ssi) == after)
    } finally {
      Dedup.dropSubstringIndex(spark, ssi); Takedown.dropLedger(spark, ssi)
      Dedup.dropSubstringIndex(spark, ref)
    }
  }

  test("compactLedgers: tombstone-family rows outside the retain window " +
      "fold away; a replayed old batch re-applies harmlessly; subtractive " +
      "ledgers are retained") {
    val uid = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val ph = s"td_lc_ph_$uid"; val lm = s"td_lc_lm_$uid"
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "epsilon zeta eta theta"),
      (101L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val deleted = docs.filter($"doc_id" === 101L)
    val sigs = Seq((1L, 11L), (2L, 22L), (101L, 11L)).toDF("doc_id", "dhash")
    Multimodal.writeSignatureTable(sigs, ph, buckets = 2)
    TextAnalysis.writeLmTable(docs, lm, buckets = 2)
    try {
      // content-dependent families carry PER-BATCH frames: the registry
      // for each batch names the same artifacts with that batch's docs
      val registry = Seq(Takedown.PhashTable(ph),
        Takedown.LmTable(lm, deleted))
      val registry2 = Seq(Takedown.PhashTable(ph),
        Takedown.LmTable(lm, docs.filter($"doc_id" === 999L)))
      Takedown.deleteEverywhere(spark, "old-1", Seq(101L), registry)
      Takedown.deleteEverywhere(spark, "new-1", Seq(999L), registry2)
      val lmScore = TextAnalysis.bigramScoreIndexed(spark, lm,
          docs.filter($"doc_id" < 100))
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      Takedown.compactEverywhere(spark, registry)
      Takedown.compactLedgers(spark, registry, retainBatches = Seq("new-1"))
      // phash ledger folded to the retain window; LM ledger untouched
      assert(spark.table(s"${ph}_takedowns").select("batch_id")
        .as[String].collect().toSeq == Seq("new-1"))
      assert(spark.table(s"${lm}_takedowns").select("batch_id")
        .orderBy("batch_id").as[String].collect().toSeq ==
        Seq("new-1", "old-1"),
        "subtractive LM ledger must retain all rows (replay protection)")
      // a replay of the compacted-away batch re-applies HARMLESSLY on the
      // tombstone family — and the LM family still skips via its ledger
      val replay = Takedown.deleteEverywhere(spark, "old-1", Seq(101L), registry)
      assert(replay.find(_._1 == "phash").exists(_._3),
        "compacted-away tombstone batch re-applies")
      assert(replay.find(_._1 == "lm").exists(!_._3),
        "LM ledger must still protect against the double-unlearn")
      val reads = Multimodal.screenSignatures(spark, ph,
          Seq((1L, 11L)).toDF("doc_id", "dhash"), maxHamming = 0)
        .orderBy("batch_doc", "seen_doc").collect().map(_.toSeq).toSeq
      assert(!reads.exists(_.contains(101L)), "101 stays deleted")
      assert(TextAnalysis.bigramScoreIndexed(spark, lm,
          docs.filter($"doc_id" < 100))
        .orderBy("doc_id").collect().map(_.toSeq).toSeq == lmScore,
        "LM must be unchanged by the replay")
    } finally {
      Multimodal.dropPhashTable(spark, ph); Takedown.dropLedger(spark, ph)
      TextAnalysis.dropLmTable(spark, lm); Takedown.dropLedger(spark, lm)
    }
  }

  test("frontier table: screen/upsert lifecycle; deleteEverywhere re-opens a " +
      "taken-down doc's canonical; audit sweeps _frontier") {
    val uid = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val fr = s"td_front_$uid"
    def urls(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "url")
    val seen = urls(
      (1L, "https://a.com/x"),
      (2L, "HTTPS://WWW.A.com:443/x?utm_source=z"), // dup of 1
      (3L, "https://b.com/y"))
    TextAnalysis.writeFrontierTable(seen, fr, buckets = 2)
    try {
      // screen: seen canonicals blocked; new one fetches once per batch
      val batch = urls(
        (10L, "https://a.com/x/"),        // seen (slash variant)
        (11L, "https://c.com/new"),       // novel -> fetch
        (12L, "https://C.COM/new#frag"),  // same novel, higher id -> no
        (13L, "garbage"))                 // unparseable -> always fetch
      val s1 = TextAnalysis.screenFrontier(spark, fr, batch)
        .select("doc_id", "should_fetch")
        .as[(Long, Boolean)].collect().toMap
      assert(s1 == Map(10L -> false, 11L -> true, 12L -> false, 13L -> true))
      TextAnalysis.upsertFrontierTable(spark, fr, batch)
      // replay after upsert: only the unparseable row still fetches
      val s2 = TextAnalysis.screenFrontier(spark, fr, batch)
        .select("doc_id", "should_fetch").as[(Long, Boolean)].collect().toMap
      assert(s2 == Map(10L -> false, 11L -> false, 12L -> false, 13L -> true))
      // takedown of doc 1 re-opens a.com/x (first_doc tombstoned);
      // b.com/y (doc 3) stays seen
      val rep = Takedown.deleteEverywhere(spark, "front-batch", Seq(1L),
        Seq(Takedown.FrontierTable(fr)))
      assert(rep == Seq(("frontier", fr, true)))
      val s3 = TextAnalysis.screenFrontier(spark, fr,
          urls((20L, "https://a.com/x"), (21L, "https://b.com/y")))
        .select("doc_id", "should_fetch").as[(Long, Boolean)].collect().toMap
      assert(s3 == Map(20L -> true, 21L -> false),
        "a taken-down doc's canonical must become re-fetchable")
      // residual audit counts the tombstoned row as gone; compaction
      // purges it physically and the read is unchanged
      assert(Takedown.residualReferences(spark, Seq(1L),
        Seq(Takedown.FrontierTable(fr))) == Seq(("frontier", fr, 0L)))
      Takedown.compactEverywhere(spark, Seq(Takedown.FrontierTable(fr)))
      assert(!spark.catalog.tableExists(s"${fr}_frontier_deletes"))
      val s4 = TextAnalysis.screenFrontier(spark, fr,
          urls((20L, "https://a.com/x"), (21L, "https://b.com/y")))
        .select("doc_id", "should_fetch").as[(Long, Boolean)].collect().toMap
      assert(s4 == s3, "compaction must not change screen verdicts")
      // the registry-completeness sweep knows the _frontier convention
      val missing = Takedown.auditRegistry(spark, Seq.empty[Takedown.Artifact])
      assert(missing.contains(("frontier", fr.toLowerCase)),
        s"unregistered frontier must be flagged: $missing")
    } finally {
      TextAnalysis.dropFrontierTable(spark, fr)
      Takedown.dropLedger(spark, fr)
    }
  }

  test("bq words + raw-vector tables: deleteEverywhere reaches both, search " +
      "honors tombstones, residual 0, audit sweeps _words and _vectors") {
    val uid = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val bq = s"td_bq_$uid"; val vt = s"td_vec_$uid"
    val (base, clones, cloneIds) = quantFixture()
    // exact-copy clones would surface at Hamming distance 0 — the
    // strongest possible leak if deletion misses either artifact
    val corpus = base.unionByName(clones)
    graft.functions.Similarity.writeBqIndex(corpus, bq, dims = 8)
    graft.functions.Similarity.writeVecTable(corpus, vt)
    try {
      val queries = base.filter($"vec_id" % 10 === 0)
      val reg = Seq(Takedown.BqIndex(bq), Takedown.VecTable(vt))
      // completeness sweep: an EMPTY registry must name both families —
      // the r14 "MISSING ONE means the content is still findable" lesson
      // applied to the two newest artifact kinds
      val missing = Takedown.auditRegistry(spark, Seq.empty[Takedown.Artifact])
      assert(missing.contains(("bq", bq.toLowerCase)),
        s"unregistered BQ words index must be flagged: $missing")
      assert(missing.contains(("vec", vt.toLowerCase)),
        s"unregistered raw-vector table must be flagged: $missing")
      assert(Takedown.auditRegistry(spark, reg)
        .forall(r => r._2 != bq.toLowerCase && r._2 != vt.toLowerCase))
      // delete the clones through the orchestrator; retry is a ledger skip
      val first = Takedown.deleteEverywhere(spark, "bqvec-1", cloneIds, reg)
      assert(first == Seq(("bq", bq, true), ("vec", vt, true)))
      val retry = Takedown.deleteEverywhere(spark, "bqvec-1", cloneIds, reg)
      assert(retry == Seq(("bq", bq, false), ("vec", vt, false)))
      // the persisted two-stage search must answer as if the clones never
      // existed: rebuild-without equality
      val cleanBq = s"${bq}_clean"; val cleanVt = s"${vt}_clean"
      graft.functions.Similarity.writeBqIndex(base, cleanBq, dims = 8)
      graft.functions.Similarity.writeVecTable(base, cleanVt)
      try {
        def read(b: String, v: String) =
          graft.functions.Similarity.bqRefinedSearchIndexed(spark, b, v,
              queries, k = 5, shortlist = 20, dims = 8)
            .orderBy("query_id", "rank")
            .select("query_id", "neighbor_id", "rank")
            .as[(Long, Long, Int)].collect().toSeq
        val tombstoned = read(bq, vt)
        val rebuilt = read(cleanBq, cleanVt)
        assert(tombstoned.nonEmpty && tombstoned == rebuilt,
          "tombstoned BQ+vec search must equal rebuild-without-deleted")
        // residual audit: zero live references to the deleted ids
        assert(Takedown.residualReferences(spark, cloneIds, reg) ==
          Seq(("bq", bq, 0L), ("vec", vt, 0L)))
        // physical purge; read unchanged
        Takedown.compactEverywhere(spark, reg)
        assert(!spark.catalog.tableExists(s"${bq}_deletes"))
        assert(!spark.catalog.tableExists(s"${vt}_deletes"))
        assert(read(bq, vt) == rebuilt,
          "compaction must not change search results")
      } finally {
        graft.functions.Similarity.dropBqIndex(spark, cleanBq)
        graft.functions.Similarity.dropVecTable(spark, cleanVt)
      }
    } finally {
      graft.functions.Similarity.dropBqIndex(spark, bq)
      graft.functions.Similarity.dropVecTable(spark, vt)
      Takedown.dropLedger(spark, bq)
      Takedown.dropLedger(spark, vt)
    }
  }

  test("canary audit closes the unlearning loop: deleteFromLmTable restores the baseline rank") {
    import graft.oracles.PipelineOracles.canaryCandidates
    // the memorization audit DRIVES the takedown, and exact unlearning is
    // verified by the audit itself: insert the 16x canary, fit the stored
    // LM, read rank 1; unlearn the canary documents and the SAME audit
    // must read exactly what a from-scratch fit without them reads
    val host = (0 until 30).map(d =>
      (d.toLong, s"spark query join window agg stream doc$d"))
      .toDF("doc_id", "text")
    val cands = canaryCandidates.toDF("reps", "cand_id", "ctext")
    val canaryDocs = canaryCandidates.filter(t => t._1 == 16 && t._2 == 0)
      .flatMap { case (c, _, t) =>
        (0 until c).map(i => (2000000L + c * 1000L + i, t)) }
      .toDF("doc_id", "text")
    val uid = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val poisoned = s"graft_canary_a_$uid"; val clean = s"graft_canary_b_$uid"
    try {
      TextAnalysis.writeLmTable(host.unionByName(canaryDocs), poisoned)
      TextAnalysis.writeLmTable(host, clean)
      def audit(name: String) =
        TextAnalysis.canaryRankIndexed(spark, name, cands)
          .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
          .sortBy(_._1).toSeq
      val before = audit(poisoned)
      assert(before.find(_._1 == 16L).get._2 == 1L,
        "the 16x-inserted canary must rank first before unlearning")
      TextAnalysis.deleteFromLmTable(spark, poisoned, canaryDocs)
      val after = audit(poisoned)
      val baseline = audit(clean)
      assert(after == baseline,
        "unlearned model must audit EXACTLY like a fit that never saw the canaries")
      assert(after.find(_._1 == 16L).get._2 > 1L,
        "the canary's memorization signal must be gone after unlearning")
    } finally {
      TextAnalysis.dropLmTable(spark, poisoned)
      TextAnalysis.dropLmTable(spark, clean)
    }
  }
}
