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
}
