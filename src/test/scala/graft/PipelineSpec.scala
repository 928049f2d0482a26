package graft

import graft.functions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-data pipeline operators: dedup, similarity, text, multimodal. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  test("ngrams: trigram shingles, short-doc guard") {
    val out = docs((1L, "a b c d"), (2L, "x y"), (3L, "p q r"))
      .select($"doc_id", Dedup.ngrams($"text").as("ng")).orderBy("doc_id")
      .as[(Long, Seq[String])].collect()
    assert(out(0)._2.toSet == Set("a b c", "b c d"))
    assert(out(1)._2.isEmpty)
    assert(out(2)._2 == Seq("p q r"))
  }

  test("exact dedup groups identical texts, min doc_id representative") {
    val out = Dedup.exact(docs((5L, "same text"), (2L, "same text"), (9L, "other")))
      .orderBy("doc_id").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("doc_id") == 2L && out(0).getAs[Long]("dup_count") == 2L)
    assert(out(1).getAs[Long]("doc_id") == 9L && out(1).getAs[Long]("dup_count") == 1L)
  }

  private val nearDupDocs = docs(
    (1L, "the quick brown fox jumps over the lazy dog today"),
    (2L, "the quick brown fox jumps over the lazy dog tonight"), // near-dup of 1
    (3L, "completely different words about spark query engines here"),
    (4L, "the quick brown fox jumps over the lazy dog today"))    // exact dup of 1

  test("ngram Jaccard pairs: exact dup = 1.0, near-dup above threshold") {
    val pairs = Dedup.ngramJaccardPairs(nearDupDocs, 0.5)
      .orderBy("doc_a", "doc_b")
      .as[(Long, Long, Double)].collect()
    val asMap = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(asMap((1L, 4L)) == 1.0)
    assert(asMap((1L, 2L)) > 0.5 && asMap((1L, 2L)) < 1.0)
    assert(asMap.contains((2L, 4L)))
    assert(!asMap.keys.exists(k => k._1 == 3L || k._2 == 3L))
  }

  test("minhash LSH finds the same near-dups as exact Jaccard here") {
    val exact = Dedup.ngramJaccardPairs(nearDupDocs, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashNearDups(nearDupDocs, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(lsh == exact)
  }

  test("simhash64: deterministic, zero Hamming for dups, small for near-dups") {
    val sigs = nearDupDocs
      .select($"doc_id", SimHash.simhash64(TextAnalysis.tokens($"text")).as("sig"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(4L))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(2L)) < 16)
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) > 16)
    // interpreted eval agrees with the codegen path
    val row = Seq(Seq("the", "quick")).toDF("t")
      .select(SimHash.simhash64($"t")).collect().head.getLong(0)
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val direct = SimHash.compute(ArrayData.toArrayData(
      Array(UTF8String.fromString("the"), UTF8String.fromString("quick"))))
    assert(row == direct)
    val pairs = Dedup.simhashNearDups(nearDupDocs, maxHamming = 16)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)) && pairs.contains((1L, 2L)))
  }

  private def vecs(rows: (Long, Seq[Float])*): DataFrame =
    rows.toDF("vec_id", "embedding")

  private val embFixture = vecs(
    (0L, Seq(1f, 0f, 0f, 0f)),
    (1L, Seq(0.9f, 0.1f, 0f, 0f)),   // close to 0
    (2L, Seq(0f, 1f, 0f, 0f)),       // orthogonal to 0
    (3L, Seq(-1f, 0f, 0f, 0f)))      // opposite of 0

  test("embedding near-dups via sign-LSH + cosine verify") {
    val out = Dedup.embeddingNearDups(embFixture, 0.9, bands = 2, bitsPerBand = 2)
      .as[(Long, Long, Double)].collect()
    assert(out.map(p => (p._1, p._2)).toSet == Set((0L, 1L)))
    assert(out.head._3 > 0.99)
  }

  test("brute-force top-k cosine: exact ranking, deterministic") {
    val out = Similarity.bruteForceTopK(embFixture,
      embFixture.filter($"vec_id" === 0), k = 3)
      .as[(Long, Long, Int, Double)].collect().sortBy(_._3)
    assert(out.map(_._2).toSeq == Seq(1L, 2L, 3L)) // by descending cosine
    // 1e-6: the fixture stores float32 (0.9f != 0.9 exactly)
    assert(math.abs(out(0)._4 - 0.9 / math.sqrt(0.81 + 0.01)) < 1e-6)
  }

  test("IVF top-k finds same-bucket neighbor") {
    val out = Similarity.ivfTopK(embFixture,
      embFixture.filter($"vec_id" === 0), k = 2, signBits = 4, probeBits = 1)
      .as[(Long, Long, Int, Double)].collect()
    assert(out.nonEmpty && out.head._2 == 1L) // nearest neighbor survives bucketing
  }

  test("langId: marker lexicon voting with deterministic ties") {
    val out = docs(
      (1L, "der hund ist gut und die katze"),
      (2L, "le chat est grand et les chiens"),
      (3L, "el perro y los gatos"),
      (4L, "the dog and the cat is here"),
      (5L, "xyz qqq zzz"))
      .select($"doc_id", TextAnalysis.langId($"text").as("lang"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "de", 2L -> "fr", 3L -> "es", 4L -> "en", 5L -> "und"))
  }

  test("text stats: counts and score bounds") {
    val r = TextAnalysis.stats(docs((1L, "  the quick, brown fox! extraordinary  "))).collect().head
    assert(r.getAs[Long]("token_count") == 5L)
    assert(r.getAs[Long]("punct_count") == 2L)
    assert(r.getAs[Long]("stopword_count") == 1L)
    // 'extraordinary' (13 chars) contributes 2 extra subword tokens
    assert(r.getAs[Long]("subword_count") == 7L)
    val q = r.getAs[Double]("quality_score")
    assert(q > 0.0 && q <= 1.0)
  }

  test("vocabulary: exact document and term frequencies") {
    val out = TextAnalysis.vocabulary(docs(
      (1L, "spark spark flink"), (2L, "spark beam")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("spark") == (2L, 3L)) // in 2 docs, 3 occurrences
    assert(out("flink") == (1L, 1L) && out("beam") == (1L, 1L))
  }

  test("fingerprint is whitespace/case normalized") {
    val fps = docs((1L, "Hello   World"), (2L, "hello world"), (3L, "hello worlds"))
      .select($"doc_id", TextAnalysis.fingerprint($"text").as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fps(1L) == fps(2L) && fps(1L) != fps(3L))
  }

  test("multimodal: typed batch decode over binary columns (stubbed decoder)") {
    val media = Multimodal.mediaFromDocuments(docs((3L, "abcdef"), (4L, "xy")))
    val feats = Multimodal.extractFeatures(media).collect().map(f => f.doc_id -> f).toMap
    assert(feats(3L).media_type == "image" && feats(4L).media_type == "audio")
    assert(feats(3L).n_bytes == 6L && feats(3L).width == 7L && feats(3L).height == 43L)
    assert(feats(4L).channels == 2L)
    // plumbing is partition-preserving: no shuffle in the plan
    val plan = Multimodal.extractFeatures(media).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("multimodal schedules: aspect-preserving resize with floor-to-1 clamp; frame slots repeat on short videos") {
    import spark.implicits._
    val feats = Seq(
      Multimodal.MediaFeatures(1L, "image", 10L, 640L, 240L, 3L, 1L),  // wider than 320×240
      Multimodal.MediaFeatures(2L, "image", 10L, 100L, 400L, 3L, 1L),  // taller
      Multimodal.MediaFeatures(3L, "image", 10L, 1L, 1000L, 3L, 1L),   // extreme: floor would hit 0
      Multimodal.MediaFeatures(4L, "audio", 10L, 1L, 1L, 2L, 1L),      // excluded
      Multimodal.MediaFeatures(5L, "video", 10L, 320L, 240L, 3L, 3L),  // 3-frame video
      Multimodal.MediaFeatures(6L, "video", 10L, 320L, 240L, 3L, 40L)).toDS()
    val rs = Multimodal.resizePlan(feats, 320, 240).orderBy("doc_id")
      .select("doc_id", "out_width", "out_height")
      .as[(Long, Long, Long)].collect().toSeq
    assert(rs == Seq(
      (1L, 320L, 120L),   // 640×240 → halve
      (2L, 60L, 240L),    // 100×400 → height-limited
      (3L, 1L, 240L),     // floor(1·240/1000)=0 clamps to 1
      (5L, 320L, 240L), (6L, 320L, 240L)))
    val fr = Multimodal.frameSamplePlan(feats, k = 4).orderBy("doc_id", "slot")
      .as[(Long, Long, Long)].collect().toSeq
    // 3-frame video repeats frame 1 across the middle slots; 40-frame
    // video strides 0,10,20,30 — slots always number k
    assert(fr == Seq(
      (5L, 0L, 0L), (5L, 1L, 0L), (5L, 2L, 1L), (5L, 3L, 2L),
      (6L, 0L, 0L), (6L, 1L, 10L), (6L, 2L, 20L), (6L, 3L, 30L)))
  }

  test("cross-corpus near-dup pairs: batch docs match seen near-twins only") {
    val seen = docs(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely unrelated text about query engines and planning"))
    val batch = docs(
      (10L, "the quick brown fox jumps over the lazy dog tonight"), // near-dup of 1
      (11L, "entirely novel content with no overlap whatsoever here"))
    val out = Dedup.crossNgramJaccardPairs(batch, seen, 0.5)
      .as[(Long, Long, Double)].collect()
    assert(out.map(p => (p._1, p._2)).toSet == Set((10L, 1L)))
    assert(out.head._3 > 0.5 && out.head._3 < 1.0)
  }

  test("incremental dedup: batch-internal dupes collapse, seen content drops") {
    val seen = docs((1L, "already ingested"), (2L, "also known"))
    val batch = docs(
      (10L, "already ingested"),  // seen → dropped
      (11L, "brand new text"),
      (12L, "brand new text"),    // batch-internal dup of 11 → one row, count 2
      (13L, "another novel doc"))
    val out = Dedup.incrementalExact(batch, seen).orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(11L, 13L))
    assert(out(0).getAs[Long]("dup_count") == 2L)
    assert(out(1).getAs[Long]("dup_count") == 1L)
  }

  test("benchmark contamination: fraction of trigrams found in the benchmark") {
    val bench = docs((100L, "the quick brown fox jumps"))
    val corpus = docs(
      (1L, "the quick brown fox jumps"),        // fully contained → 1.0
      (2L, "the quick brown cat sits quietly"), // shares 'the quick brown' only
      (3L, "nothing in common at all here"),    // 0 hits
      (4L, "x y"))                              // too short → no row
    val out = Dedup.benchmarkContamination(corpus, bench).orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L, 3L))
    assert(out(0).getAs[Double]("contamination") == 1.0)
    val c2 = out(1)
    assert(c2.getAs[Long]("n_grams") == 4L && c2.getAs[Long]("n_hit") == 1L)
    assert(c2.getAs[Double]("contamination") == 0.25)
    assert(out(2).getAs[Long]("n_hit") == 0L && out(2).getAs[Double]("contamination") == 0.0)
  }

  test("hash split: content-keyed, duplicate-consistent, covers all splits") {
    val corpus = docs((1L to 200L).map(i => (i, s"document number $i with words")): _*)
      .union(docs((1000L, "document number 7 with words"))) // exact dup of doc 7
    val out = Sampling.hashSplit(corpus, Seq(("train", 8), ("test", 2)))
      .select("doc_id", "bucket", "split")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // duplicates land in the same split, always
    assert(out(7L) == out(1000L))
    assert(out.values.forall { case (b, s) =>
      (b < 8) == (s == "train") && b >= 0 && b < 10 })
    // both splits non-empty on 200 docs with an 80/20 cut
    val bySplit = out.values.groupBy(_._2).view.mapValues(_.size).toMap
    assert(bySplit.keySet == Set("train", "test"))
    assert(bySplit("train") > bySplit("test"))
    // rerunning reproduces the identical assignment (no RNG anywhere)
    val again = Sampling.hashSplit(corpus, Seq(("train", 8), ("test", 2)))
      .select("doc_id", "bucket", "split")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(again == out)
  }

  test("hash split: NULL text gets an explicit NULL split, never the last split") {
    val corpus = Seq((1L, Some("a real document body")), (2L, None), (3L, Some("another one")))
      .toDF("doc_id", "text")
    val out = Sampling.hashSplit(corpus, Seq(("train", 8), ("test", 2)))
      .select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(2L).isEmpty, "null text must not be silently assigned to 'test'")
    assert(out(1L).nonEmpty && out(3L).nonEmpty)
    // ...and the keep-or-drop sampler drops null text rather than keeping it
    val kept = Sampling.stratifiedSample(corpus, lit("s"), Map("s" -> 1.0))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
  }

  test("sequence packing: shard-local quota packing with exact offsets") {
    val corpus = docs(
      (0L, "a b c"),          // shard 0: cum 0 → pack 0, offset 0
      (8L, "d e f g"),        // shard 0: cum 3 → pack 0, offset 3
      (16L, "h i"),           // shard 0: cum 7 → pack 1, offset 2
      (1L, "j k l m n o p"))  // shard 1: cum 0 → pack 0, offset 0
    val out = Sampling.packSequences(corpus, seqTokens = 5, shards = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(0L) == (0L, 0L, 0L))
    assert(out(8L) == (0L, 0L, 3L), "doc straddling the budget packs where it starts")
    assert(out(16L) == (0L, 1L, 2L))
    assert(out(1L) == (1L, 0L, 0L), "shards pack independently")
  }

  test("stratified sample: per-stratum rates, unknown strata dropped") {
    val corpus = docs((1L to 300L).map(i => (i, s"text body $i of the corpus")): _*)
    val stratum = (col("doc_id") % 3).cast("string")
    val kept = Sampling.stratifiedSample(corpus, stratum,
      Map("0" -> 1.0, "1" -> 0.25))
      .select("doc_id").as[Long].collect().toSet
    // rate-1.0 stratum keeps everything, absent stratum ("2") keeps nothing
    assert((1L to 300L).filter(_ % 3 == 0).forall(kept.contains))
    assert(kept.forall(_ % 3 != 2))
    val s1 = kept.count(_ % 3 == 1)
    assert(s1 > 0 && s1 < 100, s"rate 0.25 of 100 docs kept $s1")
  }

  test("data quality report: one aggregate pass, correct metrics and verdicts") {
    val df = Seq(
      (1L, Some(10.0)), (2L, Some(20.0)), (2L, None), (3L, Some(-5.0)))
      .toDF("id", "v")
    val out = DataQuality.report(df, Seq(
      DataQuality.completeness("v", 0.7),
      DataQuality.uniqueness("id", 1.0),
      DataQuality.minBound("v", 0.0),
      DataQuality.minRows(2L)))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(out("completeness(v)") == (0.75, true))
    assert(out("uniqueness(id)") == (0.75, false)) // 3 distinct / 4 rows
    assert(out("min(v)") == (-5.0, false))
    assert(out("row_count") == (4.0, true))
    // the whole report is ONE aggregate job: a single scan in the plan
    val plan = DataQuality.report(df, Seq(
      DataQuality.completeness("v", 0.7),
      DataQuality.minRows(2L))).queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), "checks must share one aggregate, not one job each")
  }

  test("metric correlations: exact-moment Pearson matches hand computation") {
    // x perfectly correlates with y = 2x; z anti-correlates with x
    val df = Seq((1L, 2L, 9L), (2L, 4L, 7L), (3L, 6L, 5L), (4L, 8L, 3L))
      .toDF("x", "y", "z")
    val out = DataQuality.metricCorrelations(df, Seq("x", "y", "z"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out.size == 3)
    assert(out(("x", "y"))._1 == 4L)
    assert(math.abs(out(("x", "y"))._2 - 1.0) < 1e-12)
    assert(math.abs(out(("x", "z"))._2 - (-1.0)) < 1e-12)
    assert(math.abs(out(("y", "z"))._2 - (-1.0)) < 1e-12)
    // zero variance → NULL, not NaN (cross-engine hash contract)
    val const = Seq((1L, 5L), (2L, 5L)).toDF("x", "y")
    val r = DataQuality.metricCorrelations(const, Seq("x", "y")).collect()(0)
    assert(r.isNullAt(3))
  }

  test("duplicate clusters: multi-hop chains merge, components stay separate") {
    // chain 1-2-3-4 (forces >1 propagation round), pair 10-11, self-contained 20-21-22
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L), (21L, 22L), (20L, 22L))
      .toDF("doc_a", "doc_b")
    val out = Dedup.duplicateClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("duplicate clusters: reliable-storage checkpoint path matches local and writes files") {
    // the cluster-scale variant: star rounds checkpoint to a real directory
    // (survives executor loss) instead of executor-local blocks
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    try {
      val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
        .toDF("doc_a", "doc_b")
      val out = Dedup.duplicateClusters(pairs, checkpointDir = Some(dir))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
      // the rounds actually landed in reliable storage, not local blocks
      def rddFiles(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(rddFiles).sum
        else if (f.getName.startsWith("part-")) 1 else 0
      assert(rddFiles(new java.io.File(dir)) > 0,
        s"expected reliable checkpoint files under $dir")
      // semanticDedup shares the same option and contract
      val emb = Seq(
        (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)), (3L, Seq(0.0f, 1.0f)))
        .toDF("vec_id", "embedding")
      val sem = Dedup.semanticDedup(emb, threshold = 0.9, centroids = 2,
        sampleSize = 3, iters = 1, checkpointDir = Some(dir))
        .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("keep")).toMap
      assert(sem == Map(1L -> true, 2L -> false, 3L -> true))
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("chunk dedup: fixed-token windows, first occurrence keeps, ragged tail") {
    // chunk size 2: doc 1 = [ab, cd | ef, gh], doc 2 repeats doc 1's first
    // chunk then a fresh one, doc 3 = one ragged single-token chunk that
    // also duplicates (case-insensitively) doc 1's tail... and a null doc
    val corpus = Seq(
      (1L, "ab cd ef gh"),
      (2L, "ab cd zz ww"),
      (3L, "EF GH"),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = graft.functions.Dedup.chunkDedup(corpus, chunkTokens = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(out.toSeq == Seq(
      (1L, 2L, 0L, Some(0.0)),          // both chunks first
      (2L, 2L, 1L, Some(0.5)),          // "ab cd" already seen in doc 1
      (3L, 1L, 1L, Some(1.0)),          // "ef gh" normalization-matches doc 1
      (4L, 0L, 0L, None)))              // null text: no chunks, NULL frac
    // ragged-tail boundary: 3 tokens at size 2 = 2 chunks, tail of 1 token
    val ragged = graft.functions.Dedup.chunkDedup(
      Seq((1L, "a b c")).toDF("doc_id", "text"), chunkTokens = 2).collect()
    assert(ragged.head.getLong(1) == 2L)
    // exact chunk-multiple must NOT emit a trailing empty chunk
    val exact2 = graft.functions.Dedup.chunkDedup(
      Seq((1L, "a b")).toDF("doc_id", "text"), chunkTokens = 2).collect()
    assert(exact2.head.getLong(1) == 1L)
  }

  test("unigram quality: corpus-frequency score, exact rational arithmetic") {
    // corpus: "x" ×3, "y" ×2, "z" ×1 → total 6
    val corpus = Seq(
      (1L, "x x y"),   // s = 3+3+2 = 8, n = 3 → 8/18
      (2L, "x y z"),   // s = 3+2+1 = 6, n = 3 → 6/18
      (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = graft.functions.TextAnalysis.unigramScore(corpus)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    assert(out.toSeq == Seq(
      (1L, 3L, Some(8.0 / 18.0)),
      (2L, 3L, Some(6.0 / 18.0)),
      (3L, 0L, None)))
    // the ordering property the operator exists for: common-word docs
    // outscore rare-token docs
    assert(out(0)._3.get > out(1)._3.get)
  }

  test("repetition stats: Gopher signals computed exactly on known fixtures") {
    // "ab cd ab cd ab cd": 5 2-grams, top "ab cd" ×3 (ties: "cd ab" ×2),
    // frac = 3*5/17; one 5-gram duplicated? 2 distinct 5-grams, no dups.
    val corpus = docs(
      (1L, "ab cd ab cd ab cd"),
      // 10 tokens, 6 5-grams all identical "x x x x x" ⇒ 5 redundant
      (2L, "x x x x x x x x x x"))
    val out = TextAnalysis.repetitionStats(corpus)
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[String]("top_2gram") == "ab cd")
    assert(r1.getAs[Double]("top_2gram_char_frac") == 3.0 * 5 / 17)
    assert(r1.getAs[Double]("dup_5gram_char_frac") == 0.0)
    val r2 = out(2L)
    assert(r2.getAs[String]("top_2gram") == "x x")
    assert(r2.getAs[Double]("top_2gram_char_frac") == 9.0 * 3 / 19)
    assert(r2.getAs[Double]("dup_5gram_char_frac") == 5.0 * 9 / 19,
      "6 identical 5-grams ⇒ 5 redundant × 9 chars over 19")
  }

  test("gopher repetition: full Table A1 signals computed exactly on known fixtures") {
    // doc 1 — "x y\nx y\n\nx y\nz w": lines [x y, x y, x y, z w] (the
    // blank between paragraphs drops), so 2 redundant of 4 and 6 of 12
    // chars; paragraphs ["x y\nx y", "x y\nz w"] distinct; tokens
    // x y x y x y z w over n_chars = 16: top 2-gram "x y"×3 (9/16),
    // top 3-gram tie c=2 between "x y x" and "y x y" resolves gram-asc
    // (10/16), top 4-gram "x y x y"×2 (14/16); no duplicated 5-gram.
    // doc 2 — 13 single-char tokens with "a b c d e f" repeated: dup
    // 5-grams (a b c d e / b c d e f, both ×2) cover positions 1..12,
    // dup 6-gram (a b c d e f ×2) covers the same 12 of 13 token chars;
    // no 7-gram repeats (the 13th token g breaks the run).
    val corpus = docs(
      (1L, "x y\nx y\n\nx y\nz w"),
      (2L, "a b c d e f a b c d e f g"))
    val out = TextAnalysis.gopherRepetition(corpus)
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Double]("dup_line_frac") == 2.0 / 4)
    assert(r1.getAs[Double]("dup_line_char_frac") == 6.0 / 12)
    assert(r1.getAs[Double]("dup_para_frac") == 0.0)
    assert(r1.getAs[Double]("dup_para_char_frac") == 0.0)
    assert(r1.getAs[Double]("top_2gram_char_frac") == 9.0 / 16)
    assert(r1.getAs[Double]("top_3gram_char_frac") == 10.0 / 16,
      "c=2 tie between 'x y x' and 'y x y' must resolve gram-ascending")
    assert(r1.getAs[Double]("top_4gram_char_frac") == 14.0 / 16)
    assert(r1.getAs[Double]("dup_5gram_char_frac") == 0.0)
    assert(r1.getAs[Double]("dup_10gram_char_frac") == 0.0)
    val r2 = out(2L)
    assert(r2.getAs[Double]("dup_5gram_char_frac") == 12.0 / 13,
      "overlapping duplicate spans count each covered token ONCE")
    assert(r2.getAs[Double]("dup_6gram_char_frac") == 12.0 / 13)
    assert(r2.getAs[Double]("dup_7gram_char_frac") == 0.0)
    assert(r2.getAs[Double]("dup_line_frac") == 0.0)
  }

  test("gram occurrences: native kernel equals the HOF form, Unicode included") {
    // the GramOccurrencesExpr equality surface its scaladoc promises:
    // same (n, start, g) multiset as the interpreted transform chain —
    // exercised on ASCII, multi-byte UTF-8, non-BMP emoji, a
    // single-token doc, and the empty-token edge
    val corpus = docs(
      (1L, "a b c d e f g h i j k l"),
      (2L, "café naïve café über naïve café straße émigré"),
      (3L, "🎉 x 🎉 y 🎉 z 🎉"),
      (4L, "solo"),
      (5L, ""))
    def explodeAll(c: org.apache.spark.sql.Column) = corpus
      .select($"doc_id", explode(c).as("o"))
      .select($"doc_id", $"o.n", $"o.start", $"o.g")
      .orderBy("doc_id", "n", "start")
      .collect().toSeq
    val toks = TextAnalysis.tokens($"text")
    val native = explodeAll(TextAnalysis.gramOccurrences(toks, 10))
    val hof = explodeAll(TextAnalysis.gramOccurrencesHof(toks, 10))
    assert(native.nonEmpty && native == hof)
  }

  test("gopher repetition: the physical plan carries ZERO exchanges") {
    // the 100 TB property the operator exists for — per-document kernel
    // work only, nothing to shuffle; a regression that re-introduces an
    // aggregate or join must fail loudly here
    val corpus = docs((1L, "a b c d e f"), (2L, "x y\nx y"))
    val plan = TextAnalysis.gopherRepetition(corpus)
      .queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e }
    assert(exchanges.isEmpty,
      s"gopherRepetition must stay exchange-free, found: $exchanges")
  }

  test("gopher repetition: kernel equals relational on a Unicode corpus") {
    // code-point lengths and the code-point tie-break order (= UTF-8
    // byte order, ≠ Java UTF-16 order beyond the BMP) are load-bearing:
    // 🎉 (U+1F389) must sort AFTER any BMP char in both engines' rule
    val corpus = docs(
      (1L, "🎉 fête 🎉 fête straße\n🎉 fête 🎉 fête straße\n\nnaïve über"),
      (2L, "émigré 🚀 émigré 🚀 émigré 🚀 émigré 🚀"))
    val k = TextAnalysis.gopherRepetition(corpus).orderBy("doc_id").collect()
    val r = TextAnalysis.gopherRepetitionRelational(corpus)
      .orderBy("doc_id").collect()
    assert(k.toSeq == r.toSeq)
    // doc 1's duplicated line really fired (sanity that the fixture bites)
    assert(k(0).getAs[Double]("dup_line_frac") > 0.0)
    assert(k(1).getAs[Double]("dup_5gram_char_frac") > 0.0)
  }

  test("gopher repetition: scan-side kernel equals the relational form bit-for-bit") {
    // LCG word soup with injected newlines, blank lines, repeated runs,
    // and edge shapes (empty text, spaces, single token, sub-BMP only) —
    // the kernel (one scan, zero exchanges) and the explode→aggregate
    // relational form must agree on every double
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    def lcg(seed: Long): LazyList[Long] =
      LazyList.iterate(seed)(x => (x * 6364136223846793005L + 1442695040888963407L))
    val rows = (0 until 60).map { d =>
      val rs = lcg(d * 977L + 13).map(x => math.abs(x % 997)).drop(2)
      val toks = rs.take(30 + (d % 25)).zipWithIndex.map { case (r, i) =>
        val w = words((r % words.size).toInt)
        val sep = if (i > 0 && i % 7 == 0) "\n" else if (i > 0 && i % 13 == 0) "\n\n" else " "
        sep + w
      }.mkString
      // every 4th doc repeats its own first 14 "chars worth" of tokens
      val text = if (d % 4 == 0) toks + "\n\n" + toks.take(60) else toks
      (d.toLong, text)
    } ++ Seq((100L, ""), (101L, "   "), (102L, "solo"), (103L, "x\n\n\nx\nx"))
    val corpus = docs(rows: _*)
    val kernel = TextAnalysis.gopherRepetition(corpus)
      .orderBy("doc_id").collect()
    val relational = TextAnalysis.gopherRepetitionRelational(corpus)
      .orderBy("doc_id").collect()
    assert(kernel.length == relational.length)
    kernel.zip(relational).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }

  test("signal agreement: exact Spearman on hand-worked ranks, ties and universe rules") {
    import spark.implicits._
    // a ascending, b exactly reversed (ρ = −1), t all-tied (ranks fall
    // back to doc_id order = a's order ⇒ ρ = 1 vs a); doc 5 scored only
    // by a drops from the universe
    val a = Seq((1L, 0.1), (2L, 0.2), (3L, 0.3), (4L, 0.4), (5L, 0.5))
      .toDF("doc_id", "score")
    val b = Seq((1L, 0.9), (2L, 0.7), (3L, 0.5), (4L, 0.3))
      .toDF("doc_id", "score")
    val t = Seq((1L, 0.5), (2L, 0.5), (3L, 0.5), (4L, 0.5))
      .toDF("doc_id", "score")
    val out = DataQuality.signalAgreement(
        Seq("a" -> a, "b" -> b, "t" -> t))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a_vs_b").getAs[Long]("n_docs") == 4L)
    assert(out("a_vs_b").getAs[Long]("sum_d2") == 20L)
    assert(out("a_vs_b").getAs[Double]("spearman_rho") == -1.0)
    assert(out("a_vs_t").getAs[Double]("spearman_rho") == 1.0,
      "tied scores must rank by doc_id - the deterministic variant")
    assert(out("b_vs_t").getAs[Double]("spearman_rho") == -1.0)
  }

  test("dedup plan stats: exact cost counts and the regime the switch would pick") {
    // shingles: doc1/doc2 share {a b c, b c d}, doc3 owns {x y z} ⇒
    // df = {2, 2, 1}: postings 5, join rows 1+1+0 = 2, max df 2
    val corpus = docs((1L, "a b c d"), (2L, "a b c d"), (3L, "x y z"))
    val r = Dedup.dedupPlanStats(corpus).collect()(0)
    assert(r.getAs[Long]("n_docs") == 3L)
    assert(r.getAs[Long]("n_shingles") == 3L)
    assert(r.getAs[Long]("n_postings") == 5L)
    assert(r.getAs[Long]("candidate_join_rows") == 2L)
    assert(r.getAs[Long]("max_df") == 2L)
    assert(r.getAs[String]("regime") == "count-join")
    // the same statistics flip the verdict at tighter caps — both arms
    assert(Dedup.dedupPlanStats(corpus, maxIndexJoinRows = 1L)
      .collect()(0).getAs[String]("regime") == "prefix-filter")
    assert(Dedup.dedupPlanStats(corpus, maxDocFreq = 1L)
      .collect()(0).getAs[String]("regime") == "prefix-filter")
  }

  test("bpe compression curve: prefix-truncated merges ARE the vocabulary checkpoints") {
    // corpus "ab ab b": merge 1 fuses (b, </w>) [freq 3], merge 2 fuses
    // (a, b</w>) ⇒ encode totals 8 → 5 → 3 along the checkpoint ladder
    val merges = Bpe.learnMergesLocal(Seq("ab ab b"), numMerges = 2)
    val corpus = docs((1L, "ab ab b"))
    val totals = Seq(0, 1, 2).map { k =>
      corpus.select(Bpe.encode(TextAnalysis.tokens(col("text")),
          merges.take(k)).as("sub"))
        .agg(sum(size(col("sub")))).collect()(0).getLong(0)
    }
    assert(totals == Seq(8L, 5L, 3L))
  }

  test("min-k% prob: bottom-k mean computed exactly on a hand-worked model") {
    // corpus "a b a b c" + "a b a": c12 = {ab:3, ba:2, bc:1},
    // c1 = {a:3, b:3}, V = 3 ⇒ p(ab)=4/6, p(ba)=3/6, p(bc)=2/6,
    // p(unseen, ctx c)=1/3 (c1=0), p(unseen, ctx a or b)=1/6
    val corpus = docs((1L, "a b a b c"), (2L, "a b a"))
    val cands = docs(
      (10L, "c a b"),           // n=2, m=1 ⇒ bottom-1 = p(ca)=1/3
      (11L, "a"),               // no bigrams ⇒ n=0, NULL
      (13L, "a b a b a b a"))   // n=6, m=2 ⇒ bottom-2 = {1/2, 1/2}
    val out = TextAnalysis.minKProb(corpus, cands)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(10L).getAs[Long]("n_bigrams") == 2L)
    assert(out(10L).getAs[Double]("min_k_prob") == 1.0 / 3)
    assert(out(11L).getAs[Long]("n_bigrams") == 0L)
    assert(out(11L).isNullAt(out(11L).fieldIndex("min_k_prob")))
    assert(out(13L).getAs[Double]("min_k_prob") == 0.5)
  }

  test("min-k% prob: members separate from reversed-twin non-members") {
    // LCG word soup; non-members are token-reversed twins (same
    // unigrams, mostly-novel bigrams) — the audit must rank members
    // above their own twins more often than not
    val words = Vector("red", "blue", "green", "dog", "cat", "fox", "run",
      "jump", "eat", "see")
    val rows = (0 until 40).map { d =>
      val toks = (0 until 25).map { i =>
        words((math.abs((d * 7919L + i * 104729L + 17) * 2654435761L) %
          words.size).toInt)
      }
      (d.toLong, toks.mkString(" "))
    }
    val corpus = docs(rows: _*)
    val twins = corpus.select((col("doc_id") + 1000L).as("doc_id"),
      array_join(reverse(split(col("text"), " ")), " ").as("text"))
    val out = TextAnalysis.minKProb(corpus, corpus.unionByName(twins))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("min_k_prob")).toMap
    val wins = (0 until 40).count(d => out(d.toLong) > out(d + 1000L))
    val losses = (0 until 40).count(d => out(d.toLong) < out(d + 1000L))
    assert(wins > losses,
      s"members must beat their reversed twins on balance ($wins vs $losses)")
  }

  test("canary rank: the memorization ladder falls toward rank 1 with repetitions") {
    import graft.oracles.PipelineOracles.{canaryCandidates, canaryClasses}
    import spark.implicits._
    // small host corpus so the inserted canaries dominate their bigrams
    val host = docs((0 until 30).map(d =>
      (d.toLong, s"spark query join window agg stream doc$d")): _*)
    val cands = canaryCandidates.toDF("reps", "cand_id", "ctext")
    val canaryDocs = canaryCandidates.filter(_._2 == 0)
      .flatMap { case (c, _, t) =>
        (0 until c).map(i => (2000000L + c * 1000L + i, t)) }
      .toDF("doc_id", "text")
    val out = TextAnalysis.canaryRank(host.unionByName(canaryDocs), cands)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == canaryClasses.map(_.toLong).toSet)
    canaryClasses.foreach { c =>
      assert(out(c.toLong).getAs[Long]("n_candidates") == 32L)
      val rk = out(c.toLong).getAs[Long]("canary_rank")
      assert(rk >= 1L && rk <= 32L)
    }
    val ranks = canaryClasses.map(c => out(c.toLong).getAs[Long]("canary_rank"))
    assert(ranks.zip(ranks.tail).forall { case (a, b) => b <= a },
      s"rank must be non-increasing along the repetition ladder: $ranks")
    assert(ranks.last == 1L,
      s"the 16x-inserted canary must rank first, got ${ranks.last}")
    val scores = canaryClasses.map(c => out(c.toLong).getAs[Double]("canary_score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => b > a },
      "canary sequence probability must grow with insertions")
  }

  test("pii scan: detection counts and tag redaction on positive fixtures") {
    val corpus = docs(
      (1L, "contact bob.smith+x@corp.example.com or 10.0.255.1 today"),
      (2L, "call +1 555 867-5309 x2 or mail a@b.io c@d.org"),
      (3L, "no pii here at all"))
    val out = TextAnalysis.piiScan(corpus)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_emails") == 1L && out(1L).getAs[Long]("n_ipv4") == 1L)
    assert(out(1L).getAs[String]("redacted") == "contact <EMAIL> or <IP> today")
    assert(out(2L).getAs[Long]("n_phones") == 1L && out(2L).getAs[Long]("n_emails") == 2L)
    assert(out(2L).getAs[String]("redacted").contains("<PHONE>") &&
      !out(2L).getAs[String]("redacted").contains("867"))
    assert(out(3L).getAs[Long]("n_emails") == 0L &&
      out(3L).getAs[String]("redacted") == "no pii here at all")
  }

  test("duplicate clusters: chain-shaped component converges in O(log n) star rounds") {
    // a 300-link chain has diameter 300 — min-label propagation would need
    // 300 rounds (and trip any sane cap); alternating large-star/small-star
    // must land it in logarithmically many
    val n = 300L
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val (labels, rounds) = Dedup.duplicateClustersWithRounds(pairs, maxIters = 20)
    val out = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == n && out.values.forall(_ == 1L),
      "every chain node must label to the component minimum")
    assert(rounds <= 12, s"expected O(log n) convergence, took $rounds rounds")
  }

  test("duplicate clusters: agree with a reference union-find on random graphs") {
    val rnd = new scala.util.Random(42) // seeded — deterministic failures
    for (trial <- 1 to 6) {
      val n = 10 + rnd.nextInt(30)
      val edges = Seq.fill(n * 2) {
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      if (edges.nonEmpty) {
        // reference: textbook union-find with path compression
        val parent = Array.tabulate(n)(identity)
        def find(x: Int): Int = {
          if (parent(x) != x) parent(x) = find(parent(x)); parent(x)
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a.toInt), find(b.toInt))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val inGraph = edges.flatMap(e => Seq(e._1, e._2)).toSet
        val expected = inGraph.map(d => d -> find(d.toInt).toLong).toMap

        val got = Dedup.duplicateClusters(edges.toDF("doc_a", "doc_b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == expected, s"trial $trial (n=$n, ${edges.size} edges)")
      }
    }
  }

  test("multimodal dhash: pixel signature is codec-independent and finds near-identical images") {
    // one deterministic 18×16 pixel matrix, pushed through TWO codecs —
    // the signature must depend on the PIXELS, not the container
    val w = 18; val h = 16
    def red(x: Int, y: Int) = (x * 14 + y * 3) % 256
    def green(x: Int, y: Int) = (x * 5 + y * 11) % 256
    def blue(x: Int, y: Int) = (x * 2 + y * 7) % 256
    def pngOf(f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, (f(x, y) << 16) | (green(x, y) << 8) | blue(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val png = pngOf(red)
    // same pixels as raw binary PPM (P6)
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val body = new Array[Byte](3 * w * h)
    for (y <- 0 until h; x <- 0 until w) {
      body(3 * (y * w + x)) = red(x, y).toByte
      body(3 * (y * w + x) + 1) = green(x, y).toByte
      body(3 * (y * w + x) + 2) = blue(x, y).toByte
    }
    val ppm = header ++ body
    // near-identical: ONE pixel's red channel nudged by 4
    val near = pngOf((x, y) => if (x == 7 && y == 5) (red(x, y) + 4) % 256 else red(x, y))
    // structurally different: red gradient reversed
    val far = pngOf((x, y) => red(w - 1 - x, h - 1 - y))

    val ds = Seq(
      Multimodal.MediaRow(1L, "image", png),
      Multimodal.MediaRow(2L, "image", ppm),
      Multimodal.MediaRow(3L, "image", near),
      Multimodal.MediaRow(4L, "image", far),
      Multimodal.MediaRow(5L, "image", "not an image".getBytes),
      // 46341×46341 overflows Int in w*h — must DROP, not crash the task
      Multimodal.MediaRow(6L, "image", "P5 46341 46341 255 junk".getBytes)).toDS()
    val sigs = Multimodal.imageDhash(ds).collect().map(s => s.doc_id -> s).toMap

    assert(sigs.keySet == Set(1L, 2L, 3L, 4L), "undecodable bytes must drop")
    assert(sigs(1L).width == w && sigs(1L).height == h)
    assert(sigs(1L).dhash == sigs(2L).dhash,
      "PNG and PPM of the same pixels must sign identically")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(1L).dhash, sigs(3L).dhash) <= 2,
      s"one nudged pixel moved ${ham(sigs(1L).dhash, sigs(3L).dhash)} bits")
    assert(ham(sigs(1L).dhash, sigs(4L).dhash) >= 16,
      s"reversed gradient only ${ham(sigs(1L).dhash, sigs(4L).dhash)} bits away")

    // pair machinery end-to-end: the codec twins and the nudged copy
    // surface; the reversed image does not
    val pairs = Multimodal.phashNearDups(
      Multimodal.imageDhash(ds).toDF()
        .select($"doc_id", $"dhash"), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("video: animated-GIF frames sign per schedule; re-encoded twin majority-matches") {
    import graft.functions.Multimodal
    val w = 18; val h = 16
    // palette-safe frames (≤ 32 distinct grays per frame, multiples of 8)
    def frameImg(f: Int, typ: Int, reversed: Boolean): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h, typ)
      for (y <- 0 until h; x <- 0 until w) {
        val xx = if (reversed) w - 1 - x else x
        val g = ((xx * 16 + y * 8 + f * 40) % 248) / 8 * 8
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      img
    }
    def animatedGif(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("gif").next()
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach(fi => writer.writeToSequence(
        new javax.imageio.IIOImage(fi, null, null),
        writer.getDefaultWriteParam))
      writer.endWriteSequence()
      writer.dispose(); ios.close()
      bos.toByteArray
    }
    val rgb = java.awt.image.BufferedImage.TYPE_INT_RGB
    val gray = java.awt.image.BufferedImage.TYPE_BYTE_GRAY
    val vidA = animatedGif((0 until 6).map(frameImg(_, rgb, reversed = false)))
    // re-encoded twin: SAME pixels through a different source image type
    val vidA2 = animatedGif((0 until 6).map(frameImg(_, gray, reversed = false)))
    // structurally different animation
    val vidB = animatedGif((0 until 6).map(frameImg(_, rgb, reversed = true)))
    // single-frame animation: every slot repeats frame 0
    val vidC = animatedGif(Seq(frameImg(0, rgb, reversed = false)))

    val ds = Seq(
      Multimodal.MediaRow(1L, "video", vidA),
      Multimodal.MediaRow(2L, "video", vidA2),
      Multimodal.MediaRow(3L, "video", vidB),
      Multimodal.MediaRow(4L, "video", vidC),
      Multimodal.MediaRow(5L, "video", "not a gif".getBytes)).toDS()
    val sigs = Multimodal.videoFrameDhash(ds, k = 4).collect()
      .groupBy(_.doc_id)

    assert(sigs.keySet == Set(1L, 2L, 3L, 4L), "non-GIF bytes must drop")
    // the frameSamplePlan schedule: 6 frames at k=4 → frames 0,1,3,4
    assert(sigs(1L).sortBy(_.slot).map(s => (s.slot, s.frame_idx)).toSeq ==
      Seq((0L, 0L), (1L, 1L), (2L, 3L), (3L, 4L)))
    // a single-frame animation repeats frame 0 in every slot
    assert(sigs(4L).sortBy(_.slot).map(_.frame_idx).toSeq ==
      Seq(0L, 0L, 0L, 0L))
    // re-encode drift: the GIF writer palette-quantizes RGB- and
    // gray-sourced frames slightly differently (measured: a few bits per
    // frame), which is precisely the drift the per-frame Hamming radius
    // absorbs — every aligned frame pair must sit within 3 bits
    val hams = sigs(1L).sortBy(_.slot).map(_.dhash)
      .zip(sigs(2L).sortBy(_.slot).map(_.dhash))
      .map { case (a, b) => java.lang.Long.bitCount(a ^ b) }
    assert(hams.forall(_ <= 6),
      "re-encoded twin frames drifted beyond the Hamming-6 radius: " +
        hams.mkString(","))

    val sigDf = Multimodal.videoFrameDhash(ds, k = 4).toDF()
      .select($"doc_id", $"slot", $"dhash")
    val pairs = Multimodal.videoNearDups(sigDf, maxHamming = 6,
        minMatchFrac = 0.75)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(4))).toMap
    // the 4×16 banding GUARANTEES a candidate only within 3 bits
    // (pigeonhole); the slot-0 frame drifted 4 bits, so it may legally
    // miss — the MAJORITY rule is what still carries the pair
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) >= 0.75,
      s"re-encoded twin must majority-match: $pairs")
    assert(!pairs.keySet.exists(p => p._1 == 3L || p._2 == 3L),
      "the reversed animation must not match")

    // cross-screen against a persisted per-frame signature table
    Multimodal.writeVideoSignatureTable(
      sigDf.filter($"doc_id" === 1L), "vid_sig_spec")
    try {
      val cross = Multimodal.screenVideoSignatures(spark, "vid_sig_spec",
          sigDf.filter($"doc_id" === 2L), maxHamming = 6, minMatchFrac = 0.75)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(cross == Seq((2L, 1L)),
        s"stored-table screen must find exactly the twin: $cross")
      // tombstone deletion rides the shared machinery
      Multimodal.deleteFromPhashTable(spark, "vid_sig_spec", Seq(1L))
      assert(Multimodal.screenVideoSignatures(spark, "vid_sig_spec",
        sigDf.filter($"doc_id" === 2L), 6, 0.75).isEmpty,
        "deleted video must stop matching")
    } finally Multimodal.dropPhashTable(spark, "vid_sig_spec")
  }

  test("multimodal dhash: PGM gray geometry is exact (grid-sized ramps pack all/no bits)") {
    // a 9×8 P5 image IS the dHash grid (one pixel per cell): strictly
    // increasing rows set every bit (-1L), strictly decreasing rows none
    def pgm(f: (Int, Int) => Int): Array[Byte] = {
      val header = "P5\n9 8\n255\n".getBytes("US-ASCII")
      val body = Array.tabulate(72)(i => f(i % 9, i / 9).toByte)
      header ++ body
    }
    val ds = Seq(
      Multimodal.MediaRow(1L, "image", pgm((x, _) => x * 10)),
      Multimodal.MediaRow(2L, "image", pgm((x, _) => 80 - x * 10)),
      // comment + multi-digit whitespace handling in the header parser
      Multimodal.MediaRow(3L, "image",
        "P5 # gray ramp\n9\t8\n255\n".getBytes("US-ASCII") ++
          Array.tabulate(72)(i => ((i % 9) * 10).toByte))).toDS()
    val sigs = Multimodal.imageDhash(ds).collect().map(s => s.doc_id -> s.dhash).toMap
    assert(sigs(1L) == -1L, f"ascending ramp must set all 64 bits, got ${sigs(1L)}%x")
    assert(sigs(2L) == 0L, f"descending ramp must set none, got ${sigs(2L)}%x")
    assert(sigs(3L) == -1L, "header comments/whitespace must parse")
  }

  test("multimodal dhash: WAV amplitude envelope signs real PCM samples") {
    def wav16(samples: Array[Short], channels: Int = 1,
        rate: Int = 8000): Array[Byte] = {
      val dataLen = samples.length * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
      buf.put("fmt ".getBytes).putInt(16).putShort(1).putShort(channels.toShort)
        .putInt(rate).putInt(rate * channels * 2)
        .putShort((channels * 2).toShort).putShort(16)
      buf.put("data".getBytes).putInt(dataLen)
      samples.foreach(buf.putShort)
      buf.array()
    }
    // 72 mono frames = one frame per dHash window: a rising |amplitude|
    // ramp sets every bit, silence none — the exact geometry pin
    val ramp = wav16(Array.tabulate[Short](72)(j => (j * 10).toShort))
    val flat = wav16(Array.fill[Short](72)(100))
    // near-identical: one sample nudged — a near-dup, not a twin
    val near = wav16(Array.tabulate[Short](72)(j =>
      if (j == 30) 302.toShort else (j * 10).toShort))
    // non-PCM (IEEE float fmt tag) must drop
    val floatWav = {
      val b = wav16(Array.tabulate[Short](72)(j => (j * 10).toShort))
      b(20) = 3; b // fmt tag 1 → 3
    }
    val ds = Seq(
      Multimodal.MediaRow(1L, "audio", ramp),
      Multimodal.MediaRow(2L, "audio", flat),
      Multimodal.MediaRow(3L, "audio", near),
      Multimodal.MediaRow(4L, "audio", floatWav),
      Multimodal.MediaRow(5L, "audio", "not audio".getBytes),
      // stereo 16-bit claiming blockAlign=2 (< channels×bytesPerSample):
      // internally inconsistent — must DROP, not read past the data chunk
      Multimodal.MediaRow(7L, "audio", {
        val b = wav16(Array.tabulate[Short](144)(j => ((j / 2) * 10).toShort),
          channels = 2)
        b(32) = 2; b // blockAlign 4 → 2
      })).toDS()
    val sigs = Multimodal.audioDhash(ds).collect().map(s => s.doc_id -> s).toMap
    assert(sigs.keySet == Set(1L, 2L, 3L), "non-PCM and non-WAV must drop")
    assert(sigs(1L).frames == 72L && sigs(1L).sample_rate == 8000L)
    assert(sigs(1L).dhash == -1L, f"rising ramp must set all bits, got ${sigs(1L).dhash}%x")
    assert(sigs(2L).dhash == 0L, "constant amplitude must set none")
    val ham = java.lang.Long.bitCount(sigs(1L).dhash ^ sigs(3L).dhash)
    assert(ham <= 2, s"one nudged sample moved $ham bits")

    // stereo folds channels into the window mean: duplicating the mono
    // ramp into both channels must sign identically to the mono ramp
    val stereo = wav16(Array.tabulate[Short](144)(j => ((j / 2) * 10).toShort),
      channels = 2)
    val s2 = Multimodal.audioDhash(Seq(Multimodal.MediaRow(6L, "audio", stereo))
      .toDS()).collect().head
    assert(s2.dhash == sigs(1L).dhash && s2.frames == 72L)
  }

  test("multimodal: real PNG IHDR and WAV fmt headers parse to true metadata") {
    // a REAL png: ImageIO-encoded 3×2 ARGB (color type 6 ⇒ 4 channels)
    val img = new java.awt.image.BufferedImage(
      3, 2, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray

    // canonical 44-byte WAV header + 8 stereo 16-bit frames (32 data bytes)
    val wav = java.nio.ByteBuffer.allocate(76).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    wav.put("RIFF".getBytes).putInt(68).put("WAVE".getBytes)
    wav.put("fmt ".getBytes).putInt(16)
      .putShort(1).putShort(2)      // PCM, 2 channels
      .putInt(44100).putInt(176400) // sample rate, byte rate
      .putShort(4).putShort(16)     // block align, bits per sample
    wav.put("data".getBytes).putInt(32).put(new Array[Byte](32))

    // corrupt WAV: valid RIFF/WAVE magic, chunk size field far beyond the
    // blob (and one whose Int truncation is negative) — must fall back to
    // the stub, not spin or crash
    val evil = java.nio.ByteBuffer.allocate(48).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    evil.put("RIFF".getBytes).putInt(40).put("WAVE".getBytes)
    evil.put("junk".getBytes).putInt(0xFFFFFFF8) // -8 as signed int
    evil.put(new Array[Byte](24))

    // a REAL jpeg: ImageIO-encoded 17×9 RGB (baseline JFIF ⇒ SOF0, 3
    // components, APP0 + quant/huffman segments before the frame header —
    // the marker walk has to skip them all)
    val jimg = new java.awt.image.BufferedImage(
      17, 9, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val jbos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(jimg, "jpg", jbos)
    val jpeg = jbos.toByteArray

    // corrupt JPEG: valid SOI + APP0 marker whose declared length runs past
    // the end of the blob — must bail to the stub, not index out of bounds
    val evilJpeg = Array(0xFF, 0xD8, 0xFF, 0xE0, 0x7F, 0xFF, 0x00, 0x00)
      .map(_.toByte)

    // a REAL gif: ImageIO-encoded 11×7 (logical screen descriptor dims)
    val gbos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(new java.awt.image.BufferedImage(
      11, 7, java.awt.image.BufferedImage.TYPE_INT_RGB), "gif", gbos)
    val gif = gbos.toByteArray

    val ds = Seq(
      Multimodal.MediaRow(1L, "image", png),
      Multimodal.MediaRow(2L, "audio", wav.array()),
      Multimodal.MediaRow(3L, "video", "not a container".getBytes),
      Multimodal.MediaRow(4L, "audio", evil.array()),
      Multimodal.MediaRow(5L, "image", jpeg),
      Multimodal.MediaRow(6L, "image", evilJpeg),
      Multimodal.MediaRow(7L, "image", gif)).toDS()
    val f = Multimodal.extractFeatures(ds).collect().map(x => x.doc_id -> x).toMap

    assert(f(1L).width == 3L && f(1L).height == 2L && f(1L).channels == 4L)
    assert(f(1L).duration_frames == 1L && f(1L).n_bytes == png.length.toLong)
    assert(f(2L).width == 44100L && f(2L).height == 16L && f(2L).channels == 2L)
    assert(f(2L).duration_frames == 8L)
    // unrecognized bytes keep the documented stub features
    assert(f(3L).width == "not a container".length % 640 + 1)
    // corrupt chunk size: stub fallback (width formula), no hang/crash
    assert(f(4L).width == 48L % 640 + 1 && f(4L).channels == 2L)
    assert(f(5L).width == 17L && f(5L).height == 9L && f(5L).channels == 3L,
      s"JPEG SOF walk: got ${f(5L)}")
    assert(f(5L).duration_frames == 1L && f(5L).n_bytes == jpeg.length.toLong)
    assert(f(6L).width == evilJpeg.length % 640 + 1, "torn JPEG segment must stub")
    assert(f(7L).width == 11L && f(7L).height == 7L && f(7L).channels == 3L,
      s"GIF screen descriptor: got ${f(7L)}")
  }

  test("semantic dedup: keep rule matches a local recomputation; dup drops; zero-norm excluded") {
    // two co-directional vectors (forced same cell by any quantizer), a
    // spread of others, and a zero vector (no cosine semantics)
    val fix = vecs(
      (0L, Seq(1f, 0f, 0f, 0f)),
      (1L, Seq(0.999f, 0.001f, 0f, 0f)), // same direction as 0 → must drop
      (2L, Seq(0f, 1f, 0f, 0f)),
      (3L, Seq(0f, 0.9f, 0.3f, 0f)),
      (4L, Seq(0f, 0f, 1f, 0f)),
      (5L, Seq(0f, 0f, 0f, 0f)))         // zero norm → excluded
    val out = Dedup.semanticDedup(fix, threshold = 0.9,
      centroids = 2, sampleSize = 5, iters = 2)
      .orderBy("vec_id")
      .as[(Long, Int, Option[Double], Boolean)].collect()
    assert(out.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L, 4L), "zero-norm excluded")
    assert(!out.find(_._1 == 1L).get._4, "co-directional duplicate must drop")

    // the contract, independently of where k-means put the cells: keep iff
    // no lower-id same-cluster vector has cosine >= threshold
    val unit = Map(
      0L -> Array(1.0, 0, 0, 0),
      1L -> { val n = math.sqrt(0.999 * 0.999 + 0.001 * 0.001)
        Array(0.999 / n, 0.001 / n, 0, 0) },
      2L -> Array(0.0, 1, 0, 0),
      3L -> { val n = math.sqrt(0.81 + 0.09)
        Array(0.0, 0.9 / n, 0.3 / n, 0) },
      4L -> Array(0.0, 0, 1, 0))
    val cluster = out.map(r => r._1 -> r._2).toMap
    out.foreach { case (id, cl, maxSim, keep) =>
      val lower = cluster.collect { case (i, c) if c == cl && i < id =>
        unit(i).zip(unit(id)).map { case (a, b) => a * b }.sum }
      val expectMax = if (lower.isEmpty) None else Some(lower.max)
      expectMax.zip(maxSim).foreach { case (e, g) => assert(math.abs(e - g) < 1e-6) }
      assert(expectMax.isEmpty == maxSim.isEmpty)
      assert(keep == maxSim.forall(_ < 0.9), s"keep rule broken for vec $id")
    }
  }

  test("semantic contamination: max-cosine vs benchmark, flag at threshold") {
    val corpus = vecs((10L, Seq(1f, 0f, 0f, 0f)), (11L, Seq(0f, 0f, 1f, 0f)))
    val bench = vecs((0L, Seq(0.9f, 0.1f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f)))
    val out = Dedup.semanticContamination(corpus, bench, threshold = 0.9)
      .orderBy("vec_id").as[(Long, Double, Boolean)].collect()
    assert(out.map(_._1).toSeq == Seq(10L, 11L))
    assert(out(0)._3, "near-parallel to a benchmark vector → contaminated")
    assert(math.abs(out(0)._2 - 0.9 / math.sqrt(0.82)) < 1e-6)
    assert(!out(1)._3 && math.abs(out(1)._2) < 1e-6, "orthogonal to both")
  }

  test("bm25: idf weighting, length normalization, term-fold determinism") {
    val corpus = docs(
      (1L, "apple banana apple"),
      (2L, "apple cherry"),
      (3L, "banana banana banana"),
      (4L, "cherry cherry cherry cherry"))
    val out = TextAnalysis.bm25Search(corpus, Seq("apple", "banana"), k = 4)
      .orderBy("rank").as[(Long, Long, Double, Int)].collect()
    // hand replay: N=4, df=2 for both terms ⇒ idf=1.0; avgdl=3
    def contrib(tf: Double, dl: Double) =
      1.0 * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / 3.0))
    val expect = Seq(
      (1L, 2L, contrib(2, 3) + contrib(1, 3)), // both terms
      (3L, 1L, contrib(3, 3)),
      (2L, 1L, contrib(1, 2)))
    assert(out.length == 3, "doc 4 matches no term")
    out.zip(expect).zipWithIndex.foreach { case (((id, nm, score, rank), (eid, enm, esc)), i) =>
      assert(id == eid && nm == enm && rank == i + 1)
      assert(math.abs(score - esc) < 1e-12)
    }
  }

  test("filter verdict: every arm fires with its reason; clean doc keeps") {
    val clean = "the red fox and his kit ran out of the old barn is " +
      "with them came four more foxes over green hills toward warm sun " +
      "while birds sang songs about long summer days ahead"
    val fix = Seq(
      (1L, clean, "en"),
      (2L, "word " * 10, "en"),                  // short, no stopwords, und
      (3L, "spam ham " * 40, "en"),              // repetition both arms
      (4L, ("ab cd " * 20) + "the is and of with", "en"), // tiny words
      (5L, clean, "fr"),                         // right text, wrong label
      (6L, null.asInstanceOf[String], "en"))     // contentless
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.filterVerdict(fix)
      .orderBy("doc_id")
      .select("doc_id", "keep", "reasons")
      .as[(Long, Boolean, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((true, "")), s"clean doc: ${out(1L)}")
    // a one-word doc is also maximally repetitive — both rep arms fire
    assert(out(2L)._2 ==
      "lang_mismatch,low_quality,no_stopwords,rep_2gram,rep_5gram,too_short")
    assert(!out(3L)._1 && out(3L)._2.contains("rep_2gram") && out(3L)._2.contains("rep_5gram"))
    assert(!out(4L)._1 && out(4L)._2.contains("word_length"))
    assert(out(5L) == ((false, "lang_mismatch")))
    // NULL text short-circuits: single reason, never keep (the threshold
    // arms are all NULL on null signals and must not decide)
    assert(out(6L) == ((false, "null_text")))

    // no expected-lang column: the lang arm disappears, rest unchanged
    val noLang = TextAnalysis.filterVerdict(fix.drop("lang"), expectedLangCol = None)
      .orderBy("doc_id").select("doc_id", "keep", "reasons")
      .as[(Long, Boolean, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(noLang(5L) == ((true, "")))
    assert(noLang(2L)._2 ==
      "low_quality,no_stopwords,rep_2gram,rep_5gram,too_short")
  }

  test("curate: five-stage manifest — filter, dedup, cap, split, pack") {
    val clean = "the red fox and his kit ran out of the old barn is " +
      "with them came four more foxes over green hills toward warm sun " +
      "while birds sang songs about long summer days ahead"
    val clean2 = clean.replace("red", "grey")
    val fix = Seq(
      (1L, clean, "en", "A"),
      (2L, "word " * 10, "en", "A"),   // fails the filter
      (3L, clean, "en", "A"),          // exact dup of 1 → collapses to 1
      (4L, clean2, "en", "B"),
      (5L, clean2, "en", "B"))         // dup of 4 → collapses to 4
      .toDF("doc_id", "text", "lang", "source")
    val out = Curate.curate(fix, seqTokens = 16, shards = 1, maxPerSource = 1)
      .orderBy("doc_id")
      .as[(Long, String, Long, String, Option[Long], Option[Long])].collect()
    // 2 fails filter; 3 and 5 are dups; cap=1 keeps one doc per source
    assert(out.map(_._1).toSeq == Seq(1L, 4L), s"survivors: ${out.mkString(",")}")
    out.foreach { case (_, _, tc, split, packId, packOff) =>
      assert(tc == 34L)
      if (split == "train") assert(packId.nonEmpty && packOff.nonEmpty)
      else assert(packId.isEmpty && packOff.isEmpty)
    }
    // shard-local cumsum: with one shard, pack assignments follow doc order
    val train = out.filter(_._4 == "train")
    val cums = train.map(_._3).scanLeft(0L)(_ + _).init
    train.zip(cums).foreach { case ((_, _, _, _, pid, poff), cum) =>
      assert(pid.get == cum / 16 && poff.get == cum % 16)
    }
  }

  test("curateFull: six-stage composition — each boundary only shrinks, every stage's rule visible") {
    val base = "the red fox and his kit ran out of the old barn is " +
      "with them came four more foxes over green hills toward warm sun " +
      "while birds sang songs about long summer days ahead"
    def variant(i: Int) = base.replace("red", s"shade$i")
      .replace("green", s"tint$i").replace("warm", s"heat$i")
      .replace("long", s"len$i").replace("old", s"age$i")
    val fix = (
      (1 to 8).map(i => (i.toLong, variant(i), "en",
        if (i <= 5) "A" else "B")) ++ Seq(
        (20L, "word " * 10, "en", "A"),      // fails the filter
        (21L, variant(1), "en", "A"),        // exact dup of 1 → collapses
        (22L, variant(7), "en", "B")))       // exact dup of 7 → collapses
      .toDF("doc_id", "text", "lang", "source")
    // benchmark IS doc 3's text: decontamination must scrub doc 3 to ''
    // and drop it — the visible-removal contract
    val bench = Seq((900L, variant(3))).toDF("doc_id", "text")
    val stages = Curate.curateFullStages(fix, bench,
      seqTokens = 16, shards = 1, mixNum = 1L, mixDen = 1L)
    assert(stages.map(_._1) ==
      Seq("filter", "dedup", "decontaminate", "quality", "mixture", "pack"))
    def ids(df: DataFrame) =
      df.select("doc_id").as[Long].collect().toSet
    val byName = stages.toMap
    val afterFilter = ids(byName("filter")())
    val afterDedup = ids(byName("dedup")())
    val afterScrub = ids(byName("decontaminate")())
    val afterQuality = ids(byName("quality")())
    val afterMix = ids(byName("mixture")())
    val packed = byName("pack")().orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // stage rules, each visible in membership
    assert(!afterFilter(20L), "the filter-failing doc must drop at stage 1")
    assert(afterFilter(21L) && afterFilter(22L))
    assert(!afterDedup(21L) && !afterDedup(22L),
      "exact dups must collapse to their min-id representative")
    assert(afterDedup(1L) && afterDedup(7L))
    assert(!afterScrub(3L),
      "a doc that IS a benchmark item must scrub to empty and drop")
    assert(afterScrub(1L))
    // boundaries only shrink
    assert(afterDedup.subsetOf(afterFilter))
    assert(afterScrub.subsetOf(afterDedup))
    assert(afterQuality.subsetOf(afterScrub))
    assert(afterMix.subsetOf(afterQuality))
    assert(packed.map(_._1).toSet == afterMix,
      "pack emits exactly the mixture's survivors")
    // full budget (mixNum/mixDen = 1) still drops the tail tercile only
    assert(afterMix == afterQuality,
      "a full mixture budget must keep every quality survivor")
    // pack invariants: one shard → pack offsets are the running sum
    val cums = packed.map(_._2).scanLeft(0L)(_ + _).init
    packed.zip(cums).foreach { case ((_, _, _, pid, poff), cum) =>
      assert(pid == cum / 16 && poff == cum % 16)
    }
    // composition is rerun-stable end to end
    val again = Curate.curateFull(fix, bench,
      seqTokens = 16, shards = 1, mixNum = 1L, mixDen = 1L)
      .orderBy("doc_id").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(again == packed, "curateFull must be deterministic")
  }

  test("shuffle order: reproducible permutation key, seed-sensitive") {
    val ids = (0L until 500L)
    val d = ids.map(i => Tuple1(i)).toDF("doc_id")
    def order(seed: Long) = graft.functions.Sampling.shuffleOrder(d, seed)
      .orderBy($"shuffle_key", $"doc_id").select("doc_id").as[Long].collect().toSeq
    val e0 = order(0); val e0again = order(0); val e1 = order(1)
    assert(e0 == e0again, "rerun-stable")
    assert(e0 != e1, "different seed, different permutation")
    assert(e0.sorted == ids && e1.sorted == ids, "still a permutation")
    assert(e0 != ids, "not the identity order")
    // epochs must be DECORRELATED permutations, not rotations of one fixed
    // order: an affine key preserves every consecutive-doc neighbor pair
    // across seeds (~500 shared pairs here); the x^5 round must not
    def neighborPairs(o: Seq[Long]) = o.sliding(2).map(_.toSeq).toSet
    val shared = (neighborPairs(e0) intersect neighborPairs(e1)).size
    assert(shared < 25,
      s"epochs look like rotations of one order: $shared shared neighbor pairs")
  }

  test("domain cap: per-source quota by (fingerprint, doc_id), null text last") {
    val fix = Seq(
      (1L, "alpha alpha", "A"), (2L, "beta beta", "A"), (3L, "gamma gamma", "A"),
      (4L, null.asInstanceOf[String], "A"),
      (5L, "delta", "B"), (6L, "epsilon", "B"))
      .toDF("doc_id", "text", "source")
    val out = graft.functions.Sampling.domainCap(fix, maxPerSource = 2)
      .orderBy("doc_id")
      .as[(Long, String, Int, Boolean)].collect()
    // ranks are a permutation per source; keep = rank <= cap
    val bySrc = out.groupBy(_._2)
    assert(bySrc("A").map(_._3).sorted.toSeq == Seq(1, 2, 3, 4))
    assert(bySrc("B").map(_._3).sorted.toSeq == Seq(1, 2))
    out.foreach { case (_, _, r, keep) => assert(keep == (r <= 2)) }
    // null text (null fingerprint) must take the LAST rank, never a quota slot
    assert(out.find(_._1 == 4L).get._3 == 4)
    // ranking follows the content fingerprint order within the source
    val fps = fix.filter($"text".isNotNull && $"source" === "A")
      .select($"doc_id", TextAnalysis.fingerprint($"text").as("fp"))
      .as[(Long, Long)].collect().sortBy(_._2).map(_._1).toSeq
    val ranked = out.filter(r => r._2 == "A" && r._1 != 4L).sortBy(_._3).map(_._1).toSeq
    assert(ranked == fps)
  }

  test("containment pairs: superset scores 1.0 where jaccard misses, both directions exact") {
    // doc 2 = doc 1 + a long unrelated tail: containment(1→2) = 1.0 but
    // jaccard = |A|/|B| ≈ 0.29 — invisible to the 0.5-jaccard dedup
    val part = "the quick brown fox jumps over the lazy dog tonight"
    val tail = "completely different trailing content follows here now with many extra words appended"
    val fix = docs(
      (1L, part),
      (2L, s"$part $tail"),
      (3L, "unrelated third document entirely"))
    val out = Dedup.containmentPairs(fix, 0.9)
      .as[(Long, Long, Double, Double)].collect()
    assert(out.map(r => (r._1, r._2)).toSeq == Seq((1L, 2L)))
    val (_, _, ca, cb) = out.head
    assert(ca == 1.0, s"part-in-whole containment must be exactly 1.0, got $ca")
    assert(cb < 0.9 && cb > 0.0)
    // and the jaccard op at 0.5 indeed misses this pair
    assert(Dedup.ngramJaccardPairs(fix, 0.5).count() == 0L)
    // symmetric near-twins score high in BOTH directions
    val twins = docs(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta eta"))
    val t = Dedup.containmentPairs(twins, 0.9)
      .as[(Long, Long, Double, Double)].collect()
    assert(t.length == 1 && t.head._3 == 1.0 && t.head._4 >= 0.5)
    // the hot-shingle regime (capped candidates + full-set verify) must
    // report the same exact values as the count path whenever the shared
    // shingles are not ALL hot — maxDocFreq=1 forces the verify arm while
    // every twin shingle has df 2... so use a third doc to keep one rare
    // shared shingle below the cap
    val mixedHot = docs(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta eta"),
      (3L, "alpha beta gamma nothing else here at all"))
    val hotOut = Dedup.containmentPairs(mixedHot, 0.9, maxDocFreq = 2L)
      .as[(Long, Long, Double, Double)].collect()
    val countOut = Dedup.containmentPairs(mixedHot, 0.9, maxDocFreq = 1000L)
      .as[(Long, Long, Double, Double)].collect()
    assert(hotOut.sortBy(r => (r._1, r._2)).toSeq ==
      countOut.sortBy(r => (r._1, r._2)).toSeq,
      "hot-capped verify regime must reproduce the count path's exact values")
  }

  test("corpus manifest: per-cell counts from one scan; NULL text isolates in its own cell") {
    val fixture = Seq(
      (1L, "the cat and the dog of it", "webA"),   // en: the, and, of
      (2L, "el gato y los perros es con", "webA"), // es markers
      (3L, "plain words no markers here", "webA"), // und
      (4L, null.asInstanceOf[String], "webB"))     // null text
      .toDF("doc_id", "text", "source")
    val out = DataQuality.corpusManifest(fixture)
      .orderBy(asc_nulls_last("source"), asc_nulls_last("lang_guess"))
      .collect()
    assert(out.length == 4, s"one cell per (source, lang, split): ${out.toSeq}")
    assert(out.map(_.getAs[Long]("n_docs")).sum == 4L)
    val en = out.find(r => r.getAs[String]("lang_guess") == "en").get
    assert(en.getAs[String]("source") == "webA" && en.getAs[Long]("n_tokens") == 7L
      && en.getAs[Long]("n_chars") == 25L)
    assert(out.exists(r => r.getAs[String]("lang_guess") == "und"))
    val nul = out.find(_.getAs[String]("source") == "webB").get
    assert(nul.isNullAt(nul.fieldIndex("split")),
      "NULL text must not silently join a real split")
  }

  test("winsorized stats: exact discrete cuts clamp the outlier, raw mean keeps it") {
    // A: 1..20 plus one 1000-outlier → n=21, loRank=⌈1.05⌉=2, hiRank=⌈19.95⌉=20
    // cuts (2, 20); winsorized sum = 2 + (2+..+20) + 20 = 231 → mean 11.0
    val rows = ((1L to 20L).map(v => ("A", v)) :+ ("A", 1000L))
      .toDF("source", "v")
    val r = DataQuality.winsorizedStats(rows, "v", "source").collect().head
    assert(r.getAs[Long]("n") == 21L)
    assert(r.getAs[Long]("lo_cut") == 2L && r.getAs[Long]("hi_cut") == 20L)
    assert(r.getAs[Double]("mean_winsorized") == 231.0 / 21.0)
    assert(r.getAs[Double]("mean_raw") == 1210.0 / 21.0,
      "raw mean must still show the outlier pull")
  }

  test("winsorized stats: NULL values take no rank position") {
    // Spark ranks NULLs first ascending, DuckDB last — if NULLs occupied
    // ranks, every percentile cut would shift differently per engine. The
    // operator excludes them, so this must equal the NULL-free fixture.
    val rows = ((1L to 20L).map(v => ("A", java.lang.Long.valueOf(v))) ++
      Seq(("A", java.lang.Long.valueOf(1000L)),
        ("A", null.asInstanceOf[java.lang.Long]),
        ("A", null.asInstanceOf[java.lang.Long])))
      .toDF("source", "v")
    val r = DataQuality.winsorizedStats(rows, "v", "source").collect().head
    assert(r.getAs[Long]("n") == 21L, "n counts VALUES, not rows")
    assert(r.getAs[Long]("lo_cut") == 2L && r.getAs[Long]("hi_cut") == 20L)
    assert(r.getAs[Double]("mean_winsorized") == 231.0 / 21.0)
  }

  test("cross-source matrix: containment of the smaller side, within-source dups collapse") {
    val fixture = Seq(
      (1L, "t1", "A"), (2L, "t2", "A"), (3L, "t1", "A"), // A = {t1, t2} (dup collapses)
      (4L, "t1", "B"),                                   // B = {t1} ⊂ A
      (5L, "t3", "C"),                                   // C disjoint
      (6L, null.asInstanceOf[String], "B"))              // null text ignored
      .toDF("doc_id", "text", "source")
    val out = Dedup.crossSourceMatrix(fixture).collect()
    assert(out.length == 1, s"only (A,B) overlap: ${out.toSeq}")
    val r = out.head
    assert(r.getAs[String]("source_a") == "A" && r.getAs[String]("source_b") == "B")
    assert(r.getAs[Long]("n_shared") == 1L && r.getAs[Long]("n_a") == 2L &&
      r.getAs[Long]("n_b") == 1L)
    assert(r.getAs[Double]("overlap_frac") == 1.0,
      "B fully contained in A must read 1.0 — the swallowed-source signal")
  }

  test("snapshot store: publish/time-travel/vacuum; crashed write never publishes or collides") {
    val base = java.nio.file.Files.createTempDirectory("graft_snap").toString + "/corpus"
    try {
      val v0 = Snapshot.publish(docs((1L, "alpha")), base)
      val v1 = Snapshot.publish(docs((1L, "alpha"), (2L, "beta")), base)
      val v2 = Snapshot.publish(docs((2L, "beta")), base)
      assert((v0, v1, v2) == (0L, 1L, 2L))
      assert(Snapshot.latestVersion(spark, base).contains(2L))
      assert(Snapshot.read(spark, base).count() == 1L)
      assert(Snapshot.read(spark, base, version = 1L).count() == 2L) // time travel
      // whole-store read surfaces the version as a partition column
      assert(spark.read.parquet(base).groupBy("v").count().count() == 3L)

      // crash-sim: a data dir lands but the pointer never swaps → invisible
      docs((9L, "orphan")).write.parquet(s"$base/v=3")
      assert(Snapshot.latestVersion(spark, base).contains(2L))
      // ...and the next publish skips the orphan instead of colliding
      val v4 = Snapshot.publish(docs((3L, "gamma")), base)
      assert(v4 == 4L && Snapshot.read(spark, base).count() == 1L)

      // vacuum keeps the newest 2 published, drops v0/v1 AND the orphan
      assert(Snapshot.vacuum(spark, base, keepLast = 2) == Seq(0L, 1L, 3L))
      assert(Snapshot.read(spark, base, version = 2L).count() == 1L)
      intercept[Exception](Snapshot.read(spark, base, version = 1L).count())
    } finally {
      scala.reflect.io.Path(base).deleteRecursively()
    }
  }

  test("forget: erased ids gone from the new version; vacuum closes the time-travel hole") {
    val base = java.nio.file.Files.createTempDirectory("graft_forget").toString + "/corpus"
    try {
      Snapshot.publish(docs((1L, "keep"), (2L, "erase me"), (3L, "keep too")), base)
      val v = Snapshot.forget(spark, base, Seq(2L, 99L).toDF("doc_id"))
      assert(v == 1L)
      val now = Snapshot.read(spark, base)
      assert(now.count() == 2L &&
        now.filter($"doc_id" === 2L).isEmpty, "erased id must be gone")
      // erasure is incomplete while time travel still reaches v0...
      assert(Snapshot.read(spark, base, version = 0L)
        .filter($"doc_id" === 2L).count() == 1L)
      // ...until vacuum erases history
      assert(Snapshot.vacuum(spark, base, keepLast = 1) == Seq(0L))
      intercept[Exception](Snapshot.read(spark, base, version = 0L).count())
    } finally {
      scala.reflect.io.Path(base).deleteRecursively()
    }
  }

  test("encoding QA: control/replacement/mojibake arms, ascii ratio, null and empty verdict false") {
    val fixture = Seq(
      (1L, "hello world"),            // pure ASCII → ok
      (2L, "café résumé"), // accents, ratio 8/11 ≥ 0.6 → ok
      (3L, "weird Ã© artifact"), // mojibake marker counted, still ok
      (4L, "bad\u0007byte\uFFFD"),    // control + replacement → fail
      (5L, "日本語"),     // all non-ASCII, ratio 0 → fail
      (6L, null.asInstanceOf[String]), // NULL → fail
      (7L, ""))                        // empty → fail
      .toDF("doc_id", "text")
    val out = TextAnalysis.encodingStats(fixture).orderBy("doc_id").collect()
    def row(id: Long) = out.find(_.getLong(0) == id).get
    assert(out.filter(_.getAs[Boolean]("encoding_ok")).map(_.getLong(0)).toSeq
      == Seq(1L, 2L, 3L))
    assert(row(2).getAs[Long]("n_ascii") == 8L &&
      math.abs(row(2).getAs[Double]("ascii_ratio") - 8.0 / 11.0) < 1e-15)
    assert(row(3).getAs[Long]("n_mojibake") == 1L)
    assert(row(4).getAs[Long]("n_control") == 1L &&
      row(4).getAs[Long]("n_replacement") == 1L)
    assert(row(5).getAs[Long]("n_ascii") == 0L)
    assert(row(6).isNullAt(row(6).fieldIndex("n_chars")))
    assert(row(7).getAs[Long]("n_chars") == 0L &&
      row(7).isNullAt(row(7).fieldIndex("ascii_ratio")))
  }

  test("k-anonymity: under-k classes suppress quasi columns; NULL quasi forms its own class") {
    val rows = Seq(
      (1L, "a", "X"), (2L, "a", "X"), (3L, "a", "X"),  // class (a,X) size 3 → safe at k=3
      (4L, "b", "X"),                                  // size 1 → suppressed
      (5L, null.asInstanceOf[String], "Y"),            // NULL quasi class...
      (6L, null.asInstanceOf[String], "Y"),
      (7L, null.asInstanceOf[String], "Y"))            // ...size 3 → safe (nulls can't dodge k)
      .toDF("id", "region", "segment")
    val out = DataQuality.kAnonymize(rows, Seq("region", "segment"), k = 3)
      .orderBy("id").collect()
    assert(out.length == 7)
    assert(out.filter(_.getAs[Boolean]("suppressed")).map(_.getLong(0)).toSeq == Seq(4L))
    val r4 = out.find(_.getLong(0) == 4L).get
    assert(r4.isNullAt(r4.fieldIndex("region")) && r4.isNullAt(r4.fieldIndex("segment")),
      "under-k row must blank every quasi column")
    val r1 = out.find(_.getLong(0) == 1L).get
    assert(r1.getAs[String]("region") == "a" && r1.getAs[Long]("class_size") == 3L)
    val r5 = out.find(_.getLong(0) == 5L).get
    assert(!r5.getAs[Boolean]("suppressed") && r5.getAs[Long]("class_size") == 3L,
      "null-safe grouping/join must count the NULL class like any other")
  }

  test("filter ablation: unique rejections isolate each arm's real selectivity") {
    import graft.functions.TextAnalysis
    // hand-built verdicts: reason A fires on 3 docs but alone on only 1;
    // reason B alone on 2; kept docs contribute nothing
    val verdicts = Seq(
      (1L, false, "a"),
      (2L, false, "a,b"),
      (3L, false, "a,b"),
      (4L, false, "b"),
      (5L, false, "b"),
      (6L, true, ""))
      .toDF("doc_id", "keep", "reasons")
    val out = TextAnalysis.filterAblation(verdicts).orderBy("reason")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a", 3L, 1L), ("b", 4L, 2L)),
      s"n_rejected counts every firing, n_unique only solo firings: ${out.toSeq}")
  }

  test("decontaminate: leaked spans excised, verbatim twins emptied, clean docs untouched") {
    import graft.functions.Dedup
    // 4-token chunks: benchmark item = 8 tokens (2 chunks); corpus doc 1
    // QUOTES it mid-document, doc 2 IS it verbatim, doc 3 is clean
    val benchText = "alpha beta gamma delta epsilon zeta eta theta"
    val prefix = (1 to 8).map(i => s"p$i").mkString(" ")   // 2 clean chunks
    val suffix = (1 to 4).map(i => s"s$i").mkString(" ")   // 1 clean chunk
    val corpus = Seq(
      (1L, s"$prefix $benchText $suffix"),
      (2L, benchText),
      (3L, "totally clean words nothing shared with any benchmark item at all x y z"))
      .toDF("doc_id", "text")
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val out = Dedup.decontaminate(corpus, bench, chunkTokens = 4,
      minChunks = 2, maxChunkDf = 64)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out(0) == (1L, 5L, 2L, s"$prefix $suffix"),
      s"quoting doc keeps its own content, sheds the leak: ${out(0)}")
    assert(out(1) == (2L, 2L, 2L, ""),
      s"verbatim benchmark twin comes back empty: ${out(1)}")
    assert(out(2)._3 == 0L && out(2)._4.nonEmpty, "clean doc untouched")
  }

  test("line dedup: corpus-wide keep-first, boilerplate excised, all-dup docs go empty") {
    import graft.functions.Dedup
    val docs = Seq(
      (1L, "alpha beta\ncookie banner\ngamma delta"),
      (2L, "cookie banner\nepsilon zeta"),      // banner repeat → excised
      (3L, "cookie banner"),                    // ONLY the banner → empty text
      (4L, "alpha beta\nunique here"))          // "alpha beta" repeats (docs 1,4)
      .toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs, minCount = 2).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 3L, 3L, "alpha beta\ncookie banner\ngamma delta"), // first occurrences keep
      (2L, 2L, 1L, "epsilon zeta"),
      (3L, 1L, 0L, ""),                                       // never NULL
      (4L, 2L, 1L, "unique here")))

    // minCount=3: "alpha beta" (2 occurrences) is below the bar and both
    // copies survive; "cookie banner" (3 occurrences) is still excised
    val relaxed = Dedup.lineDedup(docs, minCount = 3).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(relaxed.toSeq == Seq((1L, 3L), (2L, 1L), (3L, 0L), (4L, 2L)),
      "below-threshold repeats must all survive at minCount=3")
  }

  test("boilerplate strip: per-source df keys the verdict; minority and cross-source lines survive") {
    import graft.functions.Dedup
    // site A (4 docs): "NAV" on every page (df 4 ≥ ⌈0.5·4⌉=2 → template,
    // ALL copies drop — including the first, unlike lineDedup); "promo"
    // on exactly 2 of 4 (df 2 ≥ 2 → template); "quote" on 1 of 4 (df 1 <
    // 2 → kept). Site B (2 docs): "quote" on 1 of 2 (df 1 < 2 → kept even
    // though the corpus-wide line rule would excise the later copy).
    val docs = Seq(
      (1L, "A", "NAV\npromo\nown one"),
      (2L, "A", "NAV\npromo\nquote"),
      (3L, "A", "NAV\nown three"),
      (4L, "A", "NAV\nown four"),
      (5L, "B", "quote\nown five"),
      (6L, "B", "own six"))
      .toDF("doc_id", "source", "text")
    val out = Dedup.boilerplateStrip(docs, minDocFrac = 0.5, minDocs = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 3L, 1L, "own one"),
      (2L, 3L, 1L, "quote"),
      (3L, 2L, 1L, "own three"),
      (4L, 2L, 1L, "own four"),
      (5L, 2L, 2L, "quote\nown five"),
      (6L, 1L, 1L, "own six")))
    // all-template doc rebuilds to '' (never NULL)
    val allNav = Dedup.boilerplateStrip(Seq(
      (1L, "C", "NAV"), (2L, "C", "NAV")).toDF("doc_id", "source", "text"),
      minDocFrac = 0.5, minDocs = 2).orderBy("doc_id").collect()
      .map(r => (r.getLong(2), r.getString(3)))
    assert(allNav.toSeq == Seq((0L, ""), (0L, "")))
    // NULL-source docs PASS THROUGH, pooled under one sentinel source:
    // the shared "NAV" line is template within the pool (df 2 ≥ 2), the
    // own lines survive — and crucially neither document is dropped
    val nullSrc = Dedup.boilerplateStrip(Seq(
      (1L, null, "NAV\nown one"), (2L, null, "NAV\nown two"),
      (3L, "A", "own three"))
      .toDF("doc_id", "source", "text"),
      minDocFrac = 0.5, minDocs = 2).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(nullSrc.toSeq == Seq(
      (1L, 1L, "own one"), (2L, 1L, "own two"), (3L, 1L, "own three")))
  }

  test("domain authority: rank mass conserved, citations buy rank, determinism") {
    import graft.functions.TextAnalysis
    // hand graph: a and b both cite hub; b also cites a; c is isolated
    val docs = Seq(
      (1L, "a", "see https://hub.x/1"),
      (2L, "b", "see https://hub.x/2 and https://a/page"),
      (3L, "c", "no links here"))
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.domainAuthority(docs, iters = 3, damping = 0.85)
      .orderBy("domain").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val m = out.map(x => x._1 -> x).toMap
    assert(m.keySet == Set("a", "b", "c", "hub.x"))
    // rank is a probability distribution (dangling mass redistributed)
    assert(math.abs(out.map(_._4).sum - 1.0) < 1e-9,
      s"ranks must sum to 1: ${out.toSeq}")
    // two citing domains beat one; one beats zero
    assert(m("hub.x")._4 > m("a")._4 && m("a")._4 > m("b")._4,
      s"authority must follow citations: ${out.toSeq}")
    assert(m("hub.x")._2 == 2L && m("a")._2 == 1L && m("c")._2 == 0L)
    assert(m("b")._3 == 2L && m("c")._3 == 0L)
    // bit-determinism across runs (pinned fold orders)
    val again = TextAnalysis.domainAuthority(docs, iters = 3, damping = 0.85)
      .orderBy("domain").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == again.toSeq, "ranks must be bit-deterministic")
    // self-links never count
    val selfy = TextAnalysis.domainAuthority(
      Seq((1L, "a", "https://a/self")).toDF("doc_id", "source", "text"),
      iters = 2)
    assert(selfy.count() == 1 &&
      selfy.first().getLong(2) == 0L, "self-links must drop")
  }

  test("classifier training: hand-worked gradient step, determinism, register separation") {
    import graft.functions.TextAnalysis
    // ONE full-batch GD step from zero init, lr 1, examples
    // ([a], y=1), ([b], y=0), vocab [a, b]:
    //   z = 0 → p = 1/2 for both; residuals −1/2 and +1/2
    //   grad: gw_a = −1/2, gw_b = +1/2, gb = 0; mean update (m=2):
    //   w_a = +0.25, w_b = −0.25, b = 0 → micros (250000, −250000, 0)
    val (w1, b1) = TextAnalysis.trainClassifierLocal(
      Seq((Seq("a"), 1), (Seq("b"), 0)), Seq("a", "b"),
      iters = 1, lr = 1.0)
    assert(w1 == Seq(("a", 250000L), ("b", -250000L)) && b1 == 0L,
      s"one-step GD must match the hand computation: $w1, $b1")

    // two-register corpus: "good" words vs "spam" words; the trained
    // model must separate it END-TO-END through the certified inference
    // path (quantized micro-weights into classifierScoreInline at
    // threshold 0 — the exported-model seam)
    val docs = (0 until 40).map { i =>
      if (i % 2 == 0)
        (i.toLong, "clear prose with useful verified content here", 1)
      else
        (i.toLong, "buy cheap pills win prizes click now fast", 0)
    }
    val vocab = Seq("clear", "prose", "useful", "verified", "content",
      "buy", "cheap", "pills", "win", "click")
    val (w, b) = TextAnalysis.trainClassifierLocal(
      docs.map(d => (d._2.split(" ").toSeq, d._3)), vocab,
      iters = 200, lr = 0.5)
    val scored = TextAnalysis.classifierScoreInline(
        docs.map(d => (d._1, d._2)).toDF("doc_id", "text"),
        w, bias = b, thresholdMicros = 0L)
      .select("doc_id", "keep").collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toMap
    docs.foreach { case (id, _, y) =>
      assert(scored(id) == (y == 1),
        s"doc $id: trained classifier must separate the registers")
    }

    // determinism: bit-identical weights across runs
    val again = TextAnalysis.trainClassifierLocal(
      docs.map(d => (d._2.split(" ").toSeq, d._3)), vocab,
      iters = 200, lr = 0.5)
    assert((w, b) == again, "training must be deterministic")

    // the DataFrame wrapper is the local trainer over doc_id order
    val viaDf = TextAnalysis.trainClassifier(
      docs.map(d => (d._1, d._2, d._3)).toDF("doc_id", "text", "y"),
      col("y") === 1, vocab, iters = 200, lr = 0.5)
    assert(viaDf == ((w, b)), "trainClassifier must equal trainClassifierLocal")

    // the feature relation: counts + smoothed odds on a tiny fixture
    val lo = TextAnalysis.termLogOdds(
        Seq((1L, "good good spam", true), (2L, "spam", false))
          .toDF("doc_id", "text", "y"), col("y"))
      .orderBy("term").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(lo.toSeq == Seq(("good", 1L, 0L, 2.0), ("spam", 1L, 1L, 1.0)))
  }

  test("incremental boilerplate: batch verdicts use seen ∪ batch statistics") {
    import graft.functions.Dedup
    // seen site A: doc 1 carries "promo" (df 1 — NOT template by seen
    // alone); both docs carry "NAV". Batch doc 3 brings a second "promo"
    // — the UNION df (2) is what must key the verdict, not the seen df.
    val seenA = Seq((1L, "A", "NAV\npromo\nown one")).toDF("doc_id", "source", "text")
    val seenB = Seq((2L, "A", "NAV\nown two")).toDF("doc_id", "source", "text")
    val batch = Seq(
      (3L, "A", "NAV\npromo\nown three"),
      (4L, "B", "solo\nown four")).toDF("doc_id", "source", "text")
    Dedup.writeLineDfTable(seenA, "ldf_spec")
    try {
      Dedup.upsertLineDfTable(spark, "ldf_spec", seenB) // fold exercised
      val out = Dedup.boilerplateStripAgainst(spark, "ldf_spec", batch,
          minDocFrac = 0.5, minDocs = 2)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
      // union totals: A has 3 docs → threshold max(2, ceil(1.5)) = 2;
      // NAV df 3 and promo df 2 are template, "own three" survives;
      // batch-only source B: 1 doc, nothing reaches df 2
      assert(out.toSeq == Seq(
        (3L, 1L, "own three"),
        (4L, 2L, "solo\nown four")),
        s"incremental verdicts must use seen∪batch statistics: ${out.toSeq}")
      // equality with the from-scratch strip on the union, batch rows only
      val full = Dedup.boilerplateStrip(
          seenA.unionByName(seenB).unionByName(batch),
          minDocFrac = 0.5, minDocs = 2)
        .filter($"doc_id" >= 3L).orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
      assert(out.toSeq == full.toSeq,
        "incremental strip must equal the full recompute on the union")
    } finally Dedup.dropLineDfTable(spark, "ldf_spec")
  }

  test("truncation report: exact doc and token losses per candidate length") {
    import graft.functions.TextAnalysis
    val docs = Seq(
      (1L, "a b c"),                             // 3 tokens
      (2L, "a b c d e"),                         // 5 tokens
      (3L, (1 to 10).map(_ => "t").mkString(" ")), // 10 tokens
      (4L, null.asInstanceOf[String]))           // NULL text excluded
      .toDF("doc_id", "text")
    val out = TextAnalysis.truncationReport(docs, Seq(4, 10))
      .orderBy("context_len").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    // L=4: docs 2 (loses 1) and 3 (loses 6) truncate; 7 of 18 tokens lost
    assert(out(0) == (4L, 3L, 2L, 2.0 / 3.0, 18L, 7L, 7.0 / 18.0))
    // L=10: nothing truncates
    assert(out(1) == (10L, 3L, 0L, 0.0, 18L, 0L, 0.0))
  }

  test("retrieval eval: exact MRR and precision arms, NULL labels score nothing") {
    import graft.functions.Similarity
    val corpus = Seq(
      (1L, Seq(1.0f, 0f), Some(7)), (2L, Seq(1.0f, 0f), Some(7)),
      (3L, Seq(1.0f, 0f), Some(8)), (4L, Seq(1.0f, 0f), Some(7)),
      (10L, Seq(1.0f, 0f), None: Option[Int]))
      .toDF("vec_id", "embedding", "label")
    // hand-built ranked results: anchor 1 hits label-7 first at rank 2;
    // anchor 10 has a NULL label → nothing counts relevant
    val results = Seq(
      (1L, 3L, 1), (1L, 2L, 2), (1L, 4L, 3),
      (10L, 2L, 1), (10L, 3L, 2))
      .toDF("query_id", "neighbor_id", "rank")
    val out = Similarity.retrievalEval(results, corpus, k = 3)
      .orderBy("query_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      (1L, 2L, 2.0 / 3, 0.5),  // relevant at ranks 2,3 → mrr 1/2
      (10L, 0L, 0.0, 0.0)))    // NULL-label anchor: zero everywhere
  }

  test("pii column profile: risky column flagged, clean and NULL columns are not") {
    import graft.functions.DataQuality
    val df = Seq(
      ("a@x.com", "call me", "hello"),
      ("b@y.org", "192.168.0.1 here", "world"),
      ("plain", null, "again"))
      .toDF("emails", "mixed", "clean")
    val out = DataQuality.piiColumnProfile(df, Seq("emails", "mixed", "clean"))
      .orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4),
        r.getBoolean(8)))
    assert(out.toSeq == Seq(
      ("clean", 3L, 0L, 0L, false),
      ("emails", 3L, 2L, 0L, true),   // 2/3 emails > half
      ("mixed", 2L, 0L, 1L, false)))  // 1/2 carries an IP: exactly half, not OVER it
  }

  test("tokenizer fertility: per-language ratios are exact sums of the gated signals") {
    import graft.functions.{Bpe, TextAnalysis}
    val merges = graft.oracles.PipelineOracles.bpeMerges
    val docs = Seq((1L, "the table scan"), (2L, "the hash join"))
      .toDF("doc_id", "text")
    val sums = docs.select(
        TextAnalysis.tokenCount($"text").cast("long").as("ws"),
        size(Bpe.encode(TextAnalysis.tokens($"text"), merges)).cast("long").as("bpe"),
        length($"text").cast("long").as("ch"))
      .agg(sum("ws"), sum("bpe"), sum("ch")).head()
    val (ws, bpe, ch) = (sums.getLong(0), sums.getLong(1), sums.getLong(2))
    assert(ws == 6L, s"whitespace tokens: $ws")
    assert(bpe >= ws, "BPE at 32 merges cannot merge across words, so >= words")
    // the fertility row for these docs must be exactly these two divisions
    val row = docs.select(lit("en").as("lang_guess"),
        TextAnalysis.tokenCount($"text").cast("long").as("__ws"),
        size(Bpe.encode(TextAnalysis.tokens($"text"), merges)).cast("long").as("__bpe"),
        length($"text").cast("long").as("__chars"))
      .groupBy("lang_guess")
      .agg(sum("__ws").as("ws_tokens"), sum("__bpe").as("bpe_tokens"),
        sum("__chars").as("n_chars"))
      .select($"bpe_tokens".cast("double") / $"ws_tokens",
        $"n_chars".cast("double") / $"bpe_tokens").head()
    assert(row.getDouble(0) == bpe.toDouble / ws)
    assert(row.getDouble(1) == ch.toDouble / bpe)
  }

  test("markup strip: tags to spaces, entity order keeps double-escapes literal") {
    import graft.functions.TextAnalysis
    val docs = Seq(
      (1L, "<p>hello <b>world</b></p>"),
      (2L, "a &lt; b &amp; c &gt; d &quot;q&quot;"),
      (3L, "&amp;lt; stays escaped"),   // &amp; unescapes LAST → literal &lt;
      (4L, "<div\nclass='x'>multi</div>"),
      (5L, "plain text untouched"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.markupStats(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 4L, "hello world"),
      (2L, 0L, "a < b & c > d \"q\""),
      (3L, 0L, "&lt; stays escaped"),
      (4L, 2L, "multi"),
      (5L, 0L, "plain text untouched")))
  }

  test("link stats: URL chars counted, spam verdict fires above half, empty text false") {
    import graft.functions.TextAnalysis
    val docs = Seq(
      (1L, "read the long explanation then see https://a.example/x now"), // 19/59 < half
      (2L, "https://spam.example/aaaaaaaaaaaa x"),   // mostly URL → spam
      (3L, "no links at all here"),
      (4L, ""))
      .toDF("doc_id", "text")
    val out = TextAnalysis.linkStats(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(5)))
    assert(out.toSeq == Seq(
      (1L, 1L, false), (2L, 1L, true), (3L, 0L, false), (4L, 0L, false)))
    // link_char_frac NULL on empty text (no division), spam coalesces false
    val empty = TextAnalysis.linkStats(docs).filter($"doc_id" === 4L).collect()(0)
    assert(empty.isNullAt(4))
  }

  test("code signals: markers per token route code, prose stays prose") {
    import graft.functions.TextAnalysis
    val docs = Seq(
      (1L, "def f(x): return {x; y()}"),     // dense markers → code
      (2L, "plain prose about a function word"), // 'function' kw alone: 1/6 < 0.2
      (3L, "x = 1; y = 2; z = 3; w = 4;"))   // punctuation-only density
      .toDF("doc_id", "text")
    val out = TextAnalysis.codeSignals(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(5)))
    assert(out.toSeq == Seq(
      (1L, 4L, 2L, true),   // { } ; () + def, return
      (2L, 0L, 1L, false),
      (3L, 4L, 0L, true)))  // 4 semis / 12 tokens = 0.33
  }

  test("percentile normalization: per-group ranks, tie sharing, single-row zero, NULL dropped") {
    import graft.functions.Sampling
    val df = Seq(
      (1L, "a", Some(5.0)), (2L, "a", Some(7.0)), (3L, "a", Some(7.0)),
      (4L, "a", Some(9.0)),
      (5L, "b", Some(100.0)),       // single-row group → 0.0
      (6L, "b", None))              // NULL score drops
      .toDF("doc_id", "source", "quality_score")
    val out = Sampling.percentileNormalize(df, "quality_score", "source")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, 0.0), (2L, 1.0 / 3), (3L, 1.0 / 3), (4L, 1.0),
      (5L, 0.0)))
  }

  test("vocabulary growth: first-slice attribution, cumulative reaches total vocabulary") {
    import graft.functions.TextAnalysis
    def mix(i: Long): Long =
      ((i % 2147483647L) * 1103515245L + 12345L) % 2147483647L
    // two docs sharing the word "common": it must count once, in the
    // EARLIER of their two slices; each doc brings one private word too
    val docs = Seq((1L, "common alpha"), (2L, "common beta"))
      .toDF("doc_id", "text")
    val b1 = mix(1L) % 10
    val b2 = mix(2L) % 10
    assert(b1 != b2, "fixture needs the docs in different slices")
    val out = TextAnalysis.vocabularyGrowth(docs).orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    assert(out.length == 10 && out.last._4 == 3L,
      "cumulative vocabulary must end at the 3 distinct words")
    val first = math.min(b1, b2)
    val second = math.max(b1, b2)
    // earlier slice: its private word + "common"; later: private word only
    assert(out(first.toInt)._3 == 2L && out(second.toInt)._3 == 1L)
    assert(out.map(_._2).sum == 2L, "both docs accounted in the spine")
  }

  test("exact-best dedup: priority picks the canonical copy, ties fall to lowest id") {
    import graft.functions.Dedup
    import org.apache.spark.sql.functions.{col, when}
    val docs = Seq(
      (1L, "shared text", "crawl"),
      (2L, "shared text", "curated"),  // higher priority wins over lower id
      (3L, "shared text", "crawl"),    // loses: score tie with 1 but higher id
      (4L, "solo text", "crawl"))      // singleton keeps
      .toDF("doc_id", "text", "source")
    val out = Dedup.exactBest(docs,
        when(col("source") === "curated", 1L).otherwise(0L))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      (1L, 3L, false), (2L, 3L, true), (3L, 3L, false), (4L, 1L, true)))
    // NULL-text rows are singletons, never mutual duplicates: each keeps
    // with dup_count 1 and a NULL content_hash
    val withNulls = Dedup.exactBest(Seq(
        (10L, null, "crawl"), (11L, null, "crawl"), (12L, "t", "crawl"))
        .toDF("doc_id", "text", "source"),
        when(col("source") === "curated", 1L).otherwise(0L))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.isNullAt(1), r.getLong(3), r.getBoolean(4)))
    assert(withNulls.toSeq == Seq(
      (10L, true, 1L, true), (11L, true, 1L, true), (12L, false, 1L, true)))
  }

  test("trigram novelty: unique phrasing scores 1, templated twins score 0, short docs NULL") {
    import graft.functions.TextAnalysis
    val docs = Seq(
      (1L, "the same template phrase here"), // all 3 trigrams shared with doc 2
      (2L, "the same template phrase here"),
      (3L, "completely different words appear now"), // unshared → novelty 1
      (4L, "two tokens"),                            // < 3 tokens → NULL
      (5L, null))                                    // NULL text drops out
      .toDF("doc_id", "text")
    val out = TextAnalysis.trigramNovelty(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, 3L, 0L, 0.0), (2L, 3L, 0L, 0.0),
      (3L, 3L, 3L, 1.0), (4L, 0L, 0L, -1.0)))
  }

  test("drift report: shifted snapshot flags moved buckets, identical snapshot flags none") {
    import graft.functions.DataQuality
    // base: ids 0..99 with value = id (uniform); cuts at exact sample
    // deciles. current shifted +1000: all mass lands in the top bucket.
    val base = (0L until 100L).map(i => (i, i.toDouble)).toDF("event_id", "value")
    val shifted = (0L until 100L).map(i => (i, i.toDouble + 1000.0))
      .toDF("event_id", "value")
    val out = DataQuality.driftReport(base, shifted, "event_id", "value")
      .orderBy("bucket").collect()
    assert(out.length == 10, "bucket spine must be complete")
    val top = out.last
    assert(top.getLong(3) > 0 && top.getLong(4) == 100L && top.getBoolean(7),
      "all shifted mass in the top bucket must flag drift")
    val empties = out.init.filter(_.getLong(4) == 0L)
    assert(empties.nonEmpty && empties.forall(_.getBoolean(7)),
      "vanished buckets (0 current rows vs ~10% base share) must flag")
    // control: identical snapshots — shares match exactly, nothing flags
    val same = DataQuality.driftReport(base, base, "event_id", "value")
      .collect()
    assert(same.forall(!_.getBoolean(7)), "identical snapshots must not drift")
    // edges: open ends are NULL, interior edges are the sample cuts
    assert(out.head.isNullAt(1) && out.last.isNullAt(2))
    assert(out(1).getDouble(1) == out.head.getDouble(2),
      "adjacent buckets share their cut edge")
  }

  test("epoch plan: exact ceil-division epochs, partial final pass, cap flag, unweighted source") {
    import graft.functions.Sampling
    val docs = Seq(
      (1L, "srcA", "t1 t2 t3 t4 t5"), // srcA available = 5 + 5 = 10 tokens
      (2L, "srcA", "u1 u2 u3 u4 u5"),
      (3L, "srcB", "x y z"),          // srcB available = 3
      (4L, "srcC", "p q"))            // in the data, not in the weights
      .toDF("doc_id", "source", "text")
    // targets: Hamilton of 40 over weights 1:3 → srcA 10, srcB 30
    val out = Sampling.epochPlan(docs,
        Map("srcA" -> 1L, "srcB" -> 3L), budgetTokens = 40L)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(out.toSeq == Seq(
      ("srcA", 10L, 10L, 1L, 10L, false), // exactly one full pass
      ("srcB", 3L, 30L, 10L, 3L, true),   // ⌈30/3⌉ = 10 epochs > cap 4
      ("srcC", 2L, 0L, 0L, 0L, false)))   // unweighted: reported, 0 epochs
    // partial final pass: budget 41 → srcB target 31 = 10 full + 1 token
    val partial = Sampling.epochPlan(docs,
        Map("srcA" -> 1L, "srcB" -> 3L), budgetTokens = 41L)
      .filter($"source" === "srcB").collect()(0)
    assert(partial.getLong(3) == 11L && partial.getLong(4) == 1L,
      "an uneven budget must surface as a 1-token final epoch")
    // a weighted source with NO data rows keeps its row — full apportioned
    // target, 0 available, NULL epochs (no pass count reaches the target),
    // cap flag raised — instead of silently losing its budget share
    val missing = Sampling.epochPlan(docs,
        Map("srcA" -> 1L, "srcB" -> 3L, "srcZ" -> 4L), budgetTokens = 40L)
      .filter($"source" === "srcZ").collect()(0)
    assert(missing.getLong(1) == 0L && missing.getLong(2) == 20L &&
      missing.isNullAt(3) && missing.isNullAt(4) && missing.getBoolean(5),
      s"infeasible source must surface, got $missing")
  }

  test("epoch expand: full passes complete; final pass cut at the budget in rank order") {
    import graft.functions.Sampling
    val docs = Seq(
      (1L, "srcA", "t1 t2 t3 t4 t5"), // srcA available 10
      (2L, "srcA", "u1 u2 u3 u4 u5"),
      (3L, "srcB", "x y z"))          // srcB available 3
      .toDF("doc_id", "source", "text")
    // budget 40 at 1:3 → srcA target 10 (exactly one full pass: both
    // docs, epoch 1), srcB target 30 (exactly ten full passes)
    val out = Sampling.epochExpand(docs, Map("srcA" -> 1L, "srcB" -> 3L), 40L)
    val bySource = out.groupBy("source").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(bySource == Map("srcA" -> 2L, "srcB" -> 10L), s"$bySource")
    assert(out.filter($"source" === "srcB").agg(max($"epoch")).head.getLong(0) == 10L)
    // budget 41 → srcB target 31 = 10 full passes + a 1-token final pass:
    // exactly ONE document appears in epoch 11
    val partial = Sampling.epochExpand(docs, Map("srcA" -> 1L, "srcB" -> 3L), 41L)
    assert(partial.filter($"source" === "srcB" && $"epoch" === 11L).count() == 1L)
    // deterministic: the same expansion on every run
    assert(partial.collect().toSet ==
      Sampling.epochExpand(docs, Map("srcA" -> 1L, "srcB" -> 3L), 41L)
        .collect().toSet)
    // infeasible and unweighted sources contribute nothing
    assert(Sampling.epochExpand(docs,
      Map("srcA" -> 1L, "srcZ" -> 9L), 40L)
      .filter($"source" === "srcZ").isEmpty)
  }

  test("leakage audit: straddling pairs counted per class; safe split audits to zero leaks") {
    import graft.functions.{Sampling, Dedup}
    val split = Seq((1L, "train"), (2L, "test"), (3L, "train"), (4L, "val"))
      .toDF("doc_id", "split")
    val pairs = Seq((1L, 2L), (1L, 3L), (3L, 4L)).toDF("doc_a", "doc_b")
    val out = Sampling.leakageAudit(split, pairs)
      .orderBy("split_lo", "split_hi").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    assert(out.toSeq == Seq(
      ("test", "train", 1L, true),
      ("train", "train", 1L, false),
      ("train", "val", 1L, true)))
    // pairs with an unassigned (NULL-split) endpoint belong to no class
    val withNull = split
      .union(Seq((5L, null.asInstanceOf[String])).toDF("doc_id", "split"))
    val p2 = pairs.union(Seq((1L, 5L)).toDF("doc_a", "doc_b"))
    assert(Sampling.leakageAudit(withNull, p2)
      .agg(sum($"n_pairs")).head.getLong(0) == 3L)
    // end-to-end theorem: the cluster split audited against its OWN pair
    // set can never leak
    val corpus = Seq(
      (10L, "alpha beta gamma delta epsilon"),
      (11L, "alpha beta gamma delta zeta"),
      (12L, "totally different content here now")).toDF("doc_id", "text")
    val prs = Dedup.ngramJaccardPairs(corpus, 0.3)
    val safe = Sampling.leakageSafeSplit(corpus, prs,
      Seq(("train", 1), ("test", 1)))
    assert(Sampling.leakageAudit(safe.select("doc_id", "split"), prs)
      .filter($"leaking").isEmpty)
  }

  test("soft quality sample: keep fraction tracks the score; clamps; NULL drops") {
    import graft.functions.Sampling
    val corpus = (0 until 2000).map(i => (i.toLong, s"doc number $i unique"))
      .toDF("doc_id", "text")
    val kept = Sampling.softQualitySample(
      corpus.withColumn("s", lit(0.3)), $"s").count()
    assert(math.abs(kept / 2000.0 - 0.3) < 0.05,
      s"score 0.3 must keep ~30%, kept $kept of 2000")
    // clamped ends: ≥1 keeps everything, ≤0 and NULL keep nothing
    assert(Sampling.softQualitySample(
      corpus.withColumn("s", lit(2.0)), $"s").count() == 2000)
    assert(Sampling.softQualitySample(
      corpus.withColumn("s", lit(-1.0)), $"s").count() == 0)
    assert(Sampling.softQualitySample(
      corpus.withColumn("s", lit(null).cast("double")), $"s").count() == 0)
    // content-keyed: exact duplicates receive the same decision
    val twins = Seq((1L, "twin text body"), (2L, "twin text body"))
      .toDF("doc_id", "text").withColumn("s", lit(0.5))
    val dec = Sampling.softQualitySample(twins, $"s").count()
    assert(dec == 0L || dec == 2L, s"duplicates must decide together, kept $dec")
  }

  test("bloom screen: seen texts always maybe_seen; constructed collision is a false positive") {
    import graft.functions.Dedup
    val seen = docs((1L, "alpha content"), (2L, "beta content"),
      (3L, "gamma content"))
    val batch = docs((10L, "alpha content"), (11L, "fresh new words here"),
      (12L, null.asInstanceOf[String]))
    val out = Dedup.bloomScreen(batch, Dedup.bloomBuild(seen))
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(out(10L), "a seen text must screen maybe_seen — no false negatives")
    assert(!out(11L), "65536 bits over 3 docs cannot collide on all 4 probes")
    assert(out.size == 2, "NULL text carries no fingerprint and drops")
    // deterministic false positive BY CONSTRUCTION: k=1, bits=32, and a
    // novel text found at test time to share the seen text's probe slot
    // (probe 0 is fp % bits) — the direction a bloom filter may err
    import org.apache.spark.unsafe.types.UTF8String
    def fp(s: String): Long =
      graft.functions.RollingHash.compute(UTF8String.fromString(s))
    val novel = (1 to 500).map(i => s"novel text $i")
      .find(n => fp(n) % 32 == fp("alpha content") % 32 && n != "alpha content")
    assert(novel.nonEmpty, "no colliding probe slot found in 500 candidates")
    val fpOut = Dedup.bloomScreen(docs((20L, novel.get)),
        Dedup.bloomBuild(docs((1L, "alpha content")), bits = 32, k = 1),
        bits = 32, k = 1)
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(fpOut(20L), "colliding slot must surface as maybe_seen (false positive)")
    // misconfiguration fails loudly
    intercept[IllegalArgumentException](Dedup.bloomBuild(seen, bits = 33))
    intercept[IllegalArgumentException](Dedup.bloomBuild(seen, bits = 64, k = 9))
  }

  test("semantic clusters: tight groups merge; isolates and zero-norm vectors stay singletons") {
    import graft.functions.Dedup
    val rnd = new scala.util.Random(41)
    def around(axis: Int, jitter: Double): Seq[Float] = {
      val v = Array.fill(8)(jitter * rnd.nextDouble())
      v(axis) = 1.0; v.map(_.toFloat).toSeq
    }
    val rows =
      (0 until 4).map(i => (i.toLong, around(0, 0.02))) ++ // group A
        (4 until 7).map(i => (i.toLong, around(4, 0.02))) ++ // group B
        Seq((7L, around(2, 0.0)), (8L, around(6, 0.0))) ++ // orthogonal isolates
        Seq((9L, Seq.fill(8)(0f))) // zero-norm: un-scorable, still reported
    val emb = rows.toDF("vec_id", "embedding")
    val out = Dedup.semanticClusters(emb, threshold = 0.9, k = 3,
        centroids = 2, nprobe = 2, sampleSize = 10, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out.size == 10)
    assert((0 to 3).map(i => out(i.toLong)).toSet == Set(0L), s"$out")
    assert((4 to 6).map(i => out(i.toLong)).toSet == Set(4L), s"$out")
    assert(out(7L) == 7L && out(8L) == 8L && out(9L) == 9L, s"$out")
  }

  test("cluster best: highest score wins the component; singletons keep; ties to lowest id") {
    import graft.functions.Dedup
    val docs = Seq((1L, 10L), (2L, 30L), (3L, 20L), (4L, 5L), (5L, 30L))
      .toDF("doc_id", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b") // component {1,2,3}
    val out = Dedup.clusterBest(docs, pairs, col("quality"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(out.toSeq == Seq(
      (1L, 1L, 10L, 3L, false),
      (2L, 1L, 30L, 3L, true),  // top score beats the min-id representative
      (3L, 1L, 20L, 3L, false),
      (4L, 4L, 5L, 1L, true),   // singletons keep themselves
      (5L, 5L, 30L, 1L, true)))
    // equal scores fall back to the lowest doc_id — deterministic
    val tied = Dedup.clusterBest(docs.withColumn("quality", lit(7L)),
      pairs, col("quality"))
    assert(tied.filter($"keep" && $"cluster_id" === 1L)
      .select("doc_id").head.getLong(0) == 1L)
  }

  test("paragraph dedup: within-doc keep-first only — cross-doc repeats untouched") {
    import graft.functions.Dedup
    val docs = Seq(
      (1L, "intro text\nbody copy\nintro text\noutro"), // within-doc repeat
      (2L, "intro text\nall unique here"),   // repeats doc 1's para — KEPT (doc-local rule)
      (3L, "same\nsame\nsame"),              // collapses to one
      (4L, ""),                              // '' is one paragraph; stays ''
      (5L, null))                            // NULL text drops out
      .toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 4L, 3L, "intro text\nbody copy\noutro"),
      (2L, 2L, 2L, "intro text\nall unique here"),
      (3L, 3L, 1L, "same"),
      (4L, 1L, 1L, "")))
  }

  test("temperature mixture: quotas sum to budget and up-sample the low-resource source") {
    import graft.functions.Sampling
    // 3 sources, counts 256 / 64 / 16: raw shares 76/19/5 %; √-scaled
    // shares 16:8:4 → the tail source's quota share (1/7 ≈ 14%) is ~3×
    // its raw share — the point of temperature sampling
    val docs = (0 until 336).map { i =>
      val src = if (i < 256) "big" else if (i < 320) "mid" else "tiny"
      (i.toLong, s"w$i text", src)
    }.toDF("doc_id", "text", "source")
    val out = Sampling.temperatureMixture(docs, totalN = 70)
    val quotas = out.select("source", "quota").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(quotas.values.sum == 70L, s"quotas must sum to the budget: $quotas")
    // √256:√64:√16 = 16:8:4 → exactly 40/20/10 at budget 70
    assert(quotas == Map("big" -> 40L, "mid" -> 20L, "tiny" -> 10L), s"$quotas")
    // keep flags honor the per-source quota
    val kept = out.filter($"keep").groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept == Map("big" -> 40L, "mid" -> 20L, "tiny" -> 10L))
    // deterministic across runs
    assert(Sampling.temperatureMixture(docs, totalN = 70)
      .filter($"keep").select("doc_id").as[Long].collect().sorted.toSeq ==
      out.filter($"keep").select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("balanced shards: serpentine deal bounds imbalance by one document") {
    import graft.functions.Sampling
    // adversarial skew: lengths 1..200 tokens, power-law-ish
    val rnd = new scala.util.Random(47)
    val docs = (0 until 300).map { i =>
      val n = 1 + (math.pow(rnd.nextDouble(), 3) * 199).toInt
      (i.toLong, Seq.fill(n)("w").mkString(" "))
    }.toDF("doc_id", "text")
    val out = Sampling.balancedShards(docs, shards = 8)
    val sums = out.groupBy("shard").agg(sum($"token_count").as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sums.keySet == (0L until 8L).toSet, "every shard must be dealt to")
    val maxTok = out.agg(max($"token_count")).head().getLong(0)
    val imbalance = sums.values.max - sums.values.min
    assert(imbalance <= maxTok,
      s"serpentine bound violated: spread $imbalance > max doc $maxTok")
    // deterministic and total: every doc assigned exactly once
    assert(out.count() == 300 &&
      out.select("doc_id").distinct().count() == 300)
  }

  test("head/middle/tail: sample-cutoff terciles split a known score ladder") {
    import graft.functions.Sampling
    // 9 docs, scores 9..1 — sample covers all, cutoffs at ranks 3 and 6:
    // head ≥ 7, middle ≥ 4, tail below
    val scored = (1 to 9).map(i => (i.toLong, (10 - i).toDouble))
      .toDF("doc_id", "bigram_score")
    val out = Sampling.headMiddleTail(scored, sampleSize = 9)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(2)))
    assert(out.toSeq == Seq(
      (1L, "head"), (2L, "head"), (3L, "head"),
      (4L, "middle"), (5L, "middle"), (6L, "middle"),
      (7L, "tail"), (8L, "tail"), (9L, "tail")))
    // NULL scores are excluded, not bucketed
    val withNull = scored.union(Seq((10L, null.asInstanceOf[java.lang.Double]))
      .toDF("doc_id", "bigram_score"))
    assert(Sampling.headMiddleTail(withNull, sampleSize = 9).count() == 9)
  }

  test("l-diversity: homogeneous classes flagged; NULL sensitive counts as its own value") {
    val rows = Seq(
      (1L, "a", "flu"), (2L, "a", "flu"), (3L, "a", "flu"),   // uniform → l=1
      (4L, "b", "flu"), (5L, "b", "cold"),                    // 2 values
      (6L, "c", null.asInstanceOf[String]),                   // all-NULL → 1 value
      (7L, "c", null.asInstanceOf[String]),
      (8L, "d", "flu"), (9L, "d", null.asInstanceOf[String])) // mixed: flu + NULL = 2
      .toDF("id", "region", "diagnosis")
    val out = DataQuality.lDiversity(rows, Seq("region"), col("diagnosis"), l = 2)
      .orderBy("region").collect()
      .map(r => (r.getAs[String]("region"), r.getAs[Long]("class_size"),
        r.getAs[Long]("n_sensitive"), r.getAs[Boolean]("l_diverse")))
    assert(out.toSeq == Seq(
      ("a", 3L, 1L, false),  // k-large yet homogeneous — the attack k-anonymity misses
      ("b", 2L, 2L, true),
      ("c", 2L, 1L, false),  // all-NULL must read 1 value, not 0
      ("d", 2L, 2L, true)))  // NULL adds one value next to 'flu'
  }

  test("t-closeness: EMD matches the hand-computed ordered-domain value; skewed class flagged; NULL is a domain category") {
    // domain (ordered): 1, 2, 3 — global counts 4, 2, 2 (N=8, m=3)
    val rows = Seq(
      (1L, "a", 1), (2L, "a", 1), (3L, "a", 1), (4L, "a", 1), // all-low skew
      (5L, "b", 2), (6L, "b", 3), (7L, "b", 1), (8L, "b", 3))
      .toDF("id", "region", "severity")
    val out = DataQuality.tCloseness(rows, Seq("region"), col("severity"), t = 0.2)
      .orderBy("region").collect()
      .map(r => (r.getAs[String]("region"), r.getAs[Long]("class_size"),
        r.getAs[Double]("emd"), r.getAs[Boolean]("t_close")))
    // global counts: 1→5 (four from a, one from b), 2→1, 3→2; N=8, m=3;
    // global cum q = (5/8, 6/8, 1).
    // class a: cum p = (1, 1, 1)      → EMD = (3/8 + 2/8 + 0)/2 = 0.3125
    // class b: cum p = (1/4, 2/4, 1)  → EMD = (3/8 + 2/8 + 0)/2 = 0.3125
    // (all gaps are exact binary fractions, so the 2^-30 grid is exact)
    assert(out.length == 2)
    assert(out(0)._1 == "a" && out(0)._2 == 4L && out(0)._3 == 0.3125 && !out(0)._4)
    assert(out(1)._1 == "b" && out(1)._2 == 4L && out(1)._3 == 0.3125 && !out(1)._4)

    // identical-to-global class → EMD 0; NULL category participates
    val rows2 = Seq(
      (1L, "x", Option(1)), (2L, "x", None: Option[Int]),
      (3L, "y", Option(1)), (4L, "y", None: Option[Int]))
      .toDF("id", "region", "severity")
    val out2 = DataQuality.tCloseness(rows2, Seq("region"), col("severity"), t = 0.0)
      .orderBy("region").collect()
    out2.foreach { r =>
      assert(r.getAs[Double]("emd") == 0.0 && r.getAs[Boolean]("t_close"))
    }

    // single-value domain: EMD 0 by definition (m = 1 guard)
    val rows3 = Seq((1L, "x", 7), (2L, "y", 7)).toDF("id", "region", "severity")
    DataQuality.tCloseness(rows3, Seq("region"), col("severity"), t = 0.0)
      .collect().foreach { r =>
        assert(r.getAs[Double]("emd") == 0.0 && r.getAs[Boolean]("t_close"))
      }
  }

  test("c4 clean: every published rule fires independently; NULL text reads empty") {
    val keptLine = "this line ends with a period."
    val rows = Seq(
      // every line-rule arm on one page (plus enough sentences to keep it)
      (1L, Seq(keptLine, "does it end in a question?", "a quoted line ends\"",
        "no terminal punctuation here", "two words.",
        "a javascript tracker line.", keptLine, keptLine,
        keptLine).mkString("\n")),
      (2L, (keptLine + "\n") * 4 + keptLine),      // exactly 5 sentences
      (3L, (keptLine + "\n") * 3 + keptLine),      // only 4 → page drops
      (4L, (keptLine + "\n") * 5 + "Lorem ipsum dolor."), // page poison (ci)
      (5L, (keptLine + "\n") * 5 + "code { brace }."),    // brace poison
      (6L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextAnalysis.c4Clean(rows).orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_lines"),
        r.getAs[Long]("n_kept"), r.getAs[Long]("n_sentences"),
        r.getAs[Boolean]("page_keep"), r.getAs[String]("text"))).toSeq
    // doc 1: period, question, close-quote survive; bare line (no
    // terminal), "two words." (<3 words), javascript line all drop
    assert(out(0)._2 == 9L && out(0)._3 == 6L && out(0)._5,
      s"line rules: ${out(0)}")
    assert(!out(0)._6.contains("javascript") &&
      !out(0)._6.contains("no terminal") && !out(0)._6.contains("two words"))
    assert(out(1)._4 == 5L && out(1)._5, "5 sentences is enough")
    assert(out(2)._4 == 4L && !out(2)._5, "4 sentences is not")
    assert(out(3)._3 == 6L && !out(3)._5, "lorem ipsum poisons the page")
    assert(!out(4)._5, "a curly brace poisons the page")
    assert(out(5) == (6L, 1L, 0L, 0L, false, ""), "NULL text reads empty")
  }

  test("c4 full: blocklist drops pages whole; 3-line spans keep first eligible occurrence only") {
    val l = (s: String) => s"$s line with enough words."
    val promo = Seq(l("promo one"), l("promo two"), l("promo three"))
    val body = (n: Int, tag: String) =>
      (1 to n).map(i => l(s"$tag body $i")).mkString("\n")
    val rows = Seq(
      // doc 1: eligible, carries the promo span FIRST → keeps all lines
      (1L, body(5, "a") + "\n" + promo.mkString("\n")),
      // doc 2: eligible, same promo span → its three lines drop
      (2L, body(5, "b") + "\n" + promo.mkString("\n")),
      // doc 3: blocked page (bad words) — drops WHOLE even though clean
      (3L, body(5, "c") + "\n" + l("please buy cheap pills now")),
      // doc 4: page_keep false (brace) — ineligible, text = cleaned only
      (4L, body(5, "d") + "\ncode { brace }."),
      // doc 5: promo span again; doc 3/4 were ineligible so doc 1 is
      // still the canonical copy → doc 5 loses the lines too
      (5L, promo.mkString("\n") + "\n" + body(5, "e")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.c4Full(rows, Seq("buy cheap pills"),
        minSentences = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Boolean]("page_keep"),
        r.getAs[Boolean]("blocked"), r.getAs[Boolean]("keep"),
        r.getAs[Long]("n_span_dups"), r.getAs[Long]("n_lines_removed"),
        r.getAs[String]("text"))).toSeq
    // doc 1: first eligible occurrence — nothing removed
    assert(out(0)._4 && out(0)._5 == 0L && out(0)._6 == 0L &&
      out(0)._7.contains("promo one"), s"doc1: ${out(0)}")
    // doc 2: exactly the pure promo span duplicates (mixed spans differ
    // by the body lines), its 3 lines drop, body survives
    assert(out(1)._4 && out(1)._5 == 1L && out(1)._6 == 3L &&
      !out(1)._7.contains("promo") && out(1)._7.contains("b body 1"),
      s"doc2: ${out(1)}")
    // doc 3: blocked, whole page drops from the corpus; text stays the
    // CLEANED text for audit, flags say why
    assert(out(2)._2 && out(2)._3 && !out(2)._4 && out(2)._5 == 0L,
      s"doc3: ${out(2)}")
    // doc 4: page rule failed — ineligible, span stats zero
    assert(!out(3)._2 && !out(3)._3 && !out(3)._4 && out(3)._6 == 0L,
      s"doc4: ${out(3)}")
    // doc 5: duplicate again (canonical copy is doc 1, ineligible docs
    // never claimed it)
    assert(out(4)._4 && out(4)._5 == 1L && out(4)._6 == 3L &&
      !out(4)._7.contains("promo"), s"doc5: ${out(4)}")
  }

  test("chunk windows: overlapping stride slices, ragged tail, null docs emit nothing") {
    val fixture = Seq(
      (1L, "a b c d e"),                 // n=5, w=3, s=2 → starts 0,2
      (2L, "a b c d e f"),               // n=6 → starts 0,2,4 (ragged tail)
      (3L, "x y"),                       // n<=w → one short window
      (4L, null.asInstanceOf[String]))   // producer: no rows
      .toDF("doc_id", "text")
    val out = TextAnalysis.chunkWindows(fixture, windowTokens = 3, stride = 2)
      .orderBy("doc_id", "chunk_idx")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(out.toSeq == Seq(
      (1L, 0L, 0L, 3L, "a b c"), (1L, 1L, 2L, 3L, "c d e"),
      (2L, 0L, 0L, 3L, "a b c"), (2L, 1L, 2L, 3L, "c d e"),
      (2L, 2L, 4L, 2L, "e f"),
      (3L, 0L, 0L, 2L, "x y")))
  }

  test("hybrid rerank: cosine reorders the lexical candidates, missing embeddings drop") {
    // candidates in BM25 order 1,2,3,4; embeddings make doc 3 closest to the
    // query, then doc 1; doc 2 has NO embedding (drops); doc 4 is orthogonal
    val cands = Seq((1L, 1), (2L, 2), (3L, 3), (4L, 4)).toDF("doc_id", "rank")
    val emb = Seq(
      (1L, Seq(0.6f, 0.8f, 0.0f)),
      (3L, Seq(1.0f, 0.0f, 0.0f)),
      (4L, Seq(0.0f, 0.0f, 1.0f)),
      (99L, Seq(1.0f, 0.0f, 0.0f))) // query vector, not a candidate
      .toDF("vec_id", "embedding")
    val out = Similarity.rerankCandidates(
      cands, emb, emb.filter($"vec_id" === 99L), k = 10)
      .as[(Long, Int, Double, Int)].collect().toSeq
    assert(out.map(_._1) == Seq(3L, 1L, 4L), "cosine order, doc 2 dropped")
    assert(out.map(_._4) == Seq(1, 2, 3), "final rank is dense over survivors")
    assert(out.head._3 == 1.0 && out.head._2 == 3, "stage-1 rank carried through")
    assert(math.abs(out(1)._3 - 0.6) < 1e-6) // float32 fixture, not exact 0.6
  }

  test("snapshot diff: added/removed/changed/unchanged, NULL text is diff-stable") {
    val oldSnap = docs((1L, "alpha"), (2L, "beta"), (4L, "delta"))
      .unionByName(Seq((5L, null.asInstanceOf[String]), (6L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"))
    val newSnap = docs((1L, "alpha"), (3L, "gamma"), (4L, "delta EDITED"))
      .unionByName(Seq((5L, null.asInstanceOf[String]), (6L, "now present"))
        .toDF("doc_id", "text"))
    val out = Snapshot.diff(oldSnap, newSnap).orderBy("doc_id")
      .as[(Long, String)].collect().toSeq
    assert(out == Seq(
      1L -> "unchanged", // identical text
      2L -> "removed",   // only in old
      3L -> "added",     // only in new
      4L -> "changed",   // edited text
      5L -> "unchanged", // NULL on both sides: absent content is stable
      6L -> "changed"))  // NULL -> real text
  }

  test("mixture sampling: Hamilton apportionment invariants, shortfall stays visible") {
    import graft.functions.Sampling.apportion
    // the q_sample_mixture constants: tie on remainder (c vs d) breaks by key
    val q = apportion(Map("a" -> 4L, "b" -> 2L, "c" -> 1L, "d" -> 1L), 60L)
    assert(q == Map("a" -> 30L, "b" -> 15L, "c" -> 8L, "d" -> 7L))
    // conservation + one-slot bound at every budget
    for (n <- 0 to 60) {
      val qq = apportion(Map("x" -> 3L, "y" -> 5L, "z" -> 9L), n.toLong)
      assert(qq.values.sum == n.toLong, s"budget $n not conserved")
      for ((s, w) <- Map("x" -> 3L, "y" -> 5L, "z" -> 9L))
        assert(math.abs(qq(s) - n * w / 17.0) < 1.0 + 1e-9,
          s"quota for $s at budget $n drifted more than one slot")
    }
    // a source with fewer rows than quota keeps them all; no redistribution
    val fix = ((1L to 10L).map(i => (i, s"doc a $i", "a")) ++
      Seq((11L, "doc b 11", "b"), (12L, "doc b 12", "b")) ++
      (13L to 20L).map(i => (i, s"unweighted $i", "zzz")))
      .toDF("doc_id", "text", "source")
    val out = graft.functions.Sampling.mixtureSample(
      fix, Map("a" -> 1L, "b" -> 1L), totalN = 10L)
      .as[(Long, String, Long, Long, Boolean)].collect()
    val keptBySrc = out.filter(_._5).groupBy(_._2).view.mapValues(_.length).toMap
    assert(keptBySrc == Map("a" -> 5, "b" -> 2)) // b's quota 5, only 2 exist
    // unweighted sources rank but never keep; quota column reports the plan
    assert(out.filter(_._2 == "zzz").forall(r => r._4 == 0L && !r._5))
    assert(out.filter(_._2 == "b").forall(_._4 == 5L))
  }

  test("leakage-safe split: cluster members share the representative's split; singletons key on their own id") {
    val corpus = docs((1L, "aa"), (2L, "bb"), (7L, "cc"), (9L, "dd"))
    // 1–2 and 2–7 are near-dups → one cluster with representative 1; 9 alone
    val pairs = Seq((1L, 2L), (2L, 7L)).toDF("doc_a", "doc_b")
    val out = Sampling.leakageSafeSplit(corpus, pairs,
        Seq(("train", 8), ("test", 2)))
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 1L, 1L, 9L))
    // the leakage guarantee: every cluster member gets the SAME split
    assert(out.take(3).map(_.getString(3)).distinct.length == 1)
    // buckets equal the rolling hash of the representative id's string
    import org.apache.spark.unsafe.types.UTF8String
    val h1 = graft.functions.RollingHash.compute(UTF8String.fromString("1")) % 10
    val h9 = graft.functions.RollingHash.compute(UTF8String.fromString("9")) % 10
    assert(out.take(3).forall(_.getLong(2) == h1))
    assert(out(3).getLong(2) == h9)
  }

  test("classifierScore: exact integer tf·w + bias, one final division, integer threshold verdict") {
    val corpus = docs(
      (1L, "spark spark the"),      // 2·500000 − 300000 + 25000 = 725000, n=3
      (2L, "a a"),                  // −800000 + 25000 = −775000, n=2
      (3L, "zzz"),                  // no hits → bias alone = 25000, n=1
      (4L, null.asInstanceOf[String]), // unscorable
      (5L, ""),                     // content-free — must NOT pass on bias
      (6L, "   \t "))               // whitespace-only — same
    val w = Seq("spark" -> 500000L, "the" -> -300000L, "a" -> -400000L)
    val out = TextAnalysis.classifierScore(corpus, w,
        bias = 25000L, thresholdMicros = 25000L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]), r.getBoolean(4))).toSeq
    assert(out == Seq(
      (1L, 3L, 725000L, Some(725000.0 / 3000000.0), true),   // 725000 ≥ 75000
      (2L, 2L, -775000L, Some(-775000.0 / 2000000.0), false),
      (3L, 1L, 25000L, Some(25000.0 / 1000000.0), true),     // bias meets 25000·1
      (4L, 0L, 25000L, None, false),                         // gate admits nothing unscorable
      (5L, 0L, 25000L, None, false),                         // '' is not one empty token
      (6L, 0L, 25000L, None, false)))                        // nor is whitespace
    // the projection form (map-literal fold) is row-identical to the
    // join form on the same fixture — including the NULL/blank arms
    val inline = TextAnalysis.classifierScoreInline(corpus, w,
        bias = 25000L, thresholdMicros = 25000L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]), r.getBoolean(4))).toSeq
    assert(inline == out)
    // misconfigured models fail loudly, not silently
    intercept[IllegalArgumentException](
      TextAnalysis.classifierScore(corpus, Seq.empty))
    intercept[IllegalArgumentException](
      TextAnalysis.classifierScore(corpus, Seq("x" -> 1L, "x" -> 2L)))
    intercept[IllegalArgumentException](
      TextAnalysis.classifierScore(corpus, Seq("" -> 1L)))
    intercept[IllegalArgumentException](
      TextAnalysis.classifierScoreInline(corpus, Seq("" -> 1L)))
  }

  test("scrubPassages: doc_b spans excised keep-first, reconstruction is exact token-slice arithmetic") {
    // chunk size 2: doc1 [a b][c d][e f]; doc2 [x x][a b][c d][y y] shares
    // a 2-chunk run with doc1 at ib=1..2; doc3 is a verbatim copy of doc1
    // (all 3 chunks removed); doc4 has no text at all
    val corpus = docs(
      (1L, "a b c d e f"),
      (2L, "x x a b c d y y"),
      (3L, "a b c d e f"),
      (4L, null.asInstanceOf[String]))
    val runs = Dedup.duplicatePassages(corpus, chunkTokens = 2,
      minChunks = 2, maxChunkDf = 64)
    val out = Dedup.scrubPassages(corpus, runs, chunkTokens = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.getString(3)))).toSeq
    assert(out == Seq(
      (1L, 3L, 0L, Some("a b c d e f")), // first occurrence keeps everything
      (2L, 4L, 2L, Some("x x y y")),     // the copied middle is excised
      (3L, 3L, 3L, Some("")),            // full duplicate scrubs to empty
      (4L, 0L, 0L, None)))               // null text stays null
  }

  test("persisted cluster table: stored decisions equal the embedded recompute; indexed split equals the from-scratch split") {
    val corpus = docs((1L, "aa"), (2L, "bb"), (7L, "cc"), (9L, "dd"))
    val pairs = Seq((1L, 2L), (2L, 7L)).toDF("doc_a", "doc_b")
    val name = "graft_test_cl_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    Dedup.writeClusterTable(corpus, pairs, name, buckets = 2)
    try {
      val stored = Dedup.clusterTable(spark, name)
        .orderBy("doc_id").collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
      val fresh = Dedup.dedupDecisions(corpus, pairs)
        .orderBy("doc_id").collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
      assert(stored == fresh)
      // meta counts agree with the stored rows
      val meta = spark.table(s"${name}_meta").first()
      assert(meta.getLong(0) == 4L && meta.getLong(1) == 2L)
      // the indexed read path answers exactly like the from-scratch split
      val viaIndex = Sampling.leakageSafeSplitIndexed(spark, name,
          Seq(("train", 8), ("test", 2)))
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      val scratch = Sampling.leakageSafeSplit(corpus, pairs,
          Seq(("train", 8), ("test", 2)))
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(viaIndex == scratch)
    } finally Dedup.dropClusterTable(spark, name)
    // dropped means dropped: a reader must fail, not half-answer
    intercept[Exception](Dedup.clusterTable(spark, name).collect())
  }

  test("bigram score: exact rational arithmetic on a hand-computed model") {
    // corpus bigrams: doc1 (a,b)(b,a)(a,b); doc2 (a,b)(b,c)
    // c12: (a,b)=3 (b,a)=1 (b,c)=1; c1: a=3 b=2; V = |{a,b,c,z}| = 4
    // addK=1: P(b|a)=4/7, P(a|b)=2/6, P(c|b)=2/6
    val corpus = docs(
      (1L, "a b a b"),
      (2L, "a b c"),
      (3L, "z"),                       // one token: no bigram position
      (4L, null.asInstanceOf[String]))
    val out = TextAnalysis.bigramScore(corpus, addK = 1.0)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    // expected sums fold LEFT in position order, like both engines do
    val p_ab = 4.0 / 7.0; val p_ba = 2.0 / 6.0; val p_bc = 2.0 / 6.0
    assert(out.toSeq == Seq(
      (1L, 3L, Some((0.0 + p_ab + p_ba + p_ab) / 3.0)),
      (2L, 2L, Some((0.0 + p_ab + p_bc) / 2.0)),
      (3L, 0L, None),
      (4L, 0L, None)))
    // the ordering the filter exists for: text made of the corpus's common
    // continuations outscores text with rarer continuations
    assert(out(0)._3.get > out(1)._3.get)
  }

  test("stupid backoff: all three arms score their exact count ratios") {
    // train: trigrams abc=2 bca=1 cab=1; bigrams ab=2 bc=2 ca=1;
    // unigrams a=b=c=2, N=6
    val train = docs((0L, "a b c a b c"))
    val batch = docs(
      (9L, "a b c d"),   // head arm (abc: 2/2), then unigram arm with c_d=0
      (10L, "x a b"),    // bigram arm: α·(c_ab/c_a) = 0.4·(2/2)
      (11L, "q q c"),    // unigram arm: α²·(c_c/N)
      (12L, "hi"))       // <3 tokens: no positions
    val out = TextAnalysis.trigramBackoffScore(batch, train, alpha = 0.4)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    assert(out.toSeq == Seq(
      (9L, 2L, Some((0.0 + 2.0 / 2.0 + 0.4 * 0.4 * (0.0 / 6.0)) / 2.0)),
      (10L, 1L, Some((0.0 + 0.4 * (2.0 / 2.0)) / 1.0)),
      (11L, 1L, Some((0.0 + 0.4 * 0.4 * (2.0 / 6.0)) / 1.0)),
      (12L, 0L, None)))
  }

  test("bigram perplexity: log-space rendering agrees with the model") {
    val corpus = docs((1L, "a b a b"), (2L, "a b c"), (3L, "z"))
    val out = TextAnalysis.bigramPerplexity(corpus, addK = 1.0)
      .orderBy("doc_id").collect()
    val p_ab = 4.0 / 7.0; val p_ba = 2.0 / 6.0; val p_bc = 2.0 / 6.0
    val h1 = -(math.log(p_ab) + math.log(p_ba) + math.log(p_ab)) / 3.0
    val h2 = -(math.log(p_ab) + math.log(p_bc)) / 2.0
    assert(math.abs(out(0).getAs[Double]("cross_entropy") - h1) < 1e-12)
    assert(math.abs(out(0).getAs[Double]("perplexity") - math.exp(h1)) < 1e-9)
    assert(math.abs(out(1).getAs[Double]("perplexity") - math.exp(h2)) < 1e-9)
    // perplexity orders INVERSELY to bigramScore on this fixture
    assert(out(0).getAs[Double]("perplexity") < out(1).getAs[Double]("perplexity"))
    assert(out(2).isNullAt(2) && out(2).isNullAt(3))
  }

  test("duplicate passages: diagonal runs, offset starts, ragged ends") {
    val corpus = docs(
      (1L, "p q r s t u"),          // chunks(2): [p q][r s][t u]
      (2L, "x x p q r s w w"),      // chunks(2): [x x][p q][r s][w w]
      (3L, "p q z z r s"))          // chunks(2): [p q][z z][r s]
    val out = Dedup.duplicatePassages(corpus, chunkTokens = 2,
        minChunks = 2, maxChunkDf = 64)
      .orderBy("doc_a", "doc_b", "start_a", "start_b")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    // doc1↔doc2 share [p q][r s] consecutively at offset −1: one 2-chunk
    // span; doc1↔doc3 and doc2↔doc3 share chunks only on BROKEN diagonals
    // (isolated singles), which minChunks=2 drops
    assert(out.toSeq == Seq((1L, 2L, 0L, 1L, 2L, 4L)))
  }

  test("bipartite passages: benchmark span located inside a corpus doc at the right offset") {
    val corpus = docs(
      (1L, "x x p q r s t u w w"),  // chunks(2): [x x][p q][r s][t u][w w]
      (2L, "m m n n o o"))
    val bench = docs((100L, "p q r s t u"))  // chunks: [p q][r s][t u]
    val out = Dedup.duplicatePassagesAgainst(corpus, bench,
        chunkTokens = 2, minChunks = 2)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    // the benchmark's 3 chunks sit inside doc 1 starting at its chunk 1
    assert(out.toSeq == Seq((1L, 100L, 1L, 0L, 3L, 6L)))
  }

  test("duplicate passages: identical docs yield the full-length run; hot-chunk guard empties ubiquitous fingerprints") {
    val twins = docs((10L, "a b c d"), (11L, "a b c d"))
    val full = Dedup.duplicatePassages(twins, chunkTokens = 2, minChunks = 2)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(full.toSeq == Seq((10L, 11L, 0L, 0L, 2L, 4L)))
    // every shared fingerprint here occurs 3 times > maxChunkDf=2 → all
    // excluded before pairing, so no passage survives
    val tri = docs((1L, "p q r s"), (2L, "p q r s"), (3L, "p q r s"))
    assert(Dedup.duplicatePassages(tri, chunkTokens = 2, minChunks = 1,
      maxChunkDf = 2).count() == 0L)
  }

  test("length batches: hand-worked padding bill, sorted arm never pads more, NULL text drops") {
    val fixture = Seq(
      (0L, "a"), (1L, "a b b b"), (2L, "a b"), (3L, "a b c"),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = graft.functions.Sampling.lengthBatches(fixture,
        batchSize = 2, shards = 1)
      .orderBy("arm", "shard", "batch_id")
      .select("arm", "batch_id", "n_docs", "max_tokens", "sum_tokens",
        "pad_tokens")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // arrival order (0,1),(2,3): max 4 sum 5 pad 3; max 3 sum 5 pad 1
    // length-sorted (1,3),(2,0): max 4 sum 7 pad 1; max 2 sum 3 pad 1
    assert(out == Seq(
      ("arrival", 0L, 2L, 4L, 5L, 3L),
      ("arrival", 1L, 2L, 3L, 5L, 1L),
      ("length_sorted", 0L, 2L, 4L, 7L, 1L),
      ("length_sorted", 1L, 2L, 2L, 3L, 1L)),
      "padding arithmetic diverged from the hand-worked fixture")
    assert(out.map(_._3).sum == 8L, "NULL-text doc must not be batched")
    // the sorting theorem on the real corpus: total pad(sorted) <= pad(arrival)
    val corpus = graft.sources.Tables.documents(spark, sf)
    val bill = graft.functions.Sampling.lengthBatches(corpus,
        batchSize = 16, shards = 4)
      .groupBy("arm").agg(sum("pad_tokens").as("pad"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bill("length_sorted") <= bill("arrival"),
      s"sorted arm padded more than arrival: $bill")
  }

  test("url canonicalization: case/www/port/fragment/tracking/param-order/slash all collapse; scheme-less is NULL") {
    import graft.functions.TextAnalysis
    val cases = Seq(
      // every variant of the same logical page...
      (1L, "HTTPS://WWW.Site.COM:443/a/?utm_source=x#top"),
      (2L, "https://site.com/a"),
      (3L, "https://Site.com/a/"),
      (4L, "https://www.site.com/a?fbclid=123"),
      // ...and genuinely different pages
      (5L, "https://site.com/A"),            // path case matters
      (6L, "https://site.com:8080/a"),       // non-default port kept
      (7L, "http://site.com:80/a"),          // http default stripped
      (8L, "https://site.com/a?b=2&a=1"),    // params sorted
      (9L, "https://site.com/a?a=1&b=2"),    // same page as 8
      (10L, "not-a-url"),                    // no scheme -> NULL
      (11L, "https://site.com"))             // empty path -> '/'
      .toDF("doc_id", "url")
    val out = TextAnalysis.urlFrontier(cases)
      .select("doc_id", "url_canonical", "should_fetch")
      .as[(Long, String, Boolean)].collect().sortBy(_._1)
    val canon = out.map(o => o._1 -> o._2).toMap
    assert(Seq(1L, 2L, 3L, 4L).map(canon).distinct ==
      Seq("https://site.com/a"), "variants of one page must collapse")
    assert(canon(5L) == "https://site.com/A")
    assert(canon(6L) == "https://site.com:8080/a")
    assert(canon(7L) == "http://site.com/a")
    assert(canon(8L) == "https://site.com/a?a=1&b=2")
    assert(canon(8L) == canon(9L))
    assert(canon(10L) == null, "scheme-less input must canonicalize to NULL")
    assert(canon(11L) == "https://site.com/")
    val fetch = out.map(o => o._1 -> o._3).toMap
    // group {1,2,3,4}: only the lowest id fetches; NULL always fetches
    assert(fetch(1L) && !fetch(2L) && !fetch(3L) && !fetch(4L))
    assert(fetch(10L))
    assert(fetch(8L) && !fetch(9L))
  }

  // ---- DSIR (hashed-bigram importance resampling) ----

  private def dsirDocs(rows: (Long, String, String)*): DataFrame =
    rows.toDF("doc_id", "text", "source")

  private val dsirFixture = dsirDocs(
    (1L, "alpha beta alpha beta gamma", "tgt"),
    (2L, "alpha beta delta epsilon", "tgt"),
    (3L, "zeta eta theta iota kappa", "raw"),
    (4L, "theta iota kappa zeta eta", "raw"),
    (5L, "alpha beta gamma delta", "raw"), // target-like content, raw source
    (6L, "solo", "raw"),                   // 1 token -> no bigram features
    (7L, null.asInstanceOf[String], "raw"))

  private def dsirTarget = dsirFixture.filter($"source" === "tgt")

  test("dsir model: full range(B) spine, counts conserved, lrq on the 2^20 grid") {
    val b = 64
    val m = Sampling.dsirLogRatios(dsirFixture, dsirTarget, b).collect()
    assert(m.length == b)
    assert(m.map(_.getAs[Long]("bucket")).sorted.toSeq == (0L until b).toSeq)
    val nt = m.map(_.getAs[Long]("ct")).sum
    val nr = m.map(_.getAs[Long]("cr")).sum
    // bigram occurrence totals: doc1 has 4, doc2 has 3 (target); raw adds
    // doc3 4, doc4 4, doc5 3; doc6/doc7 contribute none
    assert(nt == 7 && nr == 18)
    m.foreach { r =>
      val exact = math.log((r.getAs[Long]("ct") + 1.0) / (r.getAs[Long]("cr") + 1.0)) +
        math.log((nr + b).toDouble / (nt + b).toDouble)
      assert(math.abs(r.getAs[Long]("lrq") - 1048576.0 * exact) <= 0.5 + 1e-6,
        s"bucket ${r.getAs[Long]("bucket")}: lrq off the quantization grid")
    }
  }

  test("dsir score: weight is the exact integer sum of the doc's bucket lrq; featless and NULL docs keep the unigramScore contract") {
    val b = 64
    val model = Sampling.dsirLogRatios(dsirFixture, dsirTarget, b)
    val lrq = model.collect().map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("lrq")).toMap
    // independent replay of the feature stream: tokenize + rolling hash in Scala
    def bucketsOf(text: String): Seq[Long] = {
      val t = text.trim.split("\\s+").toSeq
      t.zip(t.tail).map { case (w1, w2) =>
        graft.functions.RollingHash.compute(
          org.apache.spark.unsafe.types.UTF8String.fromString(s"$w1 $w2")) % b
      }
    }
    val out = Sampling.dsirScore(dsirFixture, model, b).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    dsirFixture.collect().foreach { d =>
      val id = d.getAs[Long]("doc_id")
      val text = d.getAs[String]("text")
      if (text == null || text.trim.split("\\s+").length < 2) {
        assert(out(id).getAs[Long]("n_feats") == 0L)
        assert(out(id).isNullAt(out(id).fieldIndex("weight_q")))
        assert(out(id).isNullAt(out(id).fieldIndex("log_weight")))
      } else {
        val bs = bucketsOf(text)
        assert(out(id).getAs[Long]("n_feats") == bs.length)
        assert(out(id).getAs[Long]("weight_q") == bs.map(lrq).sum,
          s"doc $id: weight_q must be the exact integer lrq sum")
        assert(out(id).getAs[Double]("log_weight") ==
          bs.map(lrq).sum.toDouble / 1048576.0)
      }
    }
  }

  test("dsir semantic: target-distribution docs outweigh off-distribution docs, wherever they came from") {
    val model = Sampling.dsirLogRatios(dsirFixture, dsirTarget, 64)
    val w = Sampling.dsirScore(dsirFixture, model, 64).collect()
      .filter(!_.isNullAt(2)).map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("weight_q")).toMap
    // doc5 shares the target's bigrams despite its raw source; docs 3/4 do not
    assert(w(5L) > w(3L) && w(5L) > w(4L),
      "target-LIKE content must outscore off-distribution content")
    assert(Seq(1L, 2L).map(w).min > Seq(3L, 4L).map(w).max)
  }

  test("dsir select: threshold ties break toward lower doc_id; NULL weights never keep; short corpus keeps everything scored") {
    val scored = Seq(
      (1L, 3L, Option(100L), Option(100.0 / 1048576)),
      (2L, 3L, Option(500L), Option(500.0 / 1048576)),
      (3L, 3L, Option(100L), Option(100.0 / 1048576)),
      (4L, 3L, Option(100L), Option(100.0 / 1048576)),
      (5L, 0L, None: Option[Long], None: Option[Double]))
      .toDF("doc_id", "n_feats", "weight_q", "log_weight")
    val keep = Sampling.dsirSelect(scored, 2).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    assert(keep == Map(1L -> true, 2L -> true, 3L -> false, 4L -> false, 5L -> false),
      "n=2: the 500 plus the LOWEST-id 100; the tied 3/4 stay out")
    val all = Sampling.dsirSelect(scored, 10).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    assert(all == Map(1L -> true, 2L -> true, 3L -> true, 4L -> true, 5L -> false),
      "n beyond the scored count keeps every non-NULL row, never the NULL one")
  }

  test("dsir indexed: stored-model scoring equals from-scratch; params row pins the bucket width") {
    val name = "graft_test_dsir_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    Sampling.writeDsirModel(spark, name, dsirFixture, dsirTarget, buckets = 32)
    try {
      assert(spark.table(s"${name}_params").head().getAs[Long]("buckets") == 32L)
      val fresh = Sampling.dsirScore(dsirFixture,
        Sampling.dsirLogRatios(dsirFixture, dsirTarget, 32), 32)
        .orderBy("doc_id").collect().toSeq
      val stored = Sampling.dsirScoreIndexed(spark, name, dsirFixture)
        .orderBy("doc_id").collect().toSeq
      assert(stored == fresh, "write -> read must not change a single cell")
    } finally Sampling.dropDsirModel(spark, name)
  }

  test("cross-entropy selection: target-like docs score higher; exact quantized weights vs an independent replay; featless docs NULL") {
    val scored = Sampling.crossEntropyScore(dsirFixture, dsirTarget).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // featless docs (1 token / NULL text) carry the unigramScore contract
    Seq(6L, 7L).foreach { id =>
      assert(scored(id).getAs[Long]("n_bigrams") == 0L)
      assert(scored(id).isNullAt(scored(id).fieldIndex("diff_q")))
      assert(scored(id).isNullAt(scored(id).fieldIndex("ce_diff")))
    }
    val ce = scored.collect { case (id, r) if !r.isNullAt(3) =>
      id -> r.getAs[Double]("ce_diff") }
    // doc5 shares the target's bigrams despite its raw source; 3/4 do not
    assert(ce(5L) > ce(3L) && ce(5L) > ce(4L))
    assert(Seq(1L, 2L).map(ce).min > Seq(3L, 4L).map(ce).max)
    // independent replay: per-occurrence quantized log-prob gap in Scala
    val toks = Map( // fixture docs with >= 2 tokens
      1L -> "alpha beta alpha beta gamma", 2L -> "alpha beta delta epsilon",
      3L -> "zeta eta theta iota kappa", 4L -> "theta iota kappa zeta eta",
      5L -> "alpha beta gamma delta").map { case (k, v) =>
        k -> v.split(" ").toSeq }
    val tgtIds = Seq(1L, 2L)
    def model(ids: Seq[Long]) = {
      val bgs = ids.flatMap(i => toks(i).zip(toks(i).tail))
      (bgs.groupBy(identity).map { case (k, v) => k -> v.size.toLong },
        bgs.groupBy(_._1).map { case (k, v) => k -> v.size.toLong },
        ids.flatMap(toks).distinct.size.toLong)
    }
    val (mT, cT, vT) = model(tgtIds)
    val (mR, cR, vR0) = model(toks.keys.toSeq)
    // the raw VOCABULARY also counts 1-token docs ("solo" contributes a
    // term but no bigram) — the engine's V is the whole training corpus
    val vR = vR0 + 1
    def lq(m: Map[(String, String), Long], c: Map[String, Long], v: Long)(
        bg: (String, String)): Long =
      math.round(math.log((m.getOrElse(bg, 0L) + 1.0) /
        (c.getOrElse(bg._1, 0L) + 1.0 * v)) * 1048576.0)
    toks.keys.foreach { id =>
      val bgs = toks(id).zip(toks(id).tail)
      val expected = bgs.map(b => lq(mT, cT, vT)(b) - lq(mR, cR, vR)(b)).sum
      assert(scored(id).getAs[Long]("diff_q") == expected,
        s"doc $id: diff_q must be the exact quantized gap sum")
      assert(scored(id).getAs[Double]("ce_diff") ==
        expected.toDouble / bgs.length / 1048576.0)
    }
  }

  test("cross-entropy select: threshold ties break toward lower doc_id; NULLs never keep") {
    val scored = Seq(
      (1L, 3L, Option(300L), Option(1.0)),
      (2L, 3L, Option(900L), Option(3.0)),
      (3L, 3L, Option(300L), Option(1.0)),
      (4L, 0L, None: Option[Long], None: Option[Double]))
      .toDF("doc_id", "n_bigrams", "diff_q", "ce_diff")
    val keep = Sampling.crossEntropySelect(scored, 2).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    assert(keep == Map(1L -> true, 2L -> true, 3L -> false, 4L -> false))
  }

  test("cross-entropy indexed: stored-LM scoring equals from-scratch cell for cell") {
    import graft.functions.TextAnalysis
    val tag = java.util.UUID.randomUUID().toString.replace("-", "")
    val (tn, rn) = (s"graft_test_cet_$tag", s"graft_test_cer_$tag")
    TextAnalysis.writeLmTable(dsirTarget, tn, buckets = 4)
    TextAnalysis.writeLmTable(dsirFixture, rn, buckets = 4)
    try {
      val fresh = Sampling.crossEntropyScore(dsirFixture, dsirTarget)
        .orderBy("doc_id").collect().toSeq
      val stored = Sampling.crossEntropyScoreIndexed(spark, tn, rn, dsirFixture)
        .orderBy("doc_id").collect().toSeq
      assert(stored == fresh, "write -> read must not change a single cell")
    } finally {
      TextAnalysis.dropLmTable(spark, tn)
      TextAnalysis.dropLmTable(spark, rn)
    }
  }

  test("dsir gumbel: deterministic across reruns, exact-n keep, and the draw actually perturbs the temperature-0 order") {
    val scored = (1L to 30L).map(i =>
      (i, 3L, Option(1000L - i), Option((1000.0 - i) / 1048576)))
      .toDF("doc_id", "n_feats", "weight_q", "log_weight")
    def kept(df: DataFrame): Set[Long] = df.collect()
      .filter(_.getAs[Boolean]("keep")).map(_.getAs[Long]("doc_id")).toSet
    val g1 = kept(Sampling.dsirSelectGumbel(scored, 10, temperature = 50.0))
    val g2 = kept(Sampling.dsirSelectGumbel(scored, 10, temperature = 50.0))
    assert(g1 == g2, "hash-derived Gumbel draws must replay bit-for-bit")
    assert(g1.size == 10)
    val t0 = kept(Sampling.dsirSelect(scored, 10))
    assert(t0 == (1L to 10L).toSet)
    assert(g1 != t0, "at high temperature the Gumbel draw must escape the argmax set")
  }
}
