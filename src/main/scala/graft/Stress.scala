package graft

import graft.functions.{Dedup, Similarity}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-probe main behind the SCALE.md evidence — reproducible runs of
  * the operators against stress corpora (dev diagnostic, not part of the
  * driver contract):
  *
  *   runMain graft.Stress clusters <docs.parquet>   near-twin clustering
  *   runMain graft.Stress recall <sfDir>            IVF recall@10 vs brute
  *   runMain graft.Stress sessions <nHot> <nRest>   sessionize under key skew
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      // SPARK_GRAFT_SHUFFLE decouples shuffle parallelism from thread
      // count for scale-ladder probes: a fixed cpu-count partition number
      // is the right bench config at sf0.1, but at 100× replication each
      // partition outgrows memory and the sort-merge joins spill — the
      // ladder measures that regime by default and with this knob measures
      // the scaled-partitioning regime a real cluster runs in.
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.toList match {
      case "clusters" :: path :: Nil => clusters(spark, path)
      case "recall" :: dir :: Nil    => recall(spark, dir)
      case "sessions" :: hot :: rest :: Nil => sessions(spark, hot.toLong, rest.toLong)
      case "chain" :: n :: Nil       => chain(spark, n.toLong)
      case "semdedup" :: nc :: per :: Nil => semdedup(spark, nc.toInt, per.toInt)
      case "skewjoin" :: n :: Nil    => skewjoin(spark, n.toLong)
      case "incrrollup" :: users :: days :: Nil =>
        incrRollup(spark, users.toLong, days.toInt)
      case "zorder" :: dir :: files :: Nil =>
        zorder(spark, dir, files.toInt)
      case "bpe" :: dir :: merges :: Nil => bpe(spark, dir, merges.toInt)
      case "blocklist" :: dir :: k :: Nil => blocklist(spark, dir, k.toInt)
      case "pqsize" :: dir :: Nil => pqsize(spark, dir)
      case "annscale" :: nc :: per :: Nil => annscale(spark, nc.toInt, per.toInt)
      case "annbatch" :: nc :: per :: nq :: Nil =>
        annbatch(spark, nc.toInt, per.toInt, nq.toLong)
      case "pqbatch" :: nc :: per :: nq :: Nil =>
        pqbatch(spark, nc.toInt, per.toInt, nq.toLong)
      case "ladder" :: dir :: kind :: fs if fs.nonEmpty =>
        ladder(spark, dir, kind, fs.map(_.toInt))
      case "gtprobe" :: dir :: Nil => gtprobe(spark, dir)
      case "gatecap" :: fam :: per :: Nil => gatecap(spark, fam.toInt, per.toInt)
      case "boilerinc" :: dir :: ks if ks.nonEmpty =>
        boilerinc(spark, dir, ks.map(_.toInt))
      case "delprobe" :: nc :: per :: dels :: Nil =>
        delprobe(spark, nc.toInt, per.toInt, dels.toInt)
      case "phashscale" :: groups :: per :: Nil =>
        phashScale(spark, groups.toInt, per.toInt)
      case "assignplan" :: dir :: cells :: Nil =>
        assignPlan(spark, dir, cells.toInt)
      case "pipelinestages" :: dir :: Nil => pipelineStages(spark, dir)
      case "substrplan" :: dir :: w :: Nil =>
        substrPlan(spark, dir, w.toInt)
      case "linescale" :: docs :: lines :: pool :: Nil =>
        lineScale(spark, docs.toLong, lines.toInt, pool.toInt)
      case other => sys.error(s"unknown args: $other")
    }
    spark.stop()
  }

  /** PLAN-SIZE evidence for the broadcast-assignment bound
    * (the two-level broadcast dispatch): at a given cell
    * count, build the literal two-level and the broadcast assignment
    * frames over `dir`'s embeddings and print each executed plan's
    * rendered size plus one timed count — the literal plan grows with
    * cells·dim doubles (every centroid folded into the expression tree),
    * the broadcast plan is one CellProbeExpr node regardless of cells.
    *
    *   runMain graft.Stress assignplan /tmp/graft_ladder/assign/x100 855
    */
  private def assignPlan(spark: SparkSession, dir: String,
      cells: Int): Unit = {
    val emb = sources.Tables.embeddings(spark, dir)
    def probe(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val planChars = df.queryExecution.executedPlan.toString.length
      val t0 = System.nanoTime()
      val n = df.filter(col("cluster") >= 0).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[assignplan] $name cells=$cells rows=$n " +
        f"planChars=$planChars time=$sec%.2fs")
    }
    probe("literal_2lvl", functions.Similarity.assignProbe(emb, cells,
      twoLevel = true, sampleSize = math.max(256, cells * 4)))
    probe("broadcast", functions.Similarity.assignProbeBcast(emb, cells,
      sampleSize = math.max(256, cells * 4)))
  }

  /** Per-stage timing of [[graft.functions.Dedup.substringDedup]] over a
    * rung dir — each stage is counted CUMULATIVELY (a stage's time
    * includes its inputs; the delta between neighbours isolates it), so
    * a ladder regression names a stage instead of a total.
    *
    *   runMain graft.Stress substrplan /tmp/graft_ladder/substr/x30 40
    */
  private def substrPlan(spark: SparkSession, dir: String, w: Int): Unit = {
    val spill = new java.util.concurrent.atomic.AtomicLong
    val gc = new java.util.concurrent.atomic.AtomicLong
    val shuf = new java.util.concurrent.atomic.AtomicLong
    val cpu = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) {
            spill.addAndGet(m.memoryBytesSpilled)
            gc.addAndGet(m.jvmGCTime)
            shuf.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            cpu.addAndGet(m.executorCpuTime / 1000000L)
          }
        }
      })
    val docs = sources.Tables.documents(spark, dir)
    functions.Dedup.substringDedupStaged(docs, w).foreach {
      case (name, df) =>
        spill.set(0); gc.set(0); shuf.set(0); cpu.set(0)
        val t0 = System.nanoTime()
        val n = df.count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[substrplan] $name rows=$n time=$sec%.2fs " +
          f"cpuMs=${cpu.get} gcMs=${gc.get} " +
          f"spillMB=${spill.get / 1048576} shufMB=${shuf.get / 1048576}")
    }
  }

  /** Per-stage timing of the COMPOSED curation pipeline
    * ([[graft.functions.Curate.curateFullStages]]) over a rung dir —
    * the [[substrPlan]] discipline: each stage is counted CUMULATIVELY
    * (its thunk rebuilds the whole prefix), so a regression names a
    * stage boundary instead of a total, and the per-stage task metrics
    * show where the spill/shuffle lives. Benchmark = every 97th doc
    * (an eval set genuinely inside the corpus — the decontamination
    * stage has real work to do).
    *
    *   runMain graft.Stress pipelinestages /tmp/graft_ladder/pipeline/x10
    */
  private def pipelineStages(spark: SparkSession, dir: String): Unit = {
    val spill = new java.util.concurrent.atomic.AtomicLong
    val gc = new java.util.concurrent.atomic.AtomicLong
    val shuf = new java.util.concurrent.atomic.AtomicLong
    val cpu = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) {
            spill.addAndGet(m.memoryBytesSpilled)
            gc.addAndGet(m.jvmGCTime)
            shuf.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            cpu.addAndGet(m.executorCpuTime / 1000000L)
          }
        }
      })
    val docs = sources.Tables.documents(spark, dir)
    val bench = docs.filter(col("doc_id") % 97 === 0)
      .select("doc_id", "text")
    functions.Curate.curateFullStages(docs, bench).foreach {
      case (name, mk) =>
        spill.set(0); gc.set(0); shuf.set(0); cpu.set(0)
        val t0 = System.nanoTime()
        val n = mk().count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[pipeline] $name rows=$n time=$sec%.2fs " +
          f"cpuMs=${cpu.get} gcMs=${gc.get} " +
          f"spillMB=${spill.get / 1048576} shufMB=${shuf.get / 1048576}")
    }
  }

  /** Near-twin corpus: pair generation + connected components end-to-end. */
  private def clusters(spark: SparkSession, path: String): Unit = {
    val docs = spark.read.parquet(path)
    val t0 = System.nanoTime()
    val out = Dedup.duplicateClusters(Dedup.ngramJaccardPairs(docs, 0.5))
    val stats = out.groupBy(col("cluster_id")).count()
      .agg(count(lit(1)).as("n_clusters"), min("count").as("minSize"),
        max("count").as("maxSize"), sum("count").as("docsClustered"))
      .collect()(0)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[stress] clusters=${stats.getLong(0)} sizeMin=${stats.getLong(1)} " +
      f"sizeMax=${stats.getLong(2)} docsClustered=${stats.getLong(3)} time=$secs%.1fs")
  }

  /** Sessionize under pathological key skew: ONE bot user with `nHot`
    * events (all landing in a single window-sort task) next to `nRest`
    * events spread over 10k normal users. Measures the cost of the
    * serial per-key sort that per-user windows cannot parallelize — the
    * bound a deployment hits when a single key dominates.
    */
  private def sessions(spark: SparkSession, nHot: Long, nRest: Long): Unit = {
    val hot = spark.range(nHot).select(
      lit(0L).as("user_id"),
      timestamp_micros(lit(1700000000000000L) + col("id") * 90L * 1000000L).as("ts"),
      (col("id") % 100).cast("double").as("value"))
    val rest = spark.range(nRest).select(
      (col("id") % 10000 + 1L).as("user_id"),
      timestamp_micros(lit(1700000000000000L) + expr("id div 10000") * 120L * 1000000L).as("ts"),
      (col("id") % 100).cast("double").as("value"))
    val ev = hot.unionByName(rest).localCheckpoint(true)

    def run(name: String, out: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val stats = out.agg(count(lit(1)).as("n_sessions"),
        max(col("n_events")).as("maxLen")).collect()(0)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[stress] $name sessions=${stats.getLong(0)} " +
        f"maxSessionEvents=${stats.getLong(1)} rows=${nHot + nRest} time=$secs%.1fs")
    }
    run("unsplit  ", graft.operators.Analytics.sessionize(ev, 30))
    run("pre-split", graft.operators.Analytics.sessionizeSkewSafe(ev, 30))

    // result equality: the skew-safe path must be a plan substitution, not
    // an approximation
    val a = graft.operators.Analytics.sessionize(ev, 30)
    val b = graft.operators.Analytics.sessionizeSkewSafe(ev, 30)
    val diff = a.exceptAll(b).limit(1).count() + b.exceptAll(a).limit(1).count()
    require(diff == 0L, "sessionizeSkewSafe diverged from sessionize")
    println("[stress] paths identical=true")
  }

  /** Shuffle-join skew: ONE key owns 80% of an `n`-row fact side; the dim
    * side (200k keys) sits above any broadcast threshold. Measures the
    * plain sort-merge join with AQE OFF (the hot partition serializes one
    * reducer), [[graft.operators.Skew.saltedJoin]] under the same config,
    * and the plain join with AQE's skew-split back ON — bracketing the
    * explicit operator between the failure mode it fixes and the runtime
    * mitigation Spark applies when it can. REQUIRES all three agree — a
    * saltedJoin semantics regression fails the probe, not just a println.
    */
  private def skewjoin(spark: SparkSession, n: Long): Unit = {
    val nDim = 200000L
    // 80% of the fact side on ONE key — the one-viral-document shape
    val fact = spark.range(n).select(
      when(col("id") % 5 < 4, lit(0L))
        .otherwise(pmod(col("id") * 2654435761L, lit(nDim))).as("k"),
      (col("id") % 1000).cast("double").as("v")).localCheckpoint(true)
    val dim = spark.range(nDim).select(
      col("id").as("k"), concat(lit("name"), col("id")).as("name"))
      .localCheckpoint(true)

    def run(name: String, out: () => org.apache.spark.sql.DataFrame): Row = {
      out().agg(count(lit(1)), sum(col("v"))).collect() // warm JIT + shuffle paths
      val t0 = System.nanoTime()
      val r = out().agg(count(lit(1)), sum(col("v"))).collect()(0)
      println(f"[stress] skewjoin $name rows=${r.getLong(0)} " +
        f"time=${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }
    val conf = spark.conf
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.enabled", "false")
    val plain  = run("plain sm, AQE off ", () => fact.join(dim, Seq("k")))
    val salted = run("salted ×16, AQE off", () =>
      graft.operators.Skew.saltedJoin(fact, dim, "k", numSalts = 16))
    conf.set("spark.sql.adaptive.enabled", "true")
    val aqe    = run("plain sm, AQE on  ", () => fact.join(dim, Seq("k")))
    conf.unset("spark.sql.autoBroadcastJoinThreshold")
    require(plain == salted && salted == aqe,
      s"skewjoin paths diverged: plain=$plain salted=$salted aqe=$aqe")
    println("[stress] skewjoin identical=true")
  }

  /** Incremental-rollup maintenance vs full rebuild: a history of `users`
    * users × `days` days (5 tx/user/day arriving over the period) is
    * seeded into the day-partitioned partial store ONCE; then ONE day's
    * delta (the daily batch a scheduler would hand the engine) upserts.
    * Measures (a) the upsert vs the full-history rebuild the reference
    * performs per tick, and (b) that the upsert rewrote ONLY the touched
    * day's partition (directory mtimes) — the property that makes the
    * nightly cost O(delta), not O(history), at 100 TB.
    */
  private def incrRollup(spark: SparkSession, users: Long, days: Int): Unit = {
    import graft.operators.Rollups
    val store = java.nio.file.Files.createTempDirectory("graft_stress_incr")
      .resolve("daily").toString
    def tx(dayLo: Int, dayHi: Int) = spark.range(users * (dayHi - dayLo) * 5)
      .select(
        (col("id") % users).as("user_id"),
        timestamp_micros(lit(1700000000000000L) +
          (expr(s"id div ${users * 5}") + dayLo) * 86400000000L +
          (col("id") % 5) * 3600000000L).as("ts"),
        ((col("id") % 1000).cast("double") / 10).as("amount"),
        concat(lit("cat"), col("id") % 7).as("category"),
        (col("id") % 4 + 1).cast("int").as("city_tier"))
      .localCheckpoint(true)
    val history = tx(0, days - 1)
    val delta = tx(days - 1, days)

    var t0 = System.nanoTime()
    Rollups.writeDailyPartials(history, store)
    val seedS = (System.nanoTime() - t0) / 1e9

    val before = new java.io.File(store).listFiles.filter(_.isDirectory)
      .map(f => f.getName -> f.listFiles.map(_.lastModified).max).toMap
    t0 = System.nanoTime()
    Rollups.upsertDailyPartials(delta, store)
    val upsertS = (System.nanoTime() - t0) / 1e9
    val after = new java.io.File(store).listFiles.filter(_.isDirectory)
      .map(f => f.getName -> f.listFiles.map(_.lastModified).max).toMap
    val touched = after.keySet.filter(k => before.get(k) != Some(after(k)))

    // the reference's shape: rebuild the whole store from full history
    t0 = System.nanoTime()
    Rollups.writeDailyPartials(history.unionByName(delta),
      store + "_rebuild")
    val rebuildS = (System.nanoTime() - t0) / 1e9

    val n = spark.read.parquet(store).count()
    println(f"[stress] incrrollup users=$users days=$days partials=$n " +
      f"seed=$seedS%.1fs upsert=$upsertS%.1fs rebuild=$rebuildS%.1fs " +
      f"touchedPartitions=${touched.mkString(",")} (${touched.size} of ${after.size})")
  }

  /** BPE at vocabulary scale. Two claims, two measurements:
    *
    * 1. merges/sec independent of ROUND COUNT — the trainer runs ONE
    *    corpus scan then a driver-local incremental merge loop (each round
    *    touches only the words containing the winning pair), so marginal
    *    cost per merge must not grow with the round number. The documents
    *    fixture's vocabulary is ~dozens of words (exhausts after ~100
    *    merges), so this leg trains on a SYNTHETIC wide vocabulary
    *    (base-26-coded words, Zipf counts) and reports the marginal
    *    s/merge between budget points N/4→N/2 and N/2→N: flat marginals
    *    are the evidence, a regression that re-couples rounds to Spark
    *    jobs (the pre-r11 shape: 2 jobs/merge, ~32k jobs for a GPT-2
    *    vocab) shows the second marginal ≈ the first times the job-
    *    scheduling constant instead.
    * 2. corpus-scale encode throughput with a real learned table (the
    *    apply half), unchanged from earlier rounds.
    */
  private def bpe(spark: SparkSession, sfDir: String, nMerges: Int): Unit = {
    import graft.functions.{Bpe, TextAnalysis}
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .localCheckpoint(true)
    val nDocs = docs.count()

    // synthetic wide-vocabulary corpus: 300k distinct 12-letter words in a
    // 26-letter alphabet, Zipf-ish counts via repetition of low ids
    def wordOf(i: Long): String = {
      val sb = new StringBuilder
      var v = i
      var j = 0
      while (j < 12) { sb.append(('a' + (v % 26)).toChar); v /= 26; j += 1 }
      sb.toString
    }
    val wide = spark.range(0, 300000)
      .map(i => wordOf(i) + " " + wordOf(i / 2) + " " + wordOf(i / 8))
      .toDF("text").localCheckpoint(true)

    def train(df: org.apache.spark.sql.DataFrame, n: Int): (Seq[Bpe.Merge], Double) = {
      val t0 = System.nanoTime()
      val (m, h) = Bpe.learnMerges(df, n, minPairFreq = 1L)
      val secs = (System.nanoTime() - t0) / 1e9
      h.unpersist()
      (m, secs)
    }
    train(wide, nMerges / 2) // JIT warmup at full working-set size, discarded
    val (_, tBase) = train(wide, 0) // histogram scan + collect, zero merges
    val (mh, th) = train(wide, nMerges / 2)
    // count Spark jobs during the full-budget train: the merge loop must
    // schedule ZERO jobs beyond the fixed histogram scan/count/collect —
    // the pre-r11 shape was 2 jobs PER MERGE (~64k jobs for a GPT-2 vocab)
    val jobCounter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobCounter.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val (mf, tf) =
      try train(wide, nMerges)
      finally spark.sparkContext.removeSparkListener(listener)
    val loopH = math.max(th - tBase, 1e-9)
    val loopF = math.max(tf - tBase, 1e-9)
    println(f"[stress] bpe rounds-ladder hist=$tBase%.1fs " +
      f"merges=${mh.length}@$loopH%.1fs (${mh.length / loopH}%.0f merges/s) vs " +
      f"${mf.length}@$loopF%.1fs (${mf.length / loopF}%.0f merges/s) " +
      f"sparkJobs(full train)=${jobCounter.get} " +
      "(fixed setup jobs only — zero per merge; pre-r11 was 2 jobs/merge)")

    val (learned, full) = train(docs, nMerges)
    println(f"[stress] bpe train corpus merges=${learned.length} " +
      f"(budget $nMerges): $full%.1fs")

    val e0 = System.nanoTime()
    val enc = docs.select(
      Bpe.encode(TextAnalysis.tokens(col("text")), learned).as("sub"))
      .agg(sum(size(col("sub"))).cast("long").as("n_sub")).collect()(0)
    val encSecs = (System.nanoTime() - e0) / 1e9
    println(f"[stress] bpe encode docs=$nDocs merges=${learned.length} " +
      f"subwords=${enc.getLong(0)} time=$encSecs%.1fs " +
      f"(${nDocs / encSecs}%.0f docs/s)")
  }

  /** Blocklist at production list size: the Aho-Corasick single pass vs
    * the naive K-`contains` disjunction, same verdict counts required.
    * Patterns: two-word phrases over the corpus vocabulary (real hits)
    * padded with never-hit junk to `nPatterns` — the realistic mix where
    * most of a blocklist never fires but still has to be checked.
    */
  private def blocklist(spark: SparkSession, sfDir: String, nPatterns: Int): Unit = {
    import graft.functions.Blocklist
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").localCheckpoint(true)
    val nDocs = docs.count()
    val vocab = Seq("key", "agg", "row", "scan", "slow", "fast", "table",
      "value", "part", "hash", "merge", "batch", "spark", "window", "order",
      "data", "column", "join", "small", "line", "customer", "query", "big",
      "sort", "group", "stream", "vector", "filter")
    val phrases = for (a <- vocab; b <- vocab if a != b) yield s"$a $b"
    val pats = (phrases ++ (phrases.size until nPatterns)
      .map(i => s"zq${i}xj never hit")).take(nPatterns)

    def run(name: String, flagged: => org.apache.spark.sql.Column): Option[Long] = {
      // warm once (JIT + codegen), then measure
      def once(): (Long, Double) = {
        val t0 = System.nanoTime()
        val n = docs.select(flagged.cast("long").as("f"))
          .agg(sum(col("f"))).collect()(0).getLong(0)
        (n, (System.nanoTime() - t0) / 1e9)
      }
      try {
        once()
        val (n, secs) = once()
        println(f"[stress] blocklist $name K=${pats.length} docs=$nDocs " +
          f"flagged=$n time=$secs%.2fs (${nDocs / secs}%.0f docs/s)")
        Some(n)
      } catch {
        case e: Throwable =>
          println(s"[stress] blocklist $name K=${pats.length} FAILED: " +
            s"${e.getClass.getSimpleName}")
          None
      }
    }
    def balancedOr(cs: IndexedSeq[org.apache.spark.sql.Column]): org.apache.spark.sql.Column =
      if (cs.size == 1) cs.head
      else { val (l, r) = cs.splitAt(cs.size / 2); balancedOr(l) || balancedOr(r) }

    val acFlagged = run("aho-corasick",
      size(Blocklist.matches(col("text"), pats)) > 0)
    // the left-fold OR every naive user writes first: linear expression
    // DEPTH, so the analyzer/optimizer recursion dies with a
    // StackOverflowError somewhere past ~256 patterns — the naive shape
    // doesn't degrade at list size, it falls over
    val naiveLeft = run("naive-contains-leftfold",
      pats.map(p => col("text").contains(p)).reduce(_ || _))
    // balanced OR tree (log depth) survives; still K passes over the text
    val naiveBal = run("naive-contains-balanced",
      balancedOr(pats.map(p => col("text").contains(p)).toIndexedSeq))
    for (a <- acFlagged; n <- naiveLeft ++ naiveBal)
      require(a == n, s"verdicts diverged: AC $a vs naive $n")
    println(s"[stress] blocklist verdicts identical across surviving shapes: " +
      s"${acFlagged.getOrElse(-1L)} flagged")
  }

  /** ANN cost structure at scale on the clustered corpus: one-shot
    * retrain-per-call paths (pqTopK, ivfPqTopK) vs the persisted-index
    * split (writePqIndex build once + pqSearchIndexed per query batch).
    * The one-shot paths are dominated by the corpus ENCODE (the m·ksub
    * distance expressions per row), which is exactly why the index APIs
    * exist — the probe measures that dominance instead of asserting it,
    * plus the pq↔ivfpq top-k overlap (cell pruning's retrieval cost).
    */
  private def annscale(spark: SparkSession, nClusters: Int, perCluster: Int): Unit = {
    import graft.functions.Similarity
    val emb = structuredEmbeddings(spark, nClusters, perCluster, dim = 64)
      .localCheckpoint(true)
    val n = emb.count()
    // max(1, …) guards tiny corpora (n < 20 would make the divisor 0 and
    // the modulo null out every row); checkpoint so the query set is fixed
    // and not re-derived by every consumer
    val queries = emb.filter(col("vec_id") % math.max(1L, n / 20) === 0)
      .localCheckpoint(true) // ~20 queries
    val centroids = math.max(8, nClusters / 2)
    def run(df: => org.apache.spark.sql.DataFrame)
        : (org.apache.spark.sql.DataFrame, Double) = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      val out = df.localCheckpoint(true)
      (out, (System.nanoTime() - t0) / 1e9)
    }
    val (pqOut, pqS) = run(Similarity.pqTopK(emb, queries, k = 10,
      m = 8, ksub = 16, sampleSize = 512, iters = 2))
    val (ivfpqOut, ivfpqS) = run(Similarity.ivfPqTopK(emb, queries,
      k = 10, centroids = centroids, nprobe = 3, m = 8, ksub = 16,
      sampleSize = 512, iters = 2))

    // persisted split: pay train+encode once, then search the codes table
    val t0 = System.nanoTime()
    Similarity.writePqIndex(emb, "stress_pq_idx", m = 8, ksub = 16,
      sampleSize = 512, iters = 2)
    val buildS = (System.nanoTime() - t0) / 1e9
    try {
      val (idxOut, searchS) = run(Similarity.pqSearchIndexed(
        spark, "stress_pq_idx", queries, k = 10))
      val overlap = pqOut.select("query_id", "neighbor_id")
        .join(ivfpqOut.select("query_id", "neighbor_id"),
          Seq("query_id", "neighbor_id")).count()
      val total = pqOut.count()
      println(f"[stress] annscale n=$n queries=${queries.count()} " +
        f"centroids=$centroids nprobe=3: one-shot pq=$pqS%.1fs " +
        f"ivfpq=$ivfpqS%.1fs (encode-dominated, ≈equal by design); " +
        f"persisted build=$buildS%.1fs then search-only=$searchS%.1fs " +
        f"(${pqS / searchS}%.1fx vs one-shot) rows=${idxOut.count()} " +
        f"pq↔ivfpq overlap=$overlap/$total (scan fraction 3/$centroids)")
    } finally Similarity.dropPqIndex(spark, "stress_pq_idx")
  }

  /** Batch-query ANN probe (round-16): [[Similarity.annSearchIndexed]]
    * above its former 65,536-query hard cap — the cap is now a SWITCH to
    * the distributed arm (scan-side probe selection + salted candidate
    * join), so a query frame of any size runs without ever landing on
    * the driver. Reports wall time of both arms at a shared sub-cap size
    * (their results are hash-pinned equal by BucketedSpec) and then the
    * above-cap run the old code refused: the "Done" evidence that the
    * cap is gone.
    */
  private def annbatch(spark: SparkSession, nClusters: Int,
      perCluster: Int, nQueries: Long): Unit = {
    import graft.functions.Similarity
    require(nQueries > 65536,
      s"annbatch exists to demonstrate >65536 queries, got $nQueries")
    val emb = structuredEmbeddings(spark, nClusters, perCluster, dim = 64)
      .localCheckpoint(true)
    val n = emb.count()
    // query frame: nQueries fresh vectors from the same generator family,
    // ids offset past the corpus so the self-match filter never bites
    val queries = structuredEmbeddings(spark, nClusters,
        (nQueries / nClusters + 1).toInt, dim = 64)
      .limit(nQueries.toInt)
      .select((col("vec_id") + 10000000L).as("vec_id"), col("embedding"))
      .localCheckpoint(true)
    val centroids = math.max(8, nClusters / 2)
    // buckets ≈ cores: in the distributed arm the candidate join keys on
    // `bucket` and the bucketed side arrives exchange-free, so the
    // per-bucket product parallelism IS the file-bucket count — an
    // 8-bucket index (the small-fixture default) serializes 32 cores
    // down to 8 tasks (measured 395 s vs 136 s at 70k queries). Sizing
    // buckets to the executor width at build time is the documented
    // contract; this probe practices it.
    Similarity.writeAnnIndex(emb, "stress_annbatch_idx",
      centroids = centroids, sampleSize = 512, iters = 2, buckets = 32)
    try {
      def run(df: => org.apache.spark.sql.DataFrame): (Long, Double) = {
        val t0 = System.nanoTime()
        val out = df.localCheckpoint(true)
        (out.count(), (System.nanoTime() - t0) / 1e9)
      }
      // both arms at a shared sub-cap query size, for the arm-vs-arm cost
      val small = queries.limit(4096).localCheckpoint(true)
      val (rowsDrv, sDrv) = run(Similarity.annSearchIndexed(spark,
        "stress_annbatch_idx", small, k = 10, nprobe = 3))
      val (rowsDist, sDist) = run(Similarity.annSearchIndexed(spark,
        "stress_annbatch_idx", small, k = 10, nprobe = 3, maxQueries = 0))
      require(rowsDrv == rowsDist,
        s"arm row counts diverge: driver=$rowsDrv distributed=$rowsDist")
      // the headline: a query set ABOVE the old cap, end to end
      val (rowsBig, sBig) = run(Similarity.annSearchIndexed(spark,
        "stress_annbatch_idx", queries, k = 10, nprobe = 3))
      require(rowsBig >= rowsDist,
        s"above-cap run returned fewer rows ($rowsBig) than the 4k run")
      println(f"[stress] annbatch corpus=$n queries=$nQueries " +
        f"centroids=$centroids nprobe=3: sub-cap 4096q driver=$sDrv%.1fs " +
        f"distributed=$sDist%.1fs (rows=$rowsDrv); above-cap " +
        f"${nQueries}q distributed=$sBig%.1fs rows=$rowsBig " +
        f"(${sBig / sDist}%.1fx the 4k run for ${nQueries / 4096}x the queries)")
    } finally Similarity.dropAnnIndex(spark, "stress_annbatch_idx")
  }

  /** ABOVE-CAP batch search on the PQ family — [[annbatch]]'s sibling for
    * the round-17 distributed PQ arms: builds a true-IVFADC index, runs a
    * shared sub-cap query set through BOTH arms (BucketedSpec pins their
    * row-for-row equality; this probe records the cost delta), then the
    * headline — a query set above the 65,536 cap the five PQ search paths
    * used to `require`-throw at, end to end on the distributed arm
    * (scan-side LUTs from broadcast codebooks, plain bucket join, pruning
    * retained).
    */
  private def pqbatch(spark: SparkSession, nClusters: Int,
      perCluster: Int, nQueries: Long): Unit = {
    import graft.functions.Similarity
    require(nQueries > 65536,
      s"pqbatch exists to demonstrate >65536 queries, got $nQueries")
    val emb = structuredEmbeddings(spark, nClusters, perCluster, dim = 64)
      .localCheckpoint(true)
    val n = emb.count()
    val queries = structuredEmbeddings(spark, nClusters,
        (nQueries / nClusters + 1).toInt, dim = 64)
      .limit(nQueries.toInt)
      .select((col("vec_id") + 10000000L).as("vec_id"), col("embedding"))
      .localCheckpoint(true)
    val centroids = math.max(8, nClusters / 2)
    // buckets ≈ cores — the annbatch-measured contract: the distributed
    // arm's candidate join parallelism IS the file-bucket count
    Similarity.writeIvfPqResIndex(emb, "stress_pqbatch_idx",
      centroids = centroids, m = 16, ksub = 32, sampleSize = 512,
      iters = 2, buckets = 32)
    try {
      def run(df: => org.apache.spark.sql.DataFrame): (Long, Double) = {
        val t0 = System.nanoTime()
        val out = df.localCheckpoint(true)
        (out.count(), (System.nanoTime() - t0) / 1e9)
      }
      val small = queries.limit(4096).localCheckpoint(true)
      val (rowsDrv, sDrv) = run(Similarity.ivfPqResSearchIndexed(spark,
        "stress_pqbatch_idx", small, k = 10, nprobe = 3))
      val (rowsDist, sDist) = run(Similarity.ivfPqResSearchIndexed(spark,
        "stress_pqbatch_idx", small, k = 10, nprobe = 3, maxQueries = 0))
      require(rowsDrv == rowsDist,
        s"arm row counts diverge: driver=$rowsDrv distributed=$rowsDist")
      val (rowsBig, sBig) = run(Similarity.ivfPqResSearchIndexed(spark,
        "stress_pqbatch_idx", queries, k = 10, nprobe = 3))
      require(rowsBig >= rowsDist,
        s"above-cap run returned fewer rows ($rowsBig) than the 4k run")
      println(f"[stress] pqbatch corpus=$n queries=$nQueries " +
        f"centroids=$centroids nprobe=3 m=16 ksub=32: sub-cap 4096q " +
        f"driver=$sDrv%.1fs distributed=$sDist%.1fs (rows=$rowsDrv); " +
        f"above-cap ${nQueries}q distributed=$sBig%.1fs rows=$rowsBig " +
        f"(${sBig / sDist}%.1fx the 4k run for ${nQueries / 4096}x the queries)")
    } finally Similarity.dropIvfPqResIndex(spark, "stress_pqbatch_idx")
  }

  /** PQ storage-footprint probe: write the L2-normalized float corpus and
    * its PQ codes table (m=8, ksub=16) as parquet, report bytes — the
    * measured version of the "codes fit where the vectors don't" claim
    * (parquet compresses both sides, so the honest ratio is on-disk, not
    * the 256B→8B arithmetic one).
    */
  private def pqsize(spark: SparkSession, sfDir: String): Unit = {
    import graft.functions.Similarity
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val c = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(expr(
        "aggregate(zip_with(v, v, (a, b) -> a * b), 0D, (acc, x) -> acc + x)")))
      .filter(col("nrm") > 0)
      .select(col("vec_id"), expr("transform(v, x -> x / nrm)").as("v"))
    val books = Similarity.trainPqCodebooks(c, m = 8, ksub = 16,
      sampleSize = 256, iters = 2)
    val base = java.nio.file.Files.createTempDirectory("graft_pqsize")
    val (rawDir, codeDir) = (base.resolve("raw").toString, base.resolve("codes").toString)
    try {
      c.select(col("vec_id"), col("v").cast("array<float>").as("embedding"))
        .coalesce(1).write.mode("overwrite").parquet(rawDir)
      Similarity.pqEncode(c, books)
        .coalesce(1).write.mode("overwrite").parquet(codeDir)
      def bytes(dir: String): Long = {
        val p = new org.apache.hadoop.fs.Path(dir)
        p.getFileSystem(spark.sessionState.newHadoopConf()).getContentSummary(p).getLength
      }
      val sqDir = base.resolve("sq").toString
      Similarity.sqEncode(emb)
        .coalesce(1).write.mode("overwrite").parquet(sqDir)
      val (rb, cb, sb) = (bytes(rawDir), bytes(codeDir), bytes(sqDir))
      println(f"[stress] pqsize raw(float32)=$rb%d B codes(m=8,ksub=16)=$cb%d B " +
        f"ratio=${rb.toDouble / cb}%.1fx (arithmetic bound 32.0x before " +
        "parquet encoding)")
      println(f"[stress] sqsize sq8codes=$sb%d B ratio=${rb.toDouble / sb}%.1fx " +
        "(logical bound 4.0x at 8 bits/dim vs float32; codes are stored " +
        "ARRAY<INT>, so the un-encoded arithmetic bound is 1.0x and parquet " +
        "dictionary+bitpack on the 256-value code alphabet decides the " +
        "realized bytes)")
    } finally {
      scala.util.Try {
        java.nio.file.Files.walk(base)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
  }

  /** Z-order vs 1-D sort on the REAL events table: cluster
    * (user_id, day) into `files` parquet files both ways, then count how
    * many files three box predicates (narrow user slice × one week, wide ×
    * week, narrow × full history) must open per the parquet zone maps.
    * The 1-D layout sorts by day — the natural ingest order — so any user
    * slice spans every file of the queried days; the curve bounds both.
    */
  private def zorder(spark: SparkSession, sfDir: String, files: Int): Unit = {
    import graft.sources.{Layout, Tables}
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(cast(ts as timestamp)) div 86400000000").as("day"))
      .localCheckpoint(true)
    val (uLo, uHi) = (ev.agg(min("user_id"), max("user_id")).head() match {
      case Row(a: Long, b: Long) => (a, b)
    })
    val (dLo, dHi) = (ev.agg(min("day"), max("day")).head() match {
      case Row(a: Long, b: Long) => (a, b)
    })
    val base = java.nio.file.Files.createTempDirectory("graft_stress_z")
    val (zDir, sDir) = (base.resolve("z").toString, base.resolve("s").toString)

    var t0 = System.nanoTime()
    Layout.zorderWrite(ev, Seq("user_id", "day"), bits = 20, files, zDir)
    val zWriteS = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    ev.repartitionByRange(files, col("day"), col("event_id"))
      .sortWithinPartitions("day", "event_id")
      .write.mode("overwrite").parquet(sDir)
    val sWriteS = (System.nanoTime() - t0) / 1e9

    val uSpan = uHi - uLo + 1
    val boxes = Seq(
      ("user1%_x_week", Map("user_id" -> (uLo, uLo + uSpan / 100),
        "day" -> (dLo, dLo + 6L))),
      ("user10%_x_week", Map("user_id" -> (uLo, uLo + uSpan / 10),
        "day" -> (dLo, dLo + 6L))),
      ("user1%_x_all", Map("user_id" -> (uLo, uLo + uSpan / 100),
        "day" -> (dLo, dHi))))
    println(f"[stress] zorder files=$files rows=${ev.count()} " +
      f"zWrite=$zWriteS%.1fs sortedWrite=$sWriteS%.1fs " +
      f"users=[$uLo,$uHi] days=[$dLo,$dHi]")
    boxes.foreach { case (name, box) =>
      val zt = Layout.filesTouchedByBox(spark, zDir, box)
      val st = Layout.filesTouchedByBox(spark, sDir, box)
      println(s"[stress] zorder box=$name zTouched=$zt sortedTouched=$st of $files")
    }
  }

  /** Worst case for connected components: ONE chain of `n` nodes —
    * diameter n, so min-label propagation would need n rounds; the
    * two-phase star algorithm must stay logarithmic.
    */
  private def chain(spark: SparkSession, n: Long): Unit = {
    val pairs = spark.range(n - 1)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
      .localCheckpoint(true)
    val t0 = System.nanoTime()
    val (labels, rounds) = Dedup.duplicateClustersWithRounds(pairs, maxIters = 40)
    val ok = labels.agg(count(lit(1)).as("n"), max(col("cluster_id")).as("mx"))
      .collect()(0)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[stress] chain n=$n rounds=$rounds (log2=${(math.log(n.toDouble) / math.log(2))}%.1f) " +
      f"nodes=${ok.getLong(0)} allMinLabel=${ok.getLong(1) == 0L} time=$secs%.1fs")
  }

  /** Deterministic clustered corpus (the realistic LLM-embedding shape:
    * documents group around topics): `nClusters` pseudo-random base
    * directions, `perCluster` jittered members each. No RNG — components
    * are sin() of integer phases, so reruns are identical.
    */
  private def structuredEmbeddings(spark: SparkSession,
      nClusters: Int, perCluster: Int, dim: Int): org.apache.spark.sql.DataFrame =
    spark.range(nClusters.toLong * perCluster).select(
      col("id").as("vec_id"),
      expr(s"transform(sequence(0, ${dim - 1}), " +
        s"j -> sin((id div $perCluster) * 131.7D + j * 17.3D) " +
        s"+ 0.1D * sin(id * 37.9D + j * 5.1D))")
        .cast("array<float>").as("embedding"))

  /** SemDeDup at scale: pair work is Σ|cell|², so the centroid count is the
    * cost dial — this probe measures drops-vs-ground-truth recall, the
    * computed pair volume, and runtime across centroid counts on the
    * clustered corpus (ground truth = the same min-id keep rule evaluated
    * exhaustively within each GENERATOR cluster, which the jittered corpus
    * makes exact by construction: cross-cluster cosines sit far below τ).
    */
  private def semdedup(spark: SparkSession, nClusters: Int, perCluster: Int): Unit = {
    val tau = 0.9
    // DECORRELATED clusters (unlike [[structuredEmbeddings]], whose shared
    // j-frequency makes base directions of different clusters correlate as
    // ~cos(Δphase) — fine for ranking probes, wrong for a dedup probe where
    // cross-cluster pairs must sit far below τ): hash-style double mixing
    // (outer sin of a magnified inner sin — any construction LINEAR in j
    // aliases some cluster pairs back above τ). Verified over all 2M
    // cluster pairs at 2000×64: max cross-cluster |cos| = 0.61, min
    // within-cluster cos = 0.989, so at τ = 0.9 the within-cluster pair
    // set IS the exact ground truth.
    val dim = 64
    val emb = spark.range(nClusters.toLong * perCluster).select(
      col("id").as("vec_id"),
      expr(s"transform(sequence(0, ${dim - 1}), " +
        s"j -> sin(43758.5453D * sin((id div $perCluster) * 12.9898D + j * 78.233D)) " +
        s"+ 0.1D * sin(id * 37.9D + j * 5.1D))")
        .cast("array<float>").as("embedding"))
      .localCheckpoint(true)

    // ground truth: min-id keep rule within generator clusters, exhaustive
    val g = emb.select(col("vec_id"), expr(s"vec_id div $perCluster").as("gid"),
      col("embedding").cast("array<double>").as("v"))
    val truth = g.as("a").join(g.as("b"),
        col("a.gid") === col("b.gid") && col("a.vec_id") < col("b.vec_id"))
      .filter(Similarity.cosine(col("a.v"), col("b.v")) >= tau)
      .select(col("b.vec_id").as("vec_id")).distinct().localCheckpoint(true)
    val nTruth = truth.count()
    require(nTruth > 0, s"no within-cluster duplicates at tau=$tau — " +
      "perCluster must be >= 2 for the recall denominator to exist")

    for (k <- Seq(8, 64, 256)) {
      val t0 = System.nanoTime()
      val out = Dedup.semanticDedup(emb, tau, centroids = k,
        sampleSize = 512, iters = 2).localCheckpoint(true)
      val drops = out.filter(!col("keep")).select("vec_id").localCheckpoint(true)
      val nDrops = drops.count()
      val secs = (System.nanoTime() - t0) / 1e9
      val hit = drops.join(truth, "vec_id").count()
      val pairWork = out.groupBy(col("cluster")).count()
        .agg(sum((col("count") * (col("count") - 1) / 2).cast("long")))
        .collect()(0).getLong(0)
      println(f"[stress] semdedup k=$k%-4d drops=$nDrops (truth=$nTruth, " +
        f"recall=${hit.toDouble / nTruth}%.3f) pairs=$pairWork time=$secs%.1fs")
    }
  }

  /** IVF recall@10 against exact brute-force — both coarse quantizers
    * (sign-bit and trained k-means), on both corpus shapes (the sfDir's
    * uniform-random vectors and a clustered one), with the probe cost each
    * configuration pays (fraction of the corpus scored per query) so
    * recall is never quoted without its price.
    */
  private def recall(spark: SparkSession, dir: String): Unit = {
    def measure(tag: String, emb: org.apache.spark.sql.DataFrame,
        configs: Seq[(Int, Int)]): Unit = {
      val queries = emb.filter(col("vec_id") % 100 === 0)
      val n = emb.count().toDouble
      val nQ = queries.count().toDouble
      val exact = Similarity.bruteForceTopK(emb, queries, 10)
        .select(col("query_id"), col("neighbor_id")).localCheckpoint(true)
      val nExact = exact.count()

      def report(name: String, approx: org.apache.spark.sql.DataFrame,
          candidates: Double): Unit = {
        val hit = exact.intersect(approx.select(col("query_id"), col("neighbor_id"))).count()
        println(f"[stress] $tag $name recall@10=${hit.toDouble / nExact}%.3f " +
          f"(hits=$hit of $nExact) probeCost=${candidates / (nQ * n)}%.3f of brute")
      }

      report("sign-bit", Similarity.ivfTopK(emb, queries, 10), nQ * 3.0 * n / 256.0)
      for ((k, nprobe) <- configs)
        report(s"kmeans($k,p$nprobe)",
          Similarity.ivfTrainedTopK(emb, queries, 10, centroids = k,
            nprobe = nprobe, sampleSize = 512, iters = 3),
          nQ * nprobe * n / k)
    }

    measure("random", sources.Tables.embeddings(spark, dir),
      Seq((8, 2), (8, 3), (8, 4), (8, 5), (16, 8), (32, 16)))
    measure("clustered",
      structuredEmbeddings(spark, nClusters = 2000, perCluster = 10, dim = 64)
        .localCheckpoint(true),
      Seq((8, 1), (8, 2), (16, 2), (32, 2), (32, 4), (64, 4)))
  }

  /** Scale ladder: time the five heaviest suite queries against synthetic
    * k× replications of the sfDir corpus and fit the scaling exponent
    * (least-squares slope of ln t vs ln k). Two replication kinds probe
    * the two regimes that matter at 100 TB:
    *
    *  - `grow`: self-similar growth — replica i re-tags every token
    *    (`r{i}_tok`) and offsets doc_id/user_id, so replicas share no
    *    shingles and no users. Near-dup density, shingle document
    *    frequency, and per-user history stay CONSTANT as the corpus
    *    grows — the realistic "bigger crawl" shape. Exponent ≈ 1 is the
    *    pass bar.
    *  - `twins`: verbatim replication (ids offset, text unchanged) —
    *    every shingle's df grows ×k, so the inverted-index join's
    *    Σ df·(df-1)/2 grows ×k² and [[Dedup.ngramJaccardPairs]]' cost
    *    probe must switch to prefix filtering mid-ladder. The OUTPUT is
    *    itself Θ(k²) pairs (every doc gains k-1 exact twins), so time is
    *    expected super-linear; the probe reports output rows so time can
    *    be judged against the output lower bound, and logs joinRows vs
    *    the switch threshold so the regime change is visible.
    *
    * Rung corpora are written once to /tmp/graft_ladder (setup untimed,
    * reused across invocations); each query is timed once per rung,
    * ascending, so the JVM is warm by the big rungs.
    *
    *   runMain graft.Stress ladder /root/testdata/sf0.1 grow 1 3 10 30 100
    *   runMain graft.Stress ladder /root/testdata/sf0.1 twins 1 3 10 30
    */
  private def ladder(spark: SparkSession, sfDir: String, kind: String,
      factors: Seq[Int]): Unit = {
    import org.apache.spark.sql.DataFrame
    val idOff = 1000000L // multiple of 10: preserves doc_id % 10 structure
    val root = s"/tmp/graft_ladder/$kind"

    // rung marker carries a fingerprint of the SOURCE fixture (total
    // parquet bytes) so regenerated fixtures invalidate cached rungs —
    // round-14 lesson: /tmp rung dirs survived an embeddings-fixture
    // regeneration (500 → 2000 base rows) and two rounds of knn ladder
    // numbers silently measured the OLD corpus size
    def srcStamp(): String =
      Seq("documents.parquet", "events.parquet", "embeddings.parquet")
        .map { f =>
          val d = new java.io.File(s"$sfDir/$f")
          val files = Option(d.listFiles()).map(_.toSeq).getOrElse(
            if (d.isFile) Seq(d) else Seq.empty)
          files.map(_.length()).sum
        }.mkString(":")

    def replicate(k: Int): String = {
      val dir = s"$root/x$k"
      val done = new java.io.File(s"$dir/_LADDER_OK")
      val stamp = srcStamp()
      val fresh = done.exists() && {
        val s = new String(java.nio.file.Files.readAllBytes(done.toPath),
          "UTF-8")
        s == stamp
      }
      if (!fresh) {
        val rep = spark.range(k).withColumnRenamed("id", "replica")
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
          .crossJoin(rep)
        val text =
          if (kind == "twins") col("text")
          else if (kind == "pipeline")
            // pipeline rungs must SURVIVE the policy filter: re-tag only
            // LONG tokens (>= 4 chars), leaving stopwords and language
            // markers intact — replicas then pass the lang/stopword/
            // quality arms (all-token re-tagging left rows=|x1| at every
            // rung: only replica 0 survived and the ladder measured a
            // constant pipeline behind a growing scan), while the
            // mutated long tokens keep cross-replica shingle overlap
            // and chunk fingerprints disjoint — near-dup density and
            // contamination stay CONSTANT per replica, the grow regime.
            when(col("replica") === 0, col("text")).otherwise(
              regexp_replace(col("text"), lit("\\S{4,}"),
                concat(lit("r"), col("replica"), lit("_$0"))))
          else when(col("replica") === 0, col("text")).otherwise(
            regexp_replace(col("text"), lit("\\S+"),
              concat(lit("r"), col("replica"), lit("_$0"))))
        docs.select(
            (col("doc_id") + col("replica") * idOff).as("doc_id"),
            text.as("text"), col("lang"), col("source"), col("n_chars"))
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
        val ev = spark.read.parquet(s"$sfDir/events.parquet").crossJoin(rep)
        ev.select(
            (col("event_id") + col("replica") * idOff).as("event_id"),
            col("ts"),
            (col("user_id") + col("replica") * idOff).as("user_id"),
            col("event_type"), col("value"), col("props"))
          .write.mode("overwrite").parquet(s"$dir/events.parquet")
        if (kind == "knn" || kind == "knn23" || kind == "assign") {
          val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
            .crossJoin(rep)
          emb.select((col("vec_id") + col("replica") * idOff).as("vec_id"),
              col("embedding"), col("label"))
            .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
        }
        done.getParentFile.mkdirs()
        java.nio.file.Files.write(done.toPath, stamp.getBytes("UTF-8"))
      }
      dir
    }

    def jaccardStats(docs: DataFrame): (Long, Long) = {
      val df = docs
        .select(col("doc_id"), Dedup.ngrams(col("text")).as("ng"))
        .filter(size(col("ng")) > 0)
        .select(explode(col("ng")).as("g"))
        .groupBy("g").count()
        .agg(sum(col("count") * (col("count") - 1) / 2).cast("long").as("jr"),
          max("count").as("maxDf")).first()
      (df.getAs[Long]("jr"), df.getAs[Long]("maxDf"))
    }

    val queries: Seq[(String, String => DataFrame)] = {
      def docs(dir: String) = sources.Tables.documents(spark, dir)
      val jac = Seq[(String, String => DataFrame)](
        "ngram_jaccard" -> (d => Dedup.ngramJaccardPairs(docs(d), 0.5)))
      if (kind == "twins") jac
      else if (kind == "lines")
        // corpus-wide line dedup over the q_text_line_dedup relining —
        // one line-keyed window shuffle + rebuild: the claim to certify
        // is a ~1.0 exponent (linear in corpus, no quadratic tail)
        Seq[(String, String => DataFrame)]("line_dedup" -> { d =>
          val relined = docs(d).select(col("doc_id"), expr(
            "concat_ws('\n', transform(" +
              "sequence(0, (size(split(text, ' ')) + 11) div 12 - 1), " +
              "i -> concat_ws(' ', slice(split(text, ' '), i * 12 + 1, 12))))")
            .as("text"))
          Dedup.lineDedup(relined, minCount = 2)
        })
      else if (kind == "attrib")
        // stream-stream-shaped interval join on the batch frame — the
        // claim to certify is ~1.0 (user-keyed equi-join; per-user
        // candidate pairs are horizon-bounded, and replicas shift
        // user_ids so load grows linearly, never quadratically)
        Seq[(String, String => DataFrame)]("attribution" -> (d =>
          streaming.EventsStream.attributionJoin(
            sources.Tables.events(spark, d))))
      else if (kind == "knn")
        // k-NN graph with the production fit rule cells ≈ √(N/8): the
        // claim to certify is the BUCKETED-candidate exponent ≈ 1.5
        // (N·nprobe·(N/cells) with cells ∝ √N), not the corpus² of an
        // all-pairs build — and explicitly NOT 1.0: a knn graph's
        // candidate work genuinely grows superlinearly unless cells
        // outpace √N, which costs recall. The count() consumes the score
        // column so candidate scoring cannot be pruned away.
        Seq[(String, String => DataFrame)]("knn_graph" -> { d =>
          val emb = sources.Tables.embeddings(spark, d)
          val n = emb.count()
          val cells = math.max(8, math.round(math.sqrt(n / 8.0)).toInt)
          functions.Similarity.knnGraph(emb, k = 5, centroids = cells,
              nprobe = 2, sampleSize = math.max(256, cells * 4), iters = 2)
            .filter(col("score") >= -2.0)
        })
      else if (kind == "knn23")
        // k-NN graph under the N^(2/3) cell policy (Similarity.cellsFor)
        // with the recall-holding nprobe bump 2 → 3: the claim to certify
        // is that the x10→x30 segment drops from the √N rule's measured
        // 1.39 toward the policy's N^(4/3) candidate asymptote — per-cell
        // membership is capped at ∝ N^(1/3), so candidate work is
        // N·nprobe·N^(1/3), not the √N rule's N^1.5. Recall under the
        // bumped nprobe is gated separately in BucketedSpec ("knn graph:
        // N^(2/3) cell policy") on the clustered fixture — the ladder
        // certifies COST shape, the spec certifies the unchanged floor.
        Seq[(String, String => DataFrame)]("knn_graph_n23" -> { d =>
          val emb = sources.Tables.embeddings(spark, d)
          val n = emb.count()
          val cells = functions.Similarity.cellsFor(n)
          functions.Similarity.knnGraph(emb, k = 5, centroids = cells,
              nprobe = 3, sampleSize = math.max(256, cells * 4), iters = 2)
            .filter(col("score") >= -2.0)
        })
      else if (kind == "assign")
        // the ASSIGNMENT stage alone at the cellsFor(N) cell count, flat
        // vs two-level: flat scores every row against all cells (N·cells
        // = N^(5/3) flops under the policy — the last named superlinear
        // of round 13), two-level scores √cells supers + one super's
        // children (N·~2√cells = N^(7/6)). The claim to certify is the
        // exponent DROP between the two arms on the same rungs; the
        // filter consumes the cluster column so the count() cannot prune
        // the assignment away.
        Seq[(String, String => DataFrame)](
          "assign_flat" -> { d =>
            val emb = sources.Tables.embeddings(spark, d)
            val n = emb.count()
            val cells = functions.Similarity.cellsFor(n)
            functions.Similarity.assignProbe(emb, cells, twoLevel = false,
                sampleSize = math.max(256, cells * 4))
              .filter(col("cluster") >= 0)
          },
          "assign_2lvl" -> { d =>
            val emb = sources.Tables.embeddings(spark, d)
            val n = emb.count()
            val cells = functions.Similarity.cellsFor(n)
            functions.Similarity.assignProbe(emb, cells, twoLevel = true,
                sampleSize = math.max(256, cells * 4))
              .filter(col("cluster") >= 0)
          },
          // the broadcast form (forced): same two-level rule as ONE
          // CellProbeExpr node over a broadcast hierarchy — the claim to
          // certify is time parity with assign_2lvl at policy cell
          // counts while the PLAN stops growing with cells·dim
          // (`Stress assignplan` prints the plan sizes)
          "assign_bcast" -> { d =>
            val emb = sources.Tables.embeddings(spark, d)
            val n = emb.count()
            val cells = functions.Similarity.cellsFor(n)
            functions.Similarity.assignProbeBcast(emb, cells,
                sampleSize = math.max(256, cells * 4))
              .filter(col("cluster") >= 0)
          })
      else if (kind == "pipeline")
        // the COMPOSED curation pipeline end to end (filter verdict →
        // near dedup → decontaminate → quality terciles → temperature
        // mixture → pack): the claim to certify is ~1.0 on grow-shaped
        // corpora — every stage is individually linear there (replicas
        // share no shingles, so pair work, chunk-match df, and the
        // per-source windows all grow with the corpus, never its
        // square), and composing them adds boundaries, not exponents.
        // Benchmark = every 97th doc, inside the corpus by construction,
        // so the decontamination arm does real scrubbing at every rung.
        // The filter consumes pack_id so count() cannot prune the
        // packing window.
        Seq[(String, String => DataFrame)]("pipeline_curate_full" -> { d =>
          val ds = docs(d)
          functions.Curate.curateFull(ds,
              ds.filter(col("doc_id") % 97 === 0).select("doc_id", "text"))
            .filter(col("pack_id") >= 0)
        })
      else if (kind == "dsir")
        // DSIR fit + score + select end to end: the claim to certify is
        // ~1.0 — the fit is two map-side-combinable aggregates to a
        // B-row frame, scoring is a broadcast model join + one doc_id
        // aggregate, and selection is a TakeOrdered threshold (never a
        // global sort), so every stage tracks corpus bigram volume.
        // Replicas mutate long tokens, so the bucket distributions keep
        // shifting with the corpus — the model refits at every rung (the
        // fit-per-rung regime; production fits once). The filter
        // consumes BOTH keep (forces the threshold branch) and n_feats
        // (forces the score aggregate) so count() cannot prune either.
        Seq[(String, String => DataFrame)]("dsir_select" -> { d =>
          val ds = docs(d)
          val model = functions.Sampling.dsirLogRatios(ds,
              ds.filter(col("source").isin(
                oracles.PipelineOracles.dsirTargetSources: _*)),
              oracles.PipelineOracles.dsirBucketCount)
            .localCheckpoint(true)
          functions.Sampling.dsirSelect(
              functions.Sampling.dsirScore(ds, model,
                oracles.PipelineOracles.dsirBucketCount), 200)
            .filter(col("keep") || col("n_feats") >= 0L)
        })
      else if (kind == "ce")
        // Moore–Lewis fit + score + select end to end: the claim to
        // certify is ~1.0 — both LM fits are Zipf-bounded hash
        // aggregates, scoring is four postings equi-joins over the
        // occurrence stream, selection a TakeOrdered threshold. Mutated
        // replica tokens GROW the model vocabularies with the corpus
        // (the regime where a full-vocab selector is costlier than
        // DSIR's fixed B — the ladder prices exactly that trade).
        Seq[(String, String => DataFrame)]("ce_select" -> { d =>
          val ds = docs(d)
          functions.Sampling.crossEntropySelect(
              functions.Sampling.crossEntropyScore(ds,
                ds.filter(col("source").isin(
                  oracles.PipelineOracles.dsirTargetSources: _*)))
                .localCheckpoint(true), 200)
            .filter(col("keep") || col("n_bigrams") >= 0L)
        })
      else if (kind == "mink")
        // Min-K membership audit end to end (fit + score members AND
        // reversed-twin non-members): the claim to certify is the
        // bigram-LM family's ~1.0 — mutated replica tokens GROW the
        // model with the corpus (the ce rung's regime), scoring is the
        // postings join over 2× corpus candidates, and the bottom-k
        // fold is per-document. The filter consumes min_k_prob so the
        // ladder's count() cannot prune the audit.
        Seq[(String, String => DataFrame)]("min_k_prob" -> { d =>
          val base = docs(d).filter(col("text").isNotNull)
            .select(col("doc_id"), col("text"))
          val cands = base.unionByName(base.select(
            (col("doc_id") + 100000000L).as("doc_id"),
            array_join(reverse(split(col("text"), " ")), " ").as("text")))
          functions.TextAnalysis.minKProb(base, cands)
            .filter(col("min_k_prob") >= 0.0 || col("n_bigrams") >= 0L)
        })
      else if (kind == "tclose")
        // t-closeness audit over the replicated docs corpus (quasi =
        // lang × source, sensitive = 200-char length buckets): the
        // claim to certify is ~1.0 — one corpus hash aggregate to the
        // checkpointed class × value table, then KB-scale EMD
        // arithmetic whose size does NOT grow with replicas (replicas
        // keep lang/source, so classes stay constant while counts
        // grow). The filter consumes emd so the verdict can't prune.
        Seq[(String, String => DataFrame)]("tcloseness" -> (d =>
          functions.DataQuality.tCloseness(docs(d), Seq("lang", "source"),
              floor(col("n_chars").cast("double") / 200.0), t = 0.2)
            .filter(col("emd") >= 0.0)))
      else if (kind == "substr")
        // substring-level exact dedup — one O(corpus code points)
        // window-HASH shuffle (8-byte keys) + exact verify on the
        // candidate (true-repeat) volume only: the claim to certify is
        // the anchor-bucketed ~1.0 exponent (never the all-pairs or
        // suffix-array-build shape). Replicas mutate text, so repeats
        // stay within-replica and scale linearly with the corpus. The
        // filter consumes n_removed so the count() cannot prune the
        // verdicts.
        Seq[(String, String => DataFrame)]("substring_dedup" -> (d =>
          Dedup.substringDedup(docs(d), windowLen = 40)
            .filter(col("n_removed") >= 0L)))
      else if (kind == "gopher")
        // the full Gopher Table A1 statistic over the reflow-injected
        // corpus — the claim to certify is ~1.0 with a SMALL constant:
        // the operator is one scan-side kernel with zero exchanges, so
        // rung time should track corpus bytes and nothing else. The
        // filter consumes a kernel output column so the ladder's count()
        // cannot prune the statistic.
        Seq[(String, String => DataFrame)]("gopher_repetition" -> { d =>
          val injected = docs(d)
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
          functions.TextAnalysis.gopherRepetition(injected)
            .filter(col("dup_5gram_char_frac") >= 0.0)
        })
      else if (kind == "novelty")
        // trigram novelty — one trigram-keyed shuffle + doc rollup: the
        // claim to certify is a ~1.0 exponent (rows ∝ corpus tokens,
        // never token-pair count). The filter consumes the novelty
        // column so the ladder's count() cannot prune the trigram work.
        Seq[(String, String => DataFrame)]("trigram_novelty" -> (d =>
          functions.TextAnalysis.trigramNovelty(docs(d))
            .filter(col("novelty") >= 0.0)))
      else if (kind == "boiler")
        // per-source boilerplate strip over the q_text_boilerplate
        // wrapping (banner + every-7th-doc quote + per-source footer,
        // both injected AFTER replication so template df stays at 100%
        // of each source's GROWING page count — the production regime).
        // The claim to certify is ~1.0: the df aggregate and its join
        // back are both keyed by (source, line), so cost tracks corpus
        // lines; the hot banner key is a 1:1 join against its single df
        // row, fan-out N:1, never a pair product. The filter consumes
        // n_kept so the ladder's count() cannot prune the verdicts.
        Seq[(String, String => DataFrame)]("boilerplate_strip" -> { d =>
          val relined = expr(
            "concat_ws('\n', transform(" +
              "sequence(0, (size(split(text, ' ')) + 11) div 12 - 1), " +
              "i -> concat_ws(' ', slice(split(text, ' '), i * 12 + 1, 12))))")
          val quote = when(col("doc_id") % 7 === 0,
            lit("a quote cited by a few pages of every site\n"))
            .otherwise(lit(""))
          val wrapped = docs(d).filter(col("text").isNotNull)
            .select(col("doc_id"), col("source"),
              concat(lit("SUBSCRIBE to our newsletter\n"), quote, relined,
                lit("\n(c) 2026 "), col("source")).as("text"))
          Dedup.boilerplateStrip(wrapped).filter(col("n_kept") >= 0)
        })
      else jac ++ Seq[(String, String => DataFrame)](
        "containment" -> { d =>
          val ds = docs(d).select("doc_id", "text")
          val concats = ds.as("a").filter(col("doc_id") % 10 === 0)
            .join(ds.as("b"), col("b.doc_id") === col("a.doc_id") + 1)
            .select((col("a.doc_id") + lit(20000L)).as("doc_id"),
              concat(col("a.text"), lit(" "), col("b.text")).as("text"))
          Dedup.containmentPairs(ds.unionByName(concats), 0.9)
        },
        "clusters" -> (d =>
          Dedup.duplicateClusters(Dedup.ngramJaccardPairs(docs(d), 0.5))),
        "decisions" -> (d =>
          Dedup.dedupDecisions(docs(d), Dedup.ngramJaccardPairs(docs(d), 0.5))),
        "rollup_incremental" -> { d =>
          val wh = java.nio.file.Files.createTempDirectory("graft_ladder_wh")
          val tx = sources.Tables.transactions(spark, d)
          val store = wh.resolve("daily").toString
          val inFirst = pmod(hash(col("ts")), lit(2)) === 0
          operators.Rollups.writeDailyPartials(tx.filter(inFirst), store)
          operators.Rollups.upsertDailyPartials(tx.filter(!inFirst), store)
          operators.Rollups.userWindowsFromDaily(
            spark.read.parquet(store), Seq(7, 14, 30))
        })
    }

    val times = scala.collection.mutable.Map.empty[String, List[(Int, Double)]]
      .withDefaultValue(Nil)
    // untimed warm-up on the smallest rung: JIT + codegen caches, so rung
    // timings measure the operators, not first-pass compilation
    locally {
      val dir = replicate(factors.min)
      for ((_, q) <- queries) q(dir).count()
    }
    for (k <- factors.sorted) {
      val dir = replicate(k)
      if (kind == "twins") {
        val (jr, maxDf) = jaccardStats(sources.Tables.documents(spark, dir))
        val regime = if (jr <= Dedup.MaxIndexJoinRows && maxDf <= 1000L)
          "count-join" else "prefix-filter"
        println(s"[ladder] x$k joinRows=$jr maxDf=$maxDf " +
          s"threshold=${Dedup.MaxIndexJoinRows} regime=$regime")
      }
      for ((name, q) <- queries) {
        val t0 = System.nanoTime()
        val rows = q(dir).count()
        val secs = (System.nanoTime() - t0) / 1e9
        times(name) = (k, secs) :: times(name)
        println(f"[ladder] $kind x$k $name rows=$rows time=$secs%.2fs")
      }
    }

    for ((name, _) <- queries; pts = times(name).reverse if pts.size >= 2) {
      // least-squares slope of ln t on ln k = fitted scaling exponent
      val xs = pts.map(p => math.log(p._1.toDouble))
      val ys = pts.map(p => math.log(p._2))
      val n = xs.size; val mx = xs.sum / n; val my = ys.sum / n
      val slope = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum /
        xs.map(x => (x - mx) * (x - mx)).sum
      println(f"[ladder] $kind $name exponent=$slope%.2f over k=" +
        pts.map(_._1).mkString(","))
    }
  }

  /** Merge-on-read DELETION cost probe (SCALE.md round-13 evidence for
    * the tombstone design): on a clustered ANN index of nc·per vectors,
    * measure (a) the O(batch) tombstone append, (b) warm indexed-search
    * latency with ZERO vs `dels` tombstones (the claim: the broadcast
    * anti-join is a no-cost rider on the pruned read), and (c) the
    * compaction rewrite (index-linear — the amortized physical purge).
    */
  private def delprobe(spark: SparkSession, nClusters: Int, per: Int,
      dels: Int): Unit = {
    val emb = structuredEmbeddings(spark, nClusters, per, 16)
      .localCheckpoint(true)
    val qs = emb.filter(col("vec_id") % (nClusters.toLong * per / 16) === 0)
      .localCheckpoint(true)
    val name = "graft_delprobe_idx"
    functions.Similarity.writeAnnIndex(emb, name,
      centroids = math.max(8, nClusters / 2),
      sampleSize = math.max(256, nClusters * 2), iters = 2)
    try {
      def search(): Double = {
        val t = System.nanoTime()
        functions.Similarity.annSearchIndexed(spark, name, qs, k = 10,
          nprobe = 2).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t) / 1e9
      }
      search() // warm
      val clean = Seq(search(), search()).min
      val ids = (0 until dels).map(i =>
        (i.toLong * per + 1) % (nClusters.toLong * per))
      val t0 = System.nanoTime()
      functions.Similarity.deleteFromAnnIndex(spark, name, ids)
      val append = (System.nanoTime() - t0) / 1e9
      search() // warm the tombstoned plan
      val tomb = Seq(search(), search()).min
      val t1 = System.nanoTime()
      functions.Similarity.compactAnnIndex(spark, name)
      val compact = (System.nanoTime() - t1) / 1e9
      search()
      val after = Seq(search(), search()).min
      println(f"[delprobe] n=${nClusters * per}%8d dels=$dels%6d " +
        f"searchClean=$clean%5.2fs tombAppend=$append%5.2fs " +
        f"searchTombstoned=$tomb%5.2fs compact=$compact%5.2fs " +
        f"searchCompacted=$after%5.2fs")
    } finally functions.Similarity.dropAnnIndex(spark, name)
  }

  /** Incremental-boilerplate cost-shape probe (SCALE.md round-13
    * evidence for the O(batch) claim): the SEEN corpus grows k× (shifted
    * ids, per-source templates present in every copy — the df keeps its
    * proportions, the production regime) while the screened BATCH stays
    * fixed. Per rung: line-df table build time (the once-per-corpus
    * cost), warm [[functions.Dedup.boilerplateStripAgainst]] screen time
    * (the claim: ~FLAT — the batch explodes once and the seen side
    * contributes only the partial rows matching the batch's lines via
    * the semi-join probe), and the full-recompute comparator
    * ([[functions.Dedup.boilerplateStrip]] over seen ∪ batch — grows
    * with the corpus, the cost a deployment avoids per daily batch).
    */
  private def boilerinc(spark: SparkSession, sfDir: String,
      ks: Seq[Int]): Unit = {
    val relined = expr(
      "concat_ws('\n', transform(" +
        "sequence(0, (size(split(text, ' ')) + 11) div 12 - 1), " +
        "i -> concat_ws(' ', slice(split(text, ' '), i * 12 + 1, 12))))")
    val quote = when(col("doc_id") % 7 === 0,
      lit("a quote cited by a few pages of every site\n")).otherwise(lit(""))
    val wrapped = sources.Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        concat(lit("SUBSCRIBE to our newsletter\n"), quote, relined,
          lit("\n(c) 2026 "), col("source")).as("text"))
    val seenBase = wrapped.filter(col("doc_id") % 4 =!= 0)
    val batch = wrapped.filter(col("doc_id") % 4 === 0)
      .localCheckpoint(true)
    for (k <- ks) {
      val seen = (0 until k).map(i =>
          seenBase.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
            col("source"), col("text")))
        .reduce(_ unionByName _)
        .localCheckpoint(true)
      val name = "graft_boilerinc_idx"
      val t0 = System.nanoTime()
      functions.Dedup.writeLineDfTable(seen, name)
      val build = (System.nanoTime() - t0) / 1e9
      try {
        def screen(): Double = {
          val t = System.nanoTime()
          functions.Dedup.boilerplateStripAgainst(spark, name, batch)
            .filter(col("n_kept") >= 0).count()
          (System.nanoTime() - t) / 1e9
        }
        screen() // warm-up: plan + JIT
        val s = Seq(screen(), screen()).min
        val t1 = System.nanoTime()
        functions.Dedup.boilerplateStrip(seen.unionByName(batch))
          .filter(col("n_kept") >= 0).count()
        val full = (System.nanoTime() - t1) / 1e9
        println(f"[boilerinc] x$k seenDocs=${seen.count()}%8d " +
          f"build=$build%6.2fs screenWarm=$s%6.2fs fullRecompute=$full%6.2fs")
      } finally functions.Dedup.dropLineDfTable(spark, name)
    }
  }

  /** Streaming-gate CANDIDATE-CAPACITY probe (SCALE.md round-13
    * evidence): the text/embedding/media gates collect per-micro-batch
    * candidate sets driver-side, bounded by `maxCandidates` with a loud
    * failure — this measures where that bound actually bites. Fixture:
    * `nFam` near-dup families of `per` seen members each (every family
    * member shares its family's shingles), so a batch of B docs (one
    * per family, round-robin) generates ≈ B·per candidate pairs — the
    * candidate volume is the batch size × its corpus duplicate rate,
    * which is the number the bound is really about. Sweeps batch size
    * through the default 65,536 cap and prints candidates, wall time,
    * and candidates/sec per rung, plus the cap-crossing batch size for
    * this duplicate rate.
    */
  private def gatecap(spark: SparkSession, nFam: Int, per: Int): Unit = {
    import spark.implicits._
    def text(fam: Int, member: Int): String = {
      val base = (0 until 24).map(w => s"fam${fam}word${w * 7 % 13}w$w")
      (base :+ s"member$member").mkString(" ")
    }
    val seen = (0 until nFam * per).map { i =>
      (i.toLong, text(i % nFam, i / nFam))
    }.toDF("doc_id", "text")
    val name = "graft_gatecap_idx"
    functions.MinhashIndex.write(seen, name)
    try {
      val capDefault = 65536
      for (b <- Seq(64, 256, 1024, 4096, 16384)) {
        val batch = (0 until b).map { i =>
          ((1000000 + i).toLong, text(i % nFam, per + 100 + i / nFam))
        }.toDF("doc_id", "text")
        val t0 = System.nanoTime()
        val pairs = functions.MinhashIndex.screen(spark, name, batch, 0.5,
          maxCandidates = 10000000).count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[gatecap] batch=$b%6d candPairs=$pairs%8d " +
          f"time=$secs%6.2fs rate=${pairs / secs}%9.0f cand/s " +
          f"(default cap ${if (pairs > capDefault) "EXCEEDED" else "ok"})")
      }
      println(s"[gatecap] default maxCandidates=$capDefault bites at " +
        s"batch ≈ ${capDefault / per} docs at duplicate rate $per " +
        s"(cap / per-doc duplicate count)")
    } finally functions.MinhashIndex.drop(spark, name)
  }

  /** Ground-truth artifact payoff probe (BASELINE.md evidence): build the
    * persisted exact top-10 of the pinned eval set ONCE, then time the
    * recall evaluation's exact side as a recompute (bruteForceTopK per
    * consumer) vs a read (recallAtKIndexed) against a FIXED checkpointed
    * approx frame, so the delta isolates the ground-truth side — the
    * cost every quantizer-configuration evaluation pays per run.
    */
  private def gtprobe(spark: SparkSession, dir: String): Unit = {
    val emb = sources.Tables.embeddings(spark, dir)
    val qs = emb.filter(col("vec_id") % 100 === 0)
    val approx = Similarity.ivfTrainedTopK(emb, qs, k = 10)
      .localCheckpoint(true)
    val name = "graft_gtprobe"
    val t0 = System.nanoTime()
    Similarity.writeGroundTruth(emb, qs, k = 10, name)
    println(f"[gtprobe] build=${(System.nanoTime() - t0) / 1e9}%.2fs")
    try {
      for (i <- 1 to 3) {
        val t1 = System.nanoTime()
        val n1 = Similarity.recallAtK(approx,
          Similarity.bruteForceTopK(emb, qs, k = 10), k = 10).count()
        val tr = (System.nanoTime() - t1) / 1e9
        val t2 = System.nanoTime()
        val n2 = Similarity.recallAtKIndexed(spark, name, approx, k = 10).count()
        val ti = (System.nanoTime() - t2) / 1e9
        println(f"[gtprobe] run $i recompute=$tr%.2fs rows=$n1 " +
          f"indexed=$ti%.2fs rows=$n2")
      }
    } finally Similarity.dropGroundTruth(spark, name)
  }

  /** Banded-Hamming pair generation at signature-corpus scale: `groups`
    * planted near-dup families of `per` members (member j flips one
    * hash-chosen bit of the family base; any two members differ by ≤2
    * bits, so every within-family pair is inside the Hamming-3 radius
    * and 4×16 banding guarantees it surfaces). Measures the banded join
    * + verify over groups·per signatures and checks the planted pairs
    * all arrive. Also prints the candidate volume — the number that
    * shows WHERE 4×16 banding's regime ends: expected random-collision
    * candidates ≈ 4·n²/2^17, so at n=10^6 that is ~3·10^7 verified-and-
    * discarded rows (fine), while at n=10^9 it would be ~3·10^13 — the
    * corpus-sized-bands lesson (SCALE.md round-1 embedding bands)
    * applies: widen chunks with corpus growth.
    */
  private def phashScale(spark: SparkSession, groups: Int, per: Int): Unit = {
    val n = groups.toLong * per
    val sigs = spark.range(n).select(
      col("id").as("doc_id"),
      expr(s"id div $per").as("gid"),
      (col("id") % per).as("m"))
      .withColumn("sig", when(col("m") === 0, xxhash64(col("gid")))
        .otherwise(expr("xxhash64(gid) ^ " +
          "shiftleft(1L, cast(pmod(xxhash64(gid, m), 64) as int))")))
      .select("doc_id", "sig")
      .localCheckpoint(true)
    val t0 = System.nanoTime()
    val pairs = Dedup.bandedHammingPairs(sigs, maxHamming = 3)
      .localCheckpoint(true)
    val nPairs = pairs.count()
    val secs = (System.nanoTime() - t0) / 1e9
    // planted pairs: per-family all-pairs; members whose flip bit
    // coincides are 0 apart, otherwise 2 — all ≤ 3
    val expected = groups.toLong * per * (per - 1) / 2
    val withinFam = pairs.filter(
      expr(s"doc_a div $per") === expr(s"doc_b div $per")).count()
    println(f"[phashscale] n=$n sigs, $nPairs pairs in $secs%.1f s " +
      s"(planted $expected within-family, found $withinFam" +
      (if (withinFam == expected) " — full recall)" else " — RECALL MISS)"))
  }

  /** Corpus-wide line dedup at scale: `nDocs`·`linesPer` lines where
    * every 5th line draws from a `pool`-sized shared boilerplate pool
    * (the navigation-chrome shape) and the rest are unique. Measures the
    * one line-keyed shuffle + rebuild and prints the excision fraction
    * (expected ≈ the boilerplate share minus pool-many first
    * occurrences).
    */
  private def lineScale(spark: SparkSession, nDocs: Long, linesPer: Int,
      pool: Int): Unit = {
    val docs = spark.range(nDocs).select(
      col("id").as("doc_id"),
      concat_ws("\n", (0 until linesPer).map { j =>
        if (j % 5 == 0)
          concat(lit("boiler "),
            pmod(xxhash64(col("id"), lit(j)), lit(pool)).cast("string"))
        else
          concat(lit("unique "), col("id").cast("string"), lit(" "), lit(j))
      }: _*).as("text"))
      .localCheckpoint(true)
    val t0 = System.nanoTime()
    val agg = Dedup.lineDedup(docs, minCount = 2)
      .agg(sum(col("n_lines")).as("nl"), sum(col("n_kept")).as("nk"))
      .head()
    val secs = (System.nanoTime() - t0) / 1e9
    val (nl, nk) = (agg.getLong(0), agg.getLong(1))
    println(f"[linescale] ${nDocs * linesPer} lines, kept $nk of $nl " +
      f"(${100.0 * (nl - nk) / nl}%.1f%% excised) in $secs%.1f s")
  }
}
