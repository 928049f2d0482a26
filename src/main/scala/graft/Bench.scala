package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: every SparkEntry query against SPARK_GRAFT_SF_DIR,
  * printed as ONE JSON line for the round driver.
  *
  * Noise discipline (round-2/3 lesson: single-run timings flip-flopped
  * 3-9× between rounds with zero code change, burning a judge cycle each
  * time): each query runs SPARK_GRAFT_RUNS times (default 3) in
  * INTERLEAVED passes — pass 1 runs every query once, then pass 2, ... —
  * so JIT/page-cache warmth spreads evenly instead of favoring whichever
  * query ran last. Reported per-query time and the total are per-query
  * MEDIANS; "spread" records max/min per query and "noise" their maximum,
  * the round's noise bound (compare regressions against it before
  * believing them). Medians are compared against the per-query table in
  * BASELINE.md.
  *
  * SELF-ADJUDICATION (round-13 lesson: three rounds running, the
  * interleaved bench manufactured >2× flags — q1_agg, q3, funnel,
  * q_text_repetition — that standalone warm runs reversed, burning a
  * judge cycle each time): after the interleaved passes, any query whose
  * interleaved median breaches 2× its BASELINE.md row OR whose sample
  * spread exceeds 2.5 re-runs STANDALONE-warm (SPARK_GRAFT_ADJ_RUNS
  * consecutive runs, nothing interleaving, JIT already warm) and the
  * JSON carries both numbers: `queries` stays the raw interleaved
  * median, `adjudicated` holds the standalone medians for exactly the
  * flagged set. A flag that the adjudicated median clears was ambient;
  * one it confirms is a real regression. Baselines parse best-effort
  * from SPARK_GRAFT_BASELINE (default BASELINE.md — table rows
  * `| q_x | secs | ...` and prose rows `**q_x 1.23 s**`); with no
  * baseline file only the spread trigger fires.
  *
  * TWO-TIER REGISTRY (round-17): with 226+ queries the flat 1-warm +
  * 3-measured protocol costs ~25 min of close-run wall and most of it
  * re-measures sub-noise rows whose medians carry no signal (shared-JVM
  * codegen-cache churn swamps sub-0.5 s timings — the documented
  * q_text_c4_clean 0.30→0.74 s effect). Default (SPARK_GRAFT_TIER=auto):
  * every query runs the warm pass + measured pass 1; passes 2..runs
  * re-measure only the HEAVY tier — baseline > SPARK_GRAFT_HEAVY_MIN
  * (0.5 s), no baseline row yet, or named in SPARK_GRAFT_TOUCHED.
  * SPARK_GRAFT_TIER=full restores the flat protocol. Per-query detail
  * rows carry their tier; light rows' "median" is their single measured
  * sample.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // WindowExec warns "No Partition Defined ... single partition" on every
    // single-partition window. Every such site in this engine is a KB-scale
    // model/quota/histogram frame BY DESIGN (audited round 16 — e.g. the
    // B=2048 DSIR totals in Sampling.scala); at 226 queries x 4 passes the
    // spam was 90% of the driver's 2 KB stdout tail and nearly crowded out
    // the summary line. Silence that one logger; real regressions on
    // corpus-scale frames would show up as timings, not this warning.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window",
      org.apache.logging.log4j.Level.ERROR)
    // Synthetic warmup so the first measured query doesn't absorb JVM,
    // codegen, and scheduler startup (touches no corpus data — IO still
    // counts against the queries that do it).
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    val warmPass = sys.env.getOrElse("SPARK_GRAFT_WARM", "1").toInt > 0

    val names = SparkEntry.queries.toSeq.sortBy(_._1).map(_._1)
    // noop sink forces full computation of every output column — count()
    // would let Catalyst prune the very projections being measured.
    // A failed query records -1 (and is excluded from the total) so breakage
    // is visible in the JSON instead of masquerading as a timing.
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir)
              .write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: $e"); -1.0 }
    }
    // Baselines parse up front: the two-tier registry below keys on them
    // (and the flag self-adjudication reuses the same map).
    val baselines: Map[String, Double] = {
      val path = sys.env.getOrElse("SPARK_GRAFT_BASELINE", "BASELINE.md")
      try {
        val text = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(path)), "UTF-8")
        val tableRow = """\|\s*(q[\w]+)\s*\|\s*([0-9]+\.[0-9]+)\s*\|""".r
        val proseRow = """\*\*(q[\w]+)\s+([0-9]+\.[0-9]+)\s?s\*\*""".r
        (tableRow.findAllMatchIn(text) ++ proseRow.findAllMatchIn(text))
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      } catch { case _: Exception => Map.empty }
    }
    // TWO-TIER registry (round-17: 226 queries × (1 warm + 3 measured)
    // = ~25 min of close-run wall, growing ~15 queries/round, and the
    // sub-noise rows' medians carry no signal beyond their first sample —
    // the shared-JVM codegen-cache churn swamps them). Every query keeps
    // its warm pass AND one measured pass (per-query visibility never
    // drops to zero); extra passes 2..runs re-measure only the HEAVY
    // tier — rows whose baseline exceeds heavyMin (default 0.5 s), rows
    // with NO baseline yet (new this round — they need a median worth
    // recording), and rows named in SPARK_GRAFT_TOUCHED (comma list — set
    // it for queries whose plan changed this round). SPARK_GRAFT_TIER=full
    // restores the flat protocol. Light rows report their single measured
    // sample as the median (tier:"light" in the detail file) and the
    // self-adjudication path below still standalone-re-runs any of them
    // that flags.
    val tier = sys.env.getOrElse("SPARK_GRAFT_TIER", "auto")
    val heavyMin = sys.env.getOrElse("SPARK_GRAFT_HEAVY_MIN", "0.5").toDouble
    val touched = sys.env.get("SPARK_GRAFT_TOUCHED")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    val heavy: Set[String] =
      if (tier == "full") names.toSet
      else names.filter(n => touched(n) ||
        baselines.get(n).forall(_ > heavyMin)).toSet
    // Measured-warm pass 0 (round-15 lesson: the first interleaved pass
    // absorbs per-query JIT + page cache and ran routinely 2-5x its warm
    // time — q1_agg samples 2.97/1.14/0.61 — manufacturing 33 false >2x
    // flags per close run that each needed standalone adjudication). Run
    // every query once UNMEASURED before the measured passes; disable
    // with SPARK_GRAFT_WARM=0 when a cold-cache number is wanted.
    if (warmPass) names.foreach(once)
    val samples: Map[String, Seq[Double]] =
      (1 to runs).flatMap { pass =>
        val ns = if (pass == 1) names else names.filter(heavy)
        ns.map(n => n -> once(n))
      }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap

    def median(xs: Seq[Double]): Double = {
      val ok = xs.filter(_ >= 0).sorted
      if (ok.isEmpty) -1.0
      else if (ok.size % 2 == 1) ok(ok.size / 2)
      else (ok(ok.size / 2 - 1) + ok(ok.size / 2)) / 2
    }
    def round3(d: Double): Double = math.rint(d * 1000) / 1000

    val med = names.map(n => n -> round3(median(samples(n))))
    val spread = names.map { n =>
      val ok = samples(n).filter(_ >= 0)
      n -> (if (ok.isEmpty || ok.min <= 0) -1.0 else round3(ok.max / ok.min))
    }
    val total = round3(med.map(_._2).filter(_ >= 0).sum)
    val noise = spread.map(_._2).max
    // Queries with no successful sample. Surfaced explicitly in the headline
    // (r9 lesson: a broken query is EXCLUDED from the total, so a round that
    // breaks queries would otherwise report a smaller, better-looking number
    // with nothing in the line saying so).
    val failedNames = med.collect { case (n, m) if m < 0 => n }
    def jmap(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    // Full detail (per-query samples + spreads) goes to a file; the stdout
    // line stays small because the round driver records only the last ~2 KB
    // of output — r4's line outgrew that tail and truncated the total away.
    // Key order puts the headline total LAST so it survives any future
    // head-truncation of the line.
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_DETAIL", "BENCH_DETAIL.json")
    val medMap = med.toMap
    val spreadMap = spread.toMap

    // ---- self-adjudication of interleaved flags (see scaladoc) ----
    val adjRuns = sys.env.getOrElse("SPARK_GRAFT_ADJ_RUNS", "3").toInt
    val flagged = names.filter { n =>
      val m = medMap(n)
      m >= 0 && (spreadMap(n) > 2.5 ||
        baselines.get(n).exists(b => b > 0 && m / b > 2.0))
    }
    val adjSamples: Map[String, Seq[Double]] =
      flagged.map(n => n -> (1 to adjRuns).map(_ => once(n))).toMap
    val adj = flagged.map(n => n -> round3(median(adjSamples(n))))

    val detail = names.map { n =>
      "\"" + n + "\":{\"median\":" + medMap(n) +
        ",\"spread\":" + spreadMap(n) +
        ",\"tier\":\"" + (if (heavy(n)) "heavy" else "light") + "\"" +
        ",\"samples\":[" + samples(n).map(round3).mkString(",") + "]" +
        (if (adjSamples.contains(n))
          ",\"adjudicated\":" + adj.toMap.apply(n) +
            ",\"adj_samples\":[" +
            adjSamples(n).map(round3).mkString(",") + "]"
        else "") + "}"
    }.mkString("{", ",", "}")
    val failedJson =
      s""""failed":${failedNames.size},"failed_queries":[""" +
        failedNames.map("\"" + _ + "\"").mkString(",") + "]"
    // a flag STANDS only when the standalone-warm median still breaches
    // 2x its baseline; a spread flag with NO baseline row is not silently
    // cleared — it can't stand (no bar to breach) but it is REPORTED in
    // its own count so a regressed newly-added query is visible until
    // someone records its baseline
    val standing = adj.filter { case (n, a) =>
      a >= 0 && baselines.get(n).exists(b => b > 0 && a / b > 2.0) }
    val unbaselined = adj.filter { case (n, _) =>
      !baselines.get(n).exists(_ > 0) }
    val adjJson =
      s""""flags_raw":${flagged.size},"flags_standing":${standing.size},""" +
        s""""flags_unbaselined":${unbaselined.size},""" +
        s""""unbaselined_queries":[${unbaselined.map("\"" + _._1 + "\"").mkString(",")}],""" +
        s""""adjudicated":${jmap(adj)},"""
    try java.nio.file.Files.write(java.nio.file.Paths.get(detailPath),
      (s"""{"runs":$runs,"sf":"$sfDir","tier":"$tier",""" +
        s""""heavy_count":${names.count(heavy)},""" +
        s""""noise":$noise,$failedJson,$adjJson""" +
        s""""per_query":$detail,"total":$total}""" + "\n").getBytes("UTF-8"))
    catch { case e: Exception =>
      System.err.println(s"[bench] could not write $detailPath: $e") }
    // The round driver records only the last ~2 KB of stdout, so the 215-
    // entry query map CANNOT ride the headline line (15 straight rounds of
    // BENCH_r*.json came back `parsed: null` because the tail landed
    // mid-map). The full per-query map lives in the detail file; stdout
    // gets exactly ONE compact line — the summary, alone, last — so the
    // driver's tail always contains a complete parseable JSON object.
    // stop() BEFORE the summary so no Spark log line can land after it:
    // with run/outputStrategy := StdoutOutput and showSuccess := false in
    // build.sbt the summary below is the process's (and sbt's) final
    // stdout line, parseable by the driver's tail-JSON read.
    spark.stop()
    println(s"""{"metric":"total","unit":"sec","value":$total,""" +
      s""""queries_count":${names.size},"runs":$runs,"warm_pass":$warmPass,""" +
      s""""tier":"$tier","heavy_count":${names.count(heavy)},""" +
      s""""noise":$noise,$failedJson,$adjJson""" +
      s""""detail":"$detailPath","sf":"$sfDir"}""")
  }
}
