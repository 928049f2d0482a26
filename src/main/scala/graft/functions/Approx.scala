package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based approximations packaged so the exact answer and the sketch's
  * accuracy verdict travel together.
  *
  * At 100 TB the exact operators stop being affordable — `count(DISTINCT)`
  * shuffles every key and exact percentiles sort every group — and the
  * sketches (HLL++ for distincts, KLL/GK-style summaries for quantiles) are
  * what actually runs: constant memory per group, one pass, mergeable
  * partials (map-side combine works, rollups union sketches instead of
  * rescanning; ApproxSpec pins the merge identity).
  *
  * Sketch values themselves are engine-specific, so a cross-engine oracle
  * cannot replay them. These operators therefore emit the EXACT per-group
  * answer plus a boolean verdict that the sketch landed inside its
  * documented error bound — the exact side replays anywhere, and the
  * verdict replays as literal TRUE, which holds iff every bound held. That
  * keeps the approximate layer under the same hash gate as everything else
  * instead of being tested-but-never-verified.
  */
object Approx {

  /** Per-group exact distinct count + HLL++ bound verdict.
    *
    * `rsd` is the sketch's target relative standard deviation;
    * `tol` the acceptance band on the estimate (default 2.5σ ≈ 98.8%
    * per-group confidence — and deterministic in practice: the sketch is
    * seedless, so a passing corpus passes on every rerun).
    */
  def distinctWithBound(df: DataFrame, keyCol: String, valueCol: String,
      rsd: Double = 0.02, tol: Double = 0.05): DataFrame =
    df.groupBy(col(keyCol))
      .agg(
        countDistinct(col(valueCol)).as("n_exact"),
        approx_count_distinct(col(valueCol), rsd).as("n_approx"))
      .select(col(keyCol), col("n_exact"),
        (abs(col("n_approx") - col("n_exact")) <=
          col("n_exact").cast("double") * tol).as("within_bound"))

  /** Per-group exact quantiles (linear interpolation) + approx-quantile
    * bound verdicts. For each q in `qs` emits `p<q*100>` (exact, a double
    * both engines interpolate identically) and `p<q*100>_ok`.
    *
    * The verdict checks the guarantee the sketch actually makes: the
    * Greenwald–Khanna summary behind `percentile_approx` bounds RANK error
    * (the returned element's rank is within `n/accuracy` of the target
    * rank), not value error — in a sparse tail, neighboring order
    * statistics can be arbitrarily far apart in value while the sketch is
    * working exactly as specified. So the check is a second, cheap pass:
    * count the group's rows strictly below / at-or-below the sketch value
    * (its rank interval, closed over ties) and require that interval to
    * overlap `[(q-eps)n - 1, (q+eps)n + 1]` (the ±1 absorbs the
    * interpolation convention at the target rank). The sketch row set is
    * per-group-tiny, so the join back is a broadcast — the corpus itself
    * is never shuffled for the verdict, just re-aggregated with map-side
    * partials.
    */
  def quantilesWithBound(df: DataFrame, keyCol: String, valueCol: String,
      qs: Seq[Double] = Seq(0.5, 0.9, 0.99),
      accuracy: Int = 10000): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q < 1), "quantiles in (0,1)")
    val qArr = qs.map(q => s"${q}D").mkString(", ")
    val grouped = df.groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n"),
        expr(s"percentile($valueCol, array($qArr))").as("ex"),
        expr(s"percentile_approx($valueCol, array($qArr), $accuracy)").as("ap"))
    val ranks = qs.indices.flatMap { i =>
      val ap = col("ap").getItem(i).cast("double")
      Seq(
        sum(when(col(valueCol) < ap, 1L).otherwise(0L)).as(s"lt_$i"),
        sum(when(col(valueCol) <= ap, 1L).otherwise(0L)).as(s"le_$i"))
    }
    val aggCols = Seq(first(col("n")).as("n"), first(col("ex")).as("ex")) ++ ranks
    val ranked = df.select(col(keyCol), col(valueCol))
      .join(broadcast(grouped), keyCol)
      .groupBy(col(keyCol))
      .agg(aggCols.head, aggCols.tail: _*)
    val eps = 1.0 / accuracy
    val name = (q: Double) => s"p${(q * 100).toInt}"
    val nD = col("n").cast("double")
    val cols = Seq(col(keyCol), col("n")) ++
      qs.zipWithIndex.flatMap { case (q, i) =>
        val ok = (col(s"lt_$i").cast("double") + 1.0 <= lit(q + eps) * nD + 1.0) &&
          (col(s"le_$i").cast("double") >= lit(q - eps) * nD - 1.0)
        Seq(col("ex").getItem(i).as(name(q)), ok.as(s"${name(q)}_ok"))
      }
    ranked.select(cols: _*)
  }

  /** HEAVY HITTERS — every key whose share of the corpus is at least
    * 1/`denom`, with its EXACT count, via the classic two-pass
    * sketch-then-verify shape (Misra–Gries '82; Manku–Motwani VLDB'02
    * lossy counting is the same regime):
    *
    * Pass 1 runs Misra–Gries with `denom` counters INSIDE each partition
    * (`mapPartitions` — genuinely per-partition imperative state, the case
    * the typed escape hatch exists for) and emits only the surviving
    * candidate keys, ≤ `denom` per partition regardless of key cardinality.
    * Pigeonhole makes the union a guaranteed superset of the true heavy
    * hitters: a key with global count ≥ n/denom must have per-partition
    * count ≥ n_p/denom in at least one partition, and MG with k = denom
    * counters keeps every key whose partition count exceeds n_p/(k+1).
    *
    * Pass 2 re-scans once, folding every non-candidate row into a single
    * null group (`when(is_candidate, key)`), so the aggregate hash table
    * holds ≤ candidates+1 entries however many distinct keys exist — the
    * property that makes this affordable where a full `groupBy(key)` at
    * 100 TB would shuffle every distinct key. The null group still counts
    * rows, so the total `n` comes from the same single aggregate.
    *
    * The output is EXACT (counts from pass 2, threshold applied to them),
    * so the oracle replays it as plain `GROUP BY` + `HAVING cnt*denom >= n`
    * — the sketch only bounds WORK, never changes the answer. NULL keys are
    * excluded (they are missing data, not a key). `share` is the one
    * double: a single division of two exact longs.
    */
  /** Cross-set OVERLAP estimate — audience/source intersection sizing via
    * HLL inclusion-exclusion, the question every mixing/dedup decision
    * starts from ("how much of source A is also in source B?"). For every
    * unordered pair of `setCol` values: exact distinct sizes, exact
    * intersection, exact Jaccard, and the verdict that the SKETCH path's
    * estimate `|A| + |B| − est(A ∪ B)` (the union sketch is
    * [[org.apache.spark.sql.functions.hll_union]] of the two per-set
    * Datasketches sketches — no rescan) landed within `tol · |A ∪ B|` of
    * the exact intersection. The family's discipline (see the object
    * scaladoc): the exact side replays in any engine, the verdict replays
    * as literal TRUE.
    *
    * At 100 TB only the per-set sketch aggregate runs (one pass, KB
    * state per set, mergeable partials); the exact arms here are the
    * certificate. `setCol` is a partition-grade key (sources, event
    * types, crawls) — the output is |sets|² pairs, so hundreds of sets
    * are fine, millions are the wrong operator. NULL sets/values drop.
    */
  def overlapEstimate(df: DataFrame, setCol: String, valueCol: String,
      lgK: Int = 14, tol: Double = 0.05): DataFrame = {
    require(lgK >= 10 && lgK <= 21, "lgK outside Datasketches' 10..21")
    val dd = df.filter(col(setCol).isNotNull && col(valueCol).isNotNull)
    // the per-set sketch aggregate feeds BOTH sides of the pair cross —
    // materialize it once (|sets| rows of KB sketches by contract) so the
    // input is not re-scanned and re-sketched per side (ADVICE r15)
    val sk = dd.groupBy(col(setCol).as("__k"))
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("__sk"),
        countDistinct(col(valueCol)).as("__n"))
      .localCheckpoint(true)
    val a = sk.select(col("__k").as("set_a"), col("__sk").as("__ska"),
      col("__n").as("n_a"))
    val b = sk.select(col("__k").as("set_b"), col("__sk").as("__skb"),
      col("__n").as("n_b"))
    // |sets| rows per side by contract — the cross is pair-table-sized
    // and the right side broadcasts (KB sketches per set)
    val pairs = a.crossJoin(broadcast(b)).filter(col("set_a") < col("set_b"))
    // same single-materialization discipline for the exact-certificate
    // arm: the distinct pair frame is read twice by its self-join
    val dv = dd.select(col(setCol).as("__k"), col(valueCol).as("__v"))
      .distinct()
      .localCheckpoint(true)
    val inter = dv.as("x").join(dv.as("y"),
        col("x.__v") === col("y.__v") && col("x.__k") < col("y.__k"))
      .groupBy(col("x.__k").as("set_a"), col("y.__k").as("set_b"))
      .agg(count(lit(1)).as("n_inter"))
    val unionExact = col("n_a") + col("n_b") - col("n_inter")
    val interEst = col("n_a") + col("n_b") -
      hll_sketch_estimate(hll_union(col("__ska"), col("__skb")))
    pairs.join(inter, Seq("set_a", "set_b"), "left")
      .na.fill(0L, Seq("n_inter"))
      .select(col("set_a"), col("set_b"), col("n_a"), col("n_b"),
        col("n_inter"),
        when(unionExact > 0,
          col("n_inter").cast("double") / unionExact.cast("double"))
          .otherwise(lit(0.0)).as("jaccard"),
        (abs(interEst - col("n_inter")).cast("double") <=
          unionExact.cast("double") * tol).as("within_bound"))
  }

  def heavyHitters(df: DataFrame, keyCol: String, denom: Long): DataFrame = {
    require(denom >= 2, "denom must be >= 2 (threshold share = 1/denom)")
    // Pass-1 state is O(denom) counters per partition; a silent clamp here
    // would break the superset guarantee (keys at exactly the 1/denom
    // threshold could be dropped before pass 2 ever counts them), so an
    // over-limit denom is an ERROR, not a quiet degradation. 100k string
    // counters ≈ a few MB — comfortably per-task memory; a finer threshold
    // than 1/100000 wants the full groupBy, not a sketch.
    require(denom <= 100000L,
      s"denom=$denom exceeds the 100000 counter budget; the per-partition " +
        "Misra-Gries pass could silently drop true heavy hitters at the " +
        "1/denom threshold. Use a plain groupBy for finer thresholds.")
    val spark = df.sparkSession
    import spark.implicits._
    val keys = df.select(col(keyCol).cast("string").as("k"))
      .filter(col("k").isNotNull)
    val k = denom.toInt
    val candidates = keys.as[String].mapPartitions(misraGries(_, k))
      .toDF("k").distinct()
    val tagged = keys.join(
      broadcast(candidates.withColumn("__cand", lit(true))), Seq("k"), "left")
    val grouped = tagged
      .groupBy(when(col("__cand"), col("k")).as("k"))
      .agg(count(lit(1)).as("cnt"))
    val total = grouped.agg(sum(col("cnt")).cast("long").as("__n"))
    grouped.filter(col("k").isNotNull)
      .crossJoin(broadcast(total))
      .filter(col("cnt") * denom >= col("__n"))
      .select(col("k").as(keyCol), col("cnt"),
        (col("cnt").cast("double") / col("__n").cast("double")).as("share"))
  }

  /** Misra–Gries with `k` counters over one partition's stream: keep every
    * key whose partition frequency exceeds n_p/(k+1). Decrement-all is
    * amortized O(1) per element (each decrement pays back one earlier
    * increment); memory is O(k) whatever the stream length.
    */
  private def misraGries(it: Iterator[String], k: Int): Iterator[String] = {
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    while (it.hasNext) {
      val x = it.next()
      counts.get(x) match {
        case Some(c) => counts.update(x, c + 1)
        case None if counts.size < k => counts.update(x, 1L)
        case None =>
          val dead = scala.collection.mutable.ArrayBuffer.empty[String]
          counts.mapValuesInPlace((_, c) => c - 1)
          counts.foreach { case (key, c) => if (c == 0) dead += key }
          dead.foreach(counts.remove)
      }
    }
    counts.keysIterator
  }
}
