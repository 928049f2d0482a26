package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Sketch-based approximations — the scale path where the exact operators
  * (full-sort percentile, count-distinct shuffle) stop being affordable.
  * These are correctness bounds against the exact answers on the corpus;
  * the exact variants remain the oracle-checked driver queries.
  */
class ApproxSpec extends SparkSpec {

  private lazy val events = Tables.events(spark, sf)

  test("approx_count_distinct (HLL++) lands within its error bound") {
    val r = events.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id"), 0.02).as("approx")).collect().head
    val exact = r.getAs[Long]("exact").toDouble
    val approx = r.getAs[Long]("approx").toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("percentile_approx tracks the exact percentile") {
    val r = events.agg(
      expr("percentile(value, 0.5D)").as("exact"),
      expr("percentile_approx(value, 0.5D, 10000)").as("approx")).collect().head
    val exact = r.getAs[Double]("exact")
    val approx = r.getAs[Double]("approx")
    // percentile_approx returns an actual data value; at accuracy 10000 it
    // must be within a tight relative band of the true median
    assert(math.abs(approx - exact) / exact < 0.01,
      s"approx $approx vs exact $exact")
  }

  test("bound-verdict operators: verdicts true on real data, rank-window logic on sparse tails") {
    import spark.implicits._
    val d = graft.functions.Approx.distinctWithBound(events, "event_type", "user_id")
      .collect()
    assert(d.nonEmpty && d.forall(_.getAs[Boolean]("within_bound")))

    // Sparse tail: 100 values where the top two order statistics are 1000x
    // apart in VALUE. A value-relative check would flag the sketch as broken
    // here even though its rank guarantee holds perfectly — the rank-window
    // verdict must pass.
    val sparse = ((1 to 99).map(_.toDouble) :+ 100000.0)
      .map(("g", _)).toDF("k", "v")
    val out = graft.functions.Approx.quantilesWithBound(sparse, "k", "v",
      qs = Seq(0.5, 0.99)).collect().head
    assert(out.getAs[Boolean]("p50_ok") && out.getAs[Boolean]("p99_ok"),
      s"rank-window verdicts must hold on a sparse tail: $out")
    assert(out.getAs[Long]("n") == 100L)

    // ...and a genuinely broken "sketch" would fail it: the window around
    // q=0.99 of 100 rows excludes rank 1, so a sketch answering the minimum
    // would get verdict false. Simulate by checking the window arithmetic:
    // lt=0, le=1 vs [(0.99-eps)*100-1, (0.99+eps)*100+1] ≈ [97.99, 100.01].
    // (The real sketch never does this; the assertion documents that the
    // verdict is falsifiable, not tautological.)
    assert(!(1.0 >= 0.99 * 100 - 1), "rank interval of the min must miss the p99 window")
  }

  test("heavy hitters: exact counts, threshold edge, null exclusion, skew superset") {
    import spark.implicits._
    // 1000 rows: "a" 400, "b" 100, "c" 5 (below 1/10), 495 distinct rares,
    // plus nulls that must not count toward n or emerge as keys
    val rows = Seq.fill(400)("a") ++ Seq.fill(100)("b") ++ Seq.fill(5)("c") ++
      (1 to 495).map(i => s"rare_$i") ++ Seq.fill(10)(null.asInstanceOf[String])
    // repartition(7): candidates must survive the per-partition MG merge
    val df = rows.toDF("k").repartition(7)
    val out = graft.functions.Approx.heavyHitters(df, "k", denom = 10L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // threshold = n/denom = 1000/10 = 100 — "b" sits EXACTLY on it (>=)
    assert(out == Map("a" -> 400L, "b" -> 100L))
    val share = graft.functions.Approx.heavyHitters(df, "k", denom = 10L)
      .filter(col("k") === "a").collect().head.getAs[Double]("share")
    assert(share == 0.4)

    // adversarial skew for the pigeonhole superset: one partition all-"hot",
    // the rest pure noise — MG must still surface "hot" from its partition
    val skew = spark.range(0, 500).selectExpr("'hot' AS k").repartition(1)
      .unionByName(spark.range(0, 4500).selectExpr("concat('z', id) AS k").repartition(9))
    val hot = graft.functions.Approx.heavyHitters(skew, "k", denom = 10L)
      .collect().map(_.getString(0)).toSet
    assert(hot == Set("hot"))
  }

  test("heavy hitters: over-budget denom is an error, not a silent weakening") {
    // beyond 100k counters the per-partition pass could silently drop true
    // heavy hitters at the 1/denom threshold — must throw, never degrade
    import spark.implicits._
    val df = Seq("a", "b").toDF("k")
    val e = intercept[IllegalArgumentException] {
      graft.functions.Approx.heavyHitters(df, "k", denom = 100001L)
    }
    assert(e.getMessage.contains("counter budget"))
  }

  test("HLL sketches MERGE: per-group sketches union to the global estimate") {
    // The property that matters at 100 TB: sketch once per partition/group,
    // merge upward (rollup, cross-day, cross-shard) without rescanning.
    val perType = events.groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val merged = perType.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect().head.getAs[Long]("est").toDouble
    val direct = events.agg(
      hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .collect().head.getAs[Long]("est").toDouble
    val exact = events.select(countDistinct(col("user_id"))).collect().head.getLong(0).toDouble
    assert(merged == direct,
      "union of per-group sketches must equal the single-pass sketch")
    assert(math.abs(merged - exact) / exact < 0.05,
      s"merged estimate $merged vs exact $exact")
  }

  test("overlapEstimate: exact pair intersections, zero-overlap pairs kept, bounds hold") {
    import spark.implicits._
    val rows =
      (1L to 100L).map(v => ("A", v)) ++
        (51L to 150L).map(v => ("B", v)) ++
        (200L to 210L).map(v => ("C", v)) ++
        Seq((null.asInstanceOf[String], 1L)) // NULL set drops
    val df = rows.toDF("src", "uid")
    val out = graft.functions.Approx.overlapEstimate(df, "src", "uid")
      .orderBy("set_a", "set_b")
      .select("set_a", "set_b", "n_a", "n_b", "n_inter", "jaccard")
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      ("A", "B", 100L, 100L, 50L, 50.0 / 150.0),
      ("A", "C", 100L, 11L, 0L, 0.0),
      ("B", "C", 100L, 11L, 0L, 0.0)),
      "exact sizes/intersections diverged (zero-overlap pairs must be rows, not gaps)")
    // the sketch verdict: at these cardinalities the Datasketches HLL is
    // in its exact (coupon) range, so every bound holds deterministically
    val verdicts = graft.functions.Approx.overlapEstimate(df, "src", "uid")
      .select("within_bound").as[Boolean].collect()
    assert(verdicts.forall(identity))
  }
}
