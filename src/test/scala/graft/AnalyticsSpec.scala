package graft

import graft.operators.{Analytics, Rollups}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def tx(rows: (Long, Double, String, String, Int)*): DataFrame =
    rows.toDF("user_id", "amount", "ts_s", "category", "city_tier")
      .withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")
      .withColumn("transaction_type", lit("UPI"))

  private val fixture = tx(
    (1L, 100.0, "2024-01-01 10:00:00", "Dining", 1),
    (1L, 50.0, "2024-01-01 11:00:00", "Dining", 2),
    (1L, 25.0, "2024-01-03 09:00:00", "Travel", 1),
    (2L, 200.0, "2024-01-03 12:00:00", "Travel", 2),
    (2L, 10.0, "2024-01-04 08:00:00", "Dining", 2))

  test("category totals: one pass, exact decimal sums (A3)") {
    val out = Analytics.categoryTotals(fixture).orderBy("category")
      .as[(String, Long, Double)].collect().toSeq
    assert(out == Seq(("Dining", 3L, 160.0), ("Travel", 2L, 225.0)))
  }

  test("daily totals zero-fill missing days from the spine (A4)") {
    val out = Analytics.dailyTotals(fixture, "2024-01-01", "2024-01-05")
      .orderBy("day").collect()
    assert(out.length == 5)
    val jan2 = out(1)
    assert(jan2.getAs[Long]("txn_count") == 0L)
    assert(jan2.getAs[Double]("total_amount") == 0.0)
    assert(out.map(_.getAs[Long]("txn_count")).sum == 5L)
  }

  test("interpolateDaily: gaps interpolate linearly, edges fill flat, empty input stays NULL") {
    // data on Jan 2 (150) and Jan 5 (210): Jan 1 back-fills, Jan 3/4
    // interpolate at 1/3 and 2/3 of the gap, Jan 6-7 forward-fill
    val sparse = tx(
      (1L, 100.0, "2024-01-02 10:00:00", "Dining", 1),
      (1L, 50.0, "2024-01-02 11:00:00", "Dining", 2),
      (2L, 210.0, "2024-01-05 12:00:00", "Travel", 2))
    val out = Analytics.interpolateDaily(sparse, "2024-01-01", "2024-01-07")
      .orderBy("day").collect()
    assert(out.length == 7)
    def filled(i: Int) = out(i).getAs[Double]("total_amount_filled")
    assert(filled(0) == 150.0, "leading edge back-fills the first value")
    assert(filled(1) == 150.0 && !out(1).getAs[Boolean]("interpolated"))
    assert(filled(2) == 150.0 + 60.0 * (1.0 / 3.0), "1/3 of the gap")
    assert(filled(3) == 150.0 + 60.0 * (2.0 / 3.0), "2/3 of the gap")
    assert(filled(4) == 210.0)
    assert(filled(5) == 210.0 && filled(6) == 210.0, "trailing edge forward-fills")
    assert(out(2).getAs[Boolean]("interpolated") &&
      out(2).getAs[Long]("txn_count") == 0L &&
      out(2).isNullAt(out(2).fieldIndex("total_amount_raw")))

    // an all-empty spine has no neighbor on either side: every fill is
    // NULL (never a fabricated number), every day marked interpolated
    val empty = Analytics.interpolateDaily(
      sparse.filter(lit(false)), "2024-01-01", "2024-01-03")
      .orderBy("day").collect()
    assert(empty.length == 3)
    assert(empty.forall(r => r.isNullAt(r.fieldIndex("total_amount_filled"))
      && r.getAs[Boolean]("interpolated") && r.getAs[Long]("txn_count") == 0L))
  }

  test("summary + top categories (A5/T1)") {
    val s = Analytics.summary(fixture).collect().head
    assert(s.getAs[Long]("total_transactions") == 5L)
    assert(s.getAs[Long]("active_users") == 2L)
    val top = Analytics.topCategories(fixture, 1).collect().head
    assert(top.getAs[String]("category") == "Travel") // 225 > 160
  }

  test("user search: filters, having, deterministic pagination (A7/T4)") {
    val page1 = Analytics.searchUsers(fixture,
      Analytics.UserSearch(minTransactions = 2L), page = 1, perPage = 1).collect()
    assert(page1.head.getAs[Long]("user_id") == 1L) // 3 txns beats 2
    val page2 = Analytics.searchUsers(fixture,
      Analytics.UserSearch(minTransactions = 2L), page = 2, perPage = 1).collect()
    assert(page2.head.getAs[Long]("user_id") == 2L)
    val tierOnly = Analytics.searchUsers(fixture,
      Analytics.UserSearch(cityTier = Some(1)), page = 1, perPage = 10).collect()
    assert(tierOnly.map(_.getAs[Long]("user_id")).toSet == Set(1L))
  }

  test("moving daily: RANGE frame ages gap days out of the window") {
    // type A: days 1, 2, then a GAP, then day 10 — the 3-day window at
    // day 10 must contain only day 10 (a ROWS frame would wrongly pull
    // days 1-2 across the gap)
    val ev = Seq(
      ("A", "2024-01-01 10:00:00", 10.0),
      ("A", "2024-01-02 10:00:00", 20.0),
      ("A", "2024-01-02 11:00:00", 5.0),
      ("A", "2024-01-10 10:00:00", 40.0),
      ("B", "2024-01-01 09:00:00", 1.0))
      .toDF("event_type", "ts_s", "value")
      .withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")
    val out = Rollups.movingDaily(ev, windowDays = 3)
      .orderBy("event_type", "day")
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      ("A", "2024-01-01", 1L, 1L, 10.0),
      ("A", "2024-01-02", 2L, 3L, 35.0),   // day 1 still inside the 3-day frame
      ("A", "2024-01-10", 1L, 1L, 40.0),   // gap aged days 1-2 out
      ("B", "2024-01-01", 1L, 1L, 1.0)))
  }

  test("funnel: first-touch step times, horizon bound, conversion fractions") {
    val ev = Seq(
      // user 1 completes all three steps inside the horizons
      (1L, "signup", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-03 10:00:00"),
      (1L, "purchase", "2024-01-05 10:00:00"),
      // user 2: click BEFORE signup must not count; the later one does
      (2L, "click", "2024-01-01 09:00:00"),
      (2L, "signup", "2024-01-02 10:00:00"),
      (2L, "click", "2024-01-04 10:00:00"),
      // user 2's purchase lands beyond 7 days after the qualifying click
      (2L, "purchase", "2024-01-20 10:00:00"),
      // user 3 signs up and never proceeds
      (3L, "signup", "2024-01-01 08:00:00"),
      // user 4 purchases without signup — never enters the funnel
      (4L, "purchase", "2024-01-02 10:00:00"))
      .toDF("user_id", "event_type", "ts_s")
      .withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")
    val out = Analytics.funnel(ev, Seq("signup", "click", "purchase"), 7)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(out.toSeq == Seq(
      (1L, "signup", 3L, Some(1.0)),
      (2L, "click", 2L, Some(2.0 / 3.0)),
      (3L, "purchase", 1L, Some(1.0 / 3.0))))
    // exactly-at-boundary event converts (<= horizon, not <)
    val edge = Seq(
      (9L, "signup", "2024-01-01 00:00:00"),
      (9L, "click", "2024-01-08 00:00:00"))
      .toDF("user_id", "event_type", "ts_s")
      .withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")
    val e = Analytics.funnel(edge, Seq("signup", "click"), 7).collect()
    assert(e(1).getLong(2) == 1L, "boundary event must convert")
    // an empty first step yields NULL conversions, never NaN
    val none = Analytics.funnel(edge.filter($"event_type" === "click"),
      Seq("signup", "click"), 7).collect()
    assert(none.forall(r => r.isNullAt(3)))
  }

  test("raw transaction listing: id-ordered pages + get-by-id (reference transactions.py)") {
    val raw = fixture.withColumn("transaction_id",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy($"ts")).cast("long"))
    val page1 = Analytics.listTransactions(raw, page = 1, perPage = 2)
      .select("transaction_id").as[Long].collect().toSeq
    val page2 = Analytics.listTransactions(raw, page = 2, perPage = 2)
      .select("transaction_id").as[Long].collect().toSeq
    assert(page1 == Seq(1L, 2L) && page2 == Seq(3L, 4L),
      "pages must be consecutive id-ordered slices")
    val one = Analytics.transactionById(raw, 3L).collect()
    assert(one.length == 1 && one.head.getAs[Double]("amount") == 25.0)
    assert(Analytics.transactionById(raw, 999L).isEmpty)
    // the sorted page is a top-k, not a global sort (scale contract)
    val plan = Analytics.listTransactions(raw, 1, 2).queryExecution
      .executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k page:\n$plan")

    // the real corpus reader: id column present, get-by-id pushes the
    // predicate into the parquet scan
    val corpus = graft.sources.Tables.transactionsWithId(spark, sf)
    assert(corpus.columns.head == "transaction_id")
    val byId = Analytics.transactionById(corpus, 7L)
    assert(byId.collect().length == 1)
    val scan = byId.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(event_id), EqualTo(event_id,7)"),
      s"id predicate must reach the scan:\n$scan")
  }

  test("windowed rollups: one-scan multi-window, favorite category mode (A6)") {
    // anchor = 2024-01-04; window 1 day ⇒ only Jan 3-4 rows; window 30 ⇒ all
    val out = Rollups.userWindows(fixture, Seq(1, 30))
      .orderBy("user_id", "period_days").collect()
    val u1w1 = out.find(r => r.getAs[Long]("user_id") == 1L && r.getAs[Int]("period_days") == 1).get
    assert(u1w1.getAs[Long]("total_transactions") == 1L) // only the Jan 3 Travel row
    assert(u1w1.getAs[String]("favorite_category") == "Travel")
    val u1w30 = out.find(r => r.getAs[Long]("user_id") == 1L && r.getAs[Int]("period_days") == 30).get
    assert(u1w30.getAs[Long]("total_transactions") == 3L)
    // tie Dining(2) vs Travel(1) → Dining; ties broken alphabetically
    assert(u1w30.getAs[String]("favorite_category") == "Dining")
    assert(u1w30.getAs[Int]("city_tier") == 2)
    assert(u1w30.getAs[java.sql.Date]("last_transaction_date").toString == "2024-01-03")
  }

  test("incremental rollup: day-partitioned upsert merges partials, recompose ≡ direct") {
    val dir = java.nio.file.Files.createTempDirectory("graft_incr_spec")
    try {
      val store = dir.resolve("daily").toString
      // seed with even users (u2: Jan 3, Jan 4), upsert odd (u1: Jan 1, Jan 3)
      // — Jan 3 is touched by both writes
      Rollups.writeDailyPartials(fixture.filter($"user_id" % 2 === 0), store)
      Rollups.upsertDailyPartials(fixture.filter($"user_id" % 2 =!= 0), store)
      val dayDirs = new java.io.File(store).listFiles
        .filter(_.isDirectory).map(_.getName).sorted.toSeq
      assert(dayDirs == Seq("day=2024-01-01", "day=2024-01-03", "day=2024-01-04"),
        s"one partition per event day, got $dayDirs")

      val direct = Rollups.userWindows(fixture, Seq(1, 30))
      val incr = Rollups.userWindowsFromDaily(spark.read.parquet(store), Seq(1, 30))
      assert(direct.exceptAll(incr).isEmpty && incr.exceptAll(direct).isEmpty,
        "recomposed windows must equal the direct rollup bit-for-bit")

      // third upsert re-sends user 1's rows into EXISTING keys through the
      // reliable-checkpoint barrier: same (user, day, category) partials
      // must SUM (5 + 3 rows), and the untouched Jan 4 partition (user 2
      // only) must survive the dynamic overwrite unmodified
      Rollups.upsertDailyPartials(fixture.filter($"user_id" === 1L), store,
        checkpointDir = Some(dir.resolve("ckpt").toString))
      val partials = spark.read.parquet(store)
      assert(partials.agg(sum($"cat_count")).as[Long].head == 8L)
      val jan1Dining = partials
        .filter($"day" === "2024-01-01" && $"user_id" === 1L && $"category" === "Dining")
        .collect()
      assert(jan1Dining.length == 1 &&
        jan1Dining.head.getAs[Long]("cat_count") == 4L &&
        jan1Dining.head.getAs[java.math.BigDecimal]("cat_amount").doubleValue == 300.0,
        "re-sent rows must sum into the existing partial, one row per key")
      assert(partials.filter($"day" === "2024-01-04")
        .agg(sum($"cat_count")).as[Long].head == 1L)
    } finally {
      java.nio.file.Files.walk(dir)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("incremental rollup: CONCURRENT upserts with distinct checkpoint dirs never misroute") {
    // The regression this pins: upsertDailyPartials used to call the
    // SparkContext-GLOBAL setCheckpointDir, so two concurrent upserts with
    // different dirs raced on it (last set wins) and could route each
    // other's checkpoint files. With the UUID-scoped graft.Materializer
    // each invocation owns a private subdir; both stores must come out
    // exactly as if upserted serially.
    val dir = java.nio.file.Files.createTempDirectory("graft_conc_spec")
    try {
      val storeA = dir.resolve("a").toString
      val storeB = dir.resolve("b").toString
      Rollups.writeDailyPartials(fixture.filter($"user_id" === 2L), storeA)
      Rollups.writeDailyPartials(fixture.filter($"user_id" === 2L), storeB)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val fa = Future(Rollups.upsertDailyPartials(
        fixture.filter($"user_id" === 1L), storeA,
        checkpointDir = Some(dir.resolve("ckptA").toString)))
      val fb = Future(Rollups.upsertDailyPartials(
        fixture.filter($"user_id" === 1L), storeB,
        checkpointDir = Some(dir.resolve("ckptB").toString)))
      Await.result(fa, 120.seconds); Await.result(fb, 120.seconds)
      for (store <- Seq(storeA, storeB)) {
        val direct = Rollups.userWindows(fixture, Seq(1, 30))
        val incr = Rollups.userWindowsFromDaily(spark.read.parquet(store), Seq(1, 30))
        assert(direct.exceptAll(incr).isEmpty && incr.exceptAll(direct).isEmpty,
          s"concurrent upsert corrupted $store")
      }
      // each invocation materialized under its OWN dir
      assert(new java.io.File(dir.resolve("ckptA").toString).listFiles.nonEmpty)
      assert(new java.io.File(dir.resolve("ckptB").toString).listFiles.nonEmpty)
    } finally {
      java.nio.file.Files.walk(dir)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("paged search envelope: total/total_pages count the full result, page slices it") {
    val p = Analytics.searchUsersPaged(fixture,
      Analytics.UserSearch(minTransactions = 1L), page = 2, perPage = 1)
    assert(p.total == 2L && p.totalPages == 2L && p.page == 2 && p.perPage == 1)
    val rows = p.rows.collect()
    assert(rows.length == 1 && rows.head.getAs[Long]("user_id") == 2L)
    p.release()
    intercept[IllegalArgumentException] {
      Analytics.searchUsersPaged(fixture, Analytics.UserSearch(), 1, 0)
    }
    intercept[IllegalArgumentException] {
      Analytics.searchUsers(fixture, Analytics.UserSearch(), 0, 10)
    }
  }

  test("sessionize: gap splits sessions, ties share one, aggregates are exact") {
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", 10.0),
      (1L, "2024-01-01 10:20:00", 20.0), // 20 min gap: same session
      (1L, "2024-01-01 10:20:00", 5.0),  // tie: must share the session
      (1L, "2024-01-01 11:30:00", 30.0), // 70 min gap: new session
      (2L, "2024-01-01 09:00:00", 1.0))
      .toDF("user_id", "ts_s", "value")
      .withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")
    val out = Analytics.sessionize(ev, 30).orderBy("user_id", "session_id").collect()
    assert(out.length == 3)
    val s1 = out(0)
    assert(s1.getAs[Long]("session_id") == 1L && s1.getAs[Long]("n_events") == 3L)
    assert(s1.getAs[Double]("total_value") == 35.0)
    assert(s1.getAs[java.sql.Timestamp]("session_end").toString.startsWith("2024-01-01 10:20"))
    val s2 = out(1)
    assert(s2.getAs[Long]("session_id") == 2L && s2.getAs[Long]("n_events") == 1L)
    assert(out(2).getAs[Long]("user_id") == 2L)
  }

  test("skew-safe sessionize: midnight-crossing sessions stitch, results equal unsplit") {
    // a session STRADDLING midnight (23:50 → 00:10, 20-min gap) is the case
    // the (user, day) pre-split must repair by stitching
    val ev = Seq(
      (1L, "2024-01-01 23:50:00", 10.0),
      (1L, "2024-01-02 00:10:00", 20.0), // crosses the chunk boundary, same session
      (1L, "2024-01-02 00:15:00", 5.0),
      (1L, "2024-01-02 09:00:00", 30.0), // new session next morning
      (2L, "2024-01-01 23:59:00", 1.0),
      (2L, "2024-01-02 00:05:00", 2.0))
      .toDF("user_id", "ts_s", "value")
      .withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")
    val out = Analytics.sessionizeSkewSafe(ev, 30)
      .orderBy("user_id", "session_id").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("n_events") == 3L &&
      out(0).getAs[Double]("total_value") == 35.0,
      "the midnight session must stitch back into one")
    assert(out(1).getAs[Long]("session_id") == 2L && out(1).getAs[Long]("n_events") == 1L)
    assert(out(2).getAs[Long]("user_id") == 2L && out(2).getAs[Long]("n_events") == 2L)

    // full equality with the unsplit path on the real corpus
    val events = graft.sources.Tables.events(spark, sf)
      .select($"user_id", $"ts", $"value")
    val plain = Analytics.sessionize(events, 30)
    val safe = Analytics.sessionizeSkewSafe(events, 30)
    assert(safe.exceptAll(plain).isEmpty && plain.exceptAll(safe).isEmpty,
      "pre-split + stitch must be a plan substitution, not an approximation")
  }

  test("segment sample enriched with user attributes broadcasts the sample side") {
    val seg = Seq((1L, 3L, 100.0, "UPI"), (2L, 1L, 50.0, "CC"))
      .toDF("user_id", "total_transactions", "total_spent", "transaction_types")
    val customers = Seq((1L, "Customer#000000001"), (2L, "Customer#000000002"),
      (3L, "Customer#000000003")).toDF("c_custkey", "c_name")
    val out = Analytics.sampleWithUsers(seg, customers, 1)
    val rows = out.collect()
    assert(rows.length == 1 && rows.head.getAs[String]("name") == "Customer#000000001")
    assert(rows.head.getAs[String]("email") == "customer.000000001@corp.example")
    // the n-row sample is the broadcast side; the customer dim never shuffles
    assert(out.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("daily anomalies: spike flags after a varied week, flat-week spike flags via the integer arm, calendar gap ages out") {
    val rows = scala.collection.mutable.Buffer[(Long, Double, String, String, Int)]()
    // A: counts 1,3,1,3,1,3,1 over Jan 1-7 (mean 13/7, σ>0), spike of 10 on Jan 8
    for (d <- 1 to 7; i <- 0 until (if (d % 2 == 1) 1 else 3))
      rows += ((1L, 1.0, f"2024-01-$d%02d 10:00:$i%02d", "A", 1))
    for (i <- 0 until 10) rows += ((1L, 1.0, f"2024-01-08 10:00:$i%02d", "A", 1))
    // C: perfectly flat Jan 1-8 (2/day), then 9 on Jan 9 → σ=0, z
    // undefined, but the integer flat-spike arm must still flag it
    for (d <- 1 to 8; i <- 0 until 2)
      rows += ((1L, 1.0, f"2024-01-$d%02d 11:00:$i%02d", "C", 1))
    for (i <- 0 until 9) rows += ((1L, 1.0, f"2024-01-09 11:00:$i%02d", "C", 1))
    // B: one event, then one 60 days later — the RANGE frame must be empty
    rows += ((1L, 1.0, "2024-01-01 09:00:00", "B", 1))
    rows += ((1L, 1.0, "2024-03-01 09:00:00", "B", 1))
    val out = Analytics.dailyAnomalies(tx(rows.toSeq: _*),
        window = 28, z = 3.0, minPrior = 7)
      .orderBy("category", "day").collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> r).toMap

    val a8 = out(("A", "2024-01-08"))
    val mean = 13.0 / 7.0
    val std = math.sqrt(math.max(0.0, 31.0 / 7.0 - mean * mean))
    assert(a8.getLong(3) == 7L)
    assert(a8.getDouble(4) == mean && a8.getDouble(5) == std)
    assert(a8.getDouble(6) == (10.0 - mean) / std && a8.getBoolean(7))
    // day 1 is a cold start: no stats, never flagged
    val a1 = out(("A", "2024-01-01"))
    assert(a1.getLong(3) == 0L && a1.isNullAt(4) && !a1.getBoolean(7))
    // flat week: σ=0, zscore NULL, integer arm flags the departure
    val c9 = out(("C", "2024-01-09"))
    assert(c9.getDouble(5) == 0.0 && c9.isNullAt(6) && c9.getBoolean(7))
    // a flat-series day that MATCHES the flat rate (σ=0, n·x = Σ) stays
    // unflagged — the integer arm flags departures only
    val c8 = out(("C", "2024-01-08"))
    assert(c8.getLong(3) == 7L && c8.getDouble(5) == 0.0 && !c8.getBoolean(7))
    // 60-day gap: the RANGE frame is empty, not "previous 28 rows"
    val b2 = out(("B", "2024-03-01"))
    assert(b2.getLong(3) == 0L && !b2.getBoolean(7))
  }
}
