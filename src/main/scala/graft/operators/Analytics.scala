package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Analytics read paths (reference: backend/app/utils/aggregates.py).
  *
  * The reference runs each of these twice (once per source table) and merges
  * dicts in Python; here the union-first unified view collapses that into a
  * single declarative plan — one scan, one shuffle, map-side partial
  * aggregation, all inside whole-stage codegen.
  */
object Analytics {

  private def exactAmount: Column = col("amount").cast(Tables.MoneyExact)
  private def money(c: Column): Column = Tables.moneyOut(c)

  /** A3: per-category transaction count + spend
    * (reference aggregates.py:24-53; the UPI/CC dict-merge disappears).
    */
  def categoryTotals(tx: DataFrame): DataFrame =
    tx.groupBy(col("category"))
      .agg(
        count(lit(1)).as("txn_count"),
        money(sum(exactAmount)).as("total_amount"))

  /** A4: daily totals over [start, end], zero-filled for missing days from a
    * generated date spine (reference aggregates.py:57-106, Python zero-fill
    * at :91-96). The aggregated side is tiny (one row per day) and is the
    * build side of the left-outer join, so the broadcast hint is honorable
    * there — hinting the row-preserving left side of an outer join would be
    * ignored.
    */
  def dailyTotals(tx: DataFrame, start: String, end: String): DataFrame = {
    val spark = tx.sparkSession
    val spine = spark.range(1).select(
      explode(sequence(
        lit(java.sql.Date.valueOf(start)),
        lit(java.sql.Date.valueOf(end)),
        expr("INTERVAL 1 DAY"))).as("day"))
    val agged = tx
      .filter(to_date(col("ts")).between(
        lit(java.sql.Date.valueOf(start)), lit(java.sql.Date.valueOf(end))))
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        count(lit(1)).as("txn_count"),
        money(sum(exactAmount)).as("total_amount"))
    spine.join(broadcast(agged), Seq("day"), "left")
      .select(
        col("day"),
        coalesce(col("txn_count"), lit(0L)).as("txn_count"),
        coalesce(col("total_amount"), money(lit(0))).as("total_amount"))
  }

  /** GAP-FILLED daily series: the date-spine daily totals with missing
    * days LINEARLY INTERPOLATED between the nearest present neighbors
    * (forward/back-filled at the edges) — the series a dashboard or a
    * downstream model consumes when ingest has holes. The interpolation
    * weight is a ratio of exact integer day differences and the fill is
    * one fixed IEEE tree (pv + (nv − pv)·fr), so results are
    * engine-bit-deterministic. The window runs over the CALENDAR spine —
    * |days| rows regardless of corpus size (the one deliberate
    * single-partition window in the library; a year is 365 rows) — while
    * the corpus collapses in the same per-day aggregate dailyTotals uses.
    *
    * Output: (day, txn_count, total_amount_raw — NULL on gap days,
    * total_amount_filled, interpolated).
    */
  def interpolateDaily(tx: DataFrame, start: String, end: String): DataFrame = {
    val spark = tx.sparkSession
    val spine = spark.range(1).select(
      explode(sequence(
        lit(java.sql.Date.valueOf(start)),
        lit(java.sql.Date.valueOf(end)),
        expr("INTERVAL 1 DAY"))).as("day"))
    val agged = tx
      .filter(to_date(col("ts")).between(
        lit(java.sql.Date.valueOf(start)), lit(java.sql.Date.valueOf(end))))
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        count(lit(1)).as("txn_count"),
        money(sum(exactAmount)).as("amt"))
    val joined = spine.join(broadcast(agged), Seq("day"), "left")
    val present = when(col("amt").isNotNull,
      struct(col("day").as("d"), col("amt").as("v")))
    val W = org.apache.spark.sql.expressions.Window
    val wPrev = W.orderBy(col("day")).rowsBetween(W.unboundedPreceding, -1)
    val wNext = W.orderBy(col("day")).rowsBetween(1, W.unboundedFollowing)
    val marked = joined
      .withColumn("__p", last(present, ignoreNulls = true).over(wPrev))
      .withColumn("__n", first(present, ignoreNulls = true).over(wNext))
    val fr = datediff(col("day"), col("__p.d")).cast("double") /
      datediff(col("__n.d"), col("__p.d")).cast("double")
    val filled = when(col("amt").isNotNull, col("amt"))
      .when(col("__p").isNotNull && col("__n").isNotNull,
        col("__p.v") + (col("__n.v") - col("__p.v")) * fr)
      .when(col("__p").isNotNull, col("__p.v"))
      .otherwise(col("__n.v"))
    marked.select(
      col("day"),
      coalesce(col("txn_count"), lit(0L)).as("txn_count"),
      col("amt").as("total_amount_raw"),
      filled.as("total_amount_filled"),
      col("amt").isNull.as("interpolated"))
  }

  /** Trailing-window ANOMALY detection over the per-category daily event
    * series (the monitoring read an operations team points at a metric):
    * each (category, day)'s event count is scored against the mean/σ of
    * the previous `window` CALENDAR days — a RANGE frame over the
    * epoch-day index, so gaps in the series widen the lookback correctly
    * instead of sliding a row count across them. Every window statistic is
    * an INTEGER sum (count, Σcnt, Σcnt²) — order-free across partitions
    * and bit-equal in any engine — and the z-score is one fixed IEEE
    * double tree on top; a day flags when |z| > `z` with at least
    * `minPrior` prior days observed (cold starts stay unflagged, not
    * false-positive).
    *
    * Scale shape: one (category, day) hash aggregate collapses the corpus
    * to a calendar-bounded series (|categories| × |days| rows regardless
    * of corpus size); the window runs over that tiny frame. At 100 TB the
    * scan dominates and the anomaly pass is free.
    */
  def dailyAnomalies(tx: DataFrame, window: Int = 28, z: Double = 3.0,
      minPrior: Int = 7): DataFrame = {
    require(window >= minPrior && minPrior >= 1, "window >= minPrior >= 1")
    val daily = tx
      .groupBy(col("category"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("category"))
      .orderBy(unix_date(col("day")))
      .rangeBetween(-window, -1)
    val stats = daily
      .withColumn("n_prior", count(col("n_events")).over(w))
      .withColumn("__s", sum(col("n_events")).over(w))
      .withColumn("__ss", sum(col("n_events") * col("n_events")).over(w))
    val enough = col("n_prior") >= minPrior
    val nD = col("n_prior").cast("double")
    val mean = col("__s").cast("double") / nD
    val variance = col("__ss").cast("double") / nD - mean * mean
    val std = sqrt(greatest(lit(0.0), variance))
    val zscore = when(enough && std > 0,
      (col("n_events").cast("double") - mean) / std)
    // σ = 0 (perfectly flat lookback) leaves the z-score undefined, but a
    // departure from a flat series IS the clearest anomaly — flag it via
    // the exact integer comparison n·x ≠ Σ (no float in the verdict)
    val flatSpike = enough && std === lit(0.0) &&
      (col("n_events") * col("n_prior")) =!= col("__s")
    stats.select(
      col("category"), col("day"), col("n_events"),
      col("n_prior"),
      when(enough, mean).as("mean_prior"),
      when(enough, std).as("std_prior"),
      zscore.as("zscore"),
      (coalesce(abs(zscore) > lit(z), lit(false)) || flatSpike)
        .as("is_anomaly"))
  }

  /** A5: one-row global summary (reference aggregates.py:108-132). */
  def summary(tx: DataFrame): DataFrame =
    tx.agg(
      count(lit(1)).as("total_transactions"),
      money(sum(exactAmount)).as("total_amount"),
      countDistinct(col("user_id")).as("active_users"))

  /** T1: top-k categories by total spend; deterministic tie-break on the
    * category name (reference aggregates.py:121-125 sorts in Python).
    */
  def topCategories(tx: DataFrame, k: Int): DataFrame =
    categoryTotals(tx)
      .orderBy(col("total_amount").desc, col("category"))
      .limit(k)

  /** A7/T4: filtered user search with HAVING + deterministic pagination
    * (reference aggregates.py:136-225; pagination needs an explicit sort key
    * — the reference paginates an unsorted query, which is nondeterministic).
    */
  final case class UserSearch(
      minAmount: Option[Double] = None,
      cityTier: Option[Int] = None,
      category: Option[String] = None,
      dateFrom: Option[String] = None,
      dateTo: Option[String] = None,
      minTransactions: Long = 1L)

  def searchUsers(tx: DataFrame, s: UserSearch, page: Int, perPage: Int): DataFrame = {
    require(page >= 1 && perPage >= 1, s"page=$page perPage=$perPage must be >= 1")
    searchAggregate(tx, s)
      .orderBy(col("total_transactions").desc, col("user_id"))
      .offset((page - 1) * perPage)
      .limit(perPage)
  }

  /** The full filtered/aggregated/HAVING-gated result the search pages
    * over (shared by the page fetch and the envelope's total count).
    */
  private def searchAggregate(tx: DataFrame, s: UserSearch): DataFrame = {
    val filters = Seq(
      s.minAmount.map(v => col("amount") >= lit(v)),
      s.cityTier.map(v => col("city_tier") === lit(v)),
      s.category.map(v => col("category") === lit(v)),
      s.dateFrom.map(v => to_date(col("ts")) >= lit(java.sql.Date.valueOf(v))),
      s.dateTo.map(v => to_date(col("ts")) <= lit(java.sql.Date.valueOf(v)))).flatten
    filters.foldLeft(tx)(_.filter(_))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("total_transactions"),
        money(sum(exactAmount)).as("total_spent"))
      .filter(col("total_transactions") >= lit(s.minTransactions))
  }

  /** Paginated response envelope — the library-level analog of the
    * reference's API wrapper (reference backend/app/utils/response.py:5
    * and the paginated rule listing, backend/app/api/rules.py:83-106):
    * one page of search results plus the metadata an API surfaces
    * (total matching rows, page, per_page, total_pages).
    *
    * Two jobs by construction: the total is a count over the full filtered
    * aggregate, the page is a sorted offset/limit. Folding both into one
    * pass would need a global window (single-partition — the opposite of
    * scale), so instead the shared aggregate is PERSISTED: the count job
    * materializes it, the page job reads the cached partitions — one scan
    * of the source, and both numbers describe the same snapshot (a source
    * rewritten between the two jobs cannot make total and page disagree).
    * Call `release()` when done with the envelope.
    */
  final case class PagedResult(
      total: Long, page: Int, perPage: Int, totalPages: Long, rows: DataFrame,
      private val cached: DataFrame) {
    /** Drop the persisted aggregate backing `rows`. */
    def release(): Unit = { cached.unpersist(); () }
  }

  def searchUsersPaged(tx: DataFrame, s: UserSearch,
      page: Int, perPage: Int): PagedResult = {
    require(page >= 1 && perPage >= 1, s"page=$page perPage=$perPage must be >= 1")
    val agg = searchAggregate(tx, s).persist()
    val total = agg.count()
    val rows = agg
      .orderBy(col("total_transactions").desc, col("user_id"))
      .offset((page - 1) * perPage)
      .limit(perPage)
    PagedResult(total, page, perPage, (total + perPage - 1) / perPage, rows, agg)
  }

  /** Raw-transaction listing — the reference's paginated per-source
    * transaction endpoints (backend/app/api/transactions.py:7-23): a
    * deterministic id-ordered page over a raw transaction frame (use
    * [[graft.sources.Tables.transactionsWithId]]). Page order is the
    * source id, matching SQLAlchemy's default `.query` order on the
    * primary key; at scale the sorted page is a TakeOrderedAndProject
    * (limit pushed into the scan-side top-k), never a global sort.
    */
  def listTransactions(tx: DataFrame, page: Int, perPage: Int,
      idCol: String = "transaction_id"): DataFrame = {
    require(page >= 1 && perPage >= 1, s"page=$page perPage=$perPage must be >= 1")
    tx.orderBy(col(idCol)).offset((page - 1) * perPage).limit(perPage)
  }

  /** Get-by-id (reference transactions.py:25-35): zero or one row; the id
    * predicate pushes down to the scan.
    */
  def transactionById(tx: DataFrame, id: Long,
      idCol: String = "transaction_id"): DataFrame =
    tx.filter(col(idCol) === lit(id))

  /** Event FUNNEL: for an ordered list of step event types, how many users
    * complete each step within `horizonDays` of completing the previous one
    * (first-touch semantics: a user's step-k time is their EARLIEST
    * qualifying occurrence after step k-1). The classic product-analytics
    * conversion funnel — strict order, bounded window, one row per step
    * with the conversion fraction against step 1.
    *
    * Scale shape: one user_id hash-aggregate per step plus one
    * co-partitioned user_id join per transition — every shuffle is on the
    * same key, so the exchanges reuse partitioning; the result is k rows.
    * Determinism: timestamps and counts are exact; the only double is the
    * final conversion division (NULL when step 1 is empty, never NaN).
    */
  def funnel(events: DataFrame, steps: Seq[String], horizonDays: Int,
      typeCol: String = "event_type", tsCol: String = "ts",
      userCol: String = "user_id"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(horizonDays > 0, "horizon must be positive")
    val horizon = expr(s"INTERVAL $horizonDays DAYS")
    var cur = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t"))
    var rows = Vector(cur.agg(count(lit(1)).as("n_users"))
      .select(lit(1L).as("step"), lit(steps.head).as("event_type"),
        col("n_users")))
    steps.zipWithIndex.drop(1).foreach { case (st, i) =>
      cur = events.filter(col(typeCol) === st).as("e")
        .join(cur.as("p"), col(s"e.$userCol") === col(s"p.$userCol"))
        .filter(col(s"e.$tsCol") >= col("p.t") &&
          col(s"e.$tsCol") <= col("p.t") + horizon)
        .groupBy(col(s"e.$userCol")).agg(min(col(s"e.$tsCol")).as("t"))
      rows :+= cur.agg(count(lit(1)).as("n_users"))
        .select(lit((i + 1).toLong).as("step"), lit(st).as("event_type"),
          col("n_users"))
    }
    val first = rows.head.select(col("n_users").as("__n_first"))
    rows.reduce(_.unionByName(_))
      .crossJoin(broadcast(first))
      .select(col("step"), col("event_type"), col("n_users"),
        when(col("__n_first") > 0,
          col("n_users").cast("double") / col("__n_first").cast("double"))
          .as("conv_from_first"))
      .orderBy("step")
  }

  /** Retention cohorts over the raw event stream: users grouped by their
    * first-activity day, counted on each later activity day as an offset
    * from the cohort day. Integer-only output (days, counts) —
    * cross-engine deterministic. Two shuffles, both on user_id first
    * (cohort derivation + distinct activity days share the partitioning),
    * then a small (cohort, offset) aggregate.
    */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val firstDay = events.groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("cohort_day"))
    val activeDays = events
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    activeDays.join(firstDay, "user_id")
      .groupBy(col("cohort_day"),
        datediff(col("d"), col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Gap-based sessionization of the raw event stream: consecutive events
    * of one user belong to the same session while the gap between them is
    * ≤ `gapMinutes`; a longer gap starts a new session. The classic
    * two-window shape — boundary flag via `lag`, session index via a
    * running sum of flags — then one aggregate per (user, session).
    *
    * Scale: a single shuffle on user_id; both window functions and the
    * final aggregate reuse that partitioning (per-user session counts are
    * small, so the groupBy keys don't explode). Deterministic under
    * timestamp ties: the boundary flag lands on exactly one row of a tie
    * group, and the running sum's default RANGE frame gives every peer row
    * the same session index on any engine, so tied events always share a
    * session.
    */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"))
    val prevTs = lag(col("ts"), 1).over(byUser)
    // microsecond-exact gap compare (ts carries sub-second precision;
    // truncating to seconds would move boundaries)
    val newSession = when(
      prevTs.isNull ||
        Tables.epochMicros(col("ts")) - Tables.epochMicros(prevTs) > gapMinutes * 60L * 1000000L,
      1L).otherwise(0L)
    events
      .withColumn("__new", newSession)
      .withColumn("session_id", sum(col("__new")).over(byUser))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        money(sum(col("value").cast(Tables.MoneyExact))).as("total_value"))
  }

  /** Skew-safe [[sessionize]]: identical results, bounded per-task sort.
    *
    * The plain shape sorts each user's ENTIRE history in one task — a bot
    * user with 2M events means a 2M-row serial sort no matter how many
    * executors are idle (the documented skew bound, SCALE.md). Here events
    * are first sessionized within (user, day) chunks — the window sort is
    * bounded by one user-DAY, and a hot key's days spread across the
    * cluster — then the per-chunk sessions (thousands of times fewer rows
    * than events) are stitched with the same gap rule: a chunk-local
    * session merges into its predecessor iff the gap from the previous
    * session's end to its start is within the threshold, which across a
    * chunk boundary is exactly the event gap the unsplit path would have
    * tested, and within a chunk was already tested locally. Counts and
    * value sums recompose from unrounded decimal partials, so the merged
    * aggregates are bit-identical to the unsplit path's.
    *
    * Requires `gapMinutes` < 24h: chunks a full gap apart can never need
    * merging, so day granularity loses nothing.
    */
  def sessionizeSkewSafe(events: DataFrame, gapMinutes: Int): DataFrame = {
    require(gapMinutes > 0 && gapMinutes < 24 * 60,
      "pre-split granularity (1 day) must exceed the session gap")
    val gapUs = gapMinutes * 60L * 1000000L

    val chunkW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("__day")).orderBy(col("ts"))
    val prevTs = lag(col("ts"), 1).over(chunkW)
    val newLocal = when(
      prevTs.isNull ||
        Tables.epochMicros(col("ts")) - Tables.epochMicros(prevTs) > gapUs,
      1L).otherwise(0L)
    val local = events
      .withColumn("__day", to_date(col("ts")))
      .withColumn("__new", newLocal)
      .withColumn("__ls", sum(col("__new")).over(chunkW))
      .groupBy(col("user_id"), col("__day"), col("__ls"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(Tables.MoneyExact)).as("__val"))

    // stitch pass: same lag + running-sum shape over the per-chunk sessions
    // (per-user session counts are small — this window is cheap even for
    // the hottest key)
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("session_start"))
    val prevEnd = lag(col("session_end"), 1).over(byUser)
    val newGlobal = when(
      prevEnd.isNull ||
        Tables.epochMicros(col("session_start")) - Tables.epochMicros(prevEnd) > gapUs,
      1L).otherwise(0L)
    local
      .withColumn("__new", newGlobal)
      .withColumn("session_id", sum(col("__new")).over(byUser))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("session_start")).as("session_start"),
        max(col("session_end")).as("session_end"),
        sum(col("n_events")).as("n_events"),
        money(sum(col("__val"))).as("total_value"))
  }

  /** Segment sample enriched with user attributes — the reference's
    * `sample_data` endpoint (reference backend/app/api/segments.py:84-117,
    * `LIMIT 10` over the segment table) joined to the user dimension it
    * surfaces alongside (name/email). Deterministic first-n by user_id
    * (the reference's bare LIMIT is order-undefined), then the n-row
    * sample BROADCASTS into the customer dimension — the big side never
    * shuffles. Email is derived from the corpus customer name (the
    * TPC-H-ish dim carries no email column).
    */
  def sampleWithUsers(segment: DataFrame, customers: DataFrame, n: Int): DataFrame =
    broadcast(segment.orderBy("user_id").limit(n))
      .join(customers, col("user_id") === col("c_custkey"))
      .select(
        col("user_id"),
        col("c_name").as("name"),
        concat(lower(translate(col("c_name"), "#", ".")), lit("@corp.example"))
          .as("email"),
        col("total_transactions"), col("total_spent"), col("transaction_types"))
      .orderBy("user_id")
}
