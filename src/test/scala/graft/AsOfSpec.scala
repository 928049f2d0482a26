package graft

import graft.operators.AsOf
import org.apache.spark.sql.functions._

/** As-of join semantics on a hand-checked fixture: latest-at-or-before
  * pick, equal-time visibility, deterministic tie-break, null when nothing
  * precedes, and the no-range-explosion plan shape.
  */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  test("picks latest right row at-or-before each left time, per key") {
    val quotes = Seq(
      (1L, t("2024-01-01 10:00:00"), 100L, 10.0),
      (1L, t("2024-01-01 12:00:00"), 101L, 12.0),
      (1L, t("2024-01-01 12:00:00"), 102L, 13.0), // equal time: 102 wins (tie)
      (2L, t("2024-01-01 11:00:00"), 200L, 99.0))
      .toDF("key", "qt", "qid", "price")
    val trades = Seq(
      (1L, t("2024-01-01 09:00:00"), "before-any"),
      (1L, t("2024-01-01 10:30:00"), "after-first"),
      (1L, t("2024-01-01 12:00:00"), "equal-time"),
      (1L, t("2024-01-01 23:00:00"), "after-all"),
      (2L, t("2024-01-01 11:30:00"), "other-key"))
      .toDF("key", "tt", "label")

    val out = AsOf.asofJoin(trades, quotes, "key", "tt", "qt",
      pick = Seq("price"), tieBreak = "qid")
      .select("label", "asof_price").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap

    assert(out("before-any").isEmpty, "no quote precedes -> null")
    // a null right time must not become anyone's match (it would sort
    // nulls-first and shadow the no-predecessor null contract)
    val withNull = quotes.unionByName(
      Seq((1L, null.asInstanceOf[java.sql.Timestamp], 999L, -1.0))
        .toDF("key", "qt", "qid", "price"))
    val out2 = AsOf.asofJoin(trades, withNull, "key", "tt", "qt",
      pick = Seq("price"), tieBreak = "qid")
      .select("label", "asof_price").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out2("before-any").isEmpty && out2("after-first").contains(10.0))
    assert(out("after-first").contains(10.0))
    assert(out("equal-time").contains(13.0), "equal time visible, max qid wins")
    assert(out("after-all").contains(13.0))
    assert(out("other-key").contains(99.0), "keys never leak")
  }

  test("asof result == brute-force argmax join on randomized data") {
    val rnd = new scala.util.Random(7)
    val base = t("2024-01-01 00:00:00").getTime
    val trades = (1 to 300).map { i =>
      (s"k${rnd.nextInt(4)}", new java.sql.Timestamp(base + rnd.nextInt(86400) * 1000L), i)
    }.toDF("key", "tt", "pid")
    // duplicate right times on purpose: the tie-break must decide
    val quotes = (1 to 80).map { i =>
      (s"k${rnd.nextInt(4)}",
        new java.sql.Timestamp(base + rnd.nextInt(24) * 3600L * 1000L), i.toLong, i * 1.5)
    }.toDF("key", "qt", "qid", "price")

    val got = AsOf.asofJoin(trades, quotes, "key", "tt", "qt",
        pick = Seq("price"), tieBreak = "qid")
      .select("pid", "asof_price").collect()
      .map(r => r.getInt(0) -> Option(r.get(1))).toMap

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"pid").orderBy($"qt".desc, $"qid".desc)
    val brute = trades.join(quotes, Seq("key"), "left")
      .filter($"qt".isNull || $"qt" <= $"tt")
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select("pid", "price").collect()
      .map(r => r.getInt(0) -> Option(r.get(1))).toMap
    // brute's left join drops trades whose every quote is later; they're null
    val expected = (1 to 300).map(i => i -> brute.getOrElse(i, None)).toMap
    assert(got == expected)
  }

  test("plan is union + single window, not a range join") {
    val l = spark.range(10).select($"id".as("key"),
      lit(t("2024-01-01 10:00:00")).as("lt"))
    val r = spark.range(10).select($"id".as("key"),
      lit(t("2024-01-01 09:00:00")).as("rt"), $"id".as("rid"), $"id".as("v"))
    val plan = AsOf.asofJoin(l, r, "key", "lt", "rt", Seq("v"), "rid")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window") && plan.contains("Union"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }
}
