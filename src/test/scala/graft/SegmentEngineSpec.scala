package graft

import graft.model._
import graft.operators._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Core segment pipeline, exercised with the reference's own boundary
  * fixture shape (reference: backend/scripts/seed_filter_test_data.py:20-58):
  * one user with rows above/below the amount threshold and in/out of tier.
  */
class SegmentEngineSpec extends SparkSpec {
  import spark.implicits._

  private def tx(rows: (Long, Double, String, String, Int, String)*): DataFrame =
    rows.toDF("user_id", "amount", "ts_s", "category", "city_tier", "transaction_type")
      .withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")

  private val fixture = tx(
    (1L, 1500.0, "2024-01-05 10:00:00", "Electronics", 2, "UPI"),
    (1L, 2500.0, "2024-01-06 11:00:00", "Travel", 2, "UPI"),
    (1L, 900.0, "2024-01-07 12:00:00", "Dining", 2, "UPI"),     // below amount
    (1L, 3000.0, "2024-01-08 13:00:00", "Dining", 1, "CREDIT_CARD"),
    (2L, 50.0, "2024-01-09 14:00:00", "Groceries", 1, "UPI"))   // below amount

  test("base rule: amount filter + aggregate shape") {
    val out = SegmentEngine.materializeBase(fixture,
      Seq(Condition("transaction_amount", ">", "1000")))
    val rows = out.orderBy("user_id").collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("user_id") == 1L)
    assert(r.getAs[Long]("total_transactions") == 3L)
    assert(r.getAs[Double]("total_spent") == 7000.0)
    // sort_array(collect_set) ⇒ deterministic alphabetical order (SURVEY Q3)
    assert(r.getAs[String]("transaction_types") == "CREDIT_CARD,UPI")
  }

  test("HAVING routes on aggregates, WHERE pre-aggregation (Q8)") {
    val out = SegmentEngine.materializeBase(fixture, Seq(
      Condition("transaction_amount", ">", "1000"),
      Condition("total_spend", ">", "6000")))
    assert(out.select("user_id").as[Long].collect().toSeq == Seq(1L))
    val none = SegmentEngine.materializeBase(fixture, Seq(
      Condition("transaction_amount", ">", "1000"),
      Condition("total_spend", ">", "7500")))
    assert(none.count() == 0)
  }

  test("BETWEEN dates: intended vs faithful string comparison (Q2)") {
    val f = tx(
      (1L, 10.0, "2024-01-10 00:00:00", "a", 1, "UPI"),
      (1L, 10.0, "2024-01-20 12:00:00", "a", 1, "UPI"), // last day, afternoon
      (1L, 10.0, "2024-01-21 00:00:00", "a", 1, "UPI"))
    val cond = Seq(Condition.between("transaction_date", "2024-01-10", "2024-01-20"))
    val intended = SegmentEngine.materializeBase(f, cond).collect().head
    assert(intended.getAs[Long]("total_transactions") == 2L)
    // faithful: '2024-01-20 12:00:00' > '2024-01-20' lexicographically ⇒ excluded
    val faithful = SegmentEngine.materializeBase(f, cond,
      ConditionCompiler.Mode(faithfulDateStrings = true)).collect().head
    assert(faithful.getAs[Long]("total_transactions") == 1L)
  }

  test("malformed conditions silently skipped; fully-vacuous rule = all users (Q10)") {
    val compiled = ConditionCompiler.compile(Seq(
      Condition("bogus", ">", "1"),
      Condition("transaction_amount", "LIKE", "x"),
      Condition("transaction_amount", ">", "")))
    assert(compiled.isVacuous && compiled.skipped.size == 3)
    val out = SegmentEngine.materializeCompiled(fixture, compiled)
    assert(out.count() == 2) // both users
  }

  test("IN / NOT IN with typed casts") {
    val in = SegmentEngine.materializeBase(fixture,
      Seq(Condition.in("city_tier", Seq("1"))))
    assert(in.select("user_id").as[Long].collect().toSet == Set(1L, 2L))
    val notIn = SegmentEngine.materializeBase(fixture,
      Seq(Condition("city_tier", "NOT IN", CondValue.Many(Vector("1")))))
    assert(notIn.select("user_id").as[Long].collect().toSet == Set(1L))
  }

  test("operator whitelist parse: case-insensitive, whitespace-exact (reference skip parity)") {
    assert(CondOp.parse("not in").contains(CondOp.NotIn))
    assert(CondOp.parse("between").contains(CondOp.Between))
    assert(CondOp.parse("===").isEmpty)
    // rule_parser.py:51 checks `operator.upper() not in allowed` with no
    // trim/collapse — these are silently SKIPPED by the reference, so they
    // must be skipped here too or the engines compute different segments
    assert(CondOp.parse("not   in").isEmpty)
    assert(CondOp.parse(" > ").isEmpty)
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
