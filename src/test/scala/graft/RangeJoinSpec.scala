package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

/** Range-join semantics on a hand-checked fixture plus a randomized
  * cross-check against the brute-force theta-join it replaces.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  test("points match every containing interval, inclusive bounds, keyed") {
    val points = Seq(
      ("a", t("2024-01-01 10:00:00")), // on a start bound
      ("a", t("2024-01-01 10:30:00")), // inside iv1 and iv2 (overlap)
      ("a", t("2024-01-01 11:00:00")), // on iv1's end bound
      ("a", t("2024-01-01 23:00:00")), // outside all
      ("b", t("2024-01-01 10:30:00"))) // other key: only iv3
      .toDF("k", "pt")
    val intervals = Seq(
      ("a", t("2024-01-01 10:00:00"), t("2024-01-01 11:00:00"), "iv1"),
      ("a", t("2024-01-01 10:15:00"), t("2024-01-01 12:00:00"), "iv2"),
      ("b", t("2024-01-01 10:00:00"), t("2024-01-01 11:00:00"), "iv3"))
      .toDF("k", "s", "e", "iv")

    val out = RangeJoin.pointInInterval(points, intervals,
        Seq("k"), "pt", "s", "e", bucketWidthSec = 1800L)
      .select("k", "pt", "iv").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString, r.getString(2)))
      .toSet
    assert(out == Set(
      ("a", "2024-01-01 10:00:00.0", "iv1"),
      ("a", "2024-01-01 10:30:00.0", "iv1"),
      ("a", "2024-01-01 10:30:00.0", "iv2"),
      ("a", "2024-01-01 11:00:00.0", "iv1"), // inclusive end
      ("a", "2024-01-01 11:00:00.0", "iv2"),
      ("b", "2024-01-01 10:30:00.0", "iv3")))
  }

  test("bucketized result == brute-force theta join on randomized data") {
    val rnd = new scala.util.Random(42)
    val base = t("2024-01-01 00:00:00").getTime
    val points = (1 to 200).map { i =>
      (s"k${rnd.nextInt(3)}", new java.sql.Timestamp(base + rnd.nextInt(86400) * 1000L), i)
    }.toDF("k", "pt", "pid")
    val intervals = (1 to 40).map { i =>
      val s = base + rnd.nextInt(86400) * 1000L
      (s"k${rnd.nextInt(3)}", new java.sql.Timestamp(s),
        new java.sql.Timestamp(s + (300 + rnd.nextInt(7200)) * 1000L), i)
    }.toDF("k", "s", "e", "ivid")

    val bucketized = RangeJoin.pointInInterval(points, intervals,
        Seq("k"), "pt", "s", "e", bucketWidthSec = 3600L)
      .select("pid", "ivid").as[(Int, Int)].collect().toSet
    val brute = points.join(intervals, "k")
      .filter($"pt" >= $"s" && $"pt" <= $"e")
      .select("pid", "ivid").as[(Int, Int)].collect().toSet
    assert(bucketized == brute && brute.nonEmpty)
  }
}
