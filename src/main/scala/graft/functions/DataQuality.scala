package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass data-quality validation — the gate a training pipeline runs
  * before a corpus batch is allowed downstream (null screens, key
  * uniqueness, value ranges, volume floors).
  *
  * All requested checks evaluate in a SINGLE aggregate job over one scan:
  * each check contributes one aggregate expression, the one-row result is
  * exploded back into a (check, metric, passed) row per check. Cost at
  * 100 TB is therefore exactly one pass over the data regardless of how
  * many checks are registered — never one job per check.
  */
object DataQuality {

  /** One named check: an aggregate metric and a pass predicate over it. */
  final case class Check(name: String, metric: Column, pass: Column => Column)

  /** Fraction of non-null values in `c` must be ≥ `atLeast`. */
  def completeness(c: String, atLeast: Double): Check =
    Check(s"completeness($c)",
      count(col(c)).cast("double") / count(lit(1)),
      _ >= atLeast)

  /** Fraction of distinct values of `c` (among non-null rows) must be ≥
    * `atLeast`; 1.0 demands a unique key.
    */
  def uniqueness(c: String, atLeast: Double): Check =
    Check(s"uniqueness($c)",
      countDistinct(col(c)).cast("double") / count(col(c)),
      _ >= atLeast)

  /** Minimum of `c` must be ≥ `lo`. */
  def minBound(c: String, lo: Double): Check =
    Check(s"min($c)", min(col(c)).cast("double"), _ >= lo)

  /** Maximum of `c` must be ≤ `hi`. */
  def maxBound(c: String, hi: Double): Check =
    Check(s"max($c)", max(col(c)).cast("double"), _ <= hi)

  /** Row count must be ≥ `n` (volume floor for an ingest batch). */
  def minRows(n: Long): Check =
    Check("row_count", count(lit(1)).cast("double"), _ >= n.toDouble)

  /** Evaluate all checks in one aggregate pass.
    * Output: (check, metric, passed), one row per check, in input order.
    */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "at least one check")
    val agged = df.agg(
      checks.head.metric.as("m0"),
      checks.tail.zipWithIndex.map { case (c, i) => c.metric.as(s"m${i + 1}") }: _*)
    val rows = array(checks.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c.name).as("check_name"),
        col(s"m$i").as("metric"),
        c.pass(col(s"m$i")).as("passed"))
    }: _*)
    agged.select(explode(rows).as("r")).select("r.*")
  }
}
