package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join — the second time-travel operator Spark
  * has no built-in for (sibling of [[AsOf]]): match each point to every
  * interval `[start, end]` (inclusive) that contains it, sharing the same
  * key columns.
  *
  * The naive plan — equi-join on keys with a range predicate, or worse a
  * pure theta-join — degenerates to per-key cartesian work the moment keys
  * are hot (Catalyst runs the range predicate as a post-join filter). This
  * is the bucketized shape instead: intervals explode to the fixed-width
  * time buckets they cover, points compute their single bucket, and the
  * join is a plain hash equi-join on (keys, bucket) with an exact
  * containment filter behind it. Each qualifying (point, interval) pair
  * arises from EXACTLY ONE bucket — the one containing the point — so no
  * dedup pass is needed. Cost: O(|intervals| × length/width + |points|)
  * join rows, tunable via `bucketWidthSec` (pick ≳ the typical interval
  * length; a too-small width multiplies interval replication, a too-large
  * width multiplies false candidates).
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], pointTime: String, start: String, end: String,
      bucketWidthSec: Long): DataFrame = {
    require(bucketWidthSec > 0, "bucketWidthSec must be positive")
    // epochSeconds (not cast("long")) so TIMESTAMP_NTZ time columns work
    // too — see graft.sources.Tables.epochSeconds
    val p = points.withColumn("__bucket",
      floor(graft.sources.Tables.epochSeconds(col(pointTime)) / bucketWidthSec))
    val iv = intervals.withColumn("__bucket",
      explode(sequence(
        floor(graft.sources.Tables.epochSeconds(col(start)) / bucketWidthSec),
        floor(graft.sources.Tables.epochSeconds(col(end)) / bucketWidthSec))))
    p.join(iv, keys :+ "__bucket")
      .filter(col(pointTime) >= col(start) && col(pointTime) <= col(end))
      .drop("__bucket")
  }
}
