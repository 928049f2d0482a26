package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-ORDER (Morton-curve) clustering.
  *
  * A 100 TB table can be SORTED by only one key; a query box over two
  * dimensions (user × day, region × time, …) then prunes on the sort key
  * alone and scans every file for the other dimension. Interleaving the
  * key bits onto a space-filling curve bounds BOTH dimensions within each
  * file, so min/max zone maps (parquet footers, Delta/Iceberg file stats)
  * prune 2-D boxes down to the files that intersect the box — the layout
  * trick behind Delta's `OPTIMIZE ZORDER BY` and ClickHouse's
  * `ORDER BY (morton…)`, built here from plain column arithmetic.
  *
  * The curve value is pure bit math — `bits` low bits per column,
  * interleaved round-robin — rendered from ONE Scala loop into BOTH the
  * Spark `Column` tree and the oracle SQL ([[zValueSql]]), so the two
  * engines can never drift (the shared-constant rule). Everything stays
  * inside whole-stage codegen: shifts, masks, ORs — no UDF.
  */
object Layout {

  /** Morton z-value of `cols`: the low `bits` bits of each column,
    * bit-interleaved round-robin (bit i of column j lands at position
    * i·n + j). Inputs are taken mod 2^bits by construction — quantize or
    * clamp wider domains first. `bits * cols.size` must fit a signed long.
    */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "need at least one column")
    require(bits >= 1 && bits * cols.size <= 62,
      s"bits*cols must fit a signed long, got ${bits * cols.size}")
    val n = cols.size
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)),
      i * n + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** The SAME interleave loop rendered as ANSI SQL (DuckDB bit operators)
    * — oracle fragments must build on this, never hand-write the shifts.
    */
  def zValueSql(cols: Seq[String], bits: Int): String = {
    require(cols.nonEmpty && bits >= 1 && bits * cols.size <= 62)
    val n = cols.size
    (for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield s"(((CAST($c AS BIGINT) >> $i) & 1) << ${i * n + j})")
      .mkString("(", " | ", ")")
  }

  /** Write `df` z-clustered on `dims` into `numFiles` parquet files:
    * range-partition by the curve value (equal-weight file cuts via range
    * sampling), sort within each file, drop the helper column. Each output
    * file then covers a tight box in EVERY `dims` dimension — its footer
    * min/max stats prune multi-dimensional predicates.
    *
    * Scale shape: one range exchange (the same cost as any global sort) —
    * there is no cheaper way to co-locate a curve — and the write streams;
    * nothing collects. Re-cluster cadence at 100 TB is the caller's call
    * (like any OPTIMIZE job); reads never require it, they just prune less
    * until then.
    */
  def zorderWrite(df: DataFrame, dims: Seq[String], bits: Int,
      numFiles: Int, path: String): Unit =
    df.withColumn("__z", zValue(dims.map(col), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Zone-map audit: per parquet file, min/max of each `dims` column —
    * the file-skipping statistics a scan planner consults. One scan of the
    * table, grouped by `input_file_name()`; used by specs and SCALE.md
    * probes to COUNT how many files a box predicate must open under a
    * given layout (a layout claim should be measured, not asserted).
    */
  def zoneMap(spark: SparkSession, path: String, dims: Seq[String]): DataFrame = {
    val stats = dims.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(stats.head, stats.tail: _*)
  }

  /** How many files of `path` a conjunctive box predicate
    * (`dim -> (lo, hi)`, inclusive) must open, per the zone map. */
  def filesTouchedByBox(spark: SparkSession, path: String,
      box: Map[String, (Long, Long)]): Long = {
    val zm = zoneMap(spark, path, box.keys.toSeq)
    val overlaps = box.map { case (c, (lo, hi)) =>
      col(s"max_$c") >= lo && col(s"min_$c") <= hi
    }.reduce(_ && _)
    zm.filter(overlaps).count()
  }
}
