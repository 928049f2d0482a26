package graft.operators

import graft.model._
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Materializes a base rule into the canonical segment shape:
  * filter → groupBy(user_id) → (count, exact-decimal sum, distinct type set)
  * → having → null guard.
  *
  * The reference pushes this whole pipeline as generated SQL into SQLite
  * (reference: backend/app/utils/rule_parser.py:96-136,
  * backend/app/processor/spark_processor.py:104-112); here Spark computes it
  * natively: the WHERE predicate reaches the parquet scan (predicate
  * pushdown), the aggregation runs as partial+final hash aggregate (one
  * shuffle on user_id), and HAVING is a post-agg filter — exactly the plan
  * you want at 100 TB.
  *
  * Determinism notes:
  *  - `SUM(amount)` uses exact decimal arithmetic (partitioning-order
  *    independent), rounded to 2dp like the reference's outputs and surfaced
  *    as DOUBLE (`Tables.moneyOut` — the cross-engine rendering convention).
  *  - `GROUP_CONCAT(DISTINCT …)` is nondeterministic in SQLite (SURVEY Q3);
  *    we canonicalize with `sort_array(collect_set(...))`.
  */
object SegmentEngine {

  /** Compile + evaluate a base rule over a unified transaction view. */
  def materializeBase(
      tx: DataFrame,
      conditions: Seq[Condition],
      mode: ConditionCompiler.Mode = ConditionCompiler.DefaultMode): DataFrame = {
    val compiled = ConditionCompiler.compile(conditions, mode)
    materializeCompiled(tx, compiled)
  }

  def materializeCompiled(tx: DataFrame, compiled: ConditionCompiler.Compiled): DataFrame = {
    val filtered = compiled.where.map(tx.filter).getOrElse(tx)
    val agged = filtered
      .groupBy(col("user_id"))
      .agg(
        count(col("user_id")).as("total_transactions"),
        Tables.moneyOut(sum(col("amount").cast(Tables.MoneyExact))).as("total_spent"),
        concat_ws(",", sort_array(collect_set(col("transaction_type")))).as("transaction_types"))
    val havinged = compiled.having.map(agged.filter).getOrElse(agged)
    // Null guard matches reference: spark_processor.py:112 (P5).
    havinged.filter(col("user_id").isNotNull)
  }
}
