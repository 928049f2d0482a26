package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-user windowed rollups — the reference's `upi_transactions_agg`
  * builder (reference: backend/create_aggregates.py:19-104): for each
  * trailing window of N days, per-user transaction count, spend, last
  * activity, max tier, and favorite category.
  *
  * Design-for-scale notes:
  *  - The anchor ("now") is the corpus max timestamp, joined in via a
  *    broadcast cross join of a 1-row aggregate — deterministic across runs
  *    and sf, no driver collect in the plan.
  *  - All windows compute in ONE scan: each row explodes to the window
  *    lengths it falls into, then a single hash aggregate on
  *    (user_id, period_days). The reference runs one full query per window.
  *  - favorite_category is the reference's correlated `ORDER BY COUNT(*)
  *    DESC LIMIT 1` subquery (create_aggregates.py:43-47) rewritten as a
  *    window-function mode with a deterministic tie-break (count desc,
  *    category asc) — the one window function the engine needs (SURVEY §2.5).
  *  - Output carries dates, not raw timestamps: the corpus stores
  *    nanosecond timestamps which Spark truncates to micros, so echoing
  *    `max(ts)` would diverge from a nanosecond-native engine.
  */
object Rollups {

  def userWindows(tx: DataFrame, periods: Seq[Int]): DataFrame = {
    val anchor = tx.agg(max(to_date(col("ts"))).as("anchor"))
    val periodsLit = array(periods.map(lit): _*)
    val base = tx.crossJoin(broadcast(anchor))
      .withColumn("period_days",
        explode(filter(periodsLit, p => to_date(col("ts")) >= date_sub(col("anchor"), p))))

    val agged = base.groupBy(col("user_id"), col("period_days"))
      .agg(
        count(lit(1)).as("total_transactions"),
        Tables.moneyOut(sum(col("amount").cast(Tables.MoneyExact))).as("total_amount"),
        max(to_date(col("ts"))).as("last_transaction_date"),
        max(col("city_tier")).as("city_tier"))

    val byCat = base.groupBy(col("user_id"), col("period_days"), col("category")).count()
    val w = Window.partitionBy(col("user_id"), col("period_days"))
      .orderBy(col("count").desc, col("category"))
    val fav = byCat
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("period_days"), col("category").as("favorite_category"))

    agged.join(fav, Seq("user_id", "period_days"))
  }
}
