package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to each left row the LATEST right row whose time is
  * ≤ the left row's time, within the same key — the "state as of event
  * time" operator (feature snapshots, model-version pins, price marks)
  * that Spark has no built-in for.
  *
  * Implementation is the scalable tag-union-window shape, NOT a range
  * join: a `left.ts >= right.ts` join condition explodes to
  * |left|×|right| per key before filtering, while this is one shuffle on
  * the key, one sort by (time, side, tie), and a running `last(pick)`
  * carried forward — O((|L|+|R|) log) per key, the same plan a dedicated
  * ASOF operator executes. Ordering guarantees:
  *  - a right row at exactly the left row's time IS visible (side orders
  *    right before left within equal times);
  *  - equal-time right rows resolve deterministically to the greatest
  *    `tieBreak` value.
  */
object AsOf {

  /** @param pick right-side columns to carry onto left rows (surfaced as
    *             `asof_<name>`, null when no right row precedes the left
    *             row)
    * @param tieBreak right-side NUMERIC column ordering equal-time right
    *                 rows (greatest wins); pass a unique numeric id for
    *                 determinism (non-numeric values cast to null and lose
    *                 the guarantee)
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, pick: Seq[String],
      tieBreak: String): DataFrame = {
    // A null right time would sort BEFORE every left row (nulls-first asc)
    // and become the as-of match for rows with no real predecessor; the
    // operator's contract (latest time ≤ left time) excludes it. Filter on
    // the CASTED value: an unparseable string time casts to null and must
    // be dropped the same way a typed null is.
    val rightT = col(rightTime).cast("timestamp")
    val r = right.filter(rightT.isNotNull).select(
      col(key), rightT.as("__t"),
      col(tieBreak).cast("long").as("__tie"),
      struct(pick.map(col): _*).as("__pick"))
      .withColumn("__side", lit(0))
    val l = left
      .withColumn("__t", col(leftTime).cast("timestamp"))
      .withColumn("__side", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)

    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withAsof = unioned
      .withColumn("__asof", last(col("__pick"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val out = pick.foldLeft(withAsof) { (df, p) =>
      df.withColumn(s"asof_$p", col(s"__asof.$p"))
    }
    out.drop("__t", "__side", "__tie", "__pick", "__asof")
  }
}
