package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit key-salting for skewed shuffle joins.
  *
  * The shuffle-join failure mode at 100 TB: one hot key (the null-ish
  * user, the default referrer, the one viral document) funnels its whole
  * key group through a single reducer, and the stage runs at the speed of
  * that one task. Spark's own mitigations cover most of it — AQE's
  * `OptimizeSkewedJoin` splits oversized sort-merge/shuffled-hash
  * partitions at runtime, and map-side partial aggregation absorbs
  * groupBy skew — so this operator is deliberately narrow: it is the
  * PRE-shuffle fix for the shapes AQE cannot rescue, namely
  *
  *   - stream-stream and stream-static joins (no AQE re-plan mid-query),
  *   - environments running with AQE disabled or pinned plans,
  *   - a single key so hot that even AQE's split partitions exceed
  *     executor memory in a shuffled-hash build.
  *
  * Mechanics: the BIG side scatters each row into one of `numSalts`
  * sub-keys via a deterministic per-row hash (no `rand()` — retries and
  * speculative tasks must land rows in the same bucket); the SMALL side
  * replicates every row to all `numSalts` sub-keys. Joining on
  * `(key, salt)` then spreads the hot key over `numSalts` reducers.
  * Replication multiplies the small side by `numSalts`, so this is for
  * big-⋈-small shapes where the small side is still too big (or the join
  * type unsuitable) to broadcast.
  *
  * Equivalence: for every big row, exactly one salted copy of each
  * matching small row lands in its bucket, so inner and left-outer
  * results equal the unsalted join row-for-row (proved against the plain
  * SQL oracle by q_join_skew_salted, and at an engineered 40%-hot-key
  * corpus by the Stress probe).
  */
object Skew {

  /** Salt column name; dropped from the result. */
  private val SaltCol = "__graft_salt"

  /** Join `big` to `small` on equi-key `key`, spreading each of big's key
    * groups over `numSalts` shuffle sub-keys. `joinType` must be one of
    * inner/left/left_outer/left_semi/left_anti — the shapes where
    * replicating the RIGHT side preserves semantics. (For left_semi/anti
    * the replication is still correct: membership of the key-salt bucket
    * equals membership of the key.)
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      numSalts: Int, joinType: String = "inner"): DataFrame = {
    require(numSalts >= 1, "numSalts must be >= 1")
    val jt = joinType.toLowerCase.replace("outer", "").stripSuffix("_")
    require(Set("inner", "left", "left_semi", "left_anti")(jt),
      s"saltedJoin supports inner/left/left_semi/left_anti, got $joinType")
    // Deterministic per-row scatter: hash every big-side column. Exact
    // duplicate rows share a salt — harmless, the goal is spreading the
    // KEY group, and distinct rows of a hot key do spread.
    val bigSalted = big.withColumn(SaltCol,
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(numSalts))
        .cast("int"))
    // Replicate the small side across all salt values. posexplode of a
    // constant array is a zero-shuffle projection; the ×numSalts row blowup
    // happens map-side, before the exchange.
    val smallSalted = small.withColumn(SaltCol,
      explode(sequence(lit(0), lit(numSalts - 1))))
    // Pin the join to SHUFFLED-HASH (round-16, measured by the annbatch
    // probe): if Catalyst instead picks a broadcast join — which it will
    // try whenever its pre-explode size estimate looks small — the
    // replication is pure overhead (a broadcast join has no shuffle to
    // spread) and a genuinely large replicated side OOMs the driver
    // build (13M-row probe frame → notEnoughMemoryToBuildAndBroadcast).
    // Salting exists exactly for the shuffled case, so force it.
    bigSalted
      .join(smallSalted.hint("shuffle_hash"), Seq(key, SaltCol), joinType)
      .drop(SaltCol)
  }
}
