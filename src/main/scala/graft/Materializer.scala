package graft

import org.apache.spark.sql.DataFrame

/** Pipeline barrier for iterative / self-overwriting jobs: cut the lineage
  * of a frame so downstream stages (or an overwrite of the frame's own
  * input path) no longer reference the upstream plan.
  *
  * With `checkpointDir = None`, an eager `localCheckpoint`: blocks live
  * with their executor, so a lost executor mid-job fails the query instead
  * of recomputing (acceptable in local mode, where executor == driver).
  * With `checkpointDir` set, a RELIABLE materialization: each call writes
  * parquet under `checkpointDir/<uuid>/step-N` and reads it back, so the
  * frame survives executor loss — the right trade for a multi-round
  * iterative job on a real cluster, where the probability of losing some
  * executor grows with rounds × fleet size.
  *
  * Deliberately NOT `df.checkpoint()`: that routes through the
  * SparkContext's single global checkpoint dir, so two concurrent
  * invocations with different dirs would misroute each other's files
  * (last `setCheckpointDir` wins) and one caller's cleanup could delete
  * the other's live checkpoints. The UUID subdir is private to this
  * instance — concurrent invocations never collide. The caller owns
  * directory cleanup; files outlive the returned frames by design.
  */
final class Materializer(checkpointDir: Option[String]) {
  private val runDir = checkpointDir.map(d =>
    s"${d.stripSuffix("/")}/${java.util.UUID.randomUUID()}")
  private val step = new java.util.concurrent.atomic.AtomicInteger(0)
  def apply(df: DataFrame): DataFrame = runDir match {
    case Some(dir) =>
      val p = s"$dir/step-${step.getAndIncrement()}"
      df.write.parquet(p)
      df.sparkSession.read.parquet(p)
    case None => df.localCheckpoint(true)
  }
}
