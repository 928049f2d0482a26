package graft.plans

import graft.model._

/** Segment-reuse rewrite: greedily expresses a new rule as an INTERSECTION
  * of already-materialized segments whose condition-sets are subsets of the
  * new rule's, leaving only residual conditions for fresh computation
  * (reference: backend/app/utils/dependency_finder.py:19-74).
  *
  * This is the reference's one genuinely custom optimization. It is a
  * control-plane rewrite over catalog metadata — plain Scala above Spark, no
  * Catalyst rule needed (SURVEY §4): at 100 TB it saves the entire scan +
  * shuffle for the covered conditions by reusing parquet segment outputs.
  *
  * Determinism: candidates are ordered by condition-count descending
  * (reference dependency_finder.py:38 sorts by json_array_length desc) with
  * rule-id ascending as the tie-break, so plans are reproducible
  * (SURVEY §7.4 item 5).
  */
object DependencyFinder {

  final case class Detection(
      dependencyRuleIds: Seq[Long],
      operation: SetOp,
      remaining: Seq[Condition])

  /** Canonical form: order-insensitive set of conditions
    * (reference dependency_finder.py:9-17 — dict→sorted tuple; our case
    * classes are already canonical values).
    */
  def canonical(conditions: Seq[Condition]): Set[Condition] = conditions.toSet

  /** Finds the best dependency cover for `conditions` among `existing`
    * rules, optionally excluding one rule id (used on update so a rule never
    * depends on itself — reference rules.py:162, dependency_finder.py:39-40).
    *
    * Returns Some only if ≥1 dependency was claimed AND the cover consumed
    * ≥1 condition (reference dependency_finder.py:65-71, R3).
    */
  def findBestDependency(
      conditions: Seq[Condition],
      existing: Seq[Rule],
      excludeRuleId: Option[Long] = None): Option[Detection] = {
    val target = canonical(conditions)
    if (target.isEmpty) return None

    val candidates = existing
      .filter(r => excludeRuleId.forall(_ != r.id))
      .filter(_.conditions.nonEmpty)
      .sortBy(r => (-r.conditions.size, r.id))

    var remaining = target
    val claimed = Vector.newBuilder[Long]
    candidates.foreach { r =>
      val cs = canonical(r.conditions)
      if (cs.nonEmpty && cs.subsetOf(remaining)) {
        claimed += r.id
        remaining = remaining -- cs
      }
    }
    val deps = claimed.result()
    if (deps.nonEmpty && remaining.size < target.size)
      // Keep the original ordering of whatever conditions remain.
      Some(Detection(deps, SetOp.Intersection,
        conditions.filter(remaining.contains)))
    else None
  }
}
