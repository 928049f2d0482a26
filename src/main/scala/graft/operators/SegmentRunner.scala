package graft.operators

import graft.model._
import graft.plans.{DependencyFinder, Planner}
import graft.sources.SegmentStore
import org.apache.spark.sql.DataFrame

/** Top-level rule lifecycle — the engine a user of the reference platform
  * would actually call. Mirrors the two entry points:
  *
  *  - [[createRule]] = `POST /api/v1/rules` (reference
  *    backend/app/api/rules.py:11-70): dependency detection against the
  *    catalog, residual conditions stored on the rule, lineage recorded.
  *  - [[run]] = the scheduler's `execute_rule` → SparkSegmentProcessor
  *    (reference backend/app/processor/spark_processor.py:205-237): plan
  *    dispatch (compound wins over base, Q5), materialization, empty-safe
  *    store write (Q9), row-count + refresh metadata (S7).
  *
  * `refreshedAt` is caller-supplied rather than wall-clock so runs are
  * reproducible.
  */
final class SegmentRunner(
    store: SegmentStore,
    tx: () => DataFrame,
    keyed: Boolean = true,
    residualMode: Planner.ResidualMode = Planner.ApplyResidual,
    mode: ConditionCompiler.Mode = ConditionCompiler.DefaultMode) {

  private def asRule(e: SegmentCatalogEntry): Rule =
    Rule(e.ruleId, e.segmentName, e.conditions,
      schedule = e.schedule, isActive = e.isActive,
      dependencies = e.dependsOn,
      operation = e.operation.flatMap(SetOp.parse))

  /** The reference writes the literal string `COMPOUND_OPERATION:<op>` into
    * the catalog's sql_query column for compound rules
    * (reference: backend/app/api/rules.py:211) — a display sentinel, never
    * consulted by dispatch (the structured depends_on/operation fields
    * govern, Q5). Reproduced verbatim against our stored lowercase op so a
    * catalog listing round-trips like the reference's.
    */
  private def compoundSentinel(op: SetOp): Option[String] =
    Some(s"COMPOUND_OPERATION:${op.toString.toLowerCase}")

  /** Create + catalog a rule. Returns its id and the plan that was bound.
    * Like the reference, the rule keeps only the conditions the dependency
    * cover did NOT consume (reference rules.py:40-50). `schedule` and
    * `isActive` govern scheduled execution ([[runAll]]/[[runDue]]).
    */
  def createRule(name: String, conditions: Seq[Condition],
      schedule: String = Schedule.Daily, isActive: Boolean = true): (Long, SegmentPlan) = {
    val catalog = store.loadCatalog()
    val id = catalog.map(_.ruleId).maxOption.getOrElse(0L) + 1L
    val existing = catalog.map(asRule)
    val plan = Planner.planNew(conditions, existing)
    val entry = plan match {
      case SegmentPlan.Base(cs) =>
        SegmentCatalogEntry(id, name, s"segment_output_$id", cs, Nil, None,
          schedule = schedule, isActive = isActive,
          sqlQuery = Some(ReferenceSql.generateSegmentSql(cs)))
      case SegmentPlan.Compound(parents, op, residual) =>
        SegmentCatalogEntry(id, name, s"segment_output_$id", residual,
          parents, Some(op.toString.toLowerCase),
          schedule = schedule, isActive = isActive,
          sqlQuery = compoundSentinel(op))
    }
    store.saveCatalog(catalog :+ entry)
    (id, plan)
  }

  /** List cataloged rules, paginated like the reference's
    * `GET /api/v1/rules` (reference rules.py:83-107; 1-based pages).
    */
  def listRules(page: Int = 1, perPage: Int = 10): Seq[SegmentCatalogEntry] = {
    require(page >= 1 && perPage >= 1, s"bad page spec ($page, $perPage)")
    store.loadCatalog().slice((page - 1) * perPage, page * perPage)
  }

  def getRule(ruleId: Long): Option[SegmentCatalogEntry] =
    store.loadCatalog().find(_.ruleId == ruleId)

  /** Flip a rule's active flag (`PUT /rules/<id>` with `is_active`,
    * reference rules.py:176). Inactive rules are skipped by
    * [[runAll]]/[[runDue]] but stay in the catalog and keep their data.
    */
  def setActive(ruleId: Long, active: Boolean): Unit =
    store.updateCatalog(ruleId)(_.copy(isActive = active))

  /** Delete a rule: catalog row + materialized segment dir
    * (`DELETE /rules/<id>`, reference rules.py:128-151).
    *
    * Documented deviation: the reference deletes blindly, leaving
    * dependents' `depends_on` dangling (their next run dies on a missing
    * parent table). Here a delete with live dependents throws unless
    * `force = true` — at scale a dangling parent takes down every dependent
    * refresh, so the guard is the safe default and `force` replicates the
    * reference's behavior.
    */
  def deleteRule(ruleId: Long, force: Boolean = false): Unit = {
    val catalog = store.loadCatalog()
    require(catalog.exists(_.ruleId == ruleId), s"rule $ruleId not in catalog")
    val dependents = catalog.filter(_.dependsOn.contains(ruleId)).map(_.ruleId)
    require(force || dependents.isEmpty,
      s"rule $ruleId has dependents ${dependents.mkString(",")}; " +
        "re-plan or delete them first (or pass force = true)")
    store.removeFromCatalog(ruleId)
    store.delete(ruleId)
  }

  /** Update a rule's conditions: re-runs dependency detection excluding the
    * rule itself (reference rules.py:154-225, R7).
    */
  def updateRule(ruleId: Long, conditions: Seq[Condition]): SegmentPlan = {
    val catalog = store.loadCatalog()
    val existing = catalog.filter(_.ruleId != ruleId).map(asRule)
    val plan = DependencyFinder.findBestDependency(
        conditions, existing, excludeRuleId = Some(ruleId)) match {
      case Some(d) => SegmentPlan.Compound(d.dependencyRuleIds, d.operation, d.remaining)
      case None    => SegmentPlan.Base(conditions)
    }
    val updated = catalog.map { e =>
      if (e.ruleId != ruleId) e
      else plan match {
        case SegmentPlan.Base(cs) =>
          e.copy(conditions = cs, dependsOn = Nil, operation = None,
            sqlQuery = Some(ReferenceSql.generateSegmentSql(cs)))
        case SegmentPlan.Compound(parents, op, residual) =>
          e.copy(conditions = residual, dependsOn = parents,
            operation = Some(op.toString.toLowerCase),
            sqlQuery = compoundSentinel(op))
      }
    }
    store.saveCatalog(updated)
    plan
  }

  /** Materialize one rule into the store; returns the row count written.
    * Parents must already be materialized (like the reference, which loads
    * `segment_output_<id>` tables and aborts when fewer than two exist).
    */
  def run(ruleId: Long, refreshedAt: String): Long = {
    val entry = store.loadCatalog().find(_.ruleId == ruleId)
      .getOrElse(throw new NoSuchElementException(s"rule $ruleId not in catalog"))
    val plan = Planner.planStored(asRule(entry))
    val result = Planner.evaluate(plan, tx(), store.read, keyed, residualMode, mode)
    // write() handles the empty case (canonical-schema empty parquet, Q9);
    // probing emptiness first would execute the whole DAG twice.
    val n = store.write(ruleId, result)
    store.updateMetadata(ruleId, n, refreshedAt)
    // growth-over-runs observability (the catalog keeps only the latest)
    store.appendRunHistory(ruleId, refreshedAt, n)
    n
  }

  /** Materialize every ACTIVE cataloged rule, parents before dependents
    * (the reference scheduler only ever arms `is_active` rules —
    * scheduler.py:28,50). Dependents of an inactive parent still run,
    * reading the parent's last materialized parquet, exactly as the
    * reference's execute path loads stored `segment_output_<id>` tables.
    */
  def runAll(refreshedAt: String): Map[Long, Long] = {
    val catalog = store.loadCatalog()
    val active = catalog.filter(_.isActive).map(_.ruleId).toSet
    val runnable = materializableSubset(catalog, topoOrder(catalog).filter(active))
    runnable.map(id => id -> run(id, refreshedAt)).toMap
  }

  /** Scheduler tick: run every active rule whose `nextRunAt` has arrived
    * (never-armed rules are due immediately, like the reference's init
    * snap-to-now), then re-arm it per its cadence —
    * `Schedule.calculateNextRun` (see the deviation note there: the
    * reference computes cadence but never re-arms after a run). All
    * re-arms land in ONE catalog write after the tick, so a mid-tick
    * crash never leaves a rule refreshed-but-armed-twice and the
    * control-plane I/O stays O(rules), not O(rules²).
    *
    * Pass `faithfulSchedule = true` to reproduce the reference scheduler
    * EXACTLY (backend/app/core/scheduler.py:62-133): `execute_rule`
    * updates only `last_run_at`, never `next_run_at`, so once a rule's
    * arm time has passed it stays due and re-runs on EVERY tick —
    * `calculate_next_run` exists but is unreachable. The default
    * implements the evident intent (cadence actually governs re-runs);
    * the flag exists for byte-for-byte behavioral parity, same pattern
    * as `Planner.evaluate(faithfulParentGuard)` and the faithful set-op /
    * string-date modes.
    */
  def runDue(now: String, faithfulSchedule: Boolean = false): Map[Long, Long] = {
    java.time.Instant.parse(now) // validate once, fail fast with a clear cause
    val catalog = store.loadCatalog()
    val due = catalog
      .filter(e => e.isActive && Schedule.isDue(e.nextRunAt, now))
      .map(_.ruleId).toSet
    val runnable = materializableSubset(catalog, topoOrder(catalog).filter(due))
    val counts = runnable.map(id => id -> run(id, now)).toMap
    if (counts.nonEmpty && !faithfulSchedule) {
      val bySchedule = catalog.map(e => e.ruleId -> e.schedule).toMap
      store.saveCatalog(store.loadCatalog().map(e =>
        if (counts.contains(e.ruleId))
          e.copy(nextRunAt = Some(Schedule.calculateNextRun(bySchedule(e.ruleId), now)))
        else e))
    }
    counts
  }

  /** Drop rules whose parents were never materialized (inactive/not-due
    * parents keep serving their LAST stored parquet, but a parent with no
    * store at all cannot be read — the reference logs that rule's failure
    * and continues; aborting the whole batch mid-way would strand the
    * rules already refreshed). A rule runnable this tick counts as
    * materialized for its dependents.
    */
  private def materializableSubset(catalog: Seq[SegmentCatalogEntry],
      order: Seq[Long]): Seq[Long] = {
    val byId = catalog.map(e => e.ruleId -> e).toMap
    val available = collection.mutable.Set.empty[Long]
    order.filter { id =>
      val ok = byId(id).dependsOn.forall(p => available(p) || store.exists(p))
      if (ok) available += id
      ok
    }
  }

  private def topoOrder(catalog: Seq[SegmentCatalogEntry]): Seq[Long] = {
    val byId = catalog.map(e => e.ruleId -> e).toMap
    val visited = collection.mutable.LinkedHashSet.empty[Long]
    def visit(id: Long, stack: Set[Long]): Unit = {
      if (visited.contains(id)) return
      require(!stack.contains(id), s"dependency cycle at rule $id")
      byId(id).dependsOn.foreach { p =>
        // fail loudly, naming the declaring rule — silently skipping the
        // dependent would read stale or missing parent parquet mid-batch
        require(byId.contains(p), s"rule $id depends on missing rule $p")
        visit(p, stack + id)
      }
      visited += id
    }
    catalog.foreach(e => visit(e.ruleId, Set.empty))
    visited.toSeq
  }
}
