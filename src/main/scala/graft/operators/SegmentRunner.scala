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
      dependencies = e.dependsOn,
      operation = e.operation.flatMap(SetOp.parse))

  /** Create + catalog a rule. Returns its id and the plan that was bound.
    * Like the reference, the rule keeps only the conditions the dependency
    * cover did NOT consume (reference rules.py:40-50).
    */
  def createRule(name: String, conditions: Seq[Condition]): (Long, SegmentPlan) = {
    val catalog = store.loadCatalog()
    val id = catalog.map(_.ruleId).maxOption.getOrElse(0L) + 1L
    val existing = catalog.map(asRule)
    val plan = Planner.planNew(conditions, existing)
    val entry = plan match {
      case SegmentPlan.Base(cs) =>
        SegmentCatalogEntry(id, name, s"segment_output_$id", cs, Nil, None)
      case SegmentPlan.Compound(parents, op, residual) =>
        SegmentCatalogEntry(id, name, s"segment_output_$id", residual,
          parents, Some(op.toString.toLowerCase))
    }
    store.saveCatalog(catalog :+ entry)
    (id, plan)
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
          e.copy(conditions = cs, dependsOn = Nil, operation = None)
        case SegmentPlan.Compound(parents, op, residual) =>
          e.copy(conditions = residual, dependsOn = parents,
            operation = Some(op.toString.toLowerCase))
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
    n
  }

  /** Materialize every cataloged rule, parents before dependents. */
  def runAll(refreshedAt: String): Map[Long, Long] = {
    val catalog = store.loadCatalog()
    val order = topoOrder(catalog)
    order.map(id => id -> run(id, refreshedAt)).toMap
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
