package graft.model

import org.apache.spark.sql.types._

/** Whitelisted comparison operators of the rule condition language.
  *
  * Mirrors the operator whitelist of the reference's rule parser
  * (reference: backend/app/utils/rule_parser.py:50). Anything outside this
  * set is skipped silently by the compiler (SURVEY Q10).
  */
sealed abstract class CondOp(val sym: String) extends Product with Serializable
object CondOp {
  case object Gt      extends CondOp(">")
  case object Lt      extends CondOp("<")
  case object Eq      extends CondOp("=")
  case object Geq     extends CondOp(">=")
  case object Leq     extends CondOp("<=")
  case object Neq     extends CondOp("!=")
  case object In      extends CondOp("IN")
  case object NotIn   extends CondOp("NOT IN")
  case object Between extends CondOp("BETWEEN")

  val all: Seq[CondOp] = Seq(Gt, Lt, Eq, Geq, Leq, Neq, In, NotIn, Between)

  /** Uppercase-only normalization — deliberately NO trim or internal
    * whitespace collapse: the reference checks `operator.upper() not in
    * allowed_operators` (rule_parser.py:51), so `' > '` or `'NOT  IN'`
    * (double space) are silently SKIPPED there, and lenient parsing here
    * would make this engine compute a different segment than the
    * reference renders and executes.
    */
  def parse(s: String): Option[CondOp] = {
    val norm = s.toUpperCase
    all.find(_.sym == norm)
  }
}

/** A condition value: scalar or list (for IN / NOT IN). All values arrive as
  * strings, like the reference's JSON payloads (SURVEY Q2); typing happens in
  * the compiler, per field.
  */
sealed trait CondValue extends Product with Serializable
object CondValue {
  final case class One(v: String)          extends CondValue
  final case class Many(vs: Vector[String]) extends CondValue
  def apply(v: String): CondValue      = One(v)
  def apply(vs: Seq[String]): CondValue = Many(vs.toVector)
}

/** One rule condition `{field, operator, value, value2?}`
  * (reference: backend/app/models/rule_engine.py:11; rule_parser.py:23-94).
  * Case-class equality doubles as the canonical form the dependency finder
  * needs (reference: backend/app/utils/dependency_finder.py:9-17).
  */
final case class Condition(
    field: String,
    operator: String,
    value: CondValue,
    value2: Option[String] = None)

object Condition {
  def apply(field: String, operator: String, value: String): Condition =
    Condition(field, operator, CondValue.One(value), None)
  def between(field: String, lo: String, hi: String): Condition =
    Condition(field, "BETWEEN", CondValue.One(lo), Some(hi))
  def in(field: String, vs: Seq[String]): Condition =
    Condition(field, "IN", CondValue.Many(vs.toVector), None)
}

/** Set operation combining parent segments
  * (reference: backend/app/processor/segment_operations.py:13-53).
  * Parsing is case-insensitive (SURVEY Q4).
  */
sealed trait SetOp extends Product with Serializable
object SetOp {
  case object Union        extends SetOp
  case object Intersection extends SetOp
  case object Difference   extends SetOp

  def parse(s: String): Option[SetOp] = s.trim.toUpperCase match {
    case "UNION"        => Some(Union)
    case "INTERSECTION" => Some(Intersection)
    case "DIFFERENCE"   => Some(Difference)
    case _              => None
  }
}

/** A named audience rule (reference: backend/app/models/rule_engine.py:4-43).
  * `schedule` (HOURLY/DAILY/WEEKLY cadence, see [[graft.operators.Schedule]])
  * and `isActive` gate scheduled execution: SegmentRunner.runAll/runDue skip
  * inactive rules and runDue re-arms `nextRunAt` per the schedule.
  */
final case class Rule(
    id: Long,
    name: String,
    conditions: Seq[Condition],
    schedule: String = "DAILY",
    isActive: Boolean = true,
    dependencies: Seq[Long] = Nil,
    operation: Option[SetOp] = None)

/** Execution plan for a rule, produced by the planner.
  *
  * `Compound` wins over `Base` when both could apply — the reference checks
  * `depends_on && operation` before `sql_query`
  * (reference: backend/app/processor/spark_processor.py:72-119; SURVEY Q5).
  */
sealed trait SegmentPlan extends Product with Serializable
object SegmentPlan {
  final case class Base(conditions: Seq[Condition]) extends SegmentPlan
  final case class Compound(parents: Seq[Long], op: SetOp, residual: Seq[Condition] = Nil)
      extends SegmentPlan
}

/** Catalog metadata for a materialized segment
  * (reference: backend/app/models/rule_engine.py:45-95).
  */
final case class SegmentCatalogEntry(
    ruleId: Long,
    segmentName: String,
    tableName: String,
    conditions: Seq[Condition],
    dependsOn: Seq[Long],
    operation: Option[String],
    rowCount: Long = -1L,
    lastRefreshedAt: Option[String] = None,
    schedule: String = "DAILY",
    isActive: Boolean = true,
    nextRunAt: Option[String] = None,
    // Display-only fidelity crumb: the reference stores the literal string
    // `COMPOUND_OPERATION:<op>` in the catalog's sql_query column for
    // compound rules (reference: backend/app/api/rules.py:211). Dispatch
    // never reads it — the structured dependsOn/operation fields govern
    // (Q5) — it exists so a catalog listing renders like the reference's.
    sqlQuery: Option[String] = None)

/** Canonical schemas shared by engine and store. */
object Schemas {
  /** Segment output row (reference: backend/app/processor/spark_processor.py:191,213-219).
    * `total_transactions` standardized to LONG (the reference flips between
    * LONG and DECIMAL(20,2) — SURVEY §1.2); `total_spent` follows the
    * engine-wide monetary-output convention (`Tables.moneyOut`: exact decimal
    * math internally, DOUBLE at the output boundary).
    */
  val segmentOutput: StructType = StructType(Seq(
    StructField("user_id", LongType),
    StructField("total_transactions", LongType),
    StructField("total_spent", DoubleType),
    StructField("transaction_types", StringType)))
}
