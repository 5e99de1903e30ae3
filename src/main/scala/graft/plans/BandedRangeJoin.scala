package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Catalyst optimizer rule: rewrites a naive banded-range theta join into
  * the scale-safe banded equi-join — the engine-level form of
  * [[graft.operators.RangeJoin]] (whose Scaladoc explains the banding
  * argument; kafka-merge-purge has no planner, so this whole layer is a
  * Spark-first extension).
  *
  * A user writing the natural predicate
  *
  *   `l JOIN r ON ... AND abs(x - y) <= W`        (x, y long, e.g. µs)
  *
  * gets a plan whose per-key candidate set is the full key history — a
  * sort-merge join with the |Δ| filter applied AFTER the per-key cross
  * product, or a BroadcastNestedLoopJoin when no equality key exists at
  * all. This rule time-bands both sides at width W instead: the left side
  * explodes into bands {b−1, b, b+1} and the join gains a band equality,
  * so candidates are bounded by band population ×3 and the join is
  * hash-partitionable even with NO other equality key. The original
  * predicate is kept verbatim (the banding is lossless: any in-window
  * pair is at most one band apart, and each surviving pair matches in
  * EXACTLY one of the three probe bands, so no duplicates are
  * introduced). Inner joins only — an outer join's null-extension would
  * triplicate unmatched left rows.
  *
  * Installed cluster-wide by [[graft.functions.GraftExtensions]]
  * (`injectOptimizerRule`) or per-session via
  * `spark.experimental.extraOptimizations`. Idempotent: a join whose
  * condition already carries the `__graft_band` equality is left alone.
  */
object BandedRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val BandName = "__graft_band"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if j.resolved && !splitConjunctivePredicates(cond).exists(isBandEquality) =>
      findWindowConjunct(cond, left, right) match {
        case Some((lt, rt, w)) =>
          val bl = band(lt, w)
          val rBandAlias = Alias(band(rt, w), BandName)()
          val rightBanded = Project(right.output :+ rBandAlias, right)
          // left probes its own band ±1: three rows bound the candidates
          val probeArray = CreateArray(Seq(
            Subtract(bl, Literal(1L)), bl, Add(bl, Literal(1L))))
          val lBandAttr = AttributeReference(BandName, LongType)()
          val probes = Generate(Explode(probeArray), unrequiredChildIndex = Nil,
            outer = false, qualifier = None,
            generatorOutput = Seq(lBandAttr), child = left)
          val banded = Join(probes, rightBanded, Inner,
            Some(And(EqualTo(lBandAttr, rBandAlias.toAttribute), cond)), hint)
          // restore the original output (band columns are internal)
          Project(j.output, banded)
        case None => j
      }
  }

  private def isBandEquality(e: Expression): Boolean = e match {
    case EqualTo(a: AttributeReference, b: AttributeReference) =>
      a.name == BandName && b.name == BandName
    case _ => false
  }

  /** floorDiv(x, w) in EXACT long arithmetic — `x div w − (x % w < 0)`.
    * The earlier double-division form (`floor(cast(x as double) / w)`)
    * loses ulps once |x| ≳ w·2^52: the long→double cast can round by
    * more than w, putting left and right bands ≥2 apart and silently
    * dropping in-window pairs — and this rule rewrites ANY long window
    * join (hash/id domains included), not just µs timestamps (round-8
    * ADVICE). Integer form is lossless over the whole long domain: w > 0
    * guarantees `div` never overflows, and q−1 only evaluates when the
    * remainder is negative, which excludes the lone q = Long.MinValue
    * case (w = 1 divides exactly). Mirrors RangeJoin.floorDivCol, so
    * rule and library operator can never band differently.
    */
  private def band(e: Expression, w: Long): Expression = {
    val q = IntegralDivide(e, Literal(w))
    val r = Remainder(e, Literal(w))
    If(LessThan(r, Literal(0L)), Subtract(q, Literal(1L)), q)
  }

  /** Finds a `abs(x − y) <= w` (or `w >= abs(x − y)`) conjunct with long
    * w > 0 and x, y long-typed, deterministic, and pure to opposite join
    * sides; returns (leftExpr, rightExpr, w).
    */
  private def findWindowConjunct(cond: Expression, left: LogicalPlan,
                                 right: LogicalPlan): Option[(Expression, Expression, Long)] =
    splitConjunctivePredicates(cond).iterator.flatMap {
      case LessThanOrEqual(Abs(Subtract(x, y, _), _), Literal(w: Long, LongType)) if w > 0 =>
        sided(x, y, left, right).map { case (l, r) => (l, r, w) }
      case GreaterThanOrEqual(Literal(w: Long, LongType), Abs(Subtract(x, y, _), _)) if w > 0 =>
        sided(x, y, left, right).map { case (l, r) => (l, r, w) }
      case _ => None
    }.nextOption()

  private def sided(x: Expression, y: Expression, left: LogicalPlan,
                    right: LogicalPlan): Option[(Expression, Expression)] = {
    def ok(e: Expression) = e.dataType == LongType && e.deterministic
    if (!ok(x) || !ok(y)) None
    else if (x.references.subsetOf(left.outputSet) && y.references.subsetOf(right.outputSet))
      Some((x, y))
    else if (x.references.subsetOf(right.outputSet) && y.references.subsetOf(left.outputSet))
      Some((y, x))
    else None
  }
}
