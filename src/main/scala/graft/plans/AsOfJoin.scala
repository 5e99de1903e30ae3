package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Last, Max, MaxBy}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Catalyst optimizer rule: rewrites the naive "latest prior row" shape —
  * an aggregate over an inequality theta join —
  *
  *   SELECT l.*, max(r.t), max_by(r.v, r.t)
  *   FROM l JOIN r ON l.k = r.k AND r.t <= l.t
  *   GROUP BY l.*
  *
  * into the union + window as-of plan of
  * [[graft.operators.AsOf.joinAsOf]]. The natural encoding plans as a
  * sort-merge join whose per-key candidate set is the FULL right history
  * of the key (every left row pairs with every prior right row before
  * the aggregate collapses them) — quadratic per hot key, the classic
  * as-of scale trap. The rewrite tags both sides, unions them, and runs
  * ONE window per key ordered by (t, side): `last(right_payload,
  * ignoreNulls)` over rows-unbounded-preceding carries the latest
  * qualifying right row into each left row, so cost drops to one
  * shuffle + one per-partition streaming sort — linear, AQE-skew-safe,
  * nothing materialized per key (same argument as AsOf.joinAsOf's
  * Scaladoc; kafka-merge-purge has no planner — this layer is the
  * Spark-first extension).
  *
  * Fires only when the rewrite is provably exact:
  *   - inner join whose condition is equi-conjuncts plus exactly one
  *     `r.t <= l.t` / `r.t < l.t` conjunct (both attributes, same
  *     orderable type);
  *   - every aggregate is `max(r.t)` or `max_by(<right expr>, r.t)`
  *     (no DISTINCT / FILTER), so dropping dominated pairs cannot
  *     change any result — count/sum/avg over the pair multiset bail;
  *   - grouping references the left side only.
  *
  * Join-semantics edges preserved: null keys never match (right-side
  * null keys are filtered; left null-key rows then find no right row in
  * their partition and are dropped by the match filter), null times
  * never match (null-time right rows filtered; a null-time left row
  * sorts nulls-first ahead of every right row and is dropped), groups
  * with zero qualifying pairs vanish exactly as the inner join drops
  * them, and at equal times `<=` admits the simultaneous right row
  * (right sorts before left) while `<` excludes it (left sorts first).
  * `max_by` ties on equal (key, t) remain nondeterministic in both
  * plans.
  *
  * Installed cluster-wide by [[graft.functions.GraftExtensions]]
  * (`injectOptimizerRule`). Idempotent: the rewritten plan has no
  * aggregate-over-join left to match.
  */
object AsOfJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg: Aggregate if agg.resolved =>
      childJoin(agg.child) match {
        case Some(j @ Join(left, right, Inner, Some(cond), _)) if j.resolved =>
          rewrite(agg, left, right, cond).getOrElse(agg)
        case _ => agg
      }
  }

  /** The join under the aggregate — possibly through a pure
    * column-pruning Project (ColumnPruning inserts one when the rule runs
    * after the main optimizer batch). Attribute-only projections prune a
    * superset of what the rewrite reconstructs from the join's own
    * children, so they can be dropped; anything aliasing/computing bails.
    */
  private def childJoin(p: LogicalPlan): Option[Join] = p match {
    case j: Join => Some(j)
    case Project(pl, j: Join) if pl.forall(_.isInstanceOf[AttributeReference]) => Some(j)
    case _ => None
  }

  private case class TimeConjunct(lt: AttributeReference, rt: AttributeReference,
                                  strict: Boolean)

  private def rewrite(agg: Aggregate, left: LogicalPlan, right: LogicalPlan,
                      cond: Expression): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val (timeCs, rest) = conjuncts.partition(timeConjunct(_, left, right).isDefined)
    if (timeCs.size != 1) return None
    val tc = timeConjunct(timeCs.head, left, right).get
    if (!RowOrdering.isOrderable(tc.lt.dataType)) return None

    // every remaining conjunct must be a plain equi-key across sides
    val keys: Seq[(Expression, Expression)] = rest.map {
      case EqualTo(x, y)
          if x.references.subsetOf(left.outputSet) &&
            y.references.subsetOf(right.outputSet) && x.deterministic && y.deterministic =>
        (x, y)
      case EqualTo(x, y)
          if x.references.subsetOf(right.outputSet) &&
            y.references.subsetOf(left.outputSet) && x.deterministic && y.deterministic =>
        (y, x)
      case _ => return None
    }

    if (!agg.groupingExpressions.forall(_.references.subsetOf(left.outputSet)))
      return None

    // right attributes the aggregates need, carried through the union as
    // one struct payload; field 0 is always the time column
    val valueAttrs = scala.collection.mutable.LinkedHashSet[AttributeReference](tc.rt)
    var rewritable = true
    agg.aggregateExpressions.foreach { ne =>
      ne.foreach {
        case ae: AggregateExpression =>
          mappedAggKind(ae, tc.rt, right) match {
            case Some(vs) => vs.foreach(valueAttrs += _)
            case None => rewritable = false
          }
        case _ => ()
      }
    }
    // aggregates must exist and reference the right side ONLY through the
    // rewritten max/max_by forms
    if (!rewritable || !agg.aggregateExpressions.exists(_.exists(
        _.isInstanceOf[AggregateExpression]))) return None
    val outsideAgg = agg.aggregateExpressions.exists { ne =>
      topLevelRefs(ne).exists(right.outputSet.contains)
    }
    if (outsideAgg) return None

    val fields = valueAttrs.toSeq
    val rStruct = CreateNamedStruct(
      fields.zipWithIndex.flatMap { case (a, i) => Seq(Literal(s"f$i"), a) })
    // only the left attributes the aggregate reads ride the shuffle; a
    // dummy field keeps the struct non-empty for the global-agg case
    val neededLeft = left.output.filter(agg.references.contains)
    val lStruct = CreateNamedStruct(
      if (neededLeft.isEmpty) Seq(Literal("d"), Literal(true))
      else neededLeft.zipWithIndex.flatMap { case (a, i) => Seq(Literal(s"f$i"), a) })

    val kN = keys.indices.map(i => s"__graft_asof_k$i")
    // right child: null-time and null-key rows can never match — filter
    val rFilter = Filter((IsNotNull(tc.rt) +: keys.map(k => IsNotNull(k._2)))
      .reduceLeft[Expression](And), right)
    val rProj = Project(
      keys.zip(kN).map { case ((_, rk), n) => Alias(rk, n)() } ++ Seq(
        Alias(tc.rt, "__graft_asof_t")(),
        Alias(Literal(0, IntegerType), "__graft_asof_side")(),
        Alias(rStruct, "__graft_asof_r")(),
        Alias(Literal(null, lStruct.dataType), "__graft_asof_l")()), rFilter)
    val lProj = Project(
      keys.zip(kN).map { case ((lk, _), n) => Alias(lk, n)() } ++ Seq(
        Alias(tc.lt, "__graft_asof_t")(),
        Alias(Literal(1, IntegerType), "__graft_asof_side")(),
        Alias(Literal(null, rStruct.dataType), "__graft_asof_r")(),
        Alias(lStruct, "__graft_asof_l")()), left)
    if (rProj.projectList.map(_.dataType) != lProj.projectList.map(_.dataType)) return None

    val union = Union(Seq(rProj, lProj))
    val uOut = union.output
    val uKeys = uOut.take(keys.size)
    val Seq(uT, uSide, uR, uL) = uOut.drop(keys.size)

    // <=: right (side 0) sorts before left at equal t and is admitted;
    // <:  left sorts first, excluding the simultaneous right row
    val sideOrder = SortOrder(uSide, if (tc.strict) Descending else Ascending)
    val frame = SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)
    val spec = WindowSpecDefinition(uKeys, Seq(SortOrder(uT, Ascending), sideOrder), frame)
    val mAlias = Alias(WindowExpression(
      Last(uR, ignoreNulls = true).toAggregateExpression(), spec), "__graft_asof_m")()
    val win = Window(Seq(mAlias), uKeys, Seq(SortOrder(uT, Ascending), sideOrder), union)
    val mAttr = mAlias.toAttribute

    val filtered = Filter(And(EqualTo(uSide, Literal(1, IntegerType)), IsNotNull(mAttr)), win)

    // restore the left attributes under their ORIGINAL exprIds so the
    // untouched grouping/passthrough expressions resolve unchanged, and
    // surface the matched right payload as fresh attributes
    val restoredL = neededLeft.zipWithIndex.map { case (a, i) =>
      Alias(GetStructField(uL, i, Some(a.name)), a.name)(exprId = a.exprId,
        qualifier = a.qualifier)
    }
    val matchedFields = fields.zipWithIndex.map { case (a, i) =>
      Alias(GetStructField(mAttr, i, Some(a.name)), a.name)()
    }
    val restore = Project(restoredL ++ matchedFields, filtered)
    val fieldFor: Map[ExprId, Attribute] =
      fields.zip(matchedFields).map { case (a, al) => a.exprId -> al.toAttribute }.toMap

    val newAggExprs = agg.aggregateExpressions.map { ne =>
      ne.transformUp {
        case ae: AggregateExpression =>
          rewriteAgg(ae, tc.rt, fieldFor)
      }.asInstanceOf[NamedExpression]
    }
    Some(Aggregate(agg.groupingExpressions, newAggExprs, restore))
  }

  /** `r.t <= l.t` (or `<`, or flipped `l.t >= r.t`) with both sides bare
    * attributes on opposite inputs — the backward as-of conjunct.
    */
  private def timeConjunct(e: Expression, left: LogicalPlan,
                           right: LogicalPlan): Option[TimeConjunct] = {
    def sided(rt: Expression, lt: Expression, strict: Boolean) = (rt, lt) match {
      case (r: AttributeReference, l: AttributeReference)
          if right.outputSet.contains(r) && left.outputSet.contains(l) &&
            r.dataType == l.dataType =>
        Some(TimeConjunct(l, r, strict))
      case _ => None
    }
    e match {
      case LessThanOrEqual(x, y) => sided(x, y, strict = false)
      case GreaterThanOrEqual(x, y) => sided(y, x, strict = false)
      case LessThan(x, y) => sided(x, y, strict = true)
      case GreaterThan(x, y) => sided(y, x, strict = true)
      case _ => None
    }
  }

  /** Which right attributes an aggregate needs in the payload, or None if
    * it is not a rewritable `max(r.t)` / `max_by(v, r.t)`.
    */
  private def mappedAggKind(ae: AggregateExpression, rt: AttributeReference,
                            right: LogicalPlan): Option[Seq[AttributeReference]] = {
    if (ae.isDistinct || ae.filter.isDefined) return None
    ae.aggregateFunction match {
      case Max(e) if e.semanticEquals(rt) => Some(Nil)
      case MaxBy(v, o) if o.semanticEquals(rt) &&
          v.references.subsetOf(right.outputSet) && v.deterministic =>
        Some(v.references.toSeq.collect { case a: AttributeReference => a })
      case _ => None
    }
  }

  private def rewriteAgg(ae: AggregateExpression, rt: AttributeReference,
                         fieldFor: Map[ExprId, Attribute]): AggregateExpression =
    ae.aggregateFunction match {
      case Max(e) if e.semanticEquals(rt) =>
        Max(fieldFor(rt.exprId)).toAggregateExpression()
      case MaxBy(v, o) if o.semanticEquals(rt) =>
        val vMapped = v.transformUp {
          case a: AttributeReference if fieldFor.contains(a.exprId) => fieldFor(a.exprId)
        }
        MaxBy(vMapped, fieldFor(rt.exprId)).toAggregateExpression()
      case _ => ae
    }

  /** References of a named expression OUTSIDE any aggregate function —
    * these must all be left-side for the rewrite to stand.
    */
  private def topLevelRefs(ne: Expression): AttributeSet = ne match {
    case _: AggregateExpression => AttributeSet.empty
    case a: Attribute => AttributeSet(a)
    case other => AttributeSet(other.children.flatMap(c => topLevelRefs(c).toSeq))
  }
}
