package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, CollectList, Max}
import org.apache.spark.sql.catalyst.expressions.objects.AssertNotNull
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.BooleanType

/** Catalyst optimizer rule (SURVEY.md §4.4 stretch): collapse the
  * collect-into-map-then-probe idiom into direct per-key aggregates.
  *
  *   element_at(map_from_entries(sort_array(collect_list(struct(k, v)))), 'a')
  *     =>  max(CASE WHEN k = 'a' THEN v END)
  *
  * The left form is the reference's dominant pattern (SURVEY §2.3/§2.4:
  * build the whole label->value map per group, then read a handful of
  * known keys). It buffers EVERY (k, v) pair of a group in the
  * collect_list aggregation buffer — per-group state is unbounded, the
  * sort is O(n log n) per group, and the map is materialized only to be
  * probed and thrown away. The right form is a constant-state codegen'd
  * max per requested key, map-side combinable — the q29 pivot shape,
  * derived automatically.
  *
  * The rewrite fires only where the equivalence is EXACT:
  *   - `spark.sql.mapKeyDedupPolicy` must be LAST_WIN. With sort_array
  *     ascending, entries of a duplicated key arrive sorted by value, so
  *     "last wins" selects the MAX value — exactly `max(CASE ...)` (null
  *     values sort first in ascending struct order and max ignores
  *     nulls, so those coincide too: null survives only when every
  *     duplicate's value is null). Under the default EXCEPTION policy a
  *     duplicate key must ABORT the query, which a max cannot
  *     reproduce — the rule leaves those plans alone.
  *   - the element_at must be non-throwing (failOnError = false, i.e.
  *     non-ANSI element_at or try_element_at): a missing key yields NULL
  *     on both sides. ANSI element_at throws on absent keys.
  *   - the probe key must be a literal; collect_list must be
  *     undistinct and unfiltered; the struct fields deterministic.
  *   - a NULL map key makes map_from_entries abort; the rewrite
  *     preserves abort-on-null via AssertNotNull around a nullable k
  *     (error class differs, error-vs-value behavior does not).
  *
  * Both plan shapes are handled: the probe inlined into the Aggregate's
  * result expressions (CollapseProject's single-use shape) and the
  * common Project-over-Aggregate shape where several element_at calls
  * share one map-building alias (CollapseProject keeps those separate
  * to avoid duplicating the expensive aggregate). In the latter case
  * the map alias itself is dropped when no other use remains, removing
  * the collect_list buffering entirely.
  */
object RewriteMapPivot extends Rule[LogicalPlan] {

  // getConf returns the typed Enumeration value, not the conf string
  private def lastWin: Boolean =
    conf.getConf(SQLConf.MAP_KEY_DEDUP_POLICY).toString == "LAST_WIN"

  /** map_from_entries(sort_array(collect_list(struct(k, v)), asc)) */
  private object SortedEntriesMap {
    def unapply(e: Expression): Option[(AggregateExpression, Expression, Expression)] =
      e match {
        case MapFromEntries(SortArray(
            ae @ AggregateExpression(cl: CollectList, _, false, None, _),
            Literal(true, BooleanType))) =>
          cl.child match {
            case cns: CreateNamedStruct if cns.valExprs.size == 2 &&
                cns.valExprs.forall(_.deterministic) =>
              Some((ae, cns.valExprs.head, cns.valExprs(1)))
            case _ => None
          }
        case _ => None
      }
  }

  private def pivotAgg(ae: AggregateExpression, k: Expression, v: Expression,
                       key: Literal): AggregateExpression = {
    // map_from_entries aborts on a null key; keep that behavior
    val keyRef = if (k.nullable) AssertNotNull(k) else k
    ae.copy(
      aggregateFunction = Max(CaseWhen(Seq((EqualTo(keyRef, key), v)), None)),
      resultId = NamedExpression.newExprId)
  }

  /** Shape 1: the whole chain inlined in one node's expressions (legal
    * only inside an Aggregate, which is the only place an
    * AggregateExpression subtree can live).
    */
  private def rewriteInlined(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ElementAt(SortedEntriesMap(ae, k, v), key: Literal, None, false) =>
        pivotAgg(ae, k, v, key)
    }

  /** Shape 2: Project [.. element_at(m, 'k') ..] over Aggregate
    * [.. m = map_from_entries(...) ..]. Rewritten only when EVERY use of
    * m is a literal-key non-throwing element_at — any other use keeps
    * the map (and the rule bails rather than computing it twice).
    */
  private def rewriteProjected(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projList, agg: Aggregate) =>
      val cands = agg.aggregateExpressions.collect {
        case a @ Alias(SortedEntriesMap(ae, k, v), _) => a.exprId -> ((ae, k, v))
      }.toMap
      if (cands.isEmpty) p
      else {
        def hasOtherUse(e: Expression, id: ExprId): Boolean = e match {
          case ElementAt(ar: AttributeReference, _: Literal, None, false)
              if ar.exprId == id => false
          case ar: AttributeReference if ar.exprId == id => true
          case other => other.children.exists(hasOtherUse(_, id))
        }
        val usable = cands.keySet.filter(id => projList.forall(!hasOtherUse(_, id)))
        if (usable.isEmpty) p
        else {
          val pivots = mutable.LinkedHashMap.empty[(ExprId, Literal), Alias]
          val newProj = projList.map(_.transform {
            case ElementAt(ar: AttributeReference, key: Literal, None, false)
                if usable(ar.exprId) =>
              val (ae, k, v) = cands(ar.exprId)
              pivots.getOrElseUpdate((ar.exprId, key),
                Alias(pivotAgg(ae, k, v, key), s"_pivot_${key.toString}")()
              ).toAttribute
          }.asInstanceOf[NamedExpression])
          val keptAggs = agg.aggregateExpressions.filterNot(a => usable(a.exprId))
          Project(newProj,
            agg.copy(aggregateExpressions = keptAggs ++ pivots.values))
        }
      }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!lastWin) plan else rewriteProjected(rewriteInlined(plan))
}
