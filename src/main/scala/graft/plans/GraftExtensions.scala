package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Catalyst optimizer rule (SURVEY.md §4 optional custom work): rewrite
  * intersection-emptiness tests into `arrays_overlap`.
  *
  *   size(array_intersect(a, b)) > 0    =>  arrays_overlap(a, b)
  *   size(array_intersect(a, b)) = 0    =>  NOT arrays_overlap(a, b)
  *   size(array_intersect(a, b)) >= 1   =>  arrays_overlap(a, b)
  *
  * `array_intersect` materializes the full intersection (hash set of one
  * side + probe of the other, building an output array); `arrays_overlap`
  * stops at the first hit and allocates nothing — on wide shingle arrays
  * in near-dup candidate filters this is the difference between O(|a|+|b|)
  * with allocation and early-exit probing.
  *
  * Null semantics are preserved: both expressions return null iff an
  * input is null (with legacy sizeOfNull=false, size(null)=null, and the
  * comparison propagates it), and arrays_overlap's null-element handling
  * only differs when the truth value would already be decided by overlap.
  * Restricted to comparisons against literal 0/1 where the equivalence is
  * exact.
  */
object RewriteIntersectOverlap extends Rule[LogicalPlan] {

  private object IntersectSize {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case Size(ArrayIntersect(a, b), _) => Some((a, b))
      case _ => None
    }
  }

  private def lit0(e: Expression): Boolean = e match {
    case Literal(0, IntegerType) => true
    case _ => false
  }
  private def lit1(e: Expression): Boolean = e match {
    case Literal(1, IntegerType) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case GreaterThan(IntersectSize(a, b), z) if lit0(z)         => ArraysOverlap(a, b)
    case GreaterThanOrEqual(IntersectSize(a, b), o) if lit1(o)  => ArraysOverlap(a, b)
    case LessThan(z, IntersectSize(a, b)) if lit0(z)            => ArraysOverlap(a, b)
    case EqualTo(IntersectSize(a, b), z) if lit0(z)             => Not(ArraysOverlap(a, b))
    case EqualTo(z, IntersectSize(a, b)) if lit0(z)             => Not(ArraysOverlap(a, b))
    case LessThanOrEqual(IntersectSize(a, b), z) if lit0(z)     => Not(ArraysOverlap(a, b))
  }
}

/** Session-extension entry point:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RewriteIntersectOverlap)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}
