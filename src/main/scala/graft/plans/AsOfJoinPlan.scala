package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Whole-operator extension tier (SURVEY.md §4 / builder ladder step (c)):
  * a native AS-OF JOIN as LogicalPlan + Strategy + physical SparkPlan.
  *
  * Semantics: for each left row, attach the RIGHT value columns of the
  * latest right row with the same key and rightTs <= leftTs (inclusive);
  * nulls when none precedes. Same result as JoinOps.asofJoinBackward
  * (asserted in AsOfJoinPlanSpec) but as a first-class operator:
  * EnsureRequirements co-partitions both sides on the key and sorts by
  * (key, ts), then a single streaming merge pass joins each partition —
  * no window state, no union row blow-up, and the sort/exchange are
  * visible to (and reusable by) the rest of the plan.
  *
  * Keys must be LongType; timestamps LongType or TimestampType (compared
  * on the internal long/micros representation) — enforced at construction
  * so the exec's raw getLong reads are always well-typed. Null keys or
  * timestamps join nothing (the left row is emitted with null asof_
  * columns; null right rows are skipped).
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    leftTs: Attribute,
    rightKey: Attribute,
    rightTs: Attribute,
    rightValues: Seq[Attribute]) extends BinaryNode {

  require(leftKey.dataType == LongType && rightKey.dataType == LongType,
    s"as-of join keys must be LongType, got ${leftKey.dataType}/${rightKey.dataType}")
  require(Seq(leftTs, rightTs).forall(a =>
      a.dataType == LongType || a.dataType == TimestampType),
    s"as-of join timestamps must be LongType or TimestampType, " +
      s"got ${leftTs.dataType}/${rightTs.dataType}")

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(a =>
      a.withName(s"asof_${a.name}").withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    leftTs: Attribute,
    rightKey: Attribute,
    rightTs: Attribute,
    rightValues: Seq[Attribute],
    outputAttrs: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] = outputAttrs

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyOrd = left.output.indexOf(leftKey)
    val lTsOrd = left.output.indexOf(leftTs)
    val rKeyOrd = right.output.indexOf(rightKey)
    val rTsOrd = right.output.indexOf(rightTs)
    val rValueOrds = rightValues.map(right.output.indexOf).toArray
    val rValueTypes = rightValues.map(_.dataType).toArray
    val outTypes = (left.output.map(_.dataType) ++ rValueTypes).toArray
    val nVals = rValueOrds.length

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // one-pass streaming merge over both (key, ts)-sorted sides
      val proj = UnsafeProjection.create(outTypes)
      val joined = new JoinedRow()
      val valsRow = new GenericInternalRow(nVals)
      val nullsRow = new GenericInternalRow(nVals)

      new Iterator[InternalRow] {
        private val rBuf = rIter.buffered
        private var haveMatch = false
        private var matchKey = 0L

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          // null key/ts joins nothing; ascending sort is NULLS FIRST so no
          // usable right rows are skipped by not consuming here
          if (l.isNullAt(lKeyOrd) || l.isNullAt(lTsOrd)) {
            proj(joined(l, nullsRow))
          } else {
            val lk = l.getLong(lKeyOrd)
            val lt = l.getLong(lTsOrd)
            // consume right rows up to (key < lk) or (key == lk && ts <= lt),
            // discarding null-key/null-ts rows; only key-equal rows become
            // the remembered as-of match
            while (rBuf.hasNext && {
              val h = rBuf.head
              h.isNullAt(rKeyOrd) || h.isNullAt(rTsOrd) || {
                val hk = h.getLong(rKeyOrd)
                hk < lk || (hk == lk && h.getLong(rTsOrd) <= lt)
              }
            }) {
              val h = rBuf.next()
              if (!h.isNullAt(rKeyOrd) && !h.isNullAt(rTsOrd) &&
                  h.getLong(rKeyOrd) == lk) {
                haveMatch = true
                matchKey = lk
                var i = 0
                while (i < nVals) {
                  // deep-copy: the source row buffer is reused by the
                  // iterator; copyValue handles UTF8String and the
                  // buffer-backed array/map/struct types too
                  valsRow.update(i,
                    InternalRow.copyValue(h.get(rValueOrds(i), rValueTypes(i))))
                  i += 1
                }
              }
            }
            val rSide = if (haveMatch && matchKey == lk) valsRow else nullsRow
            proj(joined(l, rSide))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j @ AsOfJoin(l, r, lk, lt, rk, rt, vals) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, vals, j.output) :: Nil
    case _ => Nil
  }
}
