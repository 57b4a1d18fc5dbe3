package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable join operators Spark lacks natively (SURVEY.md §2.5). */
object JoinOps {

  /** Backward as-of join: for every left row, attach the latest right
    * values with `right.ts <= left.ts` on the same key (inclusive).
    *
    * Implementation is the scale-correct union + single window pass:
    * O(n log n) per key, ONE shuffle on the key — never the range
    * cross-product a naive `l.key = r.key AND l.ts >= r.ts` join
    * produces (quadratic per key, un-broadcastable at 100 TB). Right
    * rows sort before left rows at equal timestamps => inclusive.
    *
    * Output: all left columns plus `asof_<c>` for each requested right
    * value column (null when no right row precedes the left row).
    *
    * The right values are carried through the window as ONE struct per
    * right row, so every `asof_` column comes from the SAME latest right
    * row — even when that row holds nulls in some value columns. (A
    * per-column `last(..., ignoreNulls)` would stitch values from
    * different right rows whenever the latest row has a null; that is
    * neither as-of semantics nor what AsOfJoinExec produces.)
    */
  def asofJoinBackward(left: DataFrame, right: DataFrame, key: String,
                       leftTs: String, rightTs: String,
                       valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq

    val lProj = left.select(
      leftCols.map(col) ++
        Seq(lit(1).as("_side"), col(leftTs).as("_ts")) ++
        valueCols.map(c =>
          lit(null).cast(right.schema(c).dataType).as(s"_r_$c")): _*)

    val rProj = right.select(
      leftCols.map(c =>
        if (c == key) col(key)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(lit(0).as("_side"), col(rightTs).as("_ts")) ++
        valueCols.map(c => col(c).as(s"_r_$c")): _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // one struct per right row (null for left rows) => one window pass,
    // and all asof_ values provably originate from the same right row
    val rightRowStruct = when(col("_side") === 0,
      struct(valueCols.map(c => col(s"_r_$c").as(c)): _*))
    val carried = lProj.unionByName(rProj)
      .withColumn("_asof_row", last(rightRowStruct, ignoreNulls = true).over(w))
    carried.filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(c => col("_asof_row").getField(c).as(s"asof_$c")): _*)
  }

  /** Native-operator form of the backward as-of join: builds the custom
    * graft.plans.AsOfJoin logical node, planned by AsOfJoinStrategy into
    * a co-partitioned sort-merge AsOfJoinExec. Requires a session built
    * `.withExtensions(new graft.plans.GraftExtensions)`; integral key,
    * timestamp/long ts columns.
    */
  def asofJoinNative(left: DataFrame, right: DataFrame, key: String,
                     leftTs: String, rightTs: String,
                     valueCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.graftshim.Shim
    val lPlan = Shim.analyzed(left)
    // Self-join hygiene: when both sides derive from the same scan they
    // share attribute exprIds, and downstream rules (column pruning,
    // exchange binding) cannot tell the right child's columns from the
    // left's — Catalyst's DeduplicateRelations does this for built-in
    // joins but not for a custom BinaryNode. Re-aliasing every right
    // column mints fresh exprIds whenever the outputs overlap.
    val rightFresh =
      if (lPlan.outputSet.intersect(Shim.analyzed(right).outputSet).nonEmpty)
        right.select(right.columns.map(c => col(c).as(c)): _*)
      else right
    val rPlan = Shim.analyzed(rightFresh)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             name: String) =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    Shim.ofRows(left.sparkSession, graft.plans.AsOfJoin(
      lPlan, rPlan,
      attr(lPlan, key), attr(lPlan, leftTs),
      attr(rPlan, key), attr(rPlan, rightTs),
      valueCols.map(attr(rPlan, _))))
  }
}
