package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/** Logical as-of join: for each left row, attach the right row with the
  * greatest `rightTs <= leftTs` among rows sharing the key (left-outer
  * semantics — unmatched left rows keep nulls). A whole-operator custom
  * node: Spark's logical algebra has no as-of join, and expressing it
  * relationally costs either an inequality-join explosion or a
  * union+window detour ([[graft.operators.AsOfJoin]]). The physical
  * counterpart ([[AsOfJoinExec]]) merges both sides in one pass per
  * partition after a co-partitioned sort — the plan shape of a sort-merge
  * join, with streaming point-in-time matching instead of pair output.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    rightVals: Seq[Attribute])
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightVals.map(a => a.withNullability(true).withName(a.name + "_asof"))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}
