package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Physical as-of join. Both children are hash-clustered on the key and
  * sorted by (key, ts) — the same requirements a sort-merge join declares,
  * so EnsureRequirements inserts exactly one exchange + sort per side.
  * Each partition is then merged in ONE streaming pass: the right iterator
  * advances while its (key, ts) is ≤ the current left row's, remembering
  * the latest right values per key; every left row is emitted once with
  * that match (or nulls). O(|L|+|R|) per partition, no pair blowup, no
  * union/window state — strictly less work than both relational
  * formulations of the operator.
  */
final case class AsOfJoinExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    rightVals: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightVals.map(a => a.withNullability(true).withName(a.name + "_asof"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftTs, org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTs, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val rightValsLocal = rightVals
    val leftOut = left.output
    val rightOut = right.output
    val lk = leftKey
    val rk = rightKey
    val lt = leftTs
    val rt = rightTs
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val leftKeyProj = UnsafeProjection.create(Seq(lk), leftOut)
      val rightKeyProj = UnsafeProjection.create(Seq(rk), rightOut)
      val leftTsProj = UnsafeProjection.create(Seq(lt), leftOut)
      val rightTsProj = UnsafeProjection.create(Seq(rt), rightOut)
      val rightValsProj = UnsafeProjection.create(rightValsLocal, rightOut)
      val keyOrdering =
        org.apache.spark.sql.catalyst.expressions.RowOrdering
          .createNaturalAscendingOrdering(Seq(lk.dataType))
      val nullRight = new GenericInternalRow(rightValsLocal.length)
      val joined = new JoinedRow
      // SparkPlan contract: doExecute must emit UnsafeRow (collect and
      // shuffle cast to it); project the JoinedRow positionally.
      val toUnsafe = UnsafeProjection.create(output.map(_.dataType).toArray)

      new Iterator[InternalRow] {
        private var rHead: InternalRow = _
        private var rHeadKey: InternalRow = _
        private var rHeadTs: Long = 0L
        // NULL-keyed / NULL-ts right rows can never satisfy the oracle's
        // predicates (k = k AND lts >= rts are both non-true on NULL), so
        // they are skipped HERE, in the operator — callers like
        // AsOfJoin.native pre-filter them only as an optimization. Without
        // this skip, nulls-first sort order would put them at the head of
        // the partition and keyOrdering.compare would happily match them.
        private def advanceRight(): Unit = {
          while (rIter.hasNext) {
            rHead = rIter.next()
            val k = rightKeyProj(rHead)
            val t = rightTsProj(rHead)
            if (!k.isNullAt(0) && !t.isNullAt(0)) {
              rHeadKey = k.copy()
              rHeadTs = t.getLong(0)
              return
            }
          }
          rHead = null
        }
        advanceRight()

        private var matchKey: InternalRow = _
        private var matchVals: InternalRow = _

        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = leftKeyProj(l)
          val lTsRow = leftTsProj(l)
          // NULL left key or ts: no predicate can be true → emit nulls
          // (a null slot would otherwise read as epoch 0 and match).
          if (lKey.isNullAt(0) || lTsRow.isNullAt(0))
            return toUnsafe(joined(l, nullRight))
          val lTs = lTsRow.getLong(0)
          // consume right rows at or before (lKey, lTs)
          while (rHead != null && {
            val c = keyOrdering.compare(rHeadKey, lKey)
            c < 0 || (c == 0 && rHeadTs <= lTs)
          }) {
            if (keyOrdering.compare(rHeadKey, lKey) == 0) {
              matchKey = rHeadKey
              matchVals = rightValsProj(rHead).copy()
            }
            advanceRight()
          }
          val matched =
            matchVals != null && matchKey != null && keyOrdering.compare(matchKey, lKey) == 0
          toUnsafe(joined(l, if (matched) matchVals else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
