package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All-k MinHash in one aggregation buffer: for each input shingle hash h,
  * updates k permutation minima `min_i (a_i·h + b_i) mod P` in place.
  *
  * Why a custom `TypedImperativeAggregate` instead of
  * explode(k) + groupBy(doc, i) + min: the explode multiplies the shuffle
  * input k× (8.3M rows at sf0.1, k=32). Here the map side folds every
  * shingle into a single k-long buffer per document, so the shuffle carries
  * one row per (document, partition) — the difference between "works" and
  * "works at 100 TB". Permutation formula matches
  * [[TextHash.minhashPerm]] exactly, so the DuckDB oracle (which replays
  * the explode formulation) produces identical signatures.
  */
case class MinHashAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  import GraftExprs.Prime

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < k) {
        val a = (i.toLong * 2654435761L) % Prime + 1L
        val b = (i.toLong * 40503L + 7L) % Prime
        val p = (a * h + b) % Prime
        if (p < buf(i)) buf(i) = p
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
}

object MinHashAgg {
  /** Column form: aggregate a bigint hash column into array<bigint> of k minima. */
  def minhash(h: Column, k: Int): Column =
    ColumnBridge.column(MinHashAgg(ColumnBridge.expression(h), k).toAggregateExpression())
}
