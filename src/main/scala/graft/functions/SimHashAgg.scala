package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash in one aggregation buffer: `nBits` signed counters, one per bit
  * position; each input token hash h adds +1 to counter j when bit j of h
  * is set, else −1. The final signature sets bit j when counter j > 0.
  *
  * Same scale rationale as [[MinHashAgg]]: the equivalent built-in
  * formulation (cross join with a bits table + two groupBys) multiplies the
  * shuffle by nBits; this folds map-side into one row per (doc, partition).
  * Bit semantics match the cross-join version exactly, so the DuckDB oracle
  * (which replays that version) produces identical signatures.
  */
case class SimHashAgg(
    child: Expression,
    nBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def createAggregationBuffer(): Array[Int] = new Array[Int](nBits)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < nBits) {
        buf(j) += (if (((h >> j) & 1L) != 0L) 1 else -1)
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var j = 0
    while (j < nBits) { b1(j) += b2(j); j += 1 }
    b1
  }

  override def eval(buf: Array[Int]): Any = {
    var sig = 0L
    var j = 0
    while (j < nBits) { if (buf(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * nBits)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(nBits)(bb.getInt())
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
}

object SimHashAgg {
  def simhash(h: Column, nBits: Int): Column =
    ColumnBridge.column(SimHashAgg(ColumnBridge.expression(h), nBits).toAggregateExpression())
}
