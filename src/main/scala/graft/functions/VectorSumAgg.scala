package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Element-wise sum of `array<float>` vectors, quantized to integers: each
  * element contributes `trunc(x · 2^20)` to its dimension's running BIGINT
  * sum. One aggregation buffer of D longs per group.
  *
  * Why quantize: a double element-wise sum is order-dependent (shuffle and
  * merge order vary run to run and engine to engine), so a mean centroid
  * built from doubles can never hash-match an external oracle. Integer
  * addition is exact and commutative, and `x.toDouble · 2^20` is an EXACT
  * double (multiplying a float by a power of two shifts the exponent), so
  * `trunc` of it is engine-portable — DuckDB's
  * `CAST(trunc(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)` produces the
  * identical BIGINT. The quantized mean `sum / (n · 2^20)` is then one
  * deterministic double division on both engines.
  *
  * Why a custom `TypedImperativeAggregate` instead of
  * posexplode + groupBy(key, dim) + sum: the explode multiplies the shuffle
  * input D× (D=768 at embedding scale — a 768× shuffle amplification of the
  * corpus). Here the map side folds every vector into a single D-long buffer
  * per group, so the shuffle carries one row per (group, partition). Same
  * single-buffer pattern as [[MinHashAgg]].
  *
  * Headroom: |sum| ≤ n · max|x| · 2^20; 2^63 overflows only past ~8.8e12
  * unit-scale elements per dimension per group — far beyond any cell size
  * that a coarse quantizer would tolerate before re-splitting.
  */
case class VectorSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // A zero-length vector would alias the "uninitialized buffer" sentinel
    // (buf.length == 0) and slip past the ragged check below while still
    // counting toward the divisor in centroidsOf/meanDf — reject it.
    require(n > 0, "VectorSumAgg: empty embedding vector")
    val b = if (buf.length == 0) new Array[Long](n) else buf
    // Fail fast on ragged input: the buffer is sized from the first vector
    // seen per partition, so silently folding a different-length vector
    // (the old math.min) would drop dimensions nondeterministically —
    // which dims survive depends on partition visit order.
    require(n == b.length,
      s"VectorSumAgg: vector length $n != expected ${b.length} (ragged embedding column)")
    var i = 0
    while (i < n) {
      b(i) += (arr.getFloat(i).toDouble * VectorSumAgg.Scale).toLong
      i += 1
    }
    b
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    if (b1.length == 0) return b2
    if (b2.length == 0) return b1
    require(b1.length == b2.length,
      s"VectorSumAgg: merging buffers of length ${b1.length} and ${b2.length} (ragged embedding column)")
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    Array.fill(n)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): VectorSumAgg =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(inputAggBufferOffset = newOffset)
}

object VectorSumAgg {
  /** 2^20 — exact when multiplying any float (exponent shift). */
  val Scale: Double = 1048576.0d

  /** Column form: aggregate array<float> vectors into the element-wise
    * array<bigint> of quantized sums. */
  def vectorSum(e: Column): Column =
    ColumnBridge.column(VectorSumAgg(ColumnBridge.expression(e)).toAggregateExpression())
}
