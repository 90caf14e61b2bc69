package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The k smallest DISTINCT long values in one bounded buffer — the KMV
  * distinct-count sketch (Bar-Yossef et al., RANDOM'02) as a single
  * aggregate. The stats-catalog build previously spelled this as
  * `distinct()` → TopKAgg (a full shuffle of every distinct value, just
  * to keep 64 of them); here the dedup happens INSIDE the k-slot buffer,
  * so the map side folds each partition into ≤ k values and the exchange
  * carries k longs per partition — ANALYZE-shape statistics in ONE pass
  * with no distinct shuffle, and the same buffer composes into
  * `Dataset.observe` (stats collected as a side effect of writing the
  * table — zero extra passes).
  *
  * Determinism: the buffer is a sorted ascending array with exact-match
  * skip; merge is ordered dedup-merge. The result (ascending array of
  * the k global smallest DISTINCT HASH VALUES) is independent of
  * partitioning and arrival order (ProfilingSpec pins it against
  * distinct+sort+take(k)). Semantics note: the old distinct()+TopKAgg
  * chain deduped VALUES but kept colliding HASHES as separate slots;
  * this buffer keeps the distinct hash SET — the paired SQL replays
  * (sqlKmvD / sqlJoinCardinality / x29's day chain) rank over
  * `SELECT DISTINCT … h` to match, so a sampleKey collision inside a
  * scope's bottom-k can never hash-split the gate. Nulls are skipped. */
case class KmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvAgg.Buf] with ImplicitCastInputTypes {

  require(k > 0, s"KmvAgg: k must be positive, got $k")

  override def inputTypes: Seq[DataType] = Seq(LongType)

  override def createAggregationBuffer(): KmvAgg.Buf = new KmvAgg.Buf(k)

  override def update(buf: KmvAgg.Buf, input: InternalRow): KmvAgg.Buf = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: KmvAgg.Buf, b2: KmvAgg.Buf): KmvAgg.Buf = {
    var i = 0
    while (i < b2.n) { b1.insert(b2.vals(i)); i += 1 }
    b1
  }

  override def eval(buf: KmvAgg.Buf): Any = {
    val out = new Array[Long](buf.n)
    System.arraycopy(buf.vals, 0, out, 0, buf.n)
    new GenericArrayData(out)
  }

  override def serialize(buf: KmvAgg.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.vals(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new KmvAgg.Buf(k)
    var i = 0
    while (i < n) { buf.insert(bb.getLong()); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvAgg =
    copy(child = newChildren(0))
  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
}

object KmvAgg {

  /** Sorted ascending k-slot buffer of DISTINCT longs. Binary search for
    * the insertion point (k is small but update runs per input row —
    * log k beats a linear scan on misses past the max). */
  final class Buf(k: Int) {
    val vals = new Array[Long](k)
    var n = 0

    def insert(v: Long): Unit = {
      if (n == k && v >= vals(n - 1)) return
      var lo = 0
      var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (vals(mid) < v) lo = mid + 1 else hi = mid
      }
      if (lo < n && vals(lo) == v) return // already kept — distinct set
      val last = if (n < k) n else n - 1
      var i = last
      while (i > lo) { vals(i) = vals(i - 1); i -= 1 }
      vals(lo) = v
      if (n < k) n += 1
    }
  }

  /** Column form: ascending `array<bigint>` of the k smallest distinct
    * values of `v` (nulls skipped). */
  def kMinValues(v: Column, k: Int): Column =
    ColumnBridge.column(KmvAgg(
      ColumnBridge.expression(v), k).toAggregateExpression())
}
