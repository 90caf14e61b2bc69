package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** Bounded top-k per group: keeps the k best (score, id) pairs under the
  * total order (score DESC, id ASC) in a k-slot insertion buffer.
  *
  * Why a custom aggregate instead of `row_number().over(partitionBy(key))`
  * + filter: the window formulation shuffles and sorts EVERY candidate row
  * (measured: exhaustive ADC at 2k queries × 100k vectors = 200M scored
  * pairs → a multi-GB exchange + sort, 756 s). Here the map side folds each
  * partition's candidates into k-slot buffers, so the exchange carries at
  * most k rows per (group, partition) — the classic two-phase top-k, and
  * the same single-buffer pattern as [[VectorSumAgg]]/[[MinHashAgg]].
  *
  * Determinism: insertion keeps the buffer sorted under a TOTAL order
  * (ties broken by id), and merge is an ordered merge of two sorted
  * buffers — output is independent of partitioning and arrival order.
  * Output: `array<struct<score double, id bigint>>`, best first.
  */
case class TopKAgg(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Buf] with ImplicitCastInputTypes {

  require(k > 0, s"TopKAgg: k must be positive, got $k")

  // Analysis-time typing: a non-(double, bigint) call site gets a cast (or
  // an AnalysisException) instead of a runtime ClassCastException in
  // update() (review finding). Declared Seq[DataType] — covariant — because
  // AbstractDataType is private[sql] outside Spark's own tree.
  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType)

  override def createAggregationBuffer(): TopKAgg.Buf = new TopKAgg.Buf(k)

  override def update(buf: TopKAgg.Buf, input: InternalRow): TopKAgg.Buf = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(b1: TopKAgg.Buf, b2: TopKAgg.Buf): TopKAgg.Buf = {
    var i = 0
    while (i < b2.n) { b1.insert(b2.score(i), b2.id(i)); i += 1 }
    b1
  }

  override def eval(buf: TopKAgg.Buf): Any = {
    val rows = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      rows(i) = new GenericInternalRow(Array[Any](buf.score(i), buf.id(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKAgg.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.score(i)); bb.putLong(buf.id(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new TopKAgg.Buf(k)
    var i = 0
    while (i < n) { buf.insert(bb.getDouble(), bb.getLong()); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
}

object TopKAgg {

  /** k-slot insertion buffer, kept sorted by (score DESC, id ASC). Linear
    * shift insertion — k is small (retrieval top-k), and candidates that
    * don't beat the current worst exit after one comparison. */
  final class Buf(k: Int) {
    val score = new Array[Double](k)
    val id = new Array[Long](k)
    var n = 0

    // java.lang.Double.compare, not '>': Spark's ordering is a TOTAL order
    // with NaN greatest and -0.0 < 0.0 — primitive '>' would rank NaN worst
    // and diverge from the row_number window formulation this aggregate
    // claims equivalence with (review finding).
    private def beats(s: Double, i: Long, pos: Int): Boolean = {
      val c = java.lang.Double.compare(s, score(pos))
      c > 0 || (c == 0 && i < id(pos))
    }

    def insert(s: Double, i: Long): Unit = {
      if (n == k && !beats(s, i, n - 1)) return
      var pos = if (n < k) n else n - 1
      // shift worse entries down; k-slot arrays, so the last falls off
      while (pos > 0 && beats(s, i, pos - 1)) {
        score(pos) = score(pos - 1); id(pos) = id(pos - 1); pos -= 1
      }
      score(pos) = s; id(pos) = i
      if (n < k) n += 1
    }
  }

  /** Column form: `array<struct<score, id>>` of the k best rows per group
    * under (score DESC, id ASC). */
  def topK(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(TopKAgg(
      ColumnBridge.expression(score), ColumnBridge.expression(id), k).toAggregateExpression())
}
