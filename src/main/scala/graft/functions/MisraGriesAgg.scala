package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitter sketch as a mergeable typed aggregate: at most
  * `capacity` (token, counter) entries per buffer; any token whose true
  * frequency exceeds N/(capacity+1) is GUARANTEED to survive every
  * decrement and merge (total decrement mass ≤ N/(capacity+1) — the
  * classic MG bound, preserved by the Agarwal-et-al. merge: combine
  * counters, subtract the (capacity+1)-th largest, keep positives).
  *
  * The candidate SET depends on partitioning/arrival order (counters are
  * order-sensitive), so the sketch is used like the Bloom prefilter in
  * `bloomContamination`: a guaranteed SUPERSET that an exact counting pass
  * verifies — the operator's final output is exact and deterministic, the
  * sketch only prunes the full-vocabulary shuffle to ≤ capacity tokens.
  *
  * Scale shape: map-side partial buffers of `capacity` entries fold each
  * partition's tokens locally; the exchange carries one ≤ capacity-entry
  * buffer per partition — never the vocabulary.
  */
case class MisraGriesAgg(
    tokenExpr: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesAgg.Buf] with ImplicitCastInputTypes {

  require(capacity > 0, s"MisraGriesAgg: capacity must be positive, got $capacity")

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def createAggregationBuffer(): MisraGriesAgg.Buf =
    new MisraGriesAgg.Buf(capacity)

  override def update(buf: MisraGriesAgg.Buf, input: InternalRow): MisraGriesAgg.Buf = {
    val t = tokenExpr.eval(input)
    // UTF8String may alias reusable row memory — copy to an owned String.
    if (t != null) buf.add(t.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(b1: MisraGriesAgg.Buf, b2: MisraGriesAgg.Buf): MisraGriesAgg.Buf = {
    b2.counts.foreach { case (tok, c) => b1.addNoDecrement(tok, c) }
    b1.shrinkToCapacity()
    b1
  }

  override def eval(buf: MisraGriesAgg.Buf): Any =
    new GenericArrayData(
      buf.counts.keysIterator.toArray.sorted.map(UTF8String.fromString): Array[Any])

  override def serialize(buf: MisraGriesAgg.Buf): Array[Byte] = {
    val entries = buf.counts.toSeq
    val bytesPer = entries.map { case (t, _) => t.getBytes(StandardCharsets.UTF_8) }
    val bb = ByteBuffer.allocate(4 + bytesPer.map(_.length + 12).sum)
    bb.putInt(entries.size)
    entries.zip(bytesPer).foreach { case ((_, c), tb) =>
      bb.putInt(tb.length); bb.put(tb); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MisraGriesAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new MisraGriesAgg.Buf(capacity)
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val tb = new Array[Byte](len)
      bb.get(tb)
      buf.addNoDecrement(new String(tb, StandardCharsets.UTF_8), bb.getLong())
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(tokenExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(tokenExpr = newChildren(0))
  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
}

object MisraGriesAgg {

  /** ≤ capacity (token → counter) entries. */
  final class Buf(capacity: Int) {
    val counts = scala.collection.mutable.HashMap.empty[String, Long]

    /** Stream update: increment, admit, or decrement-all (classic MG). */
    def add(tok: String, c: Long): Unit =
      counts.get(tok) match {
        case Some(v) => counts.update(tok, v + c)
        case None if counts.size < capacity => counts.update(tok, c)
        case None =>
          // decrement every counter by min(c, smallest); with c=1 (the
          // per-row case) this is the textbook decrement-all step
          val d = math.min(c, counts.valuesIterator.min)
          val dead = List.newBuilder[String]
          counts.mapValuesInPlace((_, v) => v - d)
          counts.foreach { case (k, v) => if (v <= 0) dead += k }
          dead.result().foreach(counts.remove)
          val rem = c - d
          if (rem > 0) add(tok, rem) // room freed unless nothing died
      }

    /** Merge path: plain counter addition; caller shrinks afterwards. */
    def addNoDecrement(tok: String, c: Long): Unit =
      counts.update(tok, counts.getOrElse(tok, 0L) + c)

    /** Agarwal et al. MG merge tail: subtract the (capacity+1)-th largest
      * counter from all, keep strictly-positive survivors (≤ capacity by
      * construction). */
    def shrinkToCapacity(): Unit =
      if (counts.size > capacity) {
        val sorted = counts.valuesIterator.toArray.sortInPlace()(Ordering[Long].reverse)
        val d = sorted(capacity) // (capacity+1)-th largest
        val dead = List.newBuilder[String]
        counts.mapValuesInPlace((_, v) => v - d)
        counts.foreach { case (k, v) => if (v <= 0) dead += k }
        dead.result().foreach(counts.remove)
      }
  }

  /** Column form: `array<string>` candidate heavy hitters (sorted, for
    * presentation only — the set is the contract, see class doc). */
  def candidates(token: Column, capacity: Int): Column =
    ColumnBridge.column(MisraGriesAgg(
      ColumnBridge.expression(token), capacity).toAggregateExpression())
}
