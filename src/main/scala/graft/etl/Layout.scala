package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: z-order (Morton) clustering.
  *
  * Partition pruning (the reference's core bet) only helps on partition
  * columns; at 100 TB the next IO lever is clustering the data WITHIN files
  * so parquet min/max statistics prune row groups for predicates on
  * non-partition columns. Sorting by one column makes stats tight for that
  * column only; interleaving the bits of two normalized columns gives both
  * predicates traction on the same layout — each file covers a small
  * rectangle of (a, b) space instead of a thin stripe of one dimension.
  *
  * The write is one range shuffle (`repartitionByRange` on the z-key) plus
  * an in-partition sort — exactly the cost of a plain global sort, no extra
  * passes over the data beyond the 4-value min/max aggregate.
  */
object Layout {

  val ZBits = 16 // per-dimension resolution; 2 dims → 32-bit morton code

  /** Normalize a numeric column into [0, 2^ZBits) given its global min/max. */
  private def normalize(c: Column, lo: Double, hi: Double): Column = {
    val span = math.max(hi - lo, java.lang.Double.MIN_VALUE)
    least(
      floor((c.cast("double") - lit(lo)) / lit(span) * lit((1 << ZBits).toDouble)),
      lit((1 << ZBits) - 1.0)).cast("long")
  }

  /** Interleave the low [[ZBits]] bits of two long columns (a gets the odd
    * bit positions): the Morton / z-curve key. Pure bit arithmetic —
    * whole-stage-codegen'd, no UDF. */
  def mortonKey(a: Column, b: Column): Column =
    (0 until ZBits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_.bitwiseOR(_))

  /** Write `df` into `nFiles` parquet files z-ordered on (colA, colB).
    * Rows land in files by contiguous Morton-key range, so each file's
    * min/max footer stats for BOTH columns cover a small rectangle and a
    * selective predicate on either column skips most files/row groups. */
  def zorderWrite(df: DataFrame, colA: String, colB: String, nFiles: Int, path: String): Unit = {
    val stats = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
    val (loA, hiA, loB, hiB) =
      (stats.getDouble(0), stats.getDouble(1), stats.getDouble(2), stats.getDouble(3))
    df.withColumn("__zkey",
        mortonKey(
          normalize(col(colA), loA, hiA),
          normalize(col(colB), loB, hiB)))
      .repartitionByRange(nFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
      .write.mode("overwrite").option("compression", "snappy").parquet(path)
  }
}
