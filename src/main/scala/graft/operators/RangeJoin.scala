package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Temporal range join WITHOUT an equi-key: all (a, b) pairs with
  * |b.ts − a.ts| ≤ tolerance. The naive plan is a cross product with a
  * theta filter (BroadcastNestedLoopJoin — O(|A|·|B|), dead at scale).
  *
  * Bucketing turns it into an equi-join: bucket each timestamp by
  * floor(ms / tolerance); any qualifying pair differs by at most one
  * bucket, so replicating ONE side into its three covering buckets
  * (b−1, b, b+1) and hash-joining on the bucket finds every pair — a
  * normal shuffle join with 3× one side, then an exact |Δt| filter drops
  * the false candidates from neighboring buckets.
  */
object RangeJoin {

  /** Output: all left columns + all right columns + `dt_ms` (right − left).
    * Column names must be disjoint between the two sides. */
  def apply(
      left: DataFrame,
      right: DataFrame,
      leftTs: String,
      rightTs: String,
      toleranceMillis: Long): DataFrame = {
    require(toleranceMillis > 0)
    val l = left
      .withColumn("__lms", unix_millis(col(leftTs)))
      .withColumn("__bucket", floor(col("__lms") / toleranceMillis))
    val r = right
      .withColumn("__rms", unix_millis(col(rightTs)))
      .withColumn("__off", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__bucket", col("__off") + floor(col("__rms") / toleranceMillis))
      .drop("__off")
    l.join(r, Seq("__bucket"))
      .filter(abs(col("__rms") - col("__lms")) <= toleranceMillis)
      .withColumn("dt_ms", col("__rms") - col("__lms"))
      .drop("__bucket", "__lms", "__rms")
  }
}
