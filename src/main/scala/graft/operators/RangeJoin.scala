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

  /** Interval OVERLAP join: all (a, b) pairs whose [start, end] windows
    * intersect (`a.s <= b.e AND b.s <= a.e`), optionally under equi-keys.
    * The Spark-native plan for the raw theta condition is a nested-loop
    * cross product; bucketing by a coarse time grid turns it into one
    * equi-shuffle join, the same move [[apply]] makes for point-tolerance.
    *
    * Each interval is replicated to every grid bucket it covers
    * (replication = len/width + 1 — pick `bucketWidthMillis` near the
    * typical interval length to keep it ~2×). Overlapping pairs share at
    * least the bucket containing the overlap's START, max(a.s, b.s) —
    * which both coverage ranges include — so emitting a pair ONLY from
    * that canonical bucket both dedupes (no distinct shuffle) and keeps
    * full recall; an exact overlap filter then drops neighbors that share
    * a bucket without intersecting.
    *
    * Output: all left + right columns + `overlap_ms` (inclusive-bound
    * intersection length, >= 0). Column names must be disjoint. */
  def intervalJoin(
      left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketWidthMillis: Long, equiKeys: Seq[String] = Nil): DataFrame = {
    require(bucketWidthMillis > 0)
    def cover(df: DataFrame, s: String, e: String, sAs: String, eAs: String) =
      // NTZ parquet timestamps: widen to LTZ for unix_millis (sessions run
      // UTC, so the cast is value-identity)
      df.withColumn(sAs, unix_millis(col(s).cast("timestamp")))
        .withColumn(eAs, unix_millis(col(e).cast("timestamp")))
        .withColumn("__bucket",
          explode(sequence(
            floor(col(sAs) / bucketWidthMillis),
            floor(col(eAs) / bucketWidthMillis))))
    val l = cover(left, lStart, lEnd, "__ls", "__le")
    val r = cover(right, rStart, rEnd, "__rs", "__re")
    // Both sides are corpus-sized after replication and the join's cost is
    // its pair OUTPUT — pin a shuffled hash join so AQE's input-sized
    // broadcast choice can't serialize the explosion (or OOM the driver).
    l.hint("shuffle_hash").join(r.hint("shuffle_hash"), (equiKeys :+ "__bucket").toSeq)
      .filter(col("__ls") <= col("__re") && col("__rs") <= col("__le"))
      .filter(col("__bucket") ===
        floor(greatest(col("__ls"), col("__rs")) / bucketWidthMillis))
      .withColumn("overlap_ms",
        least(col("__le"), col("__re")) - greatest(col("__ls"), col("__rs")))
      .drop("__bucket", "__ls", "__le", "__rs", "__re")
  }
}
