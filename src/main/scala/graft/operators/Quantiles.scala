package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType, StructField, StructType}

/** Exact interpolated quantiles (SQL `quantile_cont` semantics) WITHOUT the
  * per-group value buffer.
  *
  * Spark's exact `percentile` is a TypedImperativeAggregate holding an
  * OpenHashMap of (value → count) PER GROUP — on continuous doubles at
  * 100 TB with a handful of groups that is one unbounded in-memory buffer
  * per group, the classic correct-at-test-scale/OOM-at-scale hazard. This
  * operator computes the SAME interpolated value by rank selection on the
  * [[Ranking.globalRank]] machinery instead:
  *
  *  1. range-shuffle on (group, value) + in-partition sort — each group
  *     spans contiguous range partitions, no partition ever holds more
  *     than ~|data|/numPartitions rows regardless of group skew;
  *  2. per-(partition, group) counts → driver-side prefix offsets (bounded
  *     by numPartitions × |groups|, metadata-plane — this operator is for
  *     LOW-cardinality group-bys, the exact case where the value-buffer
  *     aggregate is most dangerous; high-cardinality groups don't buffer
  *     enough per group to need it);
  *  3. per-group rank = offset + intra-(partition, group) `row_number`;
  *  4. each requested q needs only the rows at ranks ⌊q·(n−1)⌋+1 and
  *     ⌈q·(n−1)⌉+1 — a broadcast join against a (|groups|·|qs|·2)-row
  *     target table selects them, and one two-row weighted sum per
  *     (group, q) interpolates.
  *
  * Interpolation matches DuckDB's `quantile_cont` BIT-FOR-BIT (empirically
  * pinned against discriminating cases): `pos = q·(n−1)` as one double
  * multiply, `f = pos − ⌊pos⌋`, result `= v_lo·(1−f) + v_hi·f` — the
  * weighted two-term form, NOT the algebraically-equal-but-last-ulp-
  * different `v_lo + f·(v_hi − v_lo)`. The two weighted products are summed
  * by a two-row `sum()`, which is order-insensitive for two doubles.
  *
  * The range-partitioned frame is cached as a barrier for the same reason
  * as [[Ranking.globalRank]]: `repartitionByRange` resamples boundaries per
  * action, and the offsets map must describe the same placement the rank
  * pass reads. Rank VALUES are placement-independent; placement itself is
  * not. Callers quantiling corpus-scale data repeatedly should persist the
  * result and unpersist (same contract as globalRank / bm25's tf cache).
  */
object Quantiles {

  /** One row per group: `groupCol`, then one exact `quantile_cont(q)`
    * column per `(q, outName)` pair. `df` needs no other columns. */
  def groupedQuantileCont(df: DataFrame, groupCol: String, valueCol: String,
      qs: Seq[(Double, String)], numPartitions: Int = 0): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (q, _) => q >= 0.0 && q <= 1.0 })
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    val base = df.select(col(groupCol).cast(StringType).as("__g"),
      col(valueCol).cast(DoubleType).as("__v"))
      .filter(col("__v").isNotNull)
    val parted = base
      .repartitionByRange(n, col("__g"), col("__v"))
      .sortWithinPartitions(col("__g"), col("__v"))
      .withColumn("__pid", spark_partition_id())
      .cache()
    // Metadata plane: numPartitions × |groups| rows, NOT data-sized.
    val counts = parted.groupBy(col("__pid"), col("__g"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(1), r.getInt(0)) -> r.getLong(2))
      .toMap
    val groups = counts.keys.map(_._1).toSeq.distinct.sorted
    // Per-(group, pid) offset = rows of that group in earlier partitions;
    // per-group total n_g for the rank targets.
    val offsets: Map[(String, Int), Long] = groups.flatMap { g =>
      var acc = 0L
      (0 until n).map { p =>
        val o = (g, p) -> acc
        acc += counts.getOrElse((g, p), 0L)
        o
      }
    }.toMap
    val totals: Map[String, Long] =
      groups.map(g => g -> (0 until n).map(p => counts.getOrElse((g, p), 0L)).sum).toMap
    // Target rows: (group, rank, qIdx, weight). f == 0 → single row with
    // weight 1.0 (v·1.0 ≡ v bitwise); else lo row weight 1−f, hi row f.
    val targetRows = groups.flatMap { g =>
      val m = totals(g)
      qs.zipWithIndex.flatMap { case ((q, _), i) =>
        val pos = q * (m - 1).toDouble // the oracle's index arithmetic
        val frn = math.floor(pos)
        val f = pos - frn
        val loRank = frn.toLong + 1L
        if (f == 0.0) Seq(Row(g, loRank, i, 1.0))
        else Seq(Row(g, loRank, i, 1.0 - f), Row(g, loRank + 1L, i, f))
      }
    }
    val targets = spark.createDataFrame(
      spark.sparkContext.parallelize(targetRows, 1),
      StructType(Seq(
        StructField("__g", StringType), StructField("__rank", LongType),
        StructField("__qi", IntegerType), StructField("__w", DoubleType))))
    // Partition pre-prune: the offsets map tells the driver exactly which
    // (group, pid) slabs contain a target rank — only THOSE partitions
    // (≤ |groups|·|qs|·2 of them) need the rank window at all; the rest
    // are dropped by a pid filter before any sort. The rank pass still
    // MUST read the same placement the offsets were computed from — the
    // cache above is that barrier.
    val targetRanks: Map[String, Set[Long]] =
      targetRows.groupBy(_.getString(0))
        .map { case (g, rows) => g -> rows.map(_.getLong(1)).toSet }
    val keepPids: Set[Int] = offsets.collect {
      case ((g, p), off) if {
        val cnt = counts.getOrElse((g, p), 0L)
        cnt > 0L && targetRanks(g).exists(r => r > off && r <= off + cnt)
      } => p
    }.toSet
    val w = Window.partitionBy(col("__pid"), col("__g")).orderBy(col("__v"))
    val offExpr = map(offsets.toSeq.flatMap { case ((g, p), o) =>
      Seq(lit(s"$p:$g"), lit(o))
    }: _*)
    val ranked = parted
      .filter(col("__pid").isin(keepPids.toSeq: _*))
      .withColumn("__rank",
        element_at(offExpr, concat(col("__pid").cast(StringType), lit(":"), col("__g"))) +
          row_number().over(w).cast(LongType))
    val selected = ranked.join(broadcast(targets), Seq("__g", "__rank"))
    val aggs = qs.zipWithIndex.map { case ((_, name), i) =>
      // ≤ 2 rows match per (group, qIdx); a 2-double sum is addition-order
      // insensitive, so the shuffle's row order can't perturb the bits.
      sum(when(col("__qi") === i, col("__v") * col("__w"))).as(name)
    }
    selected.groupBy(col("__g").as(groupCol))
      .agg(aggs.head, aggs.tail: _*)
  }
}
