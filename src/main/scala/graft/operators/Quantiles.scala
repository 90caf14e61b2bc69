package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
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
  *  2. per-(partition, group) counts → per-(group, pid) EXCLUSIVE-prefix
  *     offsets;
  *  3. per-group rank = offset + intra-(partition, group) `row_number`;
  *  4. each requested q needs only the rows at ranks ⌊q·(n−1)⌋+1 and
  *     ⌈q·(n−1)⌉+1 — a join against the (|groups|·|qs|·2)-row target
  *     frame selects them, and one two-row weighted sum per (group, q)
  *     interpolates.
  *
  * The offsets/targets/partition-prune metadata is built two ways behind
  * one bounded probe (`limit(maxDriverCountRows+1).collect()` of the
  * per-(group, pid) counts — the collect can never exceed the threshold):
  *
  *  - counts fit the threshold → DRIVER metadata path: offsets and rank
  *    targets are computed in Scala and broadcast back as tiny frames —
  *    one counts aggregation plus one data pass, the fast shape for the
  *    common low-cardinality analytic query;
  *  - counts exceed it → fully DISTRIBUTED path: the exclusive prefix is
  *    a window over the counts FRAME, targets derive from the per-group
  *    totals in-plan, and the prune set is a join — nothing
  *    |groups|-sized ever reaches the driver, so a per-host/per-domain
  *    percentile over millions of groups stays executor-side (probed at
  *    100k groups × 10M rows: same answer, flat driver state).
  *
  * Both paths compute identical values from identical IEEE arithmetic
  * (the spec pins them equal bit-for-bit on the same input).
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
  * action, and the offsets must describe the same placement the rank
  * pass reads. Rank VALUES are placement-independent; placement itself is
  * not. Callers quantiling corpus-scale data repeatedly should persist the
  * result and unpersist (same contract as globalRank / bm25's tf cache).
  *
  * Input contract: the input PLAN is evaluated TWICE before the barrier
  * cache exists (`repartitionByRange`'s boundary sampler + the shuffle
  * write), so an input whose projection is expensive — interpreted HOF
  * scoring, codecs — should be materialized by the caller first (the p14
  * data card measured 32 s → ~4 s at 100k docs from caching its scored
  * 3-column frame). Cheap scans can stay lazy.
  */
object Quantiles {

  /** One row per group: `groupCol`, then one exact `quantile_cont(q)`
    * column per `(q, outName)` pair. `df` needs no other columns.
    * `maxDriverCountRows` bounds the per-(group, pid) count rows the
    * driver may hold; beyond it the metadata plane stays distributed. */
  def groupedQuantileCont(df: DataFrame, groupCol: String, valueCol: String,
      qs: Seq[(Double, String)], numPartitions: Int = 0,
      maxDriverCountRows: Int = 65536): DataFrame =
    grouped(df, groupCol, valueCol, qs, numPartitions, maxDriverCountRows,
      interpolate = true)

  /** Exact per-group ORDER STATISTIC: the stored value at rank
    * ⌊q·(n−1)⌋+1 — `quantile_cont`'s LOWER endpoint as a pure selection,
    * never an interpolated double. The only floating-point operation in
    * the whole derivation is the single `q·(n−1)` multiply of
    * bit-identical inputs, which IEEE-754 defines exactly — so the result
    * is cross-engine deterministic by the STANDARD, not by two engines
    * happening to share an interpolation formula. This is the fence
    * derivation for integralized comparisons (x9): select from
    * already-integral values and no interpolated double is ever floored. */
  def groupedQuantileSelect(df: DataFrame, groupCol: String, valueCol: String,
      qs: Seq[(Double, String)], numPartitions: Int = 0,
      maxDriverCountRows: Int = 65536): DataFrame =
    grouped(df, groupCol, valueCol, qs, numPartitions, maxDriverCountRows,
      interpolate = false)

  private def grouped(df: DataFrame, groupCol: String, valueCol: String,
      qs: Seq[(Double, String)], numPartitions: Int,
      maxDriverCountRows: Int, interpolate: Boolean): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (q, _) => q >= 0.0 && q <= 1.0 })
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    val base = df.select(col(groupCol).cast(StringType).as("__g"),
      col(valueCol).cast(DoubleType).as("__v"))
    // The null filter sits ABOVE the exchange, fenced behind the
    // nondeterministic __pid projection: placed on `base`, predicate
    // pushdown rewrites isNotNull(__v) in terms of the caller's VALUE
    // EXPRESSION and pushes it below the projection — so an expensive
    // derived value column (p14's scored q_scaled) was evaluated once for
    // the filter and again for the output, per pass (measured 3× on the
    // whole query). Post-exchange it tests a materialized attribute.
    // Ranks are computed after the filter, so null placement within the
    // sampled ranges cannot perturb them; all-null slabs just count 0.
    val parted = base
      .repartitionByRange(n, col("__g"), col("__v"))
      .sortWithinPartitions(col("__g"), col("__v"))
      .withColumn("__pid", spark_partition_id())
      .filter(col("__v").isNotNull)
      .cache()
    val countsDf = parted.groupBy(col("__g"), col("__pid"))
      .agg(count(lit(1)).as("__c"))
    // Bounded probe: at most threshold+1 rows ever reach the driver.
    val probe = countsDf.limit(maxDriverCountRows + 1).collect()

    // (offsets(__g,__pid,__off), targets(__g,__rank,__qi,__w), keep(__pid))
    val (offsets, targets, keepPids) =
      if (probe.length <= maxDriverCountRows)
        driverMetadata(spark, probe, qs, n, interpolate)
      else distributedMetadata(countsDf, qs, interpolate)

    val w = Window.partitionBy(col("__pid"), col("__g")).orderBy(col("__v"))
    val ranked = parted
      // ≤ numPartitions rows either way — always broadcast the prune set
      .join(broadcast(keepPids), Seq("__pid"), "left_semi")
      .withColumn("__rn", row_number().over(w).cast(LongType))
      .join(offsets, Seq("__g", "__pid"))
      .withColumn("__rank", col("__off") + col("__rn"))
    val selected = ranked.join(targets, Seq("__g", "__rank"))
    val aggs = qs.zipWithIndex.map { case ((_, name), i) =>
      // ≤ 2 rows match per (group, qIdx); a 2-double sum is addition-order
      // insensitive, so the shuffle's row order can't perturb the bits.
      sum(when(col("__qi") === i, col("__v") * col("__w"))).as(name)
    }
    selected.groupBy(col("__g").as(groupCol))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Fast path: the probe rows ARE the full counts — compute offsets,
    * rank targets, and the partition prune in Scala (bounded by the
    * probe threshold) and hand them back as broadcast-hinted frames. */
  private def driverMetadata(spark: org.apache.spark.sql.SparkSession,
      countRows: Array[Row], qs: Seq[(Double, String)],
      n: Int, interpolate: Boolean): (DataFrame, DataFrame, DataFrame) = {
    val counts = countRows
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val groups = counts.keys.map(_._1).toSeq.distinct.sorted
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
    // f == 0 → single row with weight 1.0 (v·1.0 ≡ v bitwise); else lo row
    // weight 1−f, hi row f. Same index arithmetic as the distributed twin.
    val targetRows = groups.flatMap { g =>
      val m = totals(g)
      qs.zipWithIndex.flatMap { case ((q, _), i) =>
        val pos = q * (m - 1).toDouble // the oracle's index arithmetic
        val frn = math.floor(pos)
        val f = pos - frn
        val loRank = frn.toLong + 1L
        if (!interpolate || f == 0.0) Seq(Row(g, loRank, i, 1.0))
        else Seq(Row(g, loRank, i, 1.0 - f), Row(g, loRank + 1L, i, f))
      }
    }
    val targets = spark.createDataFrame(
      spark.sparkContext.parallelize(targetRows, 1),
      StructType(Seq(
        StructField("__g", StringType), StructField("__rank", LongType),
        StructField("__qi", IntegerType), StructField("__w", DoubleType))))
    val targetRanks: Map[String, Set[Long]] =
      targetRows.groupBy(_.getString(0))
        .map { case (g, rows) => g -> rows.map(_.getLong(1)).toSet }
    val keep = offsets.collect {
      case ((g, p), off) if {
        val cnt = counts.getOrElse((g, p), 0L)
        cnt > 0L && targetRanks(g).exists(r => r > off && r <= off + cnt)
      } => p
    }.toSet
    val offsetsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        offsets.toSeq.map { case ((g, p), o) => Row(g, p, o) }, 1),
      StructType(Seq(
        StructField("__g", StringType), StructField("__pid", IntegerType),
        StructField("__off", LongType))))
    val keepDf = spark.createDataFrame(
      spark.sparkContext.parallelize(keep.toSeq.map(Row(_)), 1),
      StructType(Seq(StructField("__pid", IntegerType))))
    (broadcast(offsetsDf), broadcast(targets), keepDf)
  }

  /** Distributed path: counts, exclusive-prefix offsets, per-group totals,
    * rank targets, and the prune set all stay executor-side frames —
    * group cardinality never touches the driver. */
  private def distributedMetadata(countsDf: DataFrame,
      qs: Seq[(Double, String)],
      interpolate: Boolean): (DataFrame, DataFrame, DataFrame) = {
    // Cached: three consumers (targets, prune, rank join) must not re-run
    // the count aggregation — and the snapshot pins ONE placement (same
    // barrier contract as the data frame; callers/bench clearCache()).
    // NOTE: this is a SECOND never-unpersisted cache on the distributed
    // path (on top of the parted barrier) — both are bounded
    // (group-cardinality-sized and input-sized respectively) and both are
    // the caller's to release via clearCache(); long-lived sessions doing
    // high-cardinality quantiles should clear between workloads.
    val wOff = Window.partitionBy(col("__g")).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = countsDf
      .select(col("__g"), col("__pid"), col("__c"),
        coalesce(sum(col("__c")).over(wOff), lit(0L)).as("__off"),
        sum(col("__c")).over(Window.partitionBy(col("__g"))).as("__n"),
        row_number().over(Window.partitionBy(col("__g")).orderBy(col("__pid")))
          .as("__slab"))
      .cache()
    // Rank targets per (group, q), derived IN-PLAN from the per-group
    // totals (the __slab = 1 row carries each group's __n — no extra
    // distinct shuffle): pos = q·(n−1) as one double multiply,
    // f = pos − ⌊pos⌋ — the same bit-exact arithmetic as the driver twin
    // (Spark codegen doubles are the same IEEE ops). The f == 0 hi row
    // has weight exactly 0.0 and is filtered, leaving lo at weight 1.0.
    val qlit = array(qs.zipWithIndex.map { case ((q, _), i) =>
      struct(lit(q).as("q"), lit(i).as("qi"))
    }: _*)
    val targets = offsets.filter(col("__slab") === 1)
      .select(col("__g"), col("__n"), explode(qlit).as("__q"))
      .select(col("__g"), col("__q.qi").as("__q_qi"),
        (col("__q.q") * (col("__n") - 1L).cast(DoubleType)).as("__pos"))
      .select(col("__g"), col("__q_qi").as("__qi"),
        (floor(col("__pos")).cast(LongType) + 1L).as("__lo"),
        (col("__pos") - floor(col("__pos"))).as("__f"))
      .select(col("__g"), col("__qi"), explode(
        if (interpolate) array(
          struct(col("__lo").as("__rank"), (lit(1.0) - col("__f")).as("__w")),
          struct((col("__lo") + 1L).as("__rank"), col("__f").as("__w")))
        else array(
          struct(col("__lo").as("__rank"), lit(1.0).as("__w")))).as("__t"))
      .select(col("__g"), col("__t.__rank").as("__rank"),
        col("__qi"), col("__t.__w").as("__w"))
      .filter(col("__w") =!= 0.0)
    // Partition prune: only (group, pid) slabs containing a target rank
    // keep their rows — the slab⋈target join yields ≤ numPartitions
    // distinct pids.
    val keepPids = offsets
      .join(targets.select(col("__g"), col("__rank")), Seq("__g"))
      .filter(col("__rank") > col("__off") && col("__rank") <= col("__off") + col("__c"))
      .select(col("__pid")).distinct()
    (offsets.select(col("__g"), col("__pid"), col("__off")), targets, keepPids)
  }

  /** TRAIN/SERVE quantile binning — the feature-engineering pass an ML
    * pipeline fits once and applies forever: exact equal-frequency bin
    * EDGES learned from `train` (order statistics through
    * [[groupedQuantileSelect]] — never a per-group value buffer, and
    * integral cents so no interpolated double is ever compared), then
    * `apply` rows bucketed by comparing against the PIVOTED 1-row edge
    * frame (broadcast attach — the edges are nBins−1 longs however big
    * training was). bin = Σ (v > edge_i) ∈ [0, nBins−1]; ties at an edge
    * go LOW (v > edge, not ≥ — both engines replay the comparison).
    * Output: one row per bin with its serve-set population and exact
    * min/max cents (bin occupancy under train→serve drift IS the
    * monitoring signal).
    * Output: (bin, n, min_cents, max_cents, edge_lo) — edge_lo the
    * learned lower edge the bin sits above (−1 for bin 0). */
  def quantileBinning(train: DataFrame, serve: DataFrame, valCol: String,
      nBins: Int = 4): DataFrame = {
    require(nBins >= 2, s"need >= 2 bins, got $nBins")
    val cents = (df: DataFrame) =>
      df.select(floor(col(valCol) * 100).cast("long").as("cents"))
    val qs = (1 until nBins).map(i => i.toDouble / nBins -> s"e$i")
    val edges = groupedQuantileSelect(
        cents(train).withColumn("__g", lit("all")), "__g", "cents", qs)
      .drop("__g")
    val binned = cents(serve).crossJoin(broadcast(edges))
      .withColumn("bin",
        (1 until nBins).map(i => (col("cents") > col(s"e$i")).cast("long"))
          .reduce(_ + _))
      .withColumn("edge_lo",
        // ascending fold → the HIGHEST edge test ends up outermost
        (1 until nBins).foldLeft(lit(-1L)) { (acc, i) =>
          when(col("bin") >= i, col(s"e$i").cast("long")).otherwise(acc)
        })
    binned.groupBy(col("bin"), col("edge_lo"))
      .agg(count(lit(1)).as("n"),
        min(col("cents")).as("min_cents"),
        max(col("cents")).as("max_cents"))
      .select(col("bin"), col("n"), col("min_cents"), col("max_cents"),
        col("edge_lo"))
  }
}
