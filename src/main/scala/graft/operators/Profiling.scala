package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextHash, TopKAgg}

/** Dataset profiling — the ANALYZE TABLE analog a curation pipeline runs
  * before trusting a new drop: per-column null counts, exact distinct
  * cardinalities, and numeric ranges, computed in ONE aggregation pass
  * over the table and unpivoted to one row per column.
  *
  * Exact COUNT(DISTINCT) per column makes the single Aggregate expand
  * (one Expand branch per distinct aggregate — the textbook plan); for
  * quick profiling at 100 TB swap in `approx_count_distinct` and the pass
  * is sketch-mergeable. The unpivot is a `stack` over the single result
  * row — no second scan. */
object Profiling {

  /** (col_name, n_nulls, n_distinct, min_d, max_d) per requested NUMERIC
    * column (ranges are cast to double; exact counts are BIGINT). */
  def columnStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c).cast("double")).as(s"__min_$c"),
        max(col(c).cast("double")).as(s"__max_$c"))
    } :+ count(lit(1)).as("__total")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', __total - `__cnt_$c`, `__nd_$c`, `__min_$c`, `__max_$c`").mkString(", ")
    row.select(expr(
      s"stack(${cols.size}, $stackArgs) AS (col_name, n_nulls, n_distinct, min_d, max_d)"))
  }

  /** KMV (k-minimum-values) distinct-count sketch per group, audited
    * against the exact count in the same pass — a distinct sketch that,
    * unlike HLL, is DETERMINISTIC under the repo's portable hash and so
    * fully hash-checkable value-for-value by the SQL oracle (x2's HLL
    * could only ever verify its error CLAIM).
    *
    * The sketch is the k smallest [[TextHash.sampleKey]] values over the
    * group's distinct values (the squared-then-mod key — k-min is an order
    * statistic, exactly the threshold-class use where the raw polynomial
    * hash's base-31 lattice over sequential ids would bias the estimate);
    * `est = (k−1)·P div (h_k + 1)` (the +1 forecloses the h_k = 0
    * division), exact when the group holds fewer than k distinct values.
    * It is MERGEABLE by construction — k-min of a union is the k-min of
    * the merged k-min sets (spec-pinned) — which is what makes it a
    * per-partition / per-day sketch whose fleet-wide rollup is exact
    * sketch algebra, no re-scan.
    *
    * Plan shape: one distinct on (group, value) — which the exact audit
    * needs anyway — then k-slot [[TopKAgg]] buffers (score = −h), so the
    * exchange after the map-side fold carries ≤ k rows per (group,
    * partition): the sketch pass adds nothing corpus-sized beyond the
    * distinct itself. An `ALL` row sketches the union of every group.
    *
    * Output: (g, exact_distinct, n_kept, kth_min, est_distinct, err_bp)
    * with err_bp = |est − exact|·10⁴ div exact. */
  /** KMV sketch ALGEBRA on the gate: distinct-count estimates for two
    * sets A and B, their UNION (the merged sketch — k smallest over the
    * combined hash sets, exactly what per-shard sketches roll up to with
    * no re-scan), and their INTERSECTION by inclusion–exclusion
    * (est_A + est_B − est_U, clamped at 0), each audited against its
    * exact count in the same pass. This is why a distinct sketch earns
    * its place at 100 TB: per-partition/per-day sketches combine by set
    * algebra instead of recounting the corpus.
    *
    * Output, long format: one row per metric in
    * {a, b, union, intersection} × (est, exact, err_bp). All BIGINT,
    * deterministic, fully hash-checked (same property as
    * [[kmvDistinct]]). */
  def kmvSetOps(dfA: DataFrame, dfB: DataFrame, valueCol: String,
      k: Int = 64): DataFrame = {
    val hash = (df: DataFrame, tag: String) => df
      .select(col(valueCol).cast("string").as("v")).distinct()
      .select(lit(tag).as("side"), col("v"),
        TextHash.sampleKey(concat(lit("kmv:"), col("v"))).as("h"))
    val va = hash(dfA, "a")
    val vb = hash(dfB, "b")
    val vu = va.union(vb).select(lit("union").as("side"), col("v"), col("h")).distinct()
    val est = (vs: DataFrame) => vs
      .groupBy(col("side"))
      .agg(
        count(lit(1)).as("exact"),
        TopKAgg.topK(-col("h").cast("double"), col("h"), k).as("mins"))
      .withColumn("n_kept", size(col("mins")).cast("long"))
      .withColumn("kth_min",
        element_at(col("mins"), col("n_kept").cast("int")).getField("id"))
      .select(col("side"), col("exact"),
        expr(s"CASE WHEN n_kept < $k THEN n_kept " +
          s"ELSE (${k - 1}L * ${TextHash.Prime}L) div (kth_min + 1L) END").as("est"))
    val sides = est(va).union(est(vb)).union(est(vu))
    // intersection by inclusion–exclusion over the three single-set rows:
    // a metadata-sized pivot (3 rows), clamped at 0 — est_A+est_B can
    // undershoot est_U on disjoint sets.
    val wide = sides.groupBy()
      .pivot("side", Seq("a", "b", "union"))
      .agg(first(col("est")).as("est"), first(col("exact")).as("exact"))
    val inter = wide.select(
      lit("intersection").as("side"),
      (col("a_exact") + col("b_exact") - col("union_exact")).as("exact"),
      greatest(col("a_est") + col("b_est") - col("union_est"), lit(0L)).as("est"))
    sides.unionByName(inter)
      .select(col("side"), col("est"), col("exact"),
        expr("CASE WHEN exact = 0 THEN 0L " +
          "ELSE abs(est - exact) * 10000L div exact END").as("err_bp"))
  }

  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 64): DataFrame = {
    val dv = df
      .select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("string").as("v"))
      .distinct()
    val all = dv.select(lit("ALL").as("g"), col("v")).distinct()
    val keyed = dv.union(all)
      .withColumn("h", TextHash.sampleKey(concat(lit("kmv:"), col("v"))))
    val sk = keyed
      .groupBy(col("g"))
      .agg(
        count(lit(1)).as("exact_distinct"),
        TopKAgg.topK(-col("h").cast("double"), col("h"), k).as("mins"))
      .withColumn("n_kept", size(col("mins")).cast("long"))
      .withColumn("kth_min", element_at(col("mins"), col("n_kept").cast("int")).getField("id"))
    sk.select(
      col("g"), col("exact_distinct"), col("n_kept"), col("kth_min"),
      expr(s"CASE WHEN n_kept < $k THEN n_kept " +
        s"ELSE (${k - 1}L * ${TextHash.Prime}L) div (kth_min + 1L) END").as("est_distinct"),
      expr("abs((CASE WHEN n_kept < " + k + " THEN n_kept " +
        s"ELSE (${k - 1}L * ${TextHash.Prime}L) div (kth_min + 1L) END) - exact_distinct) " +
        "* 10000L div exact_distinct").as("err_bp"))
  }

  /** The per-day KMV sketches behind [[kmvRollup]] — one (day, mins)
    * row per day, `mins` the ascending array of the day's k smallest
    * distinct-value hashes. This is the "sketch column" a warehouse
    * PERSISTS next to its daily partitions: coarser grains re-aggregate
    * these rows, never the raw data. */
  def kmvDaySketches(df: DataFrame, tsCol: String, valueCol: String,
      k: Int = 64): DataFrame =
    // KmvAgg dedupes in-buffer: one grouped aggregate straight off the
    // raw rows — the old per-(day, value) distinct shuffle is gone and
    // the mins arrays are bit-identical (k smallest distinct, ascending).
    df.select(to_date(col(tsCol)).as("day"),
        TextHash.sampleKey(concat(lit("kmv:"),
          col(valueCol).cast("string"))).as("h"))
      .groupBy(col("day"))
      .agg(graft.functions.KmvAgg.kMinValues(col("h"), k).as("mins"))

  /** Mergeable-sketch ROLLUP — the warehouse "sketch column" pattern
    * (Dageville et al., SIGMOD'16 §materialized sketches; DataSketches'
    * KMV/theta family): per-DAY distinct sketches are built in the single
    * raw-data pass, then WEEK estimates re-aggregate only the day
    * sketches. Correctness of the merge is exact, not approximate-on-
    * approximate: the k smallest of the union of per-day k-min sets IS
    * the union's k-min set (any hash among the union's k smallest is
    * necessarily among its own day's k smallest) — spec-asserted against
    * the direct week sketch. At 100 TB the rollup input is
    * (days × k) longs, so month/quarter/ad-hoc-range estimates never
    * rescan the corpus.
    *
    * The exact weekly distinct ships alongside as the audit (same
    * measure-don't-guess convention as [[kmvDistinct]]/[[kmvSetOps]]).
    * Output: (week, n_days, n_kept, kth_min, est_distinct,
    * exact_distinct, err_bp), all deterministic BIGINTs after the DATE
    * keys. */
  def kmvRollup(df: DataFrame, tsCol: String, valueCol: String,
      k: Int = 64): DataFrame = {
    val dv = df.select(to_date(col(tsCol)).as("day"),
        col(valueCol).cast("string").as("v"))
      .distinct()
    val daySk = kmvDaySketches(df, tsCol, valueCol, k)
    val wk = daySk
      .groupBy(to_date(date_trunc("week", col("day"))).as("week"))
      .agg(
        count(lit(1)).as("n_days"),
        slice(array_sort(array_distinct(flatten(collect_list(col("mins"))))),
          1, k).as("wmins"))
      .withColumn("n_kept", size(col("wmins")).cast("long"))
      .withColumn("kth_min",
        element_at(col("wmins"), col("n_kept").cast("int")))
      .select(col("week"), col("n_days"), col("n_kept"), col("kth_min"),
        expr(s"CASE WHEN n_kept < $k THEN n_kept " +
          s"ELSE (${k - 1}L * ${TextHash.Prime}L) div (kth_min + 1L) END")
          .as("est_distinct"))
    val exact = dv
      .groupBy(to_date(date_trunc("week", col("day"))).as("week"))
      .agg(countDistinct(col("v")).as("exact_distinct"))
    wk.join(exact, Seq("week"))
      .select(col("week"), col("n_days"), col("n_kept"), col("kth_min"),
        col("est_distinct"), col("exact_distinct"),
        expr("CASE WHEN exact_distinct = 0 THEN 0L " +
          "ELSE abs(est_distinct - exact_distinct) * 10000L div exact_distinct END")
          .as("err_bp"))
  }

  /** Histogram-sketch QUANTILE rollup — [[kmvRollup]]'s sibling for order
    * statistics: per-DAY fixed-width bin counts are the persisted sketch
    * (mergeable by ADDITION — the one aggregate every engine can partial),
    * week medians come from the merged histogram's cumulative walk, and
    * the estimate's guarantee is structural: the chosen bin CONTAINS the
    * exact rank-target value, so error < binCents by construction. The
    * exact median rides along through the blessed
    * [[Quantiles.groupedQuantileSelect]] path (rank ⌊q·(n−1)⌋+1 — never a
    * per-group value buffer) as the audit. At 100 TB the rollup input is
    * (days × bins) longs; only the audit touches raw data twice.
    * Output: (week string, n_week, med_bin, est_median_cents,
    * exact_median_cents, err_cents) — err_cents ∈ [0, binCents). */
  def histogramRollup(df: DataFrame, tsCol: String, valueCol: String,
      binCents: Long = 1000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(binCents > 0)
    val base = df.select(to_date(col(tsCol)).as("day"),
      (col(valueCol) * 100.0).cast("long").as("cents"))
    // the persisted day sketch: (day, bin, n). Binning is a FLOORED
    // division spelled out in BIGINT (div truncates toward zero; the x31
    // oracle's // floors) so negative values bin identically on both
    // engines — a fixture regeneration with negatives must not diverge.
    val daySk = base
      .groupBy(col("day"), expr(
        s"(cents div ${binCents}L) - (CASE WHEN cents < 0 AND cents % ${binCents}L != 0 THEN 1 ELSE 0 END)")
        .as("bin"))
      .agg(count(lit(1)).as("n"))
    // merge = add bin counts; weeks × bins rows from here on
    val wk = daySk
      .groupBy(to_date(date_trunc("week", col("day"))).cast("string").as("week"),
        col("bin"))
      .agg(sum(col("n")).as("n"))
    val wTot = wk.groupBy(col("week")).agg(sum(col("n")).as("n_week"))
    val cum = wk.withColumn("cum",
      sum(col("n")).over(Window.partitionBy(col("week")).orderBy(col("bin"))))
    val est = cum.join(wTot, Seq("week"))
      .filter(col("cum") >= expr("(n_week - 1L) div 2L + 1L"))
      .groupBy(col("week"), col("n_week"))
      .agg(min(col("bin")).as("med_bin"))
      .withColumn("est_median_cents", expr(s"med_bin * ${binCents}L"))
    val exact = Quantiles.groupedQuantileSelect(
        base.select(to_date(date_trunc("week", col("day"))).cast("string").as("week"),
          col("cents")),
        "week", "cents", Seq(0.5 -> "med"))
      .select(col("week"), col("med").cast("long").as("exact_median_cents"))
    est.join(exact, Seq("week"))
      .select(col("week"), col("n_week"), col("med_bin"),
        col("est_median_cents"), col("exact_median_cents"),
        (col("exact_median_cents") - col("est_median_cents")).as("err_cents"))
  }

  /** Heavy-hitter ROLLUP — the third mergeable-sketch grain (distinct =
    * [[kmvRollup]], quantile = [[histogramRollup]], frequency = this):
    * per-DAY Misra–Gries candidate summaries, week candidates = the UNION
    * of day candidates — a sound merge because a weekly heavy hitter
    * (freq_w > N_w/(c+1)) must exceed the threshold on at least one day
    * (Σ freq_d > Σ N_d/(c+1) forces one term over its share), where the
    * per-day MG guarantee keeps it. The exact verify pass then counts
    * ONLY candidates, so the sketch is output-invisible (h1's argument,
    * per week) and the oracle is the exact weekly heavy hitters.
    * Output: (week, token, freq) for freq·(capacity+1) > n_week. */
  def hhRollup(df: DataFrame, tsCol: String, tokenCol: String,
      capacity: Int = 30): DataFrame = {
    val toks = df.select(to_date(col(tsCol)).as("day"),
      col(tokenCol).cast("string").as("token"))
    val weekOf = to_date(date_trunc("week", col("day"))).cast("string").as("week")
    val daySk = toks.groupBy(col("day"))
      .agg(graft.functions.MisraGriesAgg.candidates(col("token"), capacity).as("cand"))
    val weekCand = daySk.groupBy(weekOf)
      .agg(array_distinct(flatten(collect_list(col("cand")))).as("cands"))
    val wk = toks.select(weekOf, col("token"))
    val nWeek = wk.groupBy(col("week")).agg(count(lit(1)).as("n"))
    wk.join(broadcast(weekCand), Seq("week"))
      .filter(array_contains(col("cands"), col("token")))
      .groupBy(col("week"), col("token"))
      .agg(count(lit(1)).as("freq"))
      .join(broadcast(nWeek), Seq("week"))
      .filter(col("freq") * (capacity + 1) > col("n"))
      .select(col("week"), col("token"), col("freq"))
  }

  /** Persist a table's planner statistics — row count + the deterministic
    * KMV sketch of a join key's distinct values — as a "stats catalog"
    * entry (what ANALYZE TABLE stores; the Hive/Iceberg stats a CBO
    * consults). Written at table-write time so later estimates NEVER
    * rescan the table ([[joinEstimateFromStats]] — the spec proves it by
    * deleting the data first). Entries are VERSIONED subdirs
    * `entry-<zero-padded n>` (numeric == lexicographic — the label-store
    * rollover lesson) published by one atomic rename, so a concurrent
    * reader never sees a torn entry; [[appendTableStats]] folds new
    * batches in without rescanning covered data. A `_format-stats-kmv-v1`
    * marker guards sketch compatibility (mismatched formats fail loudly,
    * never silently-wrong estimates). */
  /** Misra–Gries capacity for the catalog's skew stat: any key holding more
    * than 1/(SkewCap+1) of the rows is GUARANTEED an MG candidate, so the
    * exact-verified top-key count is deterministic whenever it clears that
    * floor (the sketch-then-verify clamp — see [[clampTop]]). Mirrored
    * in the b2/b3 oracle replays; changing it must keep both in lockstep
    * (it is interpolated there from this constant). */
  val SkewCap = 30

  /** Equi-width histogram bin count for the range-selectivity sidecars —
    * single-sourced: the b8 oracle CASE interpolates this value, and the
    * bin width formula `(max - min) div HistBins + 1` must stay in
    * lockstep with the SQL replay (the +1 keeps every in-range value's
    * bin index inside [0, HistBins)). */
  val HistBins = 32

  /** Bin width for a [mn, mx] domain; 0 = REFUSE to publish (the span
    * mx − mn overflows a Long, so the wrapped width arithmetic would
    * publish unsound bins — and a histogram over a ±2⁶²-wide domain, a
    * hash- or id-derived column, has no usable resolution anyway; the
    * reader then simply finds no sidecar and falls back to unfiltered
    * stats, the conservative-sound posture). `mx < mn` is the all-null
    * sentinel — width 1, an empty histogram that answers every range
    * with 0, which is exact. */
  private def histWidth(mn: Long, mx: Long): Long =
    if (mx < mn) 1L
    else {
      val span = mx - mn
      if (span < 0L) 0L else span / HistBins + 1L
    }

  def writeTableStats(df: DataFrame, dir: String, keyCol: String,
      k: Int = 64, freqCols: Seq[String] = Nil,
      histCols: Seq[String] = Nil): Unit = {
    val key = col(keyCol).cast("string")
    // ONE aggregate pass for all the sketches (row count, KMV mins, MG
    // heavy-hitter candidates, byte total, per-freq-column MG candidates);
    // the head() is one row of ≤k longs + bounded string lists — the
    // bounded-collect doctrine.
    // each freq column rides with ITS OWN non-null count: the MG floor
    // for a column is relative to the rows that column's summary actually
    // processed — judging it by the KEY column's count is unsound when
    // the null profiles differ (review finding r12)
    val freqAggs = freqCols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        graft.functions.MisraGriesAgg.candidates(col(c).cast("string"), SkewCap)
          .as(s"__freq_cand_$i"),
        count(col(c).cast("string")).as(s"__freq_n_$i"))
    }
    // histogram columns ride the same pass with exact MIN/MAX (the bin
    // edges' basis — deterministic, order-independent); bin counts join
    // the fused verify scan below
    val histAggs = histCols.zipWithIndex.flatMap { case (c, i) =>
      val x = col(c).cast("long")
      Seq(min(x).as(s"__hist_min_$i"), max(x).as(s"__hist_max_$i"))
    }
    val aggs = Seq(
      graft.functions.KmvAgg.kMinValues(
        TextHash.sampleKey(concat(lit("kmv:"), key)), k).as("mins"),
      graft.functions.MisraGriesAgg.candidates(key, SkewCap).as("cands"),
      sum(rowBytesColumn(df.schema)).as("n_bytes")) ++ freqAggs ++ histAggs
    val row = df.agg(count(key).as("n_rows"), aggs: _*).head()
    val nRows = row.getLong(0)
    val mins = row.getSeq[Long](1)
    val cands = row.getSeq[String](2)
    val nBytes = if (row.isNullAt(3)) 0L else row.getLong(3)
    val freqCands = freqCols.indices.map(i =>
      (freqCols(i), row.getSeq[String](4 + 2 * i), row.getLong(5 + 2 * i)))
    val histBase = 4 + 2 * freqCols.size
    val histSpecs = histCols.indices.map { i =>
      // all-null column → (0, -1) sentinel (empty histogram; any range
      // reads 0 matching rows, which is exact)
      val mn = if (row.isNullAt(histBase + 2 * i)) 0L
        else row.getLong(histBase + 2 * i)
      val mx = if (row.isNullAt(histBase + 2 * i + 1)) -1L
        else row.getLong(histBase + 2 * i + 1)
      (histCols(i), mn, mx)
    }
    // Publish through the shared tail at max+1 WITH pruning: a rewrite
    // over a dir that reached version ≥ 2 via appends must supersede that
    // entry, not sit silently shadowed below it (latestEntry resolves the
    // max — advice finding r11).
    publishObservedStats(df.sparkSession, dir, keyCol, k,
      nRows, mins, cands, df, nBytes, freqCands, histSpecs)
  }

  /** The sketch-then-verify exact-count pass, FUSED across every tracked
    * column: for each (column, MG candidates) spec one conditional-sum
    * aggregate per candidate value (≤ SkewCap each, so the aggregate row
    * stays bounded) — the verify pays ONE table scan regardless of how
    * many columns it verifies (the key's skew stat plus F declared freq
    * columns was 1 + F scans, each a full re-read of the table at 100 TB),
    * and the all-sums shape is map-side-complete whole-stage codegen: no
    * shuffle carries anything but one bounded row per partition. Counts
    * are exact (sum of 1-iff-equal over rows — identical to the groupBy
    * formulation) so every published artifact is bit-identical. A spec
    * with no candidates contributes nothing; all-empty skips the scan. */
  /** Candidate-value exact counts plus equi-width histogram BIN counts in
    * ONE fused scan: each bin spec (column, min, width) contributes
    * [[HistBins]] conditional sums keyed on the integer bin index
    * `(x − min) div width` (offsets are non-negative for in-range values,
    * so truncating and flooring division agree — the CLAUDE.md negative-div
    * rule can't bite). Still one table read for key skew + F freq columns
    * + H histogram columns. */
  private def fusedVerifyCounts(df: DataFrame,
      candSpecs: Seq[(String, Seq[String])],
      binSpecs: Seq[(String, Long, Long)])
      : (Seq[Map[String, Long]], Seq[Array[Long]]) = {
    val candAggs = candSpecs.flatMap { case (c, cands) =>
      val sc = col(c).cast("string")
      cands.map(v => sum(when(sc === lit(v), 1L).otherwise(0L)))
    }
    val binAggs = binSpecs.flatMap { case (c, mn, w) =>
      val bin = expr(s"(CAST(`$c` AS BIGINT) - ${mn}L) div ${w}L")
      (0 until HistBins).map(i =>
        sum(when(col(c).isNotNull && (bin === lit(i.toLong)), 1L)
          .otherwise(0L)))
    }
    val aggs = candAggs ++ binAggs
    if (aggs.isEmpty)
      (candSpecs.map(_ => Map.empty[String, Long]),
        binSpecs.map(_ => Array.fill(HistBins)(0L)))
    else {
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      var off = 0
      val candCounts = candSpecs.map { case (_, cands) =>
        val m = cands.zipWithIndex.map { case (v, i) =>
          // sum over zero rows is SQL NULL
          v -> (if (row.isNullAt(off + i)) 0L else row.getLong(off + i))
        }.toMap
        off += cands.length
        m
      }
      val binCounts = binSpecs.map { _ =>
        val a = Array.tabulate(HistBins)(i =>
          if (row.isNullAt(off + i)) 0L else row.getLong(off + i))
        off += HistBins
        a
      }
      (candCounts, binCounts)
    }
  }

  /** The sketch-then-verify skew stat: EXACT count of the table's most
    * frequent key, clamped to 0 below the MG guarantee floor. The
    * candidates' exact counts come from [[fusedVerifyCounts]]' fused
    * scan. Determinism argument: if the true top key's share exceeds
    * 1/(SkewCap+1) it is provably a candidate (MG bound), so max-over-
    * candidates IS the true max and the clamp passes on both engines;
    * below the floor both engines emit 0 regardless of which candidates
    * survived — so the stat is SQL-replayable even though the candidate
    * SET is order-sensitive. `top > n div (cap+1)` is the overflow-free
    * form of `top·(cap+1) > n` (equivalent for non-negative BIGINTs).
    * Returns (clamped top count, EVERY key over the MG floor — actuation
    * metadata for the hot/cold split, itself deterministic: a key clears
    * the floor iff its true count does). Bounded at ≤ SkewCap keys. */
  private def clampTop(counts: Map[String, Long], nRows: Long)
      : (Long, Seq[String]) = {
    if (counts.isEmpty || nRows <= 0L) (0L, Nil)
    else {
      val floor = nRows / (SkewCap + 1L)
      val hot = counts.filter(_._2 > floor)
      if (hot.isEmpty) (0L, Nil)
      else (hot.values.max, hot.keys.toSeq.sorted)
    }
  }

  /** Literal one-row entry frame (same shape statsRow produces — the two
    * publish paths are spec-pinned bit-identical). `n_bytes` is the table's
    * total estimated in-memory bytes ([[rowBytesColumn]]), -1 = unknown
    * (entry written by a pre-byte-stats version or a byte-blind caller). */
  private def entryFrame(spark: org.apache.spark.sql.SparkSession,
      nRows: Long, mins: Seq[Long], keyCol: String, k: Int,
      nBytes: Long): DataFrame =
    spark.range(1).select(
      lit(nRows).as("n_rows"),
      typedLit(mins).as("mins"),
      lit(keyCol).as("key_col"),
      lit(k.toLong).as("k"),
      lit(nBytes).as("n_bytes"))

  /** Estimated row WIDTH in bytes as a codegen'd column — what turns the
    * catalog's row count into a broadcast BYTE budget (a 2-column key dim
    * and a 100-column fact differ ~50× per row; a row-count rung can't see
    * that). Fixed-width types charge their Catalyst `defaultSize`;
    * variable-width columns measure actual content: strings by
    * `octet_length`, binary by `length`, and flat arrays by
    * element-count × element size (an embeddings column's 64 floats are
    * 256 bytes, not ArrayType.defaultSize's 4). Nested structures fall
    * back to defaultSize — profile-grade, not an allocator. */
  def rowBytesColumn(schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.types._
    val parts = schema.fields.map { f =>
      f.dataType match {
        case StringType =>
          coalesce(octet_length(col(f.name)).cast("long"), lit(0L))
        case BinaryType =>
          coalesce(length(col(f.name)).cast("long"), lit(0L))
        case ArrayType(et, _)
            if !et.isInstanceOf[StructType] && !et.isInstanceOf[ArrayType] &&
              !et.isInstanceOf[MapType] =>
          // size(NULL) is -1 under the legacy conf, NULL under ANSI — the
          // isNull branch gives 0 either way
          when(col(f.name).isNull, lit(0L))
            .otherwise(size(col(f.name)).cast("long") * lit(et.defaultSize.toLong))
        case dt => lit(dt.defaultSize.toLong)
      }
    }
    parts.reduceOption(_ + _).getOrElse(lit(0L))
  }

  /** Incremental catalog maintenance: fold a NEW batch's stats into the
    * newest entry WITHOUT rescanning covered data — n_rows add and the
    * KMV sketch merges exactly (k smallest of old-mins ∪ new-mins IS the
    * union's k-min set, the x29 property), so stats after any append
    * sequence are BIT-IDENTICAL to a fresh [[writeTableStats]] over the
    * union (spec-asserted). Publishes `entry-<n+1>` via hidden
    * `.staging-*` + one atomic rename, then prunes superseded entries;
    * key-col / k / format guards fail loudly. */
  def appendTableStats(newData: DataFrame, dir: String, keyCol: String,
      k: Int = 64): Unit = {
    val spark = newData.sparkSession
    require(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "_format-stats-kmv-v1")),
      s"stats entry at $dir lacks _format-stats-kmv-v1 — append needs a " +
        "compatible base (writeTableStats first)")
    val (cur, curVersion) = latestEntry(spark, dir)
    val storedKey = cur.select(col("key_col")).head().getString(0)
    require(storedKey == keyCol,
      s"stats entry at $dir sketches key '$storedKey', append offers '$keyCol'")
    val storedK = cur.select(col("k")).head().getLong(0).toInt
    require(storedK == k,
      s"stats entry at $dir keeps k=$storedK mins, append offers k=$k")
    // byte totals merge by ADDITION (exact, like n_rows); an old-format
    // entry without the column reads as unknown (-1), and unknown is
    // sticky — a fabricated partial total would silently skew the byte
    // rung until the next full rewrite.
    val curBytes =
      if (cur.columns.contains("n_bytes")) col("n_bytes") else lit(-1L)
    val merged = cur.crossJoin(broadcast(
        statsRow(newData, keyCol, k).select(
          col("n_rows").as("n_new"), col("mins").as("new_mins"),
          col("n_bytes").as("new_bytes"))))
      .select(
        (col("n_rows") + col("n_new")).as("n_rows"),
        slice(array_sort(array_distinct(concat(col("mins"), col("new_mins")))),
          1, k).as("mins"),
        col("key_col"), col("k"),
        when(curBytes < 0L, lit(-1L))
          .otherwise(curBytes + col("new_bytes")).as("n_bytes"))
    publishEntry(merged, dir, curVersion + 1L)
    // prune AFTER publish (readers resolve the max entry; the store keeps
    // exactly one — the label-snapshot convention). The new version gets
    // NO skew or freq sidecar: per-batch exact candidate counts cannot
    // merge exactly when batches disagree on the candidates (counts are
    // only known within their own batch), so those stats are
    // WRITE-TIME-ONLY — after an append they read as unknown (-1 / empty)
    // until the next full writeTableStats/writeWithStats or a
    // [[refreshSkew]] pass re-arms them. Stale sidecars are pruned with
    // their entries.
    entryDirs(dir).filter(_._2 < curVersion + 1L).foreach { case (p, _) =>
      deleteRecursively(p)
    }
    skewFiles(dir).filter(_._2 <= curVersion).foreach { case (p, _) =>
      java.nio.file.Files.deleteIfExists(p)
    }
    freqFiles(dir).filter(_._3 <= curVersion).foreach { case (p, _, _) =>
      java.nio.file.Files.deleteIfExists(p)
    }
    histFiles(dir).filter(_._3 <= curVersion).foreach { case (p, _, _) =>
      java.nio.file.Files.deleteIfExists(p)
    }
  }

  /** Re-arm the WRITE-TIME-ONLY sidecars after appends — the maintenance
    * op the salted rung needs on continuously-appended tables (the one
    * shape where skew accretes; without it an append leaves readers
    * `top = -1` until a full rewrite, i.e. the skew protection is off
    * exactly where it matters — r11 verdict #1). One bounded pass over the
    * CURRENT table re-runs the sketch-then-verify clamp (MG candidates →
    * exact count of ≤ SkewCap candidates; same determinism argument as the
    * write path: membership above the floor is decided by exact counts)
    * and republishes the `skew-`/`freq-` sidecars AT THE RESOLVED ENTRY
    * VERSION — the entry itself is untouched, so the bit-identity
    * invariant (append sequence ≡ fresh write) is preserved. The reference
    * analog is re-running the Glue crawler to refresh table statistics
    * without rewriting data.
    *
    * Concurrency: a concurrent append publishing version v+1 while this
    * refreshes v leaves v+1 sidecar-less — readers then see unknown, never
    * a stale-version pairing ([[readStatsFull]] resolves everything at one
    * version). Returns the clamped top-key count it published. */
  def refreshSkew(df: DataFrame, dir: String, keyCol: String,
      freqCols: Seq[String] = Nil, histCols: Seq[String] = Nil): Long = {
    require(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "_format-stats-kmv-v1")),
      s"stats entry at $dir lacks _format-stats-kmv-v1 — nothing to refresh")
    val spark = df.sparkSession
    val (entry, version) = latestEntry(spark, dir)
    val storedKey = entry.select(col("key_col")).head().getString(0)
    require(storedKey == keyCol,
      s"stats entry at $dir sketches key '$storedKey', refresh offers '$keyCol'")
    val key = col(keyCol).cast("string")
    val freqAggs = freqCols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        graft.functions.MisraGriesAgg.candidates(col(c).cast("string"), SkewCap)
          .as(s"__freq_cand_$i"),
        count(col(c).cast("string")).as(s"__freq_n_$i"))
    }
    val histAggs = histCols.zipWithIndex.flatMap { case (c, i) =>
      val x = col(c).cast("long")
      Seq(min(x).as(s"__hist_min_$i"), max(x).as(s"__hist_max_$i"))
    }
    // ONE sketch pass (count for the floor + key MG + per-freq-col MG and
    // per-col non-null counts + per-hist-col min/max), then ONE fused
    // exact-verify scan — the same two-pass shape as the write path,
    // minus the write.
    val row = df.agg(count(key).as("n_rows"),
      (graft.functions.MisraGriesAgg.candidates(key, SkewCap).as("cands") +:
        (freqAggs ++ histAggs)): _*).head()
    val nRows = row.getLong(0)
    val cands = row.getSeq[String](1)
    val histBase = 2 + 2 * freqCols.size
    val histSpecs = histCols.indices.map { i =>
      val mn = if (row.isNullAt(histBase + 2 * i)) 0L
        else row.getLong(histBase + 2 * i)
      val mx = if (row.isNullAt(histBase + 2 * i + 1)) -1L
        else row.getLong(histBase + 2 * i + 1)
      (histCols(i), mn, mx)
    }
    val histKept = histSpecs.filter { case (_, mn, mx) => histWidth(mn, mx) > 0L }
    val binSpecs = histKept.map { case (c, mn, mx) => (c, mn, histWidth(mn, mx)) }
    val (allCounts, allBins) = fusedVerifyCounts(df,
      (keyCol -> cands) +: freqCols.zipWithIndex.map { case (c, i) =>
        c -> row.getSeq[String](2 + 2 * i)
      }, binSpecs)
    val (top, hotKeys) = clampTop(allCounts.head, nRows)
    publishSkew(dir, version, top, hotKeys)
    freqCols.zipWithIndex.foreach { case (c, i) =>
      val (floor, kept) =
        freqsAboveFloor(allCounts(1 + i), row.getLong(3 + 2 * i))
      publishFreq(dir, version, c, floor, kept)
    }
    histKept.zip(binSpecs).zip(allBins).foreach {
      case (((c, mn, mx), (_, _, w)), bins) =>
        publishHist(dir, version, c, mn, mx, w, bins)
    }
    top
  }

  /** [[joinCardinalityEstimate]] answered FROM the catalog: reads the two
    * newest stats entries (metadata-sized — the tables themselves are
    * never touched), replays the same containment estimate with the same
    * overflow fence. Output: (n_a, n_b, est_distinct_a, est_distinct_b,
    * est_rows). Mismatched format markers or key columns fail loudly. */
  def joinEstimateFromStats(spark: org.apache.spark.sql.SparkSession,
      dirA: String, dirB: String,
      expectKeyA: String, expectKeyB: String): DataFrame = {
    def readStats(dir: String, expectKey: String, side: String) = {
      require(java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, "_format-stats-kmv-v1")),
        s"stats entry at $dir lacks _format-stats-kmv-v1 — rebuild needed " +
          "(a different sketch scheme would silently skew estimates)")
      val row = latestEntry(spark, dir)._1
      val key = row.select(col("key_col")).head().getString(0)
      require(key == expectKey,
        s"stats entry at $dir sketches key '$key', caller expects '$expectKey'")
      val kk = row.select(col("k")).head().getLong(0)
      row.select(
        col("n_rows").as(s"n_$side"),
        size(col("mins")).cast("long").as("n_kept"),
        when(size(col("mins")) > 0,
          element_at(col("mins"), size(col("mins")))).otherwise(lit(0L))
          .as("kth_min"))
        .select(col(s"n_$side"),
          expr(s"CASE WHEN n_kept < ${kk}L THEN n_kept " +
            s"ELSE (${kk - 1}L * ${TextHash.Prime}L) div (kth_min + 1L) END")
            .as(s"d_$side"))
    }
    broadcast(readStats(dirA, expectKeyA, "a"))
      .crossJoin(broadcast(readStats(dirB, expectKeyB, "b")))
      .select(col("n_a"), col("n_b"),
        col("d_a").as("est_distinct_a"), col("d_b").as("est_distinct_b"),
        expr("CASE WHEN n_a = 0L OR n_b = 0L THEN 0L " +
          "WHEN n_a <= 4611686018427387904L div n_b " +
          "THEN (n_a * n_b) div greatest(d_a, d_b, 1L) " +
          "WHEN (n_a div greatest(d_a, d_b, 1L)) <= 9223372036854775807L div n_b " +
          "THEN (n_a div greatest(d_a, d_b, 1L)) * n_b " +
          "ELSE 9223372036854775807L END").as("est_rows"))
  }

  /** Driver-side catalog read: the newest entry's (n_rows, KMV distinct
    * estimate, top-key count) for `dir`, with the same format/key guards
    * as [[joinEstimateFromStats]]. This is the metadata plane a cost-based
    * planner consults at CHOOSE time — one one-row parquet entry plus one
    * tiny sidecar, the tables themselves never touched (the bounded-
    * collect doctrine: the collect is catalog-entry-sized, never
    * data-sized). The estimate arithmetic is the exact BIGINT formula the
    * SQL replay uses, so a strategy derived from it is cross-engine
    * deterministic. The third element is the clamped exact top-key count
    * ([[clampTop]]), or -1 when unknown (entry produced by an append —
    * the skew stat is write-time-only). */
  def readStatsDriver(spark: org.apache.spark.sql.SparkSession,
      dir: String, expectKey: String): (Long, Long, Long) = {
    val (n, d, top, _) = readStatsFull(spark, dir, expectKey)
    (n, d, top)
  }

  /** [[readStatsDriver]] plus the hot-key VALUES, all read at ONE resolved
    * entry version — the planner's salted actuation must never re-resolve
    * the latest version separately (an append landing between two reads
    * would pair entry v's top count with version v+1's missing sidecar and
    * fail a healthy catalog — review finding). */
  def readStatsFull(spark: org.apache.spark.sql.SparkSession,
      dir: String, expectKey: String): (Long, Long, Long, Seq[String]) = {
    val t = readTableStats(spark, dir, expectKey)
    (t.nRows, t.estDistinct, t.topCount, t.hotKeys)
  }

  /** Everything the catalog knows about a table, resolved at ONE entry
    * version (see [[readStatsFull]]'s race note): exact row count, KMV
    * distinct estimate, clamped top-key count (-1 unknown), hot-key
    * values, average row bytes (`n_bytes div n_rows`, floored BIGINT —
    * the same arithmetic a SQL replay uses; -1 unknown), and per-column
    * exact value frequencies for declared filter columns (empty when the
    * version has no freq sidecars — appends drop them, [[refreshSkew]]
    * re-arms them). */
  /** One declared filter column's persisted frequencies: the exact count
    * of every value above `floor` (the publish-time observability bound —
    * an ABSENT value's count is provably ≤ floor). */
  final case class FreqStats(floor: Long, counts: Map[String, Long])

  /** One declared RANGE column's persisted equi-width histogram: exact
    * min/max (the edge basis), width = (max − min) div HistBins + 1, and
    * the exact per-bin counts (zero bins omitted). `maxV < minV` is the
    * all-null sentinel (empty histogram — every range matches 0 rows). */
  final case class HistStats(minV: Long, maxV: Long, width: Long,
      bins: Map[Int, Long])

  final case class TableStats(nRows: Long, estDistinct: Long,
      topCount: Long, hotKeys: Seq[String], avgRowBytes: Long,
      freqs: Map[String, FreqStats],
      hists: Map[String, HistStats] = Map.empty)

  def readTableStats(spark: org.apache.spark.sql.SparkSession,
      dir: String, expectKey: String): TableStats = {
    require(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "_format-stats-kmv-v1")),
      s"stats entry at $dir lacks _format-stats-kmv-v1 — rebuild needed " +
        "(a different sketch scheme would silently skew estimates)")
    val (entry, version) = latestEntry(spark, dir)
    val hasBytes = entry.columns.contains("n_bytes")
    val cols = Seq(col("key_col"), col("k"), col("n_rows"), col("mins")) ++
      (if (hasBytes) Seq(col("n_bytes")) else Nil)
    val row = entry.select(cols: _*).head()
    val key = row.getString(0)
    require(key == expectKey,
      s"stats entry at $dir sketches key '$key', caller expects '$expectKey'")
    val k = row.getLong(1)
    val nRows = row.getLong(2)
    val mins = row.getSeq[Long](3)
    val nBytes = if (hasBytes) row.getLong(4) else -1L
    val d =
      if (mins.size < k) mins.size.toLong
      else (k - 1L) * TextHash.Prime / (mins.last + 1L)
    val avgBytes =
      if (nBytes < 0L || nRows <= 0L) -1L else nBytes / nRows
    TableStats(nRows, d, readSkew(dir, version), readHotKeys(dir, version),
      avgBytes, readFreqs(dir, version), readHists(dir, version))
  }

  /** One (n_rows, mins, key_col, k) stats row for a frame — ONE aggregate
    * pass: [[graft.functions.KmvAgg]] dedupes inside its k-slot buffer, so
    * the old `distinct()` → TopKAgg formulation's full distinct shuffle
    * (every distinct value exchanged to keep 64 of them) is gone; the
    * exchange carries ≤ k longs per partition. Output bit-identical
    * (k smallest distinct hashes, ascending — spec-pinned), so stored
    * entries and the x30/x34/b2 SQL replays are unchanged. */
  private def statsRow(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    val key = col(keyCol).cast("string")
    df.agg(
        count(key).as("n_rows"), // count(col) skips nulls, like the old filter
        graft.functions.KmvAgg.kMinValues(
          TextHash.sampleKey(concat(lit("kmv:"), key)), k).as("mins"),
        sum(rowBytesColumn(df.schema)).as("raw_bytes"))
      .select(col("n_rows"), col("mins"), lit(keyCol).as("key_col"),
        lit(k).cast("long").as("k"),
        coalesce(col("raw_bytes"), lit(0L)).as("n_bytes"))
  }

  /** Write a table AND its stats-catalog entry in the SAME pass:
    * [[graft.functions.KmvAgg]] + count ride the write as
    * `Dataset.observe` metrics (Spark's CollectMetrics), so the parquet
    * write is the only scan — the "stats written at table-write time"
    * contract with literally zero extra passes (writeTableStats costs one
    * aggregate scan; ANALYZE-after-write costs a full re-read). The
    * published entry is bit-identical to [[writeTableStats]]'s on the
    * same data (spec-pinned), so every estimate/planner consumer is
    * unchanged. */
  def writeWithStats(df: DataFrame, dataDir: String, statsDir: String,
      keyCol: String, k: Int = 64, freqCols: Seq[String] = Nil,
      histCols: Seq[String] = Nil): Unit = {
    val obs = org.apache.spark.sql.Observation(
      s"graft-stats-${java.util.UUID.randomUUID()}")
    val statsCols =
      statsObservationColumns(keyCol, k, Some(df.schema), freqCols, histCols)
    val observed = df.observe(obs, statsCols.head, statsCols.tail: _*)
    observed.write.mode("overwrite").parquet(dataDir)
    val (nRows, mins, cands, nBytes) = decodeStatsObservation(obs.get)
    val freqCands = freqCols.zipWithIndex.map { case (c, i) =>
      (c, decodeSeq[String](obs.get(s"__graft_stats_freq_$i")),
        obs.get(s"__graft_stats_freqn_$i").asInstanceOf[Long])
    }
    val histSpecs = histCols.zipWithIndex.map { case (c, i) =>
      val mn = obs.get.get(s"__graft_stats_histmin_$i")
        .collect { case l: Long => l }.getOrElse(0L)
      val mx = obs.get.get(s"__graft_stats_histmax_$i")
        .collect { case l: Long => l }.getOrElse(-1L)
      (c, mn, mx)
    }
    publishObservedStats(df.sparkSession, statsDir, keyCol, k,
      nRows, mins, cands, df.sparkSession.read.parquet(dataDir),
      nBytes, freqCands, histSpecs)
  }

  /** Publish a catalog entry + skew sidecar from ALREADY-OBSERVED sketch
    * metrics — the shared tail of [[writeWithStats]] and any writer whose
    * output pass carried the (count, KMV, MG) observation (e.g. the ETL
    * flow's data writes): the skew verify pass reads `verifySource`
    * (typically the just-written parquet, key-column pruned, filtered to
    * ≤ SkewCap candidates) — the only extra scan a stats-equipped writer
    * pays. A REWRITE supersedes whatever version the catalog reached
    * through appends: publish max+1 and prune (a hardcoded version 1
    * would sit silently SHADOWED by a surviving higher-versioned entry —
    * latestEntry resolves the max). */
  def publishObservedStats(spark: org.apache.spark.sql.SparkSession,
      statsDir: String, keyCol: String, k: Int,
      nRows: Long, mins: Seq[Long], cands: Seq[String],
      verifySource: DataFrame,
      nBytes: Long = -1L,
      freqCands: Seq[(String, Seq[String], Long)] = Nil,
      histSpecs: Seq[(String, Long, Long)] = Nil): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(statsDir))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(statsDir, "_format-stats-kmv-v1"),
      Array.empty[Byte])
    // ONE fused verify scan for the key's skew stat + every freq column
    // + every histogram column's bin counts (overflow-span columns are
    // refused — see histWidth)
    val histKept = histSpecs.filter { case (_, mn, mx) => histWidth(mn, mx) > 0L }
    val binSpecs = histKept.map { case (c, mn, mx) => (c, mn, histWidth(mn, mx)) }
    val (allCounts, allBins) = fusedVerifyCounts(verifySource,
      (keyCol -> cands) +: freqCands.map { case (c, fc, _) => c -> fc },
      binSpecs)
    val (top, hotKeys) = clampTop(allCounts.head, nRows)
    val cur = entryDirs(statsDir).map(_._2).maxOption.getOrElse(0L)
    publishSkew(statsDir, cur + 1L, top, hotKeys)
    freqCands.zip(allCounts.tail).foreach { case ((c, _, cn), counts) =>
      val (floor, kept) = freqsAboveFloor(counts, cn)
      publishFreq(statsDir, cur + 1L, c, floor, kept)
    }
    histKept.zip(binSpecs).zip(allBins).foreach {
      case (((c, mn, mx), (_, _, w)), bins) =>
        publishHist(statsDir, cur + 1L, c, mn, mx, w, bins)
    }
    publishEntry(entryFrame(spark, nRows, mins, keyCol, k, nBytes),
      statsDir, cur + 1L)
    entryDirs(statsDir).filter(_._2 < cur + 1L).foreach { case (p, _) =>
      deleteRecursively(p)
    }
    skewFiles(statsDir).filter(_._2 < cur + 1L).foreach { case (p, _) =>
      java.nio.file.Files.deleteIfExists(p)
    }
    freqFiles(statsDir).filter(_._3 < cur + 1L).foreach { case (p, _, _) =>
      java.nio.file.Files.deleteIfExists(p)
    }
    histFiles(statsDir).filter(_._3 < cur + 1L).foreach { case (p, _, _) =>
      java.nio.file.Files.deleteIfExists(p)
    }
  }

  /** The freq sidecar's publish filter — [[clampTop]]'s per-COLUMN sibling
    * for equality-predicate SELECTIVITY: of a declared filter column's MG
    * candidate values (counted exactly by [[fusedVerifyCounts]]' fused
    * scan), keep only those above the MG observability floor (same
    * determinism argument — membership above the floor is decided by exact
    * counts, so the published set is batch-order-independent even though
    * the candidate set is not). For a low-cardinality column (≤ SkewCap
    * distinct values) this is the complete exact histogram — precisely the
    * q1 segment-filter case.
    *
    * The floor's basis is `colNonNull` — the FREQ COLUMN's own non-null
    * count, i.e. the rows its MG summary actually processed — never the
    * key column's: when the key has more nulls, a key-based floor sits
    * BELOW the column's MG guarantee, values between the floors are
    * published order-dependently, and the reader's "absent ⇒ ≤ floor"
    * bound is unsound (review finding r12). Returns (floor, kept); the
    * floor is persisted in the sidecar so readers bound absent values by
    * the SAME number the publish filtered at. */
  private def freqsAboveFloor(counts: Map[String, Long],
      colNonNull: Long): (Long, Seq[(String, Long)]) = {
    val floor = math.max(0L, colNonNull) / (SkewCap + 1L)
    (floor, counts.filter(_._2 > floor).toSeq.sortBy(_._1))
  }

  /** The (count, KMV, MG, bytes[, per-freq-col MG]) observation columns
    * every stats-equipped writer attaches — named so the publisher can
    * read them back. The byte metric needs the observed frame's schema
    * (variable-width columns are measured, [[rowBytesColumn]]); a caller
    * without one gets a byte-blind triple (entry n_bytes = -1, the byte
    * rung stays row-count-only). */
  def statsObservationColumns(keyCol: String, k: Int = 64,
      schema: Option[org.apache.spark.sql.types.StructType] = None,
      freqCols: Seq[String] = Nil,
      histCols: Seq[String] = Nil)
      : Seq[org.apache.spark.sql.Column] = {
    val key = col(keyCol).cast("string")
    Seq(
      count(key).as("__graft_stats_n"),
      graft.functions.KmvAgg.kMinValues(
        TextHash.sampleKey(concat(lit("kmv:"), key)), k).as("__graft_stats_mins"),
      graft.functions.MisraGriesAgg.candidates(key, SkewCap)
        .as("__graft_stats_cands")) ++
      schema.map(s =>
        coalesce(sum(rowBytesColumn(s)), lit(0L)).as("__graft_stats_bytes")) ++
      freqCols.zipWithIndex.flatMap { case (c, i) =>
        Seq(
          graft.functions.MisraGriesAgg.candidates(col(c).cast("string"), SkewCap)
            .as(s"__graft_stats_freq_$i"),
          // the column's own non-null count — the floor basis its MG
          // guarantee is relative to (see [[freqsAboveFloor]])
          count(col(c).cast("string")).as(s"__graft_stats_freqn_$i"))
      } ++
      histCols.zipWithIndex.flatMap { case (c, i) =>
        // exact min/max — the histogram sidecar's edge basis; bin counts
        // come from the publish tail's fused verify scan
        val x = col(c).cast("long")
        Seq(min(x).as(s"__graft_stats_histmin_$i"),
          max(x).as(s"__graft_stats_histmax_$i"))
      }
  }

  private[graft] def decodeSeq[T](v: Any): Seq[T] = v match {
    case s: scala.collection.Seq[_] => s.map(_.asInstanceOf[T]).toSeq
    case a: Array[_] => a.toSeq.map(_.asInstanceOf[T])
    case other => throw new IllegalStateException(
      s"observe returned ${other.getClass}")
  }

  /** Decode [[statsObservationColumns]] core metrics from an Observation's
    * result map; 4th element -1 when the writer was byte-blind. */
  def decodeStatsObservation(m: Map[String, Any])
      : (Long, Seq[Long], Seq[String], Long) =
    (m("__graft_stats_n").asInstanceOf[Long],
      decodeSeq[Long](m("__graft_stats_mins")),
      decodeSeq[String](m("__graft_stats_cands")),
      m.get("__graft_stats_bytes").map(_.asInstanceOf[Long]).getOrElse(-1L))

  /** Skew sidecar `skew-<version>`: first line the clamped exact top-key
    * count for the SAME-version entry, then one URL-ENCODED hot key per
    * line (keys are arbitrary strings — encoding makes embedded newlines
    * safe), present only when the count is nonzero. Kept OUT of the
    * entry parquet so the core entry's bit-identity invariant (append
    * sequence ≡ fresh write) is untouched — the sidecar simply doesn't
    * exist for append-produced versions. Written via temp + atomic move. */
  private def publishSkew(dir: String, version: Long, top: Long,
      hotKeys: Seq[String]): Unit = {
    val tmp = java.nio.file.Paths.get(dir, s".skew-staging-${System.nanoTime()}")
    val body = (top.toString +: hotKeys.map(k =>
      java.net.URLEncoder.encode(k, "UTF-8"))).mkString("\n")
    java.nio.file.Files.writeString(tmp, body)
    // REPLACE: refreshSkew re-arms an existing version's sidecar in place
    java.nio.file.Files.move(tmp,
      java.nio.file.Paths.get(dir, f"skew-$version%012d"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  private def readSkew(dir: String, version: Long): Long = {
    val p = java.nio.file.Paths.get(dir, f"skew-$version%012d")
    if (java.nio.file.Files.exists(p))
      java.nio.file.Files.readString(p).takeWhile(_ != '\n').trim.toLong
    else -1L
  }

  /** An entry version's hot-key VALUES (actuation metadata for the salted
    * join's hot/cold split) — non-empty only when the same-version sidecar
    * exists with a nonzero clamped count. Any subset/order yields the
    * identical join output (the split is output-invisible); the stored
    * set is every key over the MG floor, ≤ SkewCap of them. */
  private def readHotKeys(dir: String, version: Long): Seq[String] = {
    val p = java.nio.file.Paths.get(dir, f"skew-$version%012d")
    if (!java.nio.file.Files.exists(p)) Nil
    else java.nio.file.Files.readString(p).split('\n').toSeq.drop(1)
      .filter(_.nonEmpty)
      .map(k => java.net.URLDecoder.decode(k, "UTF-8"))
  }

  /** Freq sidecar `freq-<urlencoded col>-<version>`: a `# <floor>` header
    * (the publish-time observability floor — stored so readers bound
    * ABSENT values by the same number the publish filtered at; '#' can
    * never open a value line, URL encoding emits it as %23), then one
    * URL-ENCODED `value count` line per tracked value of the column
    * (exact counts above that floor — [[freqsAboveFloor]]). Same placement
    * rules as the skew sidecar: written before the entry rename, absent
    * for append-produced versions, atomic temp+move publish (REPLACE so
    * [[refreshSkew]] can re-arm an existing version). */
  private def publishFreq(dir: String, version: Long, colName: String,
      floor: Long, freqs: Seq[(String, Long)]): Unit = {
    val tmp = java.nio.file.Paths.get(dir, s".freq-staging-${System.nanoTime()}")
    val body = (s"# $floor" +: freqs.map { case (v, c) =>
      s"${java.net.URLEncoder.encode(v, "UTF-8")} $c"
    }).mkString("\n")
    java.nio.file.Files.writeString(tmp, body)
    java.nio.file.Files.move(tmp,
      java.nio.file.Paths.get(dir,
        f"freq-${java.net.URLEncoder.encode(colName, "UTF-8")}%s-$version%012d"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** All freq sidecars at one entry version, parsed to
    * column → (stored floor, value → exact count). A sidecar without the
    * `# <floor>` header is malformed — fail loudly rather than guess a
    * floor the publish didn't filter at. */
  private def readFreqs(dir: String, version: Long): Map[String, FreqStats] =
    freqFiles(dir).filter(_._3 == version).map { case (p, colName, _) =>
      val lines = java.nio.file.Files.readString(p)
        .split('\n').toSeq.filter(_.nonEmpty)
      val floor = lines.headOption match {
        case Some(h) if h.startsWith("# ") => h.stripPrefix("# ").trim.toLong
        case _ => throw new IllegalStateException(
          s"freq sidecar $p lacks its '# <floor>' header — absent-value " +
            "bounds would be guesses; rebuild the sidecar (refreshSkew)")
      }
      val entries = lines.tail.map { line =>
        val i = line.lastIndexOf(' ')
        java.net.URLDecoder.decode(line.substring(0, i), "UTF-8") ->
          line.substring(i + 1).toLong
      }
      colName -> FreqStats(floor, entries.toMap)
    }.toMap

  /** Histogram sidecar `hist-<urlencoded col>-<version>`: a
    * `# <min> <max> <width>` header (exact column min/max from the stats
    * pass; width = `(max − min) div HistBins + 1` — the edges' basis,
    * stored so the reader bins with EXACTLY the publish-time arithmetic),
    * then one `<binIndex> <count>` line per NONZERO bin (exact counts
    * from the fused verify scan). Write-time-only like skew/freq (bin
    * counts are additive but EDGES shift per batch, so append-merging is
    * not exact); same atomic temp+move publish, [[refreshSkew]] re-arms. */
  private def publishHist(dir: String, version: Long, colName: String,
      minV: Long, maxV: Long, width: Long, bins: Array[Long]): Unit = {
    val tmp = java.nio.file.Paths.get(dir, s".hist-staging-${System.nanoTime()}")
    val body = (s"# $minV $maxV $width" +:
      bins.toSeq.zipWithIndex.collect { case (c, i) if c > 0L => s"$i $c" })
      .mkString("\n")
    java.nio.file.Files.writeString(tmp, body)
    java.nio.file.Files.move(tmp,
      java.nio.file.Paths.get(dir,
        f"hist-${java.net.URLEncoder.encode(colName, "UTF-8")}%s-$version%012d"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** All histogram sidecars at one entry version. A header-less sidecar
    * is malformed — loud, like [[readFreqs]]. */
  private def readHists(dir: String, version: Long): Map[String, HistStats] =
    histFiles(dir).filter(_._3 == version).map { case (p, colName, _) =>
      val lines = java.nio.file.Files.readString(p)
        .split('\n').toSeq.filter(_.nonEmpty)
      val (mn, mx, w) = lines.headOption match {
        case Some(h) if h.startsWith("# ") =>
          h.stripPrefix("# ").trim.split(' ') match {
            case Array(a, b, c) => (a.toLong, b.toLong, c.toLong)
            case _ => throw new IllegalStateException(
              s"hist sidecar $p header is malformed — rebuild (refreshSkew)")
          }
        case _ => throw new IllegalStateException(
          s"hist sidecar $p lacks its '# <min> <max> <width>' header — " +
            "range bounds would be guesses; rebuild (refreshSkew)")
      }
      require(w > 0L, s"hist sidecar $p has non-positive width $w — " +
        "corrupt (the publish path refuses overflow-span domains); rebuild")
      val bins = lines.tail.map { line =>
        val i = line.indexOf(' ')
        line.substring(0, i).toInt -> line.substring(i + 1).toLong
      }.toMap
      colName -> HistStats(mn, mx, w, bins)
    }.toMap

  private def histFiles(dir: String): Seq[(java.nio.file.Path, String, Long)] = {
    val stream = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
    try {
      import scala.jdk.CollectionConverters._
      stream.iterator().asScala.toSeq.flatMap { p =>
        val n = p.getFileName.toString
        if (n.startsWith("hist-") && !n.startsWith(".")) {
          val rest = n.stripPrefix("hist-")
          val cut = rest.lastIndexOf('-')
          if (cut <= 0) None
          else scala.util.Try(
            (p, java.net.URLDecoder.decode(rest.substring(0, cut), "UTF-8"),
              rest.substring(cut + 1).toLong)).toOption
        } else None
      }
    } finally stream.close()
  }

  /** (path, decoded column name, version) for every freq sidecar. The
    * version is the text after the LAST dash (URL encoding never emits a
    * dash-digit-run tail of its own — '-' survives encoding but the
    * 12-digit zero-padded suffix is appended by us). */
  private def freqFiles(dir: String): Seq[(java.nio.file.Path, String, Long)] = {
    val stream = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
    try {
      import scala.jdk.CollectionConverters._
      stream.iterator().asScala.toSeq.flatMap { p =>
        val n = p.getFileName.toString
        if (n.startsWith("freq-") && !n.startsWith(".")) {
          val rest = n.stripPrefix("freq-")
          val cut = rest.lastIndexOf('-')
          if (cut <= 0) None
          else scala.util.Try(
            (p, java.net.URLDecoder.decode(rest.substring(0, cut), "UTF-8"),
              rest.substring(cut + 1).toLong)).toOption
        } else None
      }
    } finally stream.close()
  }

  private def skewFiles(dir: String): Seq[(java.nio.file.Path, Long)] = {
    val stream = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
    try {
      import scala.jdk.CollectionConverters._
      stream.iterator().asScala.toSeq.flatMap { p =>
        val n = p.getFileName.toString
        if (n.startsWith("skew-")) Some(p -> n.stripPrefix("skew-").toLong)
        else None
      }
    } finally stream.close()
  }

  /** Stage + atomically rename `entry-<version>` under `dir`. */
  private def publishEntry(row: DataFrame, dir: String, version: Long): Unit = {
    val staging = s"$dir/.staging-${System.nanoTime()}"
    row.coalesce(1).write.mode("overwrite").parquet(staging)
    java.nio.file.Files.move(
      java.nio.file.Paths.get(staging),
      java.nio.file.Paths.get(dir, f"entry-$version%012d"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    ()
  }

  private def entryDirs(dir: String): Seq[(java.nio.file.Path, Long)] = {
    val stream = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
    try {
      import scala.jdk.CollectionConverters._
      stream.iterator().asScala.toSeq.flatMap { p =>
        val n = p.getFileName.toString
        if (n.startsWith("entry-")) Some(p -> n.stripPrefix("entry-").toLong)
        else None
      }
    } finally stream.close()
  }

  private def latestEntry(spark: org.apache.spark.sql.SparkSession,
      dir: String): (DataFrame, Long) = {
    val entries = entryDirs(dir)
    require(entries.nonEmpty, s"no stats entries under $dir")
    val (p, v) = entries.maxBy(_._2)
    (spark.read.parquet(p.toString), v)
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      val stream = java.nio.file.Files.walk(p)
      val paths = try {
        import scala.jdk.CollectionConverters._
        stream.iterator().asScala.toSeq.reverse
      } finally stream.close()
      paths.foreach(java.nio.file.Files.deleteIfExists(_))
    }

  /** Two-sample Kolmogorov–Smirnov drift statistic — the numeric-column
    * sibling of t18's token drift (the DQ monitor that catches "this
    * week's values are distributed differently" before a model does):
    * D = max |ECDF_A − ECDF_B| over the merged support, computed as the
    * EXACT integer max |i_A·n_B − i_B·n_A| (cross-multiplied ranks — no
    * double CDF anywhere) and reported ×10⁴ via `div`. Values are
    * compared at `binCents` granularity; the default 1 is exact, and at
    * 100 TB a coarser bin keeps the distinct-support walk bounded (the
    * running sums ride ONE unpartitioned window over DISTINCT bins —
    * that cardinality, not the row count, must stay sane; bin for
    * continuous metrics). Output one row: (n_a, n_b, d_num, ks_x10000).
    */
  def ksDrift(dfA: DataFrame, dfB: DataFrame, valueCol: String,
      binCents: Long = 1L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(binCents > 0)
    val bin = (df: DataFrame) => df
      .select(expr(s"CAST($valueCol * 100 AS BIGINT) div ${binCents}L").as("bin"))
    val counts = bin(dfA).groupBy(col("bin")).agg(count(lit(1)).as("na_v"))
      .join(bin(dfB).groupBy(col("bin")).agg(count(lit(1)).as("nb_v")),
        Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("na_v"), lit(0L)).as("na_v"),
        coalesce(col("nb_v"), lit(0L)).as("nb_v"))
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val walk = counts
      .withColumn("ia", sum(col("na_v")).over(w))
      .withColumn("ib", sum(col("nb_v")).over(w))
    val totals = counts.groupBy().agg(
      sum(col("na_v")).as("n_a"), sum(col("nb_v")).as("n_b"))
    walk.crossJoin(broadcast(totals))
      .select(col("n_a"), col("n_b"),
        abs(col("ia") * col("n_b") - col("ib") * col("n_a")).as("gap"))
      .groupBy(col("n_a"), col("n_b"))
      .agg(max(col("gap")).as("d_num"))
      // Nested floored division — floor(floor(x/a)/b) = floor(x/(a·b)) for
      // positive operands — is bit-identical to the oracle's single `//`
      // but never forms the n_a·n_b product (the first BIGINT wrap point).
      // Hard exactness bound that remains: the gap cross-multiplies ranks,
      // so ia·n_b (≤ n_a·n_b) and d_num·10⁴ must stay under 2⁶³ —
      // n_a·n_b ≤ ~9.2e14 in the worst case (D→1). Past that, exact
      // integer KS does not fit BIGINT: pre-aggregate/sample a side or
      // accept a double-CDF variant; this operator stays exact and loud
      // about its envelope rather than silently wrapping further.
      .withColumn("ks_x10000", expr("(d_num * 10000L div n_a) div n_b"))
  }

  /** Join-cardinality PREFLIGHT — the planner estimate run as a query:
    * |A ⋈ B on key| ≈ n_A·n_B / max(d_A, d_B) (the textbook containment
    * assumption every cost-based optimizer starts from), with the distinct
    * counts d coming from the deterministic KMV sketch (one k-row buffer
    * per side — what a catalog would persist as table stats) rather than
    * a distinct scan. The actual join count rides along as the audit, so
    * the row is a hash-checkable claim about ESTIMATION quality: at
    * 100 TB you run the sketch halves on the catalog's stats and skip the
    * audit join. All-BIGINT `div` arithmetic; n_A·n_B is guarded against
    * 2⁶³ overflow loudly (divide the larger side by max_d first when it
    * would overflow). Output one row: (n_a, n_b, est_distinct_a,
    * est_distinct_b, est_rows, actual_rows, err_bp). */
  def joinCardinalityEstimate(dfA: DataFrame, dfB: DataFrame,
      keyA: String, keyB: String, k: Int = 64): DataFrame = {
    val est = (df: DataFrame, key: String) => {
      // ONE aggregate pass per side: KmvAgg dedupes inside the k-slot
      // buffer (duplicates can never fill the slots), replacing the old
      // distinct-shuffle → TopKAgg chain with identical output.
      val keyC = col(key).cast("string")
      broadcast(df
        .agg(count(keyC).as("n_rows"),
          graft.functions.KmvAgg.kMinValues(
            TextHash.sampleKey(concat(lit("kmv:"), keyC)), k).as("mins"))
        .withColumn("n_kept", size(col("mins")).cast("long"))
        .withColumn("kth_min",
          when(col("n_kept") > 0L,
            element_at(col("mins"), col("n_kept").cast("int")))
            .otherwise(lit(0L)))
        .select(col("n_rows"), expr(s"CASE WHEN n_kept < $k THEN n_kept " +
          s"ELSE (${k - 1}L * ${TextHash.Prime}L) div (kth_min + 1L) END").as("d")))
    }
    val a = est(dfA, keyA)
    val b = est(dfB, keyB)
      .select(col("n_rows").as("n_rows_b"), col("d").as("d_b"))
    val actual = dfA.select(col(keyA).as("__k"))
      .join(dfB.select(col(keyB).as("__k")), Seq("__k"))
      .groupBy().agg(count(lit(1)).as("actual_rows"))
    // overflow fence: the fitness test (n_a ≤ 2⁶² div n_b) is evaluated
    // INSTEAD of the multiply, so ANSI mode cannot throw; both engines
    // replay the identical branch arithmetic.
    a.crossJoin(b).crossJoin(actual)
      .select(
        col("n_rows").as("n_a"), col("n_rows_b").as("n_b"),
        col("d").as("est_distinct_a"), col("d_b").as("est_distinct_b"),
        expr("CASE WHEN n_rows = 0L OR n_rows_b = 0L THEN 0L " +
          "WHEN n_rows <= 4611686018427387904L div n_rows_b " +
          "THEN (n_rows * n_rows_b) div greatest(d, d_b, 1L) " +
          "WHEN (n_rows div greatest(d, d_b, 1L)) <= 9223372036854775807L div n_rows_b " +
          "THEN (n_rows div greatest(d, d_b, 1L)) * n_rows_b " +
          "ELSE 9223372036854775807L END").as("est_rows"),
        col("actual_rows"))
      .withColumn("err_bp",
        expr("CASE WHEN actual_rows = 0 THEN 0L " +
          "ELSE abs(est_rows - actual_rows) * 10000L div actual_rows END"))
  }
}
