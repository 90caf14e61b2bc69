package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization — the resample + forward-fill operation that
  * turns irregular event streams into fixed-step grids (the reference's
  * domain data is already regular 15-min readings; real sensor/event data
  * is not, and every downstream rollup assumes a grid).
  *
  * Per key: bucket readings to the step (order-independent `avg` per
  * bucket, rounded once), span the [first, last] bucket range with
  * `sequence`, left-join the real buckets in, and forward-fill the gaps
  * with `last(_, ignoreNulls)` over an ordered per-key window.
  *
  * Scale shape: one (key, bucket) aggregate shuffle, one grid join on the
  * same key pair, one per-key window sort. The grid explode generates
  * span/step rows per key — bounded by wall-clock span, not event count,
  * and evenly keyed. No leading nulls by construction (each key's grid
  * starts at its own first reading's bucket). */
object Timeseries {

  /** (key, bucket, value_ff, filled): `value_ff` is the bucket's rounded
    * mean, forward-filled across empty buckets; `filled` marks rows whose
    * value was carried, not observed. Bucketing AND the grid stride both
    * derive from `stepMinutes` (epoch-floor to the step), so every
    * observation lands on a grid bucket at any step — a `date_trunc`
    * bucket with a non-matching grid stride would silently drop readings
    * between grid points (review finding). */
  def gapFillForwardFill(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts", valCol: String = "value",
      stepMinutes: Int = 1): DataFrame = {
    val k = col(keyCol)
    val w = Window.partitionBy(k).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketGrid(events, keyCol, tsCol, valCol, stepMinutes)
      .select(
        k, col("bucket"),
        last(col("v"), ignoreNulls = true).over(w).as("value_ff"),
        col("v").isNull.as("filled"))
  }

  /** The (key, bucket)-gridded frame shared by the fill variants: bucket
    * means joined onto each key's dense [first, last] bucket grid; gap
    * buckets carry `v` NULL. */
  private def bucketGrid(events: DataFrame, keyCol: String, tsCol: String,
      valCol: String, stepMinutes: Int): DataFrame = {
    require(stepMinutes > 0, s"stepMinutes must be positive, got $stepMinutes")
    val k = col(keyCol)
    val stepUs = stepMinutes * 60000000L
    // `div`, not `/` (double-divide on BIGINT — CLAUDE.md invariant) —
    // corrected to FLOOR division: `div` truncates toward zero, so a
    // pre-1970 reading would land in the bucket ABOVE it and diverge from
    // a date_trunc-style oracle (review finding).
    val floorDiv =
      s"(unix_micros($tsCol) div $stepUs) - " +
        s"(CASE WHEN unix_micros($tsCol) % $stepUs != 0 AND unix_micros($tsCol) < 0 THEN 1 ELSE 0 END)"
    val perBucket = events
      .groupBy(k,
        expr(s"timestamp_micros(($floorDiv) * $stepUs)").as("bucket"))
      .agg(round(avg(col(valCol)), 7).as("v"))
    val grid = perBucket
      .groupBy(k)
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(k, explode(expr(s"sequence(lo, hi, interval $stepMinutes minute)")).as("bucket"))
    grid.join(perBucket, Seq(keyCol, "bucket"), "left")
  }

  /** Linear-interpolation gap fill — the resample variant that estimates
    * each missing bucket from its surrounding observations instead of
    * carrying the last one (sensor pipelines interpolate continuous
    * signals; forward-fill is for step-valued state). Per key, each gap
    * bucket takes `prev + (next − prev) · frac`, where prev/next are the
    * nearest OBSERVED bucket means (already rounded once, so both engines
    * interpolate from identical inputs) and `frac` is the integer bucket
    * distance ratio cast to double; the result is rounded to 7.
    *
    * Cross-engine determinism: bucket indices are exact BIGINTs
    * (`unix_micros(bucket) div stepUs` — buckets are exact step multiples,
    * so truncating div == floor at any sign), and the lerp expression is
    * written in the same shape on the oracle side (one divide, one
    * multiply, one add — IEEE-identical). Grid rows span [first, last]
    * observed bucket per key, so every gap row has BOTH neighbors —
    * no one-sided extrapolation branch exists.
    *
    * Scale shape: identical to [[gapFillForwardFill]] plus one extra
    * per-key window pass. BOTH neighbor lookups are RUNNING frames
    * (UNBOUNDED PRECEDING → CURRENT ROW): prev over the ascending bucket
    * order, next over the DESCENDING order. The naive "next" frame
    * (CURRENT ROW → UNBOUNDED FOLLOWING) is the trap: Spark's
    * UnboundedFollowing frame re-aggregates the row's whole suffix per
    * row — O(rows²) per key partition, measured 298.8 s on a 43k-bucket
    * grid at sf0.1 where the running form takes 0.3 s (SCALING #52).
    *
    * Output: (key, bucket, value_li, filled). */
  def gapFillInterpolate(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts", valCol: String = "value",
      stepMinutes: Int = 1): DataFrame = {
    val k = col(keyCol)
    val stepUs = stepMinutes * 60000000L
    val wPrev = Window.partitionBy(k).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNextRev = Window.partitionBy(k).orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bi = expr(s"unix_micros(bucket) div $stepUs")
    val obsIdx = when(col("v").isNotNull, bi)
    val pv = last(col("v"), ignoreNulls = true).over(wPrev)
    val pi = last(obsIdx, ignoreNulls = true).over(wPrev)
    val nv = last(col("v"), ignoreNulls = true).over(wNextRev)
    val ni = last(obsIdx, ignoreNulls = true).over(wNextRev)
    val lerp = round(
      pv + (nv - pv) * ((bi - pi).cast("double") / (ni - pi).cast("double")), 7)
    bucketGrid(events, keyCol, tsCol, valCol, stepMinutes)
      .select(
        k, col("bucket"),
        when(col("v").isNotNull, col("v")).otherwise(lerp).as("value_li"),
        col("v").isNull.as("filled"))
  }

  /** Weekly cohort-retention matrix — the product-analytics staple: users
    * grouped by the week of their FIRST event, activity counted per
    * (cohort, weeks-since-cohort) cell. Weeks are epoch weeks (floor-div
    * of epoch days by 7) — pure integer arithmetic with no calendar-week
    * convention to disagree on across engines. Precondition: timestamps
    * ≥ 1970 (the `div` is a floor only for non-negative day counts).
    *
    * Scale shape: one key-grouped min (the cohort assignment), one
    * key-keyed join of per-event weeks against it, one grouped
    * COUNT(DISTINCT key) — all shuffles keyed by the user key or the
    * (cohort, offset) cell; no window, no corpus-sized broadcast.
    * Output: (cohort_wk, week_offset, active_users). */
  def cohortRetention(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val k = col(keyCol)
    val perUser = events.select(k,
      expr(s"datediff(to_date($tsCol), date'1970-01-01') div 7").as("wk"))
    val cohorts = perUser.groupBy(k).agg(min(col("wk")).as("cohort_wk"))
    perUser.join(cohorts, Seq(keyCol))
      .groupBy(col("cohort_wk"),
        (col("wk") - col("cohort_wk")).as("week_offset"))
      .agg(countDistinct(k).as("active_users"))
  }

  /** Fixed-count quantile bucketing per group (`ntile`) — the feature
    * binning step of dataset stratification. Total order required for
    * determinism: pass tie-free `orderCols`. */
  def quantileBuckets(df: DataFrame, partCol: String, orderCols: Seq[Column],
      n: Int = 10): DataFrame =
    df.withColumn("tile",
      ntile(n).over(Window.partitionBy(col(partCol)).orderBy(orderCols: _*)).cast("long"))

  /** Rolling z-score anomaly detection — flag readings that deviate from
    * their key's recent history (monitoring-pipeline primitive; a batch
    * twin of what a streaming detector holds in state). Per key, ordered
    * by the tie-free (ts, id) total order, each reading is scored against
    * the mean/stddev of the `lookback` PRECEDING readings (the frame
    * excludes the current row — scoring a point against a window that
    * contains it dilutes the signal). Rows with fewer than `minPrior`
    * priors or zero variance are unscoreable and dropped.
    *
    * Scale shape: one per-key window sort; the frame aggregates are
    * incremental (no per-row rescan). Keys are independent — skew bounded
    * by per-key event counts, the same bound sessionization (q21) carries.
    */
  def zscoreAnomalies(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts", idCol: String = "event_id", valCol: String = "value",
      lookback: Int = 20, minPrior: Int = 5, threshold: Double = 3.0): DataFrame = {
    require(lookback >= minPrior && minPrior >= 2,
      s"need lookback >= minPrior >= 2, got $lookback/$minPrior")
    val frame = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(-lookback, -1)
    val scored = events.select(
      col(keyCol), col(tsCol), col(idCol), col(valCol),
      avg(col(valCol)).over(frame).as("__mu"),
      stddev_samp(col(valCol)).over(frame).as("__sd"),
      count(col(valCol)).over(frame).as("__n"))
    scored
      .filter(col("__n") >= minPrior && col("__sd") > 0.0)
      .withColumn("__z", (col(valCol) - col("__mu")) / col("__sd"))
      .filter(abs(col("__z")) > threshold)
      .select(
        col(keyCol), col(idCol),
        round(col(valCol), 7).as("value"),
        round(col("__mu"), 7).as("mu"),
        round(col("__z"), 7).as("z"))
  }

  /** Seasonal-naive forecast evaluation — the monitoring baseline every
    * real forecast must beat: predict each hour's total as the total
    * `periodHours` earlier (the season lag), score with per-hour absolute
    * error in integer cents. Gaps are handled by the JOIN, not a lag
    * window: `lag()` over the observed hour sequence silently reads the
    * previous OBSERVED hour when an hour is missing, which is not the
    * seasonal predecessor — the equi-join on `hour = hour + period` only
    * pairs true (t, t−period) hours.
    *
    * Plan: one hour-bucket aggregate (map-side combined), one self
    * equi-join on the hour key. All-BIGINT cents; output rows are the
    * hours where both actual and seasonal predecessor exist. */
  def seasonalNaiveEval(events: DataFrame, tsCol: String = "ts",
      valCol: String = "value", periodHours: Int = 24): DataFrame = {
    val hourly = events
      .groupBy(date_trunc("hour", col(tsCol)).as("hour"))
      .agg(sum(floor(col(valCol) * 100).cast("long")).as("cents"))
    hourly.as("a")
      .join(hourly.as("f"),
        col("a.hour") === col("f.hour") + expr(s"INTERVAL $periodHours HOURS"))
      .select(
        col("a.hour").as("hour"),
        col("a.cents").as("actual_cents"),
        col("f.cents").as("forecast_cents"),
        abs(col("a.cents") - col("f.cents")).as("abs_err_cents"))
  }

  /** Additive seasonal decomposition (the classical decompose / STL-lite
    * shape): per event-type hourly series → trend (centered `period`-wide
    * moving average, full windows only), seasonal (per hour-of-period
    * mean of the detrended series), residual — with the additive identity
    * `v = trend + seasonal + residual` holding EXACTLY, because every
    * mean is taken as a floored integer `div` on integer cents, identical
    * in both engines (the x14 abs-before-div rule: detrended values can
    * be negative, so the seasonal mean divides a shifted non-negative
    * numerator and shifts back).
    *
    * Scale shape: one hourly aggregate (series-length-sized from there),
    * one per-series window pass for the trend, one (type × period)
    * aggregate for the seasonal — keys independent, no global window.
    * Output: (event_type, hour, v_cents, trend_cents, seasonal_cents,
    * residual_cents), warm-up/cool-down rows without a full window
    * dropped. */
  def seasonalDecompose(events: DataFrame, typeCol: String = "event_type",
      tsCol: String = "ts", valCol: String = "value",
      period: Int = 24): DataFrame = {
    require(period >= 2 && period % 2 == 0, s"even period required: $period")
    val half = period / 2
    val hourly = events
      .groupBy(col(typeCol).as("event_type"),
        date_trunc("hour", col(tsCol)).as("hour"))
      .agg(sum(floor(col(valCol) * 100).cast("long")).as("v_cents"))
    val wTrend = Window.partitionBy(col("event_type"))
      .orderBy(col("hour"))
      .rowsBetween(-half, half - 1)
    // centered MA over exactly `period` rows; count() guards the edges
    val trended = hourly
      .withColumn("w_n", count(lit(1)).over(wTrend))
      .withColumn("w_sum", sum(col("v_cents")).over(wTrend))
      .filter(col("w_n") === period)
      // floored mean on a SHIFTED non-negative numerator (w_sum can be
      // anything in general; shift by a large positive multiple of the
      // divisor so div == floor division on both engines)
      .withColumn("trend_cents",
        expr(s"(w_sum + ${period}L * 1000000000L) div ${period}L - 1000000000L"))
      .withColumn("detrended", col("v_cents") - col("trend_cents"))
      .withColumn("hop", (hour(col("hour")) % period).cast("long"))
    val seasonal = trended
      .groupBy(col("event_type"), col("hop"))
      .agg(sum(col("detrended")).as("s_sum"), count(lit(1)).as("s_n"))
      .withColumn("seasonal_cents",
        expr("(s_sum + s_n * 1000000000L) div s_n - 1000000000L"))
      .select(col("event_type"), col("hop"), col("seasonal_cents"))
    trended.join(seasonal, Seq("event_type", "hop"))
      .select(col("event_type"), col("hour"), col("v_cents"),
        col("trend_cents"), col("seasonal_cents"),
        (col("v_cents") - col("trend_cents") - col("seasonal_cents"))
          .as("residual_cents"))
  }

  /** Event-type transition matrix — first-order Markov statistics over
    * per-key event sequences (the path-analysis primitive behind "what do
    * users do after X": next-step prediction features, funnel-drop
    * diagnosis, session language models). Per key, consecutive events
    * under the tie-free (ts, id) total order form (from_type, to_type)
    * bigrams; the matrix is their count plus the row-conditional
    * probability in basis points (exact BIGINT `div` — counts are
    * non-negative, so truncate-vs-floor never diverges cross-engine).
    *
    * Scale shape: one per-key window sort (keys independent — the q21
    * sessionization skew bound), then a type-pair aggregate whose
    * cardinality is |types|², tiny by construction; the row-totals join is
    * broadcast-sized. The sequence step uses `lead`, not a self-join:
    * position n pairs with n+1 exactly once, gaps in event ids are
    * irrelevant. */
  def eventTransitions(events: DataFrame, keyCol: String = "user_id",
      typeCol: String = "event_type", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val bigrams = events
      .select(col(keyCol), col(typeCol).as("from_type"), col(tsCol), col(idCol))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
    val counts = bigrams.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("from_type")).agg(sum(col("n")).as("__n_from"))
    counts.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        expr("n * 10000L div __n_from").as("prob_bp"))
  }

  /** Ordered multi-step funnel — "did the user do A, THEN B, THEN C within
    * the window": the sequence-matching funnel (q25's two-step version has
    * no order constraint beyond one comparison). Stage i's timestamp is
    * the user's FIRST `steps(i)` event STRICTLY after stage i−1's
    * (same-instant events do not chain), and — when `windowHours` > 0 —
    * within the window anchored at stage 1 (the standard attribution
    * window). Stage i is structurally null whenever stage i−1 is (the
    * strict-after condition propagates nulls), so `reached` = 1 + count
    * of non-null later stages is well-formed.
    *
    * Scale shape: one grouped min per stage over the type-filtered events
    * (filters push to the scan), each joined back on the user key — N
    * key-shuffles for an N-step funnel, no window function, no per-user
    * event sort. Output: one row per user who reached stage 1:
    * (key, reached). */
  def orderedFunnel(events: DataFrame, steps: Seq[String],
      keyCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts", windowHours: Int = 0): DataFrame = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got ${steps.size}")
    val k = col(keyCol)
    var cur = events.filter(col(typeCol) === steps.head)
      .groupBy(k).agg(min(col(tsCol)).as("t1"))
    steps.tail.zipWithIndex.foreach { case (st, i) =>
      val idx = i + 2
      val stepEvents = events.filter(col(typeCol) === st)
        .select(k, col(tsCol).as("__ts"))
      val inWindow = if (windowHours > 0)
        col("__ts") <= expr(s"t1 + INTERVAL $windowHours HOURS") else lit(true)
      val keys = cur.columns.map(col)
      cur = cur.join(stepEvents, Seq(keyCol), "left")
        .groupBy(keys: _*)
        .agg(min(when(col("__ts") > col(s"t${idx - 1}") && inWindow,
          col("__ts"))).as(s"t$idx"))
    }
    cur.select(k,
      (lit(1L) + steps.tail.indices.map(i =>
        col(s"t${i + 2}").isNotNull.cast("long")).reduce(_ + _)).as("reached"))
  }

  /** Exact OLS trend slope per group over integer (x, y) points — the
    * closed-form least-squares fit a monitoring/reporting layer runs per
    * series ("is revenue trending up, and how fast"), kept in pure BIGINT
    * arithmetic so the slope is deterministic cross-engine: slope =
    * (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²), emitted as sign × (|num| div den)
    * — abs BEFORE the integer division because Spark `div` truncates
    * toward zero while DuckDB `//` floors, and a negative numerator would
    * diverge by one (the x14 pattern). Groups with zero x-variance (den
    * = 0: a single point, or all points at one x) have no defined slope
    * and are dropped.
    *
    * Overflow bound (caller's contract): every intermediate is < 2⁶³, so
    * n·max|x|·Σ|y| and Σ|x|·Σ|y| must stay below ~9.2e18 — re-base x to a
    * window-local origin and pick y's unit accordingly (cents over a
    * multi-year daily window fits with two orders of headroom; see the
    * x19 gate row). Scale shape: ONE grouped aggregate of five sums —
    * map-side combined, no window, no second pass. */
  def trendSlope(points: DataFrame, groupCol: String = "grp",
      xCol: String = "x", yCol: String = "y"): DataFrame = {
    val agg = points.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col(xCol)).as("__sx"), sum(col(yCol)).as("__sy"),
        sum(col(xCol) * col(yCol)).as("__sxy"),
        sum(col(xCol) * col(xCol)).as("__sxx"))
      .withColumn("__num", col("n") * col("__sxy") - col("__sx") * col("__sy"))
      .withColumn("__den", col("n") * col("__sxx") - col("__sx") * col("__sx"))
    agg.filter(col("__den") > 0)
      .select(col(groupCol), col("n"),
        (when(col("__num") >= 0, lit(1L)).otherwise(lit(-1L)) *
          expr("abs(__num) div __den")).as("slope"))
  }

  /** One-sided CUSUM drift/changepoint detection (Page, Biometrika 1954)
    * — the sequential monitor that catches "this series has been running
    * above its mean for a while" long before a single-point z-score
    * fires. The textbook recurrence S_t = max(0, S_{t−1} + (x_t − μ −
    * slack)) is SEQUENTIAL, which no SQL window expresses directly; this
    * uses the exact closed form S_t = P_t − min(0, min_{j≤t} P_j) over
    * prefix sums P of the drift — two window passes sharing ONE
    * (series, hour) partitioning/sort, all-BIGINT, so both engines
    * replay it bit-for-bit (spec pins closed-form ≡ recurrence).
    *
    * μ is the per-series mean of hourly cents (floored integer `div` —
    * non-negative sums, so `div` ≡ `//`), folded IN-PLAN via a per-series
    * aggregate join; the alarm threshold is `muFactor`·μ, SF-adaptive
    * with no fixture constant. Scale shape: one hourly aggregate
    * (map-side combined), one small per-series aggregate, one window
    * pass per series — series are independent partitions, never a global
    * window. Output: (event_type, hour, cents, cusum_cents, is_alarm). */
  /** Lag-k autocorrelation in EXACT integer arithmetic — the seasonality
    * detector behind "does this series repeat daily?": ACF(L) =
    * Σ(x_t−x̄)(x_{t+L}−x̄) / Σ(x_t−x̄)², computed over the MEAN-SCALED
    * integers a_t = n·x_t − Σx (multiply the centered values through by n
    * so the fractional mean never appears — no FP anywhere), with the
    * lag pairing an equi-join on `hour = hour + L` (the x13 lesson: a
    * `lag()` window silently pairs across gaps). The single division is
    * emitted as sign·(|num|·10⁴ div den) — abs BEFORE the div, the x14
    * rule, because num is legitimately negative for anti-correlated
    * lags.
    *
    * Overflow envelope (documented contract): Σa² ≈ n³·x̄², so hourly
    * cents need n ≲ 2000 points per series (a month of hours = 720 →
    * 3.7e16, ~250× headroom); longer windows rescale the unit or chunk
    * the series. Values are hourly MEAN cents (floored div — identical
    * in both engines on non-negative sums), so the envelope is
    * SF-invariant: more data changes per-hour counts, not the means.
    *
    * Scale shape: one hourly aggregate, one per-series stats broadcast
    * join, one self equi-join per lag over series-length frames —
    * series are independent; nothing corpus-sized past the first
    * aggregate. Output: (event_type, lag, n_pairs, num, den, acf_bp). */
  def autocorrelation(events: DataFrame, typeCol: String = "event_type",
      tsCol: String = "ts", valCol: String = "value",
      lags: Seq[Int] = Seq(1, 24)): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ > 0), s"positive lags: $lags")
    // FLOORED division for the hourly mean (Spark `div` truncates toward
    // zero, the oracle's `//` floors — they agree only on non-negative
    // sums, and summed cents CAN go negative under a fixture with negative
    // values): subtract 1 when the sum is negative with a remainder, the
    // same correction Profiling's histogram binning uses.
    val hourly = events
      .groupBy(col(typeCol).as("event_type"),
        date_trunc("hour", col(tsCol)).as("hour"))
      .agg(expr(s"sum(CAST(floor($valCol * 100) AS BIGINT))").as("__sc"),
        count(lit(1)).as("__nh"))
      .select(col("event_type"), col("hour"), expr(
        "__sc div __nh - (CASE WHEN __sc < 0 AND __sc % __nh != 0 THEN 1 ELSE 0 END)")
        .as("xbar"))
    val stats = hourly.groupBy(col("event_type"))
      .agg(count(lit(1)).as("__n"), sum(col("xbar")).as("__s"))
    val a = hourly.join(broadcast(stats), Seq("event_type"))
      .select(col("event_type"), col("hour"),
        (col("__n") * col("xbar") - col("__s")).as("a"))
    val den = a.groupBy(col("event_type"))
      .agg(sum(col("a") * col("a")).as("den"))
    val perLag = lags.map { lag =>
      a.as("l")
        .join(a.as("r"),
          col("l.event_type") === col("r.event_type") &&
            col("l.hour") === col("r.hour") + expr(s"INTERVAL $lag HOURS"))
        .groupBy(col("l.event_type").as("event_type"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("l.a") * col("r.a")).as("num"))
        .withColumn("lag", lit(lag.toLong))
    }.reduce(_ unionByName _)
    perLag.join(den, Seq("event_type"))
      .select(col("event_type"), col("lag"), col("n_pairs"),
        col("num"), col("den"),
        (when(col("num") >= 0, lit(1L)).otherwise(lit(-1L)) *
          expr("abs(num) * 10000L div den")).as("acf_bp"))
  }

  def cusumChangepoints(events: DataFrame, typeCol: String = "event_type",
      tsCol: String = "ts", valCol: String = "value",
      slackCents: Long = 0L, muFactor: Long = 8L): DataFrame = {
    val hourly = events
      .groupBy(col(typeCol).as("event_type"),
        date_trunc("hour", col(tsCol)).as("hour"))
      .agg(sum(floor(col(valCol) * 100).cast("long")).as("cents"))
    // FLOORED division (see autocorrelation's hourly mean): Spark `div`
    // truncates, the x36 oracle's `//` floors — correct for negative sums.
    val mu = hourly.groupBy(col("event_type"))
      .agg(sum(col("cents")).as("__sc"), count(lit(1)).as("__nh"))
      .select(col("event_type"), expr(
        "__sc div __nh - (CASE WHEN __sc < 0 AND __sc % __nh != 0 THEN 1 ELSE 0 END)")
        .as("__mu"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hourly.join(mu, Seq("event_type"))
      .withColumn("__p",
        sum(col("cents") - col("__mu") - lit(slackCents)).over(w))
      .withColumn("__s",
        col("__p") - least(lit(0L), min(col("__p")).over(w)))
      .select(col("event_type"), col("hour"), col("cents"),
        col("__s").as("cusum_cents"),
        (col("__s") > col("__mu") * muFactor).cast("long").as("is_alarm"))
  }
}
