package graft

import org.apache.spark.sql.functions._

import graft.operators.Timeseries

class TimeseriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new java.sql.Timestamp(min * 60000L)

  test("gapFillForwardFill: gaps carry the last observed bucket mean; keys are isolated") {
    val events = Seq(
      (1L, ts(0), 10.0), (1L, ts(0), 14.0), // bucket 0 → mean 12.0
      (1L, ts(3), 30.0),                    // buckets 1-2 filled with 12.0
      (2L, ts(1), 5.0), (2L, ts(2), 7.0)    // key 2: no gaps, own range
    ).toDF("user_id", "ts", "value")
    val out = Timeseries.gapFillForwardFill(events)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 60000L,
        r.getDouble(2), r.getBoolean(3))).toSet
    assert(out === Set(
      (1L, 0L, 12.0, false),
      (1L, 1L, 12.0, true),
      (1L, 2L, 12.0, true),
      (1L, 3L, 30.0, false),
      (2L, 1L, 5.0, false),
      (2L, 2L, 7.0, false)))
  }

  test("gapFillForwardFill: single-reading key yields exactly one unfilled row") {
    val one = Seq((9L, ts(42), 3.5)).toDF("user_id", "ts", "value")
    val out = Timeseries.gapFillForwardFill(one).collect()
    assert(out.length === 1)
    assert(out.head.getDouble(2) === 3.5 && !out.head.getBoolean(3))
  }

  test("gapFillForwardFill: non-default step buckets observations onto the step grid (no drops)") {
    // Readings at minutes 0, 3, 7 with a 5-minute step: minute 3 must land
    // in bucket 0's mean (a minute-grained bucket off the 5-min grid
    // silently dropped it — review finding), minute 7 in bucket 5's.
    val events = Seq(
      (1L, ts(0), 10.0), (1L, ts(3), 20.0), (1L, ts(7), 70.0)
    ).toDF("user_id", "ts", "value")
    val out = Timeseries.gapFillForwardFill(events, stepMinutes = 5)
      .collect()
      .map(r => (r.getTimestamp(1).getTime / 60000L, r.getDouble(2), r.getBoolean(3))).toSet
    assert(out === Set((0L, 15.0, false), (5L, 70.0, false)))
  }

  test("gapFillForwardFill: pre-1970 timestamps bucket DOWNWARD (floor, not truncate-toward-zero)") {
    // 1969-12-31 23:59:30 (epoch −30 s) must land in the 23:59 bucket,
    // not 1970-01-01 00:00 (review finding: `div` truncates toward zero).
    val events = Seq((1L, new java.sql.Timestamp(-30000L), 4.0))
      .toDF("user_id", "ts", "value")
    val out = Timeseries.gapFillForwardFill(events).head()
    assert(out.getTimestamp(1).getTime === -60000L)
    assert(out.getDouble(2) === 4.0 && !out.getBoolean(3))
  }

  test("gapFillInterpolate: gap buckets lerp between neighbors; observed buckets keep their mean") {
    val events = Seq(
      (1L, ts(0), 10.0), (1L, ts(0), 14.0), // bucket 0 → mean 12.0
      (1L, ts(3), 30.0),                    // buckets 1-2 lerp to 18.0, 24.0
      (2L, ts(1), 5.0), (2L, ts(2), 7.0)    // key 2: no gaps, own range
    ).toDF("user_id", "ts", "value")
    val out = Timeseries.gapFillInterpolate(events)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 60000L,
        r.getDouble(2), r.getBoolean(3))).toSet
    assert(out === Set(
      (1L, 0L, 12.0, false),
      (1L, 1L, 18.0, true),
      (1L, 2L, 24.0, true),
      (1L, 3L, 30.0, false),
      (2L, 1L, 5.0, false),
      (2L, 2L, 7.0, false)))
  }

  test("gapFillInterpolate: fraction is the bucket-distance ratio, not a fixed midpoint") {
    val events = Seq(
      (1L, ts(0), 0.0), (1L, ts(4), 1.0)
    ).toDF("user_id", "ts", "value")
    val out = Timeseries.gapFillInterpolate(events)
      .collect()
      .map(r => r.getTimestamp(1).getTime / 60000L -> r.getDouble(2)).toMap
    assert(out === Map(0L -> 0.0, 1L -> 0.25, 2L -> 0.5, 3L -> 0.75, 4L -> 1.0))
  }

  test("cohortRetention: cohorts anchor at first event; cells count distinct active users") {
    def dts(day: Int) = new java.sql.Timestamp(day * 86400000L)
    // A: epoch-weeks 0 and 2; B: week 1 only; C: weeks 0 and 1
    val events = Seq(
      (1L, dts(0)), (1L, dts(15)), (2L, dts(8)), (3L, dts(1)), (3L, dts(9)),
      (3L, dts(2)) // same-week repeat must not double-count
    ).toDF("user_id", "ts")
    val out = Timeseries.cohortRetention(events)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      (0L, 0L) -> 2L, // A and C in their cohort week
      (0L, 1L) -> 1L, // C the week after
      (0L, 2L) -> 1L, // A two weeks after
      (1L, 0L) -> 1L  // B's own cohort
    ))
  }

  test("quantileBuckets: tiles are contiguous, sized within one, ordered by the key") {
    val df = (1L to 23L).map(i => (i, "g", i.toDouble)).toDF("k", "grp", "v")
    val out = Timeseries.quantileBuckets(df, "grp", Seq(col("v"), col("k")), n = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // 23 rows into 4 tiles → sizes 6,6,6,5; tile boundaries follow v order
    val sizes = out.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(sizes === Map(1L -> 6, 2L -> 6, 3L -> 6, 4L -> 5))
    assert(out(1L) === 1L && out(23L) === 4L)
    assert((1L to 22L).forall(i => out(i) <= out(i + 1)), "tiles monotone in sort order")
  }

  test("zscoreAnomalies: spike flagged against PRIOR window only; warmup and flat series unscoreable") {
    def ts(m: Int) = new java.sql.Timestamp(m * 60000L)
    // user 1: ten steady readings then a spike; user 2: constant (sd=0)
    val steady = (0 until 10).map(i => (1L, ts(i), i.toLong, 10.0 + (i % 2) * 0.2))
    val spike = Seq((1L, ts(10), 10L, 50.0))
    val flat = (0 until 10).map(i => (2L, ts(i), (100 + i).toLong, 7.0))
    val events = (steady ++ spike ++ flat)
      .toDF("user_id", "ts", "event_id", "value")
    val out = Timeseries.zscoreAnomalies(events, lookback = 20, minPrior = 5)
      .collect()
    // only the spike is flagged: steady rows are within 3σ of each other,
    // user 2 has zero variance, and the first 5 rows of each user are warmup
    assert(out.length === 1)
    assert(out(0).getLong(0) === 1L && out(0).getLong(1) === 10L)
    assert(out(0).getDouble(4) > 3.0, s"z=${out(0).getDouble(4)}")
  }

  test("zscoreAnomalies: frame excludes the current row (self-inclusion would dilute the spike)") {
    def ts(m: Int) = new java.sql.Timestamp(m * 60000L)
    val events = ((0 until 8).map(i => (1L, ts(i), i.toLong, 5.0 + (i % 2) * 0.1)) :+
      ((1L, ts(8), 8L, 9.0))).toDF("user_id", "ts", "event_id", "value")
    val row = Timeseries.zscoreAnomalies(events, lookback = 20, minPrior = 5).head()
    // mu must be the mean of the 8 PRIOR readings (≈5.05), not dragged
    // toward the spike by including it
    assert(math.abs(row.getDouble(3) - 5.05) < 1e-9, s"mu=${row.getDouble(3)}")
  }

  test("seasonal-naive eval pairs true 24h predecessors; gaps never slip the season") {
    def ts(h: Int) = new java.sql.Timestamp(h * 3600000L)
    // hours 0, 24, 48 observed; hour 25 missing BUT hour 1 also missing —
    // and hour 49's predecessor (25) is absent so it must not pair with 24.
    val events = Seq(
      (ts(0), 1.00), (ts(24), 2.00), (ts(48), 3.50), (ts(49), 9.99)
    ).toDF("ts", "value")
    val out = Timeseries.seasonalNaiveEval(events)
      .collect().map(r => (r.getTimestamp(0).getTime / 3600000L,
        r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    // only (24 ← 0) and (48 ← 24) pair; 49 has no hour-25 predecessor
    assert(out === Array(
      (24L, 200L, 100L, 100L),
      (48L, 350L, 200L, 150L)))
  }

  test("eventTransitions: per-key bigrams under the (ts, id) total order; row-conditional bp") {
    def ts(m: Int) = new java.sql.Timestamp(m * 60000L)
    // user 1: a→b→a→c; user 2: b→a. Ties on ts broken by event_id.
    val events = Seq(
      (1L, ts(0), 0L, "a"), (1L, ts(1), 1L, "b"),
      (1L, ts(2), 2L, "a"), (1L, ts(2), 3L, "c"), // tie at minute 2
      (2L, ts(0), 4L, "b"), (2L, ts(5), 5L, "a")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Timeseries.eventTransitions(events)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    // from a: a→b (1), a→c (1) → 5000 bp each; from b: b→a twice → 10000 bp
    assert(out === Set(
      ("a", "b", 1L, 5000L), ("a", "c", 1L, 5000L), ("b", "a", 2L, 10000L)))
  }

  test("orderedFunnel: order and window enforced, same-instant never chains, no-entry absent") {
    def ts(h: Int) = new java.sql.Timestamp(h * 3600000L)
    val events = Seq(
      // user 1: full ordered sequence inside 24h → reached 3
      (1L, "view", ts(0)), (1L, "click", ts(2)), (1L, "purchase", ts(5)),
      // user 2: click BEFORE the first view → never chains → 1
      (2L, "click", ts(0)), (2L, "view", ts(3)),
      // user 3: click inside, purchase outside the 24h window → 2
      (3L, "view", ts(0)), (3L, "click", ts(1)), (3L, "purchase", ts(30)),
      // user 4: click at the SAME instant as view (strict >) → 1
      (4L, "view", ts(0)), (4L, "click", ts(0)),
      // user 5: no view at all → absent
      (5L, "click", ts(0)), (5L, "purchase", ts(1))
    ).toDF("user_id", "event_type", "ts")
    val out = Timeseries.orderedFunnel(events,
      Seq("view", "click", "purchase"), windowHours = 24)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 3L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("trendSlope: exact integer slope, sign handled before div, zero-variance dropped") {
    // perfect lines: slope 3 and −3; truncation case 0.5 → 0 (never −1);
    // single-x group has den = 0 and is dropped
    val pts = (0L to 4L).map(x => ("up", x, 3 * x + 5)) ++
      (0L to 4L).map(x => ("down", x, -3 * x)) ++
      Seq(("half", 0L, 0L), ("half", 1L, 0L), ("half", 2L, 1L)) ++
      Seq(("flatx", 7L, 1L), ("flatx", 7L, 9L))
    val out = Timeseries.trendSlope(pts.toDF("grp", "x", "y"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out === Map("up" -> 3L, "down" -> -3L, "half" -> 0L))
  }

  test("seasonalDecompose: constant series → trend = level, seasonal/residual 0; identity exact; edges dropped") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 72 hourly points at a constant $5.00 → 48 full-window rows
    val rows = (0 until 72).map(h => (f"2024-01-01 00:00:00", h, 5.0))
      .toDF("base", "h", "value")
      .select(lit("t").as("event_type"),
        (col("base").cast("timestamp").cast("long") + col("h") * 3600L)
          .cast("timestamp").as("ts"),
        col("value"))
    val out = graft.operators.Timeseries.seasonalDecompose(rows).collect()
    // rowsBetween(-12, 11): 12 leading + 11 trailing rows lack a full window
    assert(out.length === 72 - 12 - 11, "half-window edges drop on both sides")
    assert(out.forall(r => r.getLong(2) === 500L && r.getLong(3) === 500L &&
      r.getLong(4) === 0L && r.getLong(5) === 0L))
    // fixture: additive identity holds EXACTLY on real data, seasonal is a
    // pure function of (type, hour-of-day)
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val d = graft.operators.Timeseries.seasonalDecompose(ev)
    assert(d.filter(col("v_cents") =!=
      col("trend_cents") + col("seasonal_cents") + col("residual_cents")).count() === 0L)
    val perHop = d.select(col("event_type"), (hour(col("hour")) % 24).as("hop"),
        col("seasonal_cents")).distinct()
      .groupBy("event_type", "hop").count().filter(col("count") > 1L).count()
    assert(perHop === 0L, "seasonal must be a pure function of (type, hop)")
  }

  test("autocorrelation: alternating series → lag-1 ACF = −10⁴, lag-2 = +10⁴; gaps never pair") {
    // perfect period-2 series 1,3,1,3,... (hourly, one event per hour):
    // lag 1 pairs (a, −a) everywhere → num = −den·(pairs/n) sign −;
    // lag 2 pairs (a, a) → +. Exact values checked against a replay.
    val vs = (0 until 12).map(h => (if (h % 2 == 0) 1.0 else 3.0, h))
    val rows = vs.map { case (v, h) =>
      ("alt", new java.sql.Timestamp(h * 3600000L), v) }
    val out = Timeseries.autocorrelation(
        rows.toDF("event_type", "ts", "value"), lags = Seq(1, 2))
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // replay: xbar per hour = 100 or 300 cents, n = 12, S = 2400;
    // a_t = 12·x_t − 2400 = ∓1200; den = 12·1200² = 17_280_000
    val a = vs.map { case (v, _) => 12L * (v * 100).toLong - 2400L }
    val den = a.map(x => x * x).sum
    def num(lag: Int) = (0 until 12 - lag).map(t => a(t) * a(t + lag)).sum
    assert(out(1L) == ((11L, num(1), den, -(math.abs(num(1)) * 10000L / den))))
    assert(out(2L) == ((10L, num(2), den, math.abs(num(2)) * 10000L / den)))
    // a gap: drop hour 5 — lag-1 pairs across the gap must vanish
    val gappy = rows.filterNot(_._2.getTime == 5 * 3600000L)
    val g = Timeseries.autocorrelation(
        gappy.toDF("event_type", "ts", "value"), lags = Seq(1))
      .head()
    assert(g.getLong(2) == 9L, "11 hours → 10 adjacent pairs minus 2 gap-adjacent + ... = 9")
  }

  test("cusumChangepoints: closed form ≡ the sequential recurrence; series isolated") {
    // A series that dips then runs hot: the recurrence resets at the dip
    // (max with 0) and accumulates through the hot run — exactly where a
    // naive prefix sum (no min subtraction) would diverge. Values in
    // dollars so hourly cents = 100·v; one event per hour.
    val hot = Seq(1.0, 1.0, 0.2, 0.2, 5.0, 5.0, 5.0, 1.0, 0.1, 6.0)
    val flat = Seq(2.0, 2.0, 2.0, 2.0)
    val rows =
      hot.zipWithIndex.map { case (v, h) =>
        ("hot", new java.sql.Timestamp(h * 3600000L), v) } ++
      flat.zipWithIndex.map { case (v, h) =>
        ("flat", new java.sql.Timestamp(h * 3600000L), v) }
    val out = Timeseries.cusumChangepoints(
        rows.toDF("event_type", "ts", "value"), muFactor = 2L)
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 3600000L,
        r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2))
    // replay the textbook recurrence per series on the collected cents
    def replay(vs: Seq[Long]): Seq[Long] = {
      val mu = vs.sum / vs.size // floored div, matches the operator
      vs.scanLeft(0L)((s, x) => math.max(0L, s + (x - mu))).tail
    }
    for ((series, vals) <- Seq("hot" -> hot, "flat" -> flat)) {
      val got = out.filter(_._1 == series)
      val cents = got.map(_._3)
      assert(cents.toSeq == vals.map(v => math.floor(v * 100).toLong),
        s"$series cents")
      val expected = replay(cents)
      assert(got.map(_._4).toSeq == expected, s"$series cusum closed form")
      val mu = cents.sum / cents.size
      assert(got.map(_._5).toSeq == expected.map(s => if (s > mu * 2) 1L else 0L),
        s"$series alarms")
    }
    // the flat series never alarms; the hot one does
    assert(out.filter(_._1 == "flat").forall(_._5 == 0L))
    assert(out.filter(_._1 == "hot").exists(_._5 == 1L))
  }

  test("cusum/autocorr per-series means FLOOR on negative sums (div-vs-// parity)") {
    // Summed cents −75 over 2 samples: floored mean −38, truncated −37 —
    // the exact div-vs-// divergence the oracles' `//` floors. Values are
    // binary-exact doubles so floor(v·100) is deterministic.
    val cusumRows = Seq(
      ("neg", new java.sql.Timestamp(0L), -0.25),
      ("neg", new java.sql.Timestamp(3600000L), -0.5))
    val cs = Timeseries.cusumChangepoints(
        cusumRows.toDF("event_type", "ts", "value"))
      .collect().map(r => (r.getTimestamp(1).getTime, r.getLong(3)))
      .sortBy(_._1).map(_._2).toSeq
    // mu = floor(−75/2) = −38: p = (13, 1) → s = (13, 1).
    // A truncated mu (−37) would give s = (12, 0).
    assert(cs == Seq(13L, 1L))

    // hour 0 holds two events summing to −75 cents (xbar floors to −38),
    // hour 1 one event at +100: a = (−138, 138), den = 38088,
    // lag-1 num = −19044 → acf_bp = −5000 exactly.
    val acfRows = Seq(
      ("neg", new java.sql.Timestamp(0L), -0.25),
      ("neg", new java.sql.Timestamp(60000L), -0.5),
      ("neg", new java.sql.Timestamp(3600000L), 1.0))
    val acf = Timeseries.autocorrelation(
        acfRows.toDF("event_type", "ts", "value"), lags = Seq(1)).head()
    assert((acf.getLong(2), acf.getLong(3), acf.getLong(4), acf.getLong(5))
      == ((1L, -19044L, 38088L, -5000L)))
  }
}
