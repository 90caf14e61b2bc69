package graft

import org.apache.spark.sql.functions._

import graft.functions.TextHash
import graft.operators.Profiling

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  private def sampleKeys(values: Seq[String]): Seq[Long] =
    values.distinct.toDF("v")
      .select(TextHash.sampleKey(concat(lit("kmv:"), col("v"))).as("h"))
      .as[Long].collect().toSeq

  test("kmv is exact below k and matches the closed-form estimate above k") {
    val small = (1 to 40).map(i => ("s", s"v$i"))
    val big = (1 to 500).map(i => ("b", s"w$i"))
    val df = (small ++ big).toDF("g", "v")
    val out = Profiling.kmvDistinct(df, "g", "v", k = 64)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    // below k: sketch IS the exact count
    val (sExact, sKept, _, sEst) = out("s")
    assert(sExact === 40L && sKept === 40L && sEst === 40L)

    // above k: estimate = (k-1)*P div (h_64 + 1) with h_64 the 64th
    // smallest sample key — recomputed independently here
    val h64 = sampleKeys(big.map(_._2)).sorted.apply(63)
    val (bExact, bKept, bKth, bEst) = out("b")
    assert(bExact === 500L && bKept === 64L && bKth === h64)
    assert(bEst === 63L * TextHash.Prime / (h64 + 1L))
    // and the estimate is in the k=64 error regime (~12.7% stderr; assert
    // a loose 3-sigma band so the case stays deterministic, not flaky —
    // the VALUE equality above is the real check)
    assert(bEst > 250L && bEst < 1000L)

    // the ALL row sketches the union of both groups
    val (aExact, _, _, _) = out("ALL")
    assert(aExact === 540L)
  }

  test("kmv merge algebra: k-min of merged k-min sets equals k-min of the union") {
    val a = (1 to 300).map(i => s"a$i")
    val b = (1 to 300).map(i => s"b$i")
    val k = 32
    val kminA = sampleKeys(a).sorted.take(k)
    val kminB = sampleKeys(b).sorted.take(k)
    val merged = (kminA ++ kminB).sorted.take(k)
    val whole = sampleKeys(a ++ b).sorted.take(k)
    assert(merged === whole)
    // and the operator over the union reports exactly that kth min
    val out = Profiling.kmvDistinct(
      (a ++ b).map(("g", _)).toDF("g", "v"), "g", "v", k = k)
      .filter(col("g") === "g").head()
    assert(out.getLong(3) === whole.last)
  }

  test("kmv set ops: exact below k, inclusion-exclusion intersection, disjoint clamp") {
    // |A| = 30, |B| = 30, overlap 10 → union 50; all below k=64 so every
    // estimate is exact and the intersection recovers exactly 10.
    val a = (1 to 30).map(i => Tuple1(s"v$i")).toDF("v")
    val b = (21 to 50).map(i => Tuple1(s"v$i")).toDF("v")
    val out = Profiling.kmvSetOps(a, b, "v", k = 64)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("a") === ((30L, 30L, 0L)))
    assert(out("b") === ((30L, 30L, 0L)))
    assert(out("union") === ((50L, 50L, 0L)))
    assert(out("intersection") === ((10L, 10L, 0L)))

    // disjoint sets above k: the intersection estimate may undershoot —
    // it must clamp at 0, and exact must be 0.
    val bigA = (1 to 500).map(i => Tuple1(s"a$i")).toDF("v")
    val bigB = (1 to 500).map(i => Tuple1(s"b$i")).toDF("v")
    val dj = Profiling.kmvSetOps(bigA, bigB, "v", k = 32)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(dj("intersection")._2 === 0L) // exact
    assert(dj("intersection")._1 >= 0L) // clamped estimate
  }

  test("kmv duplicate values do not inflate the sketch") {
    val df = ((1 to 100).map(i => ("g", s"v$i")) ++
      (1 to 100).map(i => ("g", s"v$i"))).toDF("g", "v")
    val r = Profiling.kmvDistinct(df, "g", "v", k = 64).filter(col("g") === "g").head()
    assert(r.getLong(1) === 100L) // exact sees 100 distinct, not 200 rows
  }

  test("kmvRollup: week sketch merged from day sketches == direct week sketch from raw") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val k = 8 // sf0.001 weeks hold 15 distinct users — k=8 engages the estimator
    // direct week sketch from RAW data (what the rollup must equal)
    val direct = ev
      .select(to_date(date_trunc("week", col("ts"))).as("week"),
        col("user_id").cast("string").as("v")).distinct()
      .withColumn("h", graft.functions.TextHash.sampleKey(concat(lit("kmv:"), col("v"))))
      .groupBy("week")
      .agg(graft.functions.TopKAgg.topK(-col("h").cast("double"), col("h"), k).as("mins"))
      .select(col("week"), transform(col("mins"), m => m.getField("id")).as("mins"))
      .collect().map(r => r.getDate(0).toString -> r.getSeq[Long](1)).toMap
    // merged path: day sketches only
    val daySk = Profiling.kmvDaySketches(ev, "ts", "user_id", k)
    val merged = daySk
      .groupBy(to_date(date_trunc("week", col("day"))).as("week"))
      .agg(slice(array_sort(array_distinct(flatten(collect_list(col("mins"))))), 1, k).as("mins"))
      .collect().map(r => r.getDate(0).toString -> r.getSeq[Long](1)).toMap
    assert(merged.keySet == direct.keySet && merged.nonEmpty)
    merged.keys.foreach(w => assert(merged(w) == direct(w), s"week $w k-min sets diverge"))
    // and the gate shape: estimates audited, n_kept == k on the busy weeks
    val out = Profiling.kmvRollup(ev, "ts", "user_id", k).collect()
    assert(out.nonEmpty && out.forall(_.getLong(5) > 0L))
    assert(out.exists(_.getLong(2) == k.toLong), "some week must engage the estimator path")
  }

  test("joinCardinalityEstimate: below-k sides recover the exact containment estimate; hot keys don't inflate") {
    // A: 12 rows over 4 keys (3× each); B: 6 rows over 6 keys (superset of A's).
    // Containment: est = 12·6 / max(4,6) = 12 = the actual join count.
    val a = (1 to 4).flatMap(k => Seq.fill(3)(Tuple1(k.toLong))).toDF("ka")
    val b = (1 to 6).map(k => Tuple1(k.toLong)).toDF("kb")
    val r = Profiling.joinCardinalityEstimate(a, b, "ka", "kb", k = 64).head()
    assert((r.getLong(0), r.getLong(1)) === ((12L, 6L)))
    assert((r.getLong(2), r.getLong(3)) === ((4L, 6L)), "duplicates must not inflate d")
    assert(r.getLong(4) === 12L && r.getLong(5) === 12L && r.getLong(6) === 0L)
  }

  test("stats catalog: estimate survives DATA DELETION (never rescans); guards fail loudly") {
    import java.nio.file.{Files, Paths}
    def tmp(p: String) = Files.createTempDirectory(p).toString
    val dataA = tmp("graft_stats_dataA")
    val dataB = tmp("graft_stats_dataB")
    val statsA = tmp("graft_stats_a")
    val statsB = tmp("graft_stats_b")
    val a = (1 to 4).flatMap(k => Seq.fill(3)(Tuple1(k.toLong))).toDF("ka")
    val b = (1 to 6).map(k => Tuple1(k.toLong)).toDF("kb")
    a.write.mode("overwrite").parquet(dataA)
    b.write.mode("overwrite").parquet(dataB)
    Profiling.writeTableStats(spark.read.parquet(dataA), statsA, "ka")
    Profiling.writeTableStats(spark.read.parquet(dataB), statsB, "kb")
    // the point: drop the tables, the estimate must still answer
    def rmr(d: String): Unit = {
      val f = new java.io.File(d)
      Option(f.listFiles()).foreach(_.foreach(c => rmr(c.toString)))
      f.delete(); ()
    }
    rmr(dataA); rmr(dataB)
    val r = Profiling.joinEstimateFromStats(spark, statsA, statsB, "ka", "kb").head()
    // matches joinCardinalityEstimate's hand case: 12·6 / max(4,6) = 12
    assert(r.toSeq === Seq(12L, 6L, 4L, 6L, 12L))
    // guards: wrong expected key and missing format marker both fail loudly
    val exKey = intercept[IllegalArgumentException] {
      Profiling.joinEstimateFromStats(spark, statsA, statsB, "WRONG", "kb").head()
    }
    assert(exKey.getMessage.contains("expects"))
    Files.delete(Paths.get(statsA, "_format-stats-kmv-v1"))
    val exFmt = intercept[IllegalArgumentException] {
      Profiling.joinEstimateFromStats(spark, statsA, statsB, "ka", "kb").head()
    }
    assert(exFmt.getMessage.contains("_format-stats-kmv-v1"))
  }

  test("hhRollup: day-candidate union catches weekly hitters (incl. spread across days); thin tokens pruned") {
    def day(d: Int, toks: Seq[String]) =
      toks.map(t => (s"2024-01-0$d 00:00:00", t)).toDF("ts", "token")
        .select(col("ts").cast("timestamp").as("ts"), col("token"))
    // per day: s×4 + two ×3 fillers (n=10). Weekly: s=12 > 30/(2+1)=10 →
    // hitter; fillers at 9 ≤ 10 → pruned. s clears each day's share
    // (4 > 10/3), so the per-day MG(capacity=2) summaries keep it.
    val wk = day(1, Seq.fill(4)("s") ++ Seq.fill(3)("t1") ++ Seq.fill(3)("u1"))
      .union(day(2, Seq.fill(4)("s") ++ Seq.fill(3)("t2") ++ Seq.fill(3)("u2")))
      .union(day(3, Seq.fill(4)("s") ++ Seq.fill(3)("t3") ++ Seq.fill(3)("u3")))
    val out = Profiling.hhRollup(wk, "ts", "token", capacity = 2)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq(("s", 12L)))
  }

  test("appendTableStats: append sequence ≡ fresh stats over the union; publish prunes; guards loud") {
    import java.nio.file.{Files, Paths}
    def tmp(p: String) = Files.createTempDirectory(p).toString
    val incr = tmp("graft_stats_incr")
    val full = tmp("graft_stats_full")
    val b1 = (1 to 40).map(k => Tuple1(k.toLong)).toDF("ka")
    val b2 = (30 to 90).map(k => Tuple1(k.toLong)).toDF("ka") // overlaps b1
    val b3 = (85 to 200).map(k => Tuple1(k.toLong)).toDF("ka")
    Profiling.writeTableStats(b1, incr, "ka", k = 16)
    Profiling.appendTableStats(b2, incr, "ka", k = 16)
    Profiling.appendTableStats(b3, incr, "ka", k = 16)
    Profiling.writeTableStats(b1.union(b2).union(b3), full, "ka", k = 16)
    def entry(dir: String) = {
      val dirs = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("entry-")).map(_.getName).sorted
      (dirs.toSeq, spark.read.parquet(s"$dir/${dirs.last}")
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).head)
    }
    val (incrEntries, incrStats) = entry(incr)
    val (_, fullStats) = entry(full)
    assert(incrEntries === Seq("entry-000000000003"), "publish must prune superseded entries")
    assert(incrStats === fullStats, "merged sketch must be bit-identical to fresh-over-union")
    // estimates from the incrementally-maintained entry match the fresh one
    val ei = Profiling.joinEstimateFromStats(spark, incr, full, "ka", "ka").head()
    assert(ei.getLong(2) === ei.getLong(3), "both entries must sketch identical distincts")
    // guards: key and k mismatches fail loudly; missing base refuses
    assert(intercept[IllegalArgumentException] {
      Profiling.appendTableStats(b1.withColumnRenamed("ka", "kb"), incr, "kb", k = 16)
    }.getMessage.contains("offers"))
    assert(intercept[IllegalArgumentException] {
      Profiling.appendTableStats(b1, incr, "ka", k = 32)
    }.getMessage.contains("k="))
    val empty = tmp("graft_stats_nobase")
    assert(intercept[IllegalArgumentException] {
      Profiling.appendTableStats(b1, empty, "ka", k = 16)
    }.getMessage.contains("writeTableStats first"))
  }

  test("ksDrift: disjoint supports → D = 10000; identical samples → 0; hand-computed shift") {
    val a = Seq(0.01, 0.02, 0.03).map(Tuple1(_)).toDF("value")
    val b = Seq(0.11, 0.12, 0.13).map(Tuple1(_)).toDF("value")
    val dj = Profiling.ksDrift(a, b, "value").head()
    assert((dj.getLong(0), dj.getLong(1), dj.getLong(3)) === ((3L, 3L, 10000L)))
    assert(Profiling.ksDrift(a, a, "value").head().getLong(3) === 0L)
    // A = {1,2}, B = {2,3} cents: max gap at bin 1 → |1·2 − 0·2| = 2 of 4
    val a2 = Seq(0.01, 0.02).map(Tuple1(_)).toDF("value")
    val b2 = Seq(0.02, 0.03).map(Tuple1(_)).toDF("value")
    val r = Profiling.ksDrift(a2, b2, "value").head()
    assert(r.getLong(2) === 2L && r.getLong(3) === 5000L)
  }

  test("histogramRollup: merged day bins locate the exact median's bin; err < bin width") {
    val rows = Seq(
      ("2024-01-01 01:00:00", 1.00), ("2024-01-01 02:00:00", 25.00),
      ("2024-01-02 01:00:00", 25.00), ("2024-01-02 02:00:00", 25.00),
      ("2024-01-02 03:00:00", 99.00))
      .toDF("ts", "value")
      .select(col("ts").cast("timestamp").as("ts"), col("value"))
    // cents sorted: 100, 2500, 2500, 2500, 9900; rank (5-1)/2+1=3 → 2500
    val r = Profiling.histogramRollup(rows, "ts", "value").head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ===
      ((5L, 2L, 2000L, 2500L, 500L)))
  }

  test("kmvRollup: a week under k distinct reports exactly (n_kept == exact)") {
    val few = Seq(
      ("2024-01-01 00:00:00", "u1"), ("2024-01-02 00:00:00", "u2"),
      ("2024-01-03 00:00:00", "u1")).toDF("ts", "v")
      .select(col("ts").cast("timestamp").as("ts"), col("v"))
    val r = Profiling.kmvRollup(few, "ts", "v", k = 64).head()
    assert(r.getLong(1) === 3L, "three day sketches merge")
    assert(r.getLong(2) === 2L && r.getLong(4) === 2L && r.getLong(5) === 2L)
    assert(r.getLong(6) === 0L, "below-k estimate is exact")
  }

  test("KmvAgg ≡ distinct() + sort + take(k): in-buffer dedup, ascending, dup-proof") {
    // hot duplicates try to flood the buffer; values interleave partitions
    val vals = (0L until 500L).flatMap(i => Seq.fill(if (i < 5) 200 else 1)(i))
    val df = spark.sparkContext.parallelize(vals, 7).toDF("v")
    val k = 16
    val got = df.agg(graft.functions.KmvAgg.kMinValues(
        TextHash.sampleKey(concat(lit("kmv:"), col("v").cast("string"))), k).as("m"))
      .head().getSeq[Long](0)
    val want = sampleKeys(vals.map(_.toString).distinct).distinct.sorted.take(k)
    assert(got.toSeq == want)
    // nulls skipped
    val withNulls = Seq[java.lang.Long](1L, null, 2L, null).toDF("v")
    val g2 = withNulls.agg(graft.functions.KmvAgg.kMinValues(
        TextHash.sampleKey(concat(lit("kmv:"), col("v").cast("string"))), 8).as("m"))
      .head().getSeq[Long](0)
    assert(g2.size == 2)
  }

  test("writeWithStats: stats ride the table write — entry ≡ writeTableStats, data written") {
    val df = spark.range(0, 3000)
      .select((col("id") % 700).cast("string").as("k"), col("id").as("payload"))
    val d1 = java.nio.file.Files.createTempDirectory("graft_ws_data").toString
    val s1 = java.nio.file.Files.createTempDirectory("graft_ws_stats").toString
    val s2 = java.nio.file.Files.createTempDirectory("graft_ws_ref").toString
    Profiling.writeWithStats(df, d1, s1, "k")
    Profiling.writeTableStats(df, s2, "k")
    // the written table round-trips
    assert(spark.read.parquet(d1).count() == 3000L)
    // the observed-metrics entry is bit-identical to the scan-built one
    val a = spark.read.parquet(
      new java.io.File(s1).listFiles().filter(_.getName.startsWith("entry-")).head.toString)
    val b = spark.read.parquet(
      new java.io.File(s2).listFiles().filter(_.getName.startsWith("entry-")).head.toString)
    val ra = a.head(); val rb = b.head()
    assert(ra.getLong(ra.fieldIndex("n_rows")) == rb.getLong(rb.fieldIndex("n_rows")))
    assert(ra.getSeq[Long](ra.fieldIndex("mins")) == rb.getSeq[Long](rb.fieldIndex("mins")))
    // and the planner reads it identically
    assert(Profiling.readStatsDriver(spark, s1, "k")
      == Profiling.readStatsDriver(spark, s2, "k"))
    // a REWRITE after appends must supersede the append-advanced version,
    // not publish a shadowed entry-1 (latestEntry resolves the max)
    Profiling.appendTableStats(
      spark.range(3000, 4000).select(col("id").cast("string").as("k"),
        col("id").as("payload")), s1, "k")
    assert(Profiling.readStatsDriver(spark, s1, "k")._1 == 4000L)
    Profiling.writeWithStats(df, d1, s1, "k") // rewrite: back to the 3000-row table
    assert(Profiling.readStatsDriver(spark, s1, "k")._1 == 3000L,
      "rewrite stats must win over the older append entry")
    assert(new java.io.File(s1).listFiles()
      .count(_.getName.startsWith("entry-")) == 1, "publish prunes superseded")
    // empty input: observed metrics are (0, []) and the entry reads back
    // as zero rows / zero distinct — no NPE, no missing-entry state
    val dE = java.nio.file.Files.createTempDirectory("graft_ws_edata").toString
    val sE = java.nio.file.Files.createTempDirectory("graft_ws_estats").toString
    Profiling.writeWithStats(df.filter(col("payload") < 0), dE, sE, "k")
    assert(Profiling.readStatsDriver(spark, sE, "k") == ((0L, 0L, 0L)))
  }

  test("skew stat: exact top over the MG floor, clamped 0 under it, -1 after append, refreshed by rewrite") {
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    // hot key '7' holds 1/2 of 2000 rows — far over the 1/31 floor
    val hot = spark.range(0, 1000).select(lit("7").as("k"))
      .union(spark.range(0, 1000).select(col("id").cast("string").as("k")))
    val sHot = tmp("graft_skew_hot")
    Profiling.writeTableStats(hot, sHot, "k")
    assert(Profiling.readStatsDriver(spark, sHot, "k")._3 == 1001L,
      "exact count of the hot key (1000 planted + id 7 itself)")
    // uniform keys: every count is 1 ≤ n/31 → clamp to 0 (deterministic
    // on BOTH engines regardless of which MG candidates survived)
    val sFlat = tmp("graft_skew_flat")
    Profiling.writeTableStats(
      spark.range(0, 2000).select(col("id").cast("string").as("k")), sFlat, "k")
    assert(Profiling.readStatsDriver(spark, sFlat, "k")._3 == 0L)
    // append: the skew stat is write-time-only → unknown (-1), and the
    // core entry algebra is untouched
    Profiling.appendTableStats(
      spark.range(2000, 2100).select(col("id").cast("string").as("k")), sFlat, "k")
    val (nAfter, _, topAfter) = Profiling.readStatsDriver(spark, sFlat, "k")
    assert(nAfter == 2100L && topAfter == -1L)
    assert(new java.io.File(sFlat).listFiles()
      .count(_.getName.startsWith("skew-")) == 0, "stale sidecars pruned")
    // a rewrite refreshes it
    val dHot = tmp("graft_skew_hotdata")
    Profiling.writeWithStats(hot, dHot, sFlat, "k")
    assert(Profiling.readStatsDriver(spark, sFlat, "k")._3 == 1001L)
  }

  test("refreshSkew: re-arms the sidecars after an append without touching the entry") {
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val dir = tmp("graft_refresh")
    val hot = spark.range(0, 1000).select(lit("7").as("k"))
      .union(spark.range(0, 1000).select(col("id").cast("string").as("k")))
    Profiling.writeTableStats(hot, dir, "k")
    val extra = spark.range(2000, 2500).select(lit("7").as("k"))
    Profiling.appendTableStats(extra, dir, "k")
    // the b4 contract: append leaves the skew stat unknown
    val (n1, d1, top1) = Profiling.readStatsDriver(spark, dir, "k")
    assert(n1 == 2500L && top1 == -1L)
    // one bounded pass over the CURRENT table re-arms it with the exact
    // post-append top count (1000 planted + id 7 + 500 appended)
    val top = Profiling.refreshSkew(hot.union(extra), dir, "k")
    assert(top == 1501L)
    val t = Profiling.readTableStats(spark, dir, "k")
    assert(t.topCount == 1501L && t.hotKeys == Seq("7"))
    // the entry itself is untouched (same n_rows/est — refresh is
    // sidecar-only, preserving the append≡fresh bit-identity invariant)
    assert(t.nRows == n1 && t.estDistinct == d1)
    // key-column guard fails loudly
    assert(intercept[IllegalArgumentException] {
      Profiling.refreshSkew(hot, dir, "wrong")
    }.getMessage.contains("refresh offers"))
  }

  test("freq sidecars: exact per-value counts above the floor; append drops, refresh re-arms") {
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val dir = tmp("graft_freq")
    // 5-segment dim: 'A'×500, 'B'×300, 'C'×150, 'x y=&%'×45 (an
    // encoding-hostile value proving the URL round-trip), rare 'E'×5,
    // over n=1000 → floor = 32; the rare value sits below it
    val seg = when(col("id") < 500, "A").when(col("id") < 800, "B")
      .when(col("id") < 950, "C").when(col("id") < 995, "x y=&%")
      .otherwise("E")
    val dim = spark.range(0, 1000).select(col("id").cast("string").as("k"),
      seg.as("seg"))
    Profiling.writeTableStats(dim, dir, "k", freqCols = Seq("seg"))
    val f = Profiling.readTableStats(spark, dir, "k").freqs
    assert(f.keySet == Set("seg"))
    assert(f("seg").floor == 1000L / 31L, "stored floor = colCount/(cap+1)")
    assert(f("seg").counts == Map("A" -> 500L, "B" -> 300L, "C" -> 150L,
      "x y=&%" -> 45L),
      s"exact counts above floor 32, rare value excluded: ${f("seg")}")
    // append: freq sidecars are write-time-only (exact counts cannot
    // merge across batches) → dropped
    Profiling.appendTableStats(
      spark.range(1000, 1100).select(col("id").cast("string").as("k"),
        lit("A").as("seg")), dir, "k")
    assert(Profiling.readTableStats(spark, dir, "k").freqs.isEmpty)
    // refreshSkew over the current table re-arms them
    val cur = dim.union(spark.range(1000, 1100)
      .select(col("id").cast("string").as("k"), lit("A").as("seg")))
    Profiling.refreshSkew(cur, dir, "k", freqCols = Seq("seg"))
    val f2 = Profiling.readTableStats(spark, dir, "k").freqs
    assert(f2("seg").counts("A") == 600L && f2("seg").counts("B") == 300L)
  }

  test("hist sidecars: exact equi-width bins; append drops, refresh re-arms; all-null sentinel") {
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val dir = tmp("graft_hist")
    // values 0..999 → min 0, max 999, width = 999 div 32 + 1 = 32:
    // bins 0..30 hold 32 values each, bin 31 holds the 8 tail values
    val dim = spark.range(0, 1000).select(col("id").cast("string").as("k"),
      col("id").as("v"), lit(null).cast("long").as("dead"))
    Profiling.writeTableStats(dim, dir, "k", histCols = Seq("v", "dead"))
    val h = Profiling.readTableStats(spark, dir, "k").hists
    assert(h.keySet == Set("v", "dead"))
    assert(h("v").minV == 0L && h("v").maxV == 999L && h("v").width == 32L)
    assert(h("v").bins(0) == 32L && h("v").bins(30) == 32L
      && h("v").bins(31) == 8L && h("v").bins.values.sum == 1000L)
    // all-null column → empty-histogram sentinel (max < min)
    assert(h("dead").maxV < h("dead").minV && h("dead").bins.isEmpty)
    // append: write-time-only (edges shift per batch) → dropped
    Profiling.appendTableStats(
      spark.range(1000, 1100).select(col("id").cast("string").as("k"),
        col("id").as("v"), lit(null).cast("long").as("dead")), dir, "k")
    assert(Profiling.readTableStats(spark, dir, "k").hists.isEmpty)
    // refreshSkew over the grown table re-arms with the NEW domain
    val cur = spark.range(0, 1100).select(col("id").cast("string").as("k"),
      col("id").as("v"), lit(null).cast("long").as("dead"))
    Profiling.refreshSkew(cur, dir, "k", histCols = Seq("v"))
    val h2 = Profiling.readTableStats(spark, dir, "k").hists("v")
    assert(h2.minV == 0L && h2.maxV == 1099L && h2.width == 1099L / 32L + 1L)
    assert(h2.bins.values.sum == 1100L)
  }

  test("hist sidecars: an overflow-span domain is refused, never published unsound") {
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val dir = tmp("graft_hist_ovf")
    // a full-range hash domain: mx - mn wraps negative; the wrapped width
    // would make every bin predicate miss and publish empty bins — an
    // UNSOUND n_eff = 0 claim the planner would broadcast a huge dim on.
    // The publish path must refuse (no sidecar; readers fall back to
    // unfiltered stats — conservative and sound). A ±2^62 domain (span
    // exactly 2^63 − 1) still publishes fine — the guard is the wrap,
    // not the magnitude.
    val df = spark.range(0, 100).select(col("id").cast("string").as("k"),
      when(col("id") % 2 === 0, lit(Long.MinValue + 1L))
        .otherwise(lit(Long.MaxValue - 1L)).as("v"))
    Profiling.writeTableStats(df, dir, "k", histCols = Seq("v"))
    assert(!Profiling.readTableStats(spark, dir, "k").hists.contains("v"),
      "overflow-span histogram must be refused")
  }

  test("freq floor basis is the freq column's OWN non-null count, not the key's") {
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val dir = tmp("graft_freq_floor")
    // key null on 900 of 1000 rows (count(k)=100 → key-based floor 3);
    // seg populated on ALL 1000 (its MG floor = 32). A value with count
    // 20 sits between the floors: its MG candidacy is NOT guaranteed, so
    // determinism demands EXCLUSION — and the reader must bound absent
    // values by 32, the floor the publish actually filtered at.
    val df = spark.range(0, 1000).select(
      when(col("id") < 100, col("id").cast("string")).as("k"),
      when(col("id") < 600, "big").when(col("id") < 620, "mid")
        .otherwise(concat(lit("f"), (col("id") % 25).cast("string"))).as("seg"))
    Profiling.writeTableStats(df, dir, "k", freqCols = Seq("seg"))
    val f = Profiling.readTableStats(spark, dir, "k").freqs("seg")
    assert(f.floor == 1000L / 31L,
      s"floor must come from seg's 1000 non-null rows, got ${f.floor}")
    assert(f.counts.get("big").contains(600L))
    assert(!f.counts.contains("mid"),
      "a count between the key-based and column-based floors must be " +
        s"excluded (candidacy not order-independent there): ${f.counts}")
  }

  test("n_bytes: measured variable width; append-merge ≡ fresh write; old entries read unknown") {
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    // 10 rows: BIGINT id (8B) + a 10-byte ascii string → 18 B/row
    val df = spark.range(0, 10).select(col("id").as("k"),
      lpad(col("id").cast("string"), 10, "0").as("s"))
    val d1 = tmp("graft_bytes_a")
    Profiling.writeTableStats(df, d1, "k")
    val t = Profiling.readTableStats(spark, d1, "k")
    assert(t.avgRowBytes == 18L, s"8 fixed + 10 measured, got ${t.avgRowBytes}")
    // append ≡ fresh over the union, byte totals included
    val df2 = spark.range(10, 30).select(col("id").as("k"),
      lpad(col("id").cast("string"), 20, "0").as("s"))
    Profiling.appendTableStats(df2, d1, "k")
    val d2 = tmp("graft_bytes_b")
    Profiling.writeTableStats(df.union(df2), d2, "k")
    val (ta, tb) = (Profiling.readTableStats(spark, d1, "k"),
      Profiling.readTableStats(spark, d2, "k"))
    assert(ta.nRows == tb.nRows && ta.avgRowBytes == tb.avgRowBytes)
    assert(ta.avgRowBytes == (10L * 18 + 20L * 28) / 30L)
  }
}
