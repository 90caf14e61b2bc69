package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Profiling
import graft.plans.CostBasedJoin
import graft.plans.CostBasedJoin.SideStats

/** The stats catalog wired into join planning: the chosen strategy must
  * flip with the CATALOG CONTENTS alone — the frames being joined stay
  * byte-identical across cases, and in the flip tests the catalog
  * deliberately describes DIFFERENT data than the frames carry, which
  * proves the tables are untouched at choose time (a decision that peeked
  * at the frames could not match the planted stats). */
class CostBasedJoinSpec extends SparkSpec {

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def plan(df: DataFrame): String = {
    df.collect() // finalize AQE so the executed plan is the real one
    df.queryExecution.executedPlan.toString
  }

  // The joined frames for every flip test: plan-only (range-backed, no
  // files anywhere) — nothing about THEM changes between cases.
  private def left = spark.range(0, 10000)
    .select(col("id").as("k"), (col("id") % 7).as("a"))
  private def right = spark.range(0, 500)
    .select(col("id").as("k2"), (col("id") % 5).as("b"))

  test("decide: the ladder over pure stats") {
    // broadcast wins under the row threshold
    assert(CostBasedJoin.decide(SideStats(1000000, 900000),
      SideStats(1000, 1000), broadcastRows = 10000).strategy == "broadcast")
    // pair explosion (est ≫ inputs) pins shuffle_hash even when bloom
    // would also fire — output size is the dominant hazard
    assert(CostBasedJoin.decide(SideStats(1000000, 25),
      SideStats(500000, 25), broadcastRows = 10).strategy == "shuffle_hash")
    // selective dim key set → bloom reduction
    assert(CostBasedJoin.decide(SideStats(1000000, 900000),
      SideStats(200000, 1000), broadcastRows = 10).strategy == "bloom_reduced")
    // no structure → plain shuffle
    assert(CostBasedJoin.decide(SideStats(1000000, 900000),
      SideStats(900000, 850000), broadcastRows = 10).strategy == "shuffle")
    // est fence: huge sides never wrap
    val c = CostBasedJoin.decide(SideStats(4000000000L, 10L),
      SideStats(4000000000L, 10L), broadcastRows = 10)
    assert(c.estRows > 0L && c.strategy == "shuffle_hash")
    // fallback-branch fence: maxD so small that even (n_a/maxD)·n_b wraps —
    // the estimate SATURATES (Long.MaxValue) and still selects shuffle_hash
    // (a wrapped-negative estimate would have fallen through to 'shuffle')
    val sat = CostBasedJoin.decide(SideStats(4000000000L, 1L),
      SideStats(4000000000L, 1L), broadcastRows = 10)
    assert(sat.estRows == Long.MaxValue && sat.strategy == "shuffle_hash")
    // skew: fact's hot key over the 1/SaltShareFactor share → salted
    // outranks the explosion rung (the hot key would still land on ONE
    // reducer under a pinned shuffle_hash)
    assert(CostBasedJoin.decide(SideStats(1000000, 25, 300000),
      SideStats(500000, 25), broadcastRows = 10).strategy == "salted")
    // under the share bound (or -1 after an append) the ladder is unchanged
    assert(CostBasedJoin.decide(SideStats(1000000, 25, 100000),
      SideStats(500000, 25), broadcastRows = 10).strategy == "shuffle_hash")
    // broadcast is skew-immune — it outranks salted
    assert(CostBasedJoin.decide(SideStats(1000000, 900000, 900000),
      SideStats(1000, 1000), broadcastRows = 10000).strategy == "broadcast")
  }

  test("salted rung: catalog-driven actuation, output identical to the plain join") {
    val dirSkew = tmp("graft_cbj_skew")
    // catalog stand-in: half the rows on one key → top-key share 1/2
    Profiling.writeTableStats(
      spark.range(0, 50000).select(
        when(col("id") % 2 === 0, lit(0L)).otherwise(col("id"))
          .cast("string").as("k")),
      dirSkew, "k")
    val dirDim = tmp("graft_cbj_skewdim")
    Profiling.writeTableStats(
      spark.range(0, 50000).select(col("id").cast("string").as("k2")),
      dirDim, "k2")
    val (df, c) = CostBasedJoin.chooseJoin(left, right, "k", "k2",
      dirSkew, dirDim, broadcastRows = 10L)
    assert(c.strategy == "salted" && c.left.topCount == 25000L)
    val expected = left.join(right, col("k") === col("k2"))
      .select(col("k")).collect().map(_.getLong(0)).sorted.toSeq
    assert(df.select(col("k")).collect().map(_.getLong(0)).sorted.toSeq
      == expected, "salted inner join must be output-invisible")
    assert(df.columns.toSeq == (left.columns ++ right.columns).toSeq,
      "salt column must not leak into the output")
  }

  test("strategy flips with catalog contents; frames untouched at choose time") {
    val dirL = tmp("graft_cbj_l")
    // LEFT catalog: stats from a high-cardinality stand-in (what the
    // catalog CLAIMS left looks like)
    Profiling.writeTableStats(
      spark.range(0, 50000).select(col("id").cast("string").as("k")),
      dirL, "k")

    // Catalog A says the right side is tiny → broadcast
    val dirSmall = tmp("graft_cbj_small")
    Profiling.writeTableStats(
      spark.range(0, 100).select(col("id").cast("string").as("k2")),
      dirSmall, "k2")
    val (bc, cbc) = CostBasedJoin.chooseJoin(left, right, "k", "k2",
      dirL, dirSmall, broadcastRows = 1000L)
    assert(cbc.strategy == "broadcast")
    assert(plan(bc).contains("BroadcastHashJoin"))

    // Catalog B says the SAME right frame is huge but key-selective →
    // bloom reduction (no broadcast anywhere in the plan)
    val dirSel = tmp("graft_cbj_sel")
    Profiling.writeTableStats(
      spark.range(0, 200000).select((col("id") % 500).cast("string").as("k2")),
      dirSel, "k2")
    val (bl, cbl) = CostBasedJoin.chooseJoin(left, right, "k", "k2",
      dirL, dirSel, broadcastRows = 1000L)
    assert(cbl.strategy == "bloom_reduced")
    val blPlan = plan(bl)
    assert(blPlan.contains("might_contain") || blPlan.contains("BloomFilter"), blPlan)

    // Catalog C says both sides collapse onto few keys → pair explosion →
    // pinned ShuffledHashJoin
    val dirLoL = tmp("graft_cbj_lol")
    val dirLoR = tmp("graft_cbj_lor")
    Profiling.writeTableStats(
      spark.range(0, 300000).select((col("id") % 20).cast("string").as("k")),
      dirLoL, "k")
    Profiling.writeTableStats(
      spark.range(0, 300000).select((col("id") % 20).cast("string").as("k2")),
      dirLoR, "k2")
    val (sh, csh) = CostBasedJoin.chooseJoin(left, right, "k", "k2",
      dirLoL, dirLoR, broadcastRows = 1000L)
    assert(csh.strategy == "shuffle_hash")
    assert(plan(sh).contains("ShuffledHashJoin"))
  }

  test("join types: semi/anti/outer ladder — every strategy ≡ the plain typed join") {
    val dirFact = tmp("graft_cbj_jt_fact")
    Profiling.writeTableStats(
      spark.range(0, 200000).select(col("id").cast("string").as("k")),
      dirFact, "k")
    val dirSel = tmp("graft_cbj_jt_sel") // selective dim claim → bloom rung
    Profiling.writeTableStats(
      spark.range(0, 200000).select((col("id") % 400).cast("string").as("k2")),
      dirSel, "k2")
    val dirSkew = tmp("graft_cbj_jt_skew") // skewed fact claim → salted rung
    Profiling.writeTableStats(
      spark.range(0, 200000).select(
        when(col("id") % 2 === 0, lit(0L)).otherwise(col("id"))
          .cast("string").as("k")),
      dirSkew, "k")
    for (jt <- Seq("left_semi", "left_anti", "left_outer")) {
      val expected = left.join(right, col("k") === col("k2"), jt)
        .select(col("k")).collect().map(_.getLong(0)).sorted.toSeq
      def run(factDir: String, bcast: Long, want: String): Unit = {
        val (df, c) = CostBasedJoin.chooseJoin(left, right, "k", "k2",
          factDir, dirSel, broadcastRows = bcast, joinType = jt)
        assert(c.strategy == want, s"$jt via $want")
        assert(df.select(col("k")).collect().map(_.getLong(0)).sorted.toSeq
          == expected, s"$jt via $want must equal the plain $jt join")
      }
      // outer joins NEVER take the bloom rung (a prefilter would drop
      // left rows the outer join must deliver) — they fall to shuffle
      run(dirFact, 10L, if (jt == "left_outer") "shuffle" else "bloom_reduced")
      run(dirSkew, 10L, "salted")
      run(dirFact, 1000000L, "broadcast")
    }
  }

  test("sessionStatsDir: a crashed stats write (marker, no entry) means fallback, not failure") {
    val root = tmp("graft_cbj_root")
    spark.conf.set("spark.graft.statsCatalogRoot", root)
    try {
      val entry = "orders.o_custkey"
      assert(CostBasedJoin.sessionStatsDir(spark, entry).isEmpty,
        "absent dir → fallback")
      // simulate a write that died after the marker, before the publish
      val dir = new java.io.File(s"$root/$entry")
      assert(dir.mkdirs())
      java.nio.file.Files.write(
        dir.toPath.resolve("_format-stats-kmv-v1"), Array.empty[Byte])
      assert(CostBasedJoin.sessionStatsDir(spark, entry).isEmpty,
        "marker without a published entry must read as no-catalog (fallback), " +
          "never route chooseJoin into a hard readStatsDriver failure")
      // a published entry flips it on
      Profiling.writeTableStats(
        spark.range(0, 100).select(col("id").cast("string").as("o_custkey")),
        dir.toString, "o_custkey")
      assert(CostBasedJoin.sessionStatsDir(spark, entry).isDefined)
    } finally spark.conf.unset("spark.graft.statsCatalogRoot")
  }

  test("every strategy returns the identical join result (output-invisible)") {
    val dirL = tmp("graft_cbj_eq_l")
    Profiling.writeTableStats(
      spark.range(0, 50000).select(col("id").cast("string").as("k")), dirL, "k")
    val expected = left.join(right, col("k") === col("k2"))
      .select(col("k")).collect().map(_.getLong(0)).sorted.toSeq
    for ((dir, bcast) <- Seq(
        (tmp("graft_cbj_eq_a"), 1000000L), // broadcast
        (tmp("graft_cbj_eq_b"), 1L))) {    // shuffle (no structure)
      Profiling.writeTableStats(
        spark.range(0, 50000).select(col("id").cast("string").as("k2")),
        dir, "k2")
      val (df, _) = CostBasedJoin.chooseJoin(left, right, "k", "k2",
        dirL, dir, broadcastRows = bcast)
      assert(df.select(col("k")).collect().map(_.getLong(0)).sorted.toSeq
        == expected)
    }
  }

  test("byte rung: a wide dim under the row threshold refuses broadcast; a narrow one takes it") {
    // pure-ladder cases first: same row count, only the width differs
    val fact = SideStats(1000000, 900000)
    val narrow = SideStats(1000, 1000, avgRowBytes = 100L) // 100 KB total
    val wide = SideStats(1000, 1000, avgRowBytes = 1L << 20) // 1 GB total
    val unknown = SideStats(1000, 1000) // pre-byte-stats entry
    assert(CostBasedJoin.decide(fact, narrow, broadcastRows = 10000)
      .strategy == "broadcast")
    assert(CostBasedJoin.decide(fact, wide, broadcastRows = 10000)
      .strategy != "broadcast", "1000 rows × 1 MB blows the 64 MB budget")
    assert(CostBasedJoin.decide(fact, unknown, broadcastRows = 10000)
      .strategy == "broadcast", "unknown width keeps the row-count rung")
    // boundary: exactly at the budget still broadcasts (n ≤ bytes div avg)
    assert(CostBasedJoin.decide(fact,
      SideStats(1000, 1000, avgRowBytes = CostBasedJoin.DefaultBroadcastBytes / 1000),
      broadcastRows = 10000).strategy == "broadcast")

    // catalog-level: two dims with identical row counts, widths measured
    // by the stats write; the plan flips on width alone
    val dirL = tmp("graft_cbj_bytes_l")
    Profiling.writeTableStats(
      spark.range(0, 50000).select(col("id").cast("string").as("k")), dirL, "k")
    val dirNarrow = tmp("graft_cbj_bytes_n")
    Profiling.writeTableStats(
      spark.range(0, 1000).select(col("id").as("k2")), dirNarrow, "k2")
    val dirWide = tmp("graft_cbj_bytes_w")
    Profiling.writeTableStats(
      spark.range(0, 1000).select(col("id").as("k2"),
        rpad(lit("x"), 92, "x").as("pad")), dirWide, "k2")
    // 8 B/row × 1000 ≤ 10 kB budget; (8+92) B/row × 1000 > 10 kB
    val (_, cNarrow) = CostBasedJoin.chooseJoin(left, right, "k", "k2",
      dirL, dirNarrow, broadcastRows = 100000L, broadcastBytes = 10000L)
    assert(cNarrow.strategy == "broadcast", cNarrow.toString)
    val (_, cWide) = CostBasedJoin.chooseJoin(left, right, "k", "k2",
      dirL, dirWide, broadcastRows = 100000L, broadcastBytes = 10000L)
    assert(cWide.strategy != "broadcast", cWide.toString)
  }

  test("dimFilter selectivity: a declared equality filter flips the dim to its filtered cardinality") {
    val dirL = tmp("graft_cbj_sel_l")
    Profiling.writeTableStats(
      spark.range(0, 50000).select(col("id").cast("string").as("k")), dirL, "k")
    // dim: 100k rows, segment 'A' holds 5k (above floor 3225 → tracked),
    // 'Z' appears 10 times (below floor → untracked)
    val dim = spark.range(0, 100000).select(col("id").cast("string").as("k2"),
      when(col("id") < 5000, "A").when(col("id") < 5010, "Z")
        .otherwise(concat(lit("seg"), (col("id") % 40).cast("string")))
        .as("seg"))
    val dirD = tmp("graft_cbj_sel_d")
    Profiling.writeTableStats(dim, dirD, "k2", freqCols = Seq("seg"))
    // unfiltered: 100k rows > 10k threshold → refuses broadcast
    val (_, c0) = CostBasedJoin.chooseJoin(left, right, "k", "k2",
      dirL, dirD, broadcastRows = 10000L)
    assert(c0.strategy != "broadcast", c0.toString)
    // tracked value: judged by the EXACT filtered count 5000 ≤ 10k → broadcast
    val (_, cA) = CostBasedJoin.chooseJoin(left, right, "k", "k2",
      dirL, dirD, broadcastRows = 10000L,
      dimFilter = Some("seg" -> "A"))
    assert(cA.strategy == "broadcast", cA.toString)
    assert(cA.right.nRows == 5000L, "exact tracked frequency becomes n_b")
    // untracked value: bounded by the MG floor n/(SkewCap+1) = 3225 ≤ 10k
    val (_, cZ) = CostBasedJoin.chooseJoin(left, right, "k", "k2",
      dirL, dirD, broadcastRows = 10000L,
      dimFilter = Some("seg" -> "Z"))
    assert(cZ.strategy == "broadcast" && cZ.right.nRows == 100000L / 31L,
      cZ.toString)
    // …but the floor is an upper BOUND, not a free pass: a threshold
    // under the floor still refuses
    val (_, cZt) = CostBasedJoin.chooseJoin(left, right, "k", "k2",
      dirL, dirD, broadcastRows = 2000L, dimFilter = Some("seg" -> "Z"))
    assert(cZt.strategy != "broadcast", cZt.toString)
    // a filter on an UNTRACKED column changes nothing (no sidecar → no claim)
    val (_, cU) = CostBasedJoin.chooseJoin(left, right, "k", "k2",
      dirL, dirD, broadcastRows = 10000L,
      dimFilter = Some("other_col" -> "A"))
    assert(cU.strategy == c0.strategy && cU.right.nRows == 100000L)
  }

  test("dimRange selectivity: a declared range filter judges the dim by its histogram bin sum") {
    val dirL = tmp("graft_cbj_rng_l")
    Profiling.writeTableStats(
      spark.range(0, 50000).select(col("id").cast("string").as("k")), dirL, "k")
    // dim: 100k rows, v uniform 0..99999 → width = 99999 div 32 + 1 = 3125,
    // 32 bins of exactly 3125 rows
    val dim = spark.range(0, 100000).select(col("id").cast("string").as("k2"),
      col("id").as("v"))
    val dirD = tmp("graft_cbj_rng_d")
    Profiling.writeTableStats(dim, dirD, "k2", histCols = Seq("v"))
    val left = spark.range(0, 50000).select(col("id").cast("string").as("k"))
    val right = dim
    // unfiltered: 100k rows > 10k threshold → refuses broadcast
    val (_, c0) = CostBasedJoin.chooseJoin(left, right, "k", "k2",
      dirL, dirD, broadcastRows = 10000L)
    assert(c0.strategy != "broadcast", c0.toString)
    // narrow range [0, 6249] → bins 0..1 → 6250 ≤ 10k → broadcast, with
    // the bin sum as the dim's effective cardinality
    val (_, cN) = CostBasedJoin.chooseJoin(left, right, "k", "k2",
      dirL, dirD, broadcastRows = 10000L,
      dimRange = Some(("v", 0L, 6249L)))
    assert(cN.strategy == "broadcast" && cN.right.nRows == 6250L, cN.toString)
    // partially-covered edge bins count FULLY (upper bound): [100, 200]
    // overlaps only bin 0 → 3125, still a sound bound ≥ the exact 101
    val (_, cE) = CostBasedJoin.chooseJoin(left, right, "k", "k2",
      dirL, dirD, broadcastRows = 10000L,
      dimRange = Some(("v", 100L, 200L)))
    assert(cE.right.nRows == 3125L, cE.toString)
    // wide range keeps the refusal
    val (_, cW) = CostBasedJoin.chooseJoin(left, right, "k", "k2",
      dirL, dirD, broadcastRows = 10000L,
      dimRange = Some(("v", 0L, 99999L)))
    assert(cW.strategy == c0.strategy && cW.right.nRows == 100000L, cW.toString)
    // a range outside the domain is exactly 0 matching rows
    val (_, cZ) = CostBasedJoin.chooseJoin(left, right, "k", "k2",
      dirL, dirD, broadcastRows = 10000L,
      dimRange = Some(("v", 200000L, 300000L)))
    assert(cZ.right.nRows == 0L && cZ.strategy == "broadcast", cZ.toString)
    // an untracked column changes nothing; both predicates at once is loud
    val (_, cU) = CostBasedJoin.chooseJoin(left, right, "k", "k2",
      dirL, dirD, broadcastRows = 10000L,
      dimRange = Some(("other", 0L, 10L)))
    assert(cU.strategy == c0.strategy && cU.right.nRows == 100000L)
    assertThrows[IllegalArgumentException] {
      CostBasedJoin.chooseJoin(left, right, "k", "k2", dirL, dirD,
        dimFilter = Some("seg" -> "A"), dimRange = Some(("v", 0L, 1L)))
    }
  }

  test("refreshSkew re-arms the salted rung on an appended table (the b6 lifecycle)") {
    // fact: half the rows on key '0' — the straggler shape
    val hotFact = spark.range(0, 40000).select(
      when(col("id") % 2 === 0, lit(0L)).otherwise(col("id"))
        .cast("string").as("k"))
    val dirF = tmp("graft_cbj_refresh_f")
    Profiling.writeTableStats(hotFact.filter(col("k") =!= "0"), dirF, "k")
    Profiling.appendTableStats(hotFact.filter(col("k") === "0"), dirF, "k")
    val dirD = tmp("graft_cbj_refresh_d")
    Profiling.writeTableStats(
      spark.range(0, 50000).select(col("id").cast("string").as("k2")),
      dirD, "k2")
    // post-append: top unknown → the rung stays quiet
    val (_, cBefore) = CostBasedJoin.chooseJoin(left, right, "k", "k2",
      dirF, dirD, broadcastRows = 1L)
    assert(cBefore.left.topCount == -1L && cBefore.strategy != "salted")
    // refresh over the current table re-arms it
    Profiling.refreshSkew(hotFact, dirF, "k")
    val (df, cAfter) = CostBasedJoin.chooseJoin(left, right, "k", "k2",
      dirF, dirD, broadcastRows = 1L)
    assert(cAfter.strategy == "salted", cAfter.toString)
    assert(cAfter.left.topCount == 20000L)
    df.collect() // the actuated salted join executes
  }
}
