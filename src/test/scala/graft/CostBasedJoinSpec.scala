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
}
