package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{BloomJoin, Profiling}

/** Statistics-driven join-strategy selection — the x34 stats catalog wired
  * into PLANNING, closing the "catalog is write-only" gap: the reference's
  * analog is Glue crawler statistics feeding Athena's cost-based optimizer
  * (`lib/nbi-open-data-analytics-stack.ts:313-389` — the crawlers exist
  * precisely to give the engine table stats), and Spark's own CBO consults
  * ANALYZE TABLE stats the same way. Here the decision reads ONLY the
  * persisted catalog ([[Profiling.readStatsDriver]] — one one-row entry per
  * side; the tables are never touched at choose time, spec-proven by
  * choosing over frames whose catalog describes different data), then
  * returns the join with the strategy PINNED in the plan.
  *
  * The decision ladder, in order, all exact BIGINT arithmetic so a SQL
  * oracle replays the chosen strategy bit-for-bit:
  *
  *  1. `n_right ≤ broadcastRows` → '''broadcast''' (the dim fits every
  *     executor; no shuffle at all).
  *  2. `est_rows > explodeFactor·(n_left + n_right)` → '''shuffle_hash'''
  *     pinned on BOTH sides: the join's OUTPUT dwarfs its inputs (the LSH
  *     pair-explosion shape), where AQE's input-sized broadcast choice
  *     serializes the explosion — the CLAUDE.md band-join lesson made
  *     automatic. `est_rows` is the containment estimate
  *     n_a·n_b / max(d_a, d_b) with the x30 overflow fence.
  *  3. `bloomFactor·d_right ≤ d_left` → '''bloom_reduced''': the dim's key
  *     set is a small fraction of the fact's, so most fact rows shuffle
  *     only to be discarded — [[BloomJoin.bloomReducedJoin]] moves the
  *     discard below the exchange (SCALING #68 measured 3.7–4.3×), with
  *     `estKeys` sized from the catalog's d_right instead of a guess.
  *  4. otherwise → '''shuffle''': a plain equi-join left to Catalyst/AQE
  *     (sort-merge at scale) — the estimates show no structure to exploit,
  *     so the planner stays out of the way.
  *
  * At 100 TB this is the difference between a human pinning hints per
  * operator (the pre-round-10 posture) and the catalog doing it: stats are
  * written once at table-write time, stay fresh through
  * [[Profiling.appendTableStats]]'s exact merges, and every consumer of
  * [[chooseJoin]] inherits the right strategy as data drifts.
  */
object CostBasedJoin {

  /** One side's catalog stats: exact row count + KMV distinct estimate. */
  final case class SideStats(nRows: Long, estDistinct: Long)

  /** The decision record — everything the spec and the b2 gate assert. */
  final case class Choice(
      strategy: String,
      left: SideStats,
      right: SideStats,
      estRows: Long)

  /** Containment join-cardinality estimate with the x30 overflow fence
    * (fitness test INSTEAD of the raw multiply — never wraps). */
  def estRows(a: SideStats, b: SideStats): Long = {
    val maxD = math.max(math.max(a.estDistinct, b.estDistinct), 1L)
    if (a.nRows == 0L || b.nRows == 0L) 0L
    else if (a.nRows <= 4611686018427387904L / b.nRows)
      a.nRows * b.nRows / maxD
    else (a.nRows / maxD) * b.nRows
  }

  /** The strategy ladder over catalog stats alone — pure arithmetic, no
    * frames, so it is unit-testable and SQL-replayable. */
  def decide(a: SideStats, b: SideStats, broadcastRows: Long,
      explodeFactor: Long = 2L, bloomFactor: Long = 4L): Choice = {
    val est = estRows(a, b)
    val strategy =
      if (b.nRows <= broadcastRows) "broadcast"
      else if (est > explodeFactor * (a.nRows + b.nRows)) "shuffle_hash"
      else if (bloomFactor * b.estDistinct <= a.estDistinct) "bloom_reduced"
      else "shuffle"
    Choice(strategy, a, b, est)
  }

  /** Read both catalogs, decide, and return the inner equi-join
    * `left ⋈ right ON keyLeft = keyRight` with the chosen strategy pinned,
    * plus the [[Choice]] for observability. The result is bit-identical
    * under every strategy (broadcast/shuffle-hash hints and the Bloom
    * prefilter are all output-invisible), so callers hash-check results
    * against a plain join while the plan flips with the catalog. */
  def chooseJoin(
      left: DataFrame, right: DataFrame,
      keyLeft: String, keyRight: String,
      statsDirLeft: String, statsDirRight: String,
      broadcastRows: Long = 1L << 20,
      explodeFactor: Long = 2L,
      bloomFactor: Long = 4L): (DataFrame, Choice) = {
    val spark = left.sparkSession
    val (na, da) = Profiling.readStatsDriver(spark, statsDirLeft, keyLeft)
    val (nb, db) = Profiling.readStatsDriver(spark, statsDirRight, keyRight)
    val choice = decide(SideStats(na, da), SideStats(nb, db),
      broadcastRows, explodeFactor, bloomFactor)
    val cond = left(keyLeft) === right(keyRight)
    val joined = choice.strategy match {
      case "broadcast" => left.join(broadcast(right), cond)
      case "shuffle_hash" =>
        left.hint("shuffle_hash").join(right.hint("shuffle_hash"), cond)
      case "bloom_reduced" =>
        // Bloom sketch sized from the CATALOG's key estimate (×2 headroom,
        // pow-2, ≥ 1024), ~16 bits/key — never a blind default.
        val estKeys = math.max(1024L,
          java.lang.Long.highestOneBit(math.max(1L, db * 2L - 1L)) * 2L)
        BloomJoin.bloomReducedJoin(left, right, keyLeft, keyRight,
          estKeys = estKeys, numBits = estKeys * 16L)
      case _ => left.join(right, cond)
    }
    (joined, choice)
  }

  /** [[chooseJoin]] for gate/audit use: the choice as a ONE-ROW frame
    * (strategy + the numbers it was derived from) cross-joined with the
    * executed join's row count — the strategy claim and its
    * output-invisibility proof in one hash-checkable row. */
  def chooseJoinAudit(
      left: DataFrame, right: DataFrame,
      keyLeft: String, keyRight: String,
      statsDirLeft: String, statsDirRight: String,
      broadcastRows: Long,
      caseId: String): DataFrame = {
    val (joined, c) = chooseJoin(left, right, keyLeft, keyRight,
      statsDirLeft, statsDirRight, broadcastRows)
    val actual = joined.groupBy().agg(count(lit(1)).as("actual_rows"))
    actual.select(
      lit(caseId).as("case_id"),
      lit(c.strategy).as("strategy"),
      lit(c.left.nRows).as("n_a"), lit(c.right.nRows).as("n_b"),
      lit(c.left.estDistinct).as("est_distinct_a"),
      lit(c.right.estDistinct).as("est_distinct_b"),
      lit(c.estRows).as("est_rows"),
      col("actual_rows"))
  }
}
