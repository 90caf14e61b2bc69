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

  /** Ladder constants — the SINGLE definition: the b2/b3 oracle CASEs
    * interpolate these same values (`SparkEntry.sqlB2Case`), so a ladder
    * retune can never hash-split the gate by editing one side only. */
  val DefaultExplodeFactor = 2L
  val DefaultBloomFactor = 4L

  /** Broadcast BYTE budget for rung 1: a row threshold alone is width-
    * blind (a 2-column key dim and a 100-column fact differ ~50× per row),
    * so the rung also requires `n_right · avg_row_bytes` under this cap
    * when the catalog knows the byte stat (`n_bytes` in the entry; -1 =
    * unknown → row-count-only, the pre-r12 behavior). 64 MB: far above
    * Spark's 10 MB auto-broadcast default (this rung is an explicit
    * catalog decision, not an optimizer guess) and far below the
    * per-executor memory a 1000-executor replication must fit. The
    * comparison is the overflow-free `n_b <= bytes div avg_b` (equivalent
    * to `n_b·avg_b <= bytes` for positive BIGINTs — same fence family as
    * [[estRows]]), replayed literally by the b7 oracle. */
  val DefaultBroadcastBytes = 64L << 20

  /** Salted rung trigger: the fact's hottest key holds more than
    * 1/SaltShareFactor of its rows (`top > n div factor`, the overflow-free
    * equivalent of `top·factor > n`) — one reducer would own that whole
    * share of the shuffle, the classic straggler at 100 TB. Must stay above
    * the skew stat's own observability floor 1/(SkewCap+1) or the rung
    * could never fire (1/8 > 1/31 — fine). */
  val SaltShareFactor = 8L

  /** Salt fan-out for the actuated [[graft.operators.SkewJoin]]-shape join:
    * the hot key spreads across this many tasks; the dim side is
    * replicated once per salt (dims reaching this rung are small — the
    * broadcast rung already absorbed the tiny ones, and replication cost
    * is salts·n_b rows). Output-invisible, so not part of the oracle
    * contract — retune freely. */
  val SaltCount = 16

  /** One side's catalog stats: exact row count + KMV distinct estimate +
    * clamped exact top-key count (-1 = unknown — entry produced by an
    * append; the salted rung then never fires) + average row bytes
    * (-1 = unknown — pre-byte-stats entry; the byte cap then never
    * vetoes). */
  final case class SideStats(nRows: Long, estDistinct: Long,
      topCount: Long = -1L, avgRowBytes: Long = -1L)

  /** The decision record — everything the spec and the b2 gate assert. */
  final case class Choice(
      strategy: String,
      left: SideStats,
      right: SideStats,
      estRows: Long)

  /** Containment join-cardinality estimate with the x30 overflow fence
    * (fitness test INSTEAD of the raw multiply — never wraps). The fallback
    * branch carries its OWN fitness test: (n_a/maxD)·n_b can still wrap
    * when maxD is small relative to the row counts (n_a=n_b=4e9, d=1 →
    * 1.6e19), and a wrapped-negative estimate would silently misclassify
    * the pair-explosion case as 'shuffle' — the exact regime this ladder
    * exists for. A SATURATED estimate still selects shuffle_hash correctly;
    * the SQL replay ([[graft.SparkEntry]]'s b2 CASE / x30) mirrors the
    * saturation so both engines stay branch-identical. */
  def estRows(a: SideStats, b: SideStats): Long = {
    val maxD = math.max(math.max(a.estDistinct, b.estDistinct), 1L)
    if (a.nRows == 0L || b.nRows == 0L) 0L
    else if (a.nRows <= 4611686018427387904L / b.nRows)
      a.nRows * b.nRows / maxD
    else {
      val q = a.nRows / maxD
      if (q <= Long.MaxValue / b.nRows) q * b.nRows else Long.MaxValue
    }
  }

  /** The strategy ladder over catalog stats alone — pure arithmetic, no
    * frames, so it is unit-testable and SQL-replayable. Rung order:
    *
    *  1. '''broadcast''' — skew-immune (no fact shuffle by key), so it
    *     outranks the salted rung.
    *  2. '''salted''' — the fact's hottest key exceeds the
    *     [[SaltShareFactor]] share; salting splits that key across tasks,
    *     which a pinned shuffle_hash would NOT do (the hot key still lands
    *     on one reducer), so skew outranks the explosion rung.
    *  3. '''shuffle_hash''' — total output explodes past the inputs.
    *  4. '''bloom_reduced''' — discard-heavy probe side.
    *  5. '''shuffle''' — no structure; stay out of the way. */
  def decide(a: SideStats, b: SideStats, broadcastRows: Long,
      explodeFactor: Long = DefaultExplodeFactor,
      bloomFactor: Long = DefaultBloomFactor,
      bloomLegal: Boolean = true,
      broadcastBytes: Long = DefaultBroadcastBytes): Choice = {
    val est = estRows(a, b)
    // byte veto: known width × rows must fit the budget (overflow-free
    // division form; unknown width keeps the row-count-only rung)
    val fitsBytes =
      b.avgRowBytes <= 0L || b.nRows <= broadcastBytes / b.avgRowBytes
    val strategy =
      if (b.nRows <= broadcastRows && fitsBytes) "broadcast"
      else if (a.topCount > a.nRows / SaltShareFactor) "salted"
      else if (est > explodeFactor * (a.nRows + b.nRows)) "shuffle_hash"
      else if (bloomLegal && bloomFactor * b.estDistinct <= a.estDistinct)
        "bloom_reduced"
      else "shuffle"
    Choice(strategy, a, b, est)
  }

  /** Join types the ladder's Bloom rung may fire for: semi/anti are the
    * PURE discard cases (the probe side exists only to be kept-or-dropped),
    * inner discards non-matchers exactly. A left-OUTER join must deliver
    * every left row, so a prefilter is illegal there — the ladder skips the
    * rung rather than emit a lying strategy label. */
  def bloomLegalFor(joinType: String): Boolean =
    joinType == "inner" || joinType == "left_semi" || joinType == "left_anti"

  /** Read both catalogs, decide, and return the equi-join
    * `left ⋈ right ON keyLeft = keyRight` (of the requested `joinType`:
    * inner, left_semi, left_anti, or left_outer) with the chosen strategy
    * pinned, plus the [[Choice]] for observability. The result is
    * bit-identical under every strategy (broadcast/shuffle-hash hints, the
    * Bloom prefilter, and the salt fan-out are all output-invisible), so
    * callers hash-check results against a plain join while the plan flips
    * with the catalog.
    *
    * Join-type notes: semi is the PURE Bloom case (the probe side exists
    * only to be discarded — the prefilter moves that discard below the
    * exchange); anti INVERTS the sketch: rows the filter rules out are
    * DEFINITE keeps that skip the join entirely, and only the
    * possibly-matching remainder shuffles into the exact anti join (two
    * passes over the fact scan traded against shuffling its discard-heavy
    * bulk); left-outer never takes the Bloom rung ([[bloomLegalFor]]).
    * Salting is legal for all four: the dim side carries EVERY salt value,
    * so per-(key, salt) match-existence equals per-key match-existence. */
  def chooseJoin(
      left: DataFrame, right: DataFrame,
      keyLeft: String, keyRight: String,
      statsDirLeft: String, statsDirRight: String,
      broadcastRows: Long = 1L << 20,
      explodeFactor: Long = DefaultExplodeFactor,
      bloomFactor: Long = DefaultBloomFactor,
      joinType: String = "inner",
      broadcastBytes: Long = DefaultBroadcastBytes,
      dimFilter: Option[(String, String)] = None,
      dimRange: Option[(String, Long, Long)] = None): (DataFrame, Choice) = {
    require(Set("inner", "left_semi", "left_anti", "left_outer")(joinType),
      s"chooseJoin supports inner/left_semi/left_anti/left_outer, got $joinType")
    require(dimFilter.isEmpty || dimRange.isEmpty,
      "declare dimFilter OR dimRange, not both (composing selectivities " +
        "multiplies two upper bounds — unsound without joint stats)")
    val spark = left.sparkSession
    // ONE versioned read per side: count, distinct estimate, top count and
    // hot-key values all come from the SAME resolved entry version, so a
    // concurrent append can never pair one version's numbers with
    // another's (missing) sidecar.
    val ls = Profiling.readTableStats(spark, statsDirLeft, keyLeft)
    val (na, da, ta, hotKeys) =
      (ls.nRows, ls.estDistinct, ls.topCount, ls.hotKeys)
    val rs = Profiling.readTableStats(spark, statsDirRight, keyRight)
    // Equality-predicate SELECTIVITY: when the caller declares the dim is
    // filtered to `col = value` and the catalog tracks that column's
    // value frequencies (freq sidecar), the dim side is judged by the
    // filtered cardinality — the EXACT count when the value is tracked,
    // else the sidecar's STORED observability floor as a sound upper
    // bound (published iff count > floor, so an absent value is provably
    // at or below it; the floor's basis is the freq column's own non-null
    // count — see Profiling.freqsAboveFloor). This removes q1's conservative
    // bias (filtered dim judged by unfiltered stats — it declined
    // broadcasts it should take). Distinct estimate is capped at the
    // filtered count; row width is unchanged by a filter.
    // Range-predicate SELECTIVITY: a declared `lo ≤ col ≤ hi` dim filter
    // over a histogram-tracked column is judged by the SUM of the bins
    // the range overlaps — a sound upper bound (every matching row lies
    // in an overlapping bin; partially-covered edge bins count fully).
    // Same nEff consumption as the equality path.
    val rangeEff = dimRange.flatMap { case (c, lo, hi) =>
      rs.hists.get(c).map(histRangeUpperBound(_, lo, hi))
    }
    val bSide = dimFilter.flatMap { case (c, v) => rs.freqs.get(c).map { f =>
        f.counts.getOrElse(v, f.floor)
      }
    }.orElse(rangeEff).map { nEff =>
      SideStats(nEff, math.min(rs.estDistinct, math.max(nEff, 1L)),
        rs.topCount, rs.avgRowBytes)
    }.getOrElse(SideStats(rs.nRows, rs.estDistinct, rs.topCount, rs.avgRowBytes))
    val choice = decide(
      SideStats(na, da, ta, ls.avgRowBytes), bSide,
      broadcastRows, explodeFactor, bloomFactor, bloomLegalFor(joinType),
      broadcastBytes)
    (applyStrategy(left, right, keyLeft, keyRight, joinType, choice, hotKeys,
      statsDirLeft), choice)
  }

  /** Upper bound on rows matching `lo ≤ col ≤ hi` from an equi-width
    * histogram sidecar: the range is clamped to the histogram's [min, max]
    * domain FIRST (offsets stay non-negative, so the truncating integer
    * division below agrees with flooring — the CLAUDE.md negative-div
    * rule), then the overlapped bin indices' exact counts sum. An empty
    * histogram (all-null column, `maxV < minV`) or a range outside the
    * domain bounds to 0 — exact, since no stored value can match. */
  def histRangeUpperBound(h: Profiling.HistStats, lo: Long, hi: Long): Long = {
    if (h.maxV < h.minV || hi < h.minV || lo > h.maxV || hi < lo) 0L
    else {
      val binLo = ((math.max(lo, h.minV) - h.minV) / h.width).toInt
      val binHi = ((math.min(hi, h.maxV) - h.minV) / h.width).toInt
      (binLo to binHi).map(h.bins.getOrElse(_, 0L)).sum
    }
  }

  /** [[chooseJoin]] from ALREADY-RESOLVED stats — the derived-frame door:
    * when one side is not a base table (a group-by, a candidate set), its
    * stats come from CBO cardinality ALGEBRA over its inputs' catalog
    * entries (e.g. [[groupByStats]]) instead of a catalog read. The ladder
    * and every strategy application are identical. `hotKeys` feeds the
    * salted rung's actuation (empty = the rung must not have fired). */
  def chooseJoinStats(
      left: DataFrame, right: DataFrame,
      keyLeft: String, keyRight: String,
      a: SideStats, b: SideStats, hotKeys: Seq[String],
      broadcastRows: Long = 1L << 20,
      explodeFactor: Long = DefaultExplodeFactor,
      bloomFactor: Long = DefaultBloomFactor,
      joinType: String = "inner",
      broadcastBytes: Long = DefaultBroadcastBytes): (DataFrame, Choice) = {
    require(Set("inner", "left_semi", "left_anti", "left_outer")(joinType),
      s"chooseJoinStats supports inner/left_semi/left_anti/left_outer, got $joinType")
    val choice = decide(a, b, broadcastRows, explodeFactor, bloomFactor,
      bloomLegalFor(joinType), broadcastBytes)
    (applyStrategy(left, right, keyLeft, keyRight, joinType, choice, hotKeys,
      "<caller-supplied stats>"), choice)
  }

  /** Cardinality algebra for a `groupBy(key).agg(…)` DERIVED frame, from
    * its INPUT's catalog entry: the aggregate emits exactly one row per
    * distinct key, so n_rows = estDistinct = the input's key-distinct
    * estimate; skew and width stats do not carry over (the aggregate
    * collapses the hot key to one row; the output schema is new) — both
    * unknown. This is the textbook CBO output-cardinality rule for
    * aggregation, and what lets q58's per-part aggregate join consult the
    * same ladder as base tables. */
  def groupByStats(input: graft.operators.Profiling.TableStats): SideStats =
    SideStats(input.estDistinct, input.estDistinct)

  private def applyStrategy(
      left: DataFrame, right: DataFrame,
      keyLeft: String, keyRight: String,
      joinType: String, choice: Choice, hotKeys: Seq[String],
      statsDirLeft: String): DataFrame = {
    val cond = left(keyLeft) === right(keyRight)
    val joined = choice.strategy match {
      case "broadcast" => left.join(broadcast(right), cond, joinType)
      case "salted" =>
        // Plan-time HOT/COLD SPLIT (what AQE's skew mitigation does at
        // runtime, done from the catalog before the skewed exchange ever
        // exists): the sidecar names EVERY key over the MG floor (≤
        // SkewCap of them — real skew is often a handful of hot defaults,
        // not one), so the fact splits into its hot slice (salted across
        // SaltCount tasks against ONLY the dim's hot rows replicated per
        // salt — replication cost is salts × hot-dim-slice, not
        // salts × dim) and the now-skew-free cold remainder (a plain
        // equi-join Catalyst/AQE handles). The
        // salt comes from a Murmur3 of a monotonic row id — uniform by
        // construction, never column-cardinality-dependent, and
        // output-invisible (the salt is an equi-conjunct both sides
        // carry, dropped before return). Null fact keys route COLD via
        // the coalesce (they match nothing; outer/anti must still
        // deliver them). Probe-measured: whole-dim ×16 replication LOST
        // to the blind join at 12M rows (48M replicated dim rows); the
        // hot-slice split is what wins.
        if (hotKeys.isEmpty) throw new IllegalStateException(
          s"salted rung fired but $statsDirLeft names no hot keys — " +
            "stats written by an incompatible version; rebuild them")
        val isHot = left(keyLeft).cast("string").isin(hotKeys: _*)
        val salt = pmod(hash(monotonically_increasing_id()), lit(SaltCount))
        val hotLeft = left.filter(coalesce(isHot, lit(false)))
          .withColumn("__graft_salt", salt)
        val hotRight = right
          .filter(coalesce(right(keyRight).cast("string").isin(hotKeys: _*),
            lit(false)))
          .withColumn("__graft_salt",
            explode(sequence(lit(0), lit(SaltCount - 1))))
        val hotJoined = hotLeft
          .join(hotRight,
            hotLeft(keyLeft) === hotRight(keyRight) &&
              hotLeft("__graft_salt") === hotRight("__graft_salt"),
            joinType)
          .drop("__graft_salt")
        val coldJoined = left.filter(!coalesce(isHot, lit(false)))
          .join(right, cond, joinType)
        hotJoined.unionAll(coldJoined)
      case "shuffle_hash" =>
        left.hint("shuffle_hash").join(right.hint("shuffle_hash"), cond,
          joinType)
      case "bloom_reduced" =>
        // Bloom sketch sized from the CATALOG's key estimate (×2 headroom,
        // pow-2, ≥ 1024), ~16 bits/key — never a blind default.
        val estKeys = math.max(1024L,
          java.lang.Long.highestOneBit(
            math.max(1L, choice.right.estDistinct * 2L - 1L)) * 2L)
        joinType match {
          case "inner" =>
            BloomJoin.bloomReducedJoin(left, right, keyLeft, keyRight,
              estKeys = estKeys, numBits = estKeys * 16L)
          case "left_semi" =>
            // FPs pass the prefilter and die in the exact semi probe.
            left.filter(BloomJoin.mightMatch(right,
                col(keyLeft), col(keyRight), estKeys, estKeys * 16L))
              .join(right, cond, "left_semi")
          case "left_anti" =>
            // Inverted sketch: definitely-not-in-dim rows (Bloom has no
            // false negatives) are KEEPS that never shuffle; only the
            // possible matches take the exact anti join. Null handling:
            // an EMPTY dim yields a null sketch → might is null → every
            // row is a keep (= anti over empty dim); null fact keys hash
            // to the seed value and land on either side correctly (the
            // anti join keeps them — null never equals).
            val might = BloomJoin.mightMatch(right,
              col(keyLeft), col(keyRight), estKeys, estKeys * 16L)
            left.filter(coalesce(!might, lit(true)))
              .unionAll(left.filter(coalesce(might, lit(false)))
                .join(right, cond, "left_anti"))
          case other => throw new IllegalStateException(
            s"bloom rung fired for $other — bloomLegalFor out of sync")
        }
      case _ => left.join(right, cond, joinType)
    }
    joined
  }

  /** Session-scoped stats-catalog root: when `spark.graft.statsCatalogRoot`
    * is set and `<root>/<entryName>` holds a published entry, engine join
    * sites consult the catalog; absent either, they keep their hand-pinned
    * shapes. Entry naming convention: `<table>.<keyCol>` (what
    * [[graft.operators.Profiling.writeWithStats]]-equipped writers
    * publish). The existence probe is one marker-file stat — metadata
    * plane, zero jobs. */
  def sessionStatsDir(spark: SparkSession, entryName: String): Option[String] =
    spark.conf.getOption("spark.graft.statsCatalogRoot")
      .map(root => s"$root/$entryName")
      .filter { p =>
        // Probe for a PUBLISHED entry, not just the format marker: the
        // marker is written before the first entry publish, so a stats
        // write that crashed mid-aggregate leaves marker-without-entry
        // forever — probing the marker alone would turn every adopted
        // query into a hard readStatsDriver failure instead of engaging
        // the hand-pinned fallback (review finding). Both checks are
        // local stats — zero jobs.
        java.nio.file.Files.exists(
          java.nio.file.Paths.get(p, "_format-stats-kmv-v1")) && {
          val d = new java.io.File(p)
          val names = d.list()
          names != null && names.exists(_.startsWith("entry-"))
        }
      }

  /** The always-on adoption shim for the engine's own join sites: route
    * `fact ⋈ dim` through [[chooseJoin]] when BOTH sides have catalog
    * entries under the session root, else run the site's hand-pinned
    * `fallback` — so the optimizer is on wherever stats exist (the
    * reference's CBO is always-on once the crawler has run,
    * `lib/nbi-open-data-analytics-stack.ts:313-389`) and behavior is
    * byte-identical to the pre-catalog engine where they don't. Every
    * strategy is output-invisible, so adopters stay hash-green either
    * way. */
  def consultOr(spark: SparkSession,
      fact: DataFrame, factKey: String, factEntry: String,
      dim: DataFrame, dimKey: String, dimEntry: String,
      dimFilter: Option[(String, String)] = None,
      joinType: String = "inner",
      dimRange: Option[(String, Long, Long)] = None)
      (fallback: => DataFrame): DataFrame =
    (sessionStatsDir(spark, factEntry), sessionStatsDir(spark, dimEntry)) match {
      case (Some(f), Some(d)) =>
        chooseJoin(fact, dim, factKey, dimKey, f, d,
          dimFilter = dimFilter, joinType = joinType, dimRange = dimRange)._1
      case _ => fallback
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
      caseId: String,
      joinType: String = "inner",
      broadcastBytes: Long = DefaultBroadcastBytes): DataFrame = {
    val (joined, c) = chooseJoin(left, right, keyLeft, keyRight,
      statsDirLeft, statsDirRight, broadcastRows, joinType = joinType,
      broadcastBytes = broadcastBytes)
    val actual = joined.groupBy().agg(count(lit(1)).as("actual_rows"))
    actual.select(
      lit(caseId).as("case_id"),
      lit(c.strategy).as("strategy"),
      lit(c.left.nRows).as("n_a"), lit(c.right.nRows).as("n_b"),
      lit(c.left.estDistinct).as("est_distinct_a"),
      lit(c.right.estDistinct).as("est_distinct_b"),
      lit(c.left.topCount).as("top_a"),
      lit(c.estRows).as("est_rows"),
      col("actual_rows"))
  }
}
