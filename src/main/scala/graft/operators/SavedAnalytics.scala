package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.CostBasedJoin
import graft.sources.Tables

/** The reference's three saved Athena queries (SURVEY.md §2.12,
  * `sql/saved-queries.sql:10-45`) re-expressed as DataFrame builders over the
  * synthetic star schema (FIXTURES.md §3): metadata ⋈ data inner equi-join
  * (J1) with the small dimension side broadcast, exact COUNT(DISTINCT)
  * globally (A6) and per group (A7), and windowed top-k per group
  * (W1 + W2 + A8 + P3).
  *
  * Scale notes: `customer` is the small side at every SF (1 row per customer
  * vs ~10 orders each) → explicit `broadcast()` keeps the join shuffle-free;
  * the window's per-group top-k is optimized by Spark ≥3.5 into a
  * `WindowGroupLimit` (rank pushdown) so each partition only keeps k rows
  * before the shuffle.
  *
  * The dim join is CATALOG-CONSULTING ([[CostBasedJoin.consultOr]]): when
  * the session's stats-catalog root holds entries for `orders.o_custkey`
  * and `customer.c_custkey`, the planner's ladder picks the strategy (and
  * would flip to bloom reduction or salting if the stats said so — the
  * always-on posture, plan-asserted in PlanGuardSpec); without entries the
  * hand-pinned broadcast above stays, byte-identical to the pre-catalog
  * engine. Either way the join RESULT is identical (every strategy is
  * output-invisible), so the saved queries stay hash-green.
  */
object SavedAnalytics {

  /** Saved query #1: total distinct entities after a filtered dim ⋈ fact
    * join (reference `sql/saved-queries.sql:10-17`). */
  def totalDistinct(spark: SparkSession, dir: String, segment: String = "BUILDING"): DataFrame = {
    val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === segment)
    val o = Tables.orders(spark, dir)
    // declare the dim's equality filter so a catalog with a c_mktsegment
    // freq sidecar judges the join by the FILTERED cardinality (the
    // catalog-blindness the dimJoin doc flagged — removed in r12)
    dimJoin(spark, o, c, dimFilter = Some("c_mktsegment" -> segment))
      .agg(countDistinct(col("c_custkey")).as("total_customers"))
  }

  /** Saved query #2: per-group distinct counts (`sql/saved-queries.sql:19-26`). */
  def countByGroup(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    dimJoin(spark, o, c)
      .groupBy(col("c_mktsegment"))
      .agg(countDistinct(col("c_custkey")).as("num_customers"))
  }

  /** Saved query #3: top-k per group via ROW_NUMBER over a deduplicated CTE
    * (`sql/saved-queries.sql:28-45`). k=500 mirrors the reference's "up to
    * 500 building models". `rn` is cast to long to match the oracle's BIGINT. */
  def topKPerGroup(spark: SparkSession, dir: String, k: Int = 500): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val joined = dimJoin(spark, o, c)
      .select(col("c_custkey"), col("c_mktsegment"))
      .distinct()
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_custkey"))
    joined
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

  /** The shared orders ⋈ customer site: catalog-routed when entries exist,
    * today's broadcast otherwise (see class doc). Inner equi-join, so the
    * operand order swap vs the legacy `broadcast(c).join(o)` changes only
    * column order — every consumer selects by name.
    *
    * Stats-vs-frame note: q1 passes a segment-FILTERED customer frame.
    * When the catalog carries a `c_mktsegment` freq sidecar (declared
    * filter columns at write time / refreshSkew), the declared `dimFilter`
    * lets the ladder judge the join by the filtered cardinality (exact
    * tracked count, or the MG floor as a sound upper bound); without the
    * sidecar the unfiltered stats remain a strictly conservative bias
    * (can decline a broadcast, never pick a wrong shape). */
  private def dimJoin(spark: SparkSession, o: DataFrame, c: DataFrame,
      dimFilter: Option[(String, String)] = None): DataFrame =
    CostBasedJoin.consultOr(spark,
      o, "o_custkey", "orders.o_custkey",
      c, "c_custkey", "customer.c_custkey", dimFilter) {
      broadcast(c).join(o, c("c_custkey") === o("o_custkey"), "inner")
    }
}
