package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  */
object SavedAnalytics {

  /** Saved query #1: total distinct entities after a filtered dim ⋈ fact
    * join (reference `sql/saved-queries.sql:10-17`). */
  def totalDistinct(spark: SparkSession, dir: String, segment: String = "BUILDING"): DataFrame = {
    val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === segment)
    val o = Tables.orders(spark, dir)
    broadcast(c)
      .join(o, c("c_custkey") === o("o_custkey"), "inner")
      .agg(countDistinct(col("c_custkey")).as("total_customers"))
  }

  /** Saved query #2: per-group distinct counts (`sql/saved-queries.sql:19-26`). */
  def countByGroup(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    broadcast(c)
      .join(o, c("c_custkey") === o("o_custkey"), "inner")
      .groupBy(col("c_mktsegment"))
      .agg(countDistinct(col("c_custkey")).as("num_customers"))
  }

  /** Saved query #3: top-k per group via ROW_NUMBER over a deduplicated CTE
    * (`sql/saved-queries.sql:28-45`). k=500 mirrors the reference's "up to
    * 500 building models". `rn` is cast to long to match the oracle's BIGINT. */
  def topKPerGroup(spark: SparkSession, dir: String, k: Int = 500): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val joined = broadcast(c)
      .join(o, c("c_custkey") === o("o_custkey"), "inner")
      .select(col("c_custkey"), col("c_mktsegment"))
      .distinct()
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_custkey"))
    joined
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }
}
