package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
