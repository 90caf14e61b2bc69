package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite — the ANALYZE-then-assert
  * pass every production ingest runs before a snapshot is published
  * (the reference stack trusts its upstream parquet blindly; worker.py's
  * only check is schema presence). Modeled on the Deequ/Great-Expectations
  * shape: each constraint yields a named metric plus a pass/fail verdict,
  * and ALL row-scan metrics are computed in ONE aggregate pass over the
  * table.
  *
  * Scale shape: one full-scan aggregate (every per-row metric folds
  * map-side into a single row), plus one anti-join aggregate per
  * referential constraint (key-only projections, AQE free to broadcast
  * the dimension side). The unpivot to one-row-per-constraint happens on
  * a single-row frame — driver-weight, not data-weight. Adding a
  * constraint adds a column to the same pass, not a new scan.
  */
object Validation {

  /** One constraint: `name`, the metric expression (evaluated in the
    * shared aggregate pass over `df`), and the pass predicate applied to
    * the metric value. */
  final case class Check(name: String, metric: Column, pass: Column => Column)

  /** Standard checks. Metrics are DOUBLE; `passed` is BIGINT 0/1. */
  def completeness(c: String): Check =
    Check(s"completeness_$c",
      count(col(c)).cast("double") / count(lit(1)).cast("double"),
      _ === 1.0)

  def uniqueness(cols: Seq[String]): Check =
    Check(s"uniqueness_${cols.mkString("_")}",
      countDistinct(col(cols.head), cols.tail.map(col): _*).cast("double") /
        count(lit(1)).cast("double"),
      _ === 1.0)

  def minAtLeast(c: String, lo: Double): Check =
    Check(s"min_$c", min(col(c)).cast("double"), _ >= lo)

  def maxAtMost(c: String, hi: Double): Check =
    Check(s"max_$c", max(col(c)).cast("double"), _ <= hi)

  /** Fraction of rows whose `c` is in `allowed` (nulls count as out-of-
    * domain — completeness is its own check). */
  def inDomain(c: String, allowed: Seq[String]): Check =
    Check(s"domain_$c",
      sum(when(col(c).isin(allowed: _*), 1L).otherwise(0L)).cast("double") /
        count(lit(1)).cast("double"),
      _ === 1.0)

  /** Run `checks` over `df` in one aggregate pass; append referential-
    * integrity checks (`fk in df` ⊆ `pk in dim`, metric = orphan count,
    * pass = 0 orphans) as one anti-join aggregate each. Output:
    * (check_name STRING, metric DOUBLE round(7), passed BIGINT 0/1),
    * one row per constraint (`check_name`, not `constraint` — reserved
    * word in ANSI engines the oracle twin runs on). The verdict tests
    * the RAW metric, not the rounded display value. */
  def suite(df: DataFrame, checks: Seq[Check],
      refIntegrity: Seq[(String, DataFrame, String)] = Nil): DataFrame = {
    require(checks.nonEmpty, "Validation.suite: at least one check")
    val metricCols = checks.zipWithIndex.map { case (ch, i) => ch.metric.as(s"__m$i") }
    val one = df.agg(metricCols.head, metricCols.tail: _*)
    val withRef = refIntegrity.zipWithIndex.foldLeft(one) {
      case (acc, ((fk, dim, pk), j)) =>
        // key-only anti join; the orphan count is a single row, and the
        // cross join attaches it to the metrics row (1×1 — no data motion)
        val orphans = df.select(col(fk)).join(
            dim.select(col(pk).as(fk)), Seq(fk), "left_anti")
          .agg(count(lit(1)).cast("double").as(s"__r$j"))
        acc.crossJoin(orphans)
    }
    // unpivot the single metrics row into (constraint, metric, passed)
    val rows = checks.zipWithIndex.map { case (ch, i) =>
      struct(lit(ch.name).as("check_name"),
        round(col(s"__m$i"), 7).as("metric"),
        when(ch.pass(col(s"__m$i")), 1L).otherwise(0L).as("passed"))
    } ++ refIntegrity.zipWithIndex.map { case ((fk, _, pk), j) =>
      struct(lit(s"ref_${fk}_in_$pk").as("check_name"),
        round(col(s"__r$j"), 7).as("metric"),
        when(col(s"__r$j") === 0.0, 1L).otherwise(0L).as("passed"))
    }
    withRef.select(explode(array(rows: _*)).as("c"))
      .select(col("c.check_name"), col("c.metric"), col("c.passed"))
  }

  /** k-anonymity audit — the privacy-governance check beside
    * [[graft.etl.Erasure]]: per quasi-identifier combination, the group
    * size and whether it meets the k threshold. Groups below k are
    * re-identification risks (an attacker knowing someone's
    * quasi-identifiers narrows them to < k records); the standard
    * remediation is suppressing or generalizing exactly those groups,
    * which is a semi-join of this output against the table. One grouped
    * count — the cheapest possible audit shape at any scale. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Int = 5): DataFrame = {
    require(quasiCols.nonEmpty && k >= 1)
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("meets_k", (col("n") >= k).cast("long"))
  }

  /** l-diversity audit (Machanavajjhala et al., ICDE'06) — k-anonymity's
    * necessary complement: a group can be k-large yet leak the sensitive
    * attribute completely if every member SHARES it (the homogeneity
    * attack k-anonymity misses). Per quasi-identifier group: size,
    * DISTINCT sensitive values, and whether the group is l-diverse. One
    * grouped count + distinct — same audit-shape cost as [[kAnonymity]];
    * remediation is again a semi-join suppressing the failing groups. */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, l: Int = 3): DataFrame = {
    require(quasiCols.nonEmpty && l >= 1)
    df.groupBy(quasiCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("n_sensitive_distinct"))
      .withColumn("meets_l", (col("n_sensitive_distinct") >= l).cast("long"))
  }

  /** Referential-integrity audit — orphan detection across a foreign-key
    * relation (the data-quality check that catches a partial load or an
    * out-of-order ingest before a downstream join silently drops or
    * fabricates rows): child rows, DISTINCT child keys, orphans (child
    * keys with no parent — NULL keys are counted separately, not as
    * orphans: a NULL FK is a modeling choice, a dangling one is
    * corruption). One distinct-key aggregate + one anti-join against the
    * parent KEY SET (key-sized, not table-sized). */
  def referentialIntegrity(child: DataFrame, fkCol: String,
      parent: DataFrame, pkCol: String, relation: String): DataFrame = {
    val spark = child.sparkSession
    import spark.implicits._
    val keyed = child.select(col(fkCol).as("__fk"))
    val nChild = keyed.count()
    val nNull = keyed.filter(col("__fk").isNull).count()
    val distinctKeys = keyed.filter(col("__fk").isNotNull).distinct()
    val orphans = distinctKeys
      .join(parent.select(col(pkCol).as("__fk")).distinct(),
        Seq("__fk"), "left_anti")
      .count()
    Seq((relation, nChild, nNull, distinctKeys.count(), orphans))
      .toDF("relation", "n_child_rows", "n_null_fk", "n_distinct_fk", "n_orphans")
      .withColumn("ok", (col("n_orphans") === 0L).cast("long"))
  }
}
