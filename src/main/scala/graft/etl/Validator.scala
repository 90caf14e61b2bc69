package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality gate: declarative per-column rules evaluated in ONE
  * aggregation pass over the data (no per-rule scans — at 100 TB every
  * extra pass is the cost, so all rule counters ride a single `agg`).
  * The reference has no validation at all; its tracker only counts files.
  */
sealed trait Rule { def name: String; def violations: Column }
final case class NotNull(colName: String) extends Rule {
  val name = s"not_null($colName)"
  def violations: Column = sum(when(col(colName).isNull, 1L).otherwise(0L))
}
final case class InRange(colName: String, lo: Double, hi: Double) extends Rule {
  val name = s"in_range($colName,$lo,$hi)"
  def violations: Column =
    sum(when(col(colName) < lo || col(colName) > hi, 1L).otherwise(0L))
}
final case class MatchesRegex(colName: String, pattern: String) extends Rule {
  val name = s"matches($colName)"
  def violations: Column =
    sum(when(!col(colName).rlike(pattern), 1L).otherwise(0L))
}

final case class ValidationReport(rows: Long, violations: Map[String, Long]) {
  def passed: Boolean = violations.values.forall(_ == 0L)
}

object Validator {
  def check(df: DataFrame, rules: Seq[Rule]): ValidationReport = {
    val aggs = count(lit(1)).as("__rows") +:
      rules.map(r => coalesce(r.violations, lit(0L)).as(r.name))
    val row = df.agg(aggs.head, aggs.tail: _*).collect().head
    ValidationReport(
      row.getAs[Long]("__rows"),
      rules.map(r => r.name -> row.getAs[Long](r.name)).toMap)
  }
}
