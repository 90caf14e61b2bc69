package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the most recent right row
  * with `rightTs <= leftTs` and the same key — the operator behind
  * "join each trade to the prevailing quote".
  *
  * Spark has no as-of join operator. The naive formulation — inequality
  * join + per-left-row max — explodes to O(|L|·|R|) pairs per key before
  * aggregating. This composition instead UNIONs both sides, sorts each key
  * once by (ts, side) and carries right-side values forward with a running
  * `last(..., ignoreNulls)` window: one shuffle on the key, O(|L|+|R|)
  * rows, no pair blowup — the formulation that survives 100 TB. Right rows
  * sort before left rows at equal timestamps, matching ASOF's `>=`
  * inclusive semantics (DuckDB's native ASOF JOIN is the conformance
  * oracle).
  */
object AsOfJoin {

  /** Planner strategy lowering [[graft.plans.AsOfJoinPlan]] to
    * [[graft.plans.AsOfJoinExec]]. Session-scoped registration via
    * `spark.experimental.extraStrategies` ([[registerStrategy]]) or
    * globally via `spark.sql.extensions=graft.functions.GraftExtensions`. */
  object Strategy extends org.apache.spark.sql.execution.SparkStrategy {
    import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
    import org.apache.spark.sql.execution.SparkPlan
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case p: graft.plans.AsOfJoinPlan =>
        graft.plans.AsOfJoinExec(
          p.leftKey, p.rightKey, p.leftTs, p.rightTs, p.rightVals,
          planLater(p.left), planLater(p.right)) :: Nil
      case _ => Nil
    }
  }

  def registerStrategy(spark: org.apache.spark.sql.SparkSession): Unit = {
    val classic = org.apache.spark.sql.classic.ClassicConversions.castToImpl(spark)
    if (!classic.experimental.extraStrategies.contains(Strategy))
      classic.experimental.extraStrategies =
        classic.experimental.extraStrategies :+ Strategy
  }

  /** Native physical-operator form: one exchange + sort per side, one
    * streaming merge pass. Output: left columns + `{col}_asof` right
    * values — same contract as the window-composition [[apply]], which
    * serves as its conformance oracle in `AsOfJoinSpec`. */
  def native(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightVals: Seq[String]): DataFrame = {
    import org.apache.spark.sql.graftbridge.DatasetBridge
    val spark = left.sparkSession
    registerStrategy(spark)
    val lPlan = DatasetBridge.logicalPlan(left)
    // Re-alias the right side so its output attributes get fresh exprIds:
    // when both sides derive from the same scan (self-as-of-join), analysis
    // deduplicates the shared subtree's ids and attributes captured in this
    // custom node would otherwise go stale (observed as the right child
    // being column-pruned out from under the stored key expression).
    val rPlan = DatasetBridge.logicalPlan(
      // NULL keys/timestamps never match (both oracle predicates non-true)
      right.filter(col(key).isNotNull && col(rightTs).isNotNull)
        .select(right.columns.map(c => col(c).as(c)): _*))
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    DatasetBridge.ofRows(spark, graft.plans.AsOfJoinPlan(
      lPlan, rPlan,
      attr(lPlan, key), attr(rPlan, key),
      attr(lPlan, leftTs), attr(rPlan, rightTs),
      rightVals.map(attr(rPlan, _))))
  }

  /** @param rightVals right columns carried to the output as `{name}_asof`
    * @param tieBreak   column present on both sides making the sort total
    *                   (any unique id); ties in (ts, side) are data-rare but
    *                   the order must be deterministic for oracle compare */
  def apply(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightVals: Seq[String],
      tieBreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val sideL = left.select(
      Seq(
        col(key).as("__k"),
        col(leftTs).as("__ts"),
        lit(1).as("__side"),
        col(tieBreak).as("__tie")) ++
        leftCols.map(c => col(c).as(s"__l_$c")) ++
        rightVals.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    // NULL keys and NULL timestamps never match under the oracle's
    // predicates (ON p.k = s.k AND p.ts >= s.ts are both non-true for
    // NULL), so such right rows are dropped up front; null-keyed or
    // null-ts left rows sort before every right row in their partition
    // (nulls-first) and keep nulls.
    val sideR = right.filter(col(key).isNotNull && col(rightTs).isNotNull).select(
      Seq(
        col(key).as("__k"),
        col(rightTs).as("__ts"),
        lit(0).as("__side"),
        col(tieBreak).as("__tie")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")) ++
        rightVals.map(c => col(c).as(s"__r_$c")): _*)

    val w = Window
      .partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // Carry the WHOLE matched right row forward as one struct: per-column
    // last(ignoreNulls) would skip a matched row's legitimate NULL value
    // (resurrecting an older value) and could stitch columns from
    // different right rows. The struct is non-null exactly for right rows,
    // so last(struct, ignoreNulls) is the latest matched ROW.
    val rstruct = when(
      col("__side") === 0,
      struct(rightVals.map(c => col(s"__r_$c")): _*))
    val filled = sideL.unionByName(sideR)
      .withColumn("__rmatch", last(rstruct, ignoreNulls = true).over(w))

    val out: Seq[Column] =
      leftCols.map(c => col(s"__l_$c").as(c)) ++
        rightVals.map(c => col("__rmatch").getField(s"__r_$c").as(s"${c}_asof"))
    filled.filter(col("__side") === 1).select(out: _*)
  }

  /** Point-in-time (feature-store) join: the as-of join PLUS a staleness
    * bound — for each left (entity, event-time) row, the latest right
    * feature row at or before the event time, but only if it is no older
    * than `toleranceSeconds`; staler matches surface as NULL features,
    * exactly like a missing feature. This is the training-set/serving
    * join a feature store runs (Feast's `ttl`, point-in-time correctness):
    * the as-of direction prevents FUTURE leakage, the tolerance prevents
    * the silent use of fossil features a long-dead entity would otherwise
    * carry forward indefinitely.
    *
    * Composition, not a new operator: [[apply]]'s one-shuffle union-window
    * plan does the matching (the right timestamp rides along as a value),
    * and the staleness test is a per-row integer-microsecond comparison
    * after the fact — same cost shape, no pair blowup. Output: left
    * columns + `{v}_pit` features (NULL when stale/missing) + `age_s`
    * (whole seconds, NULL when stale/missing). */
  def pointInTime(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightVals: Seq[String],
      tieBreak: String,
      toleranceSeconds: Long): DataFrame = {
    require(toleranceSeconds >= 0, s"tolerance must be >= 0, got $toleranceSeconds")
    val matched = apply(left, right, key, leftTs, rightTs,
      (rightVals :+ rightTs).distinct, tieBreak)
    val ageUs = unix_micros(col(leftTs)) - unix_micros(col(s"${rightTs}_asof"))
    val fresh = col(s"${rightTs}_asof").isNotNull &&
      ageUs <= lit(toleranceSeconds * 1000000L)
    val outVals = rightVals.filterNot(_ == rightTs)
      .map(v => when(fresh, col(s"${v}_asof")).as(s"${v}_pit"))
    matched.select(
      (left.columns.map(col).toSeq ++ outVals :+
        when(fresh, expr(s"(unix_micros($leftTs) - unix_micros(${rightTs}_asof)) div 1000000"))
          .as("age_s")): _*)
  }
}
