package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, count, date_trunc, lit, max, min, sum}
import org.apache.spark.sql.types.{DoubleType, StringType}

/** Optimizer rule: transparently route time-rollup aggregates over a base
  * parquet table to a registered pre-aggregated materialized view.
  *
  * This elevates the reference's pre-agg source selection (A9 — the v3
  * `_agg` path choice in `indexer.py`, a path-resolution-time decision) to
  * a PLAN-time decision: the user writes the query against the BASE table;
  * if a registered hourly rollup can answer it, the optimizer swaps the
  * scan and re-aggregates the partials. At 100 TB the difference is a scan
  * of the rollup (≈ hours × keys rows) versus the full fact table — the
  * single biggest win available to any recurring dashboard query, applied
  * without the query author knowing the MV exists.
  *
  * Matching is deliberately all-or-nothing (any unsupported shape leaves
  * the plan untouched — the rewrite can never be "partially" applied):
  *
  *  - the aggregate's child must be a (possibly Project-chained) scan of a
  *    registered base path, with NO filters — a Filter between scan and
  *    aggregate falls outside the MV contract and aborts the match;
  *  - grouping must be exactly {date_trunc(g, tsCol), keyCol} with g at
  *    hour grain or coarser (an hourly rollup can answer hour/day/week/
  *    month/quarter/year — trunc of the hour column to a coarser grain is
  *    trunc of the raw timestamps, since trunc is idempotent across
  *    nested grains);
  *  - aggregates must be sum/min/max/count/avg of the value column (or
  *    count(1)): each has an exact partial-merge form over the MV —
  *    sum→sum of sums, min→min of mins, max→max of maxes, count(v)→sum of
  *    per-hour counts, count(1)→sum of per-hour row counts, avg→sum of
  *    sums ÷ sum of counts. Null semantics carry: an all-null hour stores
  *    a null partial sum/min/max, which the merging aggregate skips
  *    exactly as the base aggregate skips the null rows.
  *
  * Grouping-expression aliases and the optimizer's own
  * `PullOutGroupingExpressions` projection are resolved through an
  * alias-substitution pass, so the rule matches both the analysis-time
  * shape (raw exprs in the Aggregate) and the optimized shape (grouping
  * exprs pulled into a child Project) — it can be injected as either a
  * resolution or an optimizer rule ([[graft.functions.GraftExtensions]]
  * injects it alongside [[IntervalJoinRewrite]]).
  *
  * Exactness note for avg: the MV path sums per-hour partial sums, a
  * different double association than the base table's fold — bit-equality
  * of avg across the two plans is NOT guaranteed (last-ulp class). Integer
  * value columns (the repo's cents discipline) make sum/min/max/count
  * exact; avg support exists for parity but rollup consumers wanting
  * hash-stable output should emit integer sums + counts.
  */
object MaterializedViewRewrite extends Rule[LogicalPlan] {

  /** A registered rollup: the analyzed scan of the MV parquet + the base
    * table's column names it summarizes. */
  final case class MvDef(mvPlan: LogicalPlan, tsCol: String, keyCol: String, valCol: String)

  private val registry = new java.util.concurrent.ConcurrentHashMap[String, MvDef]()

  private val MvCols =
    Seq("__mv_hour", "__mv_key", "__mv_sum", "__mv_cnt", "__mv_rows", "__mv_min", "__mv_max")

  /** Hour-or-coarser date_trunc grains an hourly rollup can serve. */
  private val Grains = Set(
    "hour", "day", "dd", "week", "month", "mon", "mm",
    "quarter", "year", "yyyy", "yy")

  /** The MV content: hourly (sum, count, rows, min, max) partials of
    * `valCol` per (hour, key). The caller writes this wherever it wants
    * (run-stamped [[graft.etl.Sink]] roots compose) and registers the
    * written path. */
  def buildRollup(base: DataFrame, tsCol: String, keyCol: String, valCol: String): DataFrame =
    base.groupBy(
        date_trunc("hour", col(tsCol)).as("__mv_hour"),
        col(keyCol).as("__mv_key"))
      .agg(
        sum(col(valCol)).as("__mv_sum"),
        count(col(valCol)).as("__mv_cnt"),
        count(lit(1)).as("__mv_rows"),
        min(col(valCol)).as("__mv_min"),
        max(col(valCol)).as("__mv_max"))

  /** Register a written rollup for `basePath`. The MV parquet must have
    * [[buildRollup]]'s schema. */
  def register(
      spark: SparkSession,
      basePath: String,
      mvPath: String,
      tsCol: String,
      keyCol: String,
      valCol: String): Unit = {
    val plan = spark.read.parquet(mvPath).queryExecution.analyzed
    registry.put(normalize(basePath), MvDef(plan, tsCol, keyCol, valCol))
  }

  def clear(): Unit = registry.clear()

  private def normalize(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath.stripSuffix("/")

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (registry.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate if agg.resolved =>
        rewrite(agg).getOrElse(agg)
    }

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    // Walk Project chains down to the scan, collecting alias → child-expr
    // substitutions (covers user .select aliases, column pruning, and
    // PullOutGroupingExpressions' _groupingexpression projection).
    val aliasMap = scala.collection.mutable.Map[ExprId, Expression]()
    var cur: LogicalPlan = agg.child
    var rel: LogicalRelation = null
    var depth = 0
    while (rel == null) {
      depth += 1
      if (depth > 10) return None
      cur match {
        case Project(list, c) =>
          list.foreach { case a: Alias => aliasMap(a.exprId) = a.child; case _ => }
          cur = c
        case r: LogicalRelation => rel = r
        case _ => return None // Filter/anything else: outside the MV contract
      }
    }
    val path = rel.relation match {
      case f: HadoopFsRelation => f.location.rootPaths.toList match {
        case p :: Nil => normalize(p.toString)
        case _ => return None
      }
      case _ => return None
    }
    val mv = Option(registry.get(path)).getOrElse(return None)

    def resolve(e: Expression): Expression = {
      var x = e
      var i = 0
      while (i < 10 && x.exists {
          case a: AttributeReference => aliasMap.contains(a.exprId); case _ => false }) {
        x = x.transformUp {
          case a: AttributeReference if aliasMap.contains(a.exprId) => aliasMap(a.exprId)
        }
        i += 1
      }
      x
    }
    def stripAlias(e: Expression): Expression = e match {
      case Alias(c, _) => c
      case other => other
    }

    // Classify grouping: exactly one supported trunc of tsCol + the key.
    val resolvedGroups = agg.groupingExpressions.map(g => resolve(stripAlias(g)))
    var truncRepl: Expression = null
    var keyRepl: Expression = null

    val mvRel = mv.mvPlan match {
      case m: MultiInstanceRelation => m.newInstance().asInstanceOf[LogicalPlan]
      case p => p
    }
    val byName = mvRel.output.map(a => a.name -> a).toMap
    if (!MvCols.forall(byName.contains)) return None

    val newGroups: Seq[Expression] = resolvedGroups.map {
      case t @ TruncTimestamp(Literal(fmt, StringType), ts, tz)
          if truncRepl == null && Grains.contains(fmt.toString.toLowerCase) =>
        stripAlias(resolve(ts)) match {
          case a: AttributeReference if a.name == mv.tsCol =>
            truncRepl = TruncTimestamp(Literal(fmt.toString), byName("__mv_hour"), tz)
            truncRepl
          case _ => return None
        }
      case a: AttributeReference if keyRepl == null && a.name == mv.keyCol =>
        keyRepl = byName("__mv_key")
        keyRepl
      case _ => return None
    }
    if (truncRepl == null || keyRepl == null) return None

    def isVal(e: Expression): Boolean = stripAlias(resolve(e)) match {
      case a: AttributeReference => a.name == mv.valCol
      case _ => false
    }
    def merged(fn: AggregateFunction): Option[Expression] = fn match {
      case Sum(v, _) if isVal(v) =>
        Some(Sum(byName("__mv_sum")).toAggregateExpression())
      case Min(v) if isVal(v) =>
        Some(Min(byName("__mv_min")).toAggregateExpression())
      case Max(v) if isVal(v) =>
        Some(Max(byName("__mv_max")).toAggregateExpression())
      case Count(Seq(Literal(_, _))) =>
        Some(Coalesce(Seq(Sum(byName("__mv_rows")).toAggregateExpression(), Literal(0L))))
      case Count(Seq(v)) if isVal(v) =>
        Some(Coalesce(Seq(Sum(byName("__mv_cnt")).toAggregateExpression(), Literal(0L))))
      case Average(v, _) if isVal(v) =>
        Some(Divide(
          Cast(Sum(byName("__mv_sum")).toAggregateExpression(), DoubleType),
          Cast(Sum(byName("__mv_cnt")).toAggregateExpression(), DoubleType)))
      case _ => None
    }

    val canonGroups = resolvedGroups.map(_.canonicalized)
    val newAggs: Seq[NamedExpression] = agg.aggregateExpressions.map { ne =>
      val inner = stripAlias(ne)
      val repl: Expression = resolve(inner) match {
        case g if canonGroups.contains(g.canonicalized) =>
          newGroups(canonGroups.indexOf(g.canonicalized))
        case _ => inner match {
          case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
            merged(ae.aggregateFunction).getOrElse(return None)
          case _ => return None
        }
      }
      Alias(repl, ne.name)(exprId = ne.exprId)
    }
    Some(Aggregate(newGroups, newAggs, mvRel))
  }
}
