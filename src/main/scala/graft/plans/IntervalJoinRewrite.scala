package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Optimizer rule: rewrite an interval-overlap THETA join into the
  * bucketed equi-join [[graft.operators.RangeJoin.intervalJoin]] builds by
  * hand — automatically, for any query that writes the natural condition.
  *
  * Spark plans `a.s <= b.e AND b.s <= a.e` (no equi-key) as a
  * BroadcastNestedLoopJoin / CartesianProduct — O(|L|·|R|) pairs scored,
  * dead at scale. But any pair of OPPOSING cross-side timestamp
  * inequalities is an interval overlap, and overlap admits a coarse-grid
  * equi-key: replicate each row to the grid buckets its interval covers,
  * join on the bucket, keep the original condition as an exact filter, and
  * emit each pair only from the canonical bucket containing
  * `greatest(ls, rs)` (both covers include it — see intervalJoin's
  * Scaladoc — so no duplicates and no distinct).
  *
  * Semantics preserved bit-for-bit, including degenerate rows with
  * end < start: covers are clamped to `[floor(s/w), floor(greatest(s,e)/w)]`
  * (never empty), and for ANY pair satisfying the original condition the
  * canonical point max(ls, rs) lies inside both clamped covers — proof:
  * it is ≥ each side's start by construction, and ≤ each side's
  * greatest(start, end) because the condition supplies ls ≤ re and
  * rs ≤ le. The exact theta condition then decides membership, so the
  * rewrite can never add, drop, or duplicate a pair.
  *
  * Fires only when the join has NO equi-key (with one, Spark already hash
  * joins and the inequalities are a fine post-filter) — which also makes
  * the rule idempotent: its own output joins on the bucket equi-key.
  * Bucket width (performance only, never correctness) comes from
  * `spark.graft.intervalJoin.bucketWidthMs`, default one day.
  */
object IntervalJoinRewrite extends Rule[LogicalPlan] {

  val WidthConfKey = "spark.graft.intervalJoin.bucketWidthMs"
  val DefaultWidthMs = 86400000L // one day

  private def isTs(e: Expression): Boolean =
    e.dataType == TimestampType || e.dataType == TimestampNTZType

  /** Millis-since-epoch of a timestamp expression (NTZ widened in the
    * session zone, matching the DataFrame operator's cast). */
  private def millis(e: Expression): Expression = {
    val ts =
      if (e.dataType == TimestampType) e
      else Cast(e, TimestampType, Option(SQLConf.get.sessionLocalTimeZone))
    UnixMillis(ts)
  }

  private def bucketOf(e: Expression, w: Long): Expression =
    IntegralDivide(e, Literal(w))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if j.resolved && extract(j, cond).isDefined =>
      val (ls, le, rs, re, conjuncts) = extract(j, cond).get
      val w = math.max(1L,
        try SQLConf.get.getConfString(WidthConfKey, DefaultWidthMs.toString).toLong
        catch { case _: NumberFormatException => DefaultWidthMs })

      def cover(child: LogicalPlan, s: Expression, e: Expression, name: String)
          : (LogicalPlan, Attribute) = {
        val bucket = AttributeReference(name, LongType, nullable = true)()
        // Sequence is TimeZoneAwareExpression: resolved requires a zone
        // even for integral sequences
        val seq = Sequence(
          bucketOf(millis(s), w),
          bucketOf(millis(Greatest(Seq(s, e))), w),
          Some(Literal(1L)),
          Some(SQLConf.get.sessionLocalTimeZone))
        (Generate(Explode(seq), unrequiredChildIndex = Nil, outer = false,
          qualifier = None, generatorOutput = Seq(bucket), child), bucket)
      }

      val (lG, bl) = cover(left, ls, le, "__graft_bucket_l")
      val (rG, br) = cover(right, rs, re, "__graft_bucket_r")
      // canonical-bucket dedup: emit the pair only where the joined bucket
      // is the bucket of the overlap start
      val canonical = EqualTo(bl,
        bucketOf(millis(Greatest(Seq(ls, rs))), w))
      val newCond = (Seq(EqualTo(bl, br)) ++ conjuncts :+ canonical)
        .reduce(And)
      Project(j.output, Join(lG, rG, Inner, Some(newCond), hint))
  }

  /** Match: condition splits into conjuncts containing one `Lts <= Rts`
    * and one `Rts <= Lts` cross-side timestamp inequality (any comparison
    * in {<, <=}), and NO cross-side equality (Spark hash-joins those
    * already). Returns (ls, le, rs, re, all original conjuncts). */
  private def extract(j: Join, cond: Expression)
      : Option[(Expression, Expression, Expression, Expression, Seq[Expression])] = {
    val conjuncts = splitConjuncts(cond)
    val leftOut = j.left.outputSet
    val rightOut = j.right.outputSet
    def sideOf(e: Expression): Option[Boolean] = // true = left
      if (e.references.isEmpty) None
      else if (e.references.subsetOf(leftOut)) Some(true)
      else if (e.references.subsetOf(rightOut)) Some(false)
      else None

    val hasCrossEquality = conjuncts.exists {
      case EqualTo(a, b) => (for (sa <- sideOf(a); sb <- sideOf(b)) yield sa != sb).getOrElse(false)
      case EqualNullSafe(a, b) => (for (sa <- sideOf(a); sb <- sideOf(b)) yield sa != sb).getOrElse(false)
      case _ => false
    }
    if (hasCrossEquality) return None

    // normalize every cross-side {<, <=} into (smaller, larger)
    val crossLe = conjuncts.flatMap {
      case LessThanOrEqual(a, b) => Some((a, b))
      case LessThan(a, b) => Some((a, b))
      case GreaterThanOrEqual(a, b) => Some((b, a))
      case GreaterThan(a, b) => Some((b, a))
      case _ => None
    }.filter { case (a, b) => isTs(a) && isTs(b) }

    val lr = crossLe.find { case (a, b) =>
      sideOf(a).contains(true) && sideOf(b).contains(false) } // ls <= re
    val rl = crossLe.find { case (a, b) =>
      sideOf(a).contains(false) && sideOf(b).contains(true) } // rs <= le
    for ((ls, re) <- lr; (rs, le) <- rl)
      yield (ls, le, rs, re, conjuncts)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }
}
