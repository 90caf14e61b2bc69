package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE INTO semantics (upsert + delete) as ONE full-outer-join pass —
  * the batch CDC-apply primitive behind incremental corpus maintenance:
  * fold a change set into a base snapshot without a mutable table format.
  * (The reference stack rewrites whole partitions instead — worker.py's
  * re-encode path; this is the operator a user needs when the delta is
  * small relative to the snapshot.)
  *
  * Change-set contract: one row per key (enforce upstream — the LAST-wins
  * resolution of conflicting changes is [[latestPerKey]]), an `op` column
  * with `"U"` (upsert: update if the key exists, insert if not) or `"D"`
  * (delete; deleting an absent key is a no-op), and the full base payload
  * on every `"U"` row.
  *
  * Scale shape: one equi-join shuffle on the key (or a broadcast when the
  * change set is small — left to AQE, since change-set size is workload
  * data, not query-count-bounded), one projection. No window, no second
  * pass; the output is immediately writable as the next snapshot.
  */
object Merge {

  /** Apply `changes` to `base`. Output columns = base columns. An
    * out-of-contract op value (anything but 'U'/'D', including NULL)
    * fails the job loudly — a NULL op on an absent key would otherwise
    * be indistinguishable from a base-only row after the outer join and
    * silently emit an all-null phantom row (review finding). */
  def upsert(base: DataFrame, changes: DataFrame, key: Seq[String],
      opCol: String = "op"): DataFrame = {
    val payload = base.columns.filterNot(key.contains).toSeq
    val opChecked = when(col(opCol).isin("U", "D"), col(opCol))
      .otherwise(raise_error(concat(
        lit(s"Merge.upsert: op must be 'U' or 'D', got "),
        coalesce(col(opCol), lit("NULL")))))
    val ch = changes.select(
      (key.map(col) :+ opChecked.as("__op")) ++
        payload.map(c => col(c).as(s"__chg_$c")): _*)
    base.join(ch, key, "full_outer")
      .filter(col("__op").isNull || col("__op") =!= "D")
      .select(key.map(col) ++ payload.map(c =>
        when(col("__op") === "U", col(s"__chg_$c")).otherwise(col(c)).as(c)): _*)
  }

  /** Collapse a multi-version change log to one winning row per key by a
    * total (versionCol DESC, then op DESC — 'U' beats 'D' on a tie) order —
    * the map-side-combinable struct-max idiom, no window sort. */
  def latestPerKey(changes: DataFrame, key: Seq[String], versionCol: String,
      opCol: String = "op"): DataFrame = {
    val payload = changes.columns.filterNot(c => key.contains(c)).toSeq
    changes
      .groupBy(key.map(col): _*)
      .agg(max(struct((col(versionCol) +: col(opCol) +: payload.filterNot(
        c => c == versionCol || c == opCol).map(col)): _*)).as("__w"))
      .select(key.map(col) ++ payload.map(c => col(s"__w.$c").as(c)): _*)
  }
}
