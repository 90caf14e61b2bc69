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

  /** Snapshot diff — the inverse of [[upsert]]: given two snapshots with
    * identical schemas, emit the change rows that turn `prev` into `next`
    * (`I` = key only in next, `D` = key only in prev, `U` = key in both
    * with any payload difference under null-safe equality). Unchanged keys
    * are dropped. This is how a pipeline *generates* a CDC feed from
    * periodic full snapshots when the source system has no change log.
    *
    * Scale shape: one full-outer equi-join shuffle on the key; the
    * classification and payload comparison are per-row projections. Output
    * carries both versions (`old_*`/`new_*`) so a consumer can audit the
    * delta without re-reading either snapshot. */
  def snapshotDiff(prev: DataFrame, next: DataFrame, key: Seq[String]): DataFrame = {
    require(prev.columns.sameElements(next.columns),
      s"Merge.snapshotDiff: schemas differ: ${prev.columns.mkString(",")} vs ${next.columns.mkString(",")}")
    val payload = prev.columns.filterNot(key.contains).toSeq
    val p = prev.select(key.map(col) ++ payload.map(c => col(c).as(s"__old_$c"))
      :+ lit(1).as("__in_old"): _*)
    val n = next.select(key.map(col) ++ payload.map(c => col(c).as(s"__new_$c"))
      :+ lit(1).as("__in_new"): _*)
    // null-safe per-column equality: a null payload value equal on both
    // sides must NOT read as a change
    val same = payload.map(c => col(s"__old_$c") <=> col(s"__new_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    p.join(n, key, "full_outer")
      .withColumn("change",
        when(col("__in_old").isNull, lit("I"))
          .when(col("__in_new").isNull, lit("D"))
          .when(same, lit("N")).otherwise(lit("U")))
      .filter(col("change") =!= "N")
      .select(key.map(col) ++ (col("change") +: payload.flatMap(c =>
        Seq(col(s"__old_$c").as(s"old_$c"), col(s"__new_$c").as(s"new_$c")))): _*)
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

  /** CDC log compaction — collapse a change-log SEGMENT (I/U/D events per
    * key, totally ordered by `seqCol` within a key) to its NET effect, the
    * maintenance pass that keeps a Debezium-style feed replayable without
    * growing forever: applying the compacted segment to any base snapshot
    * produces the same table as replaying the raw segment (spec-pinned).
    * Net rules per key: first=I ∧ last=D → the key is transient, NO
    * output row; first=I → net I with the final payload; last=D → net D
    * (payload null — the row is gone); otherwise net U with the final
    * payload.
    *
    * Scale shape: ONE grouped aggregate — first/last events by
    * lexicographic struct-min/max on (seq, ...) (no per-key window sort,
    * the d9 struct-max move). `seqCol` must be unique per key or
    * first/last are ill-defined (the same contract latestPerKey states
    * via its version column). */
  def cdcCompact(cdc: DataFrame, keyCol: String = "key", seqCol: String = "seq",
      opCol: String = "op", payloadCol: String = "payload"): DataFrame = {
    val agg = cdc.groupBy(col(keyCol))
      .agg(
        min(struct(col(seqCol), col(opCol))).as("__first"),
        max(struct(col(seqCol), col(opCol), col(payloadCol))).as("__last"))
      .select(col(keyCol),
        col(s"__first.$opCol").as("__fop"),
        col(s"__last.$opCol").as("__lop"),
        col(s"__last.$payloadCol").as("__lpay"))
    agg
      .filter(!(col("__fop") === "I" && col("__lop") === "D"))
      .select(col(keyCol),
        when(col("__fop") === "I", "I")
          .when(col("__lop") === "D", "D")
          .otherwise("U").as("net_op"),
        when(col("__lop") === "D", lit(null).cast(cdc.schema(payloadCol).dataType))
          .otherwise(col("__lpay")).as(payloadCol))
  }
}
