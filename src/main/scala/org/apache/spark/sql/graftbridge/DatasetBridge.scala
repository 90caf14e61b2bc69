package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ClassicConversions._

/** Bridge to `private[sql]` Dataset construction from a LogicalPlan —
  * needed to expose custom logical operators (graft.plans) as DataFrames. */
object DatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(castToImpl(spark), plan)

  def logicalPlan(df: DataFrame): LogicalPlan =
    castToImpl(df).queryExecution.analyzed

  /** Unpersist the RDD backing a `localCheckpoint()`ed DataFrame.
    * Checkpointed RDDs are persisted outside the CacheManager, so
    * `Dataset.unpersist()` cannot release them — iterative algorithms that
    * checkpoint per round (e.g. label propagation) would otherwise
    * accumulate one cached RDD per round for the job's lifetime. */
  def unpersistCheckpoint(df: DataFrame): Unit =
    castToImpl(df).queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Re-wrap a `localCheckpoint()`ed DataFrame as a bare LogicalRDD with
    * NO origin constraints/statistics. A checkpoint keeps the ORIGIN
    * plan's constraint set, and a self-union over constraint-bearing
    * checkpoints can trip `UnionBase.rewriteConstraints` with
    * "key not found: <attr>" during `InferFiltersFromConstraints` when a
    * kept constraint references an attribute outside the union's output
    * (observed on `Dedup.clustersLogStar` fed by
    * `incrementalClusters`' first-ingest empty-union pair frame).
    * No-op on non-checkpointed frames. */
  def dropCheckpointConstraints(df: DataFrame): DataFrame = {
    val impl = castToImpl(df)
    impl.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        ofRows(df.sparkSession, lr.copy()(impl.sparkSession, None, None))
      case _ => df
    }
  }

  /** [[dropCheckpointConstraints]] that additionally RESTORES the hash
    * partitioning a checkpoint loses under AQE: `localCheckpoint()` records
    * the executed plan's `outputPartitioning`, but with adaptive execution
    * the top node is `AdaptiveSparkPlanExec`, which reports
    * `UnknownPartitioning` — so a frame materialized through an explicit
    * `repartition(n, key)` checkpoints into a LogicalRDD that has the
    * layout and has lost the metadata, and every downstream join/aggregate
    * keyed on `key` re-shuffles rows that are already in place.
    *
    * SOUNDNESS CONTRACT: callers must have materialized the checkpoint
    * through an EXPLICIT-count `repartition(n, col(keyCol))` as the LAST
    * repartitioning operation. For user-specified counts AQE neither
    * coalesces nor rebalances, so the physical layout is exactly
    * Catalyst's `HashPartitioning(keyCol, n)` and re-asserting it is
    * metadata-only truth. Asserting it on any OTHER layout would silently
    * break join co-location. `n` is read off the checkpointed RDD itself,
    * never trusted from the caller. */
  def checkpointedWithHashPartitioning(df: DataFrame, keyCol: String): DataFrame = {
    val impl = castToImpl(df)
    impl.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        val attr = lr.output.find(_.name == keyCol).getOrElse(
          throw new IllegalArgumentException(
            s"checkpointedWithHashPartitioning: no column `$keyCol` in " +
              s"checkpoint output ${lr.output.map(_.name).mkString(", ")}"))
        val part = org.apache.spark.sql.catalyst.plans.physical
          .HashPartitioning(Seq(attr), lr.rdd.getNumPartitions)
        ofRows(df.sparkSession,
          lr.copy(outputPartitioning = part)(impl.sparkSession, None, None))
      case _ => df
    }
  }

  /** A SERIALIZABLE factory for the session's Hadoop Configuration, for
    * shipping into tasks: `SerializableConfiguration` is `private[spark]`
    * (unnameable from graft code), and a task-side `new Configuration()`
    * would silently drop the session's filesystem settings (credentials,
    * fs.defaultFS) on a real cluster. The returned closure captures the
    * Spark wrapper and is itself java-serializable. */
  def confFactory(conf: org.apache.hadoop.conf.Configuration)
      : () => org.apache.hadoop.conf.Configuration = {
    val sc = new org.apache.spark.util.SerializableConfiguration(conf)
    () => sc.value
  }
}
