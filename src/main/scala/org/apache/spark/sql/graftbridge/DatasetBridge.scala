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
