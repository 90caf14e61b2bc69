package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.config.JobSpec

/** Partition-pruned reads replacing the reference's manual S3 prefix
  * listing (SURVEY.md §2.1 S1/S2): one `basePath` read over the release
  * tree with filters on the `upgrade`/`state` partition columns. Catalyst's
  * file-index partition pruning turns those filters into exactly the
  * directory listing the reference hand-builds (`indexer.py:204-207`) —
  * non-selected partitions are never listed, which is what keeps the scan
  * proportional to the job, not the lake, at 100 TB.
  */
object PartitionedSource {

  /** Read the time-series slice a job selects. Partition filters prune at
    * the file-index level (verify with `.explain`: PartitionFilters). */
  def readData(spark: SparkSession, base: String, dataPartition: String, job: JobSpec): DataFrame = {
    val basePath = PathResolver.dataBasePath(base, dataPartition, job)
    var df = spark.read
      .option("basePath", basePath)
      .parquet(basePath)
      .where(col("upgrade").isin(job.upgrades: _*) && col("state") === job.state)
    job.counties match {
      case Some(cs) if cs.nonEmpty && cs != Seq("*") && df.columns.contains("county") =>
        df = df.where(col("county").isin(cs: _*))
      case _ => ()
    }
    df
  }

  /** Exact-path metadata read (S3 — no listing when paths are computable;
    * `indexer.py:48-91,135-137`). Missing paths are skipped (the reference
    * logs-and-continues on absent metadata). */
  def readMetadata(spark: SparkSession, job: JobSpec): Option[DataFrame] = {
    val paths = PathResolver.metadataPaths(job)
      .filter(p => new java.io.File(p).exists() || !p.startsWith("/"))
    if (paths.isEmpty) None
    else Some(spark.read.parquet(paths: _*))
  }
}
