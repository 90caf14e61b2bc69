package graft.etl

/** Lineage/discrepancy summary replacing the reference's `ETLTracker`
  * process (`tracker.py:15-405`; summary shape `README.md:467-493`): counts
  * per stage (listed → transformed → uploaded) for data and metadata, and
  * a JSON report. Where the reference counts S3 objects through queue
  * stages, a Spark run counts input files (from the resolved file index)
  * and output files (from the committed write) — the same invariant
  * (`listed == uploaded` ⇒ nothing lost) expressed at the only real
  * boundary Spark has.
  */
final case class JobReport(
    jobName: String,
    dataFilesListed: Long,
    dataRowsIn: Long,
    dataRowsOut: Long,
    dataFilesWritten: Long,
    metadataFilesListed: Long,
    metadataFilesWritten: Long) {

  /** A job that listed input but committed no output lost data — the
    * invariant the reference's per-file tracker enforces, at Spark's
    * job granularity (file counts legitimately shrink through the rollup). */
  def lostOutput: Boolean = dataFilesListed > 0 && dataFilesWritten == 0
}

final case class RunReport(totalTimeSeconds: Double, jobs: Seq[JobReport]) {

  /** README.md:468-493-shaped JSON summary. */
  def toJson: String = {
    def jobJson(j: JobReport): String =
      s"""{"job":"${j.jobName}",""" +
        s""""data":{"listed":${j.dataFilesListed},"rows_in":${j.dataRowsIn},""" +
        s""""rows_out":${j.dataRowsOut},"uploaded":${j.dataFilesWritten},""" +
        s""""lost_output":${j.lostOutput}},""" +
        s""""metadata":{"listed":${j.metadataFilesListed},"uploaded":${j.metadataFilesWritten}}}"""
    s"""{"total_time_seconds":${f"$totalTimeSeconds%.2f"},"jobs":[${jobs.map(jobJson).mkString(",")}]}"""
  }
}

object Tracker {
  def countFiles(dir: String): Long = {
    val root = new java.io.File(dir)
    if (!root.exists()) 0L
    else {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1L
        else 0L
      walk(root)
    }
  }
}
