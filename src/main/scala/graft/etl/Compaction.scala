package graft.etl

import org.apache.spark.sql.SparkSession

/** Small-file compaction — the operational pain the reference bakes in
  * (one output object per input object, ~1,126 files for one state run,
  * `README.md:473`): rewrite a parquet directory into files of roughly
  * `targetBytes`, preserving rows. At 100 TB, file count drives listing
  * cost, task-scheduling overhead, and parquet footer overhead; compaction
  * after ingest keeps scans efficient.
  */
object Compaction {

  def dirBytes(dir: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles().map(walk).sum
      else if (f.getName.endsWith(".parquet")) f.length()
      else 0L
    val root = new java.io.File(dir)
    if (root.exists()) walk(root) else 0L
  }

  /** Rewrite `dir` in place (via a temp sibling) into ~targetBytes files. */
  def compact(spark: SparkSession, dir: String, targetBytes: Long = 128L * 1024 * 1024): Long = {
    val bytes = dirBytes(dir)
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val tmp = dir + "__compact_tmp"
    spark.read.parquet(dir).repartition(nFiles)
      .write.mode("overwrite").option("compression", "snappy").parquet(tmp)
    val dest = new java.io.File(dir)
    val back = new java.io.File(dir + "__compact_old")
    dest.renameTo(back)
    new java.io.File(tmp).renameTo(dest)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(back)
    nFiles.toLong
  }
}
