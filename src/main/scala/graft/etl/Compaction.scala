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

  /** Recursive local-fs directory delete (scratch-dir cleanup). */
  def deleteDir(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteDir))
    f.delete()
  }

  def dirBytes(dir: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles().map(walk).sum
      else if (f.getName.endsWith(".parquet")) f.length()
      else 0L
    val root = new java.io.File(dir)
    if (root.exists()) walk(root) else 0L
  }

  /** Rewrite `dir` in place (via a temp sibling) into ~targetBytes files.
    * The swap is rename-based and NOT safe under concurrent readers — run
    * in a maintenance window. Every rename is checked: a leftover backup
    * from an interrupted run aborts before any data is touched, and a
    * failed swap rolls the original back instead of deleting it. */
  def compact(spark: SparkSession, dir: String, targetBytes: Long = 128L * 1024 * 1024): Long = {
    val bytes = dirBytes(dir)
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val tmp = new java.io.File(dir + "__compact_tmp")
    val dest = new java.io.File(dir)
    val back = new java.io.File(dir + "__compact_old")
    if (back.exists())
      throw new IllegalStateException(
        s"leftover backup from an interrupted compaction: $back — recover it manually first")
    spark.read.parquet(dir).repartition(nFiles)
      .write.mode("overwrite").option("compression", "snappy").parquet(tmp.getPath)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    if (!dest.renameTo(back)) {
      rm(tmp)
      throw new java.io.IOException(s"compaction aborted: could not move $dest aside")
    }
    if (!tmp.renameTo(dest)) {
      val restored = back.renameTo(dest) // the original data is the only copy
      rm(tmp)
      throw new java.io.IOException(
        if (restored) s"compaction failed: could not install $tmp; original restored"
        else s"compaction failed: could not install $tmp AND rollback failed — " +
          s"original data is at $back, recover it manually")
    }
    rm(back)
    nFiles.toLong
  }
}
