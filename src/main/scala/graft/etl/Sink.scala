package graft.etl

import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

import org.apache.spark.sql.DataFrame

/** Output layout of the reference (SURVEY.md §2.1 S7/S8): a run-stamped
  * root (`main.py:47-49` — `{output_dir}/{YYYY-MM-DD-HH-MM-SS}/`), a
  * per-job subdirectory (`worker.py:207`), Hive partition dirs preserved
  * (`worker.py:201-210`), snappy parquet (`worker.py:184,196`).
  *
  * Unlike the reference (one output file per input file, one process each),
  * the partitioned write shuffles nothing: each task writes its split into
  * the right `upgrade=/state=` directory via dynamic partition overwrite.
  */
object Sink {

  private val stampFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd-HH-mm-ss").withZone(ZoneOffset.UTC)

  def runRoot(outputDir: String, at: Instant = Instant.now()): String =
    s"$outputDir/${stampFmt.format(at)}"

  /** Write the transformed data partitioned by the partition columns that
    * survived the read (upgrade/state[/county]). */
  def writeData(df: DataFrame, runRoot: String, jobName: String): String = {
    val out = s"$runRoot/$jobName/data"
    val partCols = Seq("upgrade", "state", "county").filter(df.columns.contains)
    df.write
      .mode("overwrite")
      .option("compression", "snappy")
      .partitionBy(partCols: _*)
      .parquet(out)
    out
  }

  /** Bucketed managed table: pre-shuffles data into `nBuckets` by the join
    * key at write time so later equi-joins between tables bucketed the same
    * way read co-located and skip the shuffle entirely (verified in
    * `BucketingSpec`: the join plan contains no Exchange). The 100 TB lever
    * for repeated fact-to-fact joins the reference's query layer re-shuffles
    * every time. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, nBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Small-files control — the 100 TB writer discipline [[writeData]]
    * omits: a dynamic-partition write emits one file per (task ×
    * partition-value) pair, so 1000 tasks × 3000 counties = 3M files of a
    * few KB each, and every later scan pays a file-open per file.
    * Repartitioning ON the partition columns first routes each
    * partition-value to exactly `writeTasksPerPartition` tasks (a
    * deterministic content-hash salt spreads hot partitions across them),
    * and `maxRecordsPerFile` re-splits any file that would exceed the
    * target row count — together: files-per-dir is bounded below by task
    * count and above by data size, never by the accident of input split
    * layout. */
  def writeDataSized(
      df: DataFrame,
      runRoot: String,
      jobName: String,
      partCols: Seq[String] = Seq("upgrade", "state", "county"),
      maxRecordsPerFile: Long = 5000000L,
      writeTasksPerPartition: Int = 1): String = {
    import org.apache.spark.sql.functions._
    require(writeTasksPerPartition > 0)
    val out = s"$runRoot/$jobName/data"
    val pc = partCols.filter(df.columns.contains)
    val dataCols = df.columns.filterNot(pc.contains).toSeq
    df
      .withColumn("__wsalt",
        pmod(hash(dataCols.map(col): _*), lit(writeTasksPerPartition)))
      .repartition((pc.map(col) :+ col("__wsalt")): _*)
      .drop("__wsalt")
      .write
      .mode("overwrite")
      .option("compression", "snappy")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(pc: _*)
      .parquet(out)
    out
  }

  /** Parquet bloom filters at write time — the point-lookup skipping tier
    * BELOW zone maps: min/max stats prune range predicates but are
    * useless for needle-in-haystack id lookups on unclustered columns
    * (every row group's [min, max] spans the id space); a per-column
    * bloom filter in the column chunk metadata rejects non-member row
    * groups before any data page is read. The natural companion to
    * [[Erasure.eraseKeys]]' "which files hold these few keys" scan and
    * any entity-id point query. Costs ~bits-per-ndv of file size on the
    * filtered columns only. */
  def writeWithBloom(df: DataFrame, path: String, bloomCols: Seq[String],
      expectedNdv: Long = 100000L): Unit = {
    require(bloomCols.nonEmpty)
    val base = df.write.mode("overwrite").option("compression", "snappy")
    bloomCols.foldLeft(base) { (w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", expectedNdv.toString)
    }.parquet(path)
  }

  /** Write-audit-publish — the ingest discipline that keeps a bad batch
    * out of the readable table entirely: write the frame under a hidden
    * `.staging-<stamp>` dir, run the [[graft.operators.Validation]]
    * constraint suite against the WRITTEN files (auditing the bytes
    * readers would actually see — a re-read also catches write
    * corruption, not just bad input), and only on all-pass rename the
    * staging dir to a published [[TimeTravel]]-visible run. On any
    * failing constraint the staging dir is LEFT IN PLACE as the
    * quarantined evidence and the call throws, naming the failed checks —
    * readers of `latest` never observe the bad batch.
    *
    * Same atomic-rename publish contract as [[graft.etl.Layout.optimize]]
    * (TimeTravel.listRuns only matches final stamp names). Returns the
    * published run stamp. */
  def writeAudited(df: DataFrame, outputDir: String, jobName: String,
      checks: Seq[graft.operators.Validation.Check],
      refIntegrity: Seq[(String, DataFrame, String)] = Nil,
      at: Instant = Instant.now()): String = {
    val spark = df.sparkSession
    val runRootPath = runRoot(outputDir, at)
    val stamp = runRootPath.substring(outputDir.length + 1)
    val staging = new java.io.File(s"$outputDir/.staging-$stamp")
    val dest = new java.io.File(runRootPath)
    require(!dest.exists(), s"run $stamp already exists — runs are immutable")
    df.write.mode("overwrite").option("compression", "snappy")
      .parquet(s"${staging.getPath}/$jobName/data")
    val verdicts = graft.operators.Validation
      .suite(spark.read.parquet(s"${staging.getPath}/$jobName/data"),
        checks, refIntegrity)
      .collect() // constraint-count-sized
    val failed = verdicts.filter(_.getLong(2) == 0L).map(_.getString(0))
    if (failed.nonEmpty)
      throw new IllegalStateException(
        s"write-audit-publish REFUSED for $jobName: failed checks " +
          failed.mkString("[", ", ", "]") +
          s" — quarantined batch left at ${staging.getPath} for inspection")
    if (!staging.renameTo(dest))
      throw new java.io.IOException(
        s"publish failed: could not rename $staging to $dest")
    stamp
  }

  /** Partition-scoped backfill — recompute a slice of a partitioned table
    * without touching the rest: `mode(overwrite)` with DYNAMIC partition
    * overwrite replaces exactly the partition directories present in `df`
    * and leaves every other directory's files byte-identical (STATIC
    * overwrite — the default — would wipe the whole table first, the
    * classic backfill footgun). The idempotent "re-run day X" operation a
    * scheduled pipeline needs: at 100 TB a one-day backfill rewrites one
    * day's directories, not the table.
    *
    * The overwrite mode rides a per-write option, not a session conf, so
    * concurrent writers with different intents can't race on a global
    * setting. NOT safe under concurrent readers of the SAME partitions
    * being replaced (files swap underneath them) — run under the same
    * maintenance discipline as [[graft.etl.Compaction]], or publish a new
    * [[TimeTravel]] run for reader-safe replacement. */
  def backfillPartitions(df: DataFrame, dataDir: String,
      partCols: Seq[String]): Unit = {
    val pc = partCols.filter(df.columns.contains)
    require(pc.nonEmpty, s"backfill needs at least one partition column in ${df.columns.toSeq}")
    df.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .option("compression", "snappy")
      .partitionBy(pc: _*)
      .parquet(dataDir)
  }

  /** Metadata bypass (S6): re-encode through the parquet reader/writer.
    * The reference copies bytes verbatim (`worker.py:171-173,191-192`); a
    * re-encode keeps identical rows while normalizing encodings. For the
    * literal byte-for-byte form see [[copyMetadataRaw]]. */
  def writeMetadata(df: DataFrame, runRoot: String, jobName: String): String = {
    val out = s"$runRoot/$jobName/metadata"
    df.write.mode("overwrite").option("compression", "snappy").parquet(out)
    out
  }

  /** Literal byte-for-byte metadata bypass — the reference's exact behavior
    * (`worker.py:171-173`): source files land under the run root unchanged
    * (same checksums), no parquet decode/encode at all. */
  def copyMetadataRaw(srcPaths: Seq[String], runRoot: String, jobName: String): String = {
    val outDir = java.nio.file.Paths.get(s"$runRoot/$jobName/metadata_raw")
    java.nio.file.Files.createDirectories(outDir)
    srcPaths.foreach { p =>
      val src = java.nio.file.Paths.get(p)
      def copy(s: java.nio.file.Path, d: java.nio.file.Path): Unit =
        if (java.nio.file.Files.isDirectory(s)) {
          java.nio.file.Files.createDirectories(d)
          // Files.list leaks a directory handle until closed — deep/wide
          // trees would exhaust file descriptors without the try/finally
          val st = java.nio.file.Files.list(s)
          try st.forEach(c => copy(c, d.resolve(c.getFileName)))
          finally st.close()
        } else
          java.nio.file.Files.copy(s, d,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      copy(src, outDir.resolve(src.getFileName))
    }
    outDir.toString
  }
}
