package graft.etl

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions.{count, lit}

import graft.config.EtlConfig
import graft.operators.HourlyRollup

/** `etl_main` equivalent (`main.py:44-133` minus the process plumbing):
  * per job — partition-pruned read → hourly rollup → partitioned snappy
  * write → metadata bypass → catalog registration — then one tracker
  * summary for the run. The reference's worker pool, queues, crash monitor
  * and backoff are all subsumed by Spark's scheduler (SURVEY.md §2.11).
  */
final case class EtlResult(
    runRoot: String,
    report: RunReport,
    dataTables: Seq[String],
    metadataTables: Seq[String])

object EtlRunner {

  val DataTablePrefix = "oedi_data"
  val MetadataTablePrefix = "oedi_metadata"

  def run(spark: SparkSession, config: EtlConfig): EtlResult = {
    val t0 = System.nanoTime()
    val root = Sink.runRoot(config.settings.output_dir)
    val reports = scala.collection.mutable.ArrayBuffer.empty[JobReport]
    val dataTables = scala.collection.mutable.ArrayBuffer.empty[String]
    val metaTables = scala.collection.mutable.ArrayBuffer.empty[String]

    config.job_specific.zipWithIndex.foreach { case (job, i) =>
      val name = job.jobName(i)
      val data = PartitionedSource.readData(
        spark, config.settings.base_partition, config.settings.data_partition_in_release, job)
      // Listed = files under the job's partition prefixes (the reference's
      // per-prefix listing, indexer.py:204-207). NOT data.inputFiles, which
      // reports the whole relation before partition pruning.
      val listed = PathResolver.dataPrefixes(
        config.settings.base_partition, config.settings.data_partition_in_release, job)
        .map(Tracker.countFiles).sum
      // Row counts ride the write job as observed metrics (SURVEY.md §2.11:
      // the reference's tracker process maps to df.observe) — no extra
      // count() scans over the input or the written output.
      val obsIn = Observation(s"${name}_rows_in")
      val obsOut = Observation(s"${name}_rows_out")
      val observed = data.observe(obsIn, count(lit(1)).as("n"))
      // When the session carries a stats-catalog root, the write ALSO
      // publishes this table's planner statistics (row count + key-KMV +
      // skew sidecar) from the write's own scan — the
      // Profiling.writeWithStats contract riding the ETL flow, so every
      // downstream CostBasedJoin.consultOr site (SavedAnalytics, q19)
      // finds fresh entries with zero extra passes (the skew verify pass
      // reads the just-written, column-pruned output). Entry name =
      // `<registered table>.<key>`; the rollup's join key is the A4
      // contract column `bldg_id_min`.
      val statsRoot = spark.conf.getOption("spark.graft.statsCatalogRoot")
      val rolledBase =
        HourlyRollup(observed, passThrough = Seq("upgrade", "state", "county"))
      // byte metric needs the rolled schema (variable-width cols measured)
      val statsCols = statsRoot.toSeq.flatMap(_ =>
        graft.operators.Profiling.statsObservationColumns("bldg_id_min",
          schema = Some(rolledBase.schema)))
      val rolled = rolledBase.observe(obsOut, count(lit(1)).as("n"), statsCols: _*)
      val dataOut = Sink.writeData(rolled, root, name)
      statsRoot.foreach { sr =>
        val (n, mins, cands, nBytes) =
          graft.operators.Profiling.decodeStatsObservation(obsOut.get)
        graft.operators.Profiling.publishObservedStats(spark,
          s"$sr/${DataTablePrefix}_state_${job.state}.bldg_id_min",
          "bldg_id_min", 64, n, mins, cands,
          spark.read.parquet(dataOut), nBytes)
      }
      val rowsIn = obsIn.get("n").asInstanceOf[Long]
      val rowsOut = obsOut.get("n").asInstanceOf[Long]
      val filesOut = Tracker.countFiles(dataOut)

      val meta = PartitionedSource.readMetadata(spark, job)
      val (metaListed, metaWritten) = meta match {
        case Some(m) =>
          val n = m.inputFiles.length.toLong
          val out = Sink.writeMetadata(m, root, name)
          metaTables += CatalogRegistry.registerMetadata(spark, out, MetadataTablePrefix)
          (n, Tracker.countFiles(out))
        case None => (0L, 0L)
      }
      dataTables += CatalogRegistry.registerData(spark, dataOut, DataTablePrefix, job.state)
      reports += JobReport(name, listed, rowsIn, rowsOut, filesOut, metaListed, metaWritten)
    }

    val report = RunReport((System.nanoTime() - t0) / 1e9, reports.toSeq)
    EtlResult(root, report, dataTables.toSeq, metaTables.toSeq)
  }

  // ---- incremental runs (extension: the reference reprocesses everything
  // on every trigger; a manifest of processed (release, year, state,
  // upgrade) slices lets a re-run touch only new partitions) ----

  def sliceKey(job: graft.config.JobSpec, upgrade: Int): String =
    s"${job.release_name}/${job.release_year}/${job.state}/upgrade=$upgrade"

  def loadManifest(path: String): Set[String] = {
    val f = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(f))
      scala.jdk.CollectionConverters.ListHasAsScala(
        java.nio.file.Files.readAllLines(f)).asScala.filter(_.nonEmpty).toSet
    else Set.empty
  }

  def appendManifest(path: String, keys: Seq[String]): Unit = {
    // toAbsolutePath: a bare relative filename has a null getParent
    val f = java.nio.file.Paths.get(path).toAbsolutePath
    java.nio.file.Files.createDirectories(f.getParent)
    java.nio.file.Files.write(f, keys.mkString("", "\n", "\n").getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
  }

  /** Process only the (job, upgrade) slices not yet in the manifest; record
    * the newly processed slices on success. Returns None when everything is
    * already up to date (no Spark job runs at all). */
  def runIncremental(spark: SparkSession, config: EtlConfig, manifestPath: String): Option[EtlResult] = {
    val done = loadManifest(manifestPath)
    val pending = config.job_specific
      .map(j => j.copy(upgrades = j.upgrades.filterNot(u => done(sliceKey(j, u)))))
      .filter(_.upgrades.nonEmpty)
    if (pending.isEmpty) None
    else {
      val result = run(spark, config.copy(job_specific = pending))
      appendManifest(manifestPath,
        pending.flatMap(j => j.upgrades.map(u => sliceKey(j, u))))
      Some(result)
    }
  }
}
