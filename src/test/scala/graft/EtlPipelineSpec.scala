package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.config.{EtlConfig, EtlSettings, JobSpec}
import graft.etl._

/** End-to-end pipeline test mirroring the reference's integration test
  * (`etl/tests/test_etl_integration.py`) against the local filesystem:
  * config → partition-pruned read → rollup → partitioned write → catalog →
  * the three saved queries → tracker summary.
  */
class EtlPipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val lake = Files.createTempDirectory("graft_lake").toString
  private lazy val outRoot = Files.createTempDirectory("graft_out").toString

  private def buildSourceTree(): Unit = {
    // Time-series: events sf0.001 reshaped to the reference's data model,
    // written under upgrade=/state= partition dirs (two upgrades, two states
    // so pruning has something to prune).
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("ts").as("timestamp"), col("user_id").as("bldg_id"),
        col("value").as("load"), col("event_type").as("mode"))
    for (u <- Seq(0, 1); s <- Seq("AK", "CA")) {
      events.write.mode("overwrite").parquet(
        s"$lake/2024/test_release/timeseries_individual_buildings/by_state/upgrade=$u/state=$s")
    }
    // Metadata v1: building characteristics with the dotted column names.
    val meta = events.select(col("bldg_id")).distinct()
      .withColumn("in.state", lit("AK"))
      .withColumn("in.county_name", lit("AK, Test Borough"))
      .withColumn("in.comstock_building_type",
        when(col("bldg_id") % 2 === 0, "Hospital").otherwise("Office"))
      .withColumn("in.comstock_building_type_group",
        when(col("bldg_id") % 2 === 0, "Healthcare").otherwise("Commercial"))
    meta.write.mode("overwrite").parquet(
      s"$lake/meta/by_state/state=AK/parquet/AK_baseline_metadata_and_annual_results.parquet")
  }

  test("full ETL run: prune → rollup → partitioned write → catalog → saved queries → tracker") {
    buildSourceTree()
    val cfg = EtlConfig(
      EtlSettings(base_partition = lake, output_dir = outRoot),
      Seq(JobSpec(
        release_name = "test_release", release_year = "2024", state = "AK",
        upgrades = Seq(0), metadata_root_dir = s"$lake/meta",
        relative_metadata_prefix_type = 1)))

    val result = EtlRunner.run(spark, cfg)
    val report = result.report.jobs.head

    // Partition pruning: only upgrade=0/state=AK files were listed (1 of 4
    // slices) — and the pruned scan really only touched those files.
    val allFiles = Tracker.countFiles(s"$lake/2024/test_release")
    assert(report.dataFilesListed > 0 && report.dataFilesListed < allFiles)
    val touched = PartitionedSource.readData(spark, lake, "timeseries_individual_buildings/by_state",
        cfg.job_specific.head)
      .select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(touched.nonEmpty && touched.forall(_.contains("upgrade=0/state=AK")))

    // Output layout: hive partition dirs under the run root.
    val dataOut = s"${result.runRoot}/test_release_2024_ak_job0/data"
    assert(new java.io.File(s"$dataOut/upgrade=0/state=AK").exists())

    // Rollup contract: suffixed aggregates present, hour-floored timestamps.
    val rolled = spark.read.option("basePath", dataOut).parquet(dataOut)
    assert(rolled.columns.contains("bldg_id_min"))
    assert(rolled.columns.contains("load_mean"))
    assert(rolled.filter(minute(col("timestamp")) =!= 0).count() === 0)
    assert(report.dataRowsOut === rolled.count())
    assert(!report.lostOutput)

    // Saved queries through the registry against the registered tables.
    val sqlText = new String(getClass.getResourceAsStream("/graft/saved-queries.sql").readAllBytes(), "UTF-8")
    val reg = QueryRegistry.load(sqlText, Map(
      "metadata_table" -> result.metadataTables.head,
      "data_table" -> result.dataTables.head,
      "state" -> "AK"))
    val total = QueryRegistry.run(spark, reg, "total_buildings").collect().head.getLong(0)
    val expectedBldgs = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select(countDistinct(col("user_id"))).collect().head.getLong(0)
    assert(total === expectedBldgs)

    val byGroup = QueryRegistry.run(spark, reg, "buildings_by_group")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGroup.values.sum === expectedBldgs)
    assert(byGroup.keySet === Set("Healthcare", "Commercial"))

    val top = QueryRegistry.run(spark, reg, "top_buildings_per_group")
    assert(top.count() === expectedBldgs) // < 500 per group, so all survive
    assert(top.filter(col("rn") > 500).count() === 0)

    // Tracker summary: README-shaped JSON, metadata round-trip intact.
    assert(report.metadataFilesListed > 0 && report.metadataFilesWritten > 0)
    assert(result.report.toJson.contains("\"total_time_seconds\""))
    assert(result.report.toJson.contains("\"lost_output\":false"))
  }

  test("ETL writes publish planner stats under a session catalog root; consultOr finds them") {
    buildSourceTree()
    val statsRoot = Files.createTempDirectory("graft_etl_stats").toString
    val out2 = Files.createTempDirectory("graft_out_stats").toString
    spark.conf.set("spark.graft.statsCatalogRoot", statsRoot)
    try {
      val cfg = EtlConfig(
        EtlSettings(base_partition = lake, output_dir = out2),
        Seq(JobSpec(
          release_name = "test_release", release_year = "2024", state = "AK",
          upgrades = Seq(0), metadata_root_dir = s"$lake/meta",
          relative_metadata_prefix_type = 1)))
      val result = EtlRunner.run(spark, cfg)
      // the write's own observation published the entry — zero extra scans
      // beyond the column-pruned skew verify
      val entryName = "oedi_data_state_AK.bldg_id_min"
      val (n, dEst, top) = graft.operators.Profiling.readStatsDriver(
        spark, s"$statsRoot/$entryName", "bldg_id_min")
      assert(n === result.report.jobs.head.dataRowsOut,
        "catalog n_rows must equal the write's observed row count")
      assert(dEst > 0L && top >= 0L)
      // and the engine's consultOr resolves it — the always-on loop closes
      assert(graft.plans.CostBasedJoin.sessionStatsDir(spark, entryName).isDefined)
    } finally spark.conf.unset("spark.graft.statsCatalogRoot")
  }

  test("query-time join on a partition column gets dynamic partition pruning") {
    // The reference's core architectural bet is "prune partitions, then join
    // at query time" (README.md:162, indexer.py:204-207). Static pruning is
    // covered above; this asserts the DYNAMIC case — when the partition
    // filter only arrives through a join against a filtered dimension,
    // Catalyst injects a runtime subquery filter into the scan's
    // PartitionFilters, so non-selected state dirs are skipped at execution
    // time even though no literal state predicate exists in the query.
    buildSourceTree()
    val base = s"$lake/2024/test_release/timeseries_individual_buildings/by_state"
    val fact = spark.read.option("basePath", base).parquet(base)
    // The dim must be a real table scan: a literal Seq would be
    // constant-folded (Filter collapses into the LocalRelation) and DPP
    // requires a selective Filter node on the dimension side.
    val dimPath = s"$lake/state_dim.parquet"
    Seq(("AK", "arctic"), ("CA", "temperate")).toDF("state", "climate")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val joined = fact.join(dim, Seq("state")).where($"climate" === "arctic")
      .groupBy($"state").agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamicpruning subquery in the scan's PartitionFilters:\n$plan")
    assert(joined.collect().map(_.getString(0)).toSeq === Seq("AK"))
  }
}
