package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config.JobSpec
import graft.etl.PathResolver

class PathResolverSpec extends AnyFunSuite {

  private val base = JobSpec(
    release_name = "comstock_amy2018_release_1",
    release_year = "2024",
    state = "AK",
    metadata_root_dir = "/lake/metadata")

  test("upgradeStr: baseline for 0, zero-padded otherwise (indexer.py:64)") {
    assert(PathResolver.upgradeStr(0) === "baseline")
    assert(PathResolver.upgradeStr(1) === "upgrade01")
    assert(PathResolver.upgradeStr(12) === "upgrade12")
  }

  test("data prefixes per (upgrade, state) (indexer.py:204-207)") {
    val p = PathResolver.dataPrefixes(
      "/lake", "timeseries_individual_buildings/by_state", base.copy(upgrades = Seq(0, 2)))
    assert(p === Seq(
      "/lake/2024/comstock_amy2018_release_1/timeseries_individual_buildings/by_state/upgrade=0/state=AK",
      "/lake/2024/comstock_amy2018_release_1/timeseries_individual_buildings/by_state/upgrade=2/state=AK"))
  }

  test("v1 metadata: by_state metadata_and_annual_results (indexer.py:48-66)") {
    val p = PathResolver.metadataPaths(base.copy(relative_metadata_prefix_type = 1, upgrades = Seq(0, 3)))
    assert(p === Seq(
      "/lake/metadata/by_state/state=AK/parquet/AK_baseline_metadata_and_annual_results.parquet",
      "/lake/metadata/by_state/state=AK/parquet/AK_upgrade03_metadata_and_annual_results.parquet"))
  }

  test("v2 metadata with counties: per-county files (indexer.py:72-77)") {
    val p = PathResolver.metadataPaths(base.copy(
      relative_metadata_prefix_type = 2, counties = Some(Seq("G0200130", "G0200160"))))
    assert(p === Seq(
      "/lake/metadata/by_state_and_county/full/parquet/state=AK/county=G0200130/AK_G0200130_baseline.parquet",
      "/lake/metadata/by_state_and_county/full/parquet/state=AK/county=G0200160/AK_G0200160_baseline.parquet"))
  }

  test("v2 without counties resolves the documented state-level layout (reference defect fixed)") {
    val p = PathResolver.metadataPaths(base.copy(relative_metadata_prefix_type = 2))
    assert(p === Seq("/lake/metadata/by_state/full/parquet/state=AK/AK_baseline.parquet"))
  }

  test("v3 metadata: pre-aggregated _agg files (indexer.py:80-87)") {
    assert(PathResolver.metadataPaths(base.copy(relative_metadata_prefix_type = 3)) ===
      Seq("/lake/metadata/by_state/full/parquet/state=AK/AK_baseline_agg.parquet"))
    assert(PathResolver.metadataPaths(base.copy(
      relative_metadata_prefix_type = 3, counties = Some(Seq("G0200130")))) ===
      Seq("/lake/metadata/by_state_and_county/full/parquet/state=AK/county=G0200130/AK_G0200130_baseline_agg.parquet"))
  }

  test("unknown version throws") {
    intercept[IllegalArgumentException] {
      PathResolver.metadataPaths(base.copy(relative_metadata_prefix_type = 9))
    }
  }
}
