package graft.config

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule

/** The reference's `etl_config` job model (shapes from
  * `config.sample.json:14-55` and `etl/oedi_etl/main.py:76-102`): global
  * settings plus a `job_specific` array; each job selects one
  * (release, year, state) slice with a list of upgrades and optional
  * counties, and names where its metadata lives and which layout version
  * (v1/v2/v3, `indexer.py:48-91`) to resolve.
  */
final case class JobSpec(
    release_name: String,
    release_year: String,
    state: String,
    upgrades: Seq[Int] = Seq(0),
    counties: Option[Seq[String]] = None,
    metadata_root_dir: String = "",
    // 1 = by_state metadata+annual file, 2 = by_state_and_county, 3 = pre-aggregated (_agg)
    relative_metadata_prefix_type: Int = 1) {

  /** Job name template from `utils.py:73-95`:
    * `{release}_{year}_{state}_job{i}` (index appended by the runner). */
  def jobName(index: Int): String =
    s"${release_name}_${release_year}_${state}_job$index".toLowerCase
}

final case class EtlSettings(
    base_partition: String = "",
    data_partition_in_release: String = "timeseries_individual_buildings/by_state",
    output_dir: String = "")

final case class EtlConfig(
    settings: EtlSettings = EtlSettings(),
    job_specific: Seq[JobSpec] = Seq.empty)

object EtlConfig {
  private val mapper = new ObjectMapper()
    .registerModule(DefaultScalaModule)
    .configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)

  def fromJson(json: String): EtlConfig = mapper.readValue(json, classOf[EtlConfig])

  def fromFile(path: String): EtlConfig =
    fromJson(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))
}
