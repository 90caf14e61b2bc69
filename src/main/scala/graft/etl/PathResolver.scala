package graft.etl

import graft.config.JobSpec

/** Pure path computation mirroring the reference's indexer
  * (`etl/oedi_etl/indexer.py`): partition-prefix construction for the
  * time-series data (`indexer.py:204-207`) and exact metadata file
  * resolution for the three layout versions (`indexer.py:48-91`).
  *
  * Where the reference is defective we implement the documented intent and
  * note the divergence:
  *  - v2 without counties returns None in the reference (`indexer.py:72-77`
  *    falls through) although `README.md:240-248` documents a state-level
  *    v2 layout → we resolve the state-level path.
  *  - wildcard county listing is flagged broken by the authors
  *    (`indexer.py:117`, `README.md:113`) → we express "all counties" by
  *    omitting the county filter and letting partition discovery find them.
  */
object PathResolver {

  /** `baseline` for upgrade 0 else `upgrade%02d` (`indexer.py:64`). */
  def upgradeStr(upgrade: Int): String =
    if (upgrade == 0) "baseline" else f"upgrade$upgrade%02d"

  /** Data partition prefixes, one per (upgrade, state) — the manual
    * partition pruning of `indexer.py:204-207`. */
  def dataPrefixes(base: String, dataPartition: String, job: JobSpec): Seq[String] =
    job.upgrades.map { u =>
      s"$base/${job.release_year}/${job.release_name}/$dataPartition/upgrade=$u/state=${job.state}"
    }

  /** Root of the partitioned data tree for a release — the `basePath` a
    * Spark read uses so `upgrade`/`state` stay partition columns. */
  def dataBasePath(base: String, dataPartition: String, job: JobSpec): String =
    s"$base/${job.release_year}/${job.release_name}/$dataPartition"

  /** Exact metadata file paths per layout version (`indexer.py:48-91`). */
  def metadataPaths(job: JobSpec): Seq[String] = {
    val root = job.metadata_root_dir
    val s = job.state
    job.upgrades.flatMap { u =>
      val us = upgradeStr(u)
      job.relative_metadata_prefix_type match {
        case 1 =>
          Seq(s"$root/by_state/state=$s/parquet/${s}_${us}_metadata_and_annual_results.parquet")
        case 2 =>
          job.counties match {
            case Some(cs) if cs.nonEmpty && cs != Seq("*") =>
              cs.map(c => s"$root/by_state_and_county/full/parquet/state=$s/county=$c/${s}_${c}_$us.parquet")
            case _ =>
              // documented state-level v2 layout (reference defect: returns None)
              Seq(s"$root/by_state/full/parquet/state=$s/${s}_$us.parquet")
          }
        case 3 =>
          job.counties match {
            case Some(cs) if cs.nonEmpty && cs != Seq("*") =>
              cs.map(c => s"$root/by_state_and_county/full/parquet/state=$s/county=$c/${s}_${c}_${us}_agg.parquet")
            case _ =>
              Seq(s"$root/by_state/full/parquet/state=$s/${s}_${us}_agg.parquet")
          }
        case v =>
          throw new IllegalArgumentException(s"unknown relative_metadata_prefix_type: $v")
      }
    }
  }
}
