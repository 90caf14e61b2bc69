package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config.EtlConfig
import graft.etl.QueryRegistry

class QueryRegistrySpec extends AnyFunSuite {

  private val text =
    """-- a leading comment
      |-- label: q_one
      |-- description: first query
      |SELECT * FROM ${db}.${t};
      |
      |-- label: q_two
      |SELECT 1;
      |""".stripMargin

  test("parses label/description blocks (stack.ts:450-466 semantics)") {
    val qs = QueryRegistry.parse(text)
    assert(qs.map(_.label) === Seq("q_one", "q_two"))
    assert(qs.head.description === "first query")
    assert(qs.head.sql === "SELECT * FROM ${db}.${t}")
    assert(qs(1).sql === "SELECT 1")
  }

  test("substitutes placeholders and collapses '_ +' (stack.ts:478-490)") {
    val s = QueryRegistry.substitute("SELECT * FROM ${p}_ state_ak", Map("p" -> "data"))
    assert(s === "SELECT * FROM data_state_ak")
  }

  test("load binds table names per label") {
    val reg = QueryRegistry.load(text, Map("db" -> "cat", "t" -> "tbl"))
    assert(reg("q_one").sql === "SELECT * FROM cat.tbl")
  }

  test("EtlConfig parses the reference's job model") {
    val cfg = EtlConfig.fromJson(
      """{"settings": {"base_partition": "/lake", "output_dir": "/out", "extra_unknown": 1},
        |  "job_specific": [{"release_name": "r1", "release_year": "2024", "state": "AK",
        |                    "upgrades": [0, 2], "relative_metadata_prefix_type": 2,
        |                    "counties": ["G0200130"], "metadata_root_dir": "/lake/meta"}]}""".stripMargin)
    assert(cfg.settings.base_partition === "/lake")
    val job = cfg.job_specific.head
    assert(job.upgrades === Seq(0, 2))
    assert(job.counties === Some(Seq("G0200130")))
    assert(job.jobName(0) === "r1_2024_ak_job0")
  }
}
