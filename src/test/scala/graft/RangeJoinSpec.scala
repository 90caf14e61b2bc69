package graft

import java.sql.Timestamp

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Int) = new Timestamp(sec * 1000L)

  test("bucketed range join finds exactly the pairs within tolerance") {
    val a = Seq((1L, ts(100)), (2L, ts(500))).toDF("id_a", "ts_a")
    val b = Seq(
      (10L, ts(40)),  // 60s before a1 → inclusive boundary
      (11L, ts(99)),  // 1s before a1
      (12L, ts(161)), // 61s after a1 → out
      (13L, ts(560)), // 60s after a2 → inclusive boundary
      (14L, ts(700))  // out
    ).toDF("id_b", "ts_b")
    val out = RangeJoin(a, b, "ts_a", "ts_b", 60000L)
      .select($"id_a", $"id_b", $"dt_ms")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === Set((1L, 10L, -60000L), (1L, 11L, -1000L), (2L, 13L, 60000L)))
  }

  test("bucket replication equals the brute-force theta join") {
    val a = (1 to 300).map(i => (i.toLong, ts(i * 37 % 5000))).toDF("id_a", "ts_a")
    val b = (1 to 300).map(i => (i.toLong, ts(i * 91 % 5000))).toDF("id_b", "ts_b")
    val bucketed = RangeJoin(a, b, "ts_a", "ts_b", 60000L)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = a.crossJoin(b)
      .filter(org.apache.spark.sql.functions.abs(
        org.apache.spark.sql.functions.unix_millis($"ts_b") -
          org.apache.spark.sql.functions.unix_millis($"ts_a")) <= 60000L)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed === brute)
  }
}
