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

  test("intervalJoin: boundary touch, containment, disjoint; each pair exactly once") {
    val l = Seq(
      (1L, ts(0), ts(100)),    // touches r10 at 100 (inclusive), covers r11
      (2L, ts(500), ts(900))   // spans multiple buckets
    ).toDF("id_a", "a_s", "a_e")
    val r = Seq(
      (10L, ts(100), ts(200)), // touch at the boundary → overlap 0
      (11L, ts(20), ts(30)),   // contained in l1
      (12L, ts(101), ts(102)), // just past l1 → no pair with l1
      (13L, ts(899), ts(950))  // overlaps l2 across a bucket edge
    ).toDF("id_b", "b_s", "b_e")
    val out = RangeJoin.intervalJoin(l, r, "a_s", "a_e", "b_s", "b_e", 60000L)
      .select($"id_a", $"id_b", $"overlap_ms").collect()
    assert(out.length === out.map(x => (x.getLong(0), x.getLong(1))).distinct.length,
      "canonical-bucket dedup must emit each pair once")
    val m = out.map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(m === Map((1L, 10L) -> 0L, (1L, 11L) -> 10000L, (2L, 13L) -> 1000L))
  }

  test("intervalJoin with equi-keys equals the brute-force theta join on real orders") {
    import org.apache.spark.sql.functions._
    val o = graft.sources.Tables.orders(spark, "/root/testdata/sf0.001")
    def side(tag: String) = o.select(
      col("o_custkey"),
      col("o_orderkey").as(s"${tag}_k"),
      col("o_orderdate").as(s"${tag}_s"),
      (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as(s"${tag}_e"))
    val fast = RangeJoin.intervalJoin(side("a"), side("b"), "a_s", "a_e", "b_s", "b_e",
        30L * 24 * 3600 * 1000, equiKeys = Seq("o_custkey"))
      .filter(col("a_k") < col("b_k"))
      .select(col("a_k"), col("b_k")).collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val sa = side("a"); val sb = side("b").withColumnRenamed("o_custkey", "ck")
    val brute = sa.join(sb, sa("o_custkey") === sb("ck") &&
        sa("a_s") <= sb("b_e") && sb("b_s") <= sa("a_e") && sa("a_k") < sb("b_k"))
      .select(col("a_k"), col("b_k")).collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(fast === brute && fast.nonEmpty)
  }
}
