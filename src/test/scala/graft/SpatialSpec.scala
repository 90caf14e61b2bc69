package graft

import org.apache.spark.sql.functions._

import graft.operators.Spatial

class SpatialSpec extends SparkSpec {
  import spark.implicits._

  test("radiusSelfJoin: neighbor-cell pairs found, boundary-inclusive, no duplicates") {
    // r = 60: (1,2) same cell d²=2500; (1,4) cross-cell d²=3481;
    // (2,4) d²=5981 > 3600 excluded; 3 isolated; (5,6) straddle a cell
    // boundary (cells 0 and 1 in x) at d²=4 — only the 3×3 neighbor
    // replication can pair them; (7,8) exactly at d²=r² (inclusive).
    val pts = Seq(
      (1L, 0L, 0L), (2L, 0L, 50L), (3L, 5000L, 5000L), (4L, 59L, 0L),
      (5L, 59L, 900L), (6L, 61L, 900L),
      (7L, 2000L, 300L), (8L, 2060L, 300L)
    ).toDF("id", "x", "y")
    val out = Spatial.radiusSelfJoin(pts, 60)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length === out.distinct.length, "structural dedup failed")
    assert(out.toSet === Set(
      (1L, 2L, 2500L), (1L, 4L, 3481L), (5L, 6L, 4L), (7L, 8L, 3600L)))
  }

  test("radiusSelfJoin: negative coordinates — floor cells keep cross-origin pairs") {
    // (-1, 0) and (1, 0): d² = 4; truncate-toward-zero cells would place
    // both in "cell 0" only by accident of the origin — the real hazard
    // is (-61, 0) vs (-59, 0): truncation puts them BOTH in cell -1/0
    // boundaries wrongly; floor keeps adjacency exact on both sides
    val pts = Seq(
      (1L, -1L, 0L), (2L, 1L, 0L),
      (3L, -61L, 0L), (4L, -59L, 0L),
      (5L, -5000L, -5000L)
    ).toDF("id", "x", "y")
    val got = Spatial.radiusSelfJoin(pts, 60)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // all five in-radius pairs, including the three exactly at d = 60
    // that straddle the origin and two negative cell boundaries — the
    // truncate-toward-zero cell id loses (1,3) and (2,4)
    assert(got === Set(
      (1L, 2L, 4L), (3L, 4L, 4L),
      (1L, 3L, 3600L), (1L, 4L, 3364L), (2L, 4L, 3600L)))
  }

  test("radiusSelfJoin: bucketing is output-invisible vs brute force on a dense cloud") {
    // deterministic cloud dense enough that many cells interact
    val pts = (0L until 200L).map { i =>
      val u = i * 7919 + 13; val v = i * 104729 + 7
      (i, u * u % 1000003 % 300, v * v % 1000003 % 300)
    }.toDF("id", "x", "y")
    val bucketed = Spatial.radiusSelfJoin(pts, 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val a = pts.select(col("id").as("ia"), col("x").as("xa"), col("y").as("ya"))
    val brute = a.crossJoin(pts)
      .filter(col("ia") < col("id") &&
        (col("xa") - col("x")) * (col("xa") - col("x")) +
          (col("ya") - col("y")) * (col("ya") - col("y")) <= 1600L)
      .select(col("ia"), col("id"),
        ((col("xa") - col("x")) * (col("xa") - col("x")) +
          (col("ya") - col("y")) * (col("ya") - col("y"))).as("d2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(brute.nonEmpty, "degenerate fixture: brute force found nothing")
    assert(bucketed === brute)
  }
}
