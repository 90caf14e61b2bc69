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
