package graft

import org.apache.spark.sql.functions._

import graft.operators.{Profiling, Ranking}

class RankingSpec extends SparkSpec {
  import spark.implicits._

  test("globalRank equals the naive single-partition window rank") {
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey"), col("o_totalprice"))
    val ranked = Ranking.globalRank(
      orders, Seq(col("o_totalprice").desc, col("o_orderkey")))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val naive = orders.withColumn("rnk", row_number().over(w).cast("long"))
    assert(ranked.except(naive).isEmpty && naive.except(ranked).isEmpty)
    // ranks are a permutation of 1..n
    val n = orders.count()
    assert(ranked.agg(min("rnk"), max("rnk"), countDistinct("rnk")).head() ===
      org.apache.spark.sql.Row(1L, n, n))
  }

  test("globalRank survives more partitions than rows (empty ranges)") {
    val tiny = Seq((1L, 5.0), (2L, 3.0), (3L, 9.0)).toDF("k", "v")
    val out = Ranking.globalRank(tiny, Seq(col("v").desc, col("k")), numPartitions = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out === Map(3L -> 1L, 1L -> 2L, 2L -> 3L))
  }

  test("columnStats: nulls, exact distincts and ranges on a hand fixture") {
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 2.0), (2L, 2.0), (2L, null), (null, 8.0)
    ).toDF("k", "v")
    val out = Profiling.columnStats(df, Seq("k", "v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out("k") === ((1L, 2L, 1.0, 2.0)))
    assert(out("v") === ((1L, 2L, 2.0, 8.0)))
  }

  test("skylineMinMax equals brute-force Pareto dominance, across partitions") {
    // deterministic cloud; small coordinate space forces ties in both axes
    val pts = (0L until 300L).map { i =>
      val u = i * 7919 + 13; val v = i * 104729 + 7
      (u * u % 1000003 % 50, v * v % 1000003 % 40)
    }.toDF("x", "y")
    val sky = Ranking.skylineMinMax(pts, "x", "y", numPartitions = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = pts.collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val brute = rows.filter { case (x, y) =>
      !rows.exists { case (qx, qy) =>
        qx <= x && qy >= y && (qx < x || qy > y) }
    }.toSet
    assert(brute.nonEmpty && sky === brute)
  }

  test("skylineMinMax: equal y at smaller x dominates; single point survives") {
    val pts = Seq((1L, 5L), (2L, 5L), (3L, 9L), (0L, 1L)).toDF("x", "y")
    val sky = Ranking.skylineMinMax(pts, "x", "y", numPartitions = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // (2,5) dominated by (1,5); (1,5) and (3,9) and (0,1) incomparable
    assert(sky === Set((0L, 1L), (1L, 5L), (3L, 9L)))
  }

  private def Tables = graft.sources.Tables
}
