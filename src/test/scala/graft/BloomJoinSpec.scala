package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.BloomJoin

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private def fact = spark.read.parquet(sf("lineitem"))
  private def dim(pred: org.apache.spark.sql.Column) =
    spark.read.parquet(sf("part")).filter(pred)

  private def rows(df: DataFrame): Set[(Long, Long)] =
    df.select(col("l_orderkey"), col("p_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("bloom-reduced join ≡ plain join (selective dim)") {
    val d = dim($"p_brand" === "Brand#3")
    val reduced = BloomJoin.bloomReducedJoin(fact, d, "l_partkey", "p_partkey")
    val plain = fact.join(d, $"l_partkey" === $"p_partkey")
    assert(rows(reduced) == rows(plain))
    assert(rows(reduced).nonEmpty, "fixture predicate must keep the join live")
  }

  test("tiny sketch (FP-heavy) is still exact: FPs die in the join") {
    val d = dim($"p_size" === 22)
    val reduced = BloomJoin.bloomReducedJoin(fact, d, "l_partkey", "p_partkey",
      estKeys = 4, numBits = 64) // ~saturated bloom → many FPs pass the filter
    assert(rows(reduced) == rows(fact.join(d, $"l_partkey" === $"p_partkey")))
  }

  test("empty dim → null sketch → every fact row drops (matches empty plain join)") {
    val d = dim($"p_brand" === "no-such-brand")
    assert(BloomJoin.bloomReducedJoin(fact, d, "l_partkey", "p_partkey").count() == 0L)
  }

  test("the might_contain filter runs BELOW the fact-side exchange") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a shuffle join
      val d = dim($"p_brand" === "Brand#3")
      val out = BloomJoin.bloomReducedJoin(fact, d, "l_partkey", "p_partkey")
      out.collect() // finalize AQE
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"), s"no bloom filter in plan:\n$plan")
      // Tree prints top-down: the join node must appear ABOVE (before) the
      // bloom filter, i.e. the filter sits inside a join INPUT subtree —
      // together with the forced shuffle strategy this pins filter-below-
      // exchange (a post-join filter would print above the join).
      val joinIdx = plan.indexOf("Join")
      val bloomIdx = plan.indexOf("might_contain")
      assert(joinIdx >= 0 && bloomIdx > joinIdx,
        s"bloom filter must sit under the join's input, plan:\n$plan")
      assert(plan.contains("Exchange"), "forced non-broadcast join must shuffle")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("query construction triggers zero jobs (sketch is a scalar subquery)") {
    val sc = spark.sparkContext
    val f = fact // parquet schema inference runs jobs — exclude the READS
    val d = dim($"p_brand" === "Brand#3")
    val before = sc.statusTracker.getJobIdsForGroup(null).length
    val composed = BloomJoin.bloomReducedJoin(f, d, "l_partkey", "p_partkey")
      .groupBy($"p_brand").agg(count(lit(1)).as("n"))
    val after = sc.statusTracker.getJobIdsForGroup(null).length
    assert(after == before, "building the bloom-reduced plan must not run jobs")
    assert(composed.columns.toSeq == Seq("p_brand", "n"))
  }
}
