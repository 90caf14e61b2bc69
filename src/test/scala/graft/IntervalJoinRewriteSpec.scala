package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.plans.IntervalJoinRewrite

class IntervalJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Int) = new Timestamp(sec * 1000L)

  private def withRule[T](body: => T): T = {
    spark.experimental.extraOptimizations = Seq(IntervalJoinRewrite)
    try body
    finally spark.experimental.extraOptimizations = Nil
  }

  private val l = Seq(
    (1L, ts(0), ts(100)),
    (2L, ts(500), ts(900)),
    (3L, ts(950), ts(940)) // degenerate: end < start
  ).toDF("id_a", "a_s", "a_e")
  private val r = Seq(
    (10L, ts(100), ts(200)),
    (11L, ts(20), ts(30)),
    (12L, ts(101), ts(102)),
    (13L, ts(899), ts(950)),
    (14L, ts(930), ts(960)) // overlaps the degenerate row's [950, 940]? 950<=960 && 930<=940 → yes
  ).toDF("id_b", "b_s", "b_e")

  private def theta = l.join(r, col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))

  test("overlap theta join is rewritten to a hash join with identical results") {
    val plain = theta.collect().map(_.toSeq).toSet // nested-loop ground truth
    withRule {
      val df = theta
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
      assert(p.contains("Generate explode"), p) // the bucket replication
      assert(df.collect().map(_.toSeq).toSet === plain)
      assert(df.count() === plain.size, "canonical-bucket dedup must emit each pair once")
    }
  }

  test("degenerate end<start intervals keep exact theta semantics through the rewrite") {
    // row 3 [950, 940] matches 14 [930, 960] under the raw condition;
    // clamped covers must not lose it
    val plain = theta.filter(col("id_a") === 3L).collect().map(_.toSeq).toSet
    assert(plain.nonEmpty, "fixture must exercise the degenerate row")
    withRule {
      assert(theta.filter(col("id_a") === 3L).collect().map(_.toSeq).toSet === plain)
    }
  }

  test("strict < comparisons and reversed >= forms are recognized") {
    val plain = l.join(r, col("a_s") < col("b_e") && col("b_e") >= col("a_s") &&
      col("a_e") >= col("b_s")).collect().map(_.toSeq).toSet
    withRule {
      val df = l.join(r, col("a_s") < col("b_e") && col("b_e") >= col("a_s") &&
        col("a_e") >= col("b_s"))
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
      assert(df.collect().map(_.toSeq).toSet === plain)
    }
  }

  test("a join that already has an equi-key is left alone") {
    val lk = l.withColumn("k", col("id_a") % 2)
    val rk = r.withColumn("k2", col("id_b") % 2)
    withRule {
      val df = lk.join(rk, col("k") === col("k2") &&
        col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Generate explode"), p) // rule must not fire
    }
  }

  test("rewrite ≡ nested loop on real orders at fixture scale") {
    val o = graft.sources.Tables.orders(spark, "/root/testdata/sf0.001")
      .filter(col("o_totalprice") > 400000)
    val a = o.select(col("o_orderkey").as("ak"), col("o_orderdate").as("as_"),
      (col("o_orderdate") + expr("INTERVAL 3 DAYS")).as("ae"))
    val b = o.select(col("o_orderkey").as("bk"), col("o_orderdate").as("bs"),
      (col("o_orderdate") + expr("INTERVAL 3 DAYS")).as("be"))
    def q = a.join(b, col("as_") <= col("be") && col("bs") <= col("ae") &&
      col("ak") < col("bk")).select(col("ak"), col("bk"))
    val plain = q.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    withRule {
      val got = q.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(got === plain && got.nonEmpty)
    }
  }
}
