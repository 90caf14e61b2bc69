package graft

import org.apache.spark.sql.functions._

import graft.etl.Bucketing

class BucketingSpec extends SparkSpec {

  private def Tables = graft.sources.Tables

  test("co-bucketed join and aggregate run with ZERO exchanges; results unchanged") {
    val dir = "/root/testdata/sf0.001"
    val orders = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
    Bucketing.writeBucketed(orders, "b_orders", "o_custkey", 8)
    Bucketing.writeBucketed(
      customer.withColumnRenamed("c_custkey", "o_custkey"), "b_customer", "o_custkey", 8)
    val bo = Bucketing.readBucketed(spark, "b_orders")
    val bc = Bucketing.readBucketed(spark, "b_customer")

    // Force the sort-merge path: a broadcast join would dodge the shuffle
    // for the wrong reason and prove nothing about the layout.
    val joined = bo.hint("merge").join(bc, Seq("o_custkey"))
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")

    // and the result equals the plain (shuffling) formulation
    val expect = orders.join(
        customer.withColumnRenamed("c_custkey", "o_custkey"), Seq("o_custkey"))
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
    assert(joined.except(expect).isEmpty && expect.except(joined).isEmpty)
  }

  test("mismatched bucket counts fall back to a correct (shuffling) join") {
    val dir = "/root/testdata/sf0.001"
    Bucketing.writeBucketed(Tables.orders(spark, dir), "b_orders4", "o_custkey", 4)
    Bucketing.writeBucketed(
      Tables.customer(spark, dir).withColumnRenamed("c_custkey", "o_custkey"),
      "b_customer8", "o_custkey", 8)
    val bo4 = Bucketing.readBucketed(spark, "b_orders4")
    val bc8 = Bucketing.readBucketed(spark, "b_customer8")
    val joined = bo4.hint("merge").join(bc8, Seq("o_custkey"))
    // one side must re-shuffle (or both coalesce) — correctness over layout
    assert(joined.count() === Tables.orders(spark, dir).join(
      Tables.customer(spark, dir).withColumnRenamed("c_custkey", "o_custkey"),
      Seq("o_custkey")).count())
  }
}
