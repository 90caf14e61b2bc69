package graft

import java.sql.Timestamp

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(min * 60000L)

  test("as-of join picks the latest right row at or before each left row") {
    val signups = Seq(
      (100L, 1L, ts(10), 1.0),
      (101L, 1L, ts(20), 2.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val purchases = Seq(
      (200L, 1L, ts(5)),  // before any signup → null
      (201L, 1L, ts(15)), // after first → v=1
      (202L, 1L, ts(20)), // equality is inclusive → v=2
      (203L, 1L, ts(30)), // after second → v=2
      (204L, 2L, ts(15))  // other user, no signups → null
    ).toDF("event_id", "user_id", "ts")

    val out = AsOfJoin(purchases, signups, "user_id", "ts", "ts", Seq("ts", "value"), "event_id")
    assert(out.columns.toSeq === Seq("event_id", "user_id", "ts", "ts_asof", "value_asof"))
    val byId = out.collect().map(r => r.getLong(0) ->
      (Option(r.get(3)).map(_.toString), Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    assert(byId(200L) === ((None, None)))
    assert(byId(201L)._2 === Some(1.0))
    assert(byId(202L)._2 === Some(2.0))
    assert(byId(203L)._2 === Some(2.0))
    assert(byId(204L) === ((None, None)))
    assert(out.count() === 5) // left-join semantics: every purchase survives
  }

  test("a matched right row's NULL value is kept, not replaced by an older value") {
    val signups = Seq(
      (100L, 1L, ts(10), Some(1.0)),
      (101L, 1L, ts(20), None) // latest match has NULL value
    ).toDF("event_id", "user_id", "ts", "value")
    val purchases = Seq((200L, 1L, ts(30))).toDF("event_id", "user_id", "ts")
    val out = AsOfJoin(purchases, signups, "user_id", "ts", "ts", Seq("ts", "value"), "event_id")
      .collect().head
    assert(out.getAs[Timestamp]("ts_asof") === ts(20)) // the ts=20 row matched...
    assert(out.isNullAt(out.fieldIndex("value_asof")))  // ...and its NULL survives
  }

  test("NULL join keys never match (SQL equality semantics)") {
    val signups = Seq(
      (100L, Option.empty[Long], ts(10), 5.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val purchases = Seq(
      (200L, Option.empty[Long], ts(20)),
      (201L, Some(1L), ts(20))
    ).toDF("event_id", "user_id", "ts")
    val out = AsOfJoin(purchases, signups, "user_id", "ts", "ts", Seq("value"), "event_id")
      .collect().map(r => r.getLong(0) -> r.isNullAt(r.fieldIndex("value_asof"))).toMap
    assert(out(200L)) // null key left row: no match
    assert(out(201L)) // no right rows for key 1
    val native = AsOfJoin.native(purchases, signups, "user_id", "ts", "ts", Seq("value"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(r.fieldIndex("value_asof"))).toMap
    assert(native === out)
  }

  test("NULL timestamps never match on either side (oracle predicate semantics)") {
    val signups = Seq(
      (100L, 1L, Option.empty[Timestamp], 5.0), // null right ts: never matchable
      (101L, 2L, Some(ts(10)), 7.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val purchases = Seq(
      (200L, 1L, Some(ts(20))),
      (201L, 2L, Option.empty[Timestamp]) // null left ts: matches nothing
    ).toDF("event_id", "user_id", "ts")
    val composed = AsOfJoin(purchases, signups, "user_id", "ts", "ts", Seq("value"), "event_id")
      .collect().map(r => r.getLong(0) -> r.isNullAt(r.fieldIndex("value_asof"))).toMap
    assert(composed === Map(200L -> true, 201L -> true))
    val native = AsOfJoin.native(purchases, signups.drop("event_id"), "user_id", "ts", "ts", Seq("value"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(r.fieldIndex("value_asof"))).toMap
    assert(native === composed)
  }

  test("native physical operator matches the window composition") {
    val e = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = e.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val signups = e.filter($"event_type" === "signup")
      .select($"event_id", $"user_id", $"ts", $"value")

    val composed = graft.operators.AsOfJoin(
      purchases, signups, "user_id", "ts", "ts", Seq("ts", "value"), "event_id")
      .select($"event_id", $"ts_asof", $"value_asof")
    val native = graft.operators.AsOfJoin.native(
      purchases, signups.drop("event_id"), "user_id", "ts", "ts", Seq("ts", "value"))
      .select($"event_id", $"ts_asof", $"value_asof")

    assert(native.count() === purchases.count())
    assert(native.except(composed).count() === 0)
    assert(composed.except(native).count() === 0)
  }

  test("AsOfJoinExec itself skips NULL-key/NULL-ts right rows (no pre-filter)") {
    // Drives AsOfJoinPlan directly — bypassing AsOfJoin.native's defensive
    // right-side filter — so the exec's own advanceRight() null handling is
    // what's under test. Nulls-first sort puts these rows at the head of
    // the partition; an exec that trusted the caller would match them.
    import org.apache.spark.sql.graftbridge.DatasetBridge
    AsOfJoin.registerStrategy(spark)
    val left = Seq((200L, 1L, Some(ts(20)))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (Option.empty[Long], Some(ts(5)), Some(99.0)), // null key, would sort first
      (Some(1L), Option.empty[Timestamp], Some(88.0)), // null ts, same key as left
      (Some(1L), Some(ts(10)), Option.empty[Double]) // legit match with null value
    ).toDF("user_id", "ts", "value")
    val lPlan = DatasetBridge.logicalPlan(left)
    val rPlan = DatasetBridge.logicalPlan(right)
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, name: String) =
      plan.output.find(_.name == name).get
    val out = DatasetBridge.ofRows(spark, graft.plans.AsOfJoinPlan(
      lPlan, rPlan,
      attr(lPlan, "user_id"), attr(rPlan, "user_id"),
      attr(lPlan, "ts"), attr(rPlan, "ts"),
      Seq("ts", "value").map(attr(rPlan, _)))).collect()
    assert(out.length === 1)
    val row = out.head
    // matched the ts=10 row (not the null-key 99.0 or null-ts 88.0 rows)...
    assert(row.getAs[Timestamp]("ts_asof") === ts(10))
    // ...whose legitimate NULL value survives
    assert(row.isNullAt(row.fieldIndex("value_asof")))
  }

  test("native operator plans as AsOfJoinExec with one exchange per side") {
    val e = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val l = e.filter($"event_type" === "purchase").select($"event_id", $"user_id", $"ts")
    val r = e.filter($"event_type" === "signup").select($"user_id", $"ts", $"value")
    val plan = graft.operators.AsOfJoin.native(l, r, "user_id", "ts", "ts", Seq("value"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 2)
  }
}
