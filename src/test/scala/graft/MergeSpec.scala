package graft

import org.apache.spark.sql.functions._

import graft.operators.Merge

class MergeSpec extends SparkSpec {
  import spark.implicits._

  test("upsert: update, insert, delete, delete-absent, untouched — all four paths") {
    val base = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
    ).toDF("k", "name", "v")
    val changes = Seq(
      (2L, "U", "b2", 22.0), // update existing
      (4L, "U", "d", 40.0),  // insert new key
      (3L, "D", "", 0.0),    // delete existing
      (9L, "D", "", 0.0)     // delete absent key → no-op
    ).toDF("k", "op", "name", "v")
    val out = Merge.upsert(base, changes, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(out === Set((1L, "a", 10.0), (2L, "b2", 22.0), (4L, "d", 40.0)))
  }

  test("upsert preserves base column order and survives a composite key") {
    val base = Seq((1L, "x", 1.0, "r1"), (1L, "y", 2.0, "r2"))
      .toDF("k1", "k2", "v", "tag")
    val changes = Seq((1L, "y", "U", 9.0, "r2u"), (2L, "z", "U", 3.0, "r3"))
      .toDF("k1", "k2", "op", "v", "tag")
    val out = Merge.upsert(base, changes, Seq("k1", "k2"))
    assert(out.columns.toSeq === Seq("k1", "k2", "v", "tag"))
    assert(out.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3))).toSet ===
      Set((1L, "x", 1.0, "r1"), (1L, "y", 9.0, "r2u"), (2L, "z", 3.0, "r3")))
  }

  test("latestPerKey: highest version wins; U beats D on a version tie") {
    val log = Seq(
      (1L, 1L, "U", 10.0), (1L, 3L, "D", 0.0), (1L, 2L, "U", 12.0), // v3 delete wins
      (2L, 1L, "D", 0.0), (2L, 1L, "U", 5.0)                        // tie → U wins
    ).toDF("k", "version", "op", "v")
    val out = Merge.latestPerKey(log, Seq("k"), "version")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSet
    assert(out === Set((1L, 3L, "D", 0.0), (2L, 1L, "U", 5.0)))
    // composing the two: the collapsed log applies cleanly
    val base = Seq((1L, 1.0), (3L, 3.0)).toDF("k", "v")
    val applied = Merge.upsert(
      base,
      Merge.latestPerKey(log, Seq("k"), "version").select(col("k"), col("op"), col("v")),
      Seq("k"))
    assert(applied.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet ===
      Set((2L, 5.0), (3L, 3.0))) // key 1 deleted, key 2 inserted, key 3 untouched
  }

  test("streaming CDC apply: foreachBatch + upsert maintains a snapshot across micro-batches") {
    import java.nio.file.Files
    import org.apache.spark.sql.types._
    val srcDir = Files.createTempDirectory("graft_cdc_src").toString
    val snapDir = Files.createTempDirectory("graft_cdc_snap").toString + "/snap"
    // initial snapshot
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "name", "v")
      .write.parquet(snapDir)
    // batch 1 of changes lands before the stream starts
    Seq((2L, "U", "b2", 22.0), (3L, "U", "c", 30.0)).toDF("k", "op", "name", "v")
      .coalesce(1).write.mode("append").parquet(srcDir)
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("op", StringType),
      StructField("name", StringType), StructField("v", DoubleType)))
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // read-modify-replace of the snapshot: the batch DF must be applied
        // with MERGE semantics against whatever the last batch left behind
        val cur = batch.sparkSession.read.parquet(snapDir)
        val next = Merge.upsert(cur, batch, Seq("k")).collect() // tiny fixture
        batch.sparkSession.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](java.util.Arrays.asList(next: _*)),
          cur.schema).write.mode("overwrite").parquet(snapDir)
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      // batch 2: delete key 1, update key 3
      Seq((1L, "D", "", 0.0), (3L, "U", "c2", 33.0)).toDF("k", "op", "name", "v")
        .coalesce(1).write.mode("append").parquet(srcDir)
      q.processAllAvailable()
    } finally q.stop()
    val fin = spark.read.parquet(snapDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(fin === Set((2L, "b2", 22.0), (3L, "c2", 33.0)))
  }

  test("upsert fails loudly on an out-of-contract op (null or unknown) instead of emitting phantom rows") {
    val base = Seq((1L, 1.0)).toDF("k", "v")
    val badNull = Seq[(java.lang.Long, String, java.lang.Double)]((5L, null, 1.0))
      .toDF("k", "op", "v")
    val eNull = intercept[Exception](Merge.upsert(base, badNull, Seq("k")).collect())
    assert(eNull.getMessage.contains("op must be 'U' or 'D'") ||
      Option(eNull.getCause).exists(_.getMessage.contains("op must be 'U' or 'D'")))
    val badVal = Seq((5L, "X", 1.0)).toDF("k", "op", "v")
    val eVal = intercept[Exception](Merge.upsert(base, badVal, Seq("k")).collect())
    assert(eVal.getMessage.contains("op must be 'U' or 'D'") ||
      Option(eVal.getCause).exists(_.getMessage.contains("op must be 'U' or 'D'")))
  }

  test("upsert is deterministic and key-unique when the change set is key-unique") {
    val base = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey"), col("o_totalprice"))
    val ch = base.filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey"), lit("U").as("op"),
        (col("o_totalprice") + 1.0).as("o_totalprice"))
    val out = Merge.upsert(base, ch, Seq("o_orderkey")).cache()
    assert(out.groupBy("o_orderkey").count().filter(col("count") > 1).isEmpty)
    assert(out.except(Merge.upsert(base, ch, Seq("o_orderkey"))).isEmpty)
    out.unpersist()
  }

  test("snapshotDiff: I/D/U classification, N dropped, null-safe payload compare") {
    val prev = Seq(
      (1L, Some(10.0), "a"), // unchanged → dropped
      (2L, Some(20.0), "b"), // value changes → U
      (3L, None, "c"),       // null == null → unchanged → dropped
      (4L, Some(40.0), "d")  // only in prev → D
    ).toDF("k", "v", "tag")
    val next = Seq(
      (1L, Some(10.0), "a"),
      (2L, Some(21.0), "b"),
      (3L, None, "c"),
      (5L, Some(50.0), "e")  // only in next → I
    ).toDF("k", "v", "tag")
    val out = Merge.snapshotDiff(prev, next, Seq("k"))
    assert(out.columns.toSeq ===
      Seq("k", "change", "old_v", "new_v", "old_tag", "new_tag"))
    val m = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m === Map(2L -> "U", 4L -> "D", 5L -> "I"))
  }

  test("snapshotDiff ∘ upsert round-trip: applying the diff to prev yields next") {
    val prev = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    val next = prev
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")))
      .filter(col("o_orderkey") % 7 =!= 0) // deletions
      .unionByName(prev.filter(col("o_orderkey") % 7 === 0) // re-keyed inserts
        .select((col("o_orderkey") + 1000000L).as("o_orderkey"),
          col("o_totalprice"), col("o_orderstatus")))
    val diff = Merge.snapshotDiff(prev, next, Seq("o_orderkey"))
    // a diff row becomes a change row: D stays D, I/U are upserts with the
    // NEW payload
    val changes = diff.select(col("o_orderkey"),
      when(col("change") === "D", "D").otherwise("U").as("op"),
      col("new_o_totalprice").as("o_totalprice"),
      col("new_o_orderstatus").as("o_orderstatus"))
    val rebuilt = Merge.upsert(prev, changes, Seq("o_orderkey"))
    assert(rebuilt.except(next).isEmpty && next.except(rebuilt).isEmpty)
  }

  test("cdcCompact: net rules per class; applying the compacted segment ≡ replaying the raw log") {
    // base keys 10, 20, 30; log covers every net class incl. a transient
    // key and a delete-then-reinsert
    val cdc = Seq(
      (40L, 1L, "I", 400L), (40L, 2L, "U", 401L), // new key, updated → I final
      (50L, 1L, "I", 500L), (50L, 2L, "D", 0L),   // transient → no row
      (10L, 1L, "U", 101L), (10L, 2L, "U", 102L), // updated → U final
      (20L, 1L, "U", 201L), (20L, 2L, "D", 0L),   // deleted → D, payload null
      (30L, 1L, "D", 0L), (30L, 2L, "I", 301L)    // delete+reinsert → U final
    ).toDF("key", "seq", "op", "payload")
    val net = Merge.cdcCompact(cdc)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    assert(net === Map(
      40L -> (("I", Some(401L))),
      10L -> (("U", Some(102L))),
      20L -> (("D", None)),
      30L -> (("U", Some(301L)))))
    // replay equivalence: raw log applied in seq order ≡ compacted applied
    val base = scala.collection.mutable.Map(10L -> 100L, 20L -> 200L, 30L -> 300L)
    val replayed = base.clone()
    cdc.collect().sortBy(r => (r.getLong(0), r.getLong(1))).foreach { r =>
      if (r.getString(2) == "D") replayed.remove(r.getLong(0))
      else replayed(r.getLong(0)) = r.getLong(3)
    }
    val compacted = base.clone()
    net.foreach { case (k, (op, p)) =>
      if (op == "D") compacted.remove(k) else compacted(k) = p.get
    }
    assert(compacted === replayed)
  }

  private def Tables = graft.sources.Tables
}
