package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.StreamingRollup

class StreamingRollupSpec extends SparkSpec {
  import spark.implicits._

  test("streaming hourly rollup over a file source matches the batch result") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val srcDir = Files.createTempDirectory("graft_stream_src").toString
    val batch = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("ts"), col("user_id"), col("value"))
    batch.write.mode("overwrite").parquet(srcDir)

    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("user_id", LongType),
      StructField("value", DoubleType)))
    val stream = spark.readStream.schema(schema).parquet(srcDir)

    val q = StreamingRollup(stream)
      .writeStream.format("memory").queryName("rollup_sink")
      .outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()

    // Append mode only emits windows the watermark closed; every emitted row
    // must equal the batch computation for its (hour, user).
    val streamed = spark.table("rollup_sink")
    val expected = StreamingRollup(batch)
    assert(streamed.count() > 0)
    assert(streamed.except(expected).count() === 0)
  }

  test("streaming hopping windows match the batch sliding-window result") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val srcDir = Files.createTempDirectory("graft_hop_src").toString
    val batch = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("ts"), col("value"))
    batch.write.mode("overwrite").parquet(srcDir)

    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("value", DoubleType)))
    val stream = spark.readStream.schema(schema).parquet(srcDir)

    // Complete mode retains every window — the final table must BE the
    // batch computation (each event spread across its 4 hop windows).
    val q = StreamingRollup.hopping(stream)
      .writeStream.format("memory").queryName("hop_sink")
      .outputMode("complete").start()
    try q.processAllAvailable()
    finally q.stop()

    val streamed = spark.table("hop_sink")
    val expected = StreamingRollup.hopping(batch)
    assert(streamed.count() === expected.count())
    assert(streamed.except(expected).count() === 0)
    assert(expected.except(streamed).count() === 0)
  }

  test("stream-stream interval join with watermarks") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val srcDir = Files.createTempDirectory("graft_ssj_src").toString
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("ts"), col("user_id"), col("event_type"), col("value"))
    events.write.mode("overwrite").parquet(srcDir)

    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType)))
    def src = spark.readStream.schema(schema).parquet(srcDir)
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val errors = src.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"))
      .withWatermark("e_ts", "1 hour")
    // purchases within 30 min after an error by the same user
    val joined = errors.join(
      purchases,
      expr("e_user = p_user AND p_ts >= e_ts AND p_ts <= e_ts + INTERVAL 30 MINUTES"))

    val q = joined.writeStream.format("memory").queryName("ssj_sink")
      .outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()

    val streamed = spark.table("ssj_sink").count()
    val batch = events.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"))
      .join(
        events.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts").as("p_ts")),
        expr("e_user = p_user AND p_ts >= e_ts AND p_ts <= e_ts + INTERVAL 30 MINUTES"))
      .count()
    assert(streamed === batch)
    assert(streamed > 0)
  }

  test("late data beyond the watermark is dropped; within-watermark late data is kept") {
    val srcDir = Files.createTempDirectory("graft_late_src").toString
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("user_id", LongType),
      StructField("value", DoubleType)))
    def ts(h: Int, m: Int) = new java.sql.Timestamp((h * 3600L + m * 60L) * 1000L)
    // Each append is one new file → one micro-batch; the watermark advances
    // to (max event time − 2h) at the END of each batch, so batch N+1 runs
    // against the watermark batch N established.
    def add(rows: Seq[(java.sql.Timestamp, Long, Double)]): Unit =
      rows.toDF("ts", "user_id", "value").coalesce(1)
        .write.mode("append").parquet(srcDir)

    add(Seq((ts(0, 15), 1L, 2.0), (ts(10, 15), 1L, 5.0))) // wm after batch 1: 8:15
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val q = StreamingRollup(stream)
      .writeStream.format("memory").queryName("late_sink")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // 0:30 is BEHIND the 8:15 watermark → must be dropped (hour-0 bucket
      // stays at its on-time contents); 9:30 is late-arriving but within
      // the watermark → must be kept.
      add(Seq((ts(0, 30), 1L, 99.0), (ts(9, 30), 1L, 7.0)))
      q.processAllAvailable()
      add(Seq((ts(20, 0), 1L, 11.0))) // pushes wm to 18:00 after this batch
      q.processAllAvailable()
      add(Seq((ts(20, 30), 1L, 13.0))) // batch 4 runs AT wm 18:00 → closes h9/h10
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("late_sink").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(rows === Set(
      (0L, 1L, 2.0, 1L),             // hour 0: on-time reading only — 99.0 dropped
      (9L * 3600000L, 1L, 7.0, 1L),  // within-watermark late reading kept
      (10L * 3600000L, 1L, 5.0, 1L)  // on-time, closed by the wm advance
    )) // hour-20 windows stay open (wm 18:30 < 21:00) → correctly unemitted
  }

  test("sessionize emits gap-separated sessions via flatMapGroupsWithState") {
    val h = 3600L * 1000
    val readings = Seq(
      StreamingRollup.Reading(1L, 0L, 2.0),
      StreamingRollup.Reading(1L, 10 * 60 * 1000L, 4.0), // same session
      StreamingRollup.Reading(1L, 5 * h, 9.0), // new session (gap >30min) → closes first
      StreamingRollup.Reading(2L, 0L, 1.0)
    ).toDS()
    val out = StreamingRollup.sessionize(readings).collect()
    // batch mode emits only closed sessions: user 1's first session
    assert(out.toSeq === Seq(StreamingRollup.SessionOut(1L, 0L, 10 * 60 * 1000L, 2L, 3.0)))
  }
}
