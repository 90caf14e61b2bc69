package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.StreamingRunningTotals

/** Spark 4 `transformWithState` (StatefulProcessor + ValueState on the
  * RocksDB store) — running totals accumulate across micro-batches and the
  * final snapshot equals the batch groupBy twin. */
class StreamingTwsSpec extends SparkSpec {

  test("transformWithState running totals: state accumulates across batches, final snapshot ≡ batch aggregate") {
    // transformWithState requires the RocksDB state store; conf is frozen
    // per query, so pin it on a cloned session (the q32/q33 pattern).
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    import s.implicits._

    val srcDir = Files.createTempDirectory("graft_tws_src").toString
    val ckpt = Files.createTempDirectory("graft_tws_ckpt").toString
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("value", DoubleType)))
    def write(rows: (Long, Double)*): Unit =
      rows.toSeq.toDF("user_id", "value").write.mode("append").parquet(srcDir)

    write((1L, 1.25), (1L, 2.50), (2L, 10.00))
    val q = StreamingRunningTotals(s.readStream.schema(schema).parquet(srcDir))
      .toDF()
      .writeStream.format("memory").queryName("tws_sink")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      write((1L, 0.25), (3L, 5.00)) // second batch: user 1 grows, user 3 appears
      q.processAllAvailable()
    } finally q.stop()

    // Update mode appends one snapshot per (key, batch); totals are
    // monotone, so the max-n_events row per user is the final state.
    val finals = s.table("tws_sink")
      .groupBy("user_id")
      .agg(max(struct(col("n_events"), col("total_cents"))).as("s"))
      .select(col("user_id"), col("s.n_events"), col("s.total_cents"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(finals === Map(
      1L -> ((3L, 400L)),   // 125 + 250 + 25 cents, across two batches
      2L -> ((1L, 1000L)),
      3L -> ((1L, 500L))))

    // User 1's phase-1 snapshot must also be present (2 events, 375):
    // proof the state UPDATE crossed batches rather than recomputing.
    val u1 = s.table("tws_sink").filter(col("user_id") === 1L)
      .select("n_events", "total_cents")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(u1 === Set((2L, 375L), (3L, 400L)))
  }

  test("transformWithState MapState: per-type entries accumulate across batches") {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    import s.implicits._

    val srcDir = Files.createTempDirectory("graft_twsmap_src").toString
    val ckpt = Files.createTempDirectory("graft_twsmap_ckpt").toString
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_type", StringType)))
    def write(rows: (Long, String)*): Unit =
      rows.toSeq.toDF("user_id", "event_type").write.mode("append").parquet(srcDir)

    write((1L, "view"), (1L, "view"), (2L, "buy"))
    val q = graft.streaming.StreamingTypeCounts(
      s.readStream.schema(schema).parquet(srcDir))
      .toDF()
      .writeStream.format("memory").queryName("twsmap_sink")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      // second batch: a NEW type for user 1 (map grows), a repeat for 2
      write((1L, "buy"), (2L, "buy"))
      q.processAllAvailable()
    } finally q.stop()

    val finals = s.table("twsmap_sink")
      .groupBy("user_id")
      .agg(max(struct(col("n_events"), col("n_types"))).as("s"))
      .select(col("user_id"), col("s.n_types"), col("s.n_events"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(finals === Map(
      1L -> ((2L, 3L)), // view×2 + buy across two batches → 2 types
      2L -> ((1L, 2L)))) // buy×2 → map entry grew, type count didn't
    // user 1's phase-1 snapshot: 1 type, 2 events — state crossed batches
    val u1 = s.table("twsmap_sink").filter(col("user_id") === 1L)
      .select("n_types", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(u1 === Set((1L, 2L), (2L, 3L)))
  }

  test("timer sessions: in-batch close emits, timer fires at expiry == watermark, open tail withheld") {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    import s.implicits._
    val srcDir = Files.createTempDirectory("graft_tmr_src").toString
    val ckpt = Files.createTempDirectory("graft_tmr_ckpt").toString
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType)))
    def tsOf(ms: Long) = new java.sql.Timestamp(ms)
    // gap 60 s; final watermark = max event 100 s.
    //  user 1: 1 s, 10 s  → one session, timer 70 s < wm → TIMER emission
    //  user 2: 1 s, 100 s → first session closed IN-BATCH by the second
    //          event (emits); the 100 s tail's timer (160 s) > wm → withheld
    //  user 3: 40 s       → timer 100 s == wm → fires (INCLUSIVE comparator)
    Seq((1L, tsOf(1000L)), (1L, tsOf(10000L)),
        (2L, tsOf(1000L)), (2L, tsOf(100000L)),
        (3L, tsOf(40000L))).toDF("user_id", "ts")
      .coalesce(1).write.mode("append").parquet(srcDir)
    val q = graft.streaming.StreamingTimerSession.sessions(
        s.readStream.schema(schema).parquet(srcDir), gapMs = 60000L)
      .toDF()
      .writeStream.format("memory").queryName("tmr_sink")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    val rows = s.table("tmr_sink").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(rows === Set(
      (1L, 1000000L, 70000000L, 2L),
      (2L, 1000000L, 61000000L, 1L),
      (3L, 40000000L, 100000000L, 1L)),
      s"got $rows")
  }

  test("timer sessions: cross-batch extension re-arms the timer; one session, full count") {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    import s.implicits._
    val srcDir = Files.createTempDirectory("graft_tmr2_src").toString
    val ckpt = Files.createTempDirectory("graft_tmr2_ckpt").toString
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType)))
    def tsOf(ms: Long) = new java.sql.Timestamp(ms)
    def write(rows: (Long, java.sql.Timestamp)*): Unit =
      rows.toSeq.toDF("user_id", "ts").coalesce(1)
        .write.mode("append").parquet(srcDir)
    write((4L, tsOf(0L)), (4L, tsOf(10000L)))
    val q = graft.streaming.StreamingTimerSession.sessions(
        s.readStream.schema(schema).parquet(srcDir), gapMs = 60000L)
      .toDF()
      .writeStream.format("memory").queryName("tmr2_sink")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // batch 2 EXTENDS the open session (30 s is within gap of 10 s) and
      // must re-arm the timer from 70 s to 90 s — a stale 70 s timer would
      // close the session at n=2; the pusher event (user 5 at 200 s)
      // advances the watermark past 90 s so the re-armed timer fires.
      write((4L, tsOf(30000L)), (5L, tsOf(200000L)))
      q.processAllAvailable()
    } finally q.stop()
    val u4 = s.table("tmr2_sink").filter(col("user_id") === 4L).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(u4 === Set((0L, 90000000L, 3L)), s"got $u4")
    // user 5's lone session (timer 260 s > final wm 200 s) stays open
    assert(s.table("tmr2_sink").filter(col("user_id") === 5L).isEmpty)
  }

  test("timer sessions: an admitted straggler beyond the gap forms its own earlier session (no fusion)") {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    import s.implicits._
    val srcDir = Files.createTempDirectory("graft_tmr3_src").toString
    val ckpt = Files.createTempDirectory("graft_tmr3_ckpt").toString
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType)))
    def tsOf(ms: Long) = new java.sql.Timestamp(ms)
    def write(rows: (Long, java.sql.Timestamp)*): Unit =
      rows.toSeq.toDF("user_id", "ts").coalesce(1)
        .write.mode("append").parquet(srcDir)
    // gap 60 s, watermark delay 120 s. Batch 1: user 7 at 200 s (wm after
    // = 80 s). Batch 2: user 7 at 100 s — ADMITTED (>= 80 s) but more than
    // a gap below the open session's 200 s start: batch gaps-and-islands
    // gives TWO sessions; the pre-fix single-value state took
    // min(start, t) and silently fused them into [100, 260] n=2.
    write((7L, tsOf(200000L)))
    val q = graft.streaming.StreamingTimerSession.sessions(
        s.readStream.schema(schema).parquet(srcDir), gapMs = 60000L,
        watermark = "120 seconds")
      .toDF()
      .writeStream.format("memory").queryName("tmr3_sink")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      write((7L, tsOf(100000L)))
      q.processAllAvailable()
      write((8L, tsOf(500000L))) // pusher: wm → 380 s, both deadlines fire
      q.processAllAvailable()
    } finally q.stop()
    val u7 = s.table("tmr3_sink").filter(col("user_id") === 7L).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(u7 === Set((100000000L, 160000000L, 1L),
      (200000000L, 260000000L, 1L)), s"got $u7")
  }

  test("timer sessions: a bridging straggler merges two pending islands into one session") {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    import s.implicits._
    val srcDir = Files.createTempDirectory("graft_tmr4_src").toString
    val ckpt = Files.createTempDirectory("graft_tmr4_ckpt").toString
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType)))
    def tsOf(ms: Long) = new java.sql.Timestamp(ms)
    def write(rows: (Long, java.sql.Timestamp)*): Unit =
      rows.toSeq.toDF("user_id", "ts").coalesce(1)
        .write.mode("append").parquet(srcDir)
    // gap 60 s, delay 120 s. Batch 1: user 9 at 100 s and 200 s — two
    // pending islands (gap exceeded), NEITHER emitted yet (first deadline
    // 160 s > wm 80 s — emission is watermark-driven, not closed-by-later-
    // event). Batch 2: 150 s bridges them (within gap of both) → ONE
    // session [100, 260] n=3, exactly the batch twin over all three.
    write((9L, tsOf(100000L)), (9L, tsOf(200000L)))
    val q = graft.streaming.StreamingTimerSession.sessions(
        s.readStream.schema(schema).parquet(srcDir), gapMs = 60000L,
        watermark = "120 seconds")
      .toDF()
      .writeStream.format("memory").queryName("tmr4_sink")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      write((9L, tsOf(150000L)))
      q.processAllAvailable()
      write((10L, tsOf(700000L))) // pusher: wm → 580 s
      q.processAllAvailable()
    } finally q.stop()
    val u9 = s.table("tmr4_sink").filter(col("user_id") === 9L).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(u9 === Set((100000000L, 260000000L, 3L)), s"got $u9")
  }
}
