package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.StreamingSession

class StreamingSessionSpec extends SparkSpec {
  import spark.implicits._

  test("streaming session_window with sentinel flush matches batch sessionization") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val srcDir = Files.createTempDirectory("graft_sess_src").toString
    val real = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("ts"))
    val maxTs = real.agg(max(col("ts"))).head().getTimestamp(0)
    val sentinel = new java.sql.Timestamp(maxTs.getTime + 3600000L)
    real.unionByName(
      real.select(col("user_id")).distinct().withColumn("ts", lit(sentinel)))
      .coalesce(1).write.mode("overwrite").parquet(srcDir)

    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType)))
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val q = StreamingSession.sessions(stream)
      .writeStream.format("memory").queryName("sess_sink")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // The emitted table must BE the batch session_window over the REAL
    // events (sentinel sessions stay in state — none may leak out).
    val streamed = spark.table("sess_sink")
    val expected = StreamingSession.sessions(real)
    assert(streamed.count() > 0)
    assert(streamed.except(expected).isEmpty && expected.except(streamed).isEmpty)
    assert(streamed.filter(col("session_start") >= lit(sentinel)).isEmpty,
      "sentinel sessions must be withheld, not emitted")
  }

  test("session_window boundary: an event exactly `gap` after the previous still MERGES") {
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val gapMs = 30L * 60 * 1000
    val df = Seq(
      (1L, ts(0L)), (1L, ts(gapMs)),         // exactly gap apart → inclusive merge
      (2L, ts(0L)), (2L, ts(gapMs + 1))      // 1 ms beyond → two sessions
    ).toDF("user_id", "ts")
    val out = StreamingSession.sessions(df) // batch mode: same aggregation
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getTimestamp(2).getTime, r.getLong(3))).toSet
    assert(out === Set(
      (1L, 0L, 2 * gapMs, 2L),                       // merged at the boundary
      (2L, 0L, gapMs, 1L),                           // [0, 0+gap)
      (2L, gapMs + 1, 2 * gapMs + 1, 1L)))           // split 1 ms beyond gap
  }
}
