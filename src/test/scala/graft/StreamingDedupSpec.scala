package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.StreamingDedup

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("streaming exact dedup emits one row per distinct text") {
    val srcDir = Files.createTempDirectory("graft_dedup_src").toString
    val rows = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "alpha beta"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), "alpha beta"), // dup
      (3L, java.sql.Timestamp.valueOf("2024-01-01 10:10:00"), "gamma delta"),
      (4L, java.sql.Timestamp.valueOf("2024-01-01 10:20:00"), "alpha beta") // dup
    ).toDF("doc_id", "ts", "text")
    rows.write.mode("overwrite").parquet(srcDir)

    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("ts", TimestampType),
      StructField("text", StringType)))
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val query = StreamingDedup.exactStream(stream)
      .writeStream.format("memory").queryName("dedup_sink")
      .outputMode("append").start()
    try query.processAllAvailable()
    finally query.stop()

    val out = spark.table("dedup_sink").select(col("text")).as[String].collect().sorted
    assert(out.toSeq === Seq("alpha beta", "gamma delta"))
  }

  test("checkpoint restart: dedup state survives the query, seen keys stay suppressed, old files aren't reprocessed") {
    val srcDir = Files.createTempDirectory("graft_dedup_ckpt_src").toString
    val ckpt = Files.createTempDirectory("graft_dedup_ckpt").toString
    val sinkDir = Files.createTempDirectory("graft_dedup_ckpt_sink").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("ts", TimestampType),
      StructField("text", StringType)))
    def src = spark.readStream.schema(schema).parquet(srcDir)
    // Parquet sink: the memory sink refuses checkpoint recovery (it is a
    // per-query scratch table); the file sink's manifest commit protocol
    // is the real exactly-once surface, and it makes the assertion
    // stronger — the sink's TOTAL contents across both query incarnations
    // must be exactly one row per distinct text.
    def run(): Unit = {
      val q = StreamingDedup.exactStream(src, watermark = "365 days")
        .writeStream.format("parquet")
        .option("path", sinkDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try q.processAllAvailable()
      finally q.stop()
    }
    // Phase 1: two distinct texts land and are recorded in state.
    Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "alpha beta"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), "gamma delta")
    ).toDF("doc_id", "ts", "text").write.mode("append").parquet(srcDir)
    run()
    assert(spark.read.parquet(sinkDir).count() === 2)

    // Phase 2: a NEW query on the SAME checkpoint. A dup of a phase-1
    // text must be suppressed by RESTORED state, phase-1 source files
    // must not be reprocessed (committed offsets), and phase-1 sink rows
    // must not be duplicated (manifest commit) — so the final sink is
    // exactly one row per distinct text ever seen.
    Seq(
      (3L, java.sql.Timestamp.valueOf("2024-01-01 10:10:00"), "alpha beta"), // dup vs phase 1
      (4L, java.sql.Timestamp.valueOf("2024-01-01 10:15:00"), "epsilon zeta") // new
    ).toDF("doc_id", "ts", "text").write.mode("append").parquet(srcDir)
    run()
    val all = spark.read.parquet(sinkDir)
      .select(col("text")).as[String].collect().sorted
    assert(all.toSeq === Seq("alpha beta", "epsilon zeta", "gamma delta"),
      "restart must restore dedup state (suppress the phase-1 dup), resume " +
      "from committed offsets, and not re-commit phase-1 output files")
  }

  test("batch twin dedups identically") {
    val docs = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "x y"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), "x y")
    ).toDF("doc_id", "ts", "text")
    assert(StreamingDedup.exactStream(docs).count() === 1)
  }
}
