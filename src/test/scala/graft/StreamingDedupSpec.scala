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

  test("batch twin dedups identically") {
    val docs = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "x y"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), "x y")
    ).toDF("doc_id", "ts", "text")
    assert(StreamingDedup.exactStream(docs).count() === 1)
  }
}
