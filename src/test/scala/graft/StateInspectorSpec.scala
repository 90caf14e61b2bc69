package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.{StateInspector, StreamingDedup}

class StateInspectorSpec extends SparkSpec {
  import spark.implicits._

  test("statestore source reads a dedup query's live keys as a batch frame") {
    val srcDir = Files.createTempDirectory("graft_si_src").toString
    val ckpt = Files.createTempDirectory("graft_si_ckpt").toString
    val sinkDir = Files.createTempDirectory("graft_si_sink").toString
    val rows = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "alpha beta"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), "alpha beta"), // dup
      (3L, java.sql.Timestamp.valueOf("2024-01-01 10:10:00"), "gamma delta"),
      (4L, java.sql.Timestamp.valueOf("2024-01-01 10:20:00"), "epsilon")
    ).toDF("doc_id", "ts", "text")
    rows.write.mode("overwrite").parquet(srcDir)

    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("ts", TimestampType),
      StructField("text", StringType)))
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val q = StreamingDedup.exactStream(stream, watermark = "365 days")
      .writeStream.format("parquet")
      .option("path", sinkDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()

    // The checkpoint, read back as a plain DataFrame: one state row per
    // distinct md5 the dedup operator is currently suppressing.
    val state = StateInspector.readState(spark, ckpt)
    val keys = state.select(col("key.text_md5")).as[String].collect().toSet
    val expected = rows.select(md5(col("text"))).distinct().as[String].collect().toSet
    assert(keys === expected)
    assert(expected.size === 3)

    // The frame is an ordinary DataFrame: aggregations over state work —
    // the state-skew question is one groupBy away.
    assert(state.groupBy(col("partition_id")).count()
      .agg(sum(col("count"))).head().getLong(0) === 3L)
  }
}
