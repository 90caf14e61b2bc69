package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.streaming.StreamingLateData

class StreamingLateDataSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  private def writeBatchFile(rows: Seq[(Long, Long)], srcDir: String,
      b: Int): Unit = {
    val stage = s"$srcDir/stage$b"
    rows.toDF("event_id", "ms")
      .select(col("event_id"), timestamp_millis(col("ms")).as("ts"))
      .coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .filter(_.getName.startsWith("part-")).head
    val dst = Paths.get(srcDir, s"batch-$b.parquet")
    Files.move(part.toPath, dst)
    dst.toFile.setLastModified(1700000000000L + b * 60000L)
  }

  test("late rows route by the PREVIOUS batch's recorded watermark; padded contiguous trail") {
    val srcDir = tmp("graft_late_src")
    val outRoot = tmp("graft_late_out")
    // batch 0: max ms 100_000 → wm after = 100_000 - 10_000 = 90_000
    writeBatchFile(Seq((1L, 50000L), (2L, 100000L)), srcDir, 0)
    // batch 1: 80_000 < 90_000 → LATE; 95_000 ≥ 90_000 → on time (late
    // relative to batch-0's max is NOT enough — the delay buys it back);
    // max 120_000 → wm after = 110_000
    writeBatchFile(Seq((3L, 80000L), (4L, 95000L), (5L, 120000L)), srcDir, 1)
    // batch 2: 105_000 < 110_000 → LATE even though it beats batch 0's max
    writeBatchFile(Seq((6L, 105000L), (7L, 130000L)), srcDir, 2)
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$srcDir/batch-0.parquet").schema)
      .option("maxFilesPerTrigger", 1)
      .option("pathGlobFilter", "batch-*.parquet")
      .parquet(srcDir)
    StreamingLateData.run(stream, "ts", outRoot, s"$outRoot/ckpt",
      delayMs = 10000L).awaitTermination()
    val late = spark.read.parquet(s"$outRoot/late")
      .select("event_id").collect().map(_.getLong(0)).toSet
    val ontime = spark.read.parquet(s"$outRoot/ontime")
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(late === Set(3L, 6L))
    assert(ontime === Set(1L, 2L, 4L, 5L, 7L), "late ⊎ ontime must partition the input")
    // contiguous, zero-padded watermark trail with the engine's values
    val wmDir = Paths.get(outRoot, "_wm")
    val names = new java.io.File(wmDir.toString).listFiles().map(_.getName).sorted
    assert(names.toSeq === Seq("wm-000000000000", "wm-000000000001", "wm-000000000002"))
    def wm(i: Int) = new String(Files.readAllBytes(
      wmDir.resolve(names(i))), "UTF-8").trim.toLong
    assert(wm(0) === 90000L && wm(1) === 110000L && wm(2) === 120000L)
  }

  test("a torn watermark trail fails loudly instead of treating state as empty") {
    val srcDir = tmp("graft_late_torn_src")
    val outRoot = tmp("graft_late_torn_out")
    writeBatchFile(Seq((1L, 100000L)), srcDir, 0)
    writeBatchFile(Seq((2L, 50000L)), srcDir, 1)
    StreamingLateData.run(spark.readStream
        .schema(spark.read.parquet(s"$srcDir/batch-0.parquet").schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "batch-*.parquet")
        .parquet(srcDir),
      "ts", outRoot, s"$outRoot/ckpt", delayMs = 10000L).awaitTermination()
    // simulate the torn window: wm-0 vanished, checkpoint says resume at 1
    Files.delete(Paths.get(outRoot, "_wm", "wm-000000000000"))
    writeBatchFile(Seq((3L, 60000L)), srcDir, 2)
    Files.delete(Paths.get(outRoot, "_wm", "wm-000000000001"))
    val ex = intercept[Exception] {
      StreamingLateData.run(spark.readStream
          .schema(spark.read.parquet(s"$srcDir/batch-0.parquet").schema)
          .option("maxFilesPerTrigger", 1)
          .option("pathGlobFilter", "batch-*.parquet")
          .parquet(srcDir),
        "ts", outRoot, s"$outRoot/ckpt", delayMs = 10000L).awaitTermination()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: messages(e.getCause))
    assert(messages(ex).exists(_.contains("torn")), messages(ex).mkString(" | "))
  }
}
