package graft

import org.apache.spark.sql.functions.col

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val payloads = Seq(
    (1L, "x" * 600),
    (2L, "abc")
  ).toDF("doc_id", "text")
    .select(col("doc_id"), col("text").cast("binary").as("payload"))

  test("metadata: byte length, md5, frame count — no decode") {
    val rows = Multimodal.metadata(payloads).collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getAs[Long]("byte_len") === 600L)
    assert(rows(1L).getAs[Long]("n_frames") === 3L)
    assert(rows(2L).getAs[String]("content_md5") === "900150983cd24fb0d6963f7d28e17f72")
  }

  test("extractFeatures drives the codec once per row via mapPartitions") {
    val feats = Multimodal.extractFeatures(payloads).collect().map(r => r.getLong(0) -> r).toMap
    assert(feats(2L).getAs[Int]("width") === 4) // 3 bytes % 640 + 1
    assert(feats(2L).getAs[Int]("channels") === 3)
    val meanAbc = ("abc".getBytes.map(_.toDouble).sum / 3)
    assert(math.abs(feats(2L).getAs[Double]("mean_intensity") - meanAbc) < 1e-9)
  }

  test("resize produces exact target-size payloads, deterministic bytes") {
    val out = Multimodal.resize(payloads, targetBytes = 16)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(out.values.forall(_.length == 16))
    assert(out(1L).forall(_ == 'x'.toByte)) // 600 x's shrink to 16 x's
    // "abc" upsampled to 16: position i maps to in(i*3/16 % 3)
    val expected = (0 until 16).map(i => "abc".charAt(i * 3 / 16 % 3).toByte).toArray
    assert(out(2L).toSeq === expected.toSeq)
    val empty = Seq((9L, "")).toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    assert(Multimodal.resize(empty, 8).collect().head.getAs[Array[Byte]](1).forall(_ == 0))
  }

  test("sampleFrames emits no frames for an empty payload") {
    val empty = Seq((9L, "")).toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    assert(Multimodal.sampleFrames(empty).count() === 0)
  }

  test("sampleFrames emits every stride-th 256-byte block") {
    val frames = Multimodal.sampleFrames(payloads, stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2).length))
    // doc 1: blocks 0,1,2 → sampled 0 and 2 (index within sampled list: 0,1)
    assert(frames.count(_._1 == 1L) === 2)
    assert(frames.filter(_._1 == 1L).map(_._3).toSeq === Seq(256, 88))
    assert(frames.count(_._1 == 2L) === 1)
  }
}
