package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Dedup
import graft.streaming.StreamingNearDup

class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"),
    (2L, "completely different words entirely here now"),
    (3L, "the quick brown fox jumps over the lazy dog"),
    (4L, "tiny doc")
  ).toDF("doc_id", "text")

  test("per-row band keys equal the batch MinHashAgg pipeline's") {
    val batch = Dedup.lshBands(Dedup.minhashSignatures(Dedup.shingleHashes(docs)))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val perRow = StreamingNearDup.bandedDocs(docs)
      .select(col("doc_id"), col("band"), col("band_key"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(perRow === batch)
  }

  test("streaming candidates equal batch candidates, across micro-batches") {
    // The near-dup trio {0, 1, 3} arrives split across two files (two
    // micro-batches): doc 3 must still pair with docs 0 and 1, which only
    // the bucket STATE can know about.
    val srcDir = Files.createTempDirectory("graft_neardup_src").toString
    docs.filter($"doc_id" <= 1L).write.parquet(s"$srcDir/b0")
    docs.filter($"doc_id" >= 2L).write.parquet(s"$srcDir/b1")

    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$srcDir/*")
    val query = StreamingNearDup.candidatePairs(stream)
      .writeStream.format("memory").queryName("neardup_sink")
      .outputMode("append").start()
    try query.processAllAvailable()
    finally query.stop()

    val streamed = spark.table("neardup_sink")
      .select("doc_a", "doc_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bands = Dedup.lshBands(Dedup.minhashSignatures(Dedup.shingleHashes(docs)))
    val batch = bands.as("a").join(bands.as("b"),
        $"a.band" === $"b.band" && $"a.band_key" === $"b.band_key" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id", $"b.doc_id").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === batch)
    assert(streamed.contains((0L, 3L)) && streamed.contains((1L, 3L))) // cross-batch
  }

  test("hot-bucket cap bounds state but keeps pairs under the cap") {
    // 5 identical docs, cap 3: members beyond the cap still pair against
    // the remembered 3, but are not added to state.
    val clones = (0L until 5L).map(i => (i, "same same same text here ok")).toDF("doc_id", "text")
    val pairs = StreamingNearDup.candidatePairs(clones, maxBucket = 3)
      .distinct().collect().map(p => (p.doc_a, p.doc_b)).toSet
    // Remembered members 0,1,2 pair fully; 3 and 4 each pair with 0,1,2
    // but never with each other.
    assert(pairs === Set((0L,1L), (0L,2L), (1L,2L), (0L,3L), (1L,3L), (2L,3L), (0L,4L), (1L,4L), (2L,4L)))
  }
}
