package graft

import org.apache.spark.sql.functions.col

import graft.operators.Dedup

/** [[Dedup.incrementalClusters]] — the persisted-label-snapshot closure
  * over the incremental pair stores: arrival-order equivalence (including
  * late pairs merging long-established clusters), replay idempotence,
  * snapshot pruning, and the layout-marker guard. */
class IncrementalClustersSpec extends SparkSpec {
  import spark.implicits._

  private def store() = java.nio.file.Files
    .createTempDirectory("graft_label_store").toString + "/store"

  private def labelMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("three-batch ingest == one-shot clusters, late pair merges two old clusters") {
    val dir = store()
    // batch 1 forms {1,2}; batch 2 forms {10,11}; batch 3's pair (2,10)
    // merges the two established clusters — both must relabel to 1.
    val r1 = Dedup.incrementalClusters(
      Seq(1L, 2L, 5L).toDF("doc_id"),
      Seq((1L, 2L)).toDF("doc_a", "doc_b"), dir)
    assert(labelMap(r1.select(col("doc_id"), col("cluster_id"))) ===
      Map(1L -> 1L, 2L -> 1L, 5L -> 5L))
    Dedup.incrementalClusters(
      Seq(10L, 11L).toDF("doc_id"),
      Seq((10L, 11L)).toDF("doc_a", "doc_b"), dir)
    val r3 = Dedup.incrementalClusters(
      Seq(20L).toDF("doc_id"),
      Seq((2L, 10L)).toDF("doc_a", "doc_b"), dir)
    val oneShot = Dedup.clusters(
      Seq(1L, 2L, 5L, 10L, 11L, 20L).toDF("doc_id"),
      Seq((1L, 2L), (10L, 11L), (2L, 10L)).toDF("doc_a", "doc_b"))
    assert(labelMap(r3.select(col("doc_id"), col("cluster_id"))) ===
      labelMap(oneShot.select(col("doc_id"), col("cluster_id"))))
    assert(labelMap(r3.select(col("doc_id"), col("cluster_id")))(11L) === 1L)
  }

  test("re-ingest of the same batch is idempotent, one row per doc") {
    val dir = store()
    val docs = Seq(1L, 2L, 3L).toDF("doc_id")
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    Dedup.incrementalClusters(docs, pairs, dir)
    val again = Dedup.incrementalClusters(docs, pairs, dir)
    assert(again.count() === 3L)
    assert(labelMap(again.select(col("doc_id"), col("cluster_id"))) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("each run prunes to a single labels-* snapshot") {
    val dir = store()
    Dedup.incrementalClusters(Seq(1L).toDF("doc_id"),
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b"), dir)
    Dedup.incrementalClusters(Seq(2L).toDF("doc_id"),
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b"), dir)
    val snaps = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith("labels-")).sorted
    assert(snaps.toSeq === Seq("labels-000001"))
  }

  test("snapshots without the layout marker fail loudly") {
    val dir = store()
    Dedup.incrementalClusters(Seq(1L).toDF("doc_id"),
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b"), dir)
    assert(new java.io.File(dir, "_format-labels-v1").delete())
    val e = intercept[IllegalStateException] {
      Dedup.incrementalClusters(Seq(2L).toDF("doc_id"),
        Seq.empty[(Long, Long)].toDF("doc_a", "doc_b"), dir)
    }
    assert(e.getMessage.contains("_format-labels-v1"))
  }

  test("erasing the canonical relabels survivors; the id vanishes from BOTH columns") {
    val dir = store()
    Dedup.incrementalClusters(Seq(1L, 2L, 3L, 9L).toDF("doc_id"),
      Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b"), dir)
    val n = Dedup.eraseFromLabelStore(spark, dir, Seq(1L).toDF("doc_id"))
    assert(n === 1L)
    val after = spark.read.parquet(
      new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("labels-")).head.toString)
    val m = after.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m === Map(2L -> 2L, 3L -> 2L, 9L -> 9L))
    assert(!m.keySet.contains(1L) && !m.values.toSet.contains(1L))
  }

  test("erasing a non-canonical member leaves other labels unchanged; ingest continues") {
    val dir = store()
    Dedup.incrementalClusters(Seq(1L, 2L, 3L).toDF("doc_id"),
      Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b"), dir)
    assert(Dedup.eraseFromLabelStore(spark, dir, Seq(3L).toDF("doc_id")) === 1L)
    // the store keeps working after an erase-publish (seq advanced)
    val r = Dedup.incrementalClusters(Seq(4L).toDF("doc_id"),
      Seq((2L, 4L)).toDF("doc_a", "doc_b"), dir)
    assert(labelMap(r.select(col("doc_id"), col("cluster_id"))) ===
      Map(1L -> 1L, 2L -> 1L, 4L -> 1L))
  }

  test("erase with no hits or an absent store is a 0-row no-op") {
    val dir = store()
    assert(Dedup.eraseFromLabelStore(spark, dir, Seq(1L).toDF("doc_id")) === 0L)
    Dedup.incrementalClusters(Seq(1L).toDF("doc_id"),
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b"), dir)
    assert(Dedup.eraseFromLabelStore(spark, dir, Seq(99L).toDF("doc_id")) === 0L)
    val snaps = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith("labels-")).sorted
    assert(snaps.toSeq === Seq("labels-000000")) // no-op published nothing
  }

  test("an orphaned staging dir from a crashed run is invisible to readers") {
    val dir = store()
    Dedup.incrementalClusters(Seq(1L, 2L).toDF("doc_id"),
      Seq((1L, 2L)).toDF("doc_a", "doc_b"), dir)
    // simulate a writer killed mid-stage
    assert(new java.io.File(dir, ".staging-labels-000099").mkdirs())
    val r = Dedup.incrementalClusters(Seq(3L).toDF("doc_id"),
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b"), dir)
    assert(labelMap(r.select(col("doc_id"), col("cluster_id"))) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }
}
