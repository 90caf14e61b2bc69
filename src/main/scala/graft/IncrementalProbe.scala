package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal}

/** Builder tooling: scale measurements for the round-7 additions —
  * the durable Hamming/anchor stores' incremental runs vs their one-shot
  * twins, and the video near-dup chain end-to-end. All corpora are
  * deterministic (id-derived), so runs are comparable across rounds. */
object IncrementalProbe {
  def main(args: Array[String]): Unit = {
    val nSigs = if (args.length > 0) args(0).toInt else 100000
    val nDocs = if (args.length > 1) args(1).toInt else 20000
    val nVids = if (args.length > 2) args(2).toInt else 30000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[incr] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_incr_probe").toString

    // --- Hamming store: quads of near-identical 64-bit signatures -------
    // base b = squared-mix of id/4; variants flip bit (id%4) — Hamming ≤ 3
    // within a quad, unrelated across quads.
    val sigs = spark.range(nSigs.toLong).select(
      col("id").as("doc_id"),
      expr("""xxhash64(CAST(id div 4 AS STRING)) ^
              (CASE WHEN id % 4 = 0 THEN CAST(0 AS BIGINT)
                    ELSE shiftleft(CAST(1 AS BIGINT), CAST((id % 4) * 7 AS INT)) END)
           """).as("sig")).cache()
    sigs.count()
    time("hamming_oneshot")(Dedup.hammingPairs(sigs, 64, 3).count())
    val hs = s"$tmp/hstore"
    time("hamming_incr_batch1")(Dedup.incrementalHammingPairs(
      sigs.filter(col("doc_id") % 2 === 0), hs, 64, 3, "probe-v1").count())
    time("hamming_incr_batch2")(Dedup.incrementalHammingPairs(
      sigs.filter(col("doc_id") % 2 === 1), hs, 64, 3, "probe-v1").count())
    time("hamming_erase_1k")(Dedup.eraseFromStore(spark, hs,
      spark.range(1000).select(col("id").as("doc_id"))))

    // --- Label store: cluster maintenance over the pair stores ---------
    // One-shot closure over all pairs vs two store-backed runs (pairs
    // through the hamming store, labels through the snapshot store) —
    // every quad straddles the parity boundary, so run 2 relabels run 1's
    // clusters; then a 1k-id erasure relabeling survivors.
    val docIds = sigs.select(col("doc_id"))
    time("labels_oneshot")(
      Dedup.clusters(docIds, Dedup.hammingPairs(sigs, 64, 3)).count())
    val hs2 = s"$tmp/hstore2"
    val ls2 = s"$tmp/lstore2"
    time("labels_incr_batch1") {
      val p1 = Dedup.incrementalHammingPairs(
        sigs.filter(col("doc_id") % 2 === 0), hs2, 64, 3, "probe-v1")
      Dedup.incrementalClusters(
        docIds.filter(col("doc_id") % 2 === 0), p1, ls2).count()
    }
    time("labels_incr_batch2") {
      val p2 = Dedup.incrementalHammingPairs(
        sigs.filter(col("doc_id") % 2 === 1), hs2, 64, 3, "probe-v1")
      Dedup.incrementalClusters(
        docIds.filter(col("doc_id") % 2 === 1), p2, ls2).count()
    }
    time("labels_erase_1k")(Dedup.eraseFromLabelStore(spark, ls2,
      spark.range(1000).select(col("id").as("doc_id"))))

    // --- Batch-count amortization: many small ingests inflate every
    // later run's fixed cost (one file-index entry + footer per batch
    // dir); compaction restores it -------------------------------------
    val ms = s"$tmp/mstore"
    (0 until 40).foreach { i =>
      Dedup.incrementalHammingPairs(
        sigs.filter(col("doc_id") % 50 === i), ms, 64, 3, "probe-v1").count()
    }
    time("ingest_41st_of_many") {
      Dedup.incrementalHammingPairs(
        sigs.filter(col("doc_id") % 50 === 40), ms, 64, 3, "probe-v1").count()
    }
    time("compact_store") { Dedup.compactStore(spark, ms)._2 }
    time("ingest_after_compact") {
      Dedup.incrementalHammingPairs(
        sigs.filter(col("doc_id") % 50 === 41), ms, 64, 3, "probe-v1").count()
    }

    // --- Anchor store: docs (10g, 10g+1) share a per-group 12-token
    // passage (anchor df = 2 per passage — stays under the cap; a
    // corpus-wide passage would just be cap-dropped and prove nothing) ---
    val docs = spark.range(nDocs.toLong).select(
      col("id").as("doc_id"),
      when(col("id") % 10 <= 1,
        concat(expr("array_join(transform(sequence(1, 10), i -> concat('u', CAST(id * 40 + i AS STRING))), ' ')"),
          expr("concat(' ', array_join(transform(sequence(1, 12), i -> concat('dup', CAST(id div 10 AS STRING), '_', CAST(i AS STRING))), ' '), ' ')"),
          expr("array_join(transform(sequence(11, 20), i -> concat('u', CAST(id * 40 + i AS STRING))), ' ')")))
        .otherwise(
          expr("array_join(transform(sequence(1, 30), i -> concat('u', CAST(id * 40 + i AS STRING))), ' ')"))
        .as("text")).cache()
    docs.count()
    // the shared passage has anchor df = nDocs/10 — cap it like a real
    // boilerplate run would (uncapped output is (nDocs/10)² pairs)
    time("spans_oneshot_capped")(
      Dedup.duplicatedSpans(docs, 10, 5, maxAnchorDf = 50).count())
    val ss = s"$tmp/sstore"
    time("spans_incr_batch1")(Dedup.incrementalDuplicatedSpans(
      docs.filter(col("doc_id") % 2 === 0), ss, 10, 5, maxAnchorDf = 50).count())
    time("spans_incr_batch2")(Dedup.incrementalDuplicatedSpans(
      docs.filter(col("doc_id") % 2 === 1), ss, 10, 5, maxAnchorDf = 50).count())

    // --- Semantic (vector) store: clone-heavy 64-dim embeddings, parity
    // ingest under the pinned center vs the flagged one-shot twin --------
    val nVecs = nSigs / 2
    val vecs = spark.range(nVecs.toLong).select(
      col("id").as("vec_id"),
      // CENTERED values (−0.5..0.5): all-positive synthetic vectors sit in
      // one orthant where EVERYTHING is cosine-similar (measured: 116M
      // pairs ≥ 0.95 at 100k vectors — the fixture, not the operator);
      // centered bases are near-orthogonal, so only quads pair
      // squared into the WIDE modulus first (the videoCell lesson: a
      // direct mod-97 collapses the base-pattern space to 97 residues and
      // hundreds of quads alias into identical vectors)
      expr("""transform(sequence(0, 63), d -> CAST(
               CAST(((((id div 4) * 131 + d * 17 + 7) * ((id div 4) * 131 + d * 17 + 7)) % 1000003) % 97 AS DOUBLE) / 97.0 - 0.5
               + CASE WHEN id % 4 = d % 4 THEN 0.05 ELSE 0.0 END AS FLOAT))""").as("embedding"))
      .cache()
    vecs.count()
    val (pq, pn) = graft.operators.Similarity.quantizedSums(
      vecs.filter(col("vec_id") % 2 === 0))
    time("semantic_oneshot") {
      graft.operators.Similarity.lshNeighborsCentered(
        vecs.withColumn("is_new", lit(true)),
        graft.operators.Similarity.meanDfFromQuantized(spark, pq, pn),
        nBits = 10, threshold = 0.95).count()
    }
    val vs = s"$tmp/vstore"
    time("semantic_incr_batch1")(Dedup.incrementalSemanticPairs(
      vecs.filter(col("vec_id") % 2 === 0), vs, threshold = 0.95, nBits = 10).count())
    time("semantic_incr_batch2")(Dedup.incrementalSemanticPairs(
      vecs.filter(col("vec_id") % 2 === 1), vs, threshold = 0.95, nBits = 10).count())

    // --- Video chain: synth → demux → per-frame dHash → temporal align --
    val vids = Multimodal.synthesizeVideos(
      spark.range(nVids.toLong).select(col("id").as("doc_id")).repartition(64))
      .cache()
    time("video_synth")(vids.count())
    val frames = Multimodal.videoFrames(vids)
    time("video_demux")(frames.count())
    val fh = Multimodal.frameDhash(frames).cache()
    time("video_frame_dhash")(fh.count())
    time("video_align_runs")(Dedup.frameAlignedRuns(
      fh.select(col("doc_id"), col("frame_idx").as("pos"), col("dhash").as("h")),
      minRun = 4).count())
    spark.stop()
  }
}
