package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, FuzzyJoin, Multimodal}

/** Builder tooling: scale measurements for the round-7 additions —
  * the durable Hamming/anchor stores' incremental runs vs their one-shot
  * twins, and the video near-dup chain end-to-end. All corpora are
  * deterministic (id-derived), so runs are comparable across rounds. */
object IncrementalProbe {
  def main(args: Array[String]): Unit = {
    val nSigs = if (args.length > 0) args(0).toInt else 100000
    val nDocs = if (args.length > 1) args(1).toInt else 20000
    val nVids = if (args.length > 2) args(2).toInt else 30000
    val nNames = if (args.length > 3) args(3).toInt else nDocs
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

    // --- FUZZY NEIGHBORHOOD store at batch count 40: same batch-dir
    // contract (and the same `_lock` lease) as the signature stores, so
    // Dedup.compactStore applies verbatim — measure the 41st ingest's
    // fixed cost before vs after compaction (the #42 curve for the
    // newest store family). 30k names in distance-1 triples.
    val fuzzyNames = spark.range(30000L).select(
      col("id").as("doc_id"),
      expr("""concat('nm', lpad(CAST(id div 3 AS STRING), 5, '0'),
              chr(97 + CAST(id % 3 AS INT)))""").as("s")).cache()
    fuzzyNames.count()
    val fstore = s"$tmp/fuzzystore"
    (0 until 40).foreach { i =>
      FuzzyJoin.incrementalPairs(
        fuzzyNames.filter(col("doc_id") % 50 === i), fstore, "doc_id", "s").count()
    }
    time("fuzzy_ingest_41st_of_many") {
      FuzzyJoin.incrementalPairs(
        fuzzyNames.filter(col("doc_id") % 50 === 40), fstore, "doc_id", "s").count()
    }
    time("fuzzy_compact_store")(Dedup.compactStore(spark, fstore)._2)
    time("fuzzy_ingest_after_compact") {
      FuzzyJoin.incrementalPairs(
        fuzzyNames.filter(col("doc_id") % 50 === 41), fstore, "doc_id", "s").count()
    }
    fuzzyNames.unpersist()

    // --- LABEL store at snapshot turnover 40: publish PRUNES superseded
    // snapshots, so unlike batch-dir stores there is nothing to compact
    // — the 41st ingest pays one snapshot read + closure + one publish,
    // flat in ingest COUNT; the dir must hold exactly ONE labels-* dir.
    val ls40 = s"$tmp/lstore40"
    def lsSlice(i: Int) = docIds.filter(col("doc_id") % 50 === i)
    def lsPairs(i: Int) = lsSlice(i)
      .filter(col("doc_id") + 50 < nSigs.toLong)
      .select(col("doc_id").as("doc_a"), (col("doc_id") + 50).as("doc_b"))
    (0 until 40).foreach { i =>
      Dedup.incrementalClusters(lsSlice(i), lsPairs(i), ls40).count()
    }
    time("labels_ingest_41st_of_many") {
      Dedup.incrementalClusters(lsSlice(40), lsPairs(40), ls40).count()
    }
    locally {
      val snaps = new java.io.File(ls40).listFiles()
        .filter(_.getName.startsWith("labels-"))
      assert(snaps.length == 1,
        s"label store must hold ONE snapshot after turnover, got ${snaps.length}")
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

    // --- Fuzzy neighborhood store (er2's pairing): HOT-NAME groups of 25
    // mutually-distance-1 names (last-char substitution a..y — the
    // John-Smith-cluster shape real ER corpora have), group identity
    // squared-mixed into the middle digits (the TextHash.sampleKey
    // lesson: a linear id map would lattice the neighborhood buckets).
    // Each group's delete-last-char variant is a 25-deep bucket, so the
    // candidate join's Σ bucket² term is live — exactly the term whose
    // growth separates the old whole-union plan (corpus²) from the
    // incremental one (batch×corpus). ------------------------------------
    val names = spark.range(nNames.toLong).select(
      col("id").as("doc_id"),
      expr("""concat('cust#',
               lpad(CAST(((id div 25) * (id div 25)) % 1000003 AS STRING), 7, '0'),
               chr(97 + CAST(id % 25 AS INT)))""").as("s")).cache()
    names.count()
    time("fuzzy_oneshot")(
      FuzzyJoin.selfJoinIds(names, "doc_id", "s").count())
    // "cost tracks batch, not corpus": the SAME 15k batch ingested against
    // a 4×-different history — if ingest cost were corpus-driven it would
    // quadruple; the corpus-linear parts (store scan + one shuffle of the
    // history's variant stream) are one pass with no bucket² term.
    val batchA = names.filter(
      col("doc_id") >= (nNames / 4) && col("doc_id") < (nNames / 4 + nNames / 20))
    val batchB = names.filter(col("doc_id") >= (nNames - nNames / 20))
    val fsSmall = s"$tmp/fstore_hist25"
    FuzzyJoin.incrementalPairs(
      names.filter(col("doc_id") < (nNames / 4)), fsSmall, "doc_id", "s").count()
    time(s"fuzzy_incr_b5pct_hist25pct")(FuzzyJoin.incrementalPairs(
      batchA, fsSmall, "doc_id", "s").count())
    val fsBig = s"$tmp/fstore_hist95"
    FuzzyJoin.incrementalPairs(
      names.filter(col("doc_id") < (nNames - nNames / 20)), fsBig, "doc_id", "s").count()
    time(s"fuzzy_incr_b5pct_hist95pct")(FuzzyJoin.incrementalPairs(
      batchB, fsBig, "doc_id", "s").count())
    // the plan this replaced (er2 pre-r8) at the same arrival: whole-UNION
    // neighborhood join re-paid per ingest, batch edges recovered by
    // post-filter — its candidate volume is the full corpus's Σ bucket²
    // every time, and it needs every historical record's TEXT re-presented
    time("fuzzy_old_b5pct_hist95pct")(
      FuzzyJoin.selfJoinIds(names, "doc_id", "s")
        .filter(col("id_a") >= (nNames - nNames / 20) ||
          col("id_b") >= (nNames - nNames / 20)).count())
    // The er2 LIFECYCLE comparison — 10 equal batches arriving in
    // sequence. The old plan re-joins the GROWING union at every arrival
    // (it recomputes every historical candidate pair each time); the
    // store path joins each batch against history once. At probe scale
    // the store machinery's fixed costs (read, checkpoint, publish) are
    // visible in the incremental column; the old column's growth term is
    // the one that compounds with corpus.
    time("fuzzy_old_10ingests") {
      (0 until 10).map { i =>
        val upTo = names.filter(col("doc_id") % 10 <= i)
        FuzzyJoin.selfJoinIds(upTo, "doc_id", "s")
          .filter(col("id_a") % 10 === i || col("id_b") % 10 === i).count()
      }.sum
    }
    val fs2 = s"$tmp/fstore2"
    time("fuzzy_incr_10ingests") {
      (0 until 10).map { i =>
        FuzzyJoin.incrementalPairs(
          names.filter(col("doc_id") % 10 === i), fs2, "doc_id", "s").count()
      }.sum
    }
    // Popularity-skewed ER at 120k records (3k distinct names × 40
    // copies, distance-1 families of 5): selfJoinIds emits the full
    // C(D,2)-per-name pair set (~12M rows here, quadratic in name
    // popularity — the term that grows with corpus); the dedup-first
    // edge set (selfJoinEdges) is popularity-LINEAR (star + rep edges)
    // and closes into the same entities (FuzzyJoinSpec).
    val hotNames = spark.range(120000L).select(
      col("id").as("doc_id"),
      expr("""concat('nm', lpad(CAST((id % 3000) div 5 AS STRING), 4, '0'),
              chr(97 + CAST(id % 5 AS INT)))""").as("s")).cache()
    hotNames.count()
    time("fuzzy_hot_allpairs_120k")(
      FuzzyJoin.selfJoinIds(hotNames, "doc_id", "s").count())
    time("fuzzy_hot_edges_120k")(
      FuzzyJoin.selfJoinEdges(hotNames, "doc_id", "s").count())
    // The SCORED siblings (er4/er5's scale path): exact-dup collapse +
    // conformant scorer over DISTINCT strings at radius 2 — popularity-
    // linear like selfJoinEdges; the full rescored pair set would be
    // C(40,2)-quadratic per hot name (the #59 explosion, rescored).
    time("fuzzy_hot_jaro_edges_120k")(
      FuzzyJoin.jaroRescoredEdges(hotNames, "doc_id", "s").count())
    time("fuzzy_hot_damerau_edges_120k")(
      FuzzyJoin.damerauEdges(hotNames, "doc_id", "s").count())
    hotNames.unpersist()

    // --- Stats catalog at entry turnover 100 (the x34 lifecycle): each
    // appendTableStats publishes entry-<n+1> then PRUNES superseded
    // entries (the label-snapshot convention), so the chain a reader or
    // the next append sees is ONE entry no matter how many appends have
    // run — append fixed cost and read cost must stay flat in version
    // number, the dir must hold exactly one entry-* dir, and the merged
    // row count must equal the union's (the exact-merge property at
    // turnover depth the spec only checks shallow). -----------------------
    val statsDir = s"$tmp/statscat"
    def statsBatch(i: Int) = spark.range(i * 1000L, i * 1000L + 1000L)
      .select(col("id").cast("string").as("k"))
    graft.operators.Profiling.writeTableStats(statsBatch(0), statsDir, "k")
    time("stats_append_2nd") {
      graft.operators.Profiling.appendTableStats(statsBatch(1), statsDir, "k"); 1L
    }
    (2 until 100).foreach(i =>
      graft.operators.Profiling.appendTableStats(statsBatch(i), statsDir, "k"))
    time("stats_append_101st") {
      graft.operators.Profiling.appendTableStats(statsBatch(100), statsDir, "k"); 1L
    }
    time("stats_read_after_101") {
      val (nRows, d, _) = graft.operators.Profiling.readStatsDriver(spark, statsDir, "k")
      assert(nRows == 101000L, s"exact-merge drift at turnover: n_rows=$nRows")
      d
    }
    locally {
      val entries = new java.io.File(statsDir).listFiles()
        .filter(_.getName.startsWith("entry-"))
      assert(entries.length == 1,
        s"stats catalog must hold ONE entry after turnover, got ${entries.length}")
    }

    // --- Incremental novelty gram store: ingest cost must track the
    // BATCH, not the store (the t42→t43 lifecycle). Deterministic docs:
    // ~80% of each doc's grams repeat corpus-wide templates, the rest are
    // id-salted (novel). Store grows by ~95% of docs, then two 5%-sized
    // crawls ingest+score — their cost should be flat in store size
    // (Bloom prefilter + batch-gram-keyed registry semi-join). ---------
    locally {
      val docsAll = spark.range(nDocs.toLong).select(
        col("id").as("doc_id"),
        expr("""concat_ws(' ',
             'the', 'quick', CAST(id % 37 AS STRING), 'fox', 'jumps',
             'over', CAST(id % 53 AS STRING), 'lazy', 'dog', 'tpl',
             CAST(id % 11 AS STRING), 'w1', 'w2', 'w3', 'w4',
             concat('u', CAST(id AS STRING)), 'tail', 'zz')""").as("text"))
        .cache()
      docsAll.count()
      val nv = s"$tmp/nvstore"
      time("novelty_ingest_base_90pct")(
        graft.operators.Curation.noveltyIngest(
          docsAll.filter(col("doc_id") % 20 < 18), nv).count())
      time("novelty_ingest_crawl_5pct_a")(
        graft.operators.Curation.noveltyIngest(
          docsAll.filter(col("doc_id") % 20 === 18), nv).count())
      time("novelty_ingest_crawl_5pct_b")(
        graft.operators.Curation.noveltyIngest(
          docsAll.filter(col("doc_id") % 20 === 19), nv).count())
      docsAll.unpersist()
    }

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
