package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{GraftColumns, VectorMath, VectorSumAgg}

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column.
  *
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline. The
  *    query side is tiny (a handful of probe vectors) and broadcast, so the
  *    plan is one pass over the corpus with a per-query top-k window — no
  *    corpus shuffle of full vectors, only the (query, candidate, score)
  *    triples move.
  *  - [[lshNeighbors]]: random-hyperplane LSH — the 100 TB path. Each vector
  *    gets a `nBits`-bit sign signature from deterministic pseudo-random
  *    hyperplanes (seeded by (bit, dim) hashing — no RNG state, so the same
  *    signature is computable anywhere, including a SQL oracle). Vectors are
  *    bucketed by signature; only same-bucket pairs are scored. Bucket join
  *    replaces the O(n²) pair space with Σ bucket².
  *  - [[ivfTopK]]: IVF (inverted-file) ANN — cells from the same
  *    deterministic LSH, quantized-mean centroids, multi-probe queries.
  */
object Similarity {

  /** Exact cosine top-k neighbors for each query vector (vec_id < nQueries),
    * excluding self. Output: (query_id, neighbor_id, cosine, rank). */
  def bruteForceTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 5): DataFrame = {
    // Norms are computed ONCE per side before the pair join — same double
    // value as a per-pair norm2() (identical computation on identical
    // data), a third of the per-pair flops.
    val q = emb
      .filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        VectorMath.norm2(col("embedding")).as("qn"))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"),
      VectorMath.norm2(col("embedding")).as("cn"))
    val scored = broadcast(q)
      .join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorMath.dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(
        col("query_id"),
        col("neighbor_id"),
        round(col("cosine"), 7).as("cosine"),
        col("rank"))
  }

  /** FILTERED exact top-k — vector search under a metadata predicate
    * ("nearest neighbors among label = X"), the serving shape every
    * production vector store grew in the RAG era. The load-bearing
    * decision is WHERE the filter runs: PRE-filter (here — the predicate
    * restricts the corpus side before any scoring, pushing to the scan)
    * returns k true neighbors from the eligible set; post-filtering an
    * unfiltered top-k under-fills or empties k whenever the filter is
    * selective (the classic filtered-ANN bug). Queries come from the
    * UNfiltered set — a query need not satisfy its own filter.
    *
    * Same plan as [[bruteForceTopK]]: query side broadcast, corpus side
    * one shuffle-free scored pass, per-query k by window over the
    * (cosine DESC, neighbor_id) total order. For the IVF-accelerated
    * variant at corpus scale, apply the same predicate to the CODES frame
    * before ADC scoring — selectivity composes with cell pruning. */
  def filteredTopK(emb: DataFrame, pred: Column, nQueries: Int = 10,
      k: Int = 5): DataFrame = {
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        VectorMath.norm2(col("embedding")).as("qn"))
    val c = emb.filter(pred)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"),
        VectorMath.norm2(col("embedding")).as("cn"))
    val scored = broadcast(q)
      .join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorMath.dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 7).as("cosine"), col("rank"))
  }

  /** `nBits`-bit sign signature of each embedding under deterministic
    * pseudo-random hyperplanes (component (b,d) =
    * (((b·104729 + d·7919 + 12345)²) mod 1000003)/1000003 − 0.5 — stateless,
    * engine-portable). The whole signature is ONE codegen'd expression
    * ([[graft.functions.HyperBucketExpr]]): projections and sign-bit fold in
    * a single pass, no intermediate array, no interpreted HOF lambdas.
    * Output: (vec_id, bucket). */
  def lshSignatures(emb: DataFrame, nBits: Int = 8): DataFrame =
    emb.select(col("vec_id"), bucketOf(col("embedding"), nBits).as("bucket"))

  /** The bucket column itself — callers attach it INLINE (one `select`)
    * instead of joining [[lshSignatures]] back against the corpus, which
    * would be a full self-join shuffle to add a computable column. */
  private def bucketOf(embedding: Column, nBits: Int): Column =
    GraftColumns.hyperBucket(embedding, nBits)

  /** IVF (inverted-file) ANN: a coarse quantizer partitions the corpus into
    * cells; queries probe only the `nProbe` nearest cells and brute-force
    * within them. Cells are the deterministic LSH buckets and each centroid
    * is its cell's QUANTIZED mean vector — element sums of
    * `trunc(x · 2^20)` BIGINTs (exact, order-independent — see
    * [[graft.functions.VectorSumAgg]]) divided by `n · 2^20`. A one-iteration
    * k-means seeded by LSH, reproducible bit-for-bit on any engine — no RNG,
    * no float-summation order dependence, so a SQL oracle can replay it.
    *
    * Scale shape: the centroid build is ONE hash aggregate on `cell` whose
    * map side folds every vector into a D-long buffer — the shuffle carries
    * one row per (cell, input partition), NOT the N·D explosion a
    * posexplode → groupBy(cell, dim) plan would ship. Probing broadcasts the
    * (query × probed-cell) table (≤ nQueries·nProbe rows) against the
    * corpus, so the corpus is never shuffled. At 100 TB the cell lists are
    * the pre-partitioned corpus (write them `partitionBy(cell)` and a probe
    * reads only nProbe partitions — partition pruning does the fan-in).
    */
  def ivfTopK(
      emb: DataFrame,
      nQueries: Int = 10,
      k: Int = 5,
      cellBits: Int = 6,
      nProbe: Int = 4): DataFrame = {
    val (assigned, probed) = ivfProbed(emb, nQueries, cellBits, nProbe)
    // brute-force inside the probed cells only; probed is ≤ nQueries·nProbe
    // rows → broadcast it so the corpus-side scan never shuffles.
    val cand = broadcast(probed).join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cosine", VectorMath.cosine(col("qe"), col("embedding")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    cand
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(col("cosine"), 7).as("cosine"), col("rank"))
  }

  /** The shared IVF front half: cell-assigned corpus + the per-query
    * probed-cell table (≤ nQueries·nProbe rows, broadcastable). Cells are
    * the deterministic LSH buckets; centroids the quantized-integer cell
    * means; queries keep the nProbe best cells under
    * (centroid-cosine DESC, cell). */
  private def ivfProbed(emb: DataFrame, nQueries: Int, cellBits: Int,
      nProbe: Int): (DataFrame, DataFrame) = {
    val assigned = emb.select(
      col("vec_id"), col("embedding"), bucketOf(col("embedding"), cellBits).as("cell"))
    val centroids = assigned
      .groupBy(col("cell"))
      .agg(VectorSumAgg.vectorSum(col("embedding")).as("qsum"), count(lit(1)).as("n"))
      .select(
        col("cell"),
        transform(
          col("qsum"),
          v => v.cast("double") / (col("n").cast("double") * lit(VectorSumAgg.Scale)))
          .as("centroid"))
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val wCell = Window.partitionBy(col("query_id"))
      .orderBy(col("cell_sim").desc, col("cell"))
    val probed = broadcast(q)
      .crossJoin(broadcast(centroids))
      .withColumn("cell_sim",
        GraftColumns.dotFD(col("qe"), col("centroid")) /
          (VectorMath.norm2(col("qe")) * GraftColumns.normD(col("centroid"))))
      .withColumn("cell_rank", row_number().over(wCell))
      .filter(col("cell_rank") <= nProbe)
      .select(col("query_id"), col("qe"), col("cell"))
    (assigned, probed)
  }

  /** IVF × binary quantization — the production composition SCALING #69
    * names: cell pruning bounds WHICH vectors are touched (nProbe of 2^
    * cellBits cells — at scale the cells are `partitionBy` files and the
    * probe prunes at file level, the s14 layout), binary codes bound WHAT
    * each touch costs (a 16-byte popcount instead of a 256-byte float
    * dot), and only the kCand Hamming survivors fetch full vectors for
    * the exact rerank. Everything deterministic — the same cells as
    * [[ivfTopK]], the same sign bits as [[binaryQuantTopK]] — so the SQL
    * oracle composes the two replays verbatim.
    * Output: (query_id, neighbor_id, hamming, cosine, rank). */
  def ivfBinaryTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 5,
      cellBits: Int = 6, nProbe: Int = 4, kCand: Int = 25): DataFrame = {
    import graft.functions.TopKAgg
    val (assigned, probed) = ivfProbed(emb, nQueries, cellBits, nProbe)
    val coded = assigned.crossJoin(broadcast(meanAggDf(emb)))
      .select(col("vec_id"), col("cell"),
        GraftColumns.signPack(col("embedding"), col("__mean")).as("code"))
    val qCodes = coded.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("code").as("qcode"))
    val probeCodes = probed.select(col("query_id"), col("cell"))
      .join(qCodes, Seq("query_id"))
    val cand = coded
      .join(broadcast(probeCodes),
        coded("cell") === probeCodes("cell") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"),
        (lit(0L) - GraftColumns.hammingWords(col("qcode"), col("code")))
          .cast("double").as("score"),
        col("vec_id"))
      // the #69 fence: keep the popcount in the codegen'd projection
      .withColumn("__pid", spark_partition_id())
      .groupBy(col("query_id"))
      .agg(TopKAgg.topK(col("score"), col("vec_id"), kCand).as("top"))
      .select(col("query_id"), explode(col("top")).as("c"))
      .select(col("query_id"), col("c.id").as("neighbor_id"),
        (lit(0L) - col("c.score")).cast("long").as("hamming"))
    hammingRerank(cand, emb, nQueries, k)
  }

  /** Shared exact-rerank tail of the Hamming candidate paths: fetch full
    * vectors for the (request-sized) candidate frame only, exact cosine,
    * rank on the raw doubles, round the survivors. */
  private def hammingRerank(cand: DataFrame, emb: DataFrame, nQueries: Int,
      k: Int): DataFrame = {
    val cFull = emb.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("ce"), VectorMath.norm2(col("embedding")).as("cn"))
    val qFull = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        VectorMath.norm2(col("embedding")).as("qn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    broadcast(cand)
      .join(cFull, Seq("neighbor_id"))
      .join(broadcast(qFull), Seq("query_id"))
      .withColumn("cosine",
        VectorMath.dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("hamming"),
        round(col("cosine"), 7).as("cosine"), col("rank"))
  }

  /** LSH-bucketed near-neighbor pairs: same-bucket (a < b) pairs scored with
    * exact cosine and filtered at `threshold`. The approximate analog of
    * [[Dedup.embeddingPairs]] that survives 100 TB. Bucket and norm are
    * attached in ONE projection over the scan (no signature self-join), and
    * each unordered pair surfaces exactly once (each vector lives in exactly
    * one bucket), so no dedup pass is needed — the only shuffle is the
    * bucket-key pair join. */
  final case class SigVec(bucket: Long, vec_id: Long, embedding: Array[Float], nrm: Double)
  final case class NeighborPair(vec_a: Long, vec_b: Long, cosine: Double)
  final case class TaggedVec(bucket: Long, vec_id: Long, embedding: Array[Float], nrm: Double, isQuery: Boolean)
  final case class ScoredPair(query_id: Long, neighbor_id: Long, cosine: Double)
  /** A bucket member replicated into one (lo, hi) salt-pair scoring group. */
  final case class SaltedVec(bucket: Long, lo: Int, hi: Int, salt: Int,
      vec_id: Long, embedding: Array[Float], nrm: Double)
  final case class SaltedFlagged(bucket: Long, lo: Int, hi: Int, salt: Int,
      vec_id: Long, embedding: Array[Float], nrm: Double, isNew: Boolean)
  final case class SaltedTagged(bucket: Long, qs: Int, cs: Int,
      vec_id: Long, embedding: Array[Float], nrm: Double, isQuery: Boolean)

  /** Members-per-task bound for the in-bucket scorers. A bucket larger than
    * this is split into `g = ceil(size / cap)` deterministic salt groups
    * (salt = vec_id % g) and scored across salt-pair groups, so one
    * adversarial bucket (all-identical vectors) parallelizes into
    * g·(g+1)/2 bounded tasks instead of serializing one O(bucket²) loop.
    * The split is EXACT — every unordered pair lands in exactly one
    * (min(salt_a, salt_b), max(salt_a, salt_b)) group — so output is
    * identical to the unsalted path (spec-asserted), unlike a drop-based
    * cap. Total work is still Σ bucket² (inherent to exact in-bucket
    * scoring); what the salt buys is that no single task owns it. */
  val HotBucketCap = 4096

  /** Approximate KNN JOIN: for every query vector, its top-k neighbors from
    * the corpus — the retrieval shape where BOTH sides are large, which
    * [[bruteForceTopK]]'s broadcast-the-queries plan can't serve. Both
    * sides are bucketed by the same deterministic hyperplanes; each bucket
    * group scores its query×corpus cross locally (queries only meet
    * bucket-mates — the LSH recall contract, as in [[lshNeighbors]]) and
    * the final per-query top-k is one window. The only shuffles are the
    * bucket group-by (each vector ships once) and the rank window on the
    * already-thresholdless but bucket-pruned candidate list. */
  def knnJoin(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int = 3,
      nBits: Int = 8,
      hotBucketCap: Int = HotBucketCap): DataFrame = {
    import queries.sparkSession.implicits._
    def tag(df: DataFrame, isQ: Boolean) = df.select(
      bucketOf(col("embedding"), nBits).as("bucket"),
      col("vec_id"), col("embedding"),
      VectorMath.norm2(col("embedding")).as("nrm"),
      lit(isQ).as("isQuery"))
    val tagged = tag(queries, isQ = true).unionByName(tag(corpus, isQ = false))
    // Per-bucket sizes for the hot-bucket split, as a count window over the
    // bucket shuffle: ONE pass over both inputs (a separate groupBy+join
    // re-derives the signatures/norms on a second full scan — measured as
    // the dominant cost at corpus scale since each signature is nBits dot
    // products). The window buffers one bucket per task, but only for a
    // streaming count — no quadratic work lives here.
    val wBn = Window.partitionBy(col("bucket"))
    val scored = tagged
      .withColumn("bn", count(lit(1)).over(wBn))
      .select(col("bucket"), col("vec_id"), col("embedding"), col("nrm"),
        col("isQuery"), col("bn"))
      .as[(Long, Long, Array[Float], Double, Boolean, Long)]
      .flatMap { case (bucket, vecId, e, nrm, isQ, bn) =>
        // Queries fan out across corpus-salt groups and vice versa: pair
        // (q, c) meets exactly once, in group (salt_q, salt_c). floorMod:
        // vec_ids from 64-bit hashes can be negative, and a signed `%`
        // would put them in salt groups no positive-salt vector ever
        // pairs with — silently dropping their candidates.
        val g = math.max(1L, (bn + hotBucketCap - 1) / hotBucketCap).toInt
        val s = java.lang.Math.floorMod(vecId, g)
        (0 until g).iterator.map { t =>
          if (isQ) SaltedTagged(bucket, s, t, vecId, e, nrm, isQuery = true)
          else SaltedTagged(bucket, t, s, vecId, e, nrm, isQuery = false)
        }
      }
      .groupByKey(v => (v.bucket, v.qs, v.cs))
      .flatMapGroups { (_: (Long, Int, Int), it: Iterator[SaltedTagged]) =>
        val vs = it.toArray
        val qs = vs.filter(_.isQuery)
        val cs = vs.filter(!_.isQuery)
        val out = scala.collection.mutable.ArrayBuffer.empty[ScoredPair]
        qs.foreach { q =>
          cs.foreach { c =>
            if (c.vec_id != q.vec_id) {
              var s = 0.0d
              var d = 0
              val n = math.min(q.embedding.length, c.embedding.length)
              while (d < n) { s += q.embedding(d).toDouble * c.embedding(d).toDouble; d += 1 }
              // RAW score: the left-to-right fold is already
              // bit-deterministic and the oracle ranks the same raw
              // doubles. Rounding here allocated a BigDecimal per scored
              // pair on the Σ bucket² hot path (the same troll measured on
              // ADC, SCALING.md #18c); only the k survivors round.
              out += ScoredPair(q.vec_id, c.vec_id, s / (q.nrm * c.nrm))
            }
          }
        }
        out.iterator
      }
      .toDF("query_id", "neighbor_id", "cosine")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 7).as("cosine"), col("rank"))
  }

  /** Mutual-top-k matching between two embedding sets — the bitext-mining
    * shape (LASER/CCMatrix): a candidate pair (a, b) is kept iff b is among
    * a's k nearest targets AND a is among b's k nearest sources. Mutuality
    * is the standard cheap filter that kills the hubness false positives a
    * one-directional kNN keeps (a "hub" vector that is everyone's neighbor
    * is only matched where the relation is reciprocal).
    *
    * This is the exhaustive verification twin (the s1 relationship): pairs
    * are scored ONCE, then ranked in both directions with two windows over
    * the same scored frame — the forward and backward ranks come from the
    * identical cosine doubles, so mutuality is exact. The corpus-scale
    * path composes [[knnJoin]] in both directions (bucketed candidates,
    * per-side top-k) and inner-joins the two rank frames on the pair key;
    * recall is then the LSH contract per direction, and this exhaustive
    * form is what a recall probe compares against.
    *
    * Determinism: ranks come from the (raw cosine DESC, id) total order —
    * the cosine doubles are left-to-right folds matching the oracle's
    * `list_reduce` exactly (the s11 association-order lesson); rounding
    * happens once on the final output. */
  def mutualTopK(embA: DataFrame, embB: DataFrame, k: Int = 3): DataFrame = {
    val a = embA.select(col("vec_id").as("src_id"), col("embedding").as("ae"),
      VectorMath.norm2(col("embedding")).as("an"))
    val b = embB.select(col("vec_id").as("tgt_id"), col("embedding").as("be"),
      VectorMath.norm2(col("embedding")).as("bn"))
    // Exhaustive twin: the source side is small by construction and rides a
    // broadcast; the target side streams through in one pass.
    val scored = b.crossJoin(broadcast(a))
      .withColumn("cosine", VectorMath.dot(col("ae"), col("be")) / (col("an") * col("bn")))
      .select(col("src_id"), col("tgt_id"), col("cosine"))
    val wf = Window.partitionBy(col("src_id")).orderBy(col("cosine").desc, col("tgt_id"))
    val wb = Window.partitionBy(col("tgt_id")).orderBy(col("cosine").desc, col("src_id"))
    scored
      .withColumn("rank_fwd", row_number().over(wf).cast("long"))
      .withColumn("rank_bwd", row_number().over(wb).cast("long"))
      .filter(col("rank_fwd") <= k && col("rank_bwd") <= k)
      .select(col("src_id"), col("tgt_id"), col("rank_fwd"), col("rank_bwd"),
        round(col("cosine"), 7).as("cosine"))
  }

  /** Deterministic random-projection dimensionality reduction: each
    * embedding down to `kOut` ±1 sign-projection components (long format —
    * one row per (vec_id, dim) so the reduced space can feed group-bys and
    * joins without array columns). Pure per-row codegen expression
    * ([[graft.functions.RandProjExpr]]), no shuffle; the quantized
    * integer-sum components are bit-identical cross-engine. At 100 TB this
    * is the standard pre-step that shrinks ANN index build cost by D/kOut
    * while approximately preserving cosine structure (sign-JL). */
  def randomProjection(emb: DataFrame, kOut: Int = 16): DataFrame =
    emb
      .select(col("vec_id"),
        posexplode(GraftColumns.randProj(col("embedding"), kOut)).as(Seq("dim", "rp")))
      .select(col("vec_id"), col("dim").cast("long").as("dim"), col("rp"))

  /** Hard-negative mining for contrastive training: for each query vector,
    * the top-k most-similar corpus vectors carrying a DIFFERENT label —
    * the "looks alike, isn't" pairs a contrastive/embedding trainer wants
    * as negatives (in-batch random negatives are mostly easy; the value is
    * in the near-boundary ones). Same plan as [[bruteForceTopK]] — tiny
    * query side broadcast, one corpus pass, per-query top-k window — plus
    * the label inequality pushed into the join condition, so excluded
    * same-label pairs are never scored. The production-scale variant runs
    * the same label filter inside the IVF-PQ probe path; this exhaustive
    * form is its verification baseline (the s1 relationship). */
  def hardNegatives(emb: DataFrame, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val q = emb
      .filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("label").as("q_label"),
        col("embedding").as("qe"), VectorMath.norm2(col("embedding")).as("qn"))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("label").as("n_label"),
      col("embedding").as("ce"), VectorMath.norm2(col("embedding")).as("cn"))
    val scored = broadcast(q)
      .join(c, col("q_label") =!= col("n_label")) // label filter IS the join condition
      .withColumn("cosine", VectorMath.dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("n_label").cast("long").as("neg_label"),
        round(col("cosine"), 7).as("cosine"), col("rank"))
  }

  /** Scalar quantization (SQ8) exhaustive search: per-dimension affine
    * int8 codes (x → ⌊(x − min_d)·255/(max_d − min_d)⌋, clamped) scored
    * symmetrically with the exact integer dot product of the code arrays.
    * This is Faiss `IndexScalarQuantizer` / SQ8's shape — the OTHER
    * memory-bandwidth answer beside PQ: 4× smaller than float32 with no
    * codebook training, so the exhaustive scan runs at ¼ the bytes (the
    * binding resource of a brute-force pass at 100 TB), and the same codes
    * drop into the IVF cell layout exactly like PQ codes do.
    *
    * Determinism: the per-dim min/max are exact doubles, the quantization
    * expression is the same single multiply-divide-floor shape on both
    * engines, and scores are pure BIGINT sums (order-independent) — so the
    * oracle hash-matches value-for-value, and ties rank under the total
    * (score DESC, neighbor_id) order.
    *
    * Plan shape: one tiny per-dim stats aggregate (dims rows → ONE array
    * row, broadcast), a map-only encode pass, then the brute-force-top-k
    * join shape (queries broadcast, corpus codes never shuffled — only
    * (query, neighbor, score) triples move into the per-query top-k). */
  def sq8TopK(emb: DataFrame, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val coded = sq8Codes(emb)
    val q = coded.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("codes").as("qcodes"))
    val scored = coded
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        GraftColumns.dotL(col("qcodes"), col("codes")).as("score_scaled"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_scaled").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("score_scaled"), col("rank"))
  }

  /** The SQ8 encode stage of [[sq8TopK]], exposed so composing operators
    * ([[mmrRerank]]) quantize the corpus ONCE: per-dimension corpus
    * min/max → code = ⌊(x−mn)·255/(mx−mn)⌋ clamped to [0,255], BIGINT.
    * Output: (vec_id, codes array<bigint>). */
  def sq8Codes(emb: DataFrame): DataFrame = {
    // Per-dimension min/max over the corpus, collapsed to one broadcastable
    // row of dim-indexed arrays (array_sort on (dim, …) structs pins order).
    val stats = emb
      .select(posexplode(col("embedding")).as(Seq("dim", "xf")))
      .select(col("dim"), col("xf").cast("double").as("x"))
      .groupBy(col("dim"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .groupBy()
      .agg(array_sort(collect_list(struct(col("dim"), col("mn"), col("mx")))).as("st"))
      .select(
        transform(col("st"), s => s.getField("mn")).as("mn_arr"),
        transform(col("st"), s => s.getField("mx")).as("mx_arr"))
    // Encode: map-only against the broadcast stats row. The HOF lambda only
    // captures attribute refs (mn_arr/mx_arr are materialized columns), so
    // interpreted re-evaluation per element is an array index, not a
    // recomputed expression (CLAUDE.md HOF invariant).
    emb.crossJoin(broadcast(stats))
      .select(col("vec_id"),
        transform(col("embedding"), (x, i) => {
          val mn = element_at(col("mn_arr"), (i + lit(1)).cast("int"))
          val mx = element_at(col("mx_arr"), (i + lit(1)).cast("int"))
          when(mx === mn, lit(0L)).otherwise(
            least(lit(255L), greatest(lit(0L),
              floor((x.cast("double") - mn) * lit(255.0d) / (mx - mn)))))
        }).as("codes"))
  }

  /** Maximal Marginal Relevance diversified re-rank (Carbonell &
    * Goldstein, SIGIR'98): greedily pick `kOut` of each query's `kCand`
    * SQ8 candidates maximizing
    * `λ·relevance − (1−λ)·max_{s∈selected} sim(d, s)` — the standard
    * redundancy-aware selection for retrieval results and for
    * diversity-constrained training-data sampling. λ is the exact
    * fraction lamNum/lamDen, relevance is the SQ8 integer dot against
    * the query, and the inter-candidate similarity is the SQ8 dot too —
    * the whole objective is BIGINT (scores ≤ lamDen·64·255² ≈ 4·10⁸),
    * so both engines replay the greedy argmax chain exactly, ties broken
    * by neighbor_id.
    *
    * Scale shape: candidate generation is [[sq8TopK]]'s serving plan
    * (the corpus quantized ONCE via [[sq8Codes]]); everything after is
    * (queries × kCand)-sized — the greedy loop is inherently sequential
    * per query, so it runs in `flatMapGroups` over each query's ≤ kCand
    * local rows (the sanctioned in-bucket-scorer pattern), never touching
    * the corpus. Output: (query_id, neighbor_id, mmr_scaled, sel_rank),
    * sel_rank 1..kOut in selection order; mmr_scaled may be negative
    * (penalty-dominated picks). */
  def mmrRerank(emb: DataFrame, nQueries: Int = 10, kCand: Int = 25,
      kOut: Int = 5, lamNum: Long = 7L, lamDen: Long = 10L): DataFrame = {
    require(kOut >= 1 && kCand >= kOut && lamDen > 0 && lamNum >= 0 &&
      lamNum <= lamDen,
      s"bad MMR params kCand=$kCand kOut=$kOut lambda=$lamNum/$lamDen")
    val spark = emb.sparkSession
    import spark.implicits._
    val coded = sq8Codes(emb)
    val q = coded.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("codes").as("qcodes"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_scaled").desc, col("neighbor_id"))
    val cand = coded
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        GraftColumns.dotL(col("qcodes"), col("codes")).as("score_scaled"),
        col("codes"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kCand)
    val dlam = lamDen - lamNum
    cand
      .select(col("query_id"), col("neighbor_id"), col("score_scaled"),
        col("codes"))
      .as[(Long, Long, Long, Array[Long])]
      .groupByKey(_._1)
      .flatMapGroups { (qid: Long, it: Iterator[(Long, Long, Long, Array[Long])]) =>
        // deterministic local order (rel desc, id) — the argmax scan below
        // re-ranks anyway, but a pinned input order keeps debugging sane
        val rows = it.toArray.sortBy(r => (-r._3, r._2))
        val n = rows.length
        val taken = new Array[Boolean](n)
        val penalty = new Array[Long](n) // max sim vs selected so far
        var last = -1 // most recently selected index
        val out = new scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)](math.min(kOut, n))
        var step = 1
        while (step <= math.min(kOut, n)) {
          if (last >= 0) {
            val b = rows(last)._4
            var i = 0
            while (i < n) {
              if (!taken(i)) {
                val a = rows(i)._4
                var d = 0L
                var j = 0
                val len = math.min(a.length, b.length)
                while (j < len) { d += a(j) * b(j); j += 1 }
                if (d > penalty(i)) penalty(i) = d
              }
              i += 1
            }
          }
          var best = -1
          var bestScore = Long.MinValue
          var i = 0
          while (i < n) {
            if (!taken(i)) {
              val sc = lamNum * rows(i)._3 - dlam * penalty(i)
              if (best < 0 || sc > bestScore ||
                (sc == bestScore && rows(i)._2 < rows(best)._2)) {
                best = i
                bestScore = sc
              }
            }
            i += 1
          }
          taken(best) = true
          last = best
          out += ((qid, rows(best)._2, bestScore, step.toLong))
          step += 1
        }
        out.iterator
      }
      .toDF("query_id", "neighbor_id", "mmr_scaled", "sel_rank")
  }

  def lshNeighbors(
      emb: DataFrame,
      nBits: Int = 8,
      threshold: Double = 0.3,
      hotBucketCap: Int = HotBucketCap): DataFrame =
    // CENTERED hyperplane buckets: raw sign-LSH on embeddings with a
    // dominant direction collapses most of the corpus into the all-bits-0/
    // all-bits-1 buckets (measured: 60% of 100k vectors in 2 of 256
    // buckets → Σ bucket² ≈ 1.9G scored pairs). Subtracting the corpus
    // mean balances every hyperplane. The mean is the quantized-integer
    // mean ([[VectorSumAgg]] — order-independent BIGINT sums), so it and
    // every downstream bucket is bit-reproducible in the DuckDB oracle.
    // One extra tiny aggregate + a broadcast 1-row cross join.
    lshNeighborsCentered(
      emb.select(col("vec_id"), col("embedding"), lit(true).as("is_new")),
      meanAggDf(emb), nBits, threshold, hotBucketCap)

  /** The quantized-integer corpus mean as a broadcastable 1-row frame
    * (`__mean` array<double>) — [[lshNeighbors]]'s centering basis. */
  def meanAggDf(emb: DataFrame): DataFrame =
    emb
      .agg(VectorSumAgg.vectorSum(col("embedding")).as("qsum"), count(lit(1)).as("n"))
      .select(transform(col("qsum"),
        v => v.cast("double") / (col("n").cast("double") * lit(VectorSumAgg.Scale))).as("__mean"))

  /** The raw quantized sums behind [[meanAggDf]], collected (one row of
    * dim longs — driver-trivial): what a store persists to PIN its
    * centering basis at creation. */
  def quantizedSums(emb: DataFrame): (Seq[Long], Long) = {
    val r = emb
      .agg(VectorSumAgg.vectorSum(col("embedding")).as("qsum"), count(lit(1)).as("n"))
      .collect().head
    (r.getSeq[Long](0), r.getLong(1))
  }

  /** [[meanAggDf]] rebuilt from PERSISTED quantized sums — the arithmetic
    * is replayed operation-for-operation (BIGINT→double cast, one divide)
    * so a center pinned at store creation reproduces bit-identical bucket
    * assignments in every later run. */
  def meanDfFromQuantized(spark: org.apache.spark.sql.SparkSession,
      qsum: Seq[Long], n: Long): DataFrame =
    spark.range(1).select(
      transform(array(qsum.map(lit): _*),
        v => v.cast("double") / (lit(n).cast("double") * lit(VectorSumAgg.Scale)))
        .as("__mean"))

  /** [[lshNeighbors]] generalized over an EXPLICIT centering frame and an
    * `is_new` flag column: only pairs with at least one new member are
    * scored (old↔old suppressed — the incremental-store contract of
    * [[graft.operators.Dedup.incrementalSemanticPairs]]); with every row
    * flagged new this IS lshNeighbors. The center must be pinned by the
    * caller when history spans runs: re-deriving it per run would move
    * bucket boundaries and silently change the candidate set between
    * arrivals (the LSH analog of retraining a quantizer in place —
    * re-center by rebuilding the store, the optimizeIndex convention).
    *
    * Scoring happens INSIDE each bucket group, not on a join's output: a
    * bucket self-join materializes Σ bucket² pair rows each carrying both
    * full embeddings (~1 KB/row — measured 938M rows ≈ 1 TB of row traffic
    * at 100k clone-heavy vectors, 89 s) only to discard 99.7% at the
    * threshold. Here the ONE shuffle ships each vector once (group by
    * bucket), and the pairwise loop scores local compact arrays, emitting
    * only survivors — same left-to-right double dot, same half-up 7-dp
    * round, each unordered pair still seen exactly once (a vector lives in
    * exactly one bucket, and the salt split routes it to exactly one
    * salt-pair group), so the output set is join-equivalent. Bucket
    * population scales with corpus / 2^nBits — raise nBits with corpus
    * size (standard LSH practice); the [[HotBucketCap]] salt split bounds
    * the task size when one bucket goes pathological anyway. */
  def lshNeighborsCentered(
      embFlagged: DataFrame,
      meanDf: DataFrame,
      nBits: Int = 8,
      threshold: Double = 0.3,
      hotBucketCap: Int = HotBucketCap): DataFrame = {
    import embFlagged.sparkSession.implicits._
    val withBucket = embFlagged.crossJoin(broadcast(meanDf))
      .select(
        col("vec_id"), col("embedding"), col("is_new"),
        GraftColumns.hyperBucketC(col("embedding"), col("__mean"), nBits).as("bucket"),
        VectorMath.norm2(col("embedding")).as("nrm"))
    // Bucket sizes via a count window over the bucket shuffle: one corpus
    // pass (a groupBy+join twin recomputes the mean aggregate and every
    // hyperplane signature on a second scan).
    val wBn = Window.partitionBy(col("bucket"))
    withBucket
      .withColumn("bn", count(lit(1)).over(wBn))
      .select(col("bucket"), col("vec_id"), col("embedding"), col("nrm"),
        col("bn"), col("is_new"))
      .as[(Long, Long, Array[Float], Double, Long, Boolean)]
      .flatMap { case (bucket, vecId, e, nrm, bn, isNew) =>
        val g = math.max(1L, (bn + hotBucketCap - 1) / hotBucketCap).toInt
        // floorMod: negative vec_ids must land in the same 0..g-1 salt
        // space as everyone else or their pairs are silently never scored.
        val s = java.lang.Math.floorMod(vecId, g)
        (0 until g).iterator.map { t =>
          SaltedFlagged(bucket, math.min(s, t), math.max(s, t), s, vecId, e, nrm, isNew)
        }
      }
      .groupByKey(v => (v.bucket, v.lo, v.hi))
      .flatMapGroups { (key: (Long, Int, Int), it: Iterator[SaltedFlagged]) =>
        val sameSalt = key._2 == key._3 // (s,s) group: all pairs; else cross-salt only
        val vs = it.toArray
        java.util.Arrays.sort(vs, (x: SaltedFlagged, y: SaltedFlagged) => java.lang.Long.compare(x.vec_id, y.vec_id))
        val out = scala.collection.mutable.ArrayBuffer.empty[NeighborPair]
        var i = 0
        while (i < vs.length) {
          val a = vs(i)
          var j = i + 1
          while (j < vs.length) {
            val b = vs(j)
            if ((a.isNew || b.isNew) && (sameSalt || a.salt != b.salt)) {
              var s = 0.0d
              var d = 0
              val n = math.min(a.embedding.length, b.embedding.length)
              while (d < n) { s += a.embedding(d).toDouble * b.embedding(d).toDouble; d += 1 }
              val cos = s / (a.nrm * b.nrm)
              // Raw score here; the HALF_UP round happens once per FINAL
              // output row below (codegen round(), same BigDecimal
              // semantics) — the pair loop stays allocation-free.
              if (cos >= threshold) out += NeighborPair(a.vec_id, b.vec_id, cos)
            }
            j += 1
          }
          i += 1
        }
        out.iterator
      }
      .toDF("vec_a", "vec_b", "cosine")
      .withColumn("cosine", round(col("cosine"), 7))
  }

  /** Binary-quantization ANN (the 1-bit/dim serving path modern vector
    * stores ship as "BQ"): each vector is packed into ⌈dim/64⌉ sign-bit
    * words against the quantized corpus mean ([[graft.functions
    * .GraftExprs.signPack]] — centering balances the bits exactly like
    * [[lshNeighbors]]' centered hyperplanes), candidates are the `kCand`
    * nearest by HAMMING distance over the packed words (popcount of XOR —
    * the 32×-smaller surrogate scan), and only those survivors fetch full
    * vectors for the exact cosine re-rank.
    *
    * Scale shape: the encode is map-only (one broadcast mean row); the
    * Hamming scan joins the corpus CODES (16 bytes/row at dim 64) against
    * the broadcast query codes and collapses map-side through the bounded
    * [[graft.functions.TopKAgg]] (score = −hamming, so (score DESC, id)
    * IS (hamming ASC, id) — the exchange carries ≤ kCand rows per (query,
    * partition), never the |Q|·|N| pair stream); the re-rank touches
    * exactly |Q|·kCand full vectors via a broadcast-candidate join (one
    * corpus scan, request-sized build side). Everything is deterministic
    * — strict `>` sign bits on exact doubles, integer Hamming, total
    * orders with id tie-breaks — so a SQL oracle replays it bit-for-bit.
    * Output: (query_id, neighbor_id, hamming, cosine, rank). */
  def binaryQuantTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 5,
      kCand: Int = 25): DataFrame = {
    import graft.functions.TopKAgg
    val coded = emb.crossJoin(broadcast(meanAggDf(emb)))
      .select(col("vec_id"),
        GraftColumns.signPack(col("embedding"), col("__mean")).as("code"))
    val qCodes = coded.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("code").as("qcode"))
    val cand = coded
      .join(broadcast(qCodes), col("vec_id") =!= col("query_id"))
      .select(col("query_id"),
        (lit(0L) - GraftColumns.hammingWords(col("qcode"), col("code")))
          .cast("double").as("score"),
        col("vec_id"))
      // Nondeterministic fence: CollapseProject would otherwise fold the
      // Hamming expression into the aggregate, where TypedImperative
      // update() evaluates it INTERPRETED per candidate row (measured
      // 126 s for 200 queries × 2M codes; fenced, the popcount stays in
      // the codegen'd projection and the agg reads a bound double).
      .withColumn("__pid", spark_partition_id())
      .groupBy(col("query_id"))
      .agg(TopKAgg.topK(col("score"), col("vec_id"), kCand).as("top"))
      .select(col("query_id"), explode(col("top")).as("c"))
      .select(col("query_id"), col("c.id").as("neighbor_id"),
        (lit(0L) - col("c.score")).cast("long").as("hamming"))
    hammingRerank(cand, emb, nQueries, k)
  }

  /** Matryoshka-truncation audit (Kusupati et al., NeurIPS'22 — MRL): how
    * much retrieval quality survives keeping only the first `dPrefix` of
    * `dim` embedding dimensions? Serving stacks truncate stored vectors
    * 2–8× to cut memory and ANN cost; this measures the price on the
    * corpus itself instead of trusting the model card. Per query: exact
    * top-k under the TRUNCATED metric vs exact top-k under the full
    * metric, overlap and recall in basis points — all integer verdicts
    * from two deterministic rank chains, so the oracle replays it
    * exactly. Both chains are [[bruteForceTopK]]'s shape (broadcast
    * queries, one corpus pass each, no corpus shuffle).
    * Output: (query_id, n_overlap, recall_bp). */
  def matryoshkaAudit(emb: DataFrame, nQueries: Int = 10, k: Int = 5,
      dPrefix: Int = 16): DataFrame = {
    val full = bruteForceTopK(emb, nQueries, k)
      .select(col("query_id"), col("neighbor_id"))
    val trunc = bruteForceTopK(
      emb.select(col("vec_id"), slice(col("embedding"), 1, dPrefix).as("embedding")),
      nQueries, k)
      .select(col("query_id"), col("neighbor_id"))
    full.join(trunc, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_overlap"))
      // queries with ZERO overlap would vanish from the join — restore
      // them from the full side so the audit can report recall 0
      .join(full.select(col("query_id")).distinct(), Seq("query_id"), "right")
      .select(col("query_id"), coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .withColumn("recall_bp", expr(s"n_overlap * 10000L div ${k}L"))
  }

  /** Multi-probe LSH top-k (Lv et al., VLDB'07): instead of adding hash
    * tables to recover recall, each query probes its OWN centered-
    * hyperplane bucket plus all `nBits` buckets at Hamming distance 1
    * from its signature — the buckets a near-neighbor most likely fell
    * into when one projection's sign flipped. Candidate cost grows by
    * the probed buckets' population (× ~(nBits+1) in expectation), while
    * a table-multiplication recall fix multiplies the whole index.
    *
    * Scale shape: the corpus gets its bucket inline (one map pass, the
    * [[lshNeighborsCentered]] convention — never a self-join to attach a
    * computable column); the (query × probe) table is ≤ |Q|·(nBits+1)
    * rows and broadcasts; candidates within probed buckets are scored
    * with the exact cosine and collapsed map-side by the bounded
    * [[graft.functions.TopKAgg]], so the corpus is never shuffled by a
    * search. Each corpus vector lives in exactly ONE bucket and the
    * probe set is distinct buckets, so no candidate is scored twice.
    * Output: (query_id, neighbor_id, cosine, rank). */
  def multiProbeLshTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 5,
      nBits: Int = 8): DataFrame = {
    import graft.functions.TopKAgg
    val withB = emb.crossJoin(broadcast(meanAggDf(emb)))
      .select(col("vec_id"), col("embedding"),
        GraftColumns.hyperBucketC(col("embedding"), col("__mean"), nBits).as("bucket"),
        VectorMath.norm2(col("embedding")).as("nrm"))
    val masks = array((0 until nBits).map(b => lit(1L << b)): _*)
    val probes = withB.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"),
        explode(concat(array(col("bucket")),
          transform(masks, m => col("bucket").bitwiseXOR(m)))).as("probe"))
    val scored = withB
      .join(broadcast(probes),
        col("bucket") === col("probe") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"),
        (VectorMath.dot(col("qe"), col("embedding")) / (col("qn") * col("nrm")))
          .as("score"),
        col("vec_id"))
      // the #69 fence: keep the exact-cosine dot in the codegen'd
      // projection — without it CollapseProject folds the score into the
      // typed aggregate's child and update() re-evaluates it interpreted
      .withColumn("__pid", spark_partition_id())
      .groupBy(col("query_id"))
      .agg(TopKAgg.topK(col("score"), col("vec_id"), k).as("top"))
    scored
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
        round(col("col.score"), 7).as("cosine"),
        (col("pos") + 1).cast("long").as("rank"))
  }
}
