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

  /** `nBits`-bit sign signature of each embedding under deterministic
    * pseudo-random hyperplanes (component (b,d) =
    * ((b·7919 + d·104729 + 12345) mod 1000003)/1000003 − 0.5 — stateless,
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
    // rank cells per query by centroid cosine, keep nProbe
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

  /** LSH-bucketed near-neighbor pairs: same-bucket (a < b) pairs scored with
    * exact cosine and filtered at `threshold`. The approximate analog of
    * [[Dedup.embeddingPairs]] that survives 100 TB. Bucket and norm are
    * attached in ONE projection over the scan (no signature self-join), and
    * each unordered pair surfaces exactly once (each vector lives in exactly
    * one bucket), so no dedup pass is needed — the only shuffle is the
    * bucket-key pair join. */
  def lshNeighbors(emb: DataFrame, nBits: Int = 8, threshold: Double = 0.3): DataFrame = {
    val withSig = emb.select(
      col("vec_id"), col("embedding"),
      bucketOf(col("embedding"), nBits).as("bucket"),
      VectorMath.norm2(col("embedding")).as("nrm"))
    val a = withSig.select(col("bucket"), col("vec_id").as("vec_a"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = withSig.select(col("bucket"), col("vec_id").as("vec_b"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    a.join(b, Seq("bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine", VectorMath.dot(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("cosine") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cosine"), 7).as("cosine"))
  }
}
