package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{GraftColumns, VectorMath, VectorSumAgg}

/** Embedding clustering for corpus curation — the operation behind
  * cluster-balanced data mixing and SemDeDup-style pruning at the topic
  * level: label every vector with a cluster so downstream sampling can
  * rebalance over-represented regions of embedding space.
  *
  * Spherical k-means (cosine assignment), made bit-reproducible so the
  * DuckDB oracle replays it exactly:
  *  - NO RNG anywhere. Seeds are the quantized means of the `k`
  *    most-populated deterministic LSH cells (population desc, cell id
  *    tie-break) — the same cells [[Similarity.ivfTopK]] uses.
  *  - Centroids are quantized-integer means ([[VectorSumAgg]]): BIGINT
  *    element sums of trunc(x·2^20), divided once — exact and
  *    order-independent, so shuffle order can't perturb them.
  *  - Assignment is the exact left-to-right cosine; ties break to the
  *    smaller cluster id on BOTH engines.
  *
  * Scale shape per iteration: one broadcast of K centroid rows against the
  * corpus (no corpus shuffle for scoring; the k×-replicated score rows
  * collapse to one row per vector in the partial aggregate before the
  * exchange), then one [[VectorSumAgg]] hash aggregate whose shuffle
  * carries one row per (cluster, partition). Rounds are a fixed small
  * constant — no convergence-dependent driver loop.
  */
object Clustering {

  /** (cluster, centroid array&lt;double&gt;) quantized means of `asg`'s
    * (cluster, embedding) rows. */
  private def centroidsOf(asg: DataFrame): DataFrame =
    asg.groupBy(col("cluster"))
      .agg(VectorSumAgg.vectorSum(col("embedding")).as("qsum"), count(lit(1)).as("n"))
      .select(
        col("cluster"),
        transform(
          col("qsum"),
          v => v.cast("double") / (col("n").cast("double") * lit(VectorSumAgg.Scale)))
          .as("centroid"))

  /** Assign every vector to its max-cosine centroid (ties → smaller
    * cluster id). The argmax is a map-side-combined aggregate over the
    * broadcast-scored rows — max of (sim, -cluster) — so the exchange
    * carries one row per vector, not one per (vector, cluster). */
  private def assign(emb: DataFrame, cents: DataFrame): DataFrame =
    emb.crossJoin(broadcast(cents))
      .withColumn(
        "sim",
        GraftColumns.dotFD(col("embedding"), col("centroid")) /
          (VectorMath.norm2(col("embedding")) * GraftColumns.normD(col("centroid"))))
      .groupBy(col("vec_id"))
      .agg(
        first(col("embedding")).as("embedding"), // identical across the group
        max(struct(col("sim"), (-col("cluster")).as("negc"))).as("best"))
      .select(
        col("vec_id"), col("embedding"),
        (-col("best.negc")).as("cluster"), col("best.sim").as("sim"))

  /** Deterministic spherical k-means: LSH-cell seeds refined by `iters`
    * Lloyd iterations, final assignment re-scored against the last
    * centroids. Output: (vec_id, cluster, sim) — one row per vector.
    * Each iteration re-reads `emb` (twice: assignment + centroid rebuild);
    * cache it before calling when iters > 1 or the source is remote. */
  def kmeans(emb: DataFrame, k: Int = 8, iters: Int = 1, cellBits: Int = 6): DataFrame = {
    val cells = emb.select(
      col("vec_id"), col("embedding"),
      GraftColumns.hyperBucket(col("embedding"), cellBits).as("cell"))
    // ≤ 2^cellBits rows → the single-partition ranking window is trivially
    // small; the heavy side (cells) joins against its broadcast.
    val topCells = cells.groupBy(col("cell")).agg(count(lit(1)).as("n"))
      .withColumn(
        "cluster",
        (row_number().over(Window.orderBy(col("n").desc, col("cell"))) - 1).cast("long"))
      .filter(col("cluster") < k)
      .select(col("cell"), col("cluster"))
    var cents = centroidsOf(
      cells.join(broadcast(topCells), Seq("cell")).select(col("cluster"), col("embedding")))
    var i = 0
    while (i < iters) {
      cents = centroidsOf(assign(emb, cents).select(col("cluster"), col("embedding")))
      i += 1
    }
    assign(emb, cents)
      .select(col("vec_id"), col("cluster"), round(col("sim"), 7).as("sim"))
  }

  /** Product-quantization encode — the compression half of IVF-PQ ANN:
    * split each vector into `m` contiguous `subDim`-dim subvectors, learn a
    * per-subspace codebook with the SAME deterministic [[kmeans]] (so the
    * oracle replays codebook learning too), and emit each vector's code —
    * the m nearest-centroid ids — plus the per-subspace assignment
    * similarity (the quantization-quality evidence). 64-dim vectors at
    * m=4, k=8 compress to 4 small ints (12 bits) + the codebooks; ADC
    * search then scores queries against codebooks instead of raw vectors.
    *
    * Plan shape: m independent kmeans passes over narrow slice frames
    * (each is the verified s5 pipeline: broadcast centroids, one
    * VectorSumAgg shuffle), then an m-way join of (vec_id, code) rows. A
    * throughput-tuned variant would fuse the m passes into one scan with a
    * combined aggregate; this form keeps each subspace bit-identical to
    * the standalone kmeans the gate already verifies. */
  def pqEncode(emb: DataFrame, m: Int = 4, subDim: Int = 16, k: Int = 8,
      cellBits: Int = 6): DataFrame = {
    def sub(i: Int): DataFrame = emb.select(
      col("vec_id"),
      expr(s"slice(embedding, ${i * subDim + 1}, $subDim)").as("embedding"))
    (0 until m).map { i =>
      kmeans(sub(i), k, iters = 1, cellBits = cellBits)
        .select(col("vec_id"), col("cluster").as(s"c$i"), col("sim").as(s"sim$i"))
    }.reduce(_.join(_, Seq("vec_id")))
  }
}
