package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorMath

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
    * engine-portable; computed by the codegen'd
    * [[graft.functions.GraftExprs.hyperProj]] in one pass, no cross join,
    * no shuffle). Output: (vec_id, bucket). */
  def lshSignatures(emb: DataFrame, nBits: Int = 8): DataFrame = {
    val powers = typedlit(Seq.tabulate(nBits)(b => 1L << b))
    emb.select(
      col("vec_id"),
      aggregate(
        zip_with(
          graft.functions.GraftColumns.hyperProj(col("embedding"), nBits),
          powers,
          (p, w) => when(p > 0.0d, w).otherwise(lit(0L))),
        lit(0L),
        (acc, x) => acc + x).as("bucket"))
  }

  /** IVF (inverted-file) ANN: a coarse quantizer partitions the corpus into
    * cells; queries probe only the `nProbe` nearest cells and brute-force
    * within them. Cells here are the deterministic LSH buckets and each
    * centroid is its cell's mean vector — a one-iteration k-means seeded by
    * LSH, reproducible anywhere (no RNG). At scale the cell lists are the
    * pre-partitioned corpus (write them `partitionBy(cell)` and a probe
    * reads only nProbe partitions — partition pruning does the fan-in).
    */
  def ivfTopK(
      emb: DataFrame,
      nQueries: Int = 10,
      k: Int = 5,
      cellBits: Int = 6,
      nProbe: Int = 4): DataFrame = {
    val cells = lshSignatures(emb, cellBits).withColumnRenamed("bucket", "cell")
    val assigned = emb.join(cells, Seq("vec_id"))
    // centroid = element-wise mean per cell (posexplode → avg → re-assemble
    // in dimension order).
    val centroids = assigned
      .select(col("cell"), posexplode(col("embedding")).as(Seq("d", "x")))
      .groupBy("cell", "d")
      .agg(avg(col("x")).as("m"))
      .groupBy("cell")
      .agg(array_sort(collect_list(struct(col("d"), col("m")))).as("dm"))
      .select(col("cell"), transform(col("dm"), e => e.getField("m")).as("centroid"))
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    // rank cells per query by centroid cosine, keep nProbe
    val wCell = Window.partitionBy(col("query_id"))
      .orderBy(col("cell_sim").desc, col("cell"))
    val probed = broadcast(q)
      .crossJoin(broadcast(centroids))
      .withColumn("cell_sim",
        VectorMath.dot(col("qe"), col("centroid")) /
          (VectorMath.norm2(col("qe")) * VectorMath.norm2(col("centroid"))))
      .withColumn("cell_rank", row_number().over(wCell))
      .filter(col("cell_rank") <= nProbe)
      .select(col("query_id"), col("qe"), col("cell"))
    // brute-force inside the probed cells only
    val cand = probed.join(assigned, Seq("cell"))
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
    * [[Dedup.embeddingPairs]] that survives 100 TB. */
  def lshNeighbors(emb: DataFrame, nBits: Int = 8, threshold: Double = 0.3): DataFrame = {
    val sig = lshSignatures(emb, nBits)
    val withSig = emb.join(sig, Seq("vec_id"))
      .select(col("vec_id"), col("embedding"), col("bucket"),
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
      .distinct()
  }
}
