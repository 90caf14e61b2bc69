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
    val q = emb
      .filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"))
    val scored = broadcast(q)
      .join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorMath.cosine(col("qe"), col("ce")))
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

  /** Deterministic pseudo-random hyperplane component for (bit b, dim d):
    * a value in (-0.5, 0.5) derived from an integer LCG-style mix — stateless
    * and engine-portable. */
  private def hyperComponent(b: Column, d: Column): Column = {
    val m = (b * lit(7919L) + d * lit(104729L) + lit(12345L)) % lit(1000003L)
    (m.cast("double") / lit(1000003.0d)) - lit(0.5d)
  }

  /** `nBits`-bit sign signature of each embedding under the deterministic
    * hyperplanes. Output: (vec_id, bucket). */
  def lshSignatures(emb: DataFrame, nBits: Int = 8): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bits = spark.createDataset(Seq.tabulate(nBits)(b => (b, 1L << b))).toDF("b", "p2")
    emb
      .crossJoin(broadcast(bits))
      .withColumn(
        "proj",
        aggregate(
          zip_with(
            col("embedding"),
            sequence(lit(0), size(col("embedding")) - 1),
            (x, d) => x.cast("double") * hyperComponent(col("b"), d)),
          lit(0.0d),
          (acc, x) => acc + x))
      .groupBy(col("vec_id"))
      .agg(sum(when(col("proj") > 0.0d, col("p2")).otherwise(lit(0L))).as("bucket"))
  }

  /** LSH-bucketed near-neighbor pairs: same-bucket (a < b) pairs scored with
    * exact cosine and filtered at `threshold`. The approximate analog of
    * [[Dedup.embeddingPairs]] that survives 100 TB. */
  def lshNeighbors(emb: DataFrame, nBits: Int = 8, threshold: Double = 0.3): DataFrame = {
    val sig = lshSignatures(emb, nBits)
    val withSig = emb.join(sig, Seq("vec_id"))
    val a = withSig.select(col("bucket"), col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val b = withSig.select(col("bucket"), col("vec_id").as("vec_b"), col("embedding").as("eb"))
    a.join(b, Seq("bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine", VectorMath.cosine(col("ea"), col("eb")))
      .filter(col("cosine") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cosine"), 7).as("cosine"))
      .distinct()
  }
}
