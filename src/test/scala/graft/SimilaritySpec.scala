package graft

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val emb = Seq(
    (0L, Array(1.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f)),
    (2L, Array(0.0f, 1.0f)),
    (3L, Array(-1.0f, 0.0f)),
    (4L, Array(0.8f, 0.2f))
  ).toDF("vec_id", "embedding")

  test("brute-force top-k ranks by cosine with deterministic tie-break") {
    val out = Similarity.bruteForceTopK(emb, nQueries = 1, k = 2).collect()
      .map(r => (r.getLong(1), r.getLong(3))).toSeq
    // query 0 = (1,0): nearest is 1 (cos≈0.994), then 4 (cos≈0.970)
    assert(out === Seq((1L, 1L), (4L, 2L)))
  }

  test("lsh signatures put identical vectors in the same bucket") {
    val dup = Seq((0L, Array(1.0f, 2.0f, 3.0f)), (1L, Array(1.0f, 2.0f, 3.0f)),
      (2L, Array(-1.0f, -2.0f, -3.0f))).toDF("vec_id", "embedding")
    val sig = Similarity.lshSignatures(dup).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(0L) === sig(1L))
    assert(sig(0L) !== sig(2L)) // antipodal vectors flip every sign bit
  }

  test("lsh neighbors find the identical pair with cosine 1.0") {
    val dup = Seq((0L, Array(1.0f, 2.0f, 3.0f)), (1L, Array(1.0f, 2.0f, 3.0f)),
      (2L, Array(-1.0f, -2.0f, -3.0f))).toDF("vec_id", "embedding")
    val pairs = Similarity.lshNeighbors(dup, threshold = 0.99).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(pairs === Seq((0L, 1L, 1.0)))
  }
}
