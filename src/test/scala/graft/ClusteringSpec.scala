package graft

import graft.operators.Clustering

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  test("kmeans separates two directional groups and assigns every vector") {
    // Two tight cones around orthogonal directions; k=2 must split them.
    val emb = Seq(
      (0L, Array(1.0f, 0.05f, 0.0f)),
      (1L, Array(0.9f, -0.05f, 0.1f)),
      (2L, Array(1.1f, 0.0f, -0.05f)),
      (3L, Array(0.0f, 1.0f, 0.05f)),
      (4L, Array(0.1f, 0.9f, -0.05f)),
      (5L, Array(-0.05f, 1.1f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Clustering.kmeans(emb, k = 2, iters = 2, cellBits = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet === (0L until 6L).toSet)
    assert(Set(out(0L), out(1L), out(2L)).size === 1, "x-cone split")
    assert(Set(out(3L), out(4L), out(5L)).size === 1, "y-cone split")
    assert(out(0L) !== out(3L), "cones must land in different clusters")
  }

  test("kmeans is run-to-run deterministic") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    def runOnce() = Clustering.kmeans(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(runOnce() === runOnce())
  }

  private def Tables = graft.sources.Tables
}
