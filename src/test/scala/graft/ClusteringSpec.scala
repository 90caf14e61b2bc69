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

  test("pqEncode: every vector coded; each subspace equals standalone kmeans on its slice") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val codes = Clustering.pqEncode(emb).cache()
    assert(codes.count() === emb.count())
    (0 until 4).foreach { i =>
      assert(codes.filter(col(s"c$i") < 0 || col(s"c$i") >= 8).isEmpty, s"code c$i out of range")
      val direct = Clustering.kmeans(
        emb.select(col("vec_id"), expr(s"slice(embedding, ${i * 16 + 1}, 16)").as("embedding")))
        .select(col("vec_id"), col("cluster").as(s"c$i"), col("sim").as(s"sim$i"))
      assert(codes.select(col("vec_id"), col(s"c$i"), col(s"sim$i"))
        .except(direct).isEmpty, s"subspace $i diverges from standalone kmeans")
    }
    codes.unpersist()
  }

  test("adcTopK: k rows per query, scores non-increasing, deterministic") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val out = Clustering.adcTopK(queries, emb, topK = 5).cache()
    val perQ = out.groupBy("q_id").agg(count(lit(1)).as("n"), max("rank").as("mx"))
      .collect()
    assert(perQ.nonEmpty)
    perQ.foreach(r => assert(r.getLong(1) === 5L && r.getLong(2) === 5L))
    // Scores are non-increasing in rank within each query.
    val byQ = out.collect().groupBy(_.getLong(0))
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_.getLong(3))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getDouble(2) >= b.getDouble(2))
        case _           => ()
      }
    }
    assert(out.except(Clustering.adcTopK(queries, emb, topK = 5)).isEmpty)
    out.unpersist()
  }

  test("ivfPqTopK: full probe ≡ exhaustive ADC; pruned probe keeps recall; deterministic") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter(col("vec_id") % 100 === 0)
    // Probing ALL 2^6 cells scores every (query, code) pair exactly once —
    // the composition must then be EQUAL to exhaustive adcTopK, row for row
    // (scores, ranks and all): the strongest composition check available.
    val full = Clustering.ivfPqTopK(queries, emb, nProbe = 64, topK = 5)
    val exhaustive = Clustering.adcTopK(queries, emb, topK = 5).cache()
    assert(full.except(exhaustive).isEmpty && exhaustive.except(full).isEmpty,
      "nProbe=all must reproduce exhaustive ADC exactly")
    // Default probe (8 of 64 cells ⇒ ~12.5% of pairs scored): still 5 rows
    // per query, and recall@5 against the exhaustive ADC ranking stays well
    // above the ~0.125 a random cell subset would give. The fixture value
    // is deterministic (0.44 on sf0.001's 800 vectors — ~12 vectors/cell
    // makes cell routing coarse; nProbe is the recall knob at scale).
    val pruned = Clustering.ivfPqTopK(queries, emb, topK = 5).cache()
    val perQ = pruned.groupBy("q_id").agg(count(lit(1)).as("n")).collect()
    assert(perQ.nonEmpty)
    perQ.foreach(r => assert(r.getLong(1) === 5L))
    val hits = pruned.select("q_id", "vec_id")
      .intersect(exhaustive.select("q_id", "vec_id")).count()
    val total = exhaustive.count()
    assert(hits.toDouble / total >= 0.4, s"recall@5 vs exhaustive ADC = $hits/$total")
    assert(pruned.except(Clustering.ivfPqTopK(queries, emb, topK = 5)).isEmpty)
    pruned.unpersist(); exhaustive.unpersist()
  }

  test("ivfPqRefineTopK: exact order over the shortlist; recall ≥ plain IVF-PQ; deterministic") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001").cache()
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val refined = Clustering.ivfPqRefineTopK(queries, emb, topK = 5).cache()
    // 5 rows per query, ranks 1..5, cosine non-increasing in rank.
    val perQ = refined.groupBy("q_id").agg(count(lit(1)).as("n"), max("rank").as("mx")).collect()
    assert(perQ.nonEmpty)
    perQ.foreach(r => assert(r.getLong(1) === 5L && r.getLong(2) === 5L))
    refined.collect().groupBy(_.getLong(0)).values.foreach { rows =>
      rows.sortBy(_.getLong(3)).sliding(2).foreach {
        case Array(a, b) => assert(a.getDouble(2) >= b.getDouble(2))
        case _           => ()
      }
    }
    // The refine's survivors are EXACTLY the exact-cosine top-5 of the
    // ADC shortlist: recompute the shortlist, exact-score it with the same
    // arithmetic, and compare row for row.
    val short = Clustering.ivfPqTopK(queries, emb, topK = 20).select("q_id", "vec_id")
    val qn = emb.select(col("vec_id").as("q_id"), col("embedding").as("qe"),
      graft.functions.VectorMath.norm2(col("embedding")).as("qn"))
    val cn = emb.select(col("vec_id"), col("embedding").as("ce"),
      graft.functions.VectorMath.norm2(col("embedding")).as("cn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
    val expected = short.join(cn, Seq("vec_id")).join(qn, Seq("q_id"))
      .withColumn("cosine",
        graft.functions.VectorMath.dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("vec_id"), round(col("cosine"), 7).as("cosine"), col("rank"))
    assert(refined.except(expected).isEmpty && expected.except(refined).isEmpty)
    // Exact re-ranking can only improve id-set agreement with the TRUE
    // exact top-5 (brute force over the full corpus) — on the fixture the
    // refined set's recall must be at least the unrefined IVF-PQ's.
    val exact = graft.operators.Similarity
      .bruteForceTopK(emb, nQueries = Int.MaxValue, k = 5) // self excluded — compare on ids only
    val exactIds = exact
      .filter(col("query_id") % 100 === 0)
      .select(col("query_id").as("q_id"), col("neighbor_id").as("vec_id"))
    val plain = Clustering.ivfPqTopK(queries, emb, topK = 5)
    def recall(df: org.apache.spark.sql.DataFrame): Long =
      df.select("q_id", "vec_id").intersect(exactIds).count()
    assert(recall(refined) >= recall(plain),
      "exact re-rank must not lose recall vs the unrefined composition")
    assert(refined.except(Clustering.ivfPqRefineTopK(queries, emb, topK = 5)).isEmpty)
    refined.unpersist(); emb.unpersist()
  }

  test("ivfPqResidualTopK: 5 per query, deterministic, and recall ≥ raw-PQ composition") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001").cache()
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val res = Clustering.ivfPqResidualTopK(queries, emb).cache()
    val perQ = res.groupBy("q_id").agg(count(lit(1)).as("n"), max("rank").as("mx")).collect()
    assert(perQ.nonEmpty)
    perQ.foreach(r => assert(r.getLong(1) === 5L && r.getLong(2) === 5L))
    // Residual quantization is finer at the same code budget: id-set
    // agreement with the exact top-5 must not fall below the raw-vector
    // composition's (deterministic on the fixture).
    val exactIds = graft.operators.Similarity
      .bruteForceTopK(emb, nQueries = Int.MaxValue, k = 5)
      .filter(col("query_id") % 100 === 0)
      .select(col("query_id").as("q_id"), col("neighbor_id").as("vec_id"))
    val raw = Clustering.ivfPqTopK(queries, emb)
    def recall(df: org.apache.spark.sql.DataFrame): Long =
      df.select("q_id", "vec_id").intersect(exactIds).count()
    val (rRes, rRaw) = (recall(res), recall(raw))
    assert(rRes >= rRaw, s"residual recall $rRes < raw recall $rRaw")
    assert(res.except(Clustering.ivfPqResidualTopK(queries, emb)).isEmpty)
    res.unpersist(); emb.unpersist()
  }

  private def Tables = graft.sources.Tables
}
