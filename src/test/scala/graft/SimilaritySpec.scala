package graft

import org.apache.spark.sql.functions.{aggregate, col, lit, zip_with}

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

  test("filteredTopK: predicate pre-filters the corpus; post-filtering would under-fill k") {
    // query 0's two nearest (1, 4) are label 0 — a post-filtered top-2
    // would return NOTHING with label 1; the pre-filter returns the two
    // best ELIGIBLE neighbors instead
    val labeled = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(0.9f, 0.1f), 0),
      (4L, Array(0.8f, 0.2f), 0),
      (2L, Array(0.7f, 0.3f), 1), (3L, Array(0.0f, 1.0f), 1),
      (5L, Array(0.6f, 0.4f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.filteredTopK(labeled, col("label") === 1,
      nQueries = 1, k = 2)
      .collect().map(r => (r.getLong(1), r.getLong(3))).toSeq
    assert(out === Seq((2L, 1L), (5L, 2L))) // best label-1 neighbors of (1,0)
  }

  test("lsh signatures put identical vectors in the same bucket") {
    val dup = Seq((0L, Array(1.0f, 2.0f, 3.0f)), (1L, Array(1.0f, 2.0f, 3.0f)),
      (2L, Array(-1.0f, -2.0f, -3.0f))).toDF("vec_id", "embedding")
    val sig = Similarity.lshSignatures(dup).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(0L) === sig(1L))
    assert(sig(0L) !== sig(2L)) // antipodal vectors flip every sign bit
  }

  test("ivf top-k finds exact duplicates and near neighbors in probed cells") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    // fixture embeddings are uniform-random (near-orthogonal), the hardest
    // case for any coarse quantizer — probe a high cell fraction here;
    // clustered real embeddings need far fewer probes.
    val ivf = Similarity.ivfTopK(emb, nQueries = 10, k = 5, cellBits = 4, nProbe = 8)
    val exact = Similarity.bruteForceTopK(emb, nQueries = 10, k = 5)
    val ivfPairs = ivf.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactPairs = exact.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // approximate: every query answered with up to k results (sparse probed
    // cells may hold fewer), and recall vs brute force is substantial
    // (deterministic for fixed data)
    assert(ivf.groupBy("query_id").count().collect()
      .forall(r => r.getLong(1) >= 1L && r.getLong(1) <= 5L))
    val recall = ivfPairs.intersect(exactPairs).size.toDouble / exactPairs.size
    assert(recall >= 0.3, s"IVF recall $recall too low")
  }

  test("lsh neighbors find the identical pair with cosine 1.0") {
    val dup = Seq((0L, Array(1.0f, 2.0f, 3.0f)), (1L, Array(1.0f, 2.0f, 3.0f)),
      (2L, Array(-1.0f, -2.0f, -3.0f))).toDF("vec_id", "embedding")
    val pairs = Similarity.lshNeighbors(dup, threshold = 0.99).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(pairs === Seq((0L, 1L, 1.0)))
  }

  test("knn join: queries meet bucket-mates, ranked by cosine, self excluded") {
    val dup = Seq(
      (0L, Array(1.0f, 2.0f, 3.0f)),   // query
      (1L, Array(1.0f, 2.0f, 3.0f)),   // identical → same bucket, cos 1.0
      (2L, Array(1.1f, 2.0f, 3.0f)),   // near → same bucket, cos < 1
      (3L, Array(-1.0f, -2.0f, -3.0f)) // antipodal → different bucket, invisible
    ).toDF("vec_id", "embedding")
    val out = Similarity.knnJoin(dup.filter($"vec_id" === 0L), dup, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(out.map(_._2) === Seq(1L, 2L)) // ranked: exact dup first; 3 never appears
    assert(out.head._3 === 1.0)
    assert(out.map(_._4) === Seq(1L, 2L))
  }

  test("hot-bucket salt split preserves scorer output exactly") {
    import org.apache.spark.sql.DataFrame
    // 30 near-identical vectors collapse into one bucket; cap=4 forces a
    // g=8 salt split there. The split must be invisible in the output —
    // same pairs, same cosines — only the task layout changes.
    val many = ((0L until 30L).map(i => (i, Array(1.0f, 2.0f, 3.0f + (i % 3) * 0.01f))) :+
      ((100L, Array(-1.0f, -2.0f, -3.0f)))).toDF("vec_id", "embedding")
    def pairSet(d: DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val basePairs = pairSet(Similarity.lshNeighbors(many, threshold = 0.9))
    assert(basePairs.nonEmpty)
    assert(pairSet(Similarity.lshNeighbors(many, threshold = 0.9, hotBucketCap = 4)) === basePairs)
    val q = many.filter($"vec_id" < 3)
    def knnSet(d: DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val baseKnn = knnSet(Similarity.knnJoin(q, many, k = 5))
    assert(baseKnn.nonEmpty)
    assert(knnSet(Similarity.knnJoin(q, many, k = 5, hotBucketCap = 4)) === baseKnn)
  }

  test("hot-bucket salt split keeps negative vec_ids pairable (floorMod)") {
    import org.apache.spark.sql.DataFrame
    // vec_ids from a 64-bit hash are negative half the time. A signed `%`
    // salt puts them in groups no non-negative-salt vector emits, silently
    // dropping their pairs whenever the bucket exceeds the cap.
    val many = ((0L until 30L)
      .map(i => (-i - 1L, Array(1.0f, 2.0f, 3.0f + (i % 3) * 0.01f))) :+
      ((100L, Array(-1.0f, -2.0f, -3.0f)))).toDF("vec_id", "embedding")
    def pairSet(d: DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val basePairs = pairSet(Similarity.lshNeighbors(many, threshold = 0.9))
    assert(basePairs.nonEmpty)
    assert(pairSet(Similarity.lshNeighbors(many, threshold = 0.9, hotBucketCap = 4)) === basePairs)
    val q = many.filter($"vec_id" >= -3L && $"vec_id" < 0L)
    def knnSet(d: DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val baseKnn = knnSet(Similarity.knnJoin(q, many, k = 5))
    assert(baseKnn.nonEmpty)
    assert(knnSet(Similarity.knnJoin(q, many, k = 5, hotBucketCap = 4)) === baseKnn)
  }

  test("random projection: hand-computed components, long format, sign structure") {
    // One 2-dim vector, kOut=2. q = (trunc(1.5·2^20), trunc(-0.5·2^20))
    //   = (1572864, -524288).
    // sign(i,j) = +1 iff ((i·131 + j + 17)² mod 97) < 48:
    //   (0,0): 17²=289, 289%97=95  → -1     (0,1): 18²=324, 324%97=33 → +1
    //   (1,0): 148²=21904, %97=79 → -1      (1,1): 149²=22201, %97=85 → -1
    val df = Seq((7L, Array(1.5f, -0.5f))).toDF("vec_id", "embedding")
    val out = Similarity.randomProjection(df, kOut = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === Set(
      (7L, 0L, -1572864L + -524288L),
      (7L, 1L, -1572864L + 524288L)))
    // Identical vectors project identically; a sign flip negates every dim.
    val pair = Seq((1L, Array(0.25f, 0.75f, -1.0f)), (2L, Array(0.25f, 0.75f, -1.0f)),
      (3L, Array(-0.25f, -0.75f, 1.0f))).toDF("vec_id", "embedding")
    val m = Similarity.randomProjection(pair, kOut = 4).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq).toMap
    assert(m(1L) === m(2L))
    assert(m(3L) === m(1L).map(-_))
  }

  test("VectorSumAgg rejects empty embedding vectors") {
    import org.apache.spark.sql.functions.col
    // A zero-length vector aliases the uninitialized-buffer sentinel: it
    // would skip the ragged check yet still inflate the centroid divisor.
    val rows = Seq((0L, Array.empty[Float]), (1L, Array(1.0f, 2.0f)))
      .toDF("vec_id", "embedding").coalesce(1)
    val ex = intercept[Throwable] {
      rows.agg(graft.functions.VectorSumAgg.vectorSum(col("embedding"))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("empty embedding")), messages(ex).mkString(" | "))
  }

  test("VectorSumAgg fails fast on ragged vector lengths") {
    import org.apache.spark.sql.functions.col
    // A ragged embedding column must error, not silently truncate to the
    // first-seen length (which would corrupt centroids partition-order-
    // dependently). One partition forces the lengths to meet in update().
    val ragged = Seq((0L, Array(1.0f, 2.0f)), (1L, Array(1.0f, 2.0f, 3.0f)))
      .toDF("vec_id", "embedding").coalesce(1)
    val ex = intercept[Throwable] {
      ragged.agg(graft.functions.VectorSumAgg.vectorSum(col("embedding"))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("ragged")), messages(ex).mkString(" | "))
  }

  test("sq8: codes hit the affine endpoints and the constant dim quantizes to 0") {
    // dim 0 spans [0,10] -> endpoints code 0 and 255, midpoint floor(127.5)=127;
    // dim 1 is constant -> mx=mn guard -> code 0 everywhere.
    val e = Seq(
      (0L, Array(0.0f, 7.0f)),
      (1L, Array(5.0f, 7.0f)),
      (2L, Array(10.0f, 7.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.sq8TopK(e, nQueries = 3, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // codes: v0=[0,0], v1=[127,0], v2=[255,0]; symmetric integer dots:
    assert(out((0L, 1L)) === 0L * 127L)
    assert(out((1L, 2L)) === 127L * 255L)
    assert(out((2L, 1L)) === 255L * 127L)
    // symmetry of the code dot product
    assert(out((1L, 2L)) === out((2L, 1L)))
  }

  test("sq8: dotL codegen kernel equals the HOF zip_with/aggregate fold") {
    val df = Seq(
      (Array(1L, 2L, 3L, 255L), Array(4L, 0L, 255L, 255L)),
      (Array(0L, 0L), Array(9L, 9L))
    ).toDF("a", "b")
    val both = df.select(
      graft.functions.GraftColumns.dotL(col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0L), _ + _).as("slow"))
      .collect()
    both.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    assert(both(0).getLong(0) === (4L + 0L + 765L + 65025L))
  }

  test("mutual top-k keeps only reciprocal pairs (hand-computed)") {
    val a = Seq((0L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val b = Seq((1L, Array(0.9f, 0.1f)), (3L, Array(0.6f, 0.8f))).toDF("vec_id", "embedding")
    // fwd top-1: 0→1 (0.994), 2→3 (0.8); bwd top-1: 1→0, 3→2 — both mutual.
    val out = Similarity.mutualTopK(a, b, k = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((0L, 1L), (2L, 3L)))
  }

  test("mutual top-k drops the non-reciprocal side of a contested target") {
    // Both sources' top-1 is the single target, but the target's top-1 is
    // source 2 (cos 0.9984 vs 0.9939) — mutuality keeps only (2, 1).
    val a = Seq((0L, Array(1.0f, 0.0f)), (2L, Array(0.95f, 0.05f))).toDF("vec_id", "embedding")
    val b = Seq((1L, Array(0.9f, 0.1f))).toDF("vec_id", "embedding")
    val out = Similarity.mutualTopK(a, b, k = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((2L, 1L)))
  }

  test("mutual top-k pairs are exactly the intersection of both directions' brute-force top-k") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .filter(col("vec_id") < 200)
    val a = emb.filter(col("vec_id") % 2 === 0)
    val b = emb.filter(col("vec_id") % 2 === 1)
    val k = 3
    val mutual = Similarity.mutualTopK(a, b, k).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // Independent derivation per direction from the same scored cross.
    def topk(q: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
      val rows = q.select(col("vec_id").as("qid"), col("embedding").as("qe")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      val cs = c.select(col("vec_id").as("cid"), col("embedding").as("ce")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      def cos(x: Array[Float], y: Array[Float]): Double = {
        var d = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
        while (i < x.length) { d += x(i).toDouble * y(i).toDouble; nx += x(i).toDouble * x(i).toDouble; ny += y(i).toDouble * y(i).toDouble; i += 1 }
        d / (math.sqrt(nx) * math.sqrt(ny))
      }
      rows.flatMap { case (qid, qe) =>
        cs.map { case (cid, ce) => (cid, cos(qe, ce)) }
          .sortBy { case (cid, s) => (-s, cid) }.take(k).map(p => (qid, p._1))
      }.toSet
    }
    val fwd = topk(a, b)
    val bwd = topk(b, a).map(_.swap)
    assert(mutual === fwd.intersect(bwd))
    assert(mutual.nonEmpty)
  }

  test("mmrRerank: diversity beats redundancy at equal relevance; exact greedy scores") {
    // 2-dim corpus with {0,1} coordinates → SQ8 codes are exactly {0,255}.
    // Query 0 = (1,1); candidates 1,2 = (1,0) twins; 3 = (0,1) diverse.
    // All three have equal relevance 255·255; plain top-k keeps the twins
    // adjacent, MMR must interleave the diverse vector at step 2.
    val emb = Seq(
      (0L, Seq(1f, 1f)), (1L, Seq(1f, 0f)), (2L, Seq(1f, 0f)), (3L, Seq(0f, 1f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.mmrRerank(emb, nQueries = 1, kCand = 25, kOut = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._4)
    val rel = 255L * 255L
    assert(out === Array(
      (0L, 1L, 7L * rel, 1L),             // tie on rel → smallest id
      (0L, 3L, 7L * rel, 2L),             // diverse: zero penalty vs 1
      (0L, 2L, 7L * rel - 3L * rel, 3L))) // twin pays the full penalty
  }

  test("signPack/hammingWords: strict-> sign bits, multi-word packing, planted distances") {
    import graft.functions.GraftColumns
    // 66 dims forces TWO packed words; mean 0 → bit = (x > 0).
    val dim = 66
    val base = Array.tabulate(dim)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val flip3 = base.clone(); flip3(0) *= -1; flip3(64) *= -1; flip3(65) *= -1
    val zeros = Array.fill(dim)(0.0f) // ties quantize to 0 (strict >)
    val df = Seq((0L, base), (1L, flip3), (2L, zeros)).toDF("vec_id", "embedding")
      .withColumn("code", GraftColumns.signPack(
        col("embedding"), lit(Array.fill(dim)(0.0d))))
    val codes = df.select("vec_id", "code").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(codes(0L).length == 2, "66 dims must pack into 2 words")
    assert(codes(2L) == Seq(0L, 0L), "x == mean is NOT a set bit")
    val ham = df.as("a").join(df.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id"),
        GraftColumns.hammingWords(col("a.code"), col("b.code")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(ham((0L, 1L)) == 3L, s"3 flipped dims → hamming 3, got ${ham((0L, 1L))}")
    assert(ham((0L, 2L)) == dim / 2, "base has 33 positive dims vs all-zero code")
  }

  test("binaryQuantTopK: planted near-duplicate survives the Hamming cut and reranks to 1") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val planted = emb.filter($"vec_id" < 3).select(
      ($"vec_id" + 10000L).as("vec_id"),
      zip_with($"embedding", $"embedding", (x, _) => x * lit(1.001f)).as("embedding"))
    val out = Similarity.binaryQuantTopK(
      emb.select("vec_id", "embedding").union(planted), nQueries = 3, k = 2)
    val top1 = out.filter($"rank" === 1L).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    (0L until 3L).foreach { q =>
      val (nbr, hamming) = top1(q)
      assert(nbr == q + 10000L, s"query $q: scaled twin should rank 1, got $nbr")
      assert(hamming == 0L, "a positively-scaled vector has identical sign bits")
    }
    assert(out.groupBy("query_id").count().collect().forall(_.getLong(1) == 2L))
  }

  test("ivfBinaryTopK: a positively-scaled twin shares cell AND code — rank 1, hamming 0") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val planted = emb.filter($"vec_id" < 3).select(
      ($"vec_id" + 10000L).as("vec_id"),
      zip_with($"embedding", $"embedding", (x, _) => x * lit(1.001f)).as("embedding"))
    val out = Similarity.ivfBinaryTopK(emb.union(planted), nQueries = 3, k = 2)
    val top1 = out.filter($"rank" === 1L).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    (0L until 3L).foreach { q =>
      assert(top1(q) === ((q + 10000L, 0L)),
        s"query $q: same-cell zero-hamming twin must rank 1")
    }
  }

  test("matryoshkaAudit: identity truncation → recall 10000; real truncation loses some") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val id = Similarity.matryoshkaAudit(emb, nQueries = 5, k = 3, dPrefix = 64).collect()
    assert(id.length == 5 && id.forall(r => r.getLong(1) == 3L && r.getLong(2) == 10000L))
    val cut = Similarity.matryoshkaAudit(emb, nQueries = 5, k = 3, dPrefix = 8).collect()
    assert(cut.length == 5, "zero-overlap queries must still report (right-join restore)")
    assert(cut.forall(r => r.getLong(2) == r.getLong(1) * 10000L / 3L))
  }

  test("multiProbeLshTopK: candidates are exactly the probed-bucket union (own + Hamming-1)") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val nBits = 8
    val mean = Similarity.meanAggDf(emb)
    val buckets = emb.crossJoin(org.apache.spark.sql.functions.broadcast(mean))
      .select($"vec_id", graft.functions.GraftColumns.hyperBucketC(
        $"embedding", $"__mean", nBits).as("bucket"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = Similarity.multiProbeLshTopK(emb, nQueries = 4, k = 1000, nBits = nBits)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    (0L until 4L).foreach { q =>
      val probed = (Set(buckets(q)) ++ (0 until nBits).map(b => buckets(q) ^ (1L << b)))
      val expected = buckets.collect {
        case (id, bk) if id != q && probed(bk) => id
      }.toSet
      assert(out.getOrElse(q, Set.empty) == expected,
        s"query $q candidate set mismatch (k unbounded)")
      // the single-probe (own-bucket) set is strictly a subset by construction
      val own = buckets.collect { case (id, bk) if id != q && bk == buckets(q) => id }.toSet
      assert(own.subsetOf(expected))
    }
  }
}
