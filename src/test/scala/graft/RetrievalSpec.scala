package graft

import graft.operators.{Retrieval, Similarity}

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def rankList(pairs: (Long, Long)*) =
    pairs.toDF("doc_id", "rank")

  test("rrf fuses two lists with hand-computed integer scores") {
    // doc 1: rank 1 in A, rank 2 in B; doc 2: only A (rank 2);
    // doc 3: only B (rank 1).
    val a = rankList(1L -> 1L, 2L -> 2L)
    val b = rankList(3L -> 1L, 1L -> 2L)
    val out = Retrieval.rrfFuse(Seq("a" -> a, "b" -> b), topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val c = (r: Long) => 1000000L / (60L + r)
    assert(out === Array(
      (1L, 1L, 2L, c(1) + c(2)), // 16393 + 16129 — both lists
      (3L, 0L, 1L, c(1)), // absent rank surfaces as 0, contributes nothing
      (2L, 2L, 0L, c(2))))
  }

  test("rrf over a single list preserves that list's order") {
    val a = rankList(7L -> 1L, 8L -> 2L, 9L -> 3L)
    val out = Retrieval.rrfFuse(Seq("only" -> a), topK = 2)
      .collect().map(_.getLong(0))
    assert(out === Array(7L, 8L))
  }

  test("rrf ties on equal scores break by doc_id") {
    // Same rank in symmetric lists → identical scores; order must be by id.
    val a = rankList(5L -> 1L, 9L -> 2L)
    val b = rankList(9L -> 1L, 5L -> 2L)
    val out = Retrieval.rrfFuse(Seq("a" -> a, "b" -> b), topK = 10)
      .collect().map(_.getLong(0))
    assert(out === Array(5L, 9L))
  }

  private def topk(rows: (Long, Long, Long)*) =
    rows.toDF("query_id", "neighbor_id", "rank")

  test("retrieval metrics: hand-computed hits, first-hit rank, and dropout row") {
    val exact = topk(
      (0L, 10L, 1L), (0L, 11L, 2L), (0L, 12L, 3L),
      (1L, 20L, 1L), (1L, 21L, 2L), (1L, 22L, 3L),
      (2L, 30L, 1L), (2L, 31L, 2L), (2L, 32L, 3L))
    val approx = topk(
      // q0: miss, hit(11)@2, hit(10)@3 → hits 2, first hit rank 2
      (0L, 99L, 1L), (0L, 11L, 2L), (0L, 10L, 3L),
      // q1: all misses → 0 hits, mrr 0
      (1L, 98L, 1L), (1L, 97L, 2L), (1L, 96L, 3L))
    // q2: absent from approx entirely → must still emit a (0, 0, 0) row
    val out = Retrieval.retrievalMetrics(exact, approx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out === Array(
      (0L, 2L, 2L, 500000L),
      (1L, 0L, 0L, 0L),
      (2L, 0L, 0L, 0L)))
  }

  test("ndcgAtK: hand-computed integer DCG chain; dropped query emits 0, perfect list 10000 bp") {
    val exact = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L), (2L, 20L, 1L))
      .toDF("query_id", "neighbor_id", "rank")
    // q1: hits at approx ranks 1 and 3, miss at 2; q2: dropped entirely
    val approx = Seq((1L, 11L, 1L), (1L, 99L, 2L), (1L, 10L, 3L))
      .toDF("query_id", "neighbor_id", "rank")
    val w = Retrieval.ndcgWeights(5).toMap
    val out = Retrieval.ndcgAtK(exact, approx, k = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val idcg1 = w(1) + w(2) + w(3)
    assert(out(1L) === ((w(1) + w(3), idcg1, (w(1) + w(3)) * 10000L / idcg1)))
    assert(out(2L) === ((0L, w(1), 0L)))
    // a perfect ordering scores exactly 10000 basis points
    val perfect = Retrieval.ndcgAtK(exact, exact, k = 5).collect()
    assert(perfect.forall(_.getLong(3) === 10000L))
  }

  test("maxSimTopK matches a brute-force MaxSim over the candidate set; non-candidates absent") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (0L, "red fox jumps over the dog"),
      (1L, "red red fox"),          // shares tokens, dup doc token
      (2L, "blue whale swims deep"), // NO shared token → never scored
      (3L, "the dog sleeps"),
      (4L, "fox dog red the over jumps extra words here")
    ).toDF("doc_id", "text")
    // query has a DUPLICATE token — each position must contribute
    val queries = Seq((100L, "red fox red dog")).toDF("query_id", "text")
    val out = Retrieval.maxSimTopK(queries, docs, k = 10)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._3)
    // reference reimplementation (same portable hash chain)
    def ph(s: String) = s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
    def emb(t: String) = (0 until 4).map { d =>
      val m = (ph(t) + (d + 1).toLong * 2654435761L) % 1000000007L
      (m * m) % 97L
    }
    def maxsim(q: String, doc: String): Long =
      q.trim.split(" +").take(6).map { qt =>
        doc.trim.split(" +").distinct.map { dt =>
          emb(qt).zip(emb(dt)).map { case (a, b) => a * b }.sum
        }.max
      }.sum
    val docMap = Map(0L -> "red fox jumps over the dog", 1L -> "red red fox",
      3L -> "the dog sleeps", 4L -> "fox dog red the over jumps extra words here")
    val expected = docMap.map { case (id, t) => id -> maxsim("red fox red dog", t) }
    assert(out.map(p => p._1 -> p._2).toMap === expected)
    assert(!out.exists(_._1 === 2L), "token-disjoint doc must not be scored")
    // ranks dense 1..n under (maxsim desc, doc_id)
    assert(out.map(_._3) === (1L to out.length.toLong).toArray)
    val resorted = out.sortBy(p => (-p._2, p._1)).map(_._3)
    assert(resorted === (1L to out.length.toLong).toArray)
  }

  test("maxSimTopK: k truncates per query; queries are isolated") {
    val docs = Seq(
      (0L, "a b c"), (1L, "a d"), (2L, "b e"), (3L, "c f"), (4L, "a b")
    ).toDF("doc_id", "text")
    val queries = Seq((1L, "a b"), (2L, "c")).toDF("query_id", "text")
    val out = Retrieval.maxSimTopK(queries, docs, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(out.count(_._1 == 1L) === 2 && out.count(_._1 == 2L) === 2)
    assert(out.forall(_._2 <= 2L))
  }

  test("retrieval metrics of a list against itself are perfect") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val exact = Similarity.bruteForceTopK(emb, nQueries = 3, k = 4)
    val out = Retrieval.retrievalMetrics(exact, exact).collect()
    assert(out.length === 3)
    out.foreach { r =>
      assert(r.getLong(1) === 4L) // all k hit
      assert(r.getLong(2) === 1L) // first hit at rank 1
      assert(r.getLong(3) === 1000000L)
    }
  }
}
