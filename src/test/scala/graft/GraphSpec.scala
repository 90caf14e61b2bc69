package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pagerank: hand-computed fixed-point values on a 4-node graph") {
    // 0→1, 1→2, 2→1; node 3 isolated. All out-degrees 1.
    val nodes = Seq(0L, 1L, 2L, 3L).toDF("node_id")
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 1L)).toDF("src", "dst")
    // Round 1: in(1) = r(0)+r(2) = 2e6 → 150000 + 85·2e6/100 = 1,850,000
    //          in(2) = r(1)   = 1e6 → 1,000,000; 0 and 3 → base 150,000.
    val r1 = Graph.pagerank(nodes, edges, iters = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 === Map(0L -> 150000L, 1L -> 1850000L, 2L -> 1000000L, 3L -> 150000L))
    // Round 2: in(1) = 150000 + 1000000 → 150000 + 85·1150000 div 100 = 1,127,500
    //          in(2) = 1850000         → 150000 + 85·1850000 div 100 = 1,722,500
    val r2 = Graph.pagerank(nodes, edges, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 === Map(0L -> 150000L, 1L -> 1127500L, 2L -> 1722500L, 3L -> 150000L))
  }

  test("pagerank: iters=50 runs under the checkpoint cadence without plan blowup") {
    // 50 unrolled rounds without lineage cuts would build an enormous plan;
    // the CheckpointEvery cadence keeps each segment ≤ 5 rounds deep. The
    // fixed point is analytic: r0 = 150000 (no inflow),
    // r1 = 150000 + 0.85·(r0 + r2), r2 = 150000 + 0.85·r1 →
    // r1 = 405000 / 0.2775 ≈ 1,459,459 and r2 ≈ 1,390,540; integer
    // truncation only ever loses a few units per hop.
    val nodes = Seq(0L, 1L, 2L, 3L).toDF("node_id")
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 1L)).toDF("src", "dst")
    val r = Graph.pagerank(nodes, edges, iters = 50).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(0L) === 150000L && r(3L) === 150000L)
    // Within integer-truncation distance of the analytic fixed point.
    assert(math.abs(r(1L) - 1459459L) < 1000, s"r1=${r(1L)}")
    assert(math.abs(r(2L) - 1390540L) < 1000, s"r2=${r(2L)}")
  }

  test("pagerank: integer truncation never inflates total mass") {
    val docs = spark.read.parquet(sf("documents"))
    val n = docs.count()
    val ranks = Graph.pagerank(
      docs.select(col("doc_id").as("node_id")), Graph.docLinkGraph(docs))
    val total = ranks.agg(sum("rank_scaled")).head().getLong(0)
    // div truncation and (here absent) dangling mass only ever LOSE rank.
    assert(total <= n * Graph.RankScale)
    assert(total > n * Graph.RankScale / 2, s"total=$total — lost more than half the mass")
  }

  test("docLinkGraph: deterministic, in-range destinations, outDeg per node") {
    val docs = spark.read.parquet(sf("documents"))
    val n = docs.count()
    val e1 = Graph.docLinkGraph(docs, outDeg = 3)
    assert(e1.count() === 3 * n)
    assert(e1.filter(col("dst") < 0 || col("dst") >= n).isEmpty)
    val perSrc = e1.groupBy("src").count().filter(col("count") =!= 3)
    assert(perSrc.isEmpty)
    // Bit-identical on re-derivation (pure hash of the table).
    assert(e1.except(Graph.docLinkGraph(docs, outDeg = 3)).isEmpty)
  }

  test("triangles: K4 yields its 4 triangles; self-loops, multi-edges and direction ignored") {
    import spark.implicits._
    // K4 on {1,2,3,4} with noise: duplicated edges, reversed duplicates,
    // a self-loop, and a pendant vertex 5 (in no triangle).
    val edges = Seq(
      (1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (3L, 4L), (4L, 3L), (2L, 2L), (4L, 5L)
    ).toDF("src", "dst")
    val out = Graph.triangles(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
  }

  test("bfsDepths: min-hop distances on a hand graph; cycles and multi-edges don't inflate") {
    import spark.implicits._
    // 0→1→2→3 chain, a shortcut 0→3? no — 0→2 shortcut, a back-edge 3→0
    // (cycle), a duplicated edge, and an isolated node 9.
    val nodes = Seq(0L, 1L, 2L, 3L, 9L).toDF("node_id")
    val edges = Seq(
      (0L, 1L), (1L, 2L), (2L, 3L), (0L, 2L), (0L, 2L), (3L, 0L)
    ).toDF("src", "dst")
    val out = Graph.bfsDepths(nodes, edges, source = 0L, maxHops = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 2L)) // 9 unreached, absent
    // maxHops truncates: with 1 hop, node 3 is not yet reached
    val shallow = Graph.bfsDepths(nodes, edges, source = 0L, maxHops = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(shallow === Map(0L -> 0L, 1L -> 1L, 2L -> 1L))
  }

  test("triangles: star graph has none; hub orientation keeps fan-out at the spokes") {
    import spark.implicits._
    // hub 0 connected to 1..20: no triangles, and the degree orientation
    // points every edge spoke→hub (deg 1 < deg 20), so the wedge join has
    // zero fan-out at the hub — the skew-bounding property in miniature.
    val star = (1L to 20L).map(i => (0L, i)).toDF("src", "dst")
    assert(Graph.triangles(star).isEmpty)
    // adding one rim edge creates exactly one triangle
    val withRim = star.union(Seq((7L, 8L)).toDF("src", "dst"))
    assert(Graph.triangles(withRim).collect().toSeq.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))) === Seq((0L, 7L, 8L)))
  }

  test("kcore: cascading peel reaches the unique fixed point; loops/multi-edges ignored") {
    // 4-clique {1,2,3,4} + tail 4-5-6; a self-loop and a duplicate edge
    // must not inflate degrees
    val clique = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    val edges = (clique ++ Seq((4L, 5L), (5L, 6L), (5L, 5L), (4L, 5L)))
      .toDF("src", "dst")
    val core3 = Graph.kcore(edges, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core3 === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // k=2 peels 6 first, THEN 5 (two cascading rounds), keeping the clique
    val core2 = Graph.kcore(edges, 2).collect().map(_.getLong(0)).toSet
    assert(core2 === Set(1L, 2L, 3L, 4L))
    // a path has no 2-core at all — full cascade to empty
    val path = (1L until 5L).map(i => (i, i + 1)).toDF("src", "dst")
    assert(Graph.kcore(path, 2).isEmpty)
  }

  test("coreness: clique nodes 3, tail nodes 1, path all 1; capped at kMax") {
    val clique = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    val edges = (clique ++ Seq((4L, 5L), (5L, 6L))).toDF("src", "dst")
    val cn = Graph.coreness(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cn === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 1L, 6L -> 1L))
    // kMax caps: with kMax = 2 the clique reports 2
    val capped = Graph.coreness(edges, kMax = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped(1L) === 2L && capped(5L) === 1L)
  }

  test("labelPropagation: triangle converges to min label; bridged triangles split; oscillation is round-pinned") {
    // a triangle settles on its min id by round 3 and stays
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val t = Graph.labelPropagation(tri, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // two triangles joined by ONE bridge edge keep separate communities —
    // inside each triangle two neighbor votes agree, so the single
    // cross-community vote never wins the mode
    val two = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 10L), (3L, 10L)).toDF("src", "dst")
    val c = Graph.labelPropagation(two, rounds = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(c(1L), c(2L), c(3L)).size === 1)
    assert(Set(c(10L), c(11L), c(12L)).size === 1)
    assert(c(1L) !== c(10L), s"bridge must not merge the triangles: $c")
    // synchronous updates on a path OSCILLATE — the round count is part
    // of the contract, so round 4 is pinned exactly (hand-computed)
    val path = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("src", "dst")
    val p4 = Graph.labelPropagation(path, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p4 === Map(1L -> 1L, 2L -> 2L, 3L -> 1L, 5L -> 5L, 6L -> 6L))
    val p3 = Graph.labelPropagation(path, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p3 === Map(1L -> 2L, 2L -> 1L, 3L -> 2L, 5L -> 6L, 6L -> 5L))
  }
}
