package graft

import org.apache.spark.sql.functions._

import graft.operators.FuzzyJoin

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("selfJoin finds substitution, insertion and deletion pairs; distance-2 excluded") {
    val strs = Seq(
      (1L, "spark"),  // vs sparc: substitution
      (2L, "sparc"),
      (3L, "sparks"), // vs spark: insertion
      (4L, "spar"),   // vs spark: deletion; vs sparc: deletion too
      (5L, "scala")   // distance >= 2 from all
    ).toDF("id", "s")
    val out = FuzzyJoin.selfJoin(strs)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // sparc↔sparks (distance 2) and everything↔scala must be absent.
    assert(out === Set(
      ("sparc", "spark", 1L),
      ("spark", "sparks", 1L),
      ("spar", "spark", 1L),
      ("spar", "sparc", 1L)), s"got $out")
  }

  test("selfJoin recall equals brute-force levenshtein on the customer fixture") {
    val c = Tables.customer(spark, "/root/testdata/sf0.001")
      .select(col("c_custkey").as("id"), col("c_name").as("s"))
    val fast = FuzzyJoin.selfJoin(c)
    val brute = c.as("a").join(c.as("b"), col("a.s") < col("b.s"))
      .filter(levenshtein(col("a.s"), col("b.s")) <= 1)
      .select(col("a.s").as("name_a"), col("b.s").as("name_b"),
        levenshtein(col("a.s"), col("b.s")).cast("long").as("dist"))
    assert(fast.count() > 0)
    assert(fast.except(brute).isEmpty && brute.except(fast).isEmpty,
      "deletion-neighborhood candidates must have FULL recall at distance 1")
  }

  test("maxDist=2: depth-2 neighborhoods have full recall at levenshtein ≤ 2") {
    // hand cases covering every 2-edit composition: 2 substitutions,
    // 2 deletions, 2 insertions, substitution+deletion, far pairs excluded
    val strs = Seq(
      (1L, "spark"), (2L, "spurk"), (3L, "sturk"),  // 1~2 sub; 1~3 two subs
      (4L, "spa"),                                   // 1~4 two deletions
      (5L, "sparkle"),                               // 1~5 two insertions
      (6L, "park"),                                  // 1~6 del; 6~4 ?
      (7L, "xxxxx")).toDF("id", "s")
    val out = FuzzyJoin.selfJoinIds(strs, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = strs.as("a").join(strs.as("b"), col("a.id") < col("b.id"))
      .filter(levenshtein(col("a.s"), col("b.s")) <= 2)
      .select(col("a.id"), col("b.id"),
        levenshtein(col("a.s"), col("b.s")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === brute)
    assert(out.contains((1L, 3L, 2L)) && out.contains((1L, 4L, 2L)) &&
      out.contains((1L, 5L, 2L)), s"2-edit compositions must be found: $out")
    assert(!out.exists(p => p._1 == 7L || p._2 == 7L))
  }

  test("maxDist=2 recall equals brute force on the customer fixture") {
    val c = Tables.customer(spark, "/root/testdata/sf0.001")
      .select(col("c_custkey").as("id"), col("c_name").as("s"))
    val fast = FuzzyJoin.selfJoinIds(c, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = c.as("a").join(c.as("b"), col("a.id") < col("b.id"))
      .filter(levenshtein(col("a.s"), col("b.s")) <= 2)
      .select(col("a.id"), col("b.id"),
        levenshtein(col("a.s"), col("b.s")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fast.nonEmpty && fast === brute,
      "depth-2 deletion neighborhoods must have FULL recall at distance 2")
  }

  test("jaroWinkler expression: DuckDB-probed constants, byte semantics, boost threshold") {
    import graft.functions.GraftColumns
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),   // the textbook transposition
      ("dixon", "dicksonx", 0.8133333333333332),
      ("abc", "abc", 1.0),
      ("", "abc", 0.0),
      ("DWAYNE", "DUANE", 0.8400000000000001),
      ("abcdef", "abzzzz", 0.5555555555555555),   // jaro ≤ 0.7 → NO prefix boost
      ("abcdxx", "abzdxx", 0.9111111111111112),
      ("éa", "éb", 0.8222222222222222),           // BYTE-level (3-byte é)
      ("ab", "ba", 0.0))                          // window 0 — no cross match
    val df = cases.zipWithIndex
      .map { case ((a, b, e), i) => (i.toLong, a, b, e) }
      .toDF("i", "a", "b", "expect")
      .withColumn("jw", GraftColumns.jaroWinkler(col("a"), col("b")))
    df.collect().foreach { r =>
      assert(r.getDouble(4) === r.getDouble(3),
        s"jw(${r.getString(1)}, ${r.getString(2)})")
    }
  }

  test("damerauLevenshtein expression: DuckDB-probed constants — TRUE DL, byte semantics") {
    import graft.functions.GraftColumns
    val cases = Seq(
      ("CA", "ABC", 2L),          // unrestricted DL (OSA answers 3)
      ("ab", "ba", 1L),           // adjacent transposition
      ("martha", "marhta", 1L),
      ("kitten", "sitting", 3L),
      ("", "abc", 3L),
      ("éa", "aé", 2L),           // byte-level (3-byte é)
      ("abcdef", "abcfed", 2L),
      ("xabx", "xbax", 1L),
      ("aa", "aaa", 1L))
    val df = cases.zipWithIndex
      .map { case ((a, b, e), i) => (i.toLong, a, b, e) }
      .toDF("i", "a", "b", "expect")
      .withColumn("d", GraftColumns.damerauLevenshtein(col("a"), col("b")))
    df.collect().foreach { r =>
      assert(r.getLong(4) === r.getLong(3),
        s"dl(${r.getString(1)}, ${r.getString(2)})")
    }
  }

  test("damerauPairs: transpositions pair at distance 1 where levenshtein charges 2; recall ≡ brute force") {
    val strs = Seq((1L, "martha"), (2L, "marhta"), (3L, "martha"),
      (4L, "zzzzzz")).toDF("id", "s")
    val out = FuzzyJoin.damerauPairs(strs, maxDist = 1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(out((1L, 2L)) === 1L, s"transposition must be one Damerau edit: $out")
    assert(out((1L, 3L)) === 0L && out((2L, 3L)) === 1L)
    assert(!out.keySet.exists(p => p._1 == 4L || p._2 == 4L))
    // full recall at radius 2 on the fixture: candidates vs brute force
    val c = Tables.customer(spark, "/root/testdata/sf0.001")
      .select(col("c_custkey").as("id"), col("c_name").as("s"))
    val fast = FuzzyJoin.damerauPairs(c, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = c.as("a").join(c.as("b"), col("a.id") < col("b.id"))
      .withColumn("d", graft.functions.GraftColumns.damerauLevenshtein(col("a.s"), col("b.s")))
      .filter(col("d") <= 2)
      .select(col("a.id"), col("b.id"), col("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fast.nonEmpty && fast === brute)
  }

  test("jaroRescoredPairs: exactly the lev-bounded jw-thresholded relation; prefix typos score below suffix typos") {
    val strs = Seq(
      (1L, "catherine"), (2L, "katherine"),  // leading sub: lev 1, lower jw
      (3L, "catherinz"),                     // trailing sub: lev 1, higher jw
      (4L, "zzzzzzzzz")).toDF("id", "s")
    val out = FuzzyJoin.jaroRescoredPairs(strs, threshold = 0.9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(out.contains((1L, 3L)) && out.contains((1L, 2L)))
    assert(out((1L, 3L)) > out((1L, 2L)),
      s"a trailing typo must outscore a leading one at the same distance: $out")
    assert(!out.keySet.exists(p => p._1 == 4L || p._2 == 4L))
    // the relation is exactly {lev ≤ 2 ∧ jw ≥ t} — brute-force twin
    val brute = strs.as("a").join(strs.as("b"), col("a.id") < col("b.id"))
      .filter(levenshtein(col("a.s"), col("b.s")) <= 2)
      .withColumn("jw", graft.functions.GraftColumns.jaroWinkler(col("a.s"), col("b.s")))
      .filter(col("jw") >= 0.9)
      .select(col("a.id"), col("b.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.keySet === brute)
  }

  test("exact duplicates under distinct ids appear once with dist 0") {
    val strs = Seq((1L, "same"), (2L, "same"), (3L, "diff")).toDF("id", "s")
    val out = FuzzyJoin.selfJoin(strs)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(out === Set(("same", "same", 0L)))
  }

  test("id-level pairs match brute force and close into entities") {
    val strs = Seq(
      (1L, "anna"), (2L, "anne"), (3L, "ann"), // chain: 1~2 (sub), 1~3, 2~3 (del)
      (4L, "bob"), (5L, "bob"), // exact dup under distinct ids
      (6L, "zed")).toDF("id", "s")
    val pairs = FuzzyJoin.selfJoinIds(strs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs === Set((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L), (4L, 5L, 0L)))
    // feed the edge list to clustering: {1,2,3}, {4,5}, {6} with min reps
    val er = graft.operators.Dedup.clusters(
      strs.select(col("id").as("doc_id")),
      FuzzyJoin.selfJoinIds(strs).select(col("id_a").as("doc_a"), col("id_b").as("doc_b")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(er === Map(
      1L -> ((1L, 1L)), 2L -> ((1L, 0L)), 3L -> ((1L, 0L)),
      4L -> ((4L, 1L)), 5L -> ((4L, 0L)), 6L -> ((6L, 1L))))
  }

  test("selfJoinEdges: closure over the edge subset equals closure over all pairs; hot names stay linear") {
    // popularity-skewed corpus: 40 copies each of 50 names in 10
    // distance-1 families of 5 (suffix a..e), plus unique tails
    val strs = spark.range(2000L).selectExpr(
      "id",
      """concat('name', lpad(CAST(((id % 50) div 5) AS STRING), 3, '0'),
         chr(97 + CAST(id % 5 AS INT)))""").toDF("id", "s")
      .union(spark.range(2000L, 2200L).selectExpr(
        "id", "concat('uniq', CAST(id * 37 AS STRING))").toDF("id", "s"))
    val edges = FuzzyJoin.selfJoinEdges(strs)
    val pairs = FuzzyJoin.selfJoinIds(strs)
      .select(col("id_a"), col("id_b"))
    // the edge subset is dramatically smaller than the full pair set ...
    val (ne, np) = (edges.count(), pairs.count())
    assert(ne < np / 10, s"edges $ne should be far fewer than pairs $np")
    // ... yet the connected components are identical
    val nodes = strs.select(col("id").as("doc_id"))
    def labels(e: org.apache.spark.sql.DataFrame) =
      graft.operators.Dedup.clusters(nodes,
          e.select(col("id_a").as("doc_a"), col("id_b").as("doc_b")))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(labels(edges) === labels(pairs))
  }

  test("scored edges (jaro/damerau): closure at a threshold equals the full rescored pair set's; far fewer rows") {
    // same popularity-skewed shape as the selfJoinEdges case: scores
    // depend only on strings, so star edges (identity score) + rep-level
    // scored edges span exactly the thresholded pair relation's closure
    val strs = spark.range(1000L).selectExpr(
      "id",
      """concat('name', lpad(CAST(((id % 50) div 5) AS STRING), 3, '0'),
         chr(97 + CAST(id % 5 AS INT)))""").toDF("id", "s")
    val nodes = strs.select(col("id").as("doc_id"))
    def labels(e: org.apache.spark.sql.DataFrame) =
      graft.operators.Dedup.clusters(nodes,
          e.select(col("id_a").as("doc_a"), col("id_b").as("doc_b")))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // Jaro-Winkler at the default threshold
    val jwEdges = FuzzyJoin.jaroRescoredEdges(strs)
    val jwPairs = FuzzyJoin.jaroRescoredPairs(strs)
    assert(jwEdges.count() < jwPairs.count() / 10)
    assert(labels(jwEdges) === labels(jwPairs))
    // star rows carry the identity score; rep rows the conformant one
    assert(jwEdges.filter(col("jw") < 0.94).count() === 0)
    // Damerau at radius 2
    val dlEdges = FuzzyJoin.damerauEdges(strs)
    val dlPairs = FuzzyJoin.damerauPairs(strs)
    assert(dlEdges.count() < dlPairs.count() / 10)
    assert(labels(dlEdges) === labels(dlPairs))
  }

  test("incrementalPairs: parity-split ingests ≡ one-shot at the PAIR level; re-ingest idempotent") {
    val c = Tables.customer(spark, "/root/testdata/sf0.001")
      .select(col("c_custkey").as("id"), col("c_name").as("s"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_fuzzy_store").toString + "/store"
    val p1 = FuzzyJoin.incrementalPairs(c.filter(col("id") % 2 === 0), dir)
    assert(p1.count() > 0, "even batch must find within-batch pairs")
    val p2 = FuzzyJoin.incrementalPairs(c.filter(col("id") % 2 === 1), dir)
    val inc = p1.unionByName(p2)
    val oneShot = FuzzyJoin.selfJoinIds(c)
    assert(inc.except(oneShot).isEmpty && oneShot.except(inc).isEmpty,
      "union of per-batch pair outputs must equal the one-shot join")
    // batch 2 must emit cross-parity pairs (new↔history), not just new↔new
    assert(p2.filter(col("id_a") % 2 =!= col("id_b") % 2).count() > 0,
      "second ingest must pair against the stored history")
    // idempotent re-ingest: already-stored ids are anti-joined out
    assert(FuzzyJoin.incrementalPairs(c.filter(col("id") % 2 === 1), dir).isEmpty,
      "re-ingesting a stored batch must be a no-op")
    // arrival-order invariance at the pair level: a 3-way split over a
    // fresh store reproduces the same set
    val dir2 = java.nio.file.Files
      .createTempDirectory("graft_fuzzy_store3").toString + "/store"
    val inc3 = (0 until 3).map(i =>
        FuzzyJoin.incrementalPairs(c.filter(col("id") % 3 === i), dir2))
      .reduce(_ unionByName _)
    assert(inc3.except(oneShot).isEmpty && oneShot.except(inc3).isEmpty,
      "3-way arrival order must reproduce the one-shot pair set")
  }

  test("fuzzy store composes with the maintenance surface: compaction invisible, erasure takes effect") {
    val strs = Seq((1L, "anna"), (2L, "anne"), (3L, "bob"), (4L, "bop"), (5L, "zed"))
      .toDF("id", "s")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_fuzzy_maint").toString + "/store"
    FuzzyJoin.incrementalPairs(strs.filter(col("id") <= 2), dir)
    FuzzyJoin.incrementalPairs(strs.filter(col("id") > 2 && col("id") <= 4), dir)
    // compaction: batch dirs merge, pairing behavior unchanged
    val (before, after) = graft.operators.Dedup.compactStore(spark, dir)
    assert(before === 2L && after > 0L)
    val newPairs = FuzzyJoin.incrementalPairs(strs.filter(col("id") === 5), dir)
    assert(newPairs.isEmpty) // zed matches nothing, but the ingest ran clean
    // right-to-be-forgotten: erased ids never pair again ...
    assert(graft.operators.Dedup.eraseFromStore(spark, dir,
      Seq(2L).toDF("doc_id")) === 1L)
    // ... and a later record one edit away from the erased name no longer
    // sees it (anna remains: annX is distance 1 from both)
    val probe = FuzzyJoin.incrementalPairs(
      Seq((9L, "annb")).toDF("id", "s"), dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probe === Set((1L, 9L)), s"erased id 2 must not pair: $probe")
    // re-ingest after erasure is a fresh record, pairs again
    val back = FuzzyJoin.incrementalPairs(
      Seq((2L, "anne")).toDF("id", "s"), dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(back.contains((1L, 2L)) && back.contains((2L, 9L)))
  }

  test("incrementalPairs replayDeterministic: a replayed batch recomputes its exact pairs") {
    val strs = Seq((1L, "anna"), (2L, "anne"), (3L, "bob"), (4L, "bop"))
      .toDF("id", "s")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_fuzzy_replay").toString + "/store"
    val b1 = strs.filter(col("id") <= 2)
    val b2 = strs.filter(col("id") > 2)
    val r1 = FuzzyJoin.incrementalPairs(b1, dir, replayDeterministic = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    FuzzyJoin.incrementalPairs(b2, dir, replayDeterministic = true)
    // crash-replay of batch 1: store already holds it; default mode would
    // return an empty frame, replayDeterministic recomputes the same pairs
    val replay = FuzzyJoin.incrementalPairs(b1, dir, replayDeterministic = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(replay === r1 && r1 === Set((1L, 2L)))
  }

  test("blockingAudit: hand-computed candidates, full recall, reduction ratio") {
    import spark.implicits._
    // truth (dist ≤ 1): abc-abd (sub), abc-abcd (ins c), abd-abcd (ins c)
    // — all three also blocked (shared variants); xyz blocks with nobody.
    // n_cand 3 of C(4,2)=6 → reduction 5000 bp, recall 10000 bp.
    val strs = Seq((1L, "abc"), (2L, "abd"), (3L, "xyz"), (4L, "abcd")).toDF("id", "s")
    val r = graft.operators.FuzzyJoin.blockingAudit(strs).head()
    assert(r.toSeq === Seq(4L, 6L, 3L, 3L, 3L, 10000L, 5000L))
  }

  private def Tables = graft.sources.Tables
}
