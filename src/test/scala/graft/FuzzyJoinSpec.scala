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

  private def Tables = graft.sources.Tables
}
