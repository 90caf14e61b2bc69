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

  private def Tables = graft.sources.Tables
}
