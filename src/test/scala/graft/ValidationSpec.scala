package graft

import org.apache.spark.sql.functions._

import graft.operators.Validation

class ValidationSpec extends SparkSpec {
  import spark.implicits._

  private def byName(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap

  test("suite: metrics and verdicts on a fixture with known defects") {
    val df = Seq(
      (1L, 1, "A", 5.0, null.asInstanceOf[String]),
      (1L, 2, "B", 3.0, "x"), // B out of domain
      (2L, 1, "A", -1.0, "y"), // negative value
      (2L, 1, "A", 2.0, "z") // duplicate (k, line) pair
    ).toDF("k", "line", "flag", "v", "opt")
    val dim = Seq(1L, 3L).toDF("pk") // k=2 is an orphan
    val out = byName(Validation.suite(df,
      Seq(
        Validation.completeness("opt"),
        Validation.uniqueness(Seq("k", "line")),
        Validation.minAtLeast("v", 0.0),
        Validation.maxAtMost("v", 10.0),
        Validation.inDomain("flag", Seq("A"))),
      refIntegrity = Seq(("k", dim, "pk"))))
    assert(out("completeness_opt") === ((0.75, 0L)))
    assert(out("uniqueness_k_line") === ((0.75, 0L))) // 3 distinct / 4 rows
    assert(out("min_v") === ((-1.0, 0L)))
    assert(out("max_v") === ((5.0, 1L)))
    assert(out("domain_flag") === ((0.75, 0L)))
    assert(out("ref_k_in_pk") === ((2.0, 0L))) // two rows with k=2
  }

  test("suite: a fully clean table passes every check") {
    val df = Seq((1L, "A", 1.0), (2L, "A", 2.0)).toDF("k", "flag", "v")
    val dim = Seq(1L, 2L, 3L).toDF("pk")
    val out = Validation.suite(df,
      Seq(
        Validation.completeness("k"),
        Validation.uniqueness(Seq("k")),
        Validation.minAtLeast("v", 1.0),
        Validation.maxAtMost("v", 2.0),
        Validation.inDomain("flag", Seq("A"))),
      refIntegrity = Seq(("k", dim, "pk")))
    assert(out.filter(col("passed") === 0L).isEmpty)
    assert(out.count() === 6L)
  }

  test("suite: all row-scan metrics compute in one aggregate pass (single scan)") {
    val df = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
    val plan = Validation.suite(df,
      Seq(Validation.completeness("k"), Validation.minAtLeast("v", 0.0),
        Validation.maxAtMost("v", 9.0)))
      .queryExecution.optimizedPlan
    // no ref checks → exactly one scan of the local relation feeds one
    // aggregate; a per-constraint-scan implementation would show several
    val scans = plan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }
    assert(scans.size === 1, s"expected 1 scan, got ${scans.size}:\n$plan")
  }

  test("referentialIntegrity: orphans counted distinct, NULL FKs separate, ok verdict") {
    val child = Seq[(java.lang.Long, String)](
      (1L, "a"), (1L, "b"), (2L, "c"), (9L, "d"), (9L, "e"), (null, "f")
    ).toDF("fk", "v")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val row = graft.operators.Validation
      .referentialIntegrity(child, "fk", parent, "pk", "child->parent")
      .head()
    // 6 child rows, 1 null FK, 3 distinct non-null keys, 1 orphan (9 —
    // counted once despite two rows), not ok
    assert((row.getString(0), row.getLong(1), row.getLong(2), row.getLong(3),
      row.getLong(4), row.getLong(5)) === (("child->parent", 6L, 1L, 3L, 1L, 0L)))
    // intact relation: ok = 1
    val ok = graft.operators.Validation
      .referentialIntegrity(child.filter(col("fk") < 9L), "fk", parent, "pk", "r")
      .head()
    assert(ok.getLong(4) === 0L && ok.getLong(5) === 1L)
  }

  test("lDiversity: a k-large but homogeneous group fails, a diverse one passes") {
    import spark.implicits._
    val rows = Seq(
      // group A: 4 rows, all share sensitive value 1 → homogeneity leak
      ("A", 1L), ("A", 1L), ("A", 1L), ("A", 1L),
      // group B: 4 rows, 3 distinct sensitive values → l=3 diverse
      ("B", 1L), ("B", 2L), ("B", 3L), ("B", 1L)).toDF("qi", "s")
    val out = graft.operators.Validation.lDiversity(rows, Seq("qi"), "s", l = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("A") === ((4L, 1L, 0L)), "k-anonymous yet zero diversity")
    assert(out("B") === ((4L, 3L, 1L)))
  }
}
