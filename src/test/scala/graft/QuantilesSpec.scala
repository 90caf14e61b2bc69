package graft

import org.apache.spark.sql.functions._

import graft.operators.Quantiles

/** [[graft.operators.Quantiles.groupedQuantileCont]] — rank-selected exact
  * quantile_cont without the per-group value buffer. The interpolation
  * contract (DuckDB's weighted two-term form) is verified three ways:
  * against hand-computed values, against Spark's own `percentile`
  * aggregate on the fixture, and for placement-independence (the range
  * shuffle must not perturb values).
  */
class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  private def q(df: org.apache.spark.sql.DataFrame, qs: (Double, String)*) =
    Quantiles.groupedQuantileCont(df, "g", "v", qs)
      .collect().map(r => r.getString(0) -> r).toMap

  test("hand-computed interpolation, single group") {
    // v sorted: [1.0, 2.0, 4.0, 8.0]; n=4
    val df = Seq(("a", 4.0), ("a", 1.0), ("a", 8.0), ("a", 2.0)).toDF("g", "v")
    val r = q(df, 0.5 -> "med", 0.0 -> "mn", 1.0 -> "mx", 0.25 -> "q1")
    // pos(0.5)=1.5 → 2.0*(0.5)+4.0*(0.5)=3.0 ; pos(0.25)=0.75 → 1*(0.25)+2*(0.75)=1.75
    assert(r("a").getDouble(1) === 3.0)
    assert(r("a").getDouble(2) === 1.0)
    assert(r("a").getDouble(3) === 8.0)
    assert(r("a").getDouble(4) === 1.75)
  }

  test("weighted two-term formula — bit-for-bit the DuckDB quantile_cont form") {
    // Discriminating case (pinned in round 5 against DuckDB itself):
    // lo=-8.551274266649145, hi=-5.871864245115699, f=0.36568891691258554
    // weighted lo*(1-f)+hi*f and lerp lo+f*(hi-lo) differ in the last ulp;
    // DuckDB computes the WEIGHTED form.
    val lo = -8.551274266649145
    val hi = -5.871864245115699
    val f = 0.36568891691258554
    val df = Seq(("a", lo), ("a", hi)).toDF("g", "v")
    val r = q(df, f -> "out")("a").getDouble(1) // n=2 → pos = f exactly
    val weighted = lo * (1 - f) + hi * f
    val lerp = lo + f * (hi - lo)
    assert(java.lang.Double.doubleToLongBits(weighted) !=
      java.lang.Double.doubleToLongBits(lerp), "case no longer discriminates")
    assert(java.lang.Double.doubleToLongBits(r) ===
      java.lang.Double.doubleToLongBits(weighted))
  }

  test("matches Spark's own percentile aggregate on the lineitem fixture") {
    val li = spark.read.parquet(sf("lineitem"))
      .select(col("l_returnflag").as("g"), col("l_quantity").cast("double").as("v"))
    val ours = q(li, 0.5 -> "p50", 0.9 -> "p90", 0.25 -> "p25")
    val theirs = li.groupBy("g")
      .agg(expr("percentile(v, 0.5)").as("p50"), expr("percentile(v, 0.9)").as("p90"),
        expr("percentile(v, 0.25)").as("p25"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(ours.keySet === theirs.keySet && ours.nonEmpty)
    for (g <- ours.keySet; i <- 1 to 3)
      // l_quantity is integral → both formulas are exact; equality is exact
      assert(ours(g).getDouble(i) === theirs(g).getDouble(i), s"group $g col $i")
  }

  test("groups spanning many range partitions; n=1 and tied-value groups") {
    val rows =
      (1 to 5000).map(i => ("big", i.toDouble)) ++   // spans partitions
        Seq(("one", 42.0)) ++                        // single element
        (1 to 100).map(_ => ("tie", 7.0))            // all values equal
    val df = rows.toDF("g", "v").repartition(16)
    val r = q(df, 0.5 -> "med", 0.9 -> "p90")
    // big: pos(0.5)=2499.5 → (2500+2501)/2 = 2500.5 ; pos(0.9)=4499.1…
    // → ranks 4500/4501 hold values 4500.0/4501.0, weighted by f.
    assert(r("big").getDouble(1) === 2500.5)
    val pos = 0.9 * 4999.0
    val f = pos - math.floor(pos)
    assert(java.lang.Double.doubleToLongBits(r("big").getDouble(2)) ===
      java.lang.Double.doubleToLongBits(4500.0 * (1 - f) + 4501.0 * f))
    assert(r("one").getDouble(1) === 42.0 && r("one").getDouble(2) === 42.0)
    assert(r("tie").getDouble(1) === 7.0 && r("tie").getDouble(2) === 7.0)
  }

  test("placement independence: same values at different partition counts") {
    val li = spark.read.parquet(sf("lineitem"))
      .select(col("l_returnflag").as("g"), col("l_extendedprice").cast("double").as("v"))
    val a = Quantiles.groupedQuantileCont(li, "g", "v",
      Seq(0.05 -> "lo", 0.95 -> "hi"), numPartitions = 3)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    val b = Quantiles.groupedQuantileCont(li, "g", "v",
      Seq(0.05 -> "lo", 0.95 -> "hi"), numPartitions = 17)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(a === b)
  }

  test("groupedQuantileSelect: exact order statistic, never interpolated") {
    // values 10,20,30,40,50 (n=5): q=0.5 → rank ⌊0.5·4⌋+1 = 3 → 30;
    // q=0.3 → pos 1.2 → rank 2 → 20 (cont would interpolate 22.0);
    // q=0.95 → pos 3.8 → rank 4 → 40 (cont: 48.0). Selection returns a
    // STORED value at every q — integral in, integral out.
    val df = Seq(10, 20, 30, 40, 50).map(v => ("g", v.toDouble)).toDF("g", "v")
    val r = Quantiles.groupedQuantileSelect(df, "g", "v",
      Seq(0.3 -> "a", 0.5 -> "b", 0.95 -> "c")).collect().head
    assert((r.getDouble(1), r.getDouble(2), r.getDouble(3)) === ((20.0, 30.0, 40.0)))
    // distributed path agrees
    val rd = Quantiles.groupedQuantileSelect(df, "g", "v",
      Seq(0.3 -> "a", 0.5 -> "b", 0.95 -> "c"), maxDriverCountRows = 0)
      .collect().head
    assert((rd.getDouble(1), rd.getDouble(2), rd.getDouble(3)) === ((20.0, 30.0, 40.0)))
  }

  test("distributed metadata path ≡ driver path, bit-for-bit") {
    // maxDriverCountRows = 0 forces the executor-side offsets/targets
    // derivation; the default takes the driver fast path on this input.
    // The two must agree to the last ulp — same IEEE index arithmetic.
    val li = spark.read.parquet(sf("lineitem"))
      .select(col("l_returnflag").as("g"), col("l_extendedprice").cast("double").as("v"))
    def bits(maxRows: Int) = Quantiles.groupedQuantileCont(li, "g", "v",
      Seq(0.05 -> "lo", 0.5 -> "med", 0.95 -> "hi"),
      numPartitions = 7, maxDriverCountRows = maxRows)
      .collect().map(r => (r.getString(0),
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet
    assert(bits(0) === bits(65536))
    // the edge shapes (n=1 group, all-ties group) through the forced
    // distributed path too
    val rows = (1 to 500).map(i => ("big", i.toDouble)) ++
      Seq(("one", 42.0)) ++ (1 to 40).map(_ => ("tie", 7.0))
    val r = Quantiles.groupedQuantileCont(rows.toDF("g", "v"), "g", "v",
      Seq(0.5 -> "med"), maxDriverCountRows = 0)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r === Map("big" -> 250.5, "one" -> 42.0, "tie" -> 7.0))
  }

  test("quantileBinning: train edges at rank ⌊q(n−1)⌋+1, strict-greater bins, edge ties go low") {
    // train = 1..9 dollars (n=9): quartile ranks (1·8)//4+1=3, 5, 7 →
    // edges 300/500/700 cents. serve hits every bin plus exact-edge ties.
    val train = (1 to 9).map(i => i.toDouble).toDF("v")
    val serve = Seq(0.5, 3.0, 3.01, 5.0, 6.5, 7.0, 7.01, 99.0).toDF("v")
    val out = Quantiles.quantileBinning(train, serve, "v")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // 0.5 and 3.0 (tie at e1 → LOW) → bin 0; 3.01, 5.0 (tie low) → bin 1;
    // 6.5, 7.0 → bin 2; 7.01, 99.0 → bin 3
    assert(out(0L) == ((2L, 50L, 300L, -1L)))
    assert(out(1L) == ((2L, 301L, 500L, 300L)))
    assert(out(2L) == ((2L, 650L, 700L, 500L)))
    assert(out(3L) == ((2L, 701L, 9900L, 700L)))
  }
}
