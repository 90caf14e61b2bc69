package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{KmvAgg, MisraGriesAgg, TextHash}

/** Builder tooling: where does the catalog stats pass spend its time at
  * 12M rows — the KMV sketch, the MG candidate sketch, or the exact
  * top-key verify pass? (SCALING #80 noted the MG-equipped pass at ~2×
  * the KMV-only cost; this isolates the term before any optimization.) */
object StatsCostProbe {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 12000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[stats] $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    // high-distinct key with one hot third (the PlannerProbe skew shape)
    val df = spark.range(rows).select(
      expr("CASE WHEN id % 3 = 0 THEN CAST(42 AS STRING) ELSE CAST(id AS STRING) END")
        .as("k")).cache()
    df.count()
    val key = col("k")
    time("count_only")(df.agg(count(key)).head())
    time("kmv_only")(df.agg(
      KmvAgg.kMinValues(TextHash.sampleKey(concat(lit("kmv:"), key)), 64)).head())
    time("mg_only")(df.agg(MisraGriesAgg.candidates(key, 30)).head())
    time("all_three")(df.agg(count(key),
      KmvAgg.kMinValues(TextHash.sampleKey(concat(lit("kmv:"), key)), 64),
      MisraGriesAgg.candidates(key, 30)).head())
    val cands = df.agg(MisraGriesAgg.candidates(key, 30)).head()
      .getSeq[String](0)
    time("verify_pass")(df.filter(key.isin(cands: _*))
      .groupBy(key).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc).limit(1).collect())
    val tmp = java.nio.file.Files.createTempDirectory("graft_statsprobe").toString
    time("writeTableStats")(
      graft.operators.Profiling.writeTableStats(df, s"$tmp/a", "k"))
    // the PlannerProbe shape: BIGINT key + a second column, fresh cache
    val df2 = spark.range(rows).select(
      expr("CASE WHEN id % 3 = 0 THEN CAST(42 AS BIGINT) ELSE id END").as("k"),
      (col("id") % 50).as("payload")).cache()
    df2.count()
    time("writeTableStats_bigint2col")(
      graft.operators.Profiling.writeTableStats(df2, s"$tmp/b", "k"))
    spark.stop()
  }
}
