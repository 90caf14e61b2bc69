package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builder tooling: stage timings for the p14 data-card shape at 100k docs
  * — the round-8 hot-spot autopsy (SCALING #58). Measures the quality-
  * scoring projection's per-evaluation cost, the quantile machinery's
  * two-pass input contract (range sampler + shuffle write), and the
  * cached-input fix side by side. */
object P14Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[p14] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    def rot(i: Int): String = alpha.drop(i % 26) + alpha.take(i % 26)
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1")
    val bigDocs = spark.range(20).select(col("id").as("rep"))
      .crossJoin(docs)
      .select((col("doc_id") + col("rep") * 1000000L).as("doc_id"),
        expr(s"translate(text, '$alpha', " +
          (0 until 20).map(i => s"WHEN rep = $i THEN '${rot(i)}'").mkString("CASE ", " ", " END)")).as("text"))
      .withColumn("lang", when(col("doc_id") % 10 < 7, lit("en"))
        .otherwise(concat(lit("l"), (col("doc_id") % 10).cast("string"))))
      .cache()
    time("materialize")(bigDocs.count())
    def q0 = graft.operators.TextAnalysis.qualityScores(bigDocs, Seq(col("lang")))
      .select(col("lang"), col("n_tokens"),
        floor(col("quality_score") * 10000000.0d).cast("long").as("q_scaled"))
    // count() prunes the scoring columns — force one honest evaluation
    time("scoring_one_pass")(q0.agg(sum(col("q_scaled"))).count())
    time("qsel_lazy_input")(graft.operators.Quantiles.groupedQuantileSelect(
      q0, "lang", "q_scaled", Seq(0.5 -> "q50")).count())
    val qc = q0.cache(); qc.count()
    time("qsel_cached_input")(graft.operators.Quantiles.groupedQuantileSelect(
      qc, "lang", "q_scaled", Seq(0.5 -> "q50")).count())
    qc.unpersist()
    spark.stop()
  }
}
