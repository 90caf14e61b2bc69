package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

/** Stage-level timing of ppjoinPairs at 20× docs (builder tooling):
  * where do the seconds go — prefix build, candidate pair join, or the
  * exact verify — and what does each filter prune? */
object PpjoinProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[pp] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    def rot(i: Int): String = alpha.drop(i % 26) + alpha.take(i % 26)
    val docs = spark.range(20).select(col("id").as("rep"))
      .crossJoin(Tables.documents(spark, "/root/testdata/sf0.1"))
      .select(
        (col("doc_id") + col("rep") * 1000000L).as("doc_id"),
        expr(s"translate(text, '$alpha', " +
          (0 until 20).map(i => s"WHEN rep = $i THEN '${rot(i)}'")
            .mkString("CASE ", " ", " END)")).as("text"))
      .cache()
    docs.count()

    val t = 0.5
    val sh = docs.select(col("doc_id"),
      explode(graft.functions.GraftColumns.shingleHashes(col("text"), 3)).as("h")).cache()
    time("shingleHashes")(sh.count())
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles")).cache()
    val dfreq = sh.groupBy("h").agg(count(lit(1)).as("df")).cache()
    time("doc_freq")(dfreq.count())
    import org.apache.spark.sql.expressions.Window
    val eps = 1e-9
    val prefix = sh.join(dfreq, Seq("h")).join(cnt, Seq("doc_id"))
      .withColumn("__pos", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("h"))))
      .filter(col("__pos") <=
        col("n_shingles") - ceil(lit(t) * col("n_shingles") - eps).cast("long") + 1)
      .cache()
    time("prefix_tokens")(prefix.count())

    val tau = t / (1.0 + t)
    val a = prefix.select(col("doc_id").as("doc_a"), col("h"),
      col("n_shingles").as("n_a"), col("__pos").as("pa"))
    val b = prefix.select(col("doc_id").as("doc_b"), col("h"),
      col("n_shingles").as("n_b"), col("__pos").as("pb"))
    val raw = a.hint("shuffle_hash").join(b.hint("shuffle_hash"), Seq("h"))
      .filter(col("doc_a") < col("doc_b"))
    time("prefix_matches_raw")(raw.count())
    val lenF = raw.filter(
      col("n_b").cast("double") >= lit(t) * col("n_a").cast("double") - eps &&
        col("n_a").cast("double") >= lit(t) * col("n_b").cast("double") - eps)
    val posF = lenF.filter(
      lit(1.0) + least(col("n_a") - col("pa"), col("n_b") - col("pb")) >=
        lit(tau) * (col("n_a") + col("n_b")) - eps)
    time("after_positional")(posF.count())
    val cands = posF.select("doc_a", "doc_b").distinct().cache()
    time("candidates_distinct")(cands.count())

    time("ppjoin_end_to_end")(Dedup.ppjoinPairs(docs, threshold = t).count())
    spark.stop()
  }
}
