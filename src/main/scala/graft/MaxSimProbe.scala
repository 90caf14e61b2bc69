package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Retrieval
import graft.sources.Tables

/** Scale probe for the late-interaction MaxSim re-ranker (builder
  * tooling): 100k docs (sf0.1 ×20) in two regimes —
  *
  *  - candidate-SPARSE: replicas Caesar-rotated, so the query's tokens
  *    exist only in the base replica and the inverted-index prefilter
  *    prunes 95% of the corpus before any scoring. The production case:
  *    re-rank cost tracks the CANDIDATE set, not the corpus.
  *  - candidate-DENSE adversary: identical replicas — every doc is a
  *    candidate for every query, so the max/sum chain runs over the full
  *    corpus × query-token cross product. The regime an all-stopword
  *    query degenerates into; measures the re-rank kernel itself.
  *
  * What must hold at 100 TB: sparse ≪ dense (the prefilter is real), and
  * dense scales linearly in candidate count (per-doc work is local:
  * broadcast query frame, map-side partial max/sum aggregation).
  */
object MaxSimProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[maxsim] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    def rot(i: Int): String = alpha.drop(i % 26) + alpha.take(i % 26)
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
    def replicate(rotate: Boolean) =
      spark.range(20).select(col("id").as("rep"))
        .crossJoin(base)
        .select(
          (col("doc_id") + col("rep") * 1000000L).as("doc_id"),
          (if (rotate)
            expr(s"translate(text, '$alpha', " +
              (0 until 20).map(i => s"WHEN rep = $i THEN '${rot(i)}'")
                .mkString("CASE ", " ", " END)"))
          else col("text")).as("text"))
    val queries = base.filter(col("doc_id").isin(7L, 132L, 257L, 382L))
      .select(col("doc_id").as("query_id"), col("text"))

    // 64-query batch: scoring work scales with queries × candidates, the
    // corpus-side token pipeline doesn't — the regime where the prefilter
    // either pays or doesn't.
    val queries64 = base.filter(col("doc_id") % 78 === 7)
      .select(col("doc_id").as("query_id"), col("text"))

    val sparse = replicate(rotate = true).cache()
    time("corpus materialize (sparse)") { sparse.count() }
    time("maxsim 100k sparse, 4 queries") {
      Retrieval.maxSimTopK(queries, sparse).count()
    }
    time("maxsim 100k sparse, 64 queries") {
      Retrieval.maxSimTopK(queries64, sparse).count()
    }
    sparse.unpersist()

    val dense = replicate(rotate = false).cache()
    time("corpus materialize (dense)") { dense.count() }
    time("maxsim 100k dense, 4 queries") {
      Retrieval.maxSimTopK(queries, dense).count()
    }
    time("maxsim 100k dense, 64 queries") {
      Retrieval.maxSimTopK(queries64, dense).count()
    }
    dense.unpersist()
    spark.stop()
  }
}
