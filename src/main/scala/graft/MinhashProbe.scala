package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

/** Stage-level timing of minhashPairs at 20× docs (builder tooling). */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[mh] $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
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
    val sh = Dedup.shingleHashes(docs).cache()
    time("shingleHashes")(sh.count())
    val sig = Dedup.minhashSignatures(sh).cache()
    time("signatures")(sig.count())
    // The per-row expression path minhashPairs actually uses now: no
    // DISTINCT shuffle, no aggregation, two compact JVM loops per row.
    time("signatures_perrow") {
      docs.select(col("doc_id"),
        graft.functions.GraftColumns.minhashArr(
          graft.functions.GraftColumns.shingleHashes(col("text"), 3), Dedup.MinhashK))
        .count()
    }
    val bands = Dedup.lshBands(sig).cache()
    time("bands")(bands.count())
    val l = bands.select(col("doc_id").as("doc_a"), col("band"), col("band_key"))
    val r = bands.select(col("doc_id").as("doc_b"), col("band"), col("band_key"))
    val cands = l.join(r, Seq("band", "band_key"))
      .filter(col("doc_a") < col("doc_b")).select("doc_a", "doc_b").distinct().cache()
    time("candidates")(cands.count())
    val candDocs = cands.select(col("doc_a").as("doc_id"))
      .union(cands.select(col("doc_b").as("doc_id"))).distinct().cache()
    time("candDocs")(candDocs.count())
    val shc = sh.join(broadcast(candDocs), Seq("doc_id"), "left_semi").cache()
    time("shc")(shc.count())
    val a = shc.select(col("doc_id").as("doc_a"), col("h"))
    val b = shc.select(col("doc_id").as("doc_b"), col("h"))
    time("verify_join") {
      a.join(b, Seq("h")).filter(col("doc_a") < col("doc_b"))
        .join(cands, Seq("doc_a", "doc_b"), "left_semi")
        .groupBy("doc_a", "doc_b").agg(count(lit(1))).count()
    }
    time("full")(Dedup.minhashPairs(docs).count())
    spark.stop()
  }
}
