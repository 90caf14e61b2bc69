package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}
import graft.sources.Tables

/** Stage-level timing of simhashPairs at 20× docs (builder tooling):
  * isolates signature computation (per-row expr vs aggregate) from the
  * chunk-band join. */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[sh] $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
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
    val sigNew = Dedup.simhash(docs).cache()
    time("sig_perrow")(sigNew.count())
    val sigOld = docs
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .select(col("doc_id"),
        (graft.functions.TextHash.polyHash(col("tok")) +
          graft.functions.TextHash.polyHash(reverse(col("tok"))) * lit(1L << 30)).as("h"))
      .groupBy("doc_id")
      .agg(graft.functions.SimHashAgg.simhash(col("h"), Dedup.SimhashBits).as("simhash"))
      .cache()
    time("sig_agg")(sigOld.count())
    def pairsFrom(sig: org.apache.spark.sql.DataFrame): Long = {
      val nChunks = 4
      val chunkBits = 15
      val chunks = sig.select(
        col("doc_id"), col("simhash"),
        explode(array((0 until nChunks).map { c =>
          struct(lit(c).as("c"),
            shiftright(col("simhash"), c * chunkBits)
              .bitwiseAND(lit((1L << 15) - 1L)).as("v"))
        }: _*)).as("ch"))
        .select(col("doc_id"), col("simhash"), col("ch.c"), col("ch.v"))
      val a = chunks.select(col("c"), col("v"), col("doc_id").as("doc_a"), col("simhash").as("sig_a"))
      val b = chunks.select(col("c"), col("v"), col("doc_id").as("doc_b"), col("simhash").as("sig_b"))
      a.join(b, Seq("c", "v"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          expr("bit_count(sig_a ^ sig_b)").cast("long").as("hamming"))
        .filter(col("hamming") <= 3)
        .distinct()
        .count()
    }
    time("pairs_from_perrow")(pairsFrom(sigNew))
    time("pairs_from_agg")(pairsFrom(sigOld))
    time("pairs_full")(Dedup.simhashPairs(docs).count())
    spark.stop()
  }
}
