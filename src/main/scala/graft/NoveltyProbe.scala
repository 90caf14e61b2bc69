package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Curation
import graft.sources.Tables

/** Builder tooling: the novelty operators (t41/t42) at 20× the fixture —
  * 100k docs, ~5M gram rows — to check the gram-hash join shape holds
  * and to size the store-backed path's Bloom prefilter win when the
  * reference corpus dwarfs the batch (the incremental-crawl regime the
  * operator exists for). Caesar-rotated replicas keep within-replica
  * gram structure without cross-replica collisions (the ScalingProbe
  * convention). */
object NoveltyProbe {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 20
    // the Caesar alphabet has 26 rotations — more replicas would wrap
    // into byte-identical copies and silently break the no-cross-replica
    // collision premise (review finding)
    require(reps >= 1 && reps <= 26, s"1..26 replicas, got $reps")
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      // CLAUDE.md: every new builder pins the ObjectHashAggregate
      // fallback threshold (grouped typed aggregates above 128 keys
      // otherwise silently re-sort every row)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[novelty] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    def rot(i: Int): String = alpha.drop(i % 26) + alpha.take(i % 26)
    val docs = spark.range(reps).select(col("id").as("rep"))
      .crossJoin(Tables.documents(spark, sfDir).select(col("doc_id"), col("text")))
      .select((col("doc_id") + col("rep") * 1000000L).as("doc_id"),
        expr(s"translate(text, '$alpha', " +
          (0 until reps).map(i => s"WHEN rep = $i THEN '${rot(i)}'")
            .mkString("CASE ", " ", " END)")).as("text"))
      .cache()
    time("docs_materialize")(docs.count())
    // direct: ref = 5% slice, score the rest
    val isRef = col("doc_id") % 20 === 0
    time(s"novelty_direct_${reps}x")(
      Curation.ngramNovelty(docs, isRef).count())
    // store-backed, big-history regime: ref = 95%, batch = 5% — the
    // incremental-crawl shape where the Bloom prefilter prunes the exact
    // registry join down to the genuinely-maybe-seen sliver
    val tmp = java.nio.file.Files.createTempDirectory("graft_novelty").toString
    time("store_build_95pct") {
      Curation.writeDecontamStore(docs.filter(!isRef), tmp,
        estimatedGrams = 1L << 24, numBits = 1L << 27)
      1L
    }
    time("novelty_store_batch5pct")(
      Curation.noveltyAgainstStore(docs.filter(isRef), tmp).count())
    spark.stop()
  }
}
