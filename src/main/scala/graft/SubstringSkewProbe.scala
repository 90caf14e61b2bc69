package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.GraftColumns
import graft.operators.Dedup

/** Builder tooling: measures the anchor-df cap computation in
  * [[Dedup.duplicatedSpans]] on a boilerplate-heavy adversary — ONE anchor
  * hash shared by every document (df = corpus size), exactly the input the
  * cap exists to neutralize.
  *
  * Compares the r6 count-window form (`count(*) over (partition by h)` —
  * all occurrences of the boilerplate anchor land in ONE window task) with
  * the r7 groupBy + anti-join form (map-side partial aggregation; the hot
  * key reduces to ≤ numPartitions partial rows). The window variant is
  * reconstructed inline here so the regression stays measurable. */
object SubstringSkewProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toInt else 100000
    // unique tokens per doc: controls the hot anchor's SHARE of the
    // stream — u=8 → 1/9 hot; u=1 → 1/2 hot (the pure-boilerplate corpus)
    val uniq = if (args.length > 1) args(1).toInt else 8
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[skew] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    // Every doc: a 5-token boilerplate prefix (df = nDocs at anchor
    // position 0) + 8 id-derived unique tokens (all other anchors df = 1).
    val docs = spark.range(nDocs.toLong)
      .select(col("id").as("doc_id"),
        concat(lit("the quick brown fox jumps "),
          expr(s"array_join(transform(sequence(1, $uniq), " +
            s"i -> concat('u', CAST(id * $uniq + i AS STRING))), ' ')")).as("text"))
      .cache()
    docs.count()
    val raw = docs.select(col("doc_id"),
        posexplode(GraftColumns.shingleHashSeq(col("text"), 5)).as(Seq("pos", "h")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("h"))
    time("anchor_stream")(raw.count())
    val cap = 50
    // r6 form: one window task receives every boilerplate occurrence
    time("cap_window_r6") {
      raw.withColumn("__df", count(lit(1)).over(Window.partitionBy(col("h"))))
        .filter(col("__df") <= cap).drop("__df").count()
    }
    // r7 form: map-side-combined groupBy + anti-join on the over-cap set
    time("cap_groupby_r7") {
      val overCap = raw.groupBy(col("h")).agg(count(lit(1)).as("__df"))
        .filter(col("__df") > cap).select(col("h"))
      raw.join(overCap, Seq("h"), "left_anti").count()
    }
    time("duplicatedSpans_capped") {
      Dedup.duplicatedSpans(docs, minTokens = 5, k = 5, maxAnchorDf = cap).count()
    }
    spark.stop()
  }
}
