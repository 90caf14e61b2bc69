package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

/** Focused ANN-serving probe (binary quantization / multi-probe LSH /
  * brute force at 2M vectors) — the fast-iteration slice of
  * [[ScalingProbe]]'s embedding section, so a serving-path change doesn't
  * cost a full probe run to measure. Args: optional query counts
  * (default 10 200). */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scale] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    val qCounts = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(10, 200)
    val emb = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val big = spark.range(1000).select(col("id").as("rep"))
      .crossJoin(emb)
      .select((col("vec_id") + col("rep") * 1000000L).as("vec_id"), col("embedding"))
      .cache()
    time("ann_probe_materialize_2M")(big.count())
    qCounts.foreach { q =>
      time(s"binary_quant_topk_2M_${q}q")(
        Similarity.binaryQuantTopK(big, nQueries = q, k = 5).count())
      time(s"multiprobe_lsh_topk_2M_${q}q")(
        Similarity.multiProbeLshTopK(big, nQueries = q, k = 5).count())
      time(s"ivf_binary_topk_2M_${q}q")(
        Similarity.ivfBinaryTopK(big, nQueries = q, k = 5).count())
    }
    big.unpersist(blocking = true)
    spark.stop()
  }
}
