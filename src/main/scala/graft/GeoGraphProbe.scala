package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Graph, Multimodal, Ranking, Spatial}

/** Scale probe for the round-7 additions (builder tooling): spatial radius
  * join, k-core peeling, skyline, shot-boundary and VAD codec paths at
  * 20-400× the gate sizes — the plans must hold when cells/partitions no
  * longer fit one task comfortably. Synthetic inputs use the
  * squared-then-mod mix (h = (id·31+7) mod 1e9+7, then h² mod — keeps every
  * square below 2⁶³ at any id) so coordinates are lattice-free. */
object GeoGraphProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scale] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }

    def mix(c: org.apache.spark.sql.Column, salt: Int, m: Long) = {
      val h = (c * 31L + lit(salt.toLong)) % 1000000007L
      (h * h % 1000000007L) % m
    }

    // ---- spatial radius join: 2M points on a 1M×1M grid, r=60 ----
    val pts2m = spark.range(2000000L).select(col("id"),
      mix(col("id"), 13, 1000000L).as("x"), mix(col("id"), 7, 1000000L).as("y"))
    time("radius join 2M pts (1333x gate)") {
      Spatial.radiusSelfJoin(pts2m, 60).count()
    }

    // ---- k-core: 1M nodes, 3M directed edges (200x gate) ----
    val n = 1000000L
    val edges1m = spark.range(n).crossJoin(spark.range(3).select(col("id").as("j")))
      .select(col("id").as("src"), mix(col("id") * 3L + col("j"), 29, n).as("dst"))
    time("kcore k=4, 1M nodes / 3M edges (200x)") {
      Graph.kcore(edges1m, 4).count()
    }

    // ---- skyline: 50M points, 1M distinct x (80x gate rows) ----
    val pts50m = spark.range(50000000L).select(
      mix(col("id"), 17, 1000000L).as("x"), mix(col("id"), 23, 1000000L).as("y"))
    time("skyline 50M pts / 1M distinct x (80x)") {
      Ranking.skylineMinMax(pts50m, "x", "y").count()
    }

    // ---- codec seams: shot boundaries over 30k real videos (200x),
    //      VAD over 100k speech clips (20x) ----
    val vids = spark.range(30000L).select(col("id").as("doc_id")).repartition(256)
    time("shot boundaries 30k videos (200x)") {
      Multimodal.shotBoundaries(Multimodal.frameDhash(
        Multimodal.videoFrames(Multimodal.synthesizeShotVideos(vids)))).count()
    }
    val clips = spark.range(100000L).select(col("id").as("doc_id")).repartition(256)
    time("vad 100k clips (20x)") {
      Multimodal.vadSegments(Multimodal.synthesizeSpeechPcm(clips)).count()
    }

    spark.stop()
  }
}
