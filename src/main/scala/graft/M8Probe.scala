package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal}
import graft.sources.Tables

/** Builder tooling: stage decomposition of the m8 gate query to see where
  * its fixed-size wall time goes (codec, banding join, CC closure). */
object M8Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[m8] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // one throwaway full run to warm codegen/classes, mirroring Bench's
    // warm medians
    (0 until 2).foreach { i =>
      val ids = Tables.documents(spark, sfDir).select(col("doc_id"))
        .filter(col("doc_id") < 400)
      time(s"warmup_full_m8_$i") {
        val imgPairs = Dedup.hammingPairs(
          Multimodal.imageDhash(
            Multimodal.synthesizePatternPngs(ids.repartition(64)))
            .withColumnRenamed("dhash", "sig"), 64, 4)
        val audioPairs = Dedup.hammingPairs(
          Multimodal.audioFingerprint(
            Multimodal.synthesizePcm(
              ids.filter(col("doc_id") % 5 === 4).repartition(64)), 31)
            .select(col("doc_id"), col("sig")), 64, 4)
        Dedup.clusters(ids, imgPairs.select(col("doc_a"), col("doc_b"))
          .unionByName(audioPairs.select(col("doc_a"), col("doc_b")))).count()
      }
      spark.catalog.clearCache()
    }
    val ids = Tables.documents(spark, sfDir).select(col("doc_id"))
      .filter(col("doc_id") < 400)
    val imgSigs = time("img_codec_chain") {
      val f = Multimodal.imageDhash(
        Multimodal.synthesizePatternPngs(ids.repartition(64)))
        .withColumnRenamed("dhash", "sig").cache()
      f.count(); f
    }
    val imgPairs = time("img_hamming_pairs") {
      val f = Dedup.hammingPairs(imgSigs, 64, 4).cache(); f.count(); f
    }
    val audSigs = time("audio_codec_chain") {
      val f = Multimodal.audioFingerprint(
        Multimodal.synthesizePcm(
          ids.filter(col("doc_id") % 5 === 4).repartition(64)), 31)
        .select(col("doc_id"), col("sig")).cache()
      f.count(); f
    }
    val audPairs = time("audio_hamming_pairs") {
      val f = Dedup.hammingPairs(audSigs, 64, 4).cache(); f.count(); f
    }
    val pairs = imgPairs.select(col("doc_a"), col("doc_b"))
      .unionByName(audPairs.select(col("doc_a"), col("doc_b"))).cache()
    time("pairs_union")(pairs.count())
    val clusters = time("cc_clusters") {
      val c = Dedup.clusters(ids, pairs).cache(); c.count(); c
    }
    // m11 = the m8 chain + Curation.pipeline on top: with every upstream
    // stage cached, this isolates the curation ASSEMBLY cost (quality gate
    // + decontam + split + decision join) from the codec/pairs/closure
    // cost the m-family rows all pay.
    val docsCur = Tables.documents(spark, sfDir).filter(col("doc_id") < 400)
    time("m11_curation_assembly") {
      graft.operators.Curation.pipeline(
        docsCur, col("doc_id") % 20 === 0, 0.6, clusters).count()
    }
    // Whole-row timings under Bench's isolation discipline (cold caches),
    // for direct comparison against the BENCH_LOCAL history of the three
    // heaviest m-family rows.
    for (q <- Seq("m6_image_dedup", "m8_multimodal_dedup",
        "m11_multimodal_curation")) {
      spark.catalog.clearCache()
      time(s"full_$q")(SparkEntry.queries(q)(spark, sfDir).count())
    }
    spark.stop()
  }
}
