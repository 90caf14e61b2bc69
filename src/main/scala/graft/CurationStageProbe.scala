package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup}
import graft.sources.Tables

/** Builder tooling: stage timings for c7's incremental-curation flow —
  * which of the five store round-trips actually costs (SCALING #74's
  * question asked of the c-family), measured at the bench fixture. */
object CurationStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[c7stage] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // warm the JVM on the same shapes once
    SparkEntry.queries("c7_incremental_curation")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    val docs = Tables.documents(spark, sfDir)
    val tmp = java.nio.file.Files.createTempDirectory("graft_c7probe").toString
    time("decontam_store_write")(Curation.writeDecontamStore(
      docs.filter(col("doc_id") % 20 === 0), s"$tmp/decontam"))
    var labels: org.apache.spark.sql.DataFrame = null
    Seq(0, 1).foreach { par =>
      val batch = docs.filter(col("doc_id") % 2 === par)
      val pairs = time(s"minhash_ingest_$par")(Dedup.incrementalMinhashPairs(
        batch.select(col("doc_id"), col("text")), s"$tmp/mh"))
      labels = time(s"label_fold_$par")(Dedup.incrementalClusters(
        batch.select(col("doc_id")), pairs, s"$tmp/labels"))
    }
    val out = time("assembly")(Curation.pipelineFromSignals(
      docs, col("doc_id") % 20 === 0, 0.6,
      labels,
      Curation.decontamAgainstStore(
        docs.filter(col("doc_id") % 20 =!= 0), s"$tmp/decontam")))
    time("assembly_count")(out.count())
    spark.stop()
  }
}
