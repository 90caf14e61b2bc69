package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextHash
import graft.operators.Dedup
import graft.sources.Tables

/** Ad-hoc stage timing for the MinHash pipeline (builder tooling). */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // CLAUDE.md invariant: TopKAgg queries (s8 et al.) silently pay a ~7×
      // sort-based fallback without this — probe numbers must match Bench's.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    // With query names as args: time just those SparkEntry queries (warm
    // run after an untimed one) and exit — targeted regression checks
    // without the full Bench sweep.
    if (args.nonEmpty) {
      args.foreach { name =>
        val q = SparkEntry.queries(name)
        q(spark, sfDir).write.format("noop").mode("overwrite").save()
        time(name)(q(spark, sfDir).count())
      }
      spark.stop()
      return
    }
    val docs = Tables.documents(spark, sfDir)
    time("shingles") { Dedup.shingleHashes(docs).count() }
    val sh = Dedup.shingleHashes(docs).cache()
    sh.count()
    time("sig") { Dedup.minhashSignatures(sh).count() }
    val bands = Dedup.lshBands(Dedup.minhashSignatures(sh)).cache()
    time("bands") { bands.count() }
    val l = bands.select(col("doc_id").as("doc_a"), col("band"), col("band_key"))
    val r = bands.select(col("doc_id").as("doc_b"), col("band"), col("band_key"))
    time("cands") {
      l.join(r, Seq("band", "band_key")).filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct().count()
    }
    time("full_minhashPairs") { Dedup.minhashPairs(docs).count() }
    time("full_again") { Dedup.minhashPairs(docs).count() }
    spark.stop()
  }
}
