package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Clustering
import graft.sources.Tables

/** Stage decomposition for the exhaustive-ADC path (builder tooling):
  * isolates code building, LUT building, and the |Q|·|N| scoring +
  * bounded-top-k aggregation, with the ObjectHashAggregate sort-fallback
  * threshold toggled — the knob that decides whether 2k query groups
  * aggregate in-memory or fall back to sorting every scored pair. */
object AdcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      // Grouped bounded aggregates (TopKAgg) on high-cardinality keys:
      // the default 128-key limit silently falls back to sort-based
      // aggregation, re-sorting every candidate row (measured 2x on ADC).
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[adc] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    val emb = Tables.embeddings(spark, sfDir)
    val bigEmb = spark.range(50).select(col("id").as("rep")).crossJoin(emb)
      .select((col("vec_id") + col("rep") * 1000000L).as("vec_id"), col("embedding"))
      .cache()
    time("corpus_materialize")(bigEmb.count())
    val q = bigEmb.filter(col("vec_id") % 50 === 0)
    time("pq_encode")(Clustering.pqEncode(bigEmb).count())
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "128")
    time("adc_default_fallback128")(Clustering.adcTopK(q, bigEmb).count())
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
    time("adc_fallback65536")(Clustering.adcTopK(q, bigEmb).count())
    time("adc_fallback65536_again")(Clustering.adcTopK(q, bigEmb).count())
    spark.stop()
  }
}
