package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}
object P14Probe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[p2] $name%-38s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    def rot(i: Int): String = alpha.drop(i % 26) + alpha.take(i % 26)
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1")
    val bigDocs = spark.range(20).select(col("id").as("rep"))
      .crossJoin(docs)
      .select((col("doc_id") + col("rep") * 1000000L).as("doc_id"),
        expr(s"translate(text, '$alpha', " +
          (0 until 20).map(i => s"WHEN rep = $i THEN '${rot(i)}'").mkString("CASE ", " ", " END)")).as("text"))
      .withColumn("lang", when(col("doc_id") % 10 < 7, lit("en"))
        .otherwise(concat(lit("l"), (col("doc_id") % 10).cast("string"))))
      .cache()
    time("materialize")(bigDocs.count())
    def q0 = graft.operators.TextAnalysis.qualityScores(bigDocs, Seq(col("lang")))
      .select(col("lang"), col("n_tokens"),
        floor(col("quality_score") * 10000000.0d).cast("long").as("q_scaled"))
    time("noop_write_full_eval")({ q0.write.format("noop").mode("overwrite").save(); 1L })
    time("hash_repart_count")(q0.repartition(64, col("lang")).count())
    time("range_repart_count")(q0.repartitionByRange(64, col("lang"), col("q_scaled")).count())
    println(q0.repartitionByRange(64, col("lang"), col("q_scaled"))
      .queryExecution.executedPlan.toString.take(3000))
    spark.stop()
  }
}
