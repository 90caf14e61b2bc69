package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

/** Isolated ANN-LSH timing at 50× embeddings (builder tooling) — the full
  * ScalingProbe's ambient JIT/GC context swings this workload ±40 s, so
  * plan changes are judged here. */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[ann] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val bigEmb = spark.range(50).select(col("id").as("rep"))
      .crossJoin(emb)
      .select((col("vec_id") + col("rep") * 1000000L).as("vec_id"), col("embedding"))
      .cache()
    time("materialize")(bigEmb.count())
    import graft.functions.{GraftColumns, VectorMath}
    val withSig = bigEmb.select(
      col("vec_id"), col("embedding"),
      graft.functions.GraftColumns.hyperBucket(col("embedding"), 8).as("bucket"),
      VectorMath.norm2(col("embedding")).as("nrm")).cache()
    time("sig")(withSig.count())
    println("[ann] top bucket sizes (uncentered):")
    withSig.groupBy("bucket").count().orderBy(col("count").desc).limit(8).collect()
      .foreach(r => println(s"[ann]   bucket ${r.getLong(0)} -> ${r.getLong(1)}"))
    val meanDf = bigEmb
      .agg(graft.functions.VectorSumAgg.vectorSum(col("embedding")).as("qsum"), count(lit(1)).as("n"))
      .select(transform(col("qsum"),
        v => v.cast("double") / (col("n").cast("double") * lit(graft.functions.VectorSumAgg.Scale))).as("__mean"))
    println("[ann] top bucket sizes (centered):")
    bigEmb.crossJoin(broadcast(meanDf))
      .select(GraftColumns.hyperBucketC(col("embedding"), col("__mean"), 8).as("bucket"))
      .groupBy("bucket").count().orderBy(col("count").desc).limit(8).collect()
      .foreach(r => println(s"[ann]   bucket ${r.getLong(0)} -> ${r.getLong(1)}"))
    val a = withSig.select(col("bucket"), col("vec_id").as("vec_a"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = withSig.select(col("bucket"), col("vec_id").as("vec_b"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    time("join_only") {
      a.hint("shuffle_hash").join(b.hint("shuffle_hash"), Seq("bucket"))
        .filter(col("vec_a") < col("vec_b")).count()
    }
    time("join_scored") {
      a.hint("shuffle_hash").join(b.hint("shuffle_hash"), Seq("bucket"))
        .filter(col("vec_a") < col("vec_b"))
        .withColumn("cosine", VectorMath.dot(col("ea"), col("eb")) / (col("na") * col("nb")))
        .filter(col("cosine") >= 0.9).count()
    }
    time("ann_lsh_full")(Similarity.lshNeighbors(bigEmb, threshold = 0.9).count())
    spark.stop()
  }
}
