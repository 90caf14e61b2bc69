package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Builder tooling: one-off label-propagation scale point (100k nodes /
  * 300k edges — the ScalingProbe graph shape) without the full probe. */
object G7Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = if (args.nonEmpty) args(0).toLong else 100000L
    val nodes = spark.range(n).select(col("id").as("doc_id")).cache()
    nodes.count()
    val edges = graft.operators.Graph.docLinkGraph(
      nodes.select(col("doc_id"))).cache()
    edges.count()
    val t0 = System.nanoTime()
    val c = graft.operators.Graph.labelPropagation(edges)
    val rows = c.count()
    val comms = c.select(countDistinct(col("community"))).head().getLong(0)
    println(f"[g7] label_prop_${n}_nodes ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($rows nodes, $comms communities)")
    spark.stop()
  }
}
