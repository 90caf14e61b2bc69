package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal}
import graft.sources.Tables

/** Builder tooling: how many min-label propagation rounds does each CC
  * gate row actually run, and what does ONE round cost at fixture scale?
  * (M8Probe put the closure at ~70% of m8's wall time; this separates
  * round count from per-round fixed overhead before touching the loop.) */
object CCProbe {
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
      println(f"[cc] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // Deterministic fixed-overhead metrics (immune to shared-host load
    // spikes): count jobs/stages/tasks per closure call.
    val jobCount = new java.util.concurrent.atomic.AtomicLong(0)
    val stageCount = new java.util.concurrent.atomic.AtomicLong(0)
    val taskCount = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobCount.incrementAndGet()
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stageCount.incrementAndGet()
        taskCount.addAndGet(s.stageInfo.numTasks)
      }
    })
    def counters(name: String)(f: => Unit): Unit = {
      Thread.sleep(200) // let listener drain
      val (j0, s0, t0) = (jobCount.get, stageCount.get, taskCount.get)
      f
      Thread.sleep(500)
      println(s"[cc] COUNTERS $name jobs=${jobCount.get - j0} stages=${stageCount.get - s0} tasks=${taskCount.get - t0}")
    }
    val ids = Tables.documents(spark, sfDir).select(col("doc_id"))
      .filter(col("doc_id") < 400)
    val imgPairs = Dedup.hammingPairs(
      Multimodal.imageDhash(
        Multimodal.synthesizePatternPngs(ids.repartition(64)))
        .withColumnRenamed("dhash", "sig"), 64, 4)
      .select(col("doc_a"), col("doc_b")).cache()
    println(s"[cc] n_pairs=${imgPairs.count()}")
    // warm
    time("clusters_warm")(Dedup.clusters(ids, imgPairs).count())
    counters("clusters_again")(
      time("clusters_again")(Dedup.clusters(ids, imgPairs).count()))

    // manual replay of clustersBounded's loop with per-round timings
    val edges = imgPairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(imgPairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .cache()
    println(s"[cc] n_edges=${edges.count()}")
    println(s"[cc] imgPairs_partitions=${imgPairs.rdd.getNumPartitions}")
    println(s"[cc] edges_partitions=${edges.rdd.getNumPartitions}")
    var labels = time("init") {
      val l = edges.groupBy(col("src").as("doc_id"))
        .agg(min(col("dst")).as("nbr_min"))
        .select(col("doc_id"), least(col("doc_id"), col("nbr_min")).as("cluster_id"))
        .localCheckpoint()
      l
    }
    var converged = false
    var round = 0
    while (!converged && round < 10) {
      round += 1
      val r = round
      time(s"round_$r") {
        val nbrMin = edges
          .join(labels.select(col("doc_id").as("dst"), col("cluster_id").as("nbr")), Seq("dst"))
          .groupBy(col("src").as("doc_id"))
          .agg(min(col("nbr")).as("nbr_min"))
        val obs = org.apache.spark.sql.Observation()
        val updated = labels
          .join(nbrMin, Seq("doc_id"), "left")
          .select(col("doc_id"),
            least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id"))).as("cluster_id"),
            (col("nbr_min") < col("cluster_id")).as("chg"))
          .observe(obs, sum(when(col("chg"), 1L).otherwise(0L)).as("changes"))
          .localCheckpoint()
        converged = obs.get.get("changes").forall(v => v == null || v == 0L)
        if (r == 1) {
          println(s"[cc] labels_partitions=${labels.rdd.getNumPartitions}")
          println(updated.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        }
        labels = updated.drop("chg")
        println(s"[cc]   round $r converged=$converged")
      }
    }
    val docsJoin = time("final_docs_join") {
      ids.join(labels, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
        .count()
    }
    println(s"[cc] labeled=$docsJoin")
    spark.stop()
  }
}
