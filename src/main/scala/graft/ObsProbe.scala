package graft

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Builder tooling: does an eager localCheckpoint fire observe() metrics
  * (i.e. does it run through withAction so QueryExecutionListener sees
  * it)? Decides whether Dedup.clusters can fold its convergence check
  * into the checkpoint job. */
object ObsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val obs = Observation("probe")
    val df = spark.range(100).withColumn("chg", col("id") % 7 === 0)
      .observe(obs, sum(when(col("chg"), 1L).otherwise(0L)).as("changes"))
      .localCheckpoint()
    import scala.concurrent.duration._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    val r = try {
      Await.result(Future(obs.get), 10.seconds).toString
    } catch {
      case _: java.util.concurrent.TimeoutException => "TIMEOUT (not fired)"
    }
    println(s"[obs] localCheckpoint observe result: $r")
    println(s"[obs] checkpointed count: ${df.count()}")
    spark.stop()
  }
}
