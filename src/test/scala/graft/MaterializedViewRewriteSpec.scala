package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.MaterializedViewRewrite

class MaterializedViewRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-03-01 $h%02d:$m%02d:00")

  /** Base rows spanning 3 hours / 2 days worth of grain, with an all-null
    * hour for one key (the null-semantics corner). */
  private def baseRows: DataFrame = Seq(
    (ts(1, 0), "a", Some(10L)),
    (ts(1, 30), "a", Some(20L)),
    (ts(1, 45), "a", None),
    (ts(2, 15), "a", Some(5L)),
    (ts(2, 20), "b", None), // b's only hour-2 rows are all-null
    (ts(2, 40), "b", None),
    (ts(3, 10), "b", Some(7L))
  ).toDF("ts", "k", "v")

  private def withMv[T](body: String => T): T = {
    val dir = java.nio.file.Files.createTempDirectory("graft_mv_spec").toString
    baseRows.write.mode("overwrite").parquet(s"$dir/base")
    MaterializedViewRewrite
      .buildRollup(spark.read.parquet(s"$dir/base"), "ts", "k", "v")
      .write.mode("overwrite").parquet(s"$dir/mv")
    MaterializedViewRewrite.register(spark, s"$dir/base", s"$dir/mv", "ts", "k", "v")
    spark.experimental.extraOptimizations = Seq(MaterializedViewRewrite)
    try body(dir)
    finally {
      spark.experimental.extraOptimizations = Nil
      MaterializedViewRewrite.clear()
    }
  }

  private def rollup(dir: String, grain: String): DataFrame =
    spark.read.parquet(s"$dir/base")
      .groupBy(date_trunc(grain, col("ts")).as("g"), col("k"))
      .agg(
        sum(col("v")).as("s"),
        count(col("v")).as("c"),
        count(lit(1)).as("n"),
        min(col("v")).as("mn"),
        max(col("v")).as("mx"),
        avg(col("v")).as("av"))

  private def scansMv(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("__mv_")

  test("day-grain rollup is routed through the hourly MV with identical results") {
    withMv { dir =>
      val df = rollup(dir, "day")
      assert(scansMv(df), df.queryExecution.executedPlan.toString)
      val expected = {
        spark.experimental.extraOptimizations = Nil // ground truth from base
        val rows = rollup(dir, "day").collect().map(_.toSeq).toSet
        spark.experimental.extraOptimizations = Seq(MaterializedViewRewrite)
        rows
      }
      assert(df.collect().map(_.toSeq).toSet === expected)
      // null semantics survived the partial merge: b's hour-2 all-null rows
      // count in n but not c, and leave s/mn/mx null for that slice
      val b = df.filter(col("k") === "b").collect().head
      assert(b.getAs[Long]("n") === 3L && b.getAs[Long]("c") === 1L)
      assert(b.getAs[Long]("s") === 7L)
    }
  }

  test("hour-grain rollup (the MV's own grain) is also served and exact") {
    withMv { dir =>
      val df = rollup(dir, "hour")
      assert(scansMv(df), "hour grain must route to the MV")
      spark.experimental.extraOptimizations = Nil
      val expected = rollup(dir, "hour").collect().map(_.toSeq).toSet
      spark.experimental.extraOptimizations = Seq(MaterializedViewRewrite)
      assert(df.collect().map(_.toSeq).toSet === expected)
    }
  }

  test("unsupported shapes leave the plan on the base table") {
    withMv { dir =>
      // a filter between scan and aggregate is outside the MV contract
      val filtered = spark.read.parquet(s"$dir/base")
        .filter(col("k") === "a")
        .groupBy(date_trunc("day", col("ts")).as("g"), col("k"))
        .agg(sum(col("v")).as("s"))
      assert(!scansMv(filtered), "filter must abort the rewrite")
      // finer-than-hour grain cannot be answered by an hourly rollup
      val minuteGrain = spark.read.parquet(s"$dir/base")
        .groupBy(date_trunc("minute", col("ts")).as("g"), col("k"))
        .agg(sum(col("v")).as("s"))
      assert(!scansMv(minuteGrain), "minute grain must abort the rewrite")
      // an aggregate with no partial-merge form aborts the whole match
      val distinct = spark.read.parquet(s"$dir/base")
        .groupBy(date_trunc("day", col("ts")).as("g"), col("k"))
        .agg(countDistinct(col("v")).as("d"))
      assert(!scansMv(distinct), "count distinct must abort the rewrite")
      // both still return correct answers from the base
      assert(filtered.collect().length === 1)
      assert(minuteGrain.count() === 7L)
    }
  }

  test("rewritten day rollup reads MV-sized input, not base-sized") {
    withMv { dir =>
      val df = rollup(dir, "day")
      // the MV has one row per (hour, key) = 4 rows vs 7 base rows; the
      // scan in the executed plan must be the 4-row relation
      val scans = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
      assert(scans.exists(_.contains("/mv")), scans.mkString("\n"))
      assert(!scans.exists(_.contains("/base")), scans.mkString("\n"))
    }
  }
}
