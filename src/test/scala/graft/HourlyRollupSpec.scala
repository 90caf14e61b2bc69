package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions.col

import graft.operators.HourlyRollup

class HourlyRollupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("15-min readings roll up to hourly mean/min with suffix contract") {
    // 2 buildings × 4 quarter-hours of hour 10 + 1 reading in hour 11
    val df = Seq(
      (ts("2024-01-01 10:00:00"), 1L, 1.0, "a"),
      (ts("2024-01-01 10:15:00"), 1L, 2.0, "b"),
      (ts("2024-01-01 10:30:00"), 1L, 3.0, "a"),
      (ts("2024-01-01 10:45:00"), 1L, 6.0, "c"),
      (ts("2024-01-01 10:00:00"), 2L, 10.0, "z"),
      (ts("2024-01-01 11:05:00"), 1L, 7.0, "q")
    ).toDF("timestamp", "bldg_id", "load", "tag")

    val out = HourlyRollup(df)
    assert(out.columns.toSet === Set(
      "timestamp", "bldg_id",
      "timestamp_min", "bldg_id_min", "load_mean", "tag_min"))

    val rows = out.orderBy("bldg_id", "timestamp").collect()
    assert(rows.length === 3)
    val r1 = rows(0)
    assert(r1.getAs[Timestamp]("timestamp") === ts("2024-01-01 10:00:00"))
    assert(r1.getAs[Long]("bldg_id_min") === 1L)
    assert(r1.getAs[Double]("load_mean") === 3.0) // (1+2+3+6)/4
    assert(r1.getAs[String]("tag_min") === "a")
    val r2 = rows(1) // bldg 1, hour 11
    assert(r2.getAs[Timestamp]("timestamp") === ts("2024-01-01 11:00:00"))
    assert(r2.getAs[Double]("load_mean") === 7.0)
    val r3 = rows(2) // bldg 2, hour 10
    assert(r3.getAs[Double]("load_mean") === 10.0)
  }

  test("falls back to timestamp-only grouping when the id column is absent") {
    val df = Seq(
      (ts("2024-01-01 10:00:00"), 4.0),
      (ts("2024-01-01 10:30:00"), 8.0)
    ).toDF("timestamp", "load")
    val out = HourlyRollup(df)
    assert(out.columns.toSet === Set("timestamp", "timestamp_min", "load_mean"))
    assert(out.collect().head.getAs[Double]("load_mean") === 6.0)
  }

  test("float aggregates are rounded to 7 decimal places") {
    val df = Seq(
      (ts("2024-01-01 10:00:00"), 1L, 1.0),
      (ts("2024-01-01 10:15:00"), 1L, 2.0),
      (ts("2024-01-01 10:30:00"), 1L, 2.0)
    ).toDF("timestamp", "bldg_id", "load")
    val v = HourlyRollup(df).select(col("load_mean")).collect().head.getDouble(0)
    assert(v === 1.6666667) // 5/3 @ 7dp
  }

  test("hourly mean of a constant series is the constant; one row per (hour, id)") {
    val readings = for {
      b <- 1L to 3L
      q <- 0 until 8 // two hours of quarter-hours
    } yield (new Timestamp(ts("2024-06-01 00:00:00").getTime + q * 15 * 60 * 1000L), b, 42.5)
    val out = HourlyRollup(readings.toDF("timestamp", "bldg_id", "v"))
    assert(out.count() === 6) // 3 buildings × 2 hours
    assert(out.select("v_mean").distinct().collect().map(_.getDouble(0)).toSeq === Seq(42.5))
  }

  test("incremental partials ≡ batch rollup, in any arrival order, nulls included") {
    val rows = Seq(
      (ts("2024-01-01 10:00:00"), 1L, Some(1.0)),
      (ts("2024-01-01 10:15:00"), 1L, Some(2.0)),
      (ts("2024-01-01 10:30:00"), 1L, None), // null must not perturb the mean
      (ts("2024-01-01 10:45:00"), 2L, Some(8.0)),
      (ts("2024-01-01 11:00:00"), 1L, Some(5.0)),
      (ts("2024-01-01 11:15:00"), 3L, None) // an all-null (hour, id) group
    )
    val df = rows.toDF("timestamp", "bldg_id", "load")
    val batch = HourlyRollup(df)
    def run(order: Seq[Int]) = HourlyRollup.finalizePartials(
      order.map(i => HourlyRollup.partials(
        df.filter(col("bldg_id") % 3 === i))).reduce(HourlyRollup.mergePartials))
    for (order <- Seq(Seq(0, 1, 2), Seq(2, 0, 1))) {
      val inc = run(order)
      assert(inc.columns.toSeq === batch.columns.toSeq)
      assert(inc.except(batch).isEmpty && batch.except(inc).isEmpty,
        s"arrival order $order diverged from the batch rollup")
    }
    // the all-null group survives with a null mean, matching batch avg
    val nullMean = run(Seq(0, 1, 2)).filter(col("bldg_id") === 3L).collect()
    assert(nullMean.length === 1 && nullMean.head.isNullAt(
      nullMean.head.fieldIndex("load_mean")))
  }
}
