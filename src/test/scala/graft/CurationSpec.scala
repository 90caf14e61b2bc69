package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("contamination counts distinct shared n-grams against the eval set") {
    val docs = Seq(
      (1L, "one two three four five six"),          // eval
      (100L, "zzz one two three four five qqq"),    // shares 1 distinct 5-gram
      (101L, "totally unrelated words live here ok") // shares none
    ).toDF("doc_id", "text")
    val out = Curation.contamination(docs, col("doc_id") < 10L, n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(100L -> 1L, 101L -> 0L))
  }

  test("hash split: deterministic, exhaustive, and roughly 90/5/5") {
    val docs = spark.read.parquet(sf("documents"))
    val a = Curation.hashSplit(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val b = Curation.hashSplit(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(a === b) // re-running must not reshuffle the split
    val total = docs.count()
    assert(a.values.map(_._1).sum === total)
    assert(a("train")._1 > total * 7 / 10) // loose at sf0.001's 50 docs
  }

  test("stratified sample: default strata keep everything; head language is cut") {
    val docs = spark.read.parquet(sf("documents"))
    val out = Curation.stratifiedSample(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    // es/zh use the default 1000‰ rate → whole stratum kept, rate exactly 1.
    Seq("es", "zh").foreach { l =>
      assert(out(l).getAs[Long]("n_sampled") === out(l).getAs[Long]("n_docs"))
      assert(out(l).getAs[Double]("realized_rate") === 1.0)
    }
    // en is downsampled to 200‰ — realized rate must land well under 1.
    assert(out("en").getAs[Long]("n_sampled") < out("en").getAs[Long]("n_docs"))
    // Determinism: the same doc set always yields the same sample counts.
    val again = Curation.stratifiedSample(docs).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_sampled")).toMap
    assert(again === out.view.mapValues(_.getAs[Long]("n_sampled")).toMap)
  }
}
