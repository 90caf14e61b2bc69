package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Interchange

class InterchangeSpec extends SparkSpec {
  import spark.implicits._

  test("jsonl roundtrip preserves rows, types, and adversarial text") {
    // Text with quotes, commas, newlines, unicode, and a JSON-looking
    // payload — everything that breaks naive line formats.
    val docs = Seq(
      (1L, "plain text", "en"),
      (2L, "comma, \"quoted\", and {\"fake\": \"json\"}", "de"),
      (3L, "line\nbreak and unicode é中文", "fr"),
      (4L, "", "es")).toDF("doc_id", "text", "lang")
    val dir = Files.createTempDirectory("graft_jsonl").toString + "/docs"
    Interchange.writeJsonl(docs, dir)
    val back = Interchange.readJsonl(spark, dir, docs.schema)
    // File sources mark every column nullable; names and types must hold.
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      docs.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy("doc_id").collect().toSeq === docs.orderBy("doc_id").collect().toSeq)
    // gzip actually applied
    assert(new java.io.File(dir).listFiles().exists(_.getName.endsWith(".json.gz")))
  }

  test("csv roundtrip preserves typed columns and quoted free text") {
    val rows = Seq(
      (1L, "alpha", 3.25d, "with, comma"),
      (2L, "beta \"q\"", -0.5d, "line\nbreak"),
      (3L, "gamma", 0.0d, "")).toDF("id", "name", "score", "note")
    val dir = Files.createTempDirectory("graft_csv").toString + "/rows"
    Interchange.writeCsv(rows, dir)
    val back = Interchange.readCsv(spark, dir, rows.schema)
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      rows.schema.map(f => (f.name, f.dataType)))
    // CSV has no null/empty-string distinction for strings; compare with
    // empty-coalesced notes (documented format limitation, not data loss).
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("note", coalesce(col("note"), lit(""))).orderBy("id").collect().toSeq
    assert(norm(back) === norm(rows))
  }

  test("orc roundtrip preserves rows and pushes predicates into the scan") {
    val docs = Seq(
      (1L, "plain text", "en"),
      (2L, "comma, \"quoted\", and {\"fake\": \"json\"}", "de"),
      (3L, "line\nbreak and unicode é中文", "fr"),
      (4L, "", "es")).toDF("doc_id", "text", "lang")
    val dir = Files.createTempDirectory("graft_orc").toString + "/docs"
    Interchange.writeOrc(docs, dir)
    val back = Interchange.readOrc(spark, dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      docs.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy("doc_id").collect().toSeq === docs.orderBy("doc_id").collect().toSeq)
    // Predicate reaches the ORC scan (same contract the parquet paths get).
    val plan = back.filter(col("doc_id") === 2L).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("doc_id"), plan)
  }

  test("corrupt jsonl: FAILFAST throws; permissive quarantines the raw line") {
    val dir = Files.createTempDirectory("graft_badjsonl").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-00000.json"),
      "{\"doc_id\": 1, \"text\": \"ok\"}\nnot json at all\n{\"doc_id\": 2, \"text\": \"also ok\"}\n"
        .getBytes("UTF-8"))
    val schema = Seq((0L, "")).toDF("doc_id", "text").schema
    intercept[Exception] {
      Interchange.readJsonl(spark, dir, schema).collect()
    }
    val quarantined = Interchange.readJsonlPermissive(spark, dir, schema).cache()
    assert(quarantined.filter(col("_corrupt_record").isNotNull).count() === 1)
    assert(quarantined.filter(col("_corrupt_record").isNull).count() === 2)
    assert(quarantined.filter(col("_corrupt_record").isNotNull)
      .select("_corrupt_record").head().getString(0) === "not json at all")
  }
}
