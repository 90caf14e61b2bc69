package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Line-oriented interchange formats: JSONL and CSV, the get-data-in/out
  * edges the parquet-only reference lacks (SURVEY.md §2.1 — its world ends
  * at the lake boundary; real corpus pipelines ingest crawler JSONL and
  * export audit CSVs).
  *
  * Two deliberate defaults for the 100 TB posture:
  *   - **Schema is explicit, never inferred.** Inference is a full extra
  *     read of the data before the real read, and a sampled inference can
  *     silently widen/narrow types between runs. Callers pass the
  *     `StructType`; `df.schema` of the producing frame is the usual source.
  *   - **FAILFAST by default.** A malformed line in PERMISSIVE mode becomes
  *     a row of nulls — at corpus scale that is silent data loss that no
  *     downstream count will flag. Opt into PERMISSIVE only when
  *     quarantining: `readJsonlPermissive` keeps the raw bad line in
  *     `_corrupt_record` so the quarantine is itself auditable.
  *
  * Writers gzip JSONL (line-splittable readers still parallelize per FILE;
  * files stay numerous because the writer inherits the frame's
  * partitioning) and leave CSV plain with a header.
  */
object Interchange {

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "gzip").json(path)

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  /** PERMISSIVE variant for quarantine flows: rows that fail to parse keep
    * their raw line in `_corrupt_record` (all data columns null). Spark
    * refuses queries that reference ONLY the corrupt column
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache or
    * persist the parsed frame before filtering the quarantine out. */
  def readJsonlPermissive(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** ORC round-trip — the other columnar lake format. Schema travels with
    * the file (no explicit schema needed on read), predicates and column
    * pruning push into the scan like parquet; snappy to match the parquet
    * sink's codec choice. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "snappy").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      // Quote/escape explicitly: free-text columns contain commas, quotes,
      // and newlines; the reader below uses the same convention.
      .option("quote", "\"").option("escape", "\"")
      .csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("quote", "\"").option("escape", "\"")
      .option("multiLine", "true") // quoted newlines in text columns
      .option("mode", "FAILFAST")
      .csv(path)
}
