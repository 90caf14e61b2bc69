package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Single-file parquet table readers over the driver-generated synthetic
  * tables (TESTDATA.md). At scale these would be partitioned roots read with
  * `option("basePath", ...)` (see [[graft.etl.PartitionedSource]] for the
  * partition-pruned variant mirroring reference `indexer.py:204-207`).
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  /** `events.ts` is TIMESTAMP(NANOS) in parquet, which Spark's reader
    * rejects natively; read it as nanos-since-epoch and truncate to a
    * micros timestamp with exact integer division (`div`, not `/` — an
    * epoch-nanos value exceeds 2^53 so double math would lose precision).
    * DuckDB performs the same ns→us truncation, so oracles line up. */
  def events(s: SparkSession, d: String): DataFrame = {
    // Prefer setting nanosAsLong in the session builder (graft's own mains
    // and specs do); this guard is a defensive SET-IF-UNSET for caller
    // sessions that didn't, so it never re-mutates shared session conf on
    // every call.
    if (s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    nanosToMicros(apply(s, d, "events"))
  }

  /** The ns→µs `ts` conversion, shared by [[events]] and the streaming
    * events reader (`q22_stream_rollup`) so every consumer of the fixture
    * truncates identically. */
  def nanosToMicros(df: DataFrame): DataFrame =
    df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
      org.apache.spark.sql.functions.expr("ts div 1000")))
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
