package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone maps (per-file min/max manifests) — the data-skipping
  * layer Delta/Iceberg keep in their transaction logs, re-expressed as a
  * plain parquet manifest beside the data.
  *
  * Why this exists beside parquet's own footer statistics: the reader only
  * consults a footer AFTER listing and opening the file. At 100 TB a table
  * is O(10⁵–10⁶) objects, and opening every footer to discard 99% of them
  * dominates query planning; a manifest is a few KB per thousand files and
  * turns file selection into one tiny scan. Parquet row-group stats then
  * prune WITHIN the files that survive. (Same two-tier shape as Iceberg:
  * manifest → row groups.)
  *
  * Zone maps only bite when the layout clusters the column ([[Sink]] range
  * writes, [[Layout.zorderWrite]]): on a scattered layout every file spans
  * the full value range and nothing prunes — the spec pins both halves.
  *
  * Correctness does not depend on the STATS: [[prunedRead]] re-applies the
  * predicate after file selection, so an imprecise min/max can only cost
  * IO. A stale FILE SET is different — a file written after the manifest
  * build is absent from it, and skipping it would silently drop rows — so
  * prunedRead verifies the manifest covers the data dir's current listing
  * (the listing is metadata-plane work the read pays anyway; zone maps
  * save data reads, not listings) and fails loudly on drift.
  */
object ZoneMaps {

  /** One scan of `dataDir` grouped by file → per-file min/max/count for
    * each of `cols`, written as the manifest. At scale this piggybacks on
    * the layout write itself (the writer knows its own min/max); the
    * after-the-fact build is one column-pruned pass. */
  def build(spark: SparkSession, dataDir: String, manifestDir: String,
      cols: Seq[String]): Unit = {
    val df = spark.read.parquet(dataDir)
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).as(s"${c}__min"),
      max(col(c)).as(s"${c}__max"))) :+ count(lit(1)).as("n_rows")
    df.select((cols.map(col) :+ input_file_name().as("file")): _*)
      .groupBy(col("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1) // manifest is metadata-sized: one file per build
      .write.mode("overwrite").parquet(manifestDir)
  }

  /** Read only the files whose [min, max] zone intersects [lo, hi] on
    * `column`, then re-apply the predicate (so results are ≡ a full scan
    * with the same filter regardless of manifest quality). The manifest
    * scan and the surviving-file listing are the metadata plane — the same
    * driver-side role as Spark's own file index, sized by file COUNT, not
    * data. Returns the filtered frame plus the selected file list so
    * callers can audit IO. */
  def prunedRead(spark: SparkSession, dataDir: String, manifestDir: String,
      column: String, lo: Any, hi: Any): (DataFrame, Seq[String]) = {
    val manifest = spark.read.parquet(manifestDir)
    // Freshness gate, BOTH directions. (a) every data file must appear in
    // the manifest: a file added after build is NOT covered and skipping it
    // would drop rows — the one staleness mode re-applying the predicate
    // cannot repair. (b) every manifest entry must still exist: a file
    // deleted/compacted after build would otherwise be selected into
    // `files` and fail the read with a raw path-not-found instead of a
    // clear rebuild message (r4 ADVICE).
    val current = spark.read.parquet(dataDir).inputFiles.toSet
    val covered = manifest.select(col("file")).collect().map(_.getString(0)).toSet
    val missing = current.diff(covered)
    val vanished = covered.diff(current)
    require(missing.isEmpty && vanished.isEmpty,
      s"zone-map manifest at $manifestDir is stale: " +
        s"${missing.size} data file(s) not covered" +
        missing.headOption.map(f => s" (e.g. $f)").getOrElse("") +
        s"; ${vanished.size} manifest entr(ies) whose file no longer exists" +
        vanished.headOption.map(f => s" (e.g. $f)").getOrElse("") +
        "; rebuild with ZoneMaps.build")
    // Keep file iff NOT (max < lo OR min > hi); files with null stats
    // (all-null slab) are kept — over-reading is safe, dropping rows not.
    val keep = manifest.filter(
      !(col(s"${column}__max") < lit(lo) || col(s"${column}__min") > lit(hi)) ||
        col(s"${column}__max").isNull || col(s"${column}__min").isNull)
    val files = keep.select(col("file")).collect().map(_.getString(0)).toSeq
    val pred = col(column) >= lit(lo) && col(column) <= lit(hi)
    val out =
      if (files.isEmpty)
        // Zone-empty range: keep the schema, touch no data files beyond
        // the root listing (filter(false) prunes every partition).
        spark.read.parquet(dataDir).filter(lit(false)).filter(pred)
      else spark.read.parquet(files: _*).filter(pred)
    (out, files)
  }

  /** Incremental manifest maintenance: stat ONLY the data files not yet
    * covered and append their rows to the manifest dir. At 100 TB the
    * full [[build]] rescan on every micro-batch append is the posture
    * bug — the freshness gate in [[prunedRead]] would otherwise force
    * exactly that. Cost: one column-pruned pass over the NEW files
    * (spec-asserted via the stats job's input files), a file-count-sized
    * listing diff, zero touches of covered data. Vanished covered files
    * (compaction) still require [[build]] — this helper is append-only
    * and fails loudly rather than leaving dangling manifest rows. */
  def appendBuild(spark: SparkSession, dataDir: String, manifestDir: String,
      cols: Seq[String]): Seq[String] = {
    val current = spark.read.parquet(dataDir).inputFiles.toSet
    val covered = spark.read.parquet(manifestDir)
      .select(col("file")).collect().map(_.getString(0)).toSet
    val vanished = covered.diff(current)
    require(vanished.isEmpty,
      s"appendBuild is append-only: ${vanished.size} covered file(s) no longer " +
        s"exist (compaction?) — rebuild with ZoneMaps.build" +
        vanished.headOption.map(f => s" (e.g. $f)").getOrElse(""))
    val fresh = current.diff(covered).toSeq.sorted
    if (fresh.nonEmpty) {
      val df = spark.read.parquet(fresh: _*)
      val aggs = cols.flatMap(c => Seq(
        min(col(c)).as(s"${c}__min"),
        max(col(c)).as(s"${c}__max"))) :+ count(lit(1)).as("n_rows")
      df.select((cols.map(col) :+ input_file_name().as("file")): _*)
        .groupBy(col("file"))
        .agg(aggs.head, aggs.tail: _*)
        .coalesce(1)
        .write.mode("append").parquet(manifestDir)
    }
    fresh
  }

  /** Per-file BLOOM sidecar — the point-lookup complement of the min/max
    * manifest (Delta's bloom filter index / Iceberg puffin files). Zone
    * maps only prune RANGE predicates on clustered columns; a point
    * lookup on a high-cardinality, unclustered column (doc_id, url hash,
    * order key) intersects every file's [min, max] and prunes nothing.
    * A per-file Bloom over the column's hashes answers "can this file
    * contain v?" in one manifest scan: no false negatives, so every file
    * holding v survives; false positives only cost IO (the re-applied
    * predicate keeps results ≡ full scan).
    *
    * One data pass grouped by file ([[build]]'s shape) — at scale the
    * writer folds this into the layout write itself. Manifest rows:
    * (file, bf binary, n_rows); size `estKeys` to the expected distinct
    * keys PER FILE. */
  def buildBloom(spark: SparkSession, dataDir: String, manifestDir: String,
      column: String, estKeys: Long = 1L << 16, numBits: Long = 1L << 19): Unit = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftbridge.ColumnBridge
    spark.read.parquet(dataDir)
      .select(xxhash64(col(column)).as("__h"), input_file_name().as("file"))
      .groupBy(col("file"))
      .agg(
        ColumnBridge.column(new BloomFilterAggregate(
          ColumnBridge.expression(col("__h")),
          ColumnBridge.expression(lit(estKeys)),
          ColumnBridge.expression(lit(numBits))).toAggregateExpression()).as("bf"),
        count(lit(1)).as("n_rows"))
      .coalesce(1)
      .write.mode("overwrite").parquet(manifestDir)
  }

  /** [[appendBuild]]'s twin for the Bloom sidecar: sketch only the files
    * not yet covered, append their manifest rows. Same append-only
    * contract (vanished files → rebuild with [[buildBloom]]). */
  def appendBuildBloom(spark: SparkSession, dataDir: String, manifestDir: String,
      column: String, estKeys: Long = 1L << 16, numBits: Long = 1L << 19): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val current = spark.read.parquet(dataDir).inputFiles.toSet
    val covered = spark.read.parquet(manifestDir)
      .select(col("file")).collect().map(_.getString(0)).toSet
    val vanished = covered.diff(current)
    require(vanished.isEmpty,
      s"appendBuildBloom is append-only: ${vanished.size} covered file(s) no " +
        s"longer exist (compaction?) — rebuild with ZoneMaps.buildBloom" +
        vanished.headOption.map(f => s" (e.g. $f)").getOrElse(""))
    val fresh = current.diff(covered).toSeq.sorted
    if (fresh.nonEmpty) {
      spark.read.parquet(fresh: _*)
        .select(xxhash64(col(column)).as("__h"), input_file_name().as("file"))
        .groupBy(col("file"))
        .agg(
          ColumnBridge.column(new BloomFilterAggregate(
            ColumnBridge.expression(col("__h")),
            ColumnBridge.expression(lit(estKeys)),
            ColumnBridge.expression(lit(numBits))).toAggregateExpression()).as("bf"),
          count(lit(1)).as("n_rows"))
        .coalesce(1)
        .write.mode("append").parquet(manifestDir)
    }
    fresh
  }

  /** `column = value` point lookup through the Bloom sidecar: the same
    * freshness gate as [[prunedRead]] (a file added after build is not
    * covered — skipping it would DROP rows, the one staleness mode the
    * re-applied predicate cannot repair), then only files whose sketch
    * might contain the value are read, with the equality re-applied.
    * Returns the frame plus the selected files for IO audits. */
  def bloomPrunedRead(spark: SparkSession, dataDir: String, manifestDir: String,
      column: String, value: Any): (DataFrame, Seq[String]) = {
    val data = spark.read.parquet(dataDir)
    val manifest = spark.read.parquet(manifestDir)
    val current = data.inputFiles.toSet
    val covered = manifest.select(col("file")).collect().map(_.getString(0)).toSet
    val missing = current.diff(covered)
    val vanished = covered.diff(current)
    require(missing.isEmpty && vanished.isEmpty,
      s"bloom manifest at $manifestDir is stale: " +
        s"${missing.size} data file(s) not covered" +
        missing.headOption.map(f => s" (e.g. $f)").getOrElse("") +
        s"; ${vanished.size} manifest entr(ies) whose file no longer exists" +
        vanished.headOption.map(f => s" (e.g. $f)").getOrElse("") +
        "; rebuild with ZoneMaps.buildBloom")
    // The literal is hashed AT THE COLUMN'S TYPE — xxhash64 of an INT and
    // of its BIGINT widening differ, and a mistyped probe would turn the
    // no-false-negative guarantee into silent row loss.
    val vh = spark.range(1)
      .select(xxhash64(lit(value).cast(data.schema(column).dataType)))
      .head().getLong(0)
    // Driver-side probe over the manifest rows (file-count-sized — the
    // same metadata plane as prunedRead's listing check). A null sketch
    // (all-null slab) keeps its file: over-reading is safe, dropping not.
    val files = manifest.select(col("file"), col("bf")).collect().toSeq
      .filter { r =>
        r.isNullAt(1) || org.apache.spark.util.sketch.BloomFilter
          .readFrom(new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          .mightContainLong(vh)
      }
      .map(_.getString(0))
    val pred = col(column) === lit(value)
    val out =
      if (files.isEmpty) data.filter(lit(false)).filter(pred)
      else spark.read.parquet(files: _*).filter(pred)
    (out, files)
  }
}
