package graft

import org.apache.spark.sql.functions._

import graft.operators.Clustering

/** The persisted IVF-PQ serve path ([[Clustering.ivfPqWriteIndex]] /
  * [[Clustering.ivfPqSearchStored]]): results ≡ the in-session search,
  * the codes read is PARTITION-PRUNED to the probed cells (plan-asserted
  * PartitionFilters — the 100 TB "read nProbe/2^cellBits of the index"
  * claim), the byte footprint audit agrees, and the zone-map id-range
  * slice prunes files within cells without changing results.
  */
class StoredIndexSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(sf("embeddings")).cache()
  private lazy val queries = emb.filter(col("vec_id") % 100 === 0)
  private lazy val indexDir = {
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_spec").toString
    Clustering.ivfPqWriteIndex(Clustering.ivfPqIndex(emb), dir)
    dir
  }

  test("stored search ≡ in-session search (parquet round-trip is value-preserving)") {
    val live = Clustering.ivfPqTopK(queries, emb)
    val stored = Clustering.ivfPqSearchStored(queries, indexDir)
    assert(stored.count() > 0)
    assert(live.except(stored).isEmpty && stored.except(live).isEmpty)
  }

  test("codes scan carries the probed cells as PartitionFilters — file-index pruning") {
    val p = Clustering.ivfPqSearchStored(queries, indexDir)
      .queryExecution.executedPlan.toString
    val scan = p.linesIterator
      .filter(l => l.contains("PartitionFilters") && l.contains("/codes"))
      .mkString("\n")
    assert(
      "PartitionFilters: \\[cell#\\d+ (INSET|IN)".r.findFirstIn(scan).isDefined,
      s"codes scan must partition-prune on the probed cells:\n$p")
  }

  test("footprint audit: probed-cell bytes < total index bytes, both positive") {
    // A small batch probes 8 of the populated cells; its file bytes must
    // be a strict subset of the index on this fixture.
    val index = Clustering.ivfPqLoadIndex(spark, indexDir)
    val someQueries = emb.filter(col("vec_id") % 500 === 0)
    val cells = Clustering.probedCellsOf(someQueries, index.centroids)
    val (probedBytes, totalBytes) = Clustering.storedCodesFootprint(spark, indexDir, cells)
    assert(probedBytes > 0 && totalBytes > 0)
    assert(probedBytes < totalBytes,
      s"probed=$probedBytes total=$totalBytes — pruning must skip bytes on this fixture")
  }

  test("id-range slice: results ≡ post-filtered unsliced search candidates, fewer files") {
    val maxId = emb.agg(max(col("vec_id"))).head.getLong(0)
    val lo = 0L
    val hi = maxId / 2
    val sliced = Clustering.ivfPqSearchStored(queries, indexDir, idRange = Some((lo, hi)))
    // Oracle: search an index built over ONLY the slice — same corpus the
    // sliced read exposes (top-k over identical candidates ⇒ identical
    // output, because codes/centroids/codebook come from the same stored
    // artifact in both cases — only the candidate row set differs).
    val full = Clustering.ivfPqSearchStored(queries, indexDir, topK = 100000)
      .filter(col("vec_id") >= lo && col("vec_id") <= hi)
    // ranks differ (full ranks before slicing), so compare the per-query
    // top-5 id/score sets after re-ranking the filtered full result.
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id"))
    val rr = full.withColumn("r2", row_number().over(w)).filter(col("r2") <= 5)
      .select(col("q_id"), col("vec_id"), col("score"))
    val sl = sliced.select(col("q_id"), col("vec_id"), col("score"))
    assert(sl.count() > 0)
    assert(sl.except(rr).isEmpty && rr.except(sl).isEmpty)
  }
}
