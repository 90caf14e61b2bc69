package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Typo-tolerant string self-join (edit distance ≤ 1) by DELETION
  * NEIGHBORHOODS — the SymSpell decomposition: two strings within one
  * edit (substitution, insertion, or deletion) always share a common
  * member of their {self} ∪ {single-deletion variants} sets, so an
  * equi-join on variants has FULL recall at distance 1 — unlike LSH, no
  * probabilistic miss — and the O(n²) pair space collapses to
  * Σ per-variant-bucket². An exact `levenshtein` recheck on the
  * candidates removes the false positives (distinct strings sharing a
  * variant can be distance 2), so the neighborhood stage is
  * output-invisible — the sketch-then-verify pattern of
  * `bloomContamination` and `heavyHitters`.
  *
  * Scale shape: (len+1) variant rows per string (generated per-row with
  * a higher-order `transform` — no UDF), one hash-shuffle on the variant
  * string, candidate pairs are bucket-bounded, and the exact recheck
  * runs only on candidates. The verify join fetches each side's full
  * string by id — two narrow joins against the input, never an n² pair
  * frame of raw strings.
  *
  * Output: (name_a, name_b, dist) with name_a < name_b, dist ≤ 1
  * (0 = exact duplicates of distinct ids). */
object FuzzyJoin {

  def selfJoin(strs: DataFrame, idCol: String = "id", strCol: String = "s"): DataFrame = {
    val base = strs.select(col(idCol).as("__id"), col(strCol).as("__s"))
    // {self} ∪ single-deletion variants, deduplicated per row (repeated
    // characters produce identical deletions).
    val variants = base.select(
      col("__id"),
      explode(array_distinct(concat(
        array(col("__s")),
        expr("transform(sequence(1, length(__s)), i -> concat(substring(__s, 1, i - 1), substring(__s, i + 1, length(__s))))"))))
        .as("__v"))
    // shuffle_hash pinned on both sides (CLAUDE.md bucket-join rule): the
    // variant frame is input-sized, so AQE would broadcast it and
    // serialize the Σ bucket² candidate explosion into the probe tasks.
    val cands = variants.as("a").hint("shuffle_hash")
      .join(variants.as("b").hint("shuffle_hash"),
        col("a.__v") === col("b.__v") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("__ida"), col("b.__id").as("__idb"))
      .distinct()
    cands
      .join(base.select(col("__id").as("__ida"), col("__s").as("name_a")), Seq("__ida"))
      .join(base.select(col("__id").as("__idb"), col("__s").as("name_b")), Seq("__idb"))
      // one O(len²) distance per candidate (filter + output read the column)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= 1)
      .select(
        least(col("name_a"), col("name_b")).as("name_a"),
        greatest(col("name_a"), col("name_b")).as("name_b"),
        col("dist"))
  }

  /** ID-level variant of [[selfJoin]]: the matched pairs as
    * (id_a < id_b, dist) rows — the edge list an entity-resolution
    * clustering ([[Dedup.clusters]]) consumes. Same neighborhood + exact
    * recheck machinery; only the projection differs. */
  def selfJoinIds(strs: DataFrame, idCol: String = "id", strCol: String = "s"): DataFrame = {
    val base = strs.select(col(idCol).as("__id"), col(strCol).as("__s"))
    val variants = base.select(
      col("__id"),
      explode(array_distinct(concat(
        array(col("__s")),
        expr("transform(sequence(1, length(__s)), i -> concat(substring(__s, 1, i - 1), substring(__s, i + 1, length(__s))))"))))
        .as("__v"))
    val cands = variants.as("a").hint("shuffle_hash")
      .join(variants.as("b").hint("shuffle_hash"),
        col("a.__v") === col("b.__v") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("__ida"), col("b.__id").as("__idb"))
      .distinct()
    cands
      .join(base.select(col("__id").as("__ida"), col("__s").as("__sa")), Seq("__ida"))
      .join(base.select(col("__id").as("__idb"), col("__s").as("__sb")), Seq("__idb"))
      .withColumn("dist", levenshtein(col("__sa"), col("__sb")).cast("long"))
      .filter(col("dist") <= 1)
      .select(col("__ida").as("id_a"), col("__idb").as("id_b"), col("dist"))
  }
}
