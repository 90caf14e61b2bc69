package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.TextHash
import graft.operators.{Dedup, TextAnalysis}

/** Streaming MinHash+LSH near-dup candidate detection: the streaming twin
  * of [[Dedup.minhashPairs]]'s candidate stage. A document's signature is
  * computed PER ROW (higher-order functions over its own shingle set — the
  * batch pipeline's groupBy is unnecessary when the whole document is one
  * row), so the only stateful step is the band-bucket membership join,
  * expressed as `flatMapGroupsWithState` keyed by (band, band_key): each
  * bucket remembers the doc ids seen, and a new arrival emits a candidate
  * pair against every remembered member — including documents from earlier
  * micro-batches, which a per-batch self-join would miss.
  *
  * State posture: LSH buckets are small by construction (a big bucket means
  * near-identical docs, which is exactly what dedup removes upstream);
  * `maxBucket` hard-caps pathological buckets, trading recall among docs
  * beyond the cap for bounded state. A production deployment would add
  * event-time TTL (`GroupStateTimeout.EventTimeTimeout`) to age buckets out
  * of the dedup horizon entirely.
  */
object StreamingNearDup {

  final case class BandedDoc(band: Int, band_key: Long, doc_id: Long)
  final case class CandPair(doc_a: Long, doc_b: Long)

  /** One row per (band, band_key, doc_id), with signatures identical to the
    * batch [[Dedup.lshBands]] ∘ [[Dedup.minhashSignatures]] output (same
    * shingle hashing, same permutations, same band fold — spec-asserted).
    * Intermediates are materialized as columns: interpreted HOF lambdas
    * re-evaluate captured expressions per element, so nesting the whole
    * chain into one expression would re-tokenize per shingle per
    * permutation. */
  def bandedDocs(docs: DataFrame): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val starts =
      when(size(toks) >= 3, sequence(lit(1), size(toks) - 2))
        .otherwise(array().cast("array<int>"))
    val nBands = Dedup.MinhashK / Dedup.BandR
    docs
      .withColumn("__sh",
        array_distinct(transform(starts, i => concat_ws(" ", slice(toks, i, lit(3))))))
      // 60-bit shingle hash mod P: minima over the multiset equal minima
      // over the distinct-h set, so distinct on strings is enough.
      .withColumn("__hp",
        transform(col("__sh"), s =>
          (TextHash.polyHash(s) + TextHash.polyHash(reverse(s)) * lit(1L << 30))
            % lit(TextHash.Prime)))
      .withColumn("__mh",
        transform(sequence(lit(0), lit(Dedup.MinhashK - 1)),
          i => array_min(transform(col("__hp"), hp => TextHash.minhashPerm(hp, i)))))
      .filter(size(col("__hp")) > 0) // no shingles → no bands (as in batch)
      .select(
        col("doc_id"),
        explode(transform(sequence(lit(0), lit(nBands - 1)), b =>
          struct(
            b.cast("int").as("band"),
            (element_at(col("__mh"), b * Dedup.BandR + 1) * lit(1L) +
              element_at(col("__mh"), b * Dedup.BandR + 2) * lit(2L)).as("band_key"))))
          .as("bb"))
      .select(col("bb.band").as("band"), col("bb.band_key").as("band_key"), col("doc_id"))
  }

  /** Candidate pairs (doc_a < doc_b), possibly repeated when two docs share
    * several bands — distinct them downstream (the batch pipeline's
    * verification join dedups anyway). Works on a batch frame too (state
    * starts empty per key), which is how the spec cross-checks recall. */
  def candidatePairs(docs: DataFrame, maxBucket: Int = 64): Dataset[CandPair] = {
    import docs.sparkSession.implicits._
    bandedDocs(docs).as[BandedDoc]
      .groupByKey(r => (r.band, r.band_key))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: (Int, Long), rows: Iterator[BandedDoc], state: GroupState[Seq[Long]]) => {
          val seen = state.getOption.getOrElse(Seq.empty)
          val arrivals = rows.map(_.doc_id).toSeq.distinct.sorted
            .filterNot(seen.contains)
          val out = scala.collection.mutable.ArrayBuffer.empty[CandPair]
          var members = seen
          arrivals.foreach { id =>
            members.foreach { m =>
              out += CandPair(math.min(m, id), math.max(m, id))
            }
            if (members.size < maxBucket) members = members :+ id
          }
          state.update(members)
          out.iterator
        })
  }
}
