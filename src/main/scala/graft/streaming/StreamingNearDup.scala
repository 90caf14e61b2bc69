package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Dedup

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
    * batch [[Dedup.lshBands]] ∘ [[Dedup.minhashSignatures]] output
    * (spec-asserted) — computed by the same per-row generated-code
    * expressions the batch [[Dedup.minhashPairs]] uses and the shared
    * [[Dedup.bandKeys]] fold, so the streaming and batch candidate stages
    * can never drift apart. */
  def bandedDocs(docs: DataFrame): DataFrame = {
    import graft.functions.GraftColumns
    docs
      .withColumn("__hs", GraftColumns.shingleHashes(col("text"), 3))
      .filter(size(col("__hs")) > 0) // no shingles → no bands (as in batch)
      .withColumn("__mh", GraftColumns.minhashArr(col("__hs"), Dedup.MinhashK))
      .select(col("doc_id"), posexplode(Dedup.bandKeys(col("__mh"))).as(Seq("band", "band_key")))
      .select(col("band").cast("int").as("band"), col("band_key"), col("doc_id"))
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
