package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup for a document stream: key on md5(text) and drop
  * duplicates within the watermark horizon (`dropDuplicatesWithinWatermark`
  * — state for a key is held only until the watermark passes its event
  * time, so state size is bounded by the horizon, not the stream history;
  * plain `dropDuplicates` on an unbounded stream grows state forever).
  * The streaming twin of [[graft.operators.Dedup.exact]].
  */
object StreamingDedup {

  def exactStream(
      docs: DataFrame,
      tsCol: String = "ts",
      textCol: String = "text",
      watermark: String = "1 hour"): DataFrame = {
    val keyed = docs.withColumn("text_md5", md5(col(textCol)))
    if (keyed.isStreaming)
      keyed.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark("text_md5")
    else keyed.dropDuplicates("text_md5")
  }
}
