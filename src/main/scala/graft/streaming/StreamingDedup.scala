package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup over a documents stream — the incremental
  * sibling of [[graft.operators.Dedup.exact]]: one row per distinct
  * content hash, emitted on FIRST sight, duplicates arriving later in
  * the stream dropped. State is the set of seen hashes bounded by the
  * event-time watermark (`dropDuplicatesWithinWatermark` — a duplicate
  * arriving within `watermarkDelay` of the first occurrence is
  * guaranteed dropped; state for hashes older than the watermark is
  * evicted, so memory is O(distinct hashes per watermark window), not
  * O(stream) — the property that makes streaming dedup viable at
  * ingest-pipeline scale).
  *
  * Only the 16-byte hash and the small projected columns enter state —
  * never the text (same shuffle-the-hash-not-the-text contract as the
  * batch dedup family).
  */
object StreamingDedup {

  def exact(stream: DataFrame, watermarkDelay: String = "10 minutes"): DataFrame =
    stream
      .withColumn("text_hash", md5(col("text")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("text_hash")
}
