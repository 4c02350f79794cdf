package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup — the streaming form of `ops.Dedup.exact`: a
  * document is dropped when its content digest was already seen.
  *
  * State discipline: `dropDuplicatesWithinWatermark` keys the dedup state
  * on the sha2 digest but EVICTS entries once the watermark passes their
  * event time + delay — the state store holds one 64-hex digest per
  * distinct document seen within the watermark horizon, not per document
  * ever. That bounded-state trade (an exact duplicate arriving after the
  * horizon is re-admitted) is the standard production shape; unbounded
  * exactness is the batch operator's job over the accumulated WAL.
  *
  * Scale: state is hash-partitioned by digest across executors like any
  * streaming aggregate; the shuffle carries digests, never document text.
  */
object StreamingDedup {

  /** `docs` must be a streaming DataFrame with an event-time column `ts`
    * and a `text` column. Returns first-seen rows only. */
  def dedup(docs: DataFrame, watermarkDelay: String = "10 minutes"): DataFrame =
    docs
      .withColumn("h", sha2(col("text"), 256))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("h")
      .drop("h")
}
