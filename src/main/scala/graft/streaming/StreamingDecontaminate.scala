package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming eval-set decontamination — the stream-STATIC-join form of
  * `ops.Dedup.decontaminate` (d11), and the canonical Structured
  * Streaming enrichment shape: the benchmark/eval set is a bounded
  * static table, the corpus is the stream.
  *
  * Each arriving document's shingles join the static eval postings
  * (broadcast — the eval side is small by definition), and a windowed
  * aggregation counts shared shingles per (window, doc, eval) pair;
  * pairs at or above `minShared` emit when the event-time window closes
  * under the watermark. The stream side never shuffles before the join
  * — the same map-only-into-the-count plan the batch audit asserts.
  *
  * Windowed semantics are the streaming trade: a document's counts
  * aggregate within its window and emit once, finalized, when the
  * watermark passes — the append-mode contract for aggregations. The
  * batch operator is the window-free exact form over the WAL.
  */
object StreamingDecontaminate {

  /** `docs`: streaming (doc_id, ts, text). `evalDocs`: STATIC (doc_id,
    * text). Emits (window_start, doc_id, eval_id, shared) rows for
    * shared >= minShared, finalized per event-time window. */
  def flagged(docs: DataFrame, evalDocs: DataFrame, minShared: Int = 5,
      windowDur: String = "10 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val ev = evalDocs
      .select(col("doc_id").as("eval_id"),
        explode(graft.ops.Dedup.shingles(col("text"))).as("g"))
    docs
      .select(col("doc_id"), col("ts"),
        explode(graft.ops.Dedup.shingles(col("text"))).as("g"))
      .withWatermark("ts", watermarkDelay)
      .join(broadcast(ev), "g")
      .groupBy(window(col("ts"), windowDur), col("doc_id"), col("eval_id"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared)
      .select(col("window.start").as("window_start"),
        col("doc_id"), col("eval_id"), col("shared"))
  }
}
