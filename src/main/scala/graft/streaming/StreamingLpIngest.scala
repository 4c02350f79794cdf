package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ingest.{BufferedAppender, LineProtocol}

/** Structured-Streaming ingest variant: a file-source stream of
  * line-protocol text feeding the same WAL appender the HTTP/socket paths
  * use (SURVEY §2.7: micro-batching maps to Trigger.ProcessingTime; the
  * reference's 10 s flush timer becomes the trigger interval, and
  * checkpointing upgrades its lose-on-crash buffers to at-least-once).
  *
  * Scale note: the per-batch materialization to the driver mirrors the
  * reference's in-memory buffer and is bounded by the micro-batch; on a
  * cluster the foreachBatch body would instead partition-write parquet
  * directly and only the manifest update would touch the driver.
  */
final class StreamingLpIngest(
    spark: SparkSession,
    inputDir: String,
    checkpointDir: String,
    appender: BufferedAppender,
    triggerMs: Long = 10000) {

  /** start() under restart supervision (see Supervised). */
  def startSupervised(retryDelayMs: Long = 5000): AutoCloseable =
    Supervised("lp-stream", () => start(), retryDelayMs)

  def start(): StreamingQuery =
    spark.readStream
      .format("text")
      .load(inputDir)
      .writeStream
      .trigger(Trigger.ProcessingTime(triggerMs))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val lines = batch.collect().map(_.getString(0))
        val points = lines.iterator.map(_.trim).filter(_.nonEmpty)
          .flatMap(LineProtocol.parse(_)).toSeq
        if (points.nonEmpty) {
          appender.addLinePoints(points)
          appender.flushAll()
        }
      }
      .start()
}
