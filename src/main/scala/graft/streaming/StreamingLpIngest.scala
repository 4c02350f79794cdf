package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ingest.{BufferedAppender, LineProtocol}

/** Structured-Streaming ingest variant: a file-source stream of
  * line-protocol text feeding the same WAL layout the HTTP/socket paths
  * write (SURVEY §2.7: micro-batching maps to Trigger.ProcessingTime; the
  * reference's 10 s flush timer becomes the trigger interval, and
  * checkpointing upgrades its lose-on-crash buffers to at-least-once).
  *
  * Scale shape (VERDICT r3 item 4): parse AND parquet write run
  * per-partition on executors (WalFiles.writeLpPartition); only file
  * stats return to the driver, which assigns manifest sequences under
  * the table lock. Row bytes never cross the driver.
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
        val baseDir = appender.basePathString
        val writer = appender.writerIdString
        // Driver-side manifest snapshot pins frozen field types across the
        // batch's partitions (see WalFiles.writeLpPartition scaladoc).
        val seed = appender.manifestSchemaSnapshot()
        // Same spread as the HEP path: small text files pack into few read
        // partitions; repartition the bounded micro-batch so parse+write
        // scale out.
        val stats = batch
          .select("value").as(org.apache.spark.sql.Encoders.STRING)
          .repartition(batch.sparkSession.sparkContext.defaultParallelism)
          .mapPartitions { lines: Iterator[String] =>
            val points = lines.map(_.trim).filter(_.nonEmpty)
              .flatMap(LineProtocol.parse(_))
            graft.ingest.WalFiles.writeLpPartition(baseDir, writer, points,
              seedSchemas = seed)
          }(org.apache.spark.sql.Encoders.product[graft.ingest.WalFiles.PartFile])
          .collect()
        stats.foreach(appender.commitExecutorFile)
      }
      .start()
}
