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
        // Same spread as the HEP path: small text files pack into few read
        // partitions; repartition the bounded micro-batch so parse+write
        // scale out.
        // Both passes (type discovery + write) recompute from the text
        // source: persisting the lines in between measured SLOWER than
        // the reparse (block-store serialization of plain strings costs
        // more than splitting them again).
        val lines = batch
          .select("value").as(org.apache.spark.sql.Encoders.STRING)
          .repartition(batch.sparkSession.sparkContext.defaultParallelism)
        // Batch-global type resolution BEFORE writing: the manifest
        // snapshot pins previously frozen types, but a field first seen
        // in THIS batch with conflicting value types in different
        // partitions would still freeze divergently under partition-
        // local first-occurrence-wins (one file DOUBLE, one UTF8 — the
        // table then fails to read). A cheap distinct (measurement,
        // field, type) pre-pass resolves every new field widest-wins
        // (WalFiles.widerLpType), partition-independently. Costs one
        // extra parse of the bounded micro-batch.
        val seed = appender.manifestSchemaSnapshot()
        val discovered = lines.mapPartitions { ls: Iterator[String] =>
          val acc = scala.collection.mutable.LinkedHashMap
            .empty[(String, String), org.apache.spark.sql.types.DataType]
          ls.map(_.trim).filter(_.nonEmpty).flatMap(LineProtocol.parse(_))
            .foreach { p =>
              p.fields.foreach { case (k, v) =>
                val t = graft.ingest.WalFiles.lpType(v)
                acc((p.measurement, k)) = acc.get((p.measurement, k))
                  .map(graft.ingest.WalFiles.widerLpType(_, t)).getOrElse(t)
              }
            }
          acc.iterator.map { case ((m, f), t) => (m, f, t.typeName) }
        }(org.apache.spark.sql.Encoders.product[(String, String, String)])
          .collect()
        val fullSeed = graft.ingest.WalFiles
          .resolveBatchSchemas(seed, discovered.toSeq)
        val stats = lines
          .mapPartitions { lines: Iterator[String] =>
            val points = lines.map(_.trim).filter(_.nonEmpty)
              .flatMap(LineProtocol.parse(_))
            graft.ingest.WalFiles.writeLpPartition(baseDir, writer, points,
              seedSchemas = fullSeed)
          }(org.apache.spark.sql.Encoders.product[graft.ingest.WalFiles.PartFile])
          .collect()
        stats.foreach(appender.commitExecutorFile)
      }
      .start()
}
