package graft.ingest

import java.nio.file.{Files, Path, StandardCopyOption}
import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

import graft.core.{Manifest, TimeUtils}

/** Buffered parquet WAL writer — the reference's ParquetBufferManager
  * re-expressed on Spark (reference hepop.js:11–410).
  *
  * Semantics kept: per-table buffer, flush at `bufferSize` rows
  * (hepop.js:146–148) or on the caller's timer (10 s default,
  * hepop.js:151–157); each flush writes one parquet file
  * `<table>/<YYYY-MM-DD>/<HH-M0>/<seq pad10>.parquet` placed by the FIRST
  * buffered row's timestamp (hepop.js:164–165); bloom filter on `timestamp`
  * (hepop.js:27–34); manifest file entry with row-accurate ns min/max
  * (hepop.js:245–276) so query pruning is correct even when late rows land
  * in a "wrong" directory.
  *
  * Divergence (documented, SURVEY §7.4): LP schemas WIDEN — a new field on
  * a known measurement adds a nullable column instead of breaking like the
  * reference; written files carry the schema at flush time and reads use
  * mergeSchema.
  *
  * Scale note: the buffer is an ingest-edge structure (one per receiver);
  * the analytical path never sees it. On a cluster this role moves to
  * Structured Streaming `foreachBatch` with the same flush semantics.
  */
final class BufferedAppender(
    spark: SparkSession, // kept: call sites bind the session owning this WAL
    base: Path,
    writerId: String = "writer1",
    bufferSize: Int = 1000) {

  val hepSchema: StructType = StructType(Seq(
    StructField("timestamp", TimestampType, nullable = false),
    StructField("rcinfo", StringType, nullable = true),
    StructField("payload", StringType, nullable = true)))

  private final class TableBuffer(val name: String, var schema: StructType) {
    val rows = mutable.ArrayBuffer.empty[Row]
  }

  /** The manifest is re-read from disk at each flush, never cached across
    * flushes: the compactor swaps the manifest between flushes, and a
    * cached copy saved over the swap would both resurrect deleted raw
    * inputs and lose the compacted file entry — catalog-level data loss
    * (ADVICE r1, high). The reference re-reads per operation too
    * (hepop.js:245–276). */
  private def freshManifest(name: String): Manifest.TableManifest =
    Manifest.loadTable(Manifest.tableManifestPath(base, writerId, name))
      .getOrElse(Manifest.emptyTable(
        if (name.startsWith("hep_")) Left(name.stripPrefix("hep_").toLong)
        else Right(name)))

  private val buffers = mutable.LinkedHashMap.empty[String, TableBuffer]

  def addHep(pkt: HepV3.Packet, nowMs: => Long = System.currentTimeMillis()): Unit =
    synchronized {
      val hepType = pkt.rcinfo.payloadType.getOrElse(0)
      val table = s"hep_$hepType"
      val buf = buffers.getOrElseUpdate(table, new TableBuffer(table, hepSchema))
      val ms = pkt.rcinfo.timestampMs(nowMs)
      buf.rows += Row(new Timestamp(ms), pkt.rcinfo.toJson, pkt.payloadString)
      if (buf.rows.size >= bufferSize) flushTable(buf)
    }

  /** Bulk LP append (reference addLineProtocolBulk, hepop.js:376–409). */
  def addLinePoints(points: Seq[LineProtocol.Point],
      nowNs: => Long = System.currentTimeMillis() * TimeUtils.NsPerMs): Unit =
    synchronized {
      points.groupBy(_.measurement).foreach { case (m, pts) =>
        val buf = buffers.getOrElseUpdate(m, new TableBuffer(m, lpBaseSchema))
        pts.foreach { p =>
          widenSchema(buf, p)
          val ms = TimeUtils.nsToMs(p.timestampNs.getOrElse(nowNs))
          val fieldMap = p.fields.toMap
          val values: Seq[Any] = buf.schema.fields.toSeq.map { f =>
            f.name match {
              case "timestamp" => new Timestamp(ms)
              case "tags" => tagsJson(p.tags)
              case n => fieldMap.get(n).map(lpValue(_, f.dataType)).orNull
            }
          }
          buf.rows += Row(values: _*)
        }
        if (buf.rows.size >= bufferSize) flushTable(buf)
      }
    }

  private val lpBaseSchema = WalFiles.lpBaseSchema

  // Shared with the executor-side partition writers (WalFiles): same type
  // mapping, same row shape, same file layout — one WAL dialect.
  private def lpType(v: LineProtocol.FieldValue): DataType = WalFiles.lpType(v)
  private def lpValue(v: LineProtocol.FieldValue, dt: DataType): Any = WalFiles.lpValue(v, dt)

  private def widenSchema(buf: TableBuffer, p: LineProtocol.Point): Unit = {
    val known = buf.schema.fieldNames.toSet
    val added = p.fields.collect {
      case (k, v) if !known.contains(k) => StructField(k, lpType(v), nullable = true)
    }
    if (added.nonEmpty) {
      buf.schema = StructType(buf.schema.fields ++ added)
      // Rows already buffered were built against the narrower schema — pad
      // them with nulls so every Row matches buf.schema at flush time
      // (VERDICT r1 #3: unpadded rows crashed createDataFrame and lost the
      // whole buffer).
      val pad: Seq[Any] = added.map(_ => null).toSeq
      for (i <- buf.rows.indices) {
        val r = buf.rows(i)
        buf.rows(i) = Row(r.toSeq ++ pad: _*)
      }
    }
  }

  private def tagsJson(tags: Seq[(String, String)]): String = WalFiles.tagsJson(tags)

  /** Flush every non-empty buffer (timer path / shutdown;
    * reference hepop.js:151–157, 1166–1170). */
  def flushAll(): Unit = synchronized {
    buffers.values.foreach(flushTable)
  }

  private def flushTable(buf: TableBuffer): Unit = {
    if (buf.rows.isEmpty) return
    Manifest.withTableLock(base, writerId, buf.name)(flushLocked(buf))
  }

  private def flushLocked(buf: TableBuffer): Unit = {
    val manifest = freshManifest(buf.name)
    val firstMs = buf.rows.head.getTimestamp(0).getTime
    val seq = manifest.wal_sequence
    val dir = Manifest.tableDir(base, writerId, buf.name)
      .resolve(TimeUtils.dateDir(firstMs)).resolve(TimeUtils.timeDir(firstMs))
    Files.createDirectories(dir)
    val target = dir.resolve(f"$seq%010d.parquet")

    writeSingleParquet(buf.rows.toSeq, buf.schema, target)

    val (minMs, maxMs) = buf.rows.foldLeft((Long.MaxValue, Long.MinValue)) { (acc, r) =>
      val t = r.getTimestamp(0).getTime
      (math.min(acc._1, t), math.max(acc._2, t))
    }
    val entry = Manifest.FileEntry(
      id = seq,
      path = base.relativize(target).toString,
      size_bytes = Files.size(target),
      row_count = buf.rows.size,
      chunk_time = TimeUtils.chunkTimeNs(TimeUtils.msToNs(firstMs)),
      min_time = TimeUtils.msToNs(minMs),
      max_time = TimeUtils.msToNs(maxMs))
    Manifest.save(Manifest.tableManifestPath(base, writerId, buf.name),
      manifest.addFile(entry).withMergedSchema(buf.schema))
    updateWriterManifest()
    buf.rows.clear()
  }

  /** Maintain the per-writer root manifest (reference hepop.js:55–72).
    * Despite the `next_*` names these are NOT counters in the reference:
    * they are initialized to 0 and never incremented, and every table
    * path is built from them as `hep-${next_db_id}/<table>-${next_table_id}`
    * (hepop.js:126–127, 221–222, 695–696). They must therefore stay 0 to
    * agree with the physical `hep-0/<table>-0` layout — a reference
    * process reading a manifest with other values would derive paths that
    * don't exist. This is the manifest-compatibility contract, verified
    * against the reference's own path arithmetic. */
  private def updateWriterManifest(): Unit = {
    val path = base.resolve(writerId).resolve("metadata.json")
    if (Manifest.loadWriter(path).isEmpty)
      Manifest.save(path, Manifest.WriterManifest(writerId, 0, 0))
  }

  /** WAL flush via the DIRECT single-file parquet writer (WalFiles.write —
    * layout contract documented there; launching a Spark job per 1,000-row
    * flush made the job scheduler the ingest ceiling). Written to a
    * dot-tmp name and atomically renamed (reference parity:
    * hepop.js:245–276). The reference writes its WAL files with its own
    * writer too (parquetjs, hepop.js:159–214). */
  private def writeSingleParquet(rows: Seq[Row], schema: StructType, target: Path): Unit = {
    val tmp = target.getParent.resolve("." + target.getFileName.toString + ".tmp")
    WalFiles.write(rows, schema, tmp)
    WalFiles.publish(tmp, target)
  }

  /** Commit an executor-written WAL temp file (WalFiles.writeHepPartition /
    * writeLpPartition): assign the manifest sequence under the table lock,
    * rename the temp into the reference layout's `<seq pad10>.parquet`
    * name, append the manifest entry, merge the schema. Only stats and a
    * rename happen here — the row bytes never crossed the driver. */
  def commitExecutorFile(st: WalFiles.PartFile): Unit = synchronized {
    Manifest.withTableLock(base, writerId, st.table) {
      val manifest = freshManifest(st.table)
      val seq = manifest.wal_sequence
      val tmp = java.nio.file.Paths.get(st.tmpPath)
      val target = tmp.getParent.resolve(f"$seq%010d.parquet")
      WalFiles.publish(tmp, target)
      val entry = Manifest.FileEntry(
        id = seq,
        path = base.relativize(target).toString,
        size_bytes = Files.size(target),
        row_count = st.rowCount,
        chunk_time = TimeUtils.chunkTimeNs(TimeUtils.msToNs(st.firstMs)),
        min_time = TimeUtils.msToNs(st.minMs),
        max_time = TimeUtils.msToNs(st.maxMs))
      val schema = DataType.fromJson(st.schemaJson).asInstanceOf[StructType]
      Manifest.save(Manifest.tableManifestPath(base, writerId, st.table),
        manifest.addFile(entry).withMergedSchema(schema))
      updateWriterManifest()
    }
  }

  /** Base directory / writer id, for executor-side partition writers that
    * must compute placement paths without holding this (driver-bound)
    * object. */
  def basePathString: String = base.toString
  def writerIdString: String = writerId

  /** Snapshot of manifest-tracked schemas (table → StructType JSON) for
    * this writer, shipped into executor-side LP partition writers so
    * previously frozen column types win across partitions (ADVICE r4:
    * partition-local first-occurrence-wins typing can write the same
    * field as DOUBLE and UTF8 within one micro-batch, breaking reads). */
  def manifestSchemaSnapshot(): Map[String, String] = {
    val dbs = base.resolve(writerId).resolve("dbs")
    if (!Files.exists(dbs)) return Map.empty
    import scala.jdk.CollectionConverters._
    val dbStream = Files.list(dbs)
    val tables =
      try dbStream.iterator().asScala.flatMap { db =>
        val ts = Files.list(db)
        try ts.iterator().asScala
          .map(p => Manifest.tableOfDirName(p.getFileName.toString)).toList
        finally ts.close()
      }.toList
      finally dbStream.close()
    tables.distinct.flatMap { t =>
      Manifest.loadTable(Manifest.tableManifestPath(base, writerId, t))
        .flatMap(_.schema_json).map(t -> _)
    }.toMap
  }

  def bufferedRowCount(table: String): Int =
    synchronized { buffers.get(table).map(_.rows.size).getOrElse(0) }

  def tableNames: Seq[String] = synchronized { buffers.keys.toSeq }
}
