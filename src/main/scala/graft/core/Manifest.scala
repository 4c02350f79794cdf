package graft.core

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.jackson.Serialization

/** The reference's "poor-man's table format": a per-table `metadata.json`
  * listing every parquet file with ns-precision time stats, plus a
  * per-writer root manifest (reference hepop.js:96–106, 55–72;
  * README.md:101–124; shapes pinned in FIXTURES.md §3).
  *
  * Scale note: the manifest is a catalog artifact maintained by the driver
  * (one small JSON per table, O(files) not O(rows)); executors never touch
  * it. At cluster scale the same role is played by a real table format —
  * the pruning contract (min/max interval overlap) is identical.
  */
object Manifest {

  final case class FileEntry(
      id: Long,
      path: String,
      size_bytes: Long,
      row_count: Long,
      chunk_time: Long, // ns, 10-min floor (reference hepop.js:248)
      min_time: Long,   // ns
      max_time: Long,   // ns
      range: Option[String] = None, // "1h"/"24h" on compacted files
      `type`: String = "raw")

  final case class TableManifest(
      `type`: JValue, // numeric HEP type or LP measurement name
      parquet_size_bytes: Long,
      row_count: Long,
      min_time: Long,
      max_time: Long,
      wal_sequence: Long,
      files: List[FileEntry],
      // Widened table schema (Spark StructType JSON), maintained on every
      // flush like a real table format tracks evolution. Without it, a
      // restarted appender re-infers a NARROW schema from its first point
      // and a newest-file-footer schema probe would silently drop
      // previously-widened columns. Optional: manifests written before
      // this field (or by the reference) still load.
      schema_json: Option[String] = None,
      // Deletion WAL for the compaction swap: input paths are recorded
      // here in the SAME manifest save that publishes the compacted
      // output, then cleared once the inputs are physically deleted. A
      // crash inside that window leaves replaced-but-undeleted inputs on
      // disk, and without this record the heal pass could not tell them
      // from appender orphans (re-adopting them would duplicate rows).
      // Omitted from JSON when empty — reference-shaped manifests load
      // and round-trip unchanged.
      pending_delete: Option[List[String]] = None) {

    def typeName: String = `type` match {
      case JInt(n) => s"hep_$n"
      case JString(s) => s
      case other => other.toString
    }

    /** Roll totals up from the file list (reference hepop.js:253–262). */
    def recomputed: TableManifest = {
      if (files.isEmpty)
        copy(parquet_size_bytes = 0, row_count = 0, min_time = 0, max_time = 0)
      else copy(
        parquet_size_bytes = files.map(_.size_bytes).sum,
        row_count = files.map(_.row_count).sum,
        min_time = files.map(_.min_time).min,
        max_time = files.map(_.max_time).max)
    }

    def addFile(f: FileEntry): TableManifest =
      copy(files = files :+ f, wal_sequence = math.max(wal_sequence, f.id + 1)).recomputed

    /** Merge a flush's schema into the tracked table schema (union of
      * fields; first-seen type wins, matching the widening rules). */
    def withMergedSchema(s: org.apache.spark.sql.types.StructType): TableManifest = {
      val merged = schema_json.map(j =>
        org.apache.spark.sql.types.DataType.fromJson(j)
          .asInstanceOf[org.apache.spark.sql.types.StructType]) match {
        case None => s
        case Some(prev) =>
          val known = prev.fieldNames.toSet
          org.apache.spark.sql.types.StructType(
            prev.fields ++ s.fields.filterNot(f => known.contains(f.name)))
      }
      copy(schema_json = Some(merged.json))
    }

    def trackedSchema: Option[org.apache.spark.sql.types.StructType] =
      schema_json.map(j => org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[org.apache.spark.sql.types.StructType])

    /** Compaction swap: drop inputs, add the merged output
      * (reference hepop.js:815–846). */
    def replaceFiles(removed: Set[String], added: FileEntry): TableManifest =
      copy(files = files.filterNot(f => removed.contains(f.path)) :+ added).recomputed
  }

  final case class WriterManifest(writer_id: String, next_db_id: Long, next_table_id: Long)

  implicit private val formats: Formats = DefaultFormats

  def emptyTable(hepType: Either[Long, String]): TableManifest =
    TableManifest(
      hepType.fold(n => JInt(n), s => JString(s)),
      0, 0, 0, 0, 0, Nil)

  def loadTable(path: Path): Option[TableManifest] =
    if (!Files.exists(path)) None
    else Some(JsonMethods.parse(Files.readString(path)).extract[TableManifest])

  def loadWriter(path: Path): Option[WriterManifest] =
    if (!Files.exists(path)) None
    else Some(JsonMethods.parse(Files.readString(path)).extract[WriterManifest])

  /** Atomic write-temp-then-rename (reference hepop.js:227–243). */
  def save(path: Path, m: AnyRef): Unit = {
    Files.createDirectories(path.getParent)
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    Files.writeString(tmp, Serialization.writePretty(m))
    Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Query-side pruning (reference query.js:41–62): keep files that still
    * exist on disk and whose [min,max] overlaps [startNs,endNs]; sort by
    * min_time. `baseDir` resolves relative manifest paths. */
  def pruneFiles(m: TableManifest, baseDir: Path, startNs: Long, endNs: Long): Seq[String] =
    m.files
      .filter(f => f.max_time >= startNs && f.min_time <= endNs)
      .map(f => (f.min_time, baseDir.resolve(f.path)))
      .filter { case (_, p) => Files.exists(p) }
      .sortBy(_._1)
      .map(_._2.toString)

  /** Table directory layout (reference hepop.js:114–132):
    * `<base>/<writerId>/dbs/hep-<dbId>/<table>-<tableId>/`. */
  def tableDir(base: Path, writerId: String, table: String,
      dbId: Long = 0, tableId: Long = 0): Path =
    base.resolve(writerId).resolve("dbs").resolve(s"hep-$dbId").resolve(s"$table-$tableId")

  def tableManifestPath(base: Path, writerId: String, table: String): Path =
    tableDir(base, writerId, table).resolve("metadata.json")

  /** Inverse of tableDir's last segment: `<table>-<tableId>` → table.
    * Lives HERE, next to the layout it inverts, so the naming scheme and
    * its parser can only change together (ADVICE r5: a regex re-parse at
    * a call site silently breaks when the layout changes). */
  def tableOfDirName(dirName: String): String =
    dirName.replaceAll("-\\d+$", "")

  /** In-process per-table lock serializing manifest read-modify-write
    * cycles between the appender's flush and the compactor's swap (the
    * reference's per-type lock, hepop.js:499–505). Cross-process safety
    * still comes from atomic rename + fresh re-reads. */
  private val tableLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  def withTableLock[T](base: Path, writerId: String, table: String)(f: => T): T = {
    val key = s"${base.toAbsolutePath}|$writerId|$table"
    val lock = tableLocks.computeIfAbsent(key, _ => new Object)
    lock.synchronized(f)
  }

  /** All writer dirs under the base (reference query.js:24–26 iterates all
    * writers — physically a UNION ALL of their file sets). */
  def writerDirs(base: Path): Seq[Path] =
    if (!Files.exists(base)) Nil
    else {
      val s = Files.list(base)
      try s.filter(Files.isDirectory(_)).iterator().asScala.toSeq finally s.close()
    }
}
