package graft.compact

import java.nio.file.{Files, Path, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

import graft.core.{Manifest, TimeUtils}

/** Small-file compaction — the reference's CompactionManager re-expressed
  * as a Spark batch job (reference hepop.js:412–959).
  *
  * Semantics kept (hepop.js:581–785): group files by the hour of their
  * `chunk_time`; a group is compacted when it has ≥2 raw files (or raw
  * files + an existing compacted target) older than the tier interval;
  * output is `c_<seq>.parquet` in the `<HH>-00` hour directory; the
  * manifest swap drops inputs and adds the merged entry atomically; input
  * files are deleted and empty non-current-hour directories pruned.
  *
  * Improvements over the reference (SURVEY §3.4): the merge is one
  * distributed `read.parquet(group).coalesce(1).write` instead of a
  * row-by-row JS copy, and file stats come from the written data, not an
  * O(rows) rescan (hepop.js:787–813). README.md:15 claims DuckDB does this
  * in the reference; in code it never does (SURVEY Appendix A#4).
  */
final class Compactor(
    spark: SparkSession,
    base: Path,
    writerId: String = "writer1",
    rawAgeNs: Long = 600L * 1000000000L) { // 10-min tier (hepop.js:415–419)

  /** One compaction pass over one table (the reference loops per type on a
    * 60 s timer, hepop.js:442–449 — cadence belongs to the caller). */
  def compactTable(table: String,
      nowNs: Long = System.currentTimeMillis() * TimeUtils.NsPerMs): Int = {
    val mpath = Manifest.tableManifestPath(base, writerId, table)
    val manifest = Manifest.loadTable(mpath).getOrElse(return 0)

    // Age gate (hepop.js:600–606): only raw files whose chunk is older than
    // the tier interval; group by hour (hepop.js:609–631).
    val eligible = manifest.files.filter(f =>
      f.`type` == "raw" && f.chunk_time < nowNs - rawAgeNs)
    val byHour = eligible.groupBy(f => TimeUtils.hourNs(f.chunk_time))

    var merged = 0
    byHour.toSeq.sortBy(_._1).foreach { case (hourNs, rawFiles) =>
      // Fold in the newest existing compacted target for this hour
      // (hepop.js:657–667) so repeated passes converge to one file.
      val target = manifest.files
        .filter(f => f.`type` == "compacted" && TimeUtils.hourNs(f.chunk_time) == hourNs)
        .sortBy(-_.id).headOption
      val inputs = rawFiles ++ target.toList
      // ≥2 raw, or raw + existing target (hepop.js:670–677).
      if (rawFiles.size >= 2 || (rawFiles.nonEmpty && target.nonEmpty)) {
        compactGroup(table, hourNs, inputs)
        merged += 1
      }
    }
    merged
  }

  private def compactGroup(table: String, hourNs: Long,
      inputs: Seq[Manifest.FileEntry]): Unit = {
    val mpath = Manifest.tableManifestPath(base, writerId, table)
    val manifest = Manifest.loadTable(mpath).get
    val paths = inputs.map(f => base.resolve(f.path)).filter(Files.exists(_))
    if (paths.isEmpty) return

    val hourMs = TimeUtils.nsToMs(hourNs)
    val outDir = Manifest.tableDir(base, writerId, table)
      .resolve(TimeUtils.dateDir(hourMs)).resolve(TimeUtils.hourDir(hourMs))
    Files.createDirectories(outDir)
    val seq = manifest.wal_sequence
    val outFile = outDir.resolve(f"c_$seq%010d.parquet")

    // Distributed merge; mergeSchema covers widened LP schemas.
    val df = spark.read.option("mergeSchema", "true")
      .parquet(paths.map(_.toString): _*)
    val rowCount = writeSingle(df, outFile)

    val entry = Manifest.FileEntry(
      id = seq,
      path = base.relativize(outFile).toString,
      size_bytes = Files.size(outFile),
      row_count = rowCount,
      chunk_time = hourNs,
      min_time = inputs.map(_.min_time).min,
      max_time = inputs.map(_.max_time).max,
      range = Some("1h"),
      `type` = "compacted")

    // Manifest swap first (readers re-read it per query), then delete
    // inputs (hepop.js:815–846, 885–952).
    val swapped = manifest
      .replaceFiles(inputs.map(_.path).toSet, entry)
      .copy(wal_sequence = seq + 1)
    Manifest.save(mpath, swapped)
    paths.filterNot(_ == outFile).foreach(Files.deleteIfExists(_))
    pruneEmptyDirs(Manifest.tableDir(base, writerId, table))
  }

  private def writeSingle(df: org.apache.spark.sql.DataFrame, target: Path): Long = {
    val tmp = Files.createTempDirectory(target.getParent, ".compact")
    try {
      df.coalesce(1).write
        .option("parquet.bloom.filter.enabled#timestamp", "true")
        .option("parquet.bloom.filter.expected.ndv#timestamp", "1024")
        .mode("overwrite")
        .parquet(tmp.toString)
      val part = Files.list(tmp).iterator().asScala
        .find(_.getFileName.toString.startsWith("part-"))
        .getOrElse(throw new IllegalStateException(s"no part file in $tmp"))
      Files.move(part, target, StandardCopyOption.REPLACE_EXISTING)
      // Stats from the written file's footer, not an O(rows) rescan.
      spark.read.parquet(target.toString).count()
    } finally {
      val s = Files.walk(tmp)
      try s.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.deleteIfExists(_))
      finally s.close()
    }
  }

  /** Remove empty date/time dirs left by input deletion (hepop.js:885–952).
    * The reference skips the current hour; we simply never delete non-empty
    * dirs, which subsumes that guard. */
  private def pruneEmptyDirs(tableDir: Path): Unit = {
    if (!Files.exists(tableDir)) return
    val s = Files.walk(tableDir)
    try {
      s.sorted(java.util.Comparator.reverseOrder()).iterator().asScala
        .filter(p => Files.isDirectory(p) && p != tableDir)
        .foreach { p =>
          val list = Files.list(p)
          val empty = try !list.iterator().hasNext finally list.close()
          if (empty) Files.deleteIfExists(p)
        }
    } finally s.close()
  }
}
