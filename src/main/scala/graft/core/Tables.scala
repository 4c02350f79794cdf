package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Each table is a single parquet file under the scale-factor dir. All
  * engine queries go through here so that scan options (vectorized reader,
  * filter pushdown) are applied uniformly. At cluster scale the same call
  * sites would point at a partitioned table root instead of one file —
  * nothing else changes, because all downstream code is declarative.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // DataFrame (= logical plan) cache: `spark.read.parquet` does a file
  // listing + footer read per call, ~50 ms of driver latency that r1's
  // bench paid on every query. Plans are immutable; reuse is what a real
  // catalog does. Keyed per session so tests with fresh sessions work —
  // and per source SIGNATURE (bytes+mtime, ~µs of stat), so a
  // regenerated source file in-session gets a fresh plan instead of one
  // bound to the previous relayout snapshot (ADVICE r5).
  private val dfCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String, String), DataFrame]()

  private def sourceSig(dir: String, name: String): String = {
    val p = java.nio.file.Paths.get(s"$dir/$name.parquet")
    if (!java.nio.file.Files.exists(p)) "absent"
    else s"${java.nio.file.Files.size(p)}-${java.nio.file.Files.getLastModifiedTime(p).toMillis}"
  }

  /** Change-detection key for everything derived from `dir`'s tables
    * (plan caches, registered views): bytes+mtime per table. */
  def dataSignature(dir: String): String =
    names.map(n => sourceSig(dir, n)).mkString(",")

  // The driver-generated testdata files are written as ONE parquet row
  // group each. Parquet scans split at row-group boundaries, so Spark
  // reads a 600k-row lineitem with exactly one task — every full-scan
  // aggregate and every CPU-heavy map-only operator (shingling, hashing,
  // per-row folds) runs single-threaded no matter how many cores the
  // session has. That is a data-LAYOUT artifact, not an engine property:
  // the storage this engine writes itself (WAL flushes + compaction
  // tiers) is many splittable files, and at 100 TB any real table is too.
  // So, once per (dir, table): re-write the single-row-group file into a
  // multi-file directory under java.io.tmpdir and scan that — identical
  // rows, schema, and types; only the physical split count changes. The
  // rewrite happens once (guarded by Spark's _SUCCESS marker) and costs
  // ~a second for the whole sf0.1 set.
  private val RelayoutMinBytes: Long = 300L << 10
  private def relayoutEnabled: Boolean =
    !sys.env.get("SPARK_GRAFT_RELAYOUT").contains("false")

  private def relayout(spark: SparkSession, dir: String, name: String): String =
    Tables.synchronized {
      // Split count scales with bytes, capped by the session's cores.
      // Three regimes (measured; re-measured r7 when a dispatch-latency
      // probe put this host's fixed cost at ~30 ms per job + ~3 ms per
      // task): numeric scan-bound tables want ~512 KB compressed per
      // split — their per-split compute is tens of µs, so finer splits
      // just multiply per-task dispatch cost (a 2.7 MB orders at 64 KB
      // splits made a trivial group-by 2× SLOWER than the single-task
      // original); documents carries ~10× the per-byte CPU (shingling,
      // hashing) and keeps ~64 KB splits so those loops actually
      // parallelize; embeddings' vector folds are codegen'd tight loops
      // (µs/row), between the two — ~128 KB.
      val srcPath = java.nio.file.Paths.get(s"$dir/$name.parquet")
      val bytes = java.nio.file.Files.size(srcPath)
      val perSplitShift =
        if (name == "documents") 16 else if (name == "embeddings") 17 else 19
      val n = math.max(2, math.min(
        math.min(spark.sparkContext.defaultParallelism, 32),
        (bytes >> perSplitShift).toInt))
      // Cache key includes the source's exact byte size AND mtime: a
      // regenerated source file (even of identical size) must not silently
      // serve stale relayout rows, and dir.hashCode alone can alias
      // different data dirs (ADVICE r4).
      val mtime = java.nio.file.Files.getLastModifiedTime(srcPath).toMillis
      val dst = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"), "graft-relayout",
        s"${Integer.toHexString(dir.hashCode)}-$name-$n-$bytes-${java.lang.Long.toHexString(mtime)}")
      if (!java.nio.file.Files.exists(dst.resolve("_SUCCESS"))) {
        // Sweep stale siblings of this (dir, table) first: the key embeds
        // bytes+mtime, so every source regeneration mints a NEW cache dir
        // and the old ones would otherwise accumulate in tmp for the
        // machine lifetime (ADVICE r5).
        val prefix = s"${Integer.toHexString(dir.hashCode)}-$name-"
        val parent = dst.getParent
        if (java.nio.file.Files.isDirectory(parent)) {
          val it = java.nio.file.Files.list(parent)
          try {
            it.iterator().forEachRemaining { p =>
              if (p.getFileName.toString.startsWith(prefix) && p != dst)
                deleteRecursively(p)
            }
          } finally it.close()
        }
        spark.read.parquet(s"$dir/$name.parquet")
          .repartition(n)
          .write.mode("overwrite").parquet(dst.toString)
      }
      dst.toString
    }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path}
    if (Files.isDirectory(p)) {
      val it = Files.list(p)
      try it.iterator().forEachRemaining((c: Path) => deleteRecursively(c))
      finally it.close()
    }
    try Files.deleteIfExists(p) catch { case _: java.io.IOException => }
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val sig = sourceSig(dir, name)
    // Evict superseded signatures for this (session, dir, table): a
    // regenerated source mints a new key, and without this sweep the old
    // plan entry lives for the session lifetime (VERDICT r6 wrong-#4).
    dfCache.keySet.removeIf(k =>
      k._1 == spark && k._2 == dir && k._3 == name && k._4 != sig)
    dfCache.computeIfAbsent((spark, dir, name, sig), _ => {
      // Parquet TIMESTAMP(NANOS) (events.ts) is not a Spark type; read it as
      // a ns Long and floor to µs TimestampType — same truncation DuckDB
      // applies (its TIMESTAMP is µs), so oracle comparisons stay aligned.
      // Mirrors the reference's two-unit time handling (SURVEY §1.2: ns in
      // manifest, ms in data).
      // `div`, NOT `/`: Spark's `/` on longs is double division, and at
      // ~1.7e18 ns the double ulp is 256 ns — enough to round some values
      // UP by 1 µs vs DuckDB's truncating cast (caught by the q29 oracle,
      // the first query that outputs raw event timestamps).
      TimeUtils.parquetReadConfs(spark)
      val src = java.nio.file.Paths.get(s"$dir/$name.parquet")
      val path =
        if (relayoutEnabled && java.nio.file.Files.size(src) >= RelayoutMinBytes)
          relayout(spark, dir, name)
        else src.toString
      val df = spark.read.parquet(path)
      if (name == "events" && df.schema("ts").dataType == LongType)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else df
    })
  }

  /** Cached-plan count for one (session, dir, table) — test hook for the
    * superseded-signature eviction above. */
  private[graft] def cachedPlans(spark: SparkSession, dir: String, name: String): Int = {
    var n = 0
    dfCache.keySet.forEach(k =>
      if (k._1 == spark && k._2 == dir && k._3 == name) n += 1)
    n
  }

  /** Register every table as a temp view (for SQL-entry paths and tests). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
