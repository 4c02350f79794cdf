package graft

import org.apache.spark.sql.functions._

import graft.core.Storage
import graft.fixtures.FixtureGen
import graft.query.QueryService

/** Manifest-backed FileIndex: pruning happens inside the scan node from
  * the query's own resolved timestamp predicates. */
class ManifestIndexSpec extends GraftSuite {

  private lazy val base = FixtureGen.ensure(spark)

  test("index-backed table equals the path-list storage on full scans") {
    val idx = new Storage(base, pruneInScan = true)
    val plain = new Storage(base)
    val a = idx.load(spark, "hep_1", Long.MinValue, Long.MaxValue).get
    val b = plain.load(spark, "hep_1", Long.MinValue, Long.MaxValue).get
    assert(a.count() == 70 && b.count() == 70)
    assert(a.select("payload").collect().map(_.getString(0)).sorted
      .sameElements(b.select("payload").collect().map(_.getString(0)).sorted))
  }

  test("timestamp predicates prune files inside the scan") {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, GreaterThanOrEqual, Literal}
    import org.apache.spark.sql.graftshim.ManifestFileIndex
    import org.apache.spark.sql.types.TimestampType

    val storage = new Storage(base)
    val schema = storage.schemaOf(spark, "hep_1").get
    val index = new ManifestFileIndex(spark, base, "hep_1", schema)

    val allFiles = index.listFiles(Nil, Nil).head.files.length
    assert(allFiles > 2, s"fixture has multiple raw+compacted files, got $allFiles")

    // timestamp >= 2025-02-08 19:10:00 (µs literal) — the resolved form
    // the scan node hands to listFiles after pushdown.
    val ts = AttributeReference("timestamp", TimestampType)()
    val boundUs = java.time.LocalDateTime.of(2025, 2, 8, 19, 10, 0)
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    val pruned = index
      .listFiles(Nil, Seq(GreaterThanOrEqual(ts, Literal(boundUs, TimestampType))))
      .head.files.length
    assert(pruned < allFiles,
      s"time predicate must drop old files in-scan ($pruned vs $allFiles)")

    // And end-to-end: the filtered count over the index relation is exact
    // (pruning is a pure optimization, never drops matching rows).
    val df = new Storage(base, pruneInScan = true)
      .load(spark, "hep_1", Long.MinValue, Long.MaxValue).get
    val filtered = df.where(
      col("timestamp") >= lit("2025-02-08 19:10:00").cast("timestamp") &&
      col("timestamp") <= lit("2025-02-08 19:20:00").cast("timestamp"))
    assert(filtered.count() == 25)
  }

  test("H-queries run through the in-scan-pruning provider unchanged") {
    val qs = new QueryService(spark, new Storage(base, pruneInScan = true),
      nowNs = () => FixtureGen.PinNowNs)
    val r = qs.execute(
      "SELECT count() AS cnt, min(src_port) AS min_sp FROM hep_1").collect()(0)
    assert(r.getLong(0) == 25)
    // LP tables work too (widened-schema read path).
    val cpu = qs.execute(
      "SELECT count(*) AS c FROM cpu WHERE usage_idle > 50").collect()(0)
    assert(cpu.getLong(0) > 0)
  }
}
