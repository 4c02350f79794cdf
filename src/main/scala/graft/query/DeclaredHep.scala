package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Storage
import graft.fixtures.FixtureGen

/** H1–H4: the HEPop-specific declared queries (SURVEY §2.9), routed through
  * the REAL query path — `QueryService.execute` over manifest-backed
  * `Storage` — not pre-built DataFrames. One green row here verifies, in
  * one stroke: HEPv3 codec → WAL sink → manifest → compaction swap →
  * multi-writer union → manifest pruning → dialect normalization → virtual
  * columns → default-time-range injection → Catalyst execution.
  *
  * The fixture data is generated deterministically through the engine's own
  * ingest (FixtureGen); "now" is pinned to FixtureGen.PinNowNs so the
  * default last-10-min window (reference query.js:9, 109–117) is the fixed
  * interval [2025-02-08 19:10:00, 19:20:00] and each oracle can state it
  * explicitly.
  */
object DeclaredHep {

  private def service(spark: SparkSession): QueryService = {
    val base = FixtureGen.ensure(spark)
    // In-scan pruning: the manifest-backed FileIndex prunes from the
    // query's own resolved timestamp predicates (including the injected
    // default range) — the registered-table architecture a long-lived
    // server uses. The path-list provider stays covered by LoopbackSpec.
    new QueryService(spark, new Storage(base, pruneInScan = true),
      nowNs = () => FixtureGen.PinNowNs)
  }

  /** H1 — HEP shape: virtual columns + payload LIKE + `time` alias
    * (reference README.md:152–158). No time predicate → the engine injects
    * the default window. */
  def h1(spark: SparkSession, dir: String): DataFrame =
    service(spark).execute(
      """SELECT time, src_ip, dst_ip, payload FROM hep_1
        |WHERE payload LIKE '%INVITE%'
        |ORDER BY time, src_port LIMIT 10""".stripMargin)

  /** H2 — default-range rule + `count()` dialect normalization + virtual
    * columns inside aggregates (reference query.js:109–117,
    * loopback_test.sh:46). */
  def h2(spark: SparkSession, dir: String): DataFrame =
    service(spark).execute(
      "SELECT count() AS cnt, min(src_port) AS min_sp, max(dst_port) AS max_dp FROM hep_1")

  /** H3 — LP metric filter (reference README.md:205–210). */
  def h3(spark: SparkSession, dir: String): DataFrame =
    service(spark).execute(
      "SELECT time, usage_idle FROM cpu WHERE usage_idle > 50 ORDER BY time LIMIT 10")

  /** H4 — LP aggregate (reference README.md:216). The avg is spelled as an
    * exact decimal sum / count scaled to an integer (StableAgg.avgScaledLong
    * shape, through the SQL surface) so the hashed value is independent of
    * partial-merge order AND of round(double, n) re-encoding. */
  def h4(spark: SparkSession, dir: String): DataFrame =
    service(spark).execute(
      """SELECT cast(round(cast(sum(cast(used_percent AS decimal(18,6))) AS double)
        |  / count(used_percent) * 100) AS bigint) AS a_x100, count() AS cnt FROM memory""".stripMargin)

  private def bigService(spark: SparkSession): QueryService = {
    val base = graft.fixtures.BigFixtureGen.ensure(spark)
    new QueryService(spark, new Storage(base, pruneInScan = true),
      nowNs = () => FixtureGen.PinNowNs)
  }

  /** H9 — the H1 shape at BENCH scale (VERDICT r10 missing-#5): virtual
    * columns + payload LIKE + default-window injection over the 65k-packet
    * two-writer tree, where the manifest prunes ~3/4 of the files and the
    * scan actually has volume to read. */
  def h9(spark: SparkSession, dir: String): DataFrame =
    bigService(spark).execute(
      """SELECT time, src_ip, dst_ip, payload FROM hep_1
        |WHERE payload LIKE '%INVITE%'
        |ORDER BY time, src_port LIMIT 10""".stripMargin)

  /** H10 — the H3/H4 shape at bench scale: LP filter + exact-decimal
    * aggregate over 40k cpu points (compacted + raw through the
    * manifest). */
  def h10(spark: SparkSession, dir: String): DataFrame =
    bigService(spark).execute(
      """SELECT count() AS cnt,
        |cast(round(cast(sum(cast(usage_idle AS decimal(18,6))) AS double)
        |  / count(usage_idle) * 100) AS bigint) AS idle_x100
        |FROM cpu WHERE usage_idle > 50""".stripMargin)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "h1_hep_virtual_cols" -> (h1 _),
    "h2_default_range"    -> (h2 _),
    "h3_lp_filter"        -> (h3 _),
    "h4_lp_agg"           -> (h4 _),
    "h9_hep_scale"        -> (h9 _),
    "h10_lp_scale"        -> (h10 _))

  // Oracle SQL reads the SAME fixture parquet files directly (absolute
  // globs — raw and compacted files across both writers) and states the
  // pinned default window explicitly. Virtual columns are re-derived with
  // DuckDB's JSON functions.
  private val HepGlob = "/root/repo/fixtures/hepop/*/dbs/hep-0/hep_1-0/**/*.parquet"
  private val CpuGlob = "/root/repo/fixtures/hepop/*/dbs/hep-0/cpu-0/**/*.parquet"
  private val MemGlob = "/root/repo/fixtures/hepop/*/dbs/hep-0/memory-0/**/*.parquet"
  // Big-fixture globs live in the JVM tmpdir (generated once per machine
  // by BigFixtureGen at first h9/h10 touch — run a Verify before a
  // standalone typelint on a fresh machine).
  private val BigBase = graft.fixtures.BigFixtureGen.DefaultDir.toString
  private val BigHepGlob = s"$BigBase/*/dbs/hep-0/hep_1-0/**/*.parquet"
  private val BigCpuGlob = s"$BigBase/*/dbs/hep-0/cpu-0/**/*.parquet"
  private val Win =
    "timestamp >= TIMESTAMP '2025-02-08 19:10:00' AND timestamp <= TIMESTAMP '2025-02-08 19:20:00'"

  val oracleSql: Map[String, String] = Map(
    "h1_hep_virtual_cols" ->
      s"""SELECT timestamp AS time,
         |json_extract_string(rcinfo, '$$.srcIp') AS src_ip,
         |json_extract_string(rcinfo, '$$.dstIp') AS dst_ip, payload
         |FROM read_parquet('$HepGlob')
         |WHERE payload LIKE '%INVITE%' AND $Win
         |ORDER BY time, CAST(json_extract_string(rcinfo, '$$.srcPort') AS INTEGER)
         |LIMIT 10""".stripMargin,
    "h2_default_range" ->
      s"""SELECT count(*) AS cnt,
         |min(CAST(json_extract_string(rcinfo, '$$.srcPort') AS INTEGER)) AS min_sp,
         |max(CAST(json_extract_string(rcinfo, '$$.dstPort') AS INTEGER)) AS max_dp
         |FROM read_parquet('$HepGlob') WHERE $Win""".stripMargin,
    "h3_lp_filter" ->
      s"""SELECT timestamp AS time, usage_idle FROM read_parquet('$CpuGlob')
         |WHERE usage_idle > 50 AND $Win ORDER BY time LIMIT 10""".stripMargin,
    "h4_lp_agg" ->
      s"""SELECT CAST(round(CAST(sum(CAST(used_percent AS DECIMAL(18,6))) AS DOUBLE)
         |  / count(used_percent) * 100) AS BIGINT) AS a_x100, count(*) AS cnt
         |FROM read_parquet('$MemGlob') WHERE $Win""".stripMargin,
    "h9_hep_scale" ->
      s"""SELECT timestamp AS time,
         |json_extract_string(rcinfo, '$$.srcIp') AS src_ip,
         |json_extract_string(rcinfo, '$$.dstIp') AS dst_ip, payload
         |FROM read_parquet('$BigHepGlob')
         |WHERE payload LIKE '%INVITE%' AND $Win
         |ORDER BY time, CAST(json_extract_string(rcinfo, '$$.srcPort') AS INTEGER)
         |LIMIT 10""".stripMargin,
    "h10_lp_scale" ->
      s"""SELECT count(*) AS cnt,
         |CAST(round(CAST(sum(CAST(usage_idle AS DECIMAL(18,6))) AS DOUBLE)
         |  / count(usage_idle) * 100) AS BIGINT) AS idle_x100
         |FROM read_parquet('$BigCpuGlob')
         |WHERE usage_idle > 50 AND $Win""".stripMargin)
}
