package graft.core

import java.time.{Instant, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

/** Two-unit time handling mirroring the reference (SURVEY §1.2):
  * data files carry ms-precision timestamps (reference hepop.js:21,
  * TIMESTAMP_MILLIS); the manifest carries nanoseconds (hepop.js:246–248).
  * Spark's TimestampType is µs — all conversions floor, never round.
  */
object TimeUtils {
  val NsPerMs: Long = 1000000L
  val NsPerTenMin: Long = 600L * 1000000000L
  val NsPerHour: Long = 3600L * 1000000000L

  def msToNs(ms: Long): Long = ms * NsPerMs
  def nsToMs(ns: Long): Long = Math.floorDiv(ns, NsPerMs)

  /** 10-minute bucket floor in ns (reference hepop.js:118–120, 248). */
  def chunkTimeNs(ns: Long): Long = Math.floorDiv(ns, NsPerTenMin) * NsPerTenMin

  /** Hour floor in ns (compaction grouping, reference hepop.js:609–631). */
  def hourNs(ns: Long): Long = Math.floorDiv(ns, NsPerHour) * NsPerHour

  val NsPerDay: Long = 24L * NsPerHour

  /** Day floor in ns (tier-2 compaction grouping, reference hepop.js:529–530). */
  def dayNs(ns: Long): Long = Math.floorDiv(ns, NsPerDay) * NsPerDay

  private val dateFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd")
  private val isoMsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS")

  private def utc(ms: Long): LocalDateTime =
    LocalDateTime.ofInstant(Instant.ofEpochMilli(ms), ZoneOffset.UTC)

  /** Directory date segment `YYYY-MM-DD` (reference hepop.js:115–117). */
  def dateDir(ms: Long): String = utc(ms).format(dateFmt)

  /** Directory time segment `HH-M0` — 10-min bucket (hepop.js:118–123). */
  def timeDir(ms: Long): String = {
    val t = utc(ms)
    f"${t.getHour}%02d-${t.getMinute / 10 * 10}%02d"
  }

  /** Hour-bucket segment `HH-00` used by compacted files (hepop.js:687–701). */
  def hourDir(ms: Long): String = f"${utc(ms).getHour}%02d-00"

  /** ms-truncated ISO literal, the reference's rewritten time filter form
    * (`TIMESTAMP '<iso>'`, query.js:165–166). */
  def isoMs(ns: Long): String = utc(nsToMs(ns)).format(isoMsFmt)

  /** Session confs every parquet-reading entry point needs (idempotent;
    * both are runtime-settable):
    *  - nanosAsLong: events.ts is parquet TIMESTAMP(NANOS), not a Spark
    *    type — read as long, converted in Tables.load.
    *  - inferTimestampNTZ off: the WAL writer stores naive
    *    TIMESTAMP(MICROS) (isAdjustedToUTC=false, the reference's
    *    parquetjs layout; DuckDB reads it as plain TIMESTAMP). With NTZ
    *    inference on, Spark 4 would surface those columns as
    *    TimestampNTZType and every downstream timestamp comparison/
    *    virtual column would type-mismatch; off restores the session-UTC
    *    instant reading the engine (and the old INT96 files) always had. */
  def parquetReadConfs(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
  }
}
