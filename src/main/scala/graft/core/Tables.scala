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
  // catalog does. Keyed per session so tests with fresh sessions work.
  private val dfCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    dfCache.computeIfAbsent((spark, dir, name), _ => {
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
      val df = spark.read.parquet(s"$dir/$name.parquet")
      if (name == "events" && df.schema("ts").dataType == LongType)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else df
    })

  /** Register every table as a temp view (for SQL-entry paths and tests). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
