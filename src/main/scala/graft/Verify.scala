package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // --sql-only <outDir>: dump oracle_sql.json alone, no Spark session —
    // feeds tools/oracle_typelint.py (DuckDB type probe over all oracles).
    if (args.headOption.contains("--sql-only")) {
      val dir = args(1)
      new java.io.File(dir).mkdirs()
      Files.writeString(Paths.get(s"$dir/oracle_sql.json"), oracleJson)
      return
    }
    // Optional third arg: comma-separated query names — restrict the dump
    // for local spot-checks of new operators (the driver passes none).
    val (Array(sfDir, outDir), only) =
      (args.take(2), args.drop(2).headOption.map(_.split(',').toSet))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      // 75 queries overflow the default 100-entry generated-class cache
      // (see Bench.scala) — without this the dump recompiles evicted
      // codegen units query after query.
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), oracleJson)
    spark.stop()
  }

  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  // Shared with graft.Bench, which dumps the (possibly filtered) oracle
  // set for its same-window DuckDB pairing subprocess.
  private[graft] def oracleJson: String = oracleJson(_ => true)
  private[graft] def oracleJson(keep: String => Boolean): String = SparkEntry.oracleSql
    .filter { case (k, _) => keep(k) }
    .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
}
