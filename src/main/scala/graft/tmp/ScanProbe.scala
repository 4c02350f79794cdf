package graft.tmp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: where does a trivial scan+agg spend 0.5 s? */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String, reps: Int = 3)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => f)
      println(f"[scan] $label: ${(System.nanoTime() - t0) / 1e9 / reps}%.3f s/run")
    }

    val li = graft.core.Tables.load(spark, dir, "lineitem")
    time("count only")(li.agg(count(lit(1))).collect())
    time("sum double")(li.agg(sum(col("l_quantity").cast("double"))).collect())
    time("sum decimal")(li.agg(sum(col("l_quantity").cast("decimal(18,6)"))).collect())
    time("q3 full")(graft.SparkEntry.queries("q3_scalar_agg")(spark, dir).collect())
    time("4col scan select sum all") {
      li.agg(sum(col("l_quantity").cast("decimal(18,6)")),
        sum(col("l_extendedprice").cast("decimal(18,6)")),
        min(col("l_shipdate")), max(col("l_shipdate")), count(lit(1))).collect()
    }
    // is it the scan or the agg? materialize scan via count over all cols
    time("scan all cols (count(l_comment))")(li.agg(count(col("l_comment"))).collect())
    spark.stop()
  }
}
