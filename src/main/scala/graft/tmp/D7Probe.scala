package graft.tmp

import org.apache.spark.sql.SparkSession

/** Throwaway: d7 shuffle count + timing after the single-exchange change. */
object D7Probe {
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
      f
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => f)
      println(f"[d7] $label: ${(System.nanoTime() - t0) / 1e9 / reps}%.3f s/run")
    }
    val df = graft.SparkEntry.queries("d7_source_overlap")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    println("[d7] exchanges=" + "Exchange hashpartitioning".r.findAllIn(plan).length +
      " reused=" + "ReusedExchange".r.findAllIn(plan).length)
    time("d7")(df.collect())
    time("d7 rebuilt")(graft.SparkEntry.queries("d7_source_overlap")(spark, dir).collect())
    spark.stop()
  }
}
