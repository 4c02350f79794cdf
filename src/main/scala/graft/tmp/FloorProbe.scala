package graft.tmp

import org.apache.spark.sql.SparkSession

/** Throwaway: per-query floor decomposition under bench-like settings. */
object FloorProbe {
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

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[floor] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    val qs = graft.SparkEntry.queries
    val sel = Seq("q3_scalar_agg", "q4_group_by", "q14_join_broadcast", "q32_cube",
      "s4_sequence_pack", "q28_correlated", "t10_tfidf_topk", "d7_source_overlap",
      "d6_dedup_apply", "d9_embedding_dedup", "e5_centroid_assign")
    // warm all selected twice
    sel.foreach(n => qs(n)(spark, dir).collect())
    sel.foreach { n => time(s"$n warm")(qs(n)(spark, dir).collect()) }
    // decompose q3: plan-build vs execute
    time("q3 build only")(qs("q3_scalar_agg")(spark, dir).queryExecution.executedPlan)
    time("q3 exec only") {
      val df = qs("q3_scalar_agg")(spark, dir); df.collect()
    }
    // AQE on, re-time
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    sel.foreach(n => qs(n)(spark, dir).collect())
    sel.foreach { n => time(s"$n AQE")(qs(n)(spark, dir).collect()) }
    spark.stop()
  }
}
