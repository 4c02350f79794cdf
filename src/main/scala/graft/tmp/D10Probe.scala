package graft.tmp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling main for d10_jaccard_join stage costs. */
object D10Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[d10probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = graft.core.Tables.load(spark, dir, "documents")
    val withSh = graft.ops.Dedup.shingled(docs)
    time("shingled count")(println("  docs=" + withSh.count()))
    val ex = withSh.select(col("doc_id"), size(col("s")).as("n"), explode(col("s")).as("g"))
    time("exploded count")(println("  postings=" + ex.count()))
    time("avg shingles/doc")(withSh.select(avg(size(col("s")))).show())
    // warm
    val cands = graft.ops.Dedup.jaccardCandidates(withSh, 2, 5)
    time("candidates (cold)")(println("  cands=" + cands.count()))
    time("candidates (warm)")(println("  cands=" + cands.count()))
    // raw join fan-out before positional filter: rebuild the pos frame
    val dfq = ex.groupBy("g").agg(count(lit(1)).as("df"))
    val wOrd = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("df", "g")
    val pos = ex.join(dfq, "g")
      .withColumn("p", row_number().over(wOrd) - 1)
      .where(col("p") < col("n") - expr(s"(n * 2 + 4) div 5") + 1)
    time("prefix postings")(println("  prefix=" + pos.count()))
    time("raw join rows")(println("  rawpairs=" + pos.select(col("doc_id").as("a"), col("g"))
      .join(pos.select(col("doc_id").as("b"), col("g")), "g")
      .where(col("a") < col("b")).count()))
    time("full d10 (warm)")(println("  out=" + graft.ops.Dedup.jaccardJoin(docs, 2, 5).count()))
    // Decompose the verify stage
    val shA = withSh.select(col("doc_id").as("doc_a"), col("s").as("sa"))
    val shB = withSh.select(col("doc_id").as("doc_b"), col("s").as("sb"))
    val attached = cands.join(shA, "doc_a").join(shB, "doc_b")
    time("verify: attach arrays")(println("  rows=" + attached.count()))
    val inter = attached.withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("uni", size(col("sa")) + size(col("sb")) - col("inter"))
      .where(col("inter") * 5 >= col("uni") * 2)
    time("verify: intersect+filter")(println("  out=" + inter.count()))
    println("=== verify plan ===")
    inter.explain("formatted")
    spark.stop()
  }
}
