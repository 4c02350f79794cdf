package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale spot-check main (VERDICT r2 next-steps #10): runs the dedup /
  * similarity family's scale-sensitive internals at two scale factors and
  * prints the distributions that decide whether the plans survive a 10×
  * (and by extrapolation 100×) scale-up:
  *   - d2's LSH band-bucket sizes (candidate-pair growth: bucket skew is
  *     where an LSH join degenerates toward all-pairs);
  *   - e2's IVF cell occupancy (a starved/overloaded cell breaks the
  *     |cell|-per-query cost model);
  *   - per-declared-query result row counts at both SFs.
  * Run: sbt "runMain graft.ScaleCheck [sfDirA] [sfDirB]"
  */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.length >= 2) Seq(args(0), args(1))
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    dirs.foreach { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      // The SAME banding pipeline minhashLsh executes (shared helper) —
      // the measured bucket distribution cannot drift from the real one.
      val banded = graft.ops.Dedup.bandedSignatures(graft.ops.Dedup.shingled(docs))
      val buckets = banded.groupBy("band", "key").count()
      val tot = buckets.agg(count(lit(1)), max("count"), round(avg("count"), 3)).head()
      val multi = buckets.where(col("count") > 1)
        .agg(count(lit(1)), sum(expr("count*(count-1)/2"))).head()
      println(s"D2BUCKETS $dir docs=${docs.count()} buckets=${tot.get(0)} " +
        s"max_bucket=${tot.get(1)} avg=${tot.get(2)} " +
        s"multi_buckets=${multi.get(0)} cand_pairs=${multi.get(1)}")

      // d10's exact-join candidate growth: sub-quadratic growth here is
      // what makes the prefix-filtered join viable at 100× — if cand_pairs
      // grew ~N² the prefix filter would be failing on this corpus shape.
      val d10c = graft.ops.Dedup.jaccardCandidates(
        graft.ops.Dedup.shingled(docs), 2, 5).count()
      println(s"D10CANDS $dir cand_pairs=$d10c")

      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val cells = emb
        .select(graft.ops.Similarity.signBucket(col("embedding"), 4).as("cell"))
        .groupBy("cell").count()
      val cs = cells.agg(count(lit(1)), min("count"), max("count")).head()
      println(s"E2CELLS $dir vecs=${emb.count()} cells=${cs.get(0)} " +
        s"min_occ=${cs.get(1)} max_occ=${cs.get(2)}")

      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        val n = try fn(spark, dir).count() catch { case _: Throwable => -1L }
        println(s"ROWS $dir $name $n")
      }
    }
    spark.stop()
  }
}
