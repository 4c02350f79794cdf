package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-window interleaved A/B for the r12 exchange-reuse repairs (the
  * CodegenAb discipline): each OLD arm is the pre-r12 operator body
  * reconstructed verbatim, each NEW arm the current operator; arms
  * alternate pass-by-pass inside one session so this host's bursty
  * noise hits both sides of every comparison, and every pair is
  * asserted row-identical at the end. The numbers quoted in
  * OPTIMIZATION_r12.md and the r12 commit messages come from this
  * main: sbt "runMain graft.ops.R12Ab" (AB_PASSES to override). */
object R12Ab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", math.min(cpus.toInt, 8).toString))
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.load(spark, sfDir, "documents")

    // Stored artifacts, same keys the declared queries use.
    val ndfs = graft.core.Artifacts.materialized(spark, sfDir, "novelty_dfs") {
      Dedup.noveltyDfs(docs)
    }
    val posts = graft.core.Artifacts.materialized(spark, sfDir, "source_postings") {
      Dedup.sourcePostings(docs)
    }

    // t15 OLD = the pre-change serving shape verbatim (pinned h
    // repartition, optimizer-chosen join); NEW = size-adaptive (here:
    // broadcast regime).
    def t15Old() = Dedup.noveltyScoreWithDfs(docs, ndfs,
      broadcastStats = Some(false))
    def t15New() = Dedup.noveltyScoreWithDfs(docs, ndfs,
      broadcastStats = Some(true))

    // d7 OLD = pre-change overlapFromPostings body verbatim (no
    // up-front notnull normalization — the counts branch re-scans).
    def d7Old(): DataFrame = {
      val e = posts.repartition(col("g"))
      val counts = e.groupBy("source").agg(count(lit(1)).as("n"))
      val eA = e.select(col("source").as("src_a"), col("g"))
      val eB = e.select(col("source").as("src_b"), col("g"))
      val inter = eA.join(eB, "g").where(col("src_a") < col("src_b"))
        .groupBy("src_a", "src_b").agg(count(lit(1)).as("inter"))
      inter
        .join(counts.select(col("source").as("src_a"), col("n").as("na")), "src_a")
        .join(counts.select(col("source").as("src_b"), col("n").as("nb")), "src_b")
        .select(col("src_a"), col("src_b"),
          graft.functions.StableAgg.scaledLong(
            col("inter").cast("double") / (col("na") + col("nb") - col("inter")),
            10000).as("j_x10k"))
        .orderBy("src_a", "src_b")
    }
    def d7New() = Dedup.sourceOverlapWithPostings(posts)

    // d12 OLD = pre-change substringDedup body verbatim (single-level
    // countDistinct stats branch, no notnull normalization — the stats
    // branch re-scans + re-exchanges).
    def d12Old(): DataFrame = {
      val width = 8; val dfCap = 64
      val wins = Dedup.windowPostings(docs, width).repartition(col("h"))
      val stats = wins.groupBy("h")
        .agg(countDistinct(col("doc_id")).as("df"))
        .where(col("df").between(2, dfCap))
      val good = wins.join(stats, "h").select("h", "doc_id", "pos")
      val pairs = good.select(col("h"), col("doc_id").as("doc_a"), col("pos").as("a_pos"))
        .join(good.select(col("h"), col("doc_id").as("doc_b"), col("pos").as("b_pos")), "h")
        .where(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"), (col("a_pos") - col("b_pos")).as("d"), col("a_pos"))
      val wIsl = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_a", "doc_b", "d").orderBy("a_pos")
      pairs
        .withColumn("g", col("a_pos") - row_number().over(wIsl))
        .groupBy("doc_a", "doc_b", "d", "g")
        .agg(min(col("a_pos")).as("a_start"), count(lit(1)).as("nw"))
        .select(col("doc_a"), col("doc_b"), col("a_start"),
          (col("a_start") - col("d")).as("b_start"),
          (col("nw") + 7).as("span_words"))
        .orderBy("doc_a", "doc_b", "a_start", "b_start")
    }
    def d12New(): DataFrame = Dedup.substringDedup(docs)

    // d10 OLD = pre-change jaccardJoin body verbatim (verify sides
    // compute sortedStrings above the shared frame; the projection gets
    // pushed below the exchange and the verify side re-scans).
    def d10Old(): DataFrame = {
      val (num, den) = (2, 5)
      val withSh = Dedup.shingled(docs)
      val cands = Dedup.jaccardCandidates(withSh, num, den)
      val sorted = graft.functions.Expressions.sortedStrings(col("s"))
      val shA = withSh.select(col("doc_id").as("doc_a"), sorted.as("sa"))
      val shB = withSh.select(col("doc_id").as("doc_b"), sorted.as("sb"))
      cands.join(shA, "doc_a").join(shB, "doc_b")
        .withColumn("inter",
          graft.functions.Expressions.sortedIntersectSize(col("sa"), col("sb")))
        .withColumn("uni", size(col("sa")) + size(col("sb")) - col("inter"))
        .where(col("inter") * den >= col("uni") * num)
        .select(col("doc_a"), col("doc_b"),
          graft.functions.StableAgg.scaledLong(
            col("inter").cast("double") / col("uni"), 10000).as("j_x10k"))
        .orderBy("doc_a", "doc_b")
    }
    def d10New(): DataFrame = Dedup.jaccardJoin(docs)

    // s4 OLD = pre-change sequencePack body at nLevels=1 (what sf0.1
    // resolves to): unpinned base, simple totals1 - the totals branch
    // re-scans + re-tokenizes.
    def s4Old(): DataFrame = {
      val budget = 2048; val blockSize = 64
      val base = docs.select(col("doc_id"), expr(s"doc_id div $blockSize").as("blk1"),
        size(split(col("text"), " ")).cast("long").as("ntok"))
      val totals1 = base.groupBy("blk1").agg(sum(col("ntok")).as("tot"))
      val wTop = org.apache.spark.sql.expressions.Window.orderBy("blk1")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val off = totals1
        .withColumn("off", coalesce(sum(col("tot")).over(wTop), lit(0L)))
        .select("blk1", "off")
      val wDoc = org.apache.spark.sql.expressions.Window
        .partitionBy("blk1").orderBy("doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      base.withColumn("intra", coalesce(sum(col("ntok")).over(wDoc), lit(0L)))
        .join(off, "blk1")
        .select(col("doc_id"), col("ntok"), expr(s"(off + intra) div $budget").as("bin"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("toks"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .orderBy("bin")
    }
    def s4New(): DataFrame = Sampling.sequencePack(docs)

    // d9 OLD = pre-change embeddingNearDup (embedding rides sgn; attach
    // sides re-scan AND pay their own pinned exchange).
    def d9Old(): DataFrame = {
      val emb = graft.core.Tables.load(spark, sfDir, "embeddings")
      val (bands, dims) = (16, 64); val rows = dims / bands
      val keyExpr = (0 until rows).map(r =>
        s"CASE WHEN element_at(embedding, b*$rows+${r + 1}) >= cast(0 AS float) " +
          s"THEN ${1 << (rows - 1 - r)} ELSE 0 END").mkString(" + ")
      val sgn = emb.select(col("vec_id"), col("embedding"),
        expr(s"transform(sequence(0, ${bands - 1}), b -> $keyExpr)").as("keys"))
        .repartition(col("vec_id"))
      val banded = sgn.select(col("vec_id"), posexplode(col("keys")).as(Seq("band", "key")))
      val cands = banded.as("x").join(banded.as("y"), Seq("band", "key"))
        .where(col("x.vec_id") < col("y.vec_id"))
        .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
        .distinct()
      val va = sgn.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
      val vb = sgn.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
      cands.join(va, "vec_a").join(vb, "vec_b")
        .withColumn("cos", graft.functions.Expressions.cosineSim(col("ea"), col("eb")))
        .where(col("cos") >= 0.5)
        .select(col("vec_a"), col("vec_b"),
          graft.functions.StableAgg.scaledLong(col("cos"), 10000).as("cos_x10k"))
        .orderBy("vec_a", "vec_b")
    }
    def d9New(): DataFrame = Similarity.embeddingNearDup(
      graft.core.Tables.load(spark, sfDir, "embeddings"))

    // t25 OLD = current scoring + the pre-change thresholds branch
    // (no n_trigrams rider -> partial-agg reorder -> the thresholds
    // side re-runs the whole LM scoring pipeline).
    val heldT25 = col("doc_id") % 4 =!= 0
    def lmArt(part: String, pick: ((DataFrame, DataFrame, DataFrame)) => DataFrame) =
      graft.core.Artifacts.materialized(spark, sfDir, s"lm_${part}_trainmod4eq0") {
        pick(TextAnalysis.lmStats(docs, heldT25, useBc = false))
      }
    val (triW25, big25, uni25) = (lmArt("tri", _._1), lmArt("big", _._2), lmArt("uni", _._3))
    def t25Old(): DataFrame = {
      val scored = TextAnalysis.backoffLmWithStats(docs, heldT25, triW25, big25, uni25,
        ordered = false)
      val thr = scored.agg(
        expr("percentile_disc(1.0D / 3) WITHIN GROUP (ORDER BY lm_x1000)").as("t_lo"),
        expr("percentile_disc(2.0D / 3) WITHIN GROUP (ORDER BY lm_x1000)").as("t_hi"))
      scored.crossJoin(broadcast(thr))
        .select(col("doc_id"), col("n_trigrams"), col("lm_x1000"),
          when(col("lm_x1000") >= col("t_hi"), lit("head"))
            .when(col("lm_x1000") >= col("t_lo"), lit("middle"))
            .otherwise(lit("tail")).as("bucket"),
          when(col("lm_x1000") >= col("t_lo"), 1).otherwise(0).as("keep"))
        .orderBy("doc_id")
    }
    def t25New(): DataFrame = TextAnalysis.perplexityBuckets(docs,
      stats = Some((triW25, big25, uni25)))

    val arms: Seq[(String, () => DataFrame)] = Seq(
      "t15_old" -> (() => t15Old()), "t15_new" -> (() => t15New()),
      "d7_old" -> (() => d7Old()), "d7_new" -> (() => d7New()),
      "d12_old" -> (() => d12Old()), "d12_new" -> (() => d12New()),
      "d10_old" -> (() => d10Old()), "d10_new" -> (() => d10New()),
      "s4_old" -> (() => s4Old()), "s4_new" -> (() => s4New()),
      "d9_old" -> (() => d9Old()), "d9_new" -> (() => d9New()),
      "t25_old" -> (() => t25Old()), "t25_new" -> (() => t25New()))
    // Warm everything once.
    arms.foreach { case (_, f) => f().collect() }
    System.gc(); Thread.sleep(1000)
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    val passes = sys.env.getOrElse("AB_PASSES", "9").toInt
    for (_ <- 1 to passes) arms.foreach { case (n, f) =>
      System.gc()
      val t0 = System.nanoTime()
      f().collect()
      samples(n) = (System.nanoTime() - t0) / 1e9 :: samples(n)
    }
    arms.foreach { case (n, _) =>
      val ts = samples(n).sorted
      println(f"[ab] $n%-8s min ${ts.head}%.3f med ${ts(ts.size / 2)}%.3f")
    }
    // Row parity of the arms while we are here.
    assert(t15Old().collect().toSeq == t15New().collect().toSeq, "t15 arms differ")
    assert(d7Old().collect().toSeq == d7New().collect().toSeq, "d7 arms differ")
    assert(d12Old().collect().toSeq == d12New().collect().toSeq, "d12 arms differ")
    assert(d10Old().collect().toSeq == d10New().collect().toSeq, "d10 arms differ")
    assert(s4Old().collect().toSeq == s4New().collect().toSeq, "s4 arms differ")
    assert(d9Old().collect().toSeq == d9New().collect().toSeq, "d9 arms differ")
    assert(t25Old().collect().toSeq == t25New().collect().toSeq, "t25 arms differ")
    println("[ab] parity OK")
    spark.stop()
  }
}
