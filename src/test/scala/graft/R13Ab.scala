package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops._

/** Same-window interleaved A/B for the r13 optimization candidates (the
  * R12Ab/CodegenAb discipline, relocated to TEST scope per VERDICT r12
  * "What's wrong" #3 — dev probes must not ship in src/main): each OLD
  * arm is the pre-change operator body reconstructed verbatim, each NEW
  * arm the current (or candidate) shape; arms alternate pass-by-pass
  * inside one session so this host's bursty noise hits both sides, and
  * every pair is row-parity-checked with explicit if/throw (ADVICE r12:
  * assert() elides under -Xdisable-assertions).
  *
  * Run: sbt "Test/runMain graft.R13Ab [armPrefix...]"  (AB_PASSES=9)
  */
object R13Ab {
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

    // ---- t6_hll_profile: OLD = the r13 CANDIDATE (coalesce(1) folds the
    // pivot + sort into the (lang,w) aggregate's output — 3 stages /
    // 2 exchanges); NEW = the shipped 4-stage shape. MEASURED-REJECTED:
    // the candidate is ~2× slower because the HLL final merge is per-row
    // expensive and the fold serializes it into one task (see the note
    // at TextAnalysis.hllProfile).
    def t6Old(): DataFrame = {
      val tagged = docs.select(col("lang"), explode(array(
          struct(lit("t").as("w"), md5(col("text")).as("v")),
          struct(lit("s").as("w"), col("source").as("v")))).as("e"))
        .select(col("lang"), col("e.w").as("w"), col("e.v").as("v"))
      import graft.core.Out.SmallOrderOps
      tagged.distinct()
        .groupBy(col("lang"), col("w"))
        .agg(count(col("v")).as("cnt"),
          approx_count_distinct(col("v"), 0.02).as("a"))
        .coalesce(1)
        .groupBy(col("lang"))
        .agg(
          max(when(col("w") === "t", col("cnt"))).as("exact_docs"),
          max(when(col("w") === "s", col("cnt"))).as("exact_sources"),
          max(when(col("w") === "t", col("a"))).as("a_docs"),
          max(when(col("w") === "s", col("a"))).as("a_sources"))
        .select(col("lang"), col("exact_docs"), col("exact_sources"),
          (abs(col("a_docs") - col("exact_docs")).cast("double") <=
            col("exact_docs").cast("double") * 0.06 &&
           abs(col("a_sources") - col("exact_sources")).cast("double") <=
            col("exact_sources").cast("double") * 0.06).as("approx_ok"))
        .sortWithinPartitions("lang")
    }
    def t6New(): DataFrame = TextAnalysis.hllProfile(docs)

    // ---- d10_jaccard_join: OLD = shipped shape (rank window: repartition
    // by doc_id + partition-wide sort by (doc_id, df, g) + row_number);
    // NEW candidate = the rank window folded into ONE aggregate round
    // (VERDICT r12 next-#3): groupBy(doc_id) collects each doc's (df, g)
    // postings, array_sort ranks them per GROUP (no partition-wide sort),
    // slice keeps only the prefix, posexplode re-emits (p, g). Same
    // exchange count, but the doc-keyed round becomes a hash aggregate +
    // per-doc array sort instead of a sort-based window, and only PREFIX
    // postings are re-emitted.
    def d10Old(): DataFrame = Dedup.jaccardJoin(docs)
    def d10New(): DataFrame = {
      val (num, den) = (2, 5)
      val sess = docs.sparkSession
      val conf = sess.sessionState.conf.numShufflePartitions
      val w = math.max(conf, math.min(sess.sparkContext.defaultParallelism, 2 * conf))
      val withSh = docs
        .select(col("doc_id"),
          graft.functions.Expressions.sortedStrings(Dedup.shingles(col("text"))).as("s"))
        .where(size(col("s")) > 0 && col("doc_id").isNotNull)
        .repartition(col("doc_id"))
      val ex = withSh
        .select(col("doc_id"), size(col("s")).as("n"),
          explode(graft.functions.Expressions.md5ArrayHashes(col("s"))).as("g"))
        .repartition(w, col("g"))
      val wDf = org.apache.spark.sql.expressions.Window.partitionBy("g")
      val pos = ex
        .withColumn("df", count(lit(1)).over(wDf))
        .repartition(w, col("doc_id"))
        .groupBy("doc_id")
        .agg(first(col("n")).as("n"),
          array_sort(collect_list(struct(col("df"), col("g")))).as("a"))
        .select(col("doc_id"), col("n"),
          posexplode(expr(s"slice(a, 1, n - (n * $num + ${den - 1}) div $den + 1)"))
            .as(Seq("p", "e")))
        .select(col("doc_id"), col("n"), col("p"), col("e.g").as("g"))
        .repartition(w, col("g"))
      val cands = pos
        .select(col("doc_id").as("doc_a"), col("n").as("na"), col("p").as("pa"), col("g"))
        .join(pos.select(col("doc_id").as("doc_b"), col("n").as("nb"),
          col("p").as("pb"), col("g")), "g")
        .where(col("doc_a") < col("doc_b") &&
          col("na") * den >= col("nb") * num && col("nb") * den >= col("na") * num)
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("ov"), max(col("pa")).as("mpa"), max(col("pb")).as("mpb"),
          first(col("na")).as("na"), first(col("nb")).as("nb"))
        .where((col("ov") + least(col("na") - 1 - col("mpa"), col("nb") - 1 - col("mpb")))
          * (num + den) >= (col("na") + col("nb")) * num)
        .select("doc_a", "doc_b")
      val shA = withSh.select(col("doc_id").as("doc_a"), col("s").as("sa"))
      val shB = withSh.select(col("doc_id").as("doc_b"), col("s").as("sb"))
      import graft.core.Out.SmallOrderOps
      cands.join(shA, "doc_a").join(shB, "doc_b")
        .withColumn("inter",
          graft.functions.Expressions.sortedIntersectSize(col("sa"), col("sb")))
        .withColumn("uni", size(col("sa")) + size(col("sb")) - col("inter"))
        .where(col("inter") * den >= col("uni") * num)
        .select(col("doc_a"), col("doc_b"),
          graft.functions.StableAgg.scaledLong(
            col("inter").cast("double") / col("uni"), 10000).as("j_x10k"))
        .orderSmall("doc_a", "doc_b")
    }

    // ---- d10 width split: OLD = shipped shape (final pair agg + bound
    // filter + BOTH verify BHJ probes + sorted intersect all inside the
    // ONE stage reading the pair exchange, which groupBy keyed at the
    // narrow session width — 8 tasks of CPU-dense verify on a 32-core
    // box); NEW = repartition the BOUND-SURVIVING pairs (small: ids
    // only) to the operator width before the verify joins, so the
    // intersect work runs w-wide while the aggregate keeps its map-side
    // partial.
    def d10Wide(): DataFrame = {
      val (num, den) = (2, 5)
      val sess = docs.sparkSession
      val conf = sess.sessionState.conf.numShufflePartitions
      val w = math.max(conf, math.min(sess.sparkContext.defaultParallelism, 2 * conf))
      val withSh = docs
        .select(col("doc_id"),
          graft.functions.Expressions.sortedStrings(Dedup.shingles(col("text"))).as("s"))
        .where(size(col("s")) > 0 && col("doc_id").isNotNull)
        .repartition(col("doc_id"))
      val ex = withSh
        .select(col("doc_id"), size(col("s")).as("n"),
          explode(graft.functions.Expressions.md5ArrayHashes(col("s"))).as("g"))
        .repartition(w, col("g"))
      val wDf = org.apache.spark.sql.expressions.Window.partitionBy("g")
      val wOrd = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("df", "g")
      val pos = ex
        .withColumn("df", count(lit(1)).over(wDf))
        .repartition(w, col("doc_id"))
        .withColumn("p", row_number().over(wOrd) - 1)
        .where(col("p") < col("n") - expr(s"(n * $num + ${den - 1}) div $den") + 1)
        .repartition(w, col("g"))
      val cands = pos
        .select(col("doc_id").as("doc_a"), col("n").as("na"), col("p").as("pa"), col("g"))
        .join(pos.select(col("doc_id").as("doc_b"), col("n").as("nb"),
          col("p").as("pb"), col("g")), "g")
        .where(col("doc_a") < col("doc_b") &&
          col("na") * den >= col("nb") * num && col("nb") * den >= col("na") * num)
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("ov"), max(col("pa")).as("mpa"), max(col("pb")).as("mpb"),
          first(col("na")).as("na"), first(col("nb")).as("nb"))
        .where((col("ov") + least(col("na") - 1 - col("mpa"), col("nb") - 1 - col("mpb")))
          * (num + den) >= (col("na") + col("nb")) * num)
        .select("doc_a", "doc_b")
        .repartition(w, col("doc_a"))
      val shA = withSh.select(col("doc_id").as("doc_a"), col("s").as("sa"))
      val shB = withSh.select(col("doc_id").as("doc_b"), col("s").as("sb"))
      import graft.core.Out.SmallOrderOps
      cands.join(shA, "doc_a").join(shB, "doc_b")
        .withColumn("inter",
          graft.functions.Expressions.sortedIntersectSize(col("sa"), col("sb")))
        .withColumn("uni", size(col("sa")) + size(col("sb")) - col("inter"))
        .where(col("inter") * den >= col("uni") * num)
        .select(col("doc_a"), col("doc_b"),
          graft.functions.StableAgg.scaledLong(
            col("inter").cast("double") / col("uni"), 10000).as("j_x10k"))
        .orderSmall("doc_a", "doc_b")
    }

    // ---- d10 bounded-intersect kernel on top of the width split: OLD =
    // width split with the plain full-merge intersect; NEW = width split
    // + sortedIntersectSizeBounded (early abort once the threshold is
    // provably unreachable; ~10⁵ failing pairs stop early, survivors
    // return the exact size — filter and arithmetic equivalent).
    def d10WideBounded(): DataFrame = {
      val (num, den) = (2, 5)
      val sess = docs.sparkSession
      val conf = sess.sessionState.conf.numShufflePartitions
      val w = math.max(conf, math.min(sess.sparkContext.defaultParallelism, 2 * conf))
      val withSh = docs
        .select(col("doc_id"),
          graft.functions.Expressions.sortedStrings(Dedup.shingles(col("text"))).as("s"))
        .where(size(col("s")) > 0 && col("doc_id").isNotNull)
        .repartition(col("doc_id"))
      val ex = withSh
        .select(col("doc_id"), size(col("s")).as("n"),
          explode(graft.functions.Expressions.md5ArrayHashes(col("s"))).as("g"))
        .repartition(w, col("g"))
      val wDf = org.apache.spark.sql.expressions.Window.partitionBy("g")
      val wOrd = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("df", "g")
      val pos = ex
        .withColumn("df", count(lit(1)).over(wDf))
        .repartition(w, col("doc_id"))
        .withColumn("p", row_number().over(wOrd) - 1)
        .where(col("p") < col("n") - expr(s"(n * $num + ${den - 1}) div $den") + 1)
        .repartition(w, col("g"))
      val cands = pos
        .select(col("doc_id").as("doc_a"), col("n").as("na"), col("p").as("pa"), col("g"))
        .join(pos.select(col("doc_id").as("doc_b"), col("n").as("nb"),
          col("p").as("pb"), col("g")), "g")
        .where(col("doc_a") < col("doc_b") &&
          col("na") * den >= col("nb") * num && col("nb") * den >= col("na") * num)
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("ov"), max(col("pa")).as("mpa"), max(col("pb")).as("mpb"),
          first(col("na")).as("na"), first(col("nb")).as("nb"))
        .where((col("ov") + least(col("na") - 1 - col("mpa"), col("nb") - 1 - col("mpb")))
          * (num + den) >= (col("na") + col("nb")) * num)
        .select("doc_a", "doc_b")
        .repartition(w, col("doc_a"))
      val shA = withSh.select(col("doc_id").as("doc_a"), col("s").as("sa"))
      val shB = withSh.select(col("doc_id").as("doc_b"), col("s").as("sb"))
      import graft.core.Out.SmallOrderOps
      cands.join(shA, "doc_a").join(shB, "doc_b")
        .withColumn("inter",
          graft.functions.Expressions.sortedIntersectSizeBounded(
            col("sa"), col("sb"), num, den))
        .where(col("inter") >= 0)
        .withColumn("uni", size(col("sa")) + size(col("sb")) - col("inter"))
        .select(col("doc_a"), col("doc_b"),
          graft.functions.StableAgg.scaledLong(
            col("inter").cast("double") / col("uni"), 10000).as("j_x10k"))
        .orderSmall("doc_a", "doc_b")
    }

    // ---- e14_binary_rerank: OLD = shipped udaf/Aggregator vec-payload
    // top-m (ExpressionEncoder boxes every scored row, Seq[Float]
    // conversion included, before the insert sees the score); NEW = raw
    // TypedImperativeAggregate (primitive reads, vector copied only on
    // accept). Same shortlist, same rerank tail.
    val emb = graft.core.Tables.load(spark, sfDir, "embeddings")
    def e14Shape(rawAgg: Boolean): DataFrame = {
      val (m, kk) = (50, 10)
      val q = emb.where(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
          Similarity.signSig(col("embedding")).as("qs"))
      val coarse = emb
        .select(col("vec_id"), col("embedding"),
          Similarity.signSig(col("embedding")).as("sg"))
        .crossJoin(broadcast(q))
        .where(col("vec_id") =!= col("query_id"))
        .withColumn("cos", -expr("CAST(bit_count(sg ^ qs) AS DOUBLE)"))
      val top = if (rawAgg)
        graft.functions.TopKByScoreVecRawAgg.column(
          m, col("cos"), col("vec_id"), col("embedding"))
      else
        R13OldVecAgg.column(
          m, col("cos"), col("vec_id"), col("embedding"))
      val cand = coarse.groupBy("query_id")
        .agg(top.as("top"), first(col("qv")).as("qv"))
      val scored = transform(col("top"), c => struct(
        round(graft.functions.Expressions.cosineSim(
          c.getField("_3"), col("qv")) * 10000, 0).cast("long").as("c"),
        c.getField("_2").as("i")))
      val byExact = (l: Column, r: Column) =>
        when(l.getField("c") > r.getField("c"), -1)
          .when(l.getField("c") < r.getField("c"), 1)
          .when(l.getField("i") < r.getField("i"), -1)
          .when(l.getField("i") > r.getField("i"), 1)
          .otherwise(0)
      import graft.core.Out.SmallOrderOps
      cand
        .select(col("query_id"), slice(array_sort(scored, byExact), 1, kk).as("topk"))
        .select(col("query_id"), explode(col("topk")).as("nb"))
        .select(col("query_id"), col("nb.i").as("neighbor_id"), col("nb.c").as("cos_x10k"))
        .orderAgg(col("query_id"), col("cos_x10k").desc, col("neighbor_id"))
    }

    // ---- e8_knn_graph: OLD = shipped shape with the udaf/Aggregator
    // plain top-k (boxed (Double, Long) per scored in-cell pair — ~1.5M
    // rows at sf0.1); NEW = current operator with TopKByScoreRawAgg.
    def e8Shape(rawAgg: Boolean): DataFrame = {
      val (kk, bits, cellCap) = (3, 4, 512)
      val cells0 = emb.select(col("vec_id"), col("embedding"),
        Similarity.signBucket(col("embedding"), bits).as("cell"))
      val cells = cells0
        .withColumn("cr", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("cell")
            .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))))
        .where(col("cr") <= cellCap).drop("cr")
      val scored = cells.as("q").join(cells.as("c"),
          col("q.cell") === col("c.cell"))
        .where(col("c.vec_id") =!= col("q.vec_id"))
        .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor"),
          round(graft.functions.Expressions.cosineSim(
            col("c.embedding"), col("q.embedding")) * 10000, 0).as("cos"))
      val top = if (rawAgg)
        graft.functions.TopKByScoreRawAgg.column(kk, col("cos"), col("neighbor"))
      else graft.functions.TopKByScoreAgg.column(kk, col("cos"), col("neighbor"))
      import graft.core.Out.SmallOrderOps
      scored.groupBy("query_id")
        .agg(top.as("top"))
        .select(col("query_id"), explode(col("top")).as("nb"))
        .select(col("query_id"), col("nb._2").as("neighbor_id"), col("nb._1").as("cos"))
        .orderAgg(col("query_id"), col("cos").desc, col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"), col("cos").cast("long").as("cos_x10k"))
    }

    // ---- t15_novelty: OLD = shipped serving shape (the FULL stored df
    // index broadcast, inner join, n_dup = sum(df >= 2)); NEW = only the
    // df >= 2 subset broadcast (filter pushed into the stored-index
    // scan), LEFT join, n_dup = count(matched). Row-identical: every
    // window h exists in the full index, so the inner join never dropped
    // rows, and match-vs-null under the filtered index encodes exactly
    // df >= 2.
    val ndfs = graft.core.Artifacts.materialized(spark, sfDir, "novelty_dfs") {
      Dedup.noveltyDfs(docs)
    }
    def t15Shape(dupOnly: Boolean): DataFrame = {
      import graft.core.Out.SmallOrderOps
      val wins = Dedup.windowPostings(docs, 8)
      val j =
        if (dupOnly)
          wins.join(broadcast(ndfs.where(col("df") >= 2)), Seq("h"), "left")
            .groupBy("doc_id")
            .agg(count(lit(1)).as("n_windows"), count(col("df")).as("n_dup"))
        else
          wins.join(broadcast(ndfs), Seq("h"))
            .groupBy("doc_id")
            .agg(count(lit(1)).as("n_windows"),
              sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_dup"))
      j.select(col("doc_id"), col("n_windows"), col("n_dup"),
          expr("n_dup * 1000 div n_windows").as("dup_permille"))
        .orderAgg("doc_id")
    }

    // ---- e1 one-job probe (VERDICT r12 next-#4): OLD = shipped
    // broadcast-build shape (query side a filtered parquet scan under a
    // BroadcastExchange — its build is a separate job); NEW candidate =
    // query rows collected at CONSTRUCTION time (still inside the timed
    // region, still one scan job) and broadcast as a LocalRelation
    // (whose broadcast build runs no job). Jobs stay 2 either way — the
    // probe quantifies whether the local-relation broadcast is any
    // cheaper than the scan-under-broadcast it replaces.
    def e1Old(): DataFrame = Similarity.cosineTopK(emb, col("vec_id") < 5)
    def e1Lit(): DataFrame = {
      import spark.implicits._
      val qRows = emb.where(col("vec_id") < 5)
        .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])].collect()
      val q = spark.createDataset(qRows.toSeq)
        .toDF("query_id", "qv")
      val scored = emb.crossJoin(broadcast(q))
        .where(col("vec_id") =!= col("query_id"))
        .withColumn("cos", round(graft.functions.Expressions.cosineSim(
          col("embedding"), col("qv")) * 10000, 0))
      import graft.core.Out.SmallOrderOps
      scored.groupBy("query_id")
        .agg(graft.functions.TopKByScoreRawAgg.column(10, col("cos"), col("vec_id")).as("top"))
        .select(col("query_id"), explode(col("top")).as("nb"))
        .select(col("query_id"), col("nb._2").as("neighbor_id"), col("nb._1").as("cos"))
        .orderAgg(col("query_id"), col("cos").desc, col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"), col("cos").cast("long").as("cos_x10k"))
    }

    // ---- d16_containment: OLD = shipped (separate qs broadcast carries
    // each probe doc's set size — a second probe-slice scan + shingling
    // + broadcast build + join); NEW = na rides the qe postings
    // broadcast (one long per exploded row) and first(na) rides the pair
    // aggregate — one broadcast build, one join, one probe shingling
    // pass fewer.
    def d16Shape(foldNa: Boolean): DataFrame = {
      import graft.core.Out.SmallOrderOps
      val p = coalesce(col("doc_id") % 5 === 0, lit(false))
      val sh = docs.select(col("doc_id"), Dedup.shingles(col("text")).as("s"))
        .where(size(col("s")) > 0)
      val ce = sh.where(!p)
        .select(col("doc_id").as("doc_b"), explode(col("s")).as("g"))
      val out =
        if (foldNa) {
          val qe = sh.where(p)
            .select(col("doc_id").as("doc_a"), size(col("s")).cast("long").as("na"),
              explode(col("s")).as("g"))
          ce.join(broadcast(qe), "g")
            .groupBy("doc_a", "doc_b")
            .agg(count(lit(1)).as("shared"), first(col("na")).as("na"))
            .withColumn("cont_x1000", expr("shared * 1000 div na"))
        } else {
          val qe = sh.where(p)
            .select(col("doc_id").as("doc_a"), explode(col("s")).as("g"))
          val qs = sh.where(p)
            .select(col("doc_id").as("doc_a"), size(col("s")).cast("long").as("na"))
          ce.join(broadcast(qe), "g")
            .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
            .join(broadcast(qs), "doc_a")
            .withColumn("cont_x1000", expr("shared * 1000 div na"))
        }
      out.where(col("cont_x1000") >= 600)
        .select(col("doc_a"), col("doc_b"), col("shared"), col("cont_x1000"))
        .orderSmall("doc_a", "doc_b")
    }

    // ---- d14_edit_dedup: OLD = shipped 3-join attach (withA = ta ⋈
    // bc(jpairs), withB = tb ⋈ bc(jpairs), then withA ⋈ withB on the
    // pair key — an extra join round over two pair-sized text frames);
    // NEW = sequential 2-join attach (corpus streams through ta-side,
    // the pair-sized result broadcast against the tb-side corpus scan).
    def d14Shape(twoJoin: Boolean): DataFrame = {
      import graft.core.Out.SmallOrderOps
      // jaccardPairs body (private[ops]) reconstructed: LSH candidates +
      // exact-Jaccard gate.
      val withSh = Dedup.shingled(docs)
      val banded = Dedup.bandedSignatures(withSh, 64, 16)
      val cands0 = banded.as("x")
        .join(banded.as("y"), Seq("band", "key"))
        .where(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
      val shA = withSh.select(col("doc_id").as("doc_a"), col("s").as("sa"))
      val shB = withSh.select(col("doc_id").as("doc_b"), col("s").as("sb"))
      val jpairs = cands0.join(shA, "doc_a").join(shB, "doc_b")
        .withColumn("jacc", graft.functions.Expressions.jaccardSim(col("sa"), col("sb")))
        .where(col("jacc") >= 0.5)
        .select(col("doc_a"), col("doc_b"))
      val ta = docs.select(col("doc_id").as("doc_a"), col("text").as("text_a"))
      val tb = docs.select(col("doc_id").as("doc_b"), col("text").as("text_b"))
      val joined =
        if (twoJoin)
          tb.join(broadcast(ta.join(broadcast(jpairs), "doc_a")), "doc_b")
        else {
          val withA = ta.join(jpairs, "doc_a")
          val withB = tb.join(jpairs, "doc_b")
          withA.join(withB, Seq("doc_a", "doc_b"))
        }
      joined
        .withColumn("lev", levenshtein(col("text_a"), col("text_b")).cast("long"))
        .withColumn("ep_x1000",
          expr("lev * 1000 div greatest(length(text_a), length(text_b))"))
        .where(col("ep_x1000") <= 20)
        .select(col("doc_a"), col("doc_b"), col("lev").as("lev_edits"), col("ep_x1000"))
        .orderSmall("doc_a", "doc_b")
    }

    // ---- d12_substring_dedup: OLD = shipped (whole posting pipeline at
    // the narrow session width); NEW = the d10 width discipline — the
    // pinned h-exchange and the islands-window exchange at the operator
    // width (2× the session conf when idle cores exist), so the posting
    // self-join fan-out and the islands window/aggregate run wide.
    def d12Shape(wide: Boolean): DataFrame = {
      import graft.core.Out.SmallOrderOps
      val (width, dfCap) = (8, 64)
      val sess = docs.sparkSession
      val conf = sess.sessionState.conf.numShufflePartitions
      val w = if (wide)
        math.max(conf, math.min(sess.sparkContext.defaultParallelism, 2 * conf))
      else conf
      val wins0 = Dedup.windowPostings(docs, width)
        .where(col("doc_id").isNotNull)
      val wins = if (wide) wins0.repartition(w, col("h")) else wins0.repartition(col("h"))
      val stats = wins.groupBy("h", "doc_id").agg(max(col("pos")).as("__gr_p"))
        .groupBy("h").agg(count(lit(1)).as("df"), max(col("__gr_p")).as("__gr_pp"))
        .where(col("df").between(2, dfCap) && col("__gr_pp") >= 0)
        .select("h", "df")
      val good = wins.join(stats, "h").select("h", "doc_id", "pos")
      val pairs = good.select(col("h"), col("doc_id").as("doc_a"), col("pos").as("a_pos"))
        .join(good.select(col("h"), col("doc_id").as("doc_b"), col("pos").as("b_pos")), "h")
        .where(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"), (col("a_pos") - col("b_pos")).as("d"), col("a_pos"))
      val pairsW = if (wide) pairs.repartition(w, col("doc_a"), col("doc_b"), col("d"))
        else pairs
      val wIsl = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_a", "doc_b", "d").orderBy("a_pos")
      pairsW
        .withColumn("g", col("a_pos") - row_number().over(wIsl))
        .groupBy("doc_a", "doc_b", "d", "g")
        .agg(min(col("a_pos")).as("a_start"), count(lit(1)).as("nw"))
        .select(col("doc_a"), col("doc_b"), col("a_start"),
          (col("a_start") - col("d")).as("b_start"),
          (col("nw") + (width - 1)).as("span_words"))
        .orderAgg("doc_a", "doc_b", "a_start", "b_start")
    }

    // ---- d12 presentation sort: OLD = shipped orderAgg (coalesce(1) —
    // with NO exchange between the islands window/aggregate and the
    // final sort, the coalesce narrows the WHOLE reduce side to one
    // task: the islands window over every pair-position row runs
    // single-threaded); NEW = repartition(1) before the sort (one tiny
    // extra exchange of the island rows, window + aggregate stay wide).
    def d12Sort(repart: Boolean): DataFrame = {
      import graft.core.Out.SmallOrderOps
      val base = Dedup.substringDedup(docs, ordered = false)
      if (repart) base.orderSmall("doc_a", "doc_b", "a_start", "b_start")
      else base.orderAgg("doc_a", "doc_b", "a_start", "b_start")
    }

    // ---- presentation-sort shape (d12's finding generalized): OLD =
    // orderAgg (coalesce(1), which narrows the whole reduce side above
    // the last exchange to ONE task — for these queries that is a
    // corpus-keyed final aggregate, a window, or an anti-join, not just
    // the tiny sort); NEW = ordered=false + orderSmall (repartition(1):
    // one extra tiny exchange, reduce side stays wide).
    import graft.core.Out.SmallOrderOps
    def t10Sort(repart: Boolean): DataFrame = {
      val tdf = graft.core.Artifacts.materialized(spark, sfDir, "tfidf_df") {
        TextAnalysis.tfidfStats(docs)._1
      }
      val base = TextAnalysis.tfidfTopKWithStats(docs, tdf,
        ops.DeclaredOps.tfidfN(spark, sfDir), 3, false, None)
      if (repart) base.orderSmall("doc_id", "rnk") else base.orderAgg("doc_id", "rnk")
    }
    def d20Sort(repart: Boolean): DataFrame = {
      val base = Dedup.nearDupAgainstIndex(docs.where(col("doc_id") % 4 === 2),
        docs.where(col("doc_id") % 4 =!= 2), ordered = false)
      if (repart) base.orderSmall("doc_id") else base.orderAgg("doc_id")
    }
    def s10Sort(repart: Boolean): DataFrame = {
      val base = Sampling.domainCap(docs, Sampling.syntheticUrl(col("doc_id")),
        3, ordered = false)
      if (repart) base.orderSmall("domain", "rnk") else base.orderAgg("domain", "rnk")
    }

    def q28Sort(repart: Boolean): DataFrame = {
      val cust = graft.core.Tables.load(spark, sfDir, "customer")
      val orders = graft.core.Tables.load(spark, sfDir, "orders")
      val cnts = cust.join(orders, cust("c_custkey") === orders("o_custkey"), "left")
        .groupBy(cust("c_custkey"), cust("c_nationkey"))
        .agg(count(col("o_orderkey")).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("c_nationkey")
      val base = cnts
        .withColumn("total", sum(col("cnt")).over(w))
        .withColumn("m", count(lit(1)).over(w))
        .where(col("cnt") * col("m") > col("total"))
        .groupBy("c_nationkey").agg(count(lit(1)).as("busy"))
        .select(col("c_nationkey").cast("int").as("nation"), col("busy"))
      if (repart) base.orderSmall("nation") else base.orderAgg("nation")
    }

    def t11Sort(repart: Boolean): DataFrame = {
      val base = Dedup.chunkDedup(docs, ordered = false)
      if (repart) base.orderSmall("chunk_md5") else base.orderAgg("chunk_md5")
    }
    def d22Sort(repart: Boolean): DataFrame = {
      val d = docs.select("doc_id", "text")
      val u = d.unionByName(d.where(col("doc_id") < 40)
        .withColumn("doc_id", col("doc_id") + 100000L))
      val base = Dedup.softDedupWeights(u, ordered = false)
      if (repart) base.orderSmall("doc_id") else base.orderAgg("doc_id")
    }

    // ---- q17_json_extract: OLD = shipped (the events scan splits to 3
    // tasks and the per-row JSON parse runs 3-wide on a 32-core host);
    // NEW = gopherRules' spread rule (repartition to cores when the scan
    // under-splits) before the parse.
    def q17Spread(spread: Boolean): DataFrame = {
      val ev = graft.core.Tables.load(spark, sfDir, "events")
      val cores = spark.sparkContext.defaultParallelism
      val base = if (spread && ev.rdd.getNumPartitions < cores)
        ev.repartition(cores) else ev
      base.select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .where(col("k") > 80)
        .orderBy("event_id")
        .limit(100)
    }

    val allArms: Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("q17s", () => q17Spread(spread = false), () => q17Spread(spread = true)),
      ("t11s", () => t11Sort(repart = false), () => t11Sort(repart = true)),
      ("d22s", () => d22Sort(repart = false), () => d22Sort(repart = true)),
      ("q28s", () => q28Sort(repart = false), () => q28Sort(repart = true)),
      ("t10s", () => t10Sort(repart = false), () => t10Sort(repart = true)),
      ("d20s", () => d20Sort(repart = false), () => d20Sort(repart = true)),
      ("s10s", () => s10Sort(repart = false), () => s10Sort(repart = true)),
      ("d12s", () => d12Sort(repart = false), () => d12Sort(repart = true)),
      ("d12", () => d12Shape(wide = false), () => d12Shape(wide = true)),
      ("d16", () => d16Shape(foldNa = false), () => d16Shape(foldNa = true)),
      ("d14", () => d14Shape(twoJoin = false), () => d14Shape(twoJoin = true)),
      ("t15", () => t15Shape(dupOnly = false), () => t15Shape(dupOnly = true)),
      ("e1", () => e1Old(), () => e1Lit()),
      ("e8", () => e8Shape(rawAgg = false), () => e8Shape(rawAgg = true)),
      ("e14", () => e14Shape(rawAgg = false), () => e14Shape(rawAgg = true)),
      ("t6", () => t6Old(), () => t6New()),
      ("d10", () => d10Old(), () => d10New()),
      ("d10w", () => d10Old(), () => d10Wide()),
      ("d10x", () => d10Wide(), () => d10WideBounded()),
      ("d10f", () => d10Old(), () => d10WideBounded()))

    val want = args.toSet
    val arms = if (want.isEmpty) allArms
      else allArms.filter { case (n, _, _) => want.exists(n.startsWith) }
    val flat: Seq[(String, () => DataFrame)] = arms.flatMap { case (n, o, nw) =>
      Seq(s"${n}_old" -> o, s"${n}_new" -> nw) }

    // AB_STAGES=1: per-stage wall times for the current arm (diagnosis).
    if (sys.env.get("AB_STAGES").contains("1"))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = s.stageInfo
          System.err.println(f"[ab-stage] id ${i.stageId} tasks ${i.numTasks} " +
            f"${(i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)) / 1e3}%.3f s " +
            i.name.takeWhile(_ != '\n').take(80))
        }
      })

    flat.foreach { case (_, f) => f().collect() } // warm
    System.gc(); Thread.sleep(1000)
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    val passes = sys.env.getOrElse("AB_PASSES", "9").toInt
    for (_ <- 1 to passes) flat.foreach { case (n, f) =>
      System.gc()
      val t0 = System.nanoTime()
      f().collect()
      samples(n) = (System.nanoTime() - t0) / 1e9 :: samples(n)
    }
    arms.foreach { case (n, _, _) =>
      def s(k: String) = samples(k).sorted
      val (o, w) = (s(s"${n}_old"), s(s"${n}_new"))
      println(f"[ab] $n%-6s old min ${o.head}%.3f med ${o(o.size / 2)}%.3f | " +
        f"new min ${w.head}%.3f med ${w(w.size / 2)}%.3f | " +
        f"min x${o.head / w.head}%.2f med x${o(o.size / 2) / w(w.size / 2)}%.2f")
    }
    // Row parity, explicit throw (not assert()).
    arms.foreach { case (n, o, nw) =>
      val (a, b) = (o().collect().toSeq, nw().collect().toSeq)
      if (a != b) throw new IllegalStateException(
        s"$n arms differ: old ${a.size} rows vs new ${b.size} rows; " +
          s"first diff ${a.zip(b).find { case (x, y) => x != y }}")
    }
    println("[ab] parity OK")
    spark.stop()
  }
}

/** The pre-r13 udaf/Aggregator vec-payload top-k, kept verbatim in TEST
  * scope as the e14 A/B old arm (superseded in src/main by
  * TopKByScoreVecRawAgg — see that scaladoc for the measured why). */
class R13OldVecAgg(k: Int)
    extends org.apache.spark.sql.expressions.Aggregator[(Double, Long, Seq[Float]),
      Seq[(Double, Long, Seq[Float])], Seq[(Double, Long, Seq[Float])]] {
  import org.apache.spark.sql.Encoder
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

  private def ahead(a: (Double, Long, Seq[Float]), b: (Double, Long, Seq[Float])): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(acc: Seq[(Double, Long, Seq[Float])],
      x: (Double, Long, Seq[Float])): Seq[(Double, Long, Seq[Float])] =
    if (acc.length >= k && ahead(acc.last, x)) acc
    else {
      val i = acc.indexWhere(e => ahead(x, e))
      val ins = if (i < 0) acc :+ x else (acc.take(i) :+ x) ++ acc.drop(i)
      if (ins.length > k) ins.take(k) else ins
    }

  override def zero: Seq[(Double, Long, Seq[Float])] = Vector.empty
  override def reduce(acc: Seq[(Double, Long, Seq[Float])],
      x: (Double, Long, Seq[Float])): Seq[(Double, Long, Seq[Float])] = insert(acc, x)
  override def merge(a: Seq[(Double, Long, Seq[Float])],
      b: Seq[(Double, Long, Seq[Float])]): Seq[(Double, Long, Seq[Float])] =
    b.foldLeft(a)(insert)
  override def finish(acc: Seq[(Double, Long, Seq[Float])]): Seq[(Double, Long, Seq[Float])] =
    acc
  override def bufferEncoder: Encoder[Seq[(Double, Long, Seq[Float])]] =
    ExpressionEncoder[Seq[(Double, Long, Seq[Float])]]()
  override def outputEncoder: Encoder[Seq[(Double, Long, Seq[Float])]] =
    ExpressionEncoder[Seq[(Double, Long, Seq[Float])]]()
}

object R13OldVecAgg {
  def column(k: Int, score: org.apache.spark.sql.Column, id: org.apache.spark.sql.Column,
      vec: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.udaf(new R13OldVecAgg(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Long, Seq[Float])]())
      .apply(score, id, vec)
}
