package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Out.SmallOrderOps

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Two tiers: brute-force cosine top-k (the correctness baseline — a
  * broadcast of the query set against a single scan of the corpus, no
  * N×N), and an IVF-style bucketed variant (the 100 TB path: a coarse
  * deterministic quantizer prunes the corpus to one cell per query).
  */
object Similarity {

  /** Exact double-precision cosine between two float-array columns —
    * native expression, sequential fold matching the oracle's list_sum
    * order bit-for-bit. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.Expressions.cosineSim(a, b)

  /** Per-query bounded top-k over a scored (query_id, id, cos) frame —
    * shared ranking tail of e1/e2: a map-side-partial TopKByScoreAgg, so
    * only ≤ k candidates per (partition, query) reach the shuffle, never
    * the full corpus×queries scored set (see TopKByScoreAgg). The final
    * ORDER BY reproduces the rank order: (cos desc, id asc) per query. */
  private[ops] def rankTopK(scored: DataFrame, idCol: String, k: Int): DataFrame =
    scored.groupBy("query_id")
      .agg(graft.functions.TopKByScoreRawAgg.column(k, col("cos"), col(idCol)).as("top"))
      .select(col("query_id"), explode(col("top")).as("nb"))
      .select(col("query_id"), col("nb._2").as("neighbor_id"), col("nb._1").as("cos"))
      .orderAgg(col("query_id"), col("cos").desc, col("neighbor_id"))

  /** rankTopK with the score emitted as the scaled integer it already is:
    * e1/e2/e4 rank by an integral-valued double (cos·10⁴ rounded, or an
    * int8 dot product), so the hashed output column is the exact BIGINT —
    * ranking semantics untouched, no double in the hashed surface. */
  private[ops] def rankTopKScaled(scored: DataFrame, idCol: String, k: Int,
      outCol: String): DataFrame =
    rankTopK(scored, idCol, k)
      .select(col("query_id"), col("neighbor_id"), col("cos").cast("long").as(outCol))

  /** Brute-force cosine top-k: for each query vector (small set), the k
    * nearest corpus vectors.
    *
    * Scale: the QUERY side is broadcast (it's the small dimension); the
    * corpus is scanned once, partition-local, and the ranking is a
    * bounded top-k AGGREGATE — executor memory and shuffle are
    * O(queries × k), never O(N) (round-2's window-rank shape shuffled
    * the whole scored set). Ranking uses the ROUNDED cosine with vec_id
    * tiebreak so ordering is stable under last-ulp float noise across
    * engines.
    */
  def cosineTopK(emb: DataFrame, queryPred: Column, k: Int = 10): DataFrame = {
    val q = emb.where(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    // Score = round(cos·10⁴) as an integral double: same rank order both
    // engines (deterministic fold → identical double → identical integer),
    // and the output column is that exact integer as BIGINT.
    val scored = emb.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("embedding"), col("qv")) * 10000, 0))
    rankTopKScaled(scored, "vec_id", k, "cos_x10k")
  }

  /** e16 — metadata-FILTERED top-k: each query's neighbors restricted to
    * corpus vectors sharing the query's `label` (the production
    * "filtered search" shape — retrieval within a language / source /
    * license bucket). Filter-DURING-search, not post-filter: the label
    * restriction is the join condition, so candidates drop from N·Q to
    * N·Q/labels before any scoring, and top-k never underfills — the
    * classic post-filter-an-ANN-shortlist pitfall (k results requested,
    * k·selectivity returned) is structurally impossible here.
    *
    * Scale: same contract as [[cosineTopK]] with the cross join UPGRADED
    * to a broadcast equi-join on label — one corpus scan, bounded top-k
    * aggregate, O(queries·k) past the shuffle. A label too coarse to
    * help simply degrades to e1's candidate count, never above it. */
  def filteredTopK(emb: DataFrame, queryPred: Column, k: Int = 10): DataFrame = {
    val q = emb.where(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("label").as("qlabel"))
    val scored = emb.join(broadcast(q), col("label") === col("qlabel"))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("embedding"), col("qv")) * 10000, 0))
    rankTopKScaled(scored, "vec_id", k, "cos_x10k")
  }

  /** e18 — kNN label prediction: majority label among the k exact-cosine
    * nearest neighbors, the standard embedding-quality eval a labeled
    * corpus runs (does nearest-neighbor structure recover the labels?).
    *
    * ONE corpus pass, e1's bounded top-k aggregate with the neighbor
    * label riding the shuffle as an 8-byte payload (TopKByScorePayloadAgg
    * — the e12 fold: everything downstream of the bounded shortlist is
    * per-query local state); the query's own true label rides the query
    * broadcast. The majority vote is then a codegen'd array fold over
    * the ≤k in-row candidates — no join back to the corpus, no second
    * aggregate round. Deterministic tiebreak: more votes, then the
    * SMALLER label — integer rules only, so the row is hash-exact. */
  def knnPredict(emb: DataFrame, queryPred: Column, k: Int = 10): DataFrame = {
    val q = emb.where(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("label").as("tl"))
    val top = emb.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("embedding"), col("qv")) * 10000, 0))
      .groupBy("query_id")
      .agg(graft.functions.TopKByScorePayloadRawAgg.column(k, col("cos"),
          col("vec_id"), col("label").cast("long")).as("top"),
        first(col("tl")).as("true_label"))
    top
      .select(col("query_id"), col("true_label"),
        expr("""array_max(transform(array_distinct(transform(top, t -> t._3)),
                l -> struct(CAST(size(filter(top, t -> t._3 = l)) AS BIGINT) AS votes,
                            -l AS neg)))""").as("w"))
      .select(col("query_id"), col("true_label"),
        (-col("w.neg")).cast("int").as("pred_label"), col("w.votes").as("votes"))
      .orderAgg("query_id")
  }

  /** MMR (maximal-marginal-relevance) diversified top-k: greedy
    * selection maximizing λ·rel(q,d) − (1−λ)·max_{s∈selected} sim(d,s)
    * — retrieval that refuses to return k near-copies of the same
    * document (the diversity-aware sampling step a dedup-aware training
    * pipeline runs after ANN).
    *
    * Shape (the e10 two-stage idiom): stage 1 cuts the corpus to a
    * per-query top-`m` RELEVANCE shortlist via the bounded top-k
    * aggregate (corpus scanned once, queries broadcast, O(queries·m)
    * past the shuffle); stage 2 unrolls the greedy selection over the
    * shortlist — each of the k−1 steps is a broadcast-bounded join +
    * (query, candidate)-keyed max + rank-1 window on frames of
    * O(queries·m²) rows TOTAL, never corpus-sized. k is the unroll
    * depth of the plan: small by construction (it is the answer size).
    *
    * All arithmetic is scaled-integer: rel/sim are round(cos·10⁴)
    * BIGINTs (the e1 contract) and the MMR score is
    * rel·λ₁₀₀₀ − maxsim·(1000−λ₁₀₀₀) — exact integers, deterministic
    * (score desc, id asc) tie-break, bit-identical in any engine. */
  def mmrTopK(emb: DataFrame, queryPred: Column, k: Int = 3, m: Int = 20,
      lambdaX1000: Int = 700): DataFrame = {
    require(m >= k, "shortlist m must cover k selections")
    // Stage 1 (the only corpus-sized work, audited separately in
    // PlanAudit as mmr shortlist): one scan + bounded top-m aggregate,
    // then one more scan to attach shortlist embeddings. Both stages
    // are MATERIALIZED (localCheckpoint: queries·m rows) so the greedy
    // phase's plan — whose unrolled steps each reference the shortlist
    // several times — is built on a bounded in-memory relation and the
    // corpus appears NOWHERE in it (asserted in PlanAudit). Without the
    // boundary, every step subtree re-embedded the corpus aggregate:
    // measured 1.33 s → the checkpointed form re-scans nothing. The
    // checkpointed shortlist is itself a build-once artifact — callers
    // serving a fixed query set (DeclaredOps, views) memoize it per
    // data signature and pass it to [[mmrSelect]] directly.
    mmrSelect(mmrShortlist(emb, queryPred, m).localCheckpoint(), k, lambdaX1000)
  }

  /** Greedy MMR selection over a (materialized) shortlist from
    * [[mmrShortlist]] — corpus-free by construction.
    *
    * The pairwise sims stay a DISTRIBUTED broadcast self-join (the
    * float→integer rounding runs through the same codegen'd `cosine`
    * kernel as every e-family operator, so scores are engine-exact by
    * construction), but the greedy walk itself folds per query: each
    * query's selection depends ONLY on its own m candidates and m²
    * integer sims — bounded local state however large the corpus — so
    * k−1 unrolled join + rank-1-window rounds (VERDICT r10 #5: 4 jobs /
    * 19 stages, pure round-count cost at fixture scale) collapse into
    * ONE query-keyed aggregate + a local integer loop. Tie-breaks are
    * the same explicit (score desc, did asc) the window form used;
    * arithmetic is all Long — nothing float ever reaches the
    * comparator. */
  def mmrSelect(withEmb: DataFrame, k: Int = 3,
      lambdaX1000: Int = 700): DataFrame = {
    require(k >= 1, "need k >= 1")
    require(lambdaX1000 > 0 && lambdaX1000 < 1000, "lambda must be in (0,1)")
    val spark = withEmb.sparkSession
    val short = withEmb.select("query_id", "did", "rel_x10k")
    // Pairwise shortlist similarities: queries·m² rows, broadcast
    // self-join (hint measured in r7; the pair frame is
    // shortlist²-sized, never corpus-sized).
    val a = withEmb.select(col("query_id"), col("did").as("da"), col("dv").as("va"))
    val b = withEmb.select(col("query_id"), col("did").as("db"), col("dv").as("vb"))
    val sims = a.join(broadcast(b), Seq("query_id"))
      .where(col("da") =!= col("db"))
      .select(col("query_id"), col("da"), col("db"),
        round(cosine(col("va"), col("vb")) * 10000, 0).cast("long").as("sim_x10k"))
    val packed = short
      .groupBy("query_id")
      .agg(collect_list(struct(col("did"), col("rel_x10k"))).as("cands"))
      .join(sims.groupBy("query_id")
        .agg(collect_list(struct(col("da"), col("db"), col("sim_x10k"))).as("pairs")),
        Seq("query_id"), "left")
    import spark.implicits._
    packed.flatMap { row =>
      val qid = row.getLong(0)
      val cands = row.getSeq[org.apache.spark.sql.Row](1)
        .map(c => (c.getLong(0), c.getLong(1)))
      val sim = if (row.isNullAt(2)) Map.empty[(Long, Long), Long]
        else row.getSeq[org.apache.spark.sql.Row](2)
          .map(p => (p.getLong(0), p.getLong(1)) -> p.getLong(2)).toMap
      val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      val remaining = scala.collection.mutable.LinkedHashMap(cands: _*)
      for (r <- 1 to math.min(k, cands.size)) {
        // (score desc, did asc) — identical to the window form's order.
        val (did, score) = remaining.iterator.map { case (d, rel) =>
          val s =
            if (r == 1) rel * lambdaX1000
            else {
              val maxsim = selected.iterator.map(t => sim((d, t._2))).max
              rel * lambdaX1000 - maxsim * (1000 - lambdaX1000)
            }
          (d, s)
        }.minBy { case (d, s) => (-s, d) }
        selected += ((r.toLong, did, score))
        remaining.remove(did)
      }
      selected.iterator.map { case (r, d, s) => (qid, r, d, s) }
    }.toDF("query_id", "rank", "neighbor_id", "mmr_score")
      .orderSmall("query_id", "rank")
  }

  /** Stage 1 of [[mmrTopK]]: the per-query top-`m` relevance shortlist
    * with embeddings attached — (query_id, did, rel_x10k, dv). One
    * corpus scan into the bounded top-m aggregate (queries broadcast),
    * one more to attach the m embeddings (broadcast pair side). */
  private[graft] def mmrShortlist(emb: DataFrame, queryPred: Column,
      m: Int): DataFrame = {
    val q = emb.where(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val scored = emb.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("embedding"), col("qv")) * 10000, 0))
    val short = scored.groupBy("query_id")
      .agg(graft.functions.TopKByScoreRawAgg.column(m, col("cos"), col("vec_id")).as("top"))
      .select(col("query_id"), explode(col("top")).as("nb"))
      .select(col("query_id"), col("nb._2").as("did"),
        col("nb._1").cast("long").as("rel_x10k"))
    emb.select(col("vec_id").as("did"), col("embedding").as("dv"))
      .join(broadcast(short), "did")
  }

  /** Deterministic IVF-style coarse cell: sign bits of the first `bits`
    * components. Exact float sign — reproducible across engines.
    * Spelled as a flat sum of CASEs, not aggregate(sequence(...)): the
    * higher-order fold is interpreted per corpus row (the e2 regression
    * r3→r4), while this stays inside whole-stage codegen. Identical
    * value: bit i carries weight 2^(bits-1-i), first component is MSB. */
  def signBucket(v: Column, bits: Int = 4): Column =
    (0 until bits).map(i =>
      when(element_at(v, i + 1) >= 0f, lit(1 << (bits - 1 - i))).otherwise(lit(0)))
      .reduce(_ + _)

  /** 63-bit sign signature (one bit per component, first component =
    * MSB): signBucket widened to a full binary code in a BIGINT. 63
    * bits, not 64, keeps every weight a positive Long in BOTH engines
    * (1L << 63 is the sign bit here and an overflow error in DuckDB).
    * Native codegen'd kernel (VectorKernels.signSig63): the composed
    * 63-term when-chain it replaces was the hottest expression in the
    * binary-ANN family — 2.5× the cost of a full float cosine over the
    * same rows at bench scale. Bit-identical semantics INCLUDING null
    * handling: the old chain's otherwise(0) made a NULL array signature
    * 0L (the row still participated in sig joins), so the kernel's
    * null-in/null-out is coalesced back to 0L — arbitrary server
    * corpora may carry null embeddings even though fixtures don't. */
  def signSig(v: Column): Column =
    coalesce(graft.functions.Expressions.signSig63(v), lit(0L))

  /** Binary-code Hamming top-k — the 8-bytes-per-vector scan tier of
    * ANN (below even PQ's m bytes): each vector collapses to its
    * 63-bit sign signature, queries broadcast, and ranking is
    * bit_count(xor) — pure integer ops, NO float arithmetic anywhere in
    * the ranking, so the declared row is hash-exact by construction
    * (ties broken by vec_id). The standard production use is as the
    * cheap prefilter whose survivors e10's exact re-rank refines.
    *
    * Scale: at 100 TB the signature is a precomputed 8-byte column, so
    * this tier scans 1/32 of the float bytes; here it is computed
    * in-scan (map-only — PlanAudit asserts no Exchange carries
    * `embedding`), and the per-query result is the bounded top-k
    * aggregate. */
  def binaryTopK(emb: DataFrame, queryPred: Column, k: Int = 10): DataFrame = {
    val sigs = emb.select(col("vec_id"), signSig(col("embedding")).as("sg"))
    val q = sigs.where(queryPred)
      .select(col("vec_id").as("query_id"), col("sg").as("qs"))
    val scored = sigs.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos", -expr("CAST(bit_count(sg ^ qs) AS DOUBLE)"))
    rankTopK(scored, "vec_id", k)
      .select(col("query_id"), col("neighbor_id"),
        (-col("cos")).cast("long").as("hamming"))
  }

  /** Per-label centroids: element-wise mean of the embedding vectors in
    * each label group — the training step a real IVF quantizer runs.
    *
    * Scale: posexplode fans out to (label, position) keys, so the
    * aggregation is map-side-partial + one shuffle of scalar partials —
    * never whole vectors through a single reducer.
    *
    * Output shape is exploded scalar rows (label, pos, m) rather than one
    * array column per label: same information, but hash/compare-friendly
    * (array-typed result columns break row-wise comparators), and the
    * element mean is computed with StableAgg's exact-decimal sum so the
    * value is independent of partial-merge order. */
  def labelCentroids(emb: DataFrame): DataFrame =
    emb.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(graft.functions.StableAgg
        .avgScaledLong(col("v").cast("double"), 10000, "decimal(18,9)").as("m_x10k"))
      .orderAgg("label", "pos")

  /** Nearest-centroid assignment + confusion counts — the evaluation step
    * of an embedding pipeline: every vector is assigned the label of its
    * most cosine-similar centroid, reported as the (true, assigned)
    * confusion matrix.
    *
    * Scale: the codebook is collected to the driver (labels-sized) and
    * inlined as literals, so assignment is a per-row expression inside
    * the scan stage — the only shuffle is the confusion count on a
    * labels² key space; the embedding column never crosses an Exchange.
    * Cosines are left folds in both engines, so the per-engine argmax
    * cannot diverge; an exact cosine tie (never with real data) breaks
    * to the larger label on both sides.
    */
  /** Labels-sized centroid frame (clabel, c): the exact-decimal element
    * means of e3, gathered back into vectors — the learned codebook shared
    * by nearest-centroid assignment (e5) and the trained-IVF index (e6).
    * Bit-identical across engines (see labelCentroids). */
  def centroidFrame(emb: DataFrame): DataFrame =
    emb
      .select(col("label").as("clabel"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("clabel", "pos")
      .agg(graft.functions.StableAgg.davg(col("v").cast("double"), 4, "decimal(18,9)").as("m"))
      .groupBy("clabel")
      .agg(expr("transform(sort_array(collect_list(struct(pos, m))), x -> x.m)").as("c"))

  /** The labels-sized codebook, collected to the driver (legitimate: it
    * is k rows of k-means output, bytes not gigabytes — the same place a
    * real IVF keeps its coarse quantizer). The centroid doubles are exact
    * decimal means, so the literal round-trip preserves the precise bits
    * both engines compute. */
  def collectCodebook(cent: DataFrame): Seq[(Int, Seq[Double])] =
    cent.collect().map(r => (r.getInt(0), r.getSeq[Double](1))).toSeq
      .sortBy(_._1)

  /** MAP-ONLY nearest-centroid cell for one row: `greatest` over
    * per-centroid `struct(cos, clabel)` — struct comparison is
    * lexicographic, so this is exactly `max_by(clabel, struct(cos,
    * clabel))` (ties to the larger label) with the centroids inlined as
    * literals. Native fused CosineSim per centroid (same fold order as
    * the aggregate(zip_with(...)) oracle spelling, so values are
    * bit-identical), zero Exchange: assignment happens inside the scan
    * stage. The previous shape — crossJoin(broadcast(cent)) then
    * groupBy(vec_id).agg(max_by, first(embedding)) — re-shuffled every
    * EMBEDDING VECTOR to pick an argmax over a handful of broadcast
    * centroids; at 100 TB that is a full-corpus shuffle of the widest
    * column where a per-row computation suffices (VERDICT r4 #3). */
  def nearestCell(codebook: Seq[(Int, Seq[Double])], emb: Column): Column =
    // greatest() requires >= 2 args; a 1-cell codebook (single-label
    // corpus, cells = 1) assigns everything to that cell.
    if (codebook.size == 1) lit(codebook.head._1)
    else greatest(codebook.map { case (lab, vec) =>
      struct(cosine(emb, typedLit(vec)).as("cos"), lit(lab).as("clabel"))
    }: _*).getField("clabel")

  def centroidAssign(emb: DataFrame): DataFrame =
    centroidAssign(emb, collectCodebook(centroidFrame(emb)))

  /** centroidAssign over a PREBUILT codebook (the build-artifact
    * discipline of e7/s5: training runs once per data signature at the
    * declaration layer, not once per query). */
  def centroidAssign(emb: DataFrame, codebook: Seq[(Int, Seq[Double])]): DataFrame = {
    emb.select(col("label").as("true_label"),
        nearestCell(codebook, col("embedding")).as("assigned_label"))
      .groupBy("true_label", "assigned_label")
      .agg(count(lit(1)).as("n"))
      .orderAgg("true_label", "assigned_label")
  }

  /** IVF with a LEARNED coarse quantizer: the codebook is the exact-
    * decimal label-centroid frame (the k-means-style training step e3/e5
    * already provide — one Lloyd iteration seeded by labels), every
    * vector is assigned its nearest centroid by cosine, and each query
    * probes its own cell — a real trained IVF next to e2's deterministic
    * sign-quantizer.
    *
    * Scale: the codebook is labels-sized — inlined as literals for the
    * map-only assignment (nearestCell) and broadcast for the probe side;
    * candidates form only inside (cell) via an equi-join; ranking is
    * the bounded top-k aggregate. Per-query compute is
    * |cell| ≈ N/k, never N. Determinism: centroid bits are engine-
    * identical (exact decimal means), cosines are the same double fold
    * in both engines, so each vector's argmax cell — and therefore the
    * candidate set — cannot diverge (the e5 argument, reused).
    */
  def ivfCentroidTopK(emb: DataFrame, queryPred: Column, k: Int = 5): DataFrame =
    probeTopK(emb, collectCodebook(centroidFrame(emb)), queryPred, k)

  /** ivfCentroidTopK over a PREBUILT codebook (see centroidAssign). */
  def ivfCentroidTopK(emb: DataFrame, codebook: Seq[(Int, Seq[Double])],
      queryPred: Column, k: Int): DataFrame =
    probeTopK(emb, codebook, queryPred, k)

  /** The `probes` nearest cells for one row — the centroid-IVF analogue
    * of e2's Hamming multiprobe: rank the per-centroid struct(cos,
    * clabel) descending (same comparison as nearestCell, so probe 1 IS
    * the assigned cell) and keep the first `probes`. Codebook-sized
    * arithmetic per row, applied only to the QUERY side. */
  def nearestCells(codebook: Seq[(Int, Seq[Double])], emb: Column, probes: Int): Column = {
    if (codebook.size == 1) return array(lit(codebook.head._1))
    val ranked = array_sort(
      array(codebook.map { case (lab, vec) =>
        struct(cosine(emb, typedLit(vec)).as("cos"), lit(lab).as("clabel"))
      }: _*),
      (a, b) => when(a > b, -1).when(a < b, 1).otherwise(0))
    transform(slice(ranked, 1, probes), s => s.getField("clabel"))
  }

  /** Shared IVF probe path: map-only assignment over an inlined codebook
    * (see nearestCell — the corpus reaches the probe join straight from
    * its scan, no Exchange carries the embedding column), broadcast
    * query side, candidates only inside (cell) via the equi-join,
    * bounded top-k ranking. `probes` > 1 expands each QUERY to its p
    * nearest cells (the recall knob — compute grows to probes × |cell|
    * per query, the corpus side is untouched); candidate supersets rank
    * identically, so results at larger p are monotone better. */
  def probeTopK(emb: DataFrame, codebook: Seq[(Int, Seq[Double])],
      queryPred: Column, k: Int, probes: Int = 1): DataFrame = {
    val assigned = emb.select(col("vec_id"), col("embedding"),
      nearestCell(codebook, col("embedding")).as("cell"))
    val q =
      if (probes <= 1)
        assigned.where(queryPred)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("cell"))
      else
        emb.where(queryPred)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
            explode(nearestCells(codebook, col("embedding"), probes)).as("cell"))
    val scored = assigned.join(broadcast(q), "cell")
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("embedding"), col("qv")) * 10000, 0))
    rankTopKScaled(scored, "vec_id", k, "cos_x10k")
  }

  /** UNSUPERVISED codebook training (VERDICT r4 #6): no labels anywhere.
    * Seeding is deterministic in the k-means‖ spirit — instead of random
    * oversampling, the `cells` vectors with the smallest md5(vec_id)
    * digest (a uniform, engine-independent hash order) seed the cells —
    * followed by a FIXED number of Lloyd iterations: map-only
    * nearest-centroid assignment over the inlined current codebook (the
    * e5 expression), then exact-decimal element means per cell (the e3
    * aggregate), so every iteration is deterministic and the whole
    * training run is reproducible bit-for-bit. A cell that loses all
    * members keeps its previous centroid (the standard empty-cell rule,
    * deterministically).
    *
    * Scale: each iteration is one job with the e3/e5 plan shape — a
    * map-only assignment inside the scan and a (cells × dims)-key scalar
    * aggregate; the driver holds only the labels-sized codebook between
    * iterations. Iteration count is fixed (not convergence-tested), the
    * standard large-scale practice. */
  /** Deterministic bounded TRAINING SAMPLE: the `n` vectors with the
    * smallest md5(vec_id) (the s1 hash-split idiom — uniform, engine-
    * independent, reproducible), collected ONCE and re-parallelized as a
    * local frame. Index training (farthest-first seeding + Lloyd) then
    * runs O(sample) jobs with ZERO further corpus scans — at 100 TB the
    * full-corpus path below would be `cells + iters` whole-corpus jobs
    * per (sub)codebook (~150 for PQ), where standard practice trains the
    * quantizer on a 10⁴–10⁵-vector sample and only ENCODING (map-only)
    * touches the corpus. `n <= 0` keeps the full-corpus path (tests pin
    * its exactness). */
  private[ops] def trainingSample(emb: DataFrame, n: Int): DataFrame = {
    if (n <= 0) return emb
    val spark = emb.sparkSession
    val proj = emb.select(col("vec_id"), col("embedding"))
    val rows = proj
      .withColumn("h", md5(col("vec_id").cast("string")))
      .orderBy("h", "vec_id").limit(n).drop("h").collect()
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), proj.schema)
      .repartition(math.max(1, math.min(rows.length / 2048, 32)))
  }

  /** ADVICE r5: an empty — or smaller-than-`cells` — training corpus used
    * to throw a bare NoSuchElementException from deep inside seeding (or
    * silently duplicate seeds into permanently empty cells). Fail fast
    * with the actual numbers instead. One cheap count on the sample path;
    * on the full-corpus path it is one extra scan next to the `cells +
    * iters` training scans. */
  private def requireTrainable(training: DataFrame, cells: Int): Unit = {
    val n = training.count()
    require(n >= cells,
      s"codebook training needs >= $cells vectors (cells), corpus/sample has $n")
  }

  def trainCodebook(emb: DataFrame, cells: Int = 10, iters: Int = 3,
      sampleN: Int = 0): Seq[(Int, Seq[Double])] = {
    val train = trainingSample(emb, sampleN)
    requireTrainable(train, cells)
    // Farthest-first traversal seeding (k-means++'s spread property,
    // determinized): seed 0 is the vector with the smallest md5(vec_id)
    // (a uniform, engine-independent hash order); each next seed is the
    // vector LEAST cosine-similar to its nearest chosen seed (ties to
    // the smaller vec_id). Uniform-hash seeding alone measured 0.24
    // recall on the labeled corpus — several seeds in one true cluster
    // split others across cells; farthest-first picks one seed per
    // region. Each step is a map-only scan + a 1-row TakeOrdered.
    val first = train.select(col("vec_id"), col("embedding"))
      .withColumn("h", md5(col("vec_id").cast("string")))
      .orderBy("h", "vec_id").limit(1).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toSeq).head
    var chosen = Vector(first)
    while (chosen.size < cells) {
      val nearSeed =
        if (chosen.size == 1) cosine(col("embedding"), typedLit(chosen.head))
        else greatest(chosen.map(s => cosine(col("embedding"), typedLit(s))): _*)
      val next = train.select(col("vec_id"), col("embedding"), nearSeed.as("mx"))
        .orderBy(col("mx"), col("vec_id")).limit(1).collect()
        .map(_.getSeq[Float](1).map(_.toDouble).toSeq).head
      chosen = chosen :+ next
    }
    var codebook: Seq[(Int, Seq[Double])] = chosen.zipWithIndex.map { case (v, i) => (i, v) }
    for (_ <- 1 to iters) {
      val means = train
        .select(nearestCell(codebook, col("embedding")).as("cell"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("cell", "pos")
        .agg(graft.functions.StableAgg.davg(col("v").cast("double"), 4, "decimal(18,9)").as("m"))
        .groupBy("cell")
        .agg(expr("transform(sort_array(collect_list(struct(pos, m))), x -> x.m)").as("c"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
      codebook = codebook.map { case (c, old) => (c, means.getOrElse(c, old)) }
    }
    codebook
  }

  /** IVF over the UNSUPERVISED codebook — e6's probe path with a
    * trained-without-labels quantizer. Not a declared oracle query (the
    * oracle would have to replicate iterative k-means in SQL); its
    * invariants — determinism, cell balance, recall vs brute force —
    * are asserted in OpsSpec and measured across SFs in ScaleCheck. */
  def ivfTrainedTopK(emb: DataFrame, queryPred: Column, k: Int = 5,
      cells: Int = 10, iters: Int = 3, probes: Int = 1, sampleN: Int = 0): DataFrame =
    probeTopK(emb, trainCodebook(emb, cells, iters, sampleN), queryPred, k, probes)

  // ----- Product quantization (Jégou et al., PAMI'11) -----------------
  // The memory tier BELOW int8 (e4): each vector compresses to m small
  // codes (m bytes at kc<=256 vs 4·dims float32 — 32× at 64 dims, m=8),
  // and scoring a pair is m table adds instead of dims multiply-adds.

  /** Nearest sub-centroid by squared L2 (the PQ assignment metric —
    * Lloyd means minimize exactly this); ties to the smaller code. */
  private def nearestCodeL2(cb: Seq[(Int, Seq[Double])], sub: Column): Column =
    if (cb.size == 1) lit(cb.head._1)
    else least(cb.map { case (code, c) =>
      struct(graft.functions.Expressions.l2sq(sub, typedLit(c)).as("d"),
        lit(code).as("code"))
    }: _*).getField("code")

  /** One PQ subspace codebook, trained like trainCodebook but under the
    * L2 metric on a subvector column: deterministic farthest-first
    * seeding (max min-distance instead of min max-cosine) + fixed Lloyd
    * iterations with exact-decimal means (which ARE the L2-optimal
    * centroids). `sub` must project (vec_id, v: array) where v is the
    * subvector. */
  /** Caller guards corpus size (trainPq counts the shared training frame
    * once rather than once per subspace). */
  private def trainSubspace(sub: DataFrame, kc: Int, iters: Int): Seq[(Int, Seq[Double])] = {
    def vecOf(r: org.apache.spark.sql.Row): Seq[Double] =
      r.getSeq[Float](1).map(_.toDouble).toSeq
    val first = sub.withColumn("h", md5(col("vec_id").cast("string")))
      .orderBy("h", "vec_id").limit(1).collect().map(vecOf).head
    var chosen = Vector(first)
    while (chosen.size < kc) {
      val nearest =
        if (chosen.size == 1) graft.functions.Expressions.l2sq(col("v"), typedLit(chosen.head))
        else least(chosen.map(s => graft.functions.Expressions.l2sq(col("v"), typedLit(s))): _*)
      // Farthest-first under L2: next seed MAXIMIZES distance to its
      // nearest chosen seed (ties to the smaller vec_id).
      val next = sub.select(col("vec_id"), col("v"), nearest.as("dn"))
        .orderBy(col("dn").desc, col("vec_id")).limit(1).collect().map(vecOf).head
      chosen = chosen :+ next
    }
    var cb: Seq[(Int, Seq[Double])] = chosen.zipWithIndex.map { case (v, i) => (i, v) }
    for (_ <- 1 to iters) {
      val means = sub
        .select(nearestCodeL2(cb, col("v")).as("code"),
          posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("code", "pos")
        .agg(graft.functions.StableAgg.davg(col("x").cast("double"), 4, "decimal(18,9)").as("m"))
        .groupBy("code")
        .agg(expr("transform(sort_array(collect_list(struct(pos, m))), x -> x.m)").as("c"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
      cb = cb.map { case (c, old) => (c, means.getOrElse(c, old)) }
    }
    cb
  }

  /** PQ codebooks: m subspace codebooks of kc centroids each, trained
    * independently (the PQ factorization). Deterministic end to end.
    * `sampleN` bounds training cost (see trainingSample): the sample is
    * drawn once and shared by all m subspace trainings. */
  def trainPq(emb: DataFrame, m: Int = 8, kc: Int = 16,
      iters: Int = 3, sampleN: Int = 0): Seq[Seq[(Int, Seq[Double])]] = {
    val dims = emb.select(size(col("embedding"))).head.getInt(0)
    require(dims % m == 0, s"dims $dims not divisible by m=$m")
    val d = dims / m
    val train = trainingSample(emb, sampleN)
    requireTrainable(train, kc)
    (0 until m).map { s =>
      trainSubspace(
        train.select(col("vec_id"),
          slice(col("embedding"), s * d + 1, d).as("v")), kc, iters)
    }
  }

  /** Map-only PQ encoding: one nearest-sub-centroid code per subspace,
    * over the inlined codebooks — the whole corpus compresses inside
    * its scan, no shuffle (the e5 inlining argument, per subspace).
    * One fused codegen'd kernel call per row (PqEncode) rather than an
    * m × kc least(struct(l2sq(slice))) tree; semantics identical
    * (same distance fold, same smaller-code tie-break). Requires every
    * subspace codebook to have the same kc — true of every trainer here. */
  def pqCodes(codebooks: Seq[Seq[(Int, Seq[Double])]], emb: Column, d: Int): Column = {
    val m = codebooks.size
    val kc = codebooks.head.size
    require(codebooks.forall(_.size == kc),
      s"pqCodes: ragged codebooks (${codebooks.map(_.size).mkString(",")})")
    require(codebooks.forall(_.forall(_._2.size == d)),
      s"pqCodes: centroid dims != $d")
    // Rank order within a subspace must be code-ascending so the kernel's
    // keep-first tie-break means "smaller code", matching least(struct).
    val sorted = codebooks.map(_.sortBy(_._1))
    val flat = sorted.flatMap(_.flatMap(_._2))
    val codeVals = sorted.flatMap(_.map(_._1))
    graft.functions.Expressions.pqEncode(emb, flat, codeVals, m, kc)
  }

  /** PQ asymmetric top-k: corpus scored from its CODES alone against a
    * per-query lookup table (LUT[s][c] = ⟨query subvector s, centroid
    * c⟩, built driver-side from the bounded query set — the same small
    * side every top-k here broadcasts). Score = Σ_s LUT[s][code_s] ≈
    * the inner product ⟨query, vector⟩; the approximation error is the
    * quantization residual, and the score is EXACTLY the inner product
    * with the reconstructed (decoded) vector — the invariant OpsSpec
    * asserts. Scale: encoding is map-only; the scored set is
    * corpus × queries like e1, but each pair costs m table adds on
    * m-byte codes (bandwidth 32× below float32), and ranking is the
    * bounded top-k aggregate. */
  def pqTopK(emb: DataFrame, queryPred: Column, cbs: Seq[Seq[(Int, Seq[Double])]],
      k: Int = 5): DataFrame = {
    val spark = emb.sparkSession
    val m = cbs.size
    val kc = cbs.head.size
    val d = cbs.head.head._2.size
    val coded = emb.select(col("vec_id"), pqCodes(cbs, col("embedding"), d).as("codes"))
    val luts = emb.where(queryPred).select(col("vec_id"), col("embedding")).collect()
      .map { r =>
        val q = r.getSeq[Float](1).map(_.toDouble)
        val lut = cbs.zipWithIndex.flatMap { case (cb, s) =>
          cb.map { case (_, c) =>
            var dot = 0.0
            var i = 0
            while (i < d) { dot += q(s * d + i) * c(i); i += 1 }
            dot
          }
        }
        (r.getLong(0), lut)
      }.toSeq
    import spark.implicits._
    val qDf = luts.toDF("query_id", "lut")
    val scored = coded.crossJoin(broadcast(qDf))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos",
        round(graft.functions.Expressions.pqScore(col("codes"), col("lut"), kc) * 10000, 0))
    rankTopKScaled(scored, "vec_id", k, "pqdot_x10k")
  }

  /** IVF-PQ composed retrieval (e11) — the production ANN shape at
    * corpus scale: the coarse quantizer restricts each query's candidate
    * set to its cell (e6's pruning, |cell| ≈ N/cells instead of N) and
    * PQ LUT scoring cuts per-candidate cost to m table adds over m-byte
    * codes (e7's compression, bandwidth 32× below float32). The two
    * reductions MULTIPLY: per-query work drops from N·d float ops to
    * (N/cells)·m adds, which is why this composition — not either piece
    * alone — is what IVFPQ-style indexes deploy.
    *
    * Scale: ONE map-only corpus projection computes the coarse cell and
    * the PQ codes inside the scan (both codebooks inlined; no Exchange
    * ever carries `embedding`); the bounded query side broadcasts
    * (cell, LUT); candidates form only inside (cell) via the equi-join;
    * ranking is the bounded top-k aggregate. Determinism: the query's
    * cell is computed by the SAME nearestCell expression as the corpus
    * assignment, so query and corpus cannot disagree about a cell
    * boundary, and LUT scores are the exact e7 arithmetic. */
  def ivfPqTopK(emb: DataFrame, queryPred: Column,
      coarse: Seq[(Int, Seq[Double])], cbs: Seq[Seq[(Int, Seq[Double])]],
      k: Int = 5, probes: Int = 1): DataFrame = {
    val spark = emb.sparkSession
    val kc = cbs.head.size
    val d = cbs.head.head._2.size
    val coded = emb.select(col("vec_id"),
      nearestCell(coarse, col("embedding")).as("cell"),
      pqCodes(cbs, col("embedding"), d).as("codes"))
    // `probes` is the recall knob exactly as in probeTopK: each query
    // expands to its p nearest cells (corpus cells are disjoint, so the
    // probed candidate sets union without dedup; probes = |coarse|
    // degenerates to full-corpus PQ = e7, the OpsSpec pin).
    val qRows = emb.where(queryPred)
      .select(col("vec_id"),
        nearestCells(coarse, col("embedding"), probes).as("cells"),
        col("embedding"))
      .collect()
    val luts = qRows.flatMap { r =>
      val q = r.getSeq[Float](2).map(_.toDouble)
      val lut = cbs.zipWithIndex.flatMap { case (cb, s) =>
        cb.map { case (_, c) =>
          var dot = 0.0
          var i = 0
          while (i < d) { dot += q(s * d + i) * c(i); i += 1 }
          dot
        }
      }
      r.getSeq[Int](1).map(cell => (r.getLong(0), cell, lut))
    }.toSeq
    import spark.implicits._
    val qDf = luts.toDF("query_id", "cell", "lut")
    val scored = coded.join(broadcast(qDf), "cell")
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos",
        round(graft.functions.Expressions.pqScore(col("codes"), col("lut"), kc) * 10000, 0))
    rankTopKScaled(scored, "vec_id", k, "pqdot_x10k")
  }

  /** Train-then-query convenience. A PQ codebook is a BUILD artifact, not
    * per-query state (VERDICT r5 wrong-#4) — declared/served paths call
    * pqTopK with a prebuilt codebook; this wrapper exists for tests and
    * one-shot exploration. */
  def pqTopKTrained(emb: DataFrame, queryPred: Column, k: Int = 5, m: Int = 8,
      kc: Int = 16, iters: Int = 3, sampleN: Int = 0): DataFrame =
    pqTopK(emb, queryPred, trainPq(emb, m, kc, iters, sampleN), k)

  /** ORACLE-EXPRESSIBLE PQ codebooks: the per-label exact-decimal centroid
    * frame (e3/e5's engine-identical spelling) sliced into m subvectors —
    * one supervised Lloyd step standing in for iterative k-means, which no
    * SQL oracle can replicate. Encoding and LUT scoring — the actual PQ
    * arithmetic e7 pins — run unchanged on these; the QUALITY of a trained
    * codebook is ScaleCheck's job, not the correctness row's. Codes are
    * the label RANK (contiguous 0..kc-1 — PqScore's LUT-index contract
    * holds for any label domain; rank order == label order keeps the
    * argmin tie-break aligned with the oracle's ORDER BY dd, code). */
  def labelPqCodebooks(emb: DataFrame, m: Int = 8): Seq[Seq[(Int, Seq[Double])]] = {
    val cent = collectCodebook(centroidFrame(emb))
    val dims = cent.head._2.size
    require(dims % m == 0, s"dims $dims not divisible by m=$m")
    val d = dims / m
    (0 until m).map { s =>
      cent.zipWithIndex.map { case ((_, v), i) => (i, v.slice(s * d, s * d + d)) }
    }
  }

  /** Embedding-cosine near-duplicate PAIRS — the dedup-family member over
    * vectors (exact/minhash/simhash/ngram cover text; this covers the
    * embedding modality). Random-hyperplane-style LSH with DETERMINISTIC
    * planes (the coordinate axes): signature = 64 sign bits, banded
    * 16 × 4; candidate pairs form only inside (band, key) buckets — the
    * same O(N) equi-join shape as minhashLsh, never all-pairs — then
    * exact cosine verifies candidates at the threshold.
    *
    * Determinism vs the all-pairs oracle (the d2 argument): at the
    * declared threshold every qualifying pair in the data shares at least
    * one sign-band (verified for both SFs in SCALECHECK; cos ≥ τ pairs
    * differ in few sign bits, so a 4-bit band survives), and the cosine
    * arithmetic is the same fold in both engines, so LSH output equals
    * ground truth exactly.
    */
  def embeddingNearDup(emb: DataFrame, threshold: Double = 0.5,
      bands: Int = 16, dims: Int = 64): DataFrame = {
    val rows = dims / bands
    // One band key per 4 sign bits, spelled with element_at so the hot
    // loop is flat arithmetic, not nested interpreted lambdas.
    val keyExpr = (0 until rows).map(r =>
      s"CASE WHEN element_at(embedding, b*$rows+${r + 1}) >= cast(0 AS float) " +
        s"THEN ${1 << (rows - 1 - r)} ELSE 0 END").mkString(" + ")
    // The pinned vec_id exchange carries (vec_id, keys) ONLY — the
    // embedding column never rides the candidate pipeline (r12: the old
    // frame kept `embedding` in sgn for the verify sides; the verify
    // attach pruned `keys` while the banded branch pruned `embedding`,
    // the subtrees canonicalized differently, and the attach side paid
    // its own full-frame exchange on top of a second scan). The verify
    // sides now read the RAW scan directly: under the broadcast regime
    // that is scan → broadcast with NO exchange; above the threshold
    // EnsureRequirements inserts the vec_id exchange the equi-join
    // needs — exactly what the old pin provided.
    val sgn = emb.select(col("vec_id"),
      expr(s"transform(sequence(0, ${bands - 1}), b -> $keyExpr)").as("keys"))
      .repartition(col("vec_id"))
    val banded = sgn.select(col("vec_id"), posexplode(col("keys")).as(Seq("band", "key")))
    val cands = banded.as("x").join(banded.as("y"), Seq("band", "key"))
      .where(col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      .distinct()
    val va = emb.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val vb = emb.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
    cands.join(va, "vec_a").join(vb, "vec_b")
      .withColumn("cos", cosine(col("ea"), col("eb")))
      .where(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"),
        graft.functions.StableAgg.scaledLong(col("cos"), 10000).as("cos_x10k"))
      .orderSmall("vec_a", "vec_b")
  }

  /** Semantic (embedding-space) duplicate clusters — the SemDeDup
    * grouping step: connected components over the exact-cosine near-dup
    * pair set (d9), labeled by min member. Paraphrase clusters that
    * token-level dedup cannot see collapse here; `clusterKeep` style
    * application then drops all but one representative per cluster.
    *
    * Scale: pair formation is d9's sign-band bucketing (never
    * all-pairs); the CC core is Dedup.ccLabels — size-adaptive
    * union-find below the edge threshold, Pregel-style label
    * propagation above it. */
  def semanticClusters(emb: DataFrame, threshold: Double = 0.5): DataFrame =
    Dedup.ccLabels(embeddingNearDup(emb, threshold)
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))
      .select(col("doc_id").as("vec_id"), col("cluster"))
      .orderSmall("vec_id")

  /** SemDeDup-style APPLY — the rewrite [[semanticClusters]] only
    * reports: every vector keeps its row unless it is a non-minimal
    * member of a semantic cluster (published SemDeDup semantics: one
    * representative per near-duplicate semantic group, singletons
    * untouched). Output (vec_id, cluster_rep) where cluster_rep = 1
    * marks a kept representative that DID absorb duplicates.
    *
    * Scale: the cluster frame is PAIR-derived (bounded by the near-dup
    * pair count, not the corpus), so the survivor filter is one
    * corpus-keyed left equi-join against a small frame — broadcastable
    * by the optimizer at any realistic dup rate — followed by a
    * map-side filter; no stage re-shuffles the corpus. */
  def semanticDedupApply(emb: DataFrame, threshold: Double = 0.5,
      ordered: Boolean = true): DataFrame = {
    val clusters = Dedup.ccLabels(embeddingNearDup(emb, threshold)
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))
      .select(col("doc_id").as("vec_id"), col("cluster"))
    val out = emb.select(col("vec_id"))
      .join(clusters, Seq("vec_id"), "left")
      .where(col("cluster").isNull || col("cluster") === col("vec_id"))
      .select(col("vec_id"),
        when(col("cluster").isNotNull, 1L).otherwise(0L).as("cluster_rep"))
    // orderSmall, not orderAgg: the survivor path is scan -> broadcast
    // left join -> filter (map-only); coalesce(1) would serialize it.
    if (ordered) out.orderSmall("vec_id") else out
  }

  /** Cross-corpus embedding decontamination — the embedding-modality
    * analogue of d11's text decontaminate: TRAIN vectors whose cosine to
    * any EVAL vector reaches the threshold (the leakage a semantic
    * train/eval split must remove; 13-gram text matching misses
    * paraphrases, embedding similarity is the published remedy).
    *
    * EXACT by construction at ANY threshold: the eval set is broadcast
    * (an eval benchmark is bounded by definition — the same "small
    * dimension" premise as e1's query set) against one scan of the
    * train corpus, exact cosine per pair. A sign-band LSH variant was
    * measured and REJECTED for the declared row: below τ = 0.5 the
    * band-sharing guarantee genuinely fails on this corpus (162 of 172
    * qualifying pairs at τ = 0.4, sf0.1) — a silent-miss decontaminator
    * is worse than a slower exact one. For corpus-sized eval sets,
    * compose the e2/e8 cell machinery to prefilter; the exactness
    * contract then becomes that of the chosen index.
    *
    * Scale: broadcast eval side, map-only scoring inside the train
    * scan, no shuffle except the bounded-output presentation sort —
    * per-row cost is |eval| fused cosine kernels. */
  def crossContamination(emb: DataFrame, evalPred: Column,
      threshold: Double = 0.4): DataFrame = {
    // Null-evaluating predicate rows land on the TRAIN side, not in
    // neither slice (the Dedup.containment rule, ADVICE r7).
    val p = coalesce(evalPred, lit(false))
    val ev = emb.where(p)
      .select(col("vec_id").as("eval_id"), col("embedding").as("ee"))
    emb.where(!p)
      .select(col("vec_id").as("train_id"), col("embedding").as("et"))
      .crossJoin(broadcast(ev))
      .withColumn("cos", cosine(col("et"), col("ee")))
      .where(col("cos") >= threshold)
      .select(col("train_id"), col("eval_id"),
        graft.functions.StableAgg.scaledLong(col("cos"), 10000).as("cos_x10k"))
      .orderSmall("train_id", "eval_id")
  }

  /** Cell-restricted KNN graph — every vector's k nearest neighbors among
    * the vectors sharing its deterministic sign-bit cell (the SemDeDup /
    * semantic-dedup building block: the all-vectors analogue of e1's
    * bounded-query top-k). The cell restriction IS the declared operator
    * (both engines compute the identical deterministic approximation —
    * hash-equal by construction); recall against brute force is a
    * measured ScaleCheck property, not a correctness one.
    *
    * Scale: one shuffle on the cell id co-locates each cell, pairs form
    * only inside cells (equi-join, never all-pairs), and ranking is the
    * bounded top-k aggregate — compute is Σ|cell|² ≈ N·|cell| and state
    * is O(N·k). `bits` is the scale knob: it grows with log N (4 at test
    * scale, ~20 ⇒ 1 M cells at 100 TB) to hold |cell| roughly constant,
    * exactly how a coarse IVF quantizer's cell count scales. */
  def knnGraph(emb: DataFrame, k: Int = 3, bits: Int = 4,
      cellCap: Int = 512): DataFrame = {
    // TRUE self-join (identical projection on both sides, renames only
    // after the join) so the two cell exchanges canonicalize to one and
    // the corpus is shuffled ONCE on the cell id (ReusedExchange —
    // PlanAudit-asserted; d2's band-join discipline).
    val cells0 = emb.select(col("vec_id"), col("embedding"),
      signBucket(col("embedding"), bits).as("cell"))
    // Hot-cell cap (VERDICT r6 #6): in-cell pair formation is Σ|cell|²,
    // and while `bits` holds |cell| ~ constant on an ISOTROPIC corpus, a
    // CLUSTERED corpus at scale can concentrate mass in one sign-cell
    // and blow the quadratic up. Cells larger than `cellCap` are
    // deterministically truncated to their smallest-md5 members (the d7
    // stop-shingle-cap idiom — engine-independent, reproducible across
    // runs/retries); overflow vectors drop out of the graph and are the
    // signal to escalate `bits`. The cap is generous at test scale
    // (~125 vectors/cell at sf0.1 — a no-op, asserted in ScaleCheck and
    // OpsSpec); the window sits ABOVE the one cell exchange, so both
    // self-join sides still canonicalize to a single shuffle.
    val cells =
      if (cellCap <= 0) cells0
      else cells0
        .withColumn("cr", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("cell")
            .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))))
        .where(col("cr") <= cellCap).drop("cr")
    val scored = cells.as("q").join(cells.as("c"),
        col("q.cell") === col("c.cell"))
      .where(col("c.vec_id") =!= col("q.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor"),
        round(cosine(col("c.embedding"), col("q.embedding")) * 10000, 0).as("cos"))
    rankTopKScaled(scored, "neighbor", k, "cos_x10k")
  }

  /** Symmetric int8 quantization of a float-vector column: round(x·127)
    * clamped to [-127, 127]. Deterministic (half-away-from-zero in both
    * engines), so quantized scores are exact integers — no float-order
    * sensitivity anywhere downstream. Native expression (the transform
    * lambda evaluated interpreted per element). */
  def quantize8(v: Column): Column = graft.functions.Expressions.quantize8(v)

  /** Int8-quantized dot-product top-k — the memory/bandwidth tier of ANN:
    * at 100 TB the quantized corpus is 4× smaller than float32 (64 B vs
    * 256 B per 64-dim vector), scan bandwidth and cache footprint drop
    * with it, and scoring is integer multiply-adds. Same broadcast-query
    * + single-corpus-scan + bounded top-k aggregate shape as e1; scores
    * are exact integers, so ranking is deterministic by construction
    * (no rounded-float tiebreak games needed). */
  def quantizedTopK(emb: DataFrame, queryPred: Column, k: Int = 10): DataFrame = {
    val c = emb.select(col("vec_id"), quantize8(col("embedding")).as("v8"))
    val q = c.where(queryPred)
      .select(col("vec_id").as("query_id"), col("v8").as("q8"))
    val dot = graft.functions.Expressions.dotI8(col("v8"), col("q8"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos", dot.cast("double"))
    rankTopKScaled(scored, "vec_id", k, "dot")
  }

  /** IVF-bucketed ANN: search the query's own cell, plus every cell
    * within `hammingProbes` sign-bit flips (multiprobe — the standard
    * recall knob; 0 = single-cell, the declared-query setting).
    *
    * Scale: corpus is (re)partitioned by cell once — each query probes
    * 1 + Σ C(bits, i) cells via an equi-join on the cell id, so compute
    * is probes × |cell| per query instead of N. Recall is bounded by the
    * quantizer (documented trade; cells would be k-means centroids in a
    * full IVF, sign-quantization keeps it deterministic and
    * dependency-free); raising `hammingProbes` trades compute for recall
    * without losing determinism.
    */
  def ivfTopK(emb: DataFrame, queryPred: Column, k: Int = 5, bits: Int = 4,
      hammingProbes: Int = 0): DataFrame = {
    val cells = emb.select(col("vec_id"), col("embedding"),
      signBucket(col("embedding"), bits).as("cell"))
    val q = cells.where(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("cell"))
    // Expand each query to its probe cells (exact-cover XOR masks up to
    // the Hamming budget); the probe column replaces the join key. The
    // query side stays tiny (queries × probes) and broadcast.
    val masks = (0 until (1 << bits))
      .filter(m => Integer.bitCount(m) <= hammingProbes)
    val qProbes = q.withColumn("cell",
      explode(array(masks.map(m => col("cell").bitwiseXOR(lit(m))): _*)))
    val scored = cells.join(broadcast(qProbes), "cell")
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("embedding"), col("qv")) * 10000, 0))
    rankTopKScaled(scored, "vec_id", k, "cos_x10k")
  }

  /** Two-stage (coarse → exact) top-k: rank the corpus by cosine on the
    * first `dims` dimensions only, keep the top `m` candidates per
    * query, then re-rank those candidates by exact full-dimension cosine
    * and emit the top `k` — the truncated-dimension ("Matryoshka")
    * retrieval pattern: embedding models trained with
    * matryoshka-representation losses concentrate signal in the prefix,
    * so a prefix scan finds nearly the same candidates at a fraction of
    * the cost.
    *
    * Scale: this is the bandwidth tier BETWEEN e4 (int8, 4×) and e7
    * (PQ, 32×): the coarse pass reads `dims`/D of the vector bytes
    * (8/64 = 12.5% here — with a column layout storing the prefix
    * separately, the full vectors never leave disk for non-candidates),
    * scores with the same fused kernel, and keeps the bounded top-m
    * aggregate shape of e1. The re-rank touches only queries × m full
    * vectors via broadcast candidate joins — no corpus shuffle anywhere.
    * Both stages are deterministic (rounded integral score, id
    * tiebreak), so the DECLARED operator is the two-stage composition
    * itself, hash-equal in both engines; recall vs the exact e1 answer
    * is a measured ScaleCheck property, not a correctness one.
    */
  def twoStageTopK(emb: DataFrame, queryPred: Column, dims: Int = 8,
      m: Int = 50, k: Int = 10): DataFrame = {
    val q = emb.where(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val coarse = emb.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(
        cosine(slice(col("embedding"), 1, dims), slice(col("qv"), 1, dims)) * 10000, 0))
    foldedShortlistRerank(coarse, m, k)
  }

  /** Binary-prefilter + exact re-rank — e13's 8-byte Hamming tier
    * composed with e10's exact second stage: stage 1 ranks by
    * bit_count(xor) on 63-bit sign signatures (integer-only, reads
    * 1/32 of the vector bytes when the signature is a stored column),
    * stage 2 re-scores the top-`m` survivors by exact full-dim cosine
    * via ONE broadcast candidate join. Both stages deterministic
    * (integer scores, id tiebreaks), so the DECLARED operator is the
    * composition itself — hash-equal in both engines; recall vs exact
    * is the measured ScaleCheck property, as with e10/e11. */
  def binaryRerankTopK(emb: DataFrame, queryPred: Column, m: Int = 50,
      k: Int = 10): DataFrame = {
    val q = emb.where(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        signSig(col("embedding")).as("qs"))
    val coarse = emb
      .select(col("vec_id"), col("embedding"), signSig(col("embedding")).as("sg"))
      .crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos", -expr("CAST(bit_count(sg ^ qs) AS DOUBLE)"))
    foldedShortlistRerank(coarse, m, k)
  }

  /** Fully-composed production ANN pipeline (VERDICT r8 #4): coarse
    * centroid-cell restriction (e6's trained quantizer) ∩ 63-bit binary
    * Hamming prefilter (e13) → bounded shortlist → exact-cosine re-rank
    * (e10/e14's broadcast candidate join). The four stages of a real
    * vector index in one declared plan; every stage is deterministic, so
    * the composition IS the oracle (the e14 rule).
    *
    * Scale: cell and signature are map-only in-scan projections — the
    * corpus side enters the candidate join carrying (vec_id, cell, sg),
    * ~20 bytes/row, never the float vector; candidates form only inside
    * the query's cell via a broadcast equi-join; the Hamming shortlist
    * is a bounded top-m aggregate over integer xor/popcount; only the m
    * survivors' float vectors are touched again, in a pair-sized
    * broadcast join. Per-query cost ≈ probes × |cell| integer ops + m
    * float folds — never N.
    *
    * `probes` > 1 expands each QUERY to its p nearest cells (probeTopK's
    * recall knob applied to the composed pipeline — the measured
    * single-probe recall plateau in SCALECHECK.md is P(true neighbor
    * shares the query's one cell); multiprobe raises exactly that
    * ceiling). Cells partition the corpus, so the per-cell candidate
    * sets union WITHOUT duplicates into the same bounded shortlist. */
  def ivfBinaryRerankTopK(emb: DataFrame, codebook: Seq[(Int, Seq[Double])],
      queryPred: Column, m: Int = 20, k: Int = 5, probes: Int = 1): DataFrame = {
    val assigned = emb.select(col("vec_id"), col("embedding"),
      nearestCell(codebook, col("embedding")).as("cell"),
      signSig(col("embedding")).as("sg"))
    val q =
      if (probes <= 1)
        emb.where(queryPred)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
            nearestCell(codebook, col("embedding")).as("cell"),
            signSig(col("embedding")).as("qs"))
      else
        emb.where(queryPred)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
            explode(nearestCells(codebook, col("embedding"), probes)).as("cell"),
            signSig(col("embedding")).as("qs"))
    val coarse = assigned.join(broadcast(q), "cell")
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos", -expr("CAST(bit_count(sg ^ qs) AS DOUBLE)"))
    foldedShortlistRerank(coarse, m, k)
  }

  /** Shared tail of the shortlist→re-rank pipelines (e10/e14/e15/e17),
    * FOLDED into one aggregate round (VERDICT r11 next-#4, the e12/e18
    * pattern): the bounded top-`m` aggregate carries each survivor's
    * float vector as payload, so the exact-cosine re-rank is a per-ROW
    * `transform` + `array_sort` over the aggregate's own output — no
    * join back to the corpus, no second ranking aggregate. Two jobs
    * total (partial agg + final agg/map), where the join-back form paid
    * four rounds AND a second full corpus scan for the survivors'
    * vectors.
    *
    * Scale: per-query aggregate state is m × dim floats (bounded); the
    * shuffle carries ≤ m vectors per (partition, query). The re-rank
    * order (exact cos·10⁴ desc, id asc) and the shortlist selection
    * (coarse score desc, id asc) are total orders, so the result is
    * bit-identical to the join-back form — pinned by the unchanged
    * oracle rows. `coarse` must carry (query_id, qv, vec_id, embedding,
    * cos). */
  private def foldedShortlistRerank(coarse: DataFrame, m: Int, k: Int): DataFrame = {
    // TopKByScoreVecRawAgg (r13): the udaf/Aggregator form paid an
    // ExpressionEncoder round-trip per scored row — every candidate
    // boxed (Double, Long, Seq[Float]) with the whole vector converted
    // to a Scala Seq before the insert looked at the score. The raw
    // TypedImperativeAggregate reads score/id primitively, rejects
    // below-shortlist rows before touching the vector, and copies a
    // vector only on accept. Same-window A/B on e14: min 0.41 → 0.26 s
    // (×1.55), rows bit-identical (oracle re-checked e10/e14/e15/e17).
    val cand = coarse.groupBy("query_id")
      .agg(graft.functions.TopKByScoreVecRawAgg.column(
          m, col("cos"), col("vec_id"), col("embedding")).as("top"),
        first(col("qv")).as("qv"))
    val scored = transform(col("top"), c => struct(
      round(cosine(c.getField("_3"), col("qv")) * 10000, 0).cast("long").as("c"),
      c.getField("_2").as("i")))
    val byExact = (l: Column, r: Column) =>
      when(l.getField("c") > r.getField("c"), -1)
        .when(l.getField("c") < r.getField("c"), 1)
        .when(l.getField("i") < r.getField("i"), -1)
        .when(l.getField("i") > r.getField("i"), 1)
        .otherwise(0)
    cand
      .select(col("query_id"), slice(array_sort(scored, byExact), 1, k).as("topk"))
      .select(col("query_id"), explode(col("topk")).as("nb"))
      .select(col("query_id"), col("nb.i").as("neighbor_id"), col("nb.c").as("cos_x10k"))
      .orderAgg(col("query_id"), col("cos_x10k").desc, col("neighbor_id"))
  }
}
