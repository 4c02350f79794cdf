package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Joins, Sampling, Similarity}

/** Semantics + plan-shape tests for the generic temporal joins
  * (ops/Joins.scala) and the round-7 sampling/similarity additions. */
class JoinsSpec extends GraftSuite {

  import spark.implicits._

  private def ts(s: String) = to_timestamp(lit(s))

  private lazy val right: DataFrame = Seq(
    (1L, "2024-01-01 10:00:00", 100.0),
    (1L, "2024-01-01 11:00:00", 110.0),
    (2L, "2024-01-01 10:30:00", 200.0))
    .toDF("k", "rs", "price")
    .select(col("k"), to_timestamp(col("rs")).as("rts"), col("price"))

  private lazy val left: DataFrame = Seq(
    (1L, 1L, "2024-01-01 09:59:59"), // before any right row -> nulls
    (1L, 2L, "2024-01-01 10:00:00"), // equal ts -> inclusive match
    (1L, 3L, "2024-01-01 10:59:59"), // between -> 10:00 row
    (1L, 4L, "2024-01-01 12:00:00"), // after all -> 11:00 row
    (2L, 5L, "2024-01-01 11:00:00"), // other key -> its own row
    (3L, 6L, "2024-01-01 11:00:00")) // key absent on right -> nulls
    .toDF("k", "id", "ls")
    .select(col("k"), col("id"), to_timestamp(col("ls")).as("lts"))

  test("asofJoin attaches the most recent right row, inclusive at ties") {
    val out = Joins.asofJoin(left, right, "k", "lts", "rts")
      .orderBy("id")
      .select("id", "price")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(out.toSeq == Seq(
      1L -> None, 2L -> Some(100.0), 3L -> Some(100.0),
      4L -> Some(110.0), 5L -> Some(200.0), 6L -> None))
  }

  test("asofJoin carries the whole right payload from ONE row even with null fields") {
    // Right row at 11:00 has a NULL note; a per-column running last()
    // would skip the null and mix fields from different rows.
    val r2 = Seq((1L, "2024-01-01 10:00:00", Some("old"), 1L),
                 (1L, "2024-01-01 11:00:00", None: Option[String], 2L))
      .toDF("k", "rs", "note", "ver")
      .select(col("k"), to_timestamp(col("rs")).as("rts"), col("note"), col("ver"))
    val l2 = Seq((1L, 7L, "2024-01-01 12:00:00")).toDF("k", "id", "ls")
      .select(col("k"), col("id"), to_timestamp(col("ls")).as("lts"))
    val row = Joins.asofJoin(l2, r2, "k", "lts", "rts").collect()(0)
    assert(row.getAs[Long]("ver") == 2L && row.isNullAt(row.fieldIndex("note")),
      "payload fields must all come from the ver=2 row, nulls included")
  }

  test("asofJoin plan has exactly one exchange (union + one window sort)") {
    val plan = Joins.asofJoin(left, right, "k", "lts", "rts")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"want 1 key exchange, got $exchanges:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"))
  }

  test("rangeJoin matches the naive theta-join exactly, boundaries inclusive") {
    val ev = Tables.load(spark, sf, "events")
    val errs = ev.where(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("err_id"), col("ts").as("err_ts"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    val banded = Joins.rangeJoin(errs, clicks, "user_id", "err_ts", "click_ts",
        -3600L, 3600L)
      .select("err_id", "click_id", "dt_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val naive = errs.join(clicks, Seq("user_id"))
      .withColumn("dt_us", unix_micros(col("click_ts")) - unix_micros(col("err_ts")))
      .where(col("dt_us").between(-3600000000L, 3600000000L))
      .select("err_id", "click_id", "dt_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == naive && naive.nonEmpty)
    assert(banded.size == banded.map(p => (p._1, p._2)).size,
      "two-bucket explode must yield each qualifying pair exactly once")
  }

  test("rangeJoin hits exact window edges and plans as an equi-join") {
    val a = Seq((1L, 10L, "2024-01-01 10:00:00")).toDF("k", "aid", "s")
      .select(col("k"), col("aid"), to_timestamp(col("s")).as("ats"))
    val b = Seq(
      (1L, 20L, "2024-01-01 09:00:00"),   // exactly -3600s: in
      (1L, 21L, "2024-01-01 11:00:00"),   // exactly +3600s: in
      (1L, 22L, "2024-01-01 08:59:59"),   // one past: out
      (1L, 23L, "2024-01-01 11:00:01"))   // one past: out
      .toDF("k", "bid", "s")
      .select(col("k"), col("bid"), to_timestamp(col("s")).as("bts"))
    val df = Joins.rangeJoin(a, b, "k", "ats", "bts", -3600L, 3600L)
    assert(df.select("bid").collect().map(_.getLong(0)).sorted.toSeq == Seq(20L, 21L))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"banded join must be an equi-join:\n$plan")
  }

  test("weightedSample: clamped, monotone in weight, deterministic") {
    val docs = Tables.load(spark, sf, "documents")
    assert(Sampling.weightedSample(docs, col("doc_id"), lit(0)).count() == 0L)
    // Clamp identity: any weight >= 999 selects exactly the 999-permille set
    // (no row is ever kept with certainty by accident).
    assert(Sampling.weightedSample(docs, col("doc_id"), lit(5000))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      == Sampling.weightedSample(docs, col("doc_id"), lit(999))
        .select("doc_id").collect().map(_.getLong(0)).toSet)
    val lo = Sampling.weightedSample(docs, col("doc_id"), lit(200))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val hi = Sampling.weightedSample(docs, col("doc_id"), lit(600))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(lo.subsetOf(hi) && lo.size < hi.size,
      "a row kept at lower weight must be kept at higher weight")
    val again = Sampling.weightedSample(docs, col("doc_id"), lit(200))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == lo)
  }

  test("mixtureSample: no group oversampled, binding group kept whole, deterministic") {
    val docs = Tables.load(spark, sf, "documents")
    val targets = Seq("en" -> 500, "zh" -> 200, "de" -> 150, "es" -> 100, "fr" -> 50)
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val tstar = targets.map { case (l, w) => sizes(l) * 1000L / w }.min
    val kept = Sampling.mixtureSample(docs, col("doc_id"), col("lang"), targets)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    targets.foreach { case (l, w) =>
      val target = w * tstar / 1000L
      assert(kept(l) <= sizes(l), s"$l oversampled")
      // the hash filter realizes the permille rate within small-n noise
      assert(math.abs(kept(l) - target) <= math.max(5L, sizes(l) / 5),
        s"$l kept=${kept(l)} target=$target n=${sizes(l)}")
    }
    val binding = targets.minBy { case (l, w) => sizes(l) * 1000L / w }._1
    assert(kept(binding) >= sizes(binding) - 1,
      s"binding group $binding must be kept (nearly) whole: ${kept(binding)}/${sizes(binding)}")
    val again = Sampling.mixtureSample(docs, col("doc_id"), col("lang"), targets)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == kept)
  }

  test("alphaSample: local integer planner parity; rates flatten the head") {
    val docs = Tables.load(spark, sf, "documents")
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // Local recompute of the exact integer planner.
    val w = sizes.view.mapValues(n => math.sqrt(n.toDouble).toLong).toMap
    val wtot = w.values.sum
    val tstar = sizes.map { case (g, n) => n * wtot / w(g) }.min
    val permille = sizes.map { case (g, n) =>
      g -> (1000L * (w(g) * tstar / wtot) / n).toInt }
    val got = Sampling.alphaCounts(docs).collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    permille.foreach { case (g, p) =>
      assert(got(g)._1 == p, s"$g permille ${got(g)._1} != local $p")
      assert(got(g)._2 <= sizes(g), s"$g oversampled")
    }
    // Flattening: keep RATE decreases with group size — but only
    // assertable across CLEARLY separated sizes: floor(sqrt)
    // quantization legitimately inverts rates between near-equal groups
    // (n=80 → w=8 vs n=82 → w=9 is a 10% rate step the real-valued
    // n^(α−1) does not have). n2 ≥ 2·n1 (n1 ≥ 12) guarantees
    // w2/n2 < w1/n1 despite the floors.
    val bySize = sizes.toSeq.sortBy(_._2)
    var checked = 0
    for ((g1, n1) <- bySize; (g2, n2) <- bySize if n2 >= 2 * n1 && n1 >= 12) {
      checked += 1
      assert(permille(g1) >= permille(g2),
        s"rate must not increase with size: $g1($n1)=${permille(g1)} $g2($n2)=${permille(g2)}")
    }
    assert(checked > 0, "corpus must contain clearly separated group sizes")
  }

  test("quantileAudit: exact quantiles match driver-side sort, sketch flag holds") {
    val docs = Tables.load(spark, sf, "documents")
    val byLang = docs.select("lang", "n_chars").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1).toInt).sorted).toMap
    def pct(v: Array[Int], p: Double): Double = {
      val pos = (v.length - 1) * p
      val lo = pos.toInt
      if (lo == v.length - 1) v(lo)
      else v(lo) + (v(lo + 1) - v(lo)) * (pos - lo)
    }
    graft.ops.TextAnalysis.quantileAudit(docs).collect().foreach { r =>
      val v = byLang(r.getString(0))
      assert(r.getLong(2) == math.round(pct(v, 0.5) * 100), s"p50 ${r.getString(0)}")
      assert(r.getLong(3) == math.round(pct(v, 0.75) * 100), s"p75 ${r.getString(0)}")
      assert(r.getBoolean(4), s"approx_ok must hold for ${r.getString(0)}")
    }
  }

  test("twoStageTopK at full dims with m >= corpus equals exact cosineTopK") {
    val emb = Tables.load(spark, sf, "embeddings")
    val n = emb.count().toInt
    val pred = col("vec_id") < 3
    val exact = Similarity.cosineTopK(emb, pred).collect().map(_.toSeq).toSeq
    val two = Similarity.twoStageTopK(emb, pred, dims = 64, m = n)
      .collect().map(_.toSeq).toSeq
    assert(two == exact, "no-truncation two-stage must reduce to brute force")
  }

  test("twoStageTopK recall is monotone in the candidate budget m") {
    // Exact property, not statistical: the re-ranked top-k keeps exactly
    // the exact-top-k members present in the candidate set (their exact
    // scores beat every non-member), and candidates grow with m — so
    // recall can only rise. (Absolute recall on these ISOTROPIC synthetic
    // vectors is honestly low — prefix dims carry 1/8 of the signal;
    // SCALECHECK.md records the measured number. Matryoshka-trained
    // embeddings are the case the operator exists for.)
    val emb = Tables.load(spark, sf, "embeddings")
    val pred = col("vec_id") < 10
    val exact = Similarity.cosineTopK(emb, pred).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(m: Int): Double = {
      val two = Similarity.twoStageTopK(emb, pred, m = m).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact & two).size.toDouble / exact.size
    }
    val r50 = recall(50)
    val r400 = recall(400)
    assert(r50 > 0.0 && r400 >= r50,
      f"recall must rise with m: m=50 -> $r50%.2f, m=400 -> $r400%.2f")
  }
}
