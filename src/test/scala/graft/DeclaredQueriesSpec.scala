package graft

import graft.query.Declared

class DeclaredQueriesSpec extends GraftSuite {

  test("every declared query has an oracle") {
    // Round 4 closed the last three rows-only gaps (d8: portable
    // xor-MinHash, t6: sketch-audit shape, m2: hex-derived histograms).
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing == Set.empty, s"queries without oracle SQL: $missing")
  }

  test("representative queries are AQE-invariant (cluster runs re-plan at runtime)") {
    // The bench runs AQE off (latency choice at toy scale); a 1000-executor
    // deployment runs it ON, where runtime re-planning (partition
    // coalescing, skew splits, join demotions) must not change RESULTS.
    // Cover each plan family: banded self-join + reuse, window+lag chain,
    // bounded top-k aggregate, two-phase prefix sum, salted two-phase agg,
    // prefix-filtered join.
    val names = Seq("d2_minhash_lsh", "d10_jaccard_join", "q20_sessionize",
      "e1_cosine_topk", "s4_sequence_pack", "q22_salted_agg")
    def run(): Map[String, Seq[String]] =
      names.map(n => n ->
        SparkEntry.queries(n)(spark, sf).collect().map(_.toString).toSeq).toMap
    // Pin BOTH regimes explicitly: the shared session is created at
    // Spark 4's AQE-on default, so an un-pinned "off" run would compare
    // on-vs-on; and restore the ORIGINAL value so this test doesn't
    // leak a conf change into whichever suite runs next.
    val orig = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val off = run()
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      val on = run()
      names.foreach(n => assert(on(n) == off(n), s"$n diverges under AQE"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", orig)
  }

  test("q1 filter+order+limit: descending totalprice, all status O") {
    val rows = Declared.q1(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val prices = rows.map(_.getDouble(1))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
    assert(prices.forall(_ > 100000))
  }

  test("q2 LIKE: all names contain 'red'") {
    val rows = Declared.q2(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(1).contains("red")))
  }

  test("q3 scalar aggregates: cnt equals table count") {
    val r = Declared.q3(spark, sf).collect().head
    val n = graft.core.Tables.load(spark, sf, "lineitem").count()
    assert(r.getLong(0) == n)
    assert(!r.isNullAt(1) && !r.isNullAt(2) && !r.isNullAt(3) && !r.isNullAt(4))
  }

  test("q4 group by: group counts sum to table count") {
    val rows = Declared.q4(spark, sf).collect()
    val n = graft.core.Tables.load(spark, sf, "lineitem").count()
    assert(rows.map(_.getLong(2)).sum == n)
  }

  test("q5 time range: strict upper bound preserved") {
    val df = Declared.q5(spark, sf)
    assert(df.columns.toSeq == Seq("event_id", "event_type"))
    assert(df.count() > 0)
  }

  test("q6 IN/BETWEEN returns sorted keys") {
    val keys = Declared.q6(spark, sf).collect().map(_.getLong(0))
    assert(keys.sameElements(keys.sorted))
  }

  test("q7 string functions") {
    val r = Declared.q7(spark, sf).collect().head
    assert(r.getString(1) == r.getString(1).toUpperCase)
    assert(r.getString(3).length <= 8)
  }

  test("q8 date_trunc group: months are first-of-month dates") {
    val rows = Declared.q8(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getDate(0).toLocalDate.getDayOfMonth == 1))
  }

  test("q9 case/math bands") {
    val rows = Declared.q9(spark, sf).collect()
    assert(rows.map(_.getString(2)).toSet.subsetOf(Set("HI", "LO")))
  }

  test("q10 offset skips first 10 keys") {
    val all = Declared.q10Offset(spark, sf).collect().map(_.getLong(0))
    val first20 = graft.core.Tables.load(spark, sf, "orders")
      .select("o_orderkey").orderBy("o_orderkey").limit(20)
      .collect().map(_.getLong(0))
    assert(all.sameElements(first20.drop(10)))
  }

  test("scan re-layout preserves rows exactly and actually splits the scan") {
    import org.apache.spark.sql.functions._
    // sf0.01 lineitem (~1 MB) crosses the re-layout threshold; the raw
    // driver file is ONE row group (one scan task).
    val dir = "/root/testdata/sf0.01"
    val relayed = graft.core.Tables.load(spark, dir, "lineitem")
    val raw = spark.read.parquet(s"$dir/lineitem.parquet")
    assert(relayed.rdd.getNumPartitions > 1, "re-layout must split the scan")
    assert(raw.rdd.getNumPartitions == 1, "driver file is a single row group")
    assert(relayed.schema == raw.schema, "schema must be unchanged")
    // Row MULTISET equality via an order-free aggregate of full-row hashes
    // (summed as decimal — a long sum of 60k raw xxhash64 values overflows).
    def sig(df: org.apache.spark.sql.DataFrame) =
      df.select(xxhash64(df.columns.map(col): _*).as("h"))
        .agg(count(lit(1)), sum(col("h").cast("decimal(38,0)")), countDistinct("h"))
        .collect()(0).toSeq
    assert(sig(relayed) == sig(raw), "re-layout must preserve the exact row multiset")
  }

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q29 as-of join matches a brute-force non-equi join") {
    import org.apache.spark.sql.functions._
    val out = graft.query.DeclaredExt.q29(spark, sf).collect()
    assert(out.nonEmpty)
    val ev = graft.core.Tables.load(spark, sf, "events")
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.where(col("event_type") === "view")
      .groupBy("user_id", "ts").agg(max("value").as("vv"))
    // O(clicks × views-per-user) ground truth — the naive shape q29 avoids.
    val brute = clicks.as("c")
      .join(views.as("v"),
        col("c.user_id") === col("v.user_id") && col("v.ts") <= col("c.ts"), "left")
      .groupBy(col("c.event_id"))
      .agg(max(when(col("v.ts").isNotNull, struct(col("v.ts"), col("vv")))).as("m"))
      .select(col("event_id"), col("m.ts").as("view_ts"), col("m.vv").as("view_value"))
      .orderBy("event_id").limit(200)
      .collect()
    assert(out.map(r => (r.getLong(0), r.get(3), r.get(4))).toSeq ==
      brute.map(r => (r.getLong(0), r.get(1), r.get(2))).toSeq)
    // At least one click must actually carry a matched view.
    assert(out.exists(r => !r.isNullAt(3)))
  }

  test("q30 bucketed range join equals the naive non-equi join") {
    import org.apache.spark.sql.functions._
    val out = graft.query.DeclaredExt.q30(spark, sf).collect()
    assert(out.nonEmpty)
    val ev = graft.core.Tables.load(spark, sf, "events")
    val e = ev.where(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts").cast("long").as("sec"))
    val v = ev.where(col("event_type") === "view")
      .select(col("user_id").as("vu"), col("ts").cast("long").as("vsec"))
    val naive = e.join(v,
        col("user_id") === col("vu") &&
          col("vsec") >= col("sec") - 600 && col("vsec") < col("sec"), "left")
      .groupBy("event_id").agg(count(col("vsec")).as("n_prior"))
      .orderBy("event_id").limit(200).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      naive.map(r => (r.getLong(0), r.getLong(1))).toSeq)
    assert(out.exists(_.getLong(1) > 0), "some error must have prior views")
  }

  test("q31 pivot: one row per user, cells cover the user's full value total") {
    import org.apache.spark.sql.functions._
    val rows = graft.query.DeclaredExt.q31(spark, sf).collect()
    val ev = graft.core.Tables.load(spark, sf, "events")
    assert(rows.length == ev.select("user_id").distinct().count())
    // Cells are non-negative micros integers and, per user, sum back to the
    // unpivoted scaled total EXACTLY (both sides integer-exact).
    val totals = ev.groupBy("user_id")
      .agg(sum((col("value").cast("decimal(18,6)") * lit(1000000)).cast("long")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val cells = (1 to 5).map(r.getLong)
      cells.foreach(c => assert(c >= 0))
      assert(cells.sum == totals(r.getLong(0)))
    }
  }

  test("q32 cube: every grouping set present, grand total equals table count") {
    val out = graft.query.DeclaredExt.q32(spark, sf).collect()
    val total = graft.core.Tables.load(spark, sf, "orders").count()
    val grand = out.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1 && grand(0).getLong(2) == total)
    assert(out.filter(r => !r.isNullAt(0) && r.isNullAt(1)).map(_.getLong(2)).sum == total)
    assert(out.filter(r => r.isNullAt(0) && !r.isNullAt(1)).map(_.getLong(2)).sum == total)
    assert(out.filter(r => !r.isNullAt(0) && !r.isNullAt(1)).map(_.getLong(2)).sum == total)
  }
}
