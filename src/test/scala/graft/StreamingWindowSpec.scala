package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming windowed aggregation with watermarks (SURVEY §2.7 extension):
  * the same window() operator the batch q21 declares, run as a real
  * Structured Streaming query with event-time state and late-data
  * discipline. */
class StreamingWindowSpec extends GraftSuite {

  test("tumbling-window streaming agg with watermark drops late data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Timestamp, Double)]
    val windowed = input.toDF().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("v")), 2).as("sv"))
      .select(col("window.start").as("ws"), col("cnt"), col("sv"))

    val q = windowed.writeStream
      .format("memory").queryName("win_agg").outputMode("append").start()
    try {
      def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
      // Hour 10: three rows; hour 11: two rows.
      input.addData((ts(10, 0), 1.0), (ts(10, 20), 2.0), (ts(10, 40), 3.0))
      input.addData((ts(11, 5), 10.0), (ts(11, 10), 20.0))
      q.processAllAvailable()
      // Advance watermark far past hour 11 → both windows close and emit.
      input.addData((ts(14, 0), 0.5))
      q.processAllAvailable()
      // This event is 3+ hours late — behind the watermark — and must be
      // dropped, not reopen hour 10's window.
      input.addData((ts(10, 50), 99.0))
      q.processAllAvailable()
      input.addData((ts(15, 0), 0.5))
      q.processAllAvailable()

      val rows = spark.table("win_agg").orderBy("ws").collect()
      val byHour = rows.map(r => r.getTimestamp(0).toString -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(byHour("2024-01-01 10:00:00.0") == ((3L, 6.0)),
        s"hour 10 must close with 3 rows and no late 99.0: $byHour")
      assert(byHour("2024-01-01 11:00:00.0") == ((2L, 30.0)))
    } finally q.stop()
  }

  test("batch q20 gaps-and-islands agrees with Spark's native session_window") {
    val events = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val native = events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select("user_id", "n")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length).toMap
    val ours = query.DeclaredExt.q20(spark, "/root/testdata/sf0.001")
      .select("user_id", "n")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length).toMap
    // q20 LIMITs to 200 sessions; every session it emits must appear in
    // the native operator's output with the same multiplicity.
    ours.foreach { case (k, cnt) =>
      assert(native.getOrElse(k, 0) >= cnt, s"session $k missing from session_window")
    }
    assert(ours.nonEmpty)
  }

  test("flatMapGroupsWithState sessionization matches the batch gaps-and-islands operator") {
    import spark.implicits._
    import graft.streaming.StreamingSessionize
    import graft.streaming.StreamingSessionize.SessEvent
    implicit val sqlCtx = spark.sqlContext

    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val input = MemoryStream[SessEvent]
    val q = StreamingSessionize.sessions(input.toDS())
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      // User 1: two sessions (10:00-10:20, then a 40-min gap to 11:00).
      // User 2: one session.
      input.addData(
        SessEvent(1, ts(10, 0), 1.0), SessEvent(1, ts(10, 20), 2.0),
        SessEvent(1, ts(11, 0), 4.0), SessEvent(2, ts(10, 5), 7.0))
      q.processAllAvailable()
      // Advance the watermark far past every open session's close point:
      // the idle sessions flush via the event-time TIMEOUT, no per-user
      // event required.
      input.addData(SessEvent(99, ts(15, 0), 0.0))
      q.processAllAvailable()
      input.addData(SessEvent(99, ts(16, 0), 0.0))
      q.processAllAvailable()

      val got = spark.table("sess")
        .select("user_id", "start_ms", "n", "sv").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val expect = Set(
        (1L, ts(10, 0).getTime, 2L, 3.0),  // 10:00 + 10:20 — same session
        (1L, ts(11, 0).getTime, 1L, 4.0),  // 40-min gap -> new session
        (2L, ts(10, 5).getTime, 1L, 7.0))
      assert(expect.subsetOf(got), s"got $got")

      // Cross-check: the batch q20 gaps-and-islands on the same events
      // yields the same (user, n, sv) sessions.
      val batch = Seq(
        (1L, ts(10, 0), 1.0), (1L, ts(10, 20), 2.0), (1L, ts(11, 0), 4.0),
        (2L, ts(10, 5), 7.0)).toDF("user_id", "ts", "value")
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts")
      val sessions = batch
        .withColumn("prev", lag(col("ts"), 1).over(w))
        .withColumn("new_s", when(col("prev").isNull ||
          col("ts").cast("long") - col("prev").cast("long") > 1800, 1).otherwise(0))
        .withColumn("sid", sum(col("new_s")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sid")
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSet
      assert(sessions == expect.map(e => (e._1, e._3, e._4)),
        s"batch formulation disagrees: $sessions")
    } finally q.stop()
  }

  test("streaming exact dedup drops in-horizon duplicates and evicts old state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Timestamp, String)]
    val out = streaming.StreamingDedup.dedup(
      input.toDF().toDF("ts", "text"), "10 minutes")
    val q = out.writeStream
      .format("memory").queryName("sdedup").outputMode("append").start()
    try {
      def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
      // Same text three times inside the horizon -> first instance only.
      input.addData((ts(10, 0), "alpha"), (ts(10, 1), "alpha"), (ts(10, 2), "beta"))
      q.processAllAvailable()
      input.addData((ts(10, 5), "alpha"))
      q.processAllAvailable()
      val first = spark.table("sdedup").collect()
        .map(r => (r.getTimestamp(0), r.getString(1)))
      assert(first.count(_._2 == "alpha") == 1, s"dup must drop: ${first.toSeq}")
      assert(first.count(_._2 == "beta") == 1)
      // Push the watermark far past 10:xx (eviction), then repeat "alpha":
      // the digest state is gone, so the late duplicate is re-admitted —
      // the documented bounded-state trade.
      input.addData((ts(14, 0), "gamma"))
      q.processAllAvailable()
      input.addData((ts(14, 30), "alpha"))
      q.processAllAvailable()
      val after = spark.table("sdedup").collect().map(_.getString(1))
      assert(after.count(_ == "alpha") == 2,
        s"post-eviction duplicate should re-admit: ${after.toSeq}")
    } finally q.stop()
  }

  test("streaming near-dup pairs match batch minhashLsh on the same corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docsB = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("doc_id", "text")
    val batchPairs = graft.ops.Dedup.minhashLsh(docsB, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val rows = docsB.collect().map(r => (r.getLong(0), r.getString(1)))
    val base = Timestamp.valueOf("2024-01-01 10:00:00").getTime
    val input = MemoryStream[(Long, Timestamp, String)]
    val out = streaming.StreamingNearDup.pairs(
      input.toDF().toDF("doc_id", "ts", "text"))
    val q = out.writeStream
      .format("memory").queryName("sneardup").outputMode("append").start()
    try {
      // Three micro-batches, all inside the horizon: pairs whose members
      // arrive in DIFFERENT batches must still be found (bucket state).
      rows.grouped(200).zipWithIndex.foreach { case (g, i) =>
        input.addData(g.map(x => (x._1, new Timestamp(base + i * 1000L), x._2)).toSeq)
        q.processAllAvailable()
      }
      // Set-compare: cross-band emissions are the documented
      // at-least-once duplication, collapsed by the same (a, b) dedup any
      // at-least-once consumer needs.
      val got = spark.table("sneardup").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == batchPairs,
        s"streaming/batch mismatch: extra=${got -- batchPairs} missing=${batchPairs -- got}")
      assert(batchPairs.nonEmpty, "corpus must contain near-dups for this test to bite")
    } finally q.stop()
  }

  test("streaming near-dup evicts idle buckets at the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val text = "the quick brown fox jumps over the lazy dog again and again today"
    val input = MemoryStream[(Long, Timestamp, String)]
    val out = streaming.StreamingNearDup.pairs(
      input.toDF().toDF("doc_id", "ts", "text"))
    val q = out.writeStream
      .format("memory").queryName("sneardup_evict").outputMode("append").start()
    try {
      def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
      // In-horizon duplicate pair -> found.
      input.addData((1L, ts(10, 0), text)); q.processAllAvailable()
      input.addData((2L, ts(10, 1), text)); q.processAllAvailable()
      val inHorizon = spark.table("sneardup_evict").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(inHorizon == Set((1L, 2L)), s"got $inHorizon")
      // Advance the watermark far past the horizon (idle buckets evict),
      // then a third copy arrives: no state left to pair against.
      input.addData((50L, ts(14, 0), "completely unrelated filler words here"))
      q.processAllAvailable()
      input.addData((3L, ts(14, 30), text)); q.processAllAvailable()
      val after = spark.table("sneardup_evict").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(after == Set((1L, 2L)),
        s"post-eviction arrival must not pair with evicted members: $after")
    } finally q.stop()
  }

  test("late (pre-watermark) rows cannot kill stateful streaming queries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // Near-dup: a late doc opens a fresh bucket whose natural timeout is
    // far behind the watermark — setTimeoutTimestamp would reject it
    // without the watermark clamp and fail the whole query.
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val input = MemoryStream[(Long, Timestamp, String)]
    val out = streaming.StreamingNearDup.pairs(
      input.toDF().toDF("doc_id", "ts", "text"))
    val q = out.writeStream
      .format("memory").queryName("slate").outputMode("append").start()
    try {
      def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
      input.addData((1L, ts(14, 0), "completely unrelated filler words here")); q.processAllAvailable()
      input.addData((2L, ts(10, 5), text)); q.processAllAvailable() // hours late
      input.addData((3L, ts(14, 1), "still unrelated other filler words")); q.processAllAvailable()
      assert(q.exception.isEmpty, s"late row killed the query: ${q.exception}")
    } finally q.stop()

    // Sessionize: same shape — a late event's session timeout lands
    // behind the watermark.
    val sin = MemoryStream[streaming.StreamingSessionize.SessEvent]
    val sq = streaming.StreamingSessionize.sessions(sin.toDS()).writeStream
      .format("memory").queryName("slate2").outputMode("append").start()
    try {
      def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
      sin.addData(streaming.StreamingSessionize.SessEvent(1L, ts(14, 0), 1.0)); sq.processAllAvailable()
      sin.addData(streaming.StreamingSessionize.SessEvent(2L, ts(10, 0), 2.0)); sq.processAllAvailable()
      sin.addData(streaming.StreamingSessionize.SessEvent(1L, ts(14, 5), 3.0)); sq.processAllAvailable()
      assert(sq.exception.isEmpty, s"late row killed sessionize: ${sq.exception}")
    } finally sq.stop()
  }

  test("streaming decontamination (stream-static join) matches batch d11") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val all = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("doc_id", "text")
    val evalDocs = all.where(col("doc_id") % 11 === 0)
    val batch = graft.ops.Dedup
      .decontaminate(all, col("doc_id") % 11 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val corpus = all.where(col("doc_id") % 11 =!= 0)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val base = Timestamp.valueOf("2024-01-01 10:00:00")
    val input = MemoryStream[(Long, Timestamp, String)]
    val out = streaming.StreamingDecontaminate.flagged(
      input.toDF().toDF("doc_id", "ts", "text"), evalDocs)
    val q = out.writeStream
      .format("memory").queryName("sdecon").outputMode("append").start()
    try {
      // All docs inside one 10-min window, streamed in two batches, then
      // a late far-future row advances the watermark and closes it.
      corpus.grouped(250).foreach { g =>
        input.addData(g.map(x => (x._1, base, x._2)).toSeq)
        q.processAllAvailable()
      }
      // Needs >= 3 words: the shingle explode sits before the watermark
      // node, so a shingle-less row would never advance the watermark.
      input.addData((999999L,
        Timestamp.valueOf("2024-01-01 12:00:00"), "w x y z late row"))
      q.processAllAvailable()
      val got = spark.table("sdecon").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == batch,
        s"stream/batch mismatch: extra=${got -- batch} missing=${batch -- got}")
      assert(batch.nonEmpty, "corpus must contain contaminated docs")
    } finally q.stop()
  }

  test("streaming bloom dedup (stream-static anti join) matches batch d17 exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // Same corpus split as the declared d17 row: stream = crawl slice,
    // static = digest index over the rest (overlapping so dups exist).
    val all = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("doc_id", "text")
    val crawl = all.where(col("doc_id") % 3 === 1)
    val index = graft.ops.Dedup.digestIndex(
      all.where(col("doc_id") % 3 =!= 1 || col("doc_id") < 50))
    val batch = graft.ops.Dedup.bloomDedupAgainstIndex(crawl, index)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    val rows = crawl.collect().map(r => (r.getLong(0), r.getString(1)))
    val base = Timestamp.valueOf("2024-01-01 10:00:00")
    val input = MemoryStream[(Long, Timestamp, String)]
    val out = streaming.StreamingBloomDedup.dedup(
      input.toDF().toDF("doc_id", "ts", "text"), index)
    val q = out.writeStream
      .format("memory").queryName("sbloom").outputMode("append").start()
    try {
      // STATELESS contract: rows emit batch-by-batch with no watermark
      // advancement needed — the operator carries no streaming state.
      rows.grouped(200).foreach { g =>
        input.addData(g.map(x => (x._1, base, x._2)).toSeq)
        q.processAllAvailable()
      }
      val got = spark.table("sbloom").collect().map(_.getLong(0)).toSet
      assert(got == batch,
        s"stream/batch mismatch: extra=${got -- batch} missing=${batch -- got}")
      assert(batch.nonEmpty && batch.size < rows.length,
        "fixture must exercise both kept and dropped docs")
    } finally q.stop()
  }

  test("streaming near-dup vs static index matches batch d20 survivors") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val all = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("doc_id", "text")
    val crawl = all.where(col("doc_id") % 4 === 2)
    val index = all.where(col("doc_id") % 4 =!= 2)
    val batch = graft.ops.Dedup.nearDupAgainstIndex(crawl, index)
      .collect().map(_.getLong(0)).toSet

    val rows = crawl.collect().map(r => (r.getLong(0), r.getString(1)))
    val base = Timestamp.valueOf("2024-01-01 10:00:00")
    val input = MemoryStream[(Long, Timestamp, String)]
    val out = streaming.StreamingNearDupIndex.survivors(
      input.toDF().toDF("doc_id", "ts", "text"), index)
    val q = out.writeStream
      .format("memory").queryName("sneardupidx").outputMode("append").start()
    try {
      rows.grouped(60).foreach { g =>
        input.addData(g.map(x => (x._1, base, x._2)).toSeq)
        q.processAllAvailable()
      }
      // Far-future row closes the 10:00 window (it rides the survivor
      // branch directly, so no shingle requirement to advance the
      // watermark); its own window stays open and never emits.
      input.addData((999999L,
        Timestamp.valueOf("2024-01-01 12:00:00"), "late row"))
      q.processAllAvailable()
      val got = spark.table("sneardupidx").collect().map(_.getLong(1)).toSet
      assert(got == batch,
        s"stream/batch mismatch: extra=${got -- batch} missing=${batch -- got}")
      assert(batch.nonEmpty && batch.size < rows.length,
        "fixture must exercise both survivors and flagged docs")
    } finally q.stop()
  }

  test("streaming boilerplate scrub matches batch d18 against the same chunk table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val all = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("doc_id", "text")
    // The static scrub table is the batch-built artifact over the SAME
    // corpus, so cleaned text must be IDENTICAL row-for-row; only the
    // emission time is window-governed.
    val boiler = graft.ops.Dedup.boilerplateChunks(all, 20, 1)
    val batch = graft.ops.Dedup.boilerplateScrub(all, 20, 1)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet

    val rows = all.collect().map(r => (r.getLong(0), r.getString(1)))
    val base = Timestamp.valueOf("2024-01-01 10:00:00")
    val input = MemoryStream[(Long, Timestamp, String)]
    val out = streaming.StreamingBoilerplate.scrub(
      input.toDF().toDF("doc_id", "ts", "text"), boiler)
    val q = out.writeStream
      .format("memory").queryName("sboiler").outputMode("append").start()
    try {
      // All docs inside one 10-min window, streamed in batches, then a
      // far-future row advances the watermark and closes the window.
      rows.grouped(500).foreach { g =>
        input.addData(g.map(x => (x._1, base, x._2)).toSeq)
        q.processAllAvailable()
      }
      input.addData((999999L,
        Timestamp.valueOf("2024-01-01 12:00:00"), "late watermark row"))
      q.processAllAvailable()
      val got = spark.table("sboiler").collect()
        .map(r => (r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4))).toSet
      assert(got == batch, s"stream/batch mismatch: extra sample=" +
        s"${(got -- batch).take(2)} missing sample=${(batch -- got).take(2)}")
      assert(batch.nonEmpty, "corpus must contain boilerplate for this test to bite")
    } finally q.stop()
  }

  test("composed nightly-crawl pipeline (d17+d20+d18, two nights) matches the batch composition") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.Dedup

    val all = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("doc_id", "text")

    // The batch ground truth: the SAME three stages composed window-free
    // over the same static artifacts.
    def batchNight(crawl: org.apache.spark.sql.DataFrame,
        indexDocs: org.apache.spark.sql.DataFrame,
        boiler: org.apache.spark.sql.DataFrame) = {
      val fresh = Dedup.dedupAgainstIndex(crawl, Dedup.digestIndex(indexDocs))
      val kept = fresh.join(
        Dedup.nearDupAgainstIndex(fresh, indexDocs, ordered = false), Seq("doc_id"))
      val keep = col("is_boiler").isNull
      Dedup.chunked(kept, 20)
        .join(boiler.select(col("h"), lit(1).as("is_boiler")), Seq("h"), "left")
        .groupBy("doc_id")
        .agg(
          array_join(transform(array_sort(collect_list(
              when(keep, struct(col("chunk_idx"), col("chunk"))))),
            x => x("chunk")), " ").as("clean_text"),
          sum(when(keep, 1L).otherwise(0L)).as("kept_chunks"),
          sum(when(keep, 0L).otherwise(1L)).as("dropped_chunks"))
        .where(col("kept_chunks") > 0)
    }

    def streamNight(crawl: org.apache.spark.sql.DataFrame,
        indexDocs: org.apache.spark.sql.DataFrame,
        boiler: org.apache.spark.sql.DataFrame, name: String) = {
      val rows = crawl.collect().map(r => (r.getLong(0), r.getString(1)))
      val base = Timestamp.valueOf("2024-01-01 10:00:00")
      val input = MemoryStream[(Long, Timestamp, String)]
      val out = streaming.StreamingNightlyCrawl.pipeline(
        input.toDF().toDF("doc_id", "ts", "text"), indexDocs, boiler)
      val q = out.writeStream
        .format("memory").queryName(name).outputMode("append").start()
      try {
        rows.grouped(40).foreach { g =>
          input.addData(g.map(x => (x._1, base, x._2)).toSeq)
          q.processAllAvailable()
        }
        // Far-future doc advances the watermark and closes the 10:00
        // window; its own window never emits.
        input.addData((999999L,
          Timestamp.valueOf("2024-01-01 12:00:00"), "late watermark row"))
        q.processAllAvailable()
        spark.table(name).collect()
          .map(r => (r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
          .toSet
      } finally q.stop()
    }

    // Night 1: crawl slice A against the historical corpus.
    val corpus0 = all.where(col("doc_id") % 4 =!= 2)
    val night1 = all.where(col("doc_id") % 8 === 2)
    val boiler1 = Dedup.boilerplateChunks(corpus0, 20, 1).localCheckpoint(true)
    val want1 = batchNight(night1, corpus0, boiler1).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val got1 = streamNight(night1, corpus0, boiler1, "nightly1")
    assert(got1 == want1, s"night 1 mismatch: extra=${(got1 -- want1).take(2)} " +
      s"missing=${(want1 -- got1).take(2)}")
    assert(want1.nonEmpty && want1.size < night1.count(),
      "night 1 must exercise both accepted and dropped docs")

    // Index advance: accepted docs are INGESTED (scrubbed text) and all
    // three artifacts rebuild over the accumulated corpus; night 2
    // restarts against them (the StreamingBloomDedup discipline).
    val accepted1 = spark.createDataFrame(
      want1.toSeq.map(t => (t._1, t._2))).toDF("doc_id", "text")
    val corpus1 = corpus0.unionByName(accepted1).localCheckpoint(true)
    val night2 = all.where(col("doc_id") % 8 === 6)
    val boiler2 = Dedup.boilerplateChunks(corpus1, 20, 1).localCheckpoint(true)
    val want2 = batchNight(night2, corpus1, boiler2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val got2 = streamNight(night2, corpus1, boiler2, "nightly2")
    assert(got2 == want2, s"night 2 mismatch: extra=${(got2 -- want2).take(2)} " +
      s"missing=${(want2 -- got2).take(2)}")
    assert(want2.nonEmpty && want2.size < night2.count(),
      "night 2 must exercise both accepted and dropped docs")
  }

  test("gated nightly-crawl pipeline (scrub + gopher gate) matches the batch composition") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.{Dedup, TextAnalysis}

    val all = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("doc_id", "text")
    val corpus = all.where(col("doc_id") % 4 =!= 2)
    // Crawl slice plus three synthetic docs that force each gate to bite
    // deterministically: PII to scrub (passes gopher), a too-short doc,
    // and a bigram-repetition doc.
    val synth = Seq(
      (900001L, "please reach analyst one at alice@corp-example.com or " +
        "call 555-123-4567 about the quarterly vector window results today"),
      (900002L, "tiny doc"),
      (900003L, Seq.fill(40)("buy now").mkString(" ")))
      .toDF("doc_id", "text")
    val crawl = all.where(col("doc_id") % 8 === 2).unionByName(synth)
    val boiler = Dedup.boilerplateChunks(corpus, 20, 1).localCheckpoint(true)

    // Batch ground truth: the un-gated three-stage composition, then the
    // SAME shared gate definitions (piiScrubCol + withGopherSignals).
    val fresh = Dedup.dedupAgainstIndex(crawl, Dedup.digestIndex(corpus))
    val kept = fresh.join(
      Dedup.nearDupAgainstIndex(fresh, corpus, ordered = false), Seq("doc_id"))
    val keepChunk = col("is_boiler").isNull
    val scrubbed = Dedup.chunked(kept, 20)
      .join(boiler.select(col("h"), lit(1).as("is_boiler")), Seq("h"), "left")
      .groupBy("doc_id")
      .agg(
        array_join(transform(array_sort(collect_list(
            when(keepChunk, struct(col("chunk_idx"), col("chunk"))))),
          x => x("chunk")), " ").as("clean_text"),
        sum(when(keepChunk, 1L).otherwise(0L)).as("kept_chunks"),
        sum(when(keepChunk, 0L).otherwise(1L)).as("dropped_chunks"))
      .where(col("kept_chunks") > 0)
      .withColumn("clean_text", TextAnalysis.piiScrubCol(col("clean_text")))
    val want = TextAnalysis.withGopherSignals(scrubbed, "clean_text")
      .where(col("keep") === 1).drop("keep")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSet
    val preGate = scrubbed.count()

    val rows = crawl.collect().map(r => (r.getLong(0), r.getString(1)))
    val base = Timestamp.valueOf("2024-01-01 10:00:00")
    val input = MemoryStream[(Long, Timestamp, String)]
    val out = streaming.StreamingNightlyCrawl.pipelineWithGates(
      input.toDF().toDF("doc_id", "ts", "text"), corpus, boiler)
    val q = out.writeStream
      .format("memory").queryName("gatednightly").outputMode("append").start()
    val got = try {
      rows.grouped(40).foreach { g =>
        input.addData(g.map(x => (x._1, base, x._2)).toSeq)
        q.processAllAvailable()
      }
      input.addData((999999L,
        Timestamp.valueOf("2024-01-01 12:00:00"), "late watermark row"))
      q.processAllAvailable()
      spark.table("gatednightly").collect()
        .map(r => (r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))
        .toSet
    } finally q.stop()
    assert(got == want, s"gated mismatch: extra=${(got -- want).take(2)} " +
      s"missing=${(want -- got).take(2)}")
    // Every gate must have fired: the PII doc survives WITH tags
    // replaced, and the gopher gate rejected at least the two synthetics.
    val pii = got.find(_._1 == 900001L)
    assert(pii.exists(t => t._2.contains("<EMAIL>") && t._2.contains("<PHONE>")),
      s"PII doc must survive scrubbed: $pii")
    assert(!got.exists(_._1 == 900002L) && !got.exists(_._1 == 900003L),
      "short and repetitive synthetics must be gate-rejected")
    assert(want.size < preGate, "the gopher gate must reject some docs")
  }
}
