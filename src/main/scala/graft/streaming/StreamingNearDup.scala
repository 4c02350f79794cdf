package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming MinHash-LSH near-duplicate detection — the continuous-crawl
  * form of `ops.Dedup.minhashLsh` (d2): as documents stream in, each is
  * checked against the recent corpus and every verified near-dup PAIR is
  * emitted as soon as the second member arrives.
  *
  * Shape: the map-only stages are the batch operator's own expressions
  * (WordShingles → MinHashSig → banded xxhash64 keys), then the bucket
  * join becomes per-(band, key) STATE — `flatMapGroupsWithState` keeps
  * the bucket's recent members (id, event time, shingle set) and exact-
  * Jaccard-verifies each arrival against them, the same candidates-then-
  * verify contract as batch LSH.
  *
  * State discipline (the d2-at-100TB story): state is partitioned by the
  * band key like any streaming aggregate; each bucket holds at most
  * `maxBucket` members (LSH buckets are collision-sized by construction —
  * SCALECHECK measures max 4 at sf0.1 — so the cap only guards
  * adversarial skew, where it degrades recall, not correctness), and an
  * event-time timeout evicts buckets idle past the horizon. As with
  * `StreamingDedup`, a near-dup arriving after the horizon is not
  * flagged — bounded state is the trade; unbounded exactness is the
  * batch operator's job over the accumulated WAL.
  *
  * Output is at-least-once per pair: two documents sharing k bands emit
  * the pair from each of the k buckets (the batch operator's
  * `.distinct()` has no cross-key form in per-bucket state). Downstream
  * consumers dedup on (doc_a, doc_b) — exactly what they must already do
  * for at-least-once replay after a restart.
  */
object StreamingNearDup {

  final case class BandedDoc(doc_id: Long, ts: java.sql.Timestamp,
      band: Int, key: Long, s: Seq[String])
  final case class Member(docId: Long, tsMs: Long, s: Seq[String])
  final case class BucketState(members: List[Member])
  final case class NearDupPair(doc_a: Long, doc_b: Long, j_x10k: Long)

  /** Exact Jaccard on distinct shingle sequences — same arithmetic as the
    * batch verifier (`JaccardSim`): integer set sizes, one double
    * division. Raw value (threshold test matches batch's unrounded
    * filter); emit via the x10k half-up rounding of StableAgg.scaledLong. */
  private def jaccardRaw(a: Seq[String], b: Seq[String]): Double = {
    val sa = a.toSet; val sb = b.toSet
    val inter = sa.intersect(sb).size
    val union = sa.size + sb.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  private def x10k(j: Double): Long =
    BigDecimal(j * 10000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /** `docs` must be a streaming DataFrame with (doc_id: Long, ts:
    * Timestamp, text: String). Emits verified pairs (doc_a < doc_b,
    * j ≥ threshold), at-least-once across shared bands. */
  def pairs(docs: DataFrame, threshold: Double = 0.5, numHashes: Int = 64,
      bands: Int = 16, horizonMs: Long = 600000L,
      maxBucket: Int = 128): Dataset[NearDupPair] = {
    import docs.sparkSession.implicits._
    val rowsPerBand = numHashes / bands
    val banded = docs
      .select(col("doc_id"), col("ts"),
        graft.ops.Dedup.shingles(col("text")).as("s"))
      .where(size(col("s")) > 0)
      .withColumn("sig", graft.functions.Expressions.minhashSig(col("s"), numHashes))
      .select(col("doc_id"), col("ts"), col("s"), posexplode(expr(
        s"""transform(sequence(0, ${bands - 1}), b ->
           |  xxhash64(${(0 until rowsPerBand)
                .map(r => s"element_at(sig, b * $rowsPerBand + ${r + 1})")
                .mkString(", ")}))""".stripMargin)).as(Seq("band", "key")))
      .select(col("doc_id"), col("ts"), col("band"), col("key"), col("s"))
      .withWatermark("ts", s"$horizonMs milliseconds")
      .as[BandedDoc]

    banded
      .groupByKey(d => (d.band, d.key))
      .flatMapGroupsWithState[BucketState, NearDupPair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: (Int, Long), batch: Iterator[BandedDoc], state: GroupState[BucketState]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var members = state.getOption.map(_.members).getOrElse(Nil)
            val out = scala.collection.mutable.ListBuffer.empty[NearDupPair]
            var maxMs = members.headOption.map(_.tsMs).getOrElse(0L)
            batch.toSeq.sortBy(d => (d.ts.getTime, d.doc_id)).foreach { d =>
              if (!members.exists(_.docId == d.doc_id)) {
                members.foreach { m =>
                  val j = jaccardRaw(m.s, d.s)
                  if (j >= threshold)
                    out += NearDupPair(math.min(m.docId, d.doc_id),
                      math.max(m.docId, d.doc_id), x10k(j))
                }
                // Newest-first; the cap drops the OLDEST members (closest
                // to eviction anyway).
                members = (Member(d.doc_id, d.ts.getTime, d.s) :: members)
                  .take(maxBucket)
              }
              maxMs = math.max(maxMs, d.ts.getTime)
            }
            state.update(BucketState(members))
            // flatMapGroupsWithState does NOT auto-drop late input: a
            // batch of only pre-watermark rows would compute a timeout
            // at-or-before the watermark, which setTimeoutTimestamp
            // rejects. Clamp to watermark+1 (evict at the next trigger —
            // the members are already past the horizon anyway).
            state.setTimeoutTimestamp(
              math.max(maxMs + horizonMs, state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }
}
