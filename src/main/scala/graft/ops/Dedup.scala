package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, designed for the
  * 100 TB path: every stage is key-partitioned (hash groupBy / band-key
  * join) — never an all-pairs crossJoin. Declared queries + DuckDB oracles
  * live in DeclaredOps.
  */
object Dedup {

  /** Word 3-shingles of a text column as a distinct array. */
  def shingles(text: Column): Column =
    array_distinct(expr(
      """CASE WHEN size(split(text, ' ')) < 3 THEN array()
        |ELSE transform(sequence(1, size(split(text, ' ')) - 2),
        |  i -> concat_ws(' ', element_at(split(text, ' '), i),
        |                      element_at(split(text, ' '), i + 1),
        |                      element_at(split(text, ' '), i + 2)))
        |END""".stripMargin))

  /** Exact dedup: one representative (min id) per distinct text.
    *
    * Scale: grouping is on the 64-hex sha2 digest, not the text itself, so
    * the shuffle carries ~70 bytes/row regardless of document size. At
    * 100 TB this is the canonical map-side-combined hash aggregate.
    */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(sha2(col("text"), 256).as("h"))
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("copies"))
      .select("doc_id", "copies")
      .orderBy("doc_id")

  /** MinHash+LSH near-duplicate pairs with exact-Jaccard verification.
    *
    * Pipeline (all shuffles key-partitioned):
    *  1. shingle (3-word) → 128-hash MinHash signature, per row, codegen'd
    *     higher-order functions — no UDF;
    *  2. 32 bands × 4 rows: band key = xxhash64 of the band's slice;
    *  3. candidate pairs = self-equi-join on (band, key) — the ONLY place
    *     pairs form, and only within buckets (expected bucket size ≈
    *     collision rate, not N);
    *  4. exact Jaccard on the candidates only, threshold filter.
    *
    * At 100 TB: stage 2's explode is 32 rows/doc; the band join's skew is
    * bounded because identical docs should first be removed by `exact`
    * (the reference pipeline order for web-scale dedup).
    */
  def minhashLsh(docs: DataFrame, threshold: Double = 0.5,
      numHashes: Int = 128, bands: Int = 32): DataFrame = {
    val rowsPerBand = numHashes / bands
    val withSh = docs.select(col("doc_id"), shingles(col("text")).as("s"))
      .where(size(col("s")) > 0)

    val sig = withSh.withColumn("sig", expr(
      s"transform(sequence(0, ${numHashes - 1}), k -> array_min(transform(s, sh -> xxhash64(sh, k))))"))

    val banded = sig.select(col("doc_id"), posexplode(expr(
      s"""transform(sequence(0, ${bands - 1}), b ->
         |  xxhash64(${(0 until rowsPerBand).map(r => s"element_at(sig, b * $rowsPerBand + ${r + 1})").mkString(", ")}))"""
        .stripMargin)).as(Seq("band", "key")))

    val cands = banded.as("x")
      .join(banded.as("y"), Seq("band", "key"))
      .where(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()

    val shA = withSh.select(col("doc_id").as("doc_a"), col("s").as("sa"))
    val shB = withSh.select(col("doc_id").as("doc_b"), col("s").as("sb"))
    cands.join(shA, "doc_a").join(shB, "doc_b")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("double"))
      .withColumn("jacc", col("inter") / (size(col("sa")) + size(col("sb")) - col("inter")))
      .where(col("jacc") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jacc"), 4).as("j"))
      .orderBy("doc_a", "doc_b")
  }

  /** 60-bit SimHash fingerprint per document.
    *
    * Word hash = first 15 hex chars of md5 (portable: the oracle derives
    * the identical integer), bit i of the fingerprint set iff more word
    * hashes have bit i set than clear. Per-row higher-order functions only
    * — embarrassingly parallel, no shuffle at all.
    */
  def simhash(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      expr(
        """aggregate(
          |  transform(sequence(0, 59), i ->
          |    IF(2 * size(filter(
          |         transform(split(text, ' '), w -> CAST(conv(substring(md5(w), 1, 15), 16, 10) AS BIGINT)),
          |         h -> (shiftright(h, i) & 1) = 1)) > size(split(text, ' ')),
          |       shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT))),
          |  CAST(0 AS BIGINT), (acc, x) -> acc + x)""".stripMargin).as("simhash"))
      .orderBy("doc_id")

  /** Top-k documents by 3-shingle Jaccard similarity to a query string —
    * a map-only scan + TakeOrdered; no pairs, no shuffle beyond top-k. */
  def ngramJaccardTopK(docs: DataFrame, query: String, k: Int = 20): DataFrame = {
    val qs = query.split(" ").sliding(3).map(_.mkString(" ")).toSeq.distinct
    val qCol = array(qs.map(lit): _*)
    docs.select(col("doc_id"), shingles(col("text")).as("s"))
      .withColumn("inter", size(array_intersect(col("s"), qCol)).cast("double"))
      .withColumn("jacc", col("inter") / (size(col("s")) + qs.size - col("inter")))
      .where(col("jacc") > 0)
      .orderBy(col("jacc").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), round(col("jacc"), 4).as("j"))
  }
}
