package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: language-ID
  * (marker-word heuristic), quality scoring, token counting, and a
  * rolling-hash document fingerprint. All per-row higher-order-function /
  * regexp expressions — fully codegen'd, embarrassingly parallel, no
  * shuffle beyond the final ORDER BY of the declared queries.
  */
object TextAnalysis {

  private def wordCount(text: Column, word: String): Column =
    size(filter(split(text, " "), w => w === word))

  /** Marker-stopword language guess. The heuristic itself is the operator
    * under test (the corpus is synthetic); the oracle mirrors the exact
    * same decision tree. */
  def langGuess(text: Column): Column = {
    import graft.functions.Expressions.countWordsIn
    when(countWordsIn(text, Seq("the")) >= 1, "en")
      .when(countWordsIn(text, Seq("der", "die", "das")) >= 1, "de")
      .when(countWordsIn(text, Seq("el", "la")) >= 1, "es")
      .otherwise("und")
  }

  def langid(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), langGuess(col("text")).as("lang_guess"))
      .orderBy("doc_id")

  /** Quality stats + score: token count, mean token length, punctuation
    * count, stopword ratio. Score = weighted mix, the standard shape of a
    * web-corpus quality filter. */
  def quality(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val nTok = size(toks)
    val meanLen = (length(col("text")) - nTok + 1).cast("double") / nTok
    val punct = length(col("text")) - length(regexp_replace(col("text"), "[.,;:!?]", ""))
    // Native one-pass count — same integer as summing per-word
    // size(filter(...)) counts, which the oracle still spells out.
    val stop = graft.functions.Expressions.countWordsIn(col("text"), Seq("the", "a", "of"))
    val stopRatio = stop.cast("double") / nTok
    val score =
      when(nTok < 5, 0.0).otherwise(
        least(lit(1.0), nTok.cast("double") / 100) * 0.5 +
        when(meanLen.between(3.0, 8.0), 0.3).otherwise(0.0) +
        least(lit(0.2), stopRatio * 2))
    docs.select(
      col("doc_id"), nTok.as("n_tokens"),
      round(meanLen, 4).as("mean_tok_len"),
      punct.as("n_punct"),
      round(stopRatio, 4).as("stop_ratio"),
      round(score, 4).as("quality"))
      .orderBy("doc_id")
  }

  /** Token counting: whitespace tokens, alphanumeric regex tokens, and a
    * chars/4 BPE-style estimate. */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(split(col("text"), " ")).as("ws_tokens"),
      size(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).as("re_tokens"),
      ceil(length(col("text")).cast("double") / 4).cast("long").as("bpe_est"))
      .orderBy("doc_id")

  /** Column profiling — the dataset-health snapshot a curation pipeline
    * runs first: row count, exact NDVs, null counts, ranges. One pass,
    * partial aggregates map-side. */
  def profile(docs: DataFrame): DataFrame =
    docs.agg(
      count(lit(1)).as("n"),
      countDistinct(col("lang")).as("ndv_lang"),
      countDistinct(col("source")).as("ndv_source"),
      sum(when(col("text").isNull, 1).otherwise(0)).as("null_text"),
      min(col("n_chars")).as("min_chars"),
      max(col("n_chars")).as("max_chars"),
      // Order-independent avg (StableAgg): exact decimal sum / count, one
      // double division, then round — reproducible at any parallelism.
      graft.functions.StableAgg.davg(col("n_chars")).as("avg_chars"))

  /** Approximate-distinct profile via HLL sketches — the scale path for
    * NDV when exact countDistinct's shuffle is too wide. No SQL oracle
    * (engine-specific sketch); declared rows-only. */
  def hllProfile(docs: DataFrame): DataFrame =
    docs.groupBy(col("lang"))
      .agg(
        approx_count_distinct(col("text"), 0.02).as("approx_docs"),
        approx_count_distinct(col("source"), 0.02).as("approx_sources"))
      .orderBy("lang")

  /** Rolling-hash fingerprint: fold (acc*31 + h_w mod 1000003) mod 1e9+7
    * over the word sequence, with the portable md5-60-bit word hash. Order
    * sensitive (unlike simhash) — a reordering changes the fingerprint. */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      graft.functions.Expressions.rollingFp(
        graft.functions.Expressions.md5WordHashes(col("text"))).as("fp"))
      .orderBy("doc_id")
}
