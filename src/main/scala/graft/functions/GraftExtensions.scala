package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration of the engine's native expressions, so
  * `/query` users (and spark.sql) can call them directly:
  *
  *   SELECT jaccard_sim(word_shingles(a), word_shingles(b)) ...
  *   SELECT cosine_sim(embedding, other) ...
  *   SELECT simhash60(md5_word_hashes(text)) ...
  *
  * Two entry points: `GraftExtensions` for
  * `spark.sql.extensions=graft.functions.GraftExtensions` at session
  * build (the standard cluster deployment hook), and `registerAll` for
  * an existing session (used by the server and tests).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.definitions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  import Expressions._

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions.Expressions", null, name, usage, "")

  private def one(f: Expression => Expression): Seq[Expression] => Expression =
    es => f(es.head)
  private def two(f: (Expression, Expression) => Expression): Seq[Expression] => Expression =
    es => f(es(0), es(1))

  val definitions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("word_shingles",
      info("word_shingles", "word_shingles(text) - distinct 3-word shingles"),
      one(WordShingles(_, 3))),
    ("jaccard_sim",
      info("jaccard_sim", "jaccard_sim(a, b) - set Jaccard of two string arrays"),
      two(JaccardSim(_, _))),
    ("minhash_sig",
      info("minhash_sig", "minhash_sig(shingles) - 64-hash MinHash signature"),
      one(MinHashSig(_, 64))),
    ("simhash60",
      info("simhash60", "simhash60(hashes) - 60-bit SimHash of word-hash array"),
      one(SimHash60(_))),
    ("md5_word_hashes",
      info("md5_word_hashes", "md5_word_hashes(text) - portable 60-bit md5 word hashes"),
      one(Md5WordHashes(_))),
    ("cosine_sim",
      info("cosine_sim", "cosine_sim(a, b) - double cosine of two float arrays"),
      two(CosineSim(_, _))),
    ("rolling_fp",
      info("rolling_fp", "rolling_fp(hashes) - order-sensitive rolling fingerprint"),
      one(RollingFp(_))),
    ("sorted_intersect_size",
      info("sorted_intersect_size",
        "sorted_intersect_size(a, b) - |a ∩ b| of two sorted distinct string arrays"),
      two(SortedIntersectSize(_, _))),
    ("word_tfs",
      info("word_tfs", "word_tfs(text) - array<struct<token,tf>> per-row term frequencies"),
      one(WordTfs(_))),
    ("xor_minhash_sig",
      info("xor_minhash_sig",
        "xor_minhash_sig(shingles) - portable 64-hash xor-MinHash signature"),
      one(XorMinHashSig(_, 64))),
    ("media_header",
      info("media_header",
        "media_header(payload) - parsed JPEG/PNG/WAV/GIMG/GAUD header struct"),
      one(graft.ops.Multimodal.MediaHeader(_))),
    ("byte_histogram",
      info("byte_histogram", "byte_histogram(bytes) - 16-bin L1-normalized byte histogram"),
      one(graft.ops.Multimodal.ByteHistogram(_, 16))),
    ("l2sq",
      info("l2sq", "l2sq(a, b) - squared L2 distance of two float/double arrays"),
      two(L2Sq(_, _))),
    ("pq_score16",
      info("pq_score16",
        "pq_score16(codes, lut) - PQ asymmetric score over 16-centroid subspace LUTs"),
      two(PqScore(_, _, 16))))

  /** Register into an already-built session (idempotent). */
  def registerAll(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    definitions.foreach { case (name, i, builder) =>
      registry.registerFunction(FunctionIdentifier(name), i, builder)
    }
  }
}
