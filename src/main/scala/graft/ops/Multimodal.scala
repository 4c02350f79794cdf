package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression => CatalystBinary, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.PlanExec.{column, expression}
import org.apache.spark.sql.types._

/** Multimodal (image/audio/"video") columns: opaque `binary` payloads with
  * typed metadata, processed by real distributed Spark plumbing. The CODEC
  * is the stub: payloads use a deterministic fake container (`GIMG`/`GAUD`
  * magic + u16 dims + body — MediaFixture) standing in for JPEG/WAV, and
  * "decode" parses that header. Everything around it — binary schema,
  * header slicing, per-row feature loops, frame sampling, top-k by feature
  * cosine — is the production shape: swap the stub parser for a real codec
  * (e.g. a JNI decoder in mapPartitions) and nothing else changes.
  *
  * Scale notes: payloads never shuffle except where semantically required
  * (feature vectors — 16 floats — shuffle, not bytes); header decode and
  * histograms are one-pass per-row expressions; the similarity join
  * broadcasts only feature vectors.
  */
object Multimodal {

  /** 16-bin byte histogram of a binary column, L1-normalized floats —
    * the stand-in "feature extraction" over raw media bytes. */
  case class ByteHistogram(child: Expression, bins: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(FloatType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[Array[Byte]]
      val counts = new Array[Int](bins)
      var i = 0
      while (i < bytes.length) {
        counts((bytes(i) & 0xff) * bins / 256) += 1
        i += 1
      }
      val n = math.max(bytes.length, 1).toFloat
      val out = new Array[Any](bins)
      var b = 0
      while (b < bins) { out(b) = counts(b) / n; b += 1 }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): ByteHistogram =
      copy(child = c)
  }

  /** Keep every `stride`-th frame of `frameLen` bytes — the "video"
    * frame-sampling primitive, as real binary slicing. */
  case class FrameSample(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(data: Any, fl: Any, st: Any): Any = {
      val bytes = data.asInstanceOf[Array[Byte]]
      val frameLen = fl.asInstanceOf[Int]
      val stride = st.asInstanceOf[Int]
      if (frameLen <= 0 || stride <= 0) return Array.emptyByteArray
      val nFrames = bytes.length / frameLen
      val kept = (nFrames + stride - 1) / stride
      val out = new Array[Byte](kept * frameLen)
      var f = 0
      var o = 0
      while (f < nFrames) {
        if (f % stride == 0) {
          System.arraycopy(bytes, f * frameLen, out, o, frameLen)
          o += frameLen
        }
        f += 1
      }
      out
    }
    override protected def withNewChildrenInternal(a: Expression, b: Expression,
        c: Expression): FrameSample = copy(first = a, second = b, third = c)
  }

  def byteHistogram(c: Column, bins: Int = 16): Column =
    column(ByteHistogram(expression(c), bins))
  def frameSample(data: Column, frameLen: Column, stride: Column): Column =
    column(FrameSample(expression(data), expression(frameLen), expression(stride)))

  /** Header decode of the fixture container — THE STUB POINT. A real
    * pipeline would replace these header reads with an actual image/audio
    * codec; the u16 big-endian fields are sliced with builtin binary
    * functions so the decode itself stays codegen-friendly. */
  def decodeWidth(payload: Column): Column =
    conv(hex(substring(payload, 5, 2)), 16, 10).cast("int")
  def decodeHeight(payload: Column): Column =
    conv(hex(substring(payload, 7, 2)), 16, 10).cast("int")

  /** m1 — decode plumbing: parse header dims from the BYTES and emit them
    * with payload sizes. The oracle reads the independently-written meta
    * struct, cross-validating the binary encode/decode round trip. */
  def decodeDims(media: DataFrame): DataFrame =
    media.where(col("kind") === "image")
      .select(
        col("media_id"),
        col("kind"),
        decodeWidth(col("payload")).as("w"),
        decodeHeight(col("payload")).as("h"),
        length(col("payload")).as("n_bytes"))
      .orderBy("media_id")

  /** m1b — audio header decode: sample rate from the GAUD container's
    * rate/100 u16 field, sample count from the body size. Same
    * cross-validation contract as m1 (oracle reads the meta struct). */
  def decodeAudio(media: DataFrame): DataFrame =
    media.where(col("kind") === "audio")
      .select(
        col("media_id"),
        (conv(hex(substring(col("payload"), 5, 2)), 16, 10).cast("int") * 100).as("rate"),
        (length(col("payload")) - 8).as("n_samples"))
      .orderBy("media_id")

  /** m2 — feature extraction + similarity: histogram features over body
    * bytes, then top-k most-similar images to each of the first 2 by
    * cosine (features shuffle/broadcast — 16 floats — never payloads). */
  def similarByHistogram(media: DataFrame, k: Int = 3): DataFrame = {
    val feats = media.where(col("kind") === "image")
      .select(col("media_id"),
        byteHistogram(expr("substring(payload, 9, 2147483647)")).as("f"))
    val q = feats.where(col("media_id") < 2)
      .select(col("media_id").as("query_id"), col("f").as("qf"))
    val scored = feats.crossJoin(broadcast(q))
      .where(col("media_id") =!= col("query_id"))
      .withColumn("cos", round(graft.functions.Expressions.cosineSim(col("f"), col("qf")), 4) + lit(0d))
    // Bounded top-k aggregate, not a window rank — the scored set never
    // shuffles whole (see TopKByScoreAgg).
    Similarity.rankTopK(scored, "media_id", k)
  }

  /** m3 — frame sampling: treat each image body as `h` frames of `w`
    * bytes, keep every 4th, report real sliced sizes. The oracle derives
    * the same counts from meta arithmetic — byte-level slicing must agree
    * with the header math. */
  def frameSampleStats(media: DataFrame, stride: Int = 4): DataFrame =
    media.where(col("kind") === "image")
      .select(col("media_id"),
        decodeWidth(col("payload")).as("w"),
        decodeHeight(col("payload")).as("h"),
        expr("substring(payload, 9, 2147483647)").as("body"))
      .select(col("media_id"),
        col("h").as("n_frames"),
        length(frameSample(col("body"), col("w"), lit(stride))).as("out_bytes"))
      .orderBy("media_id")
}

/** Deterministic media fixture: images (`GIMG` w h, w*h body bytes) and
  * audio (`GAUD` rate/100 0, body) with an independent `meta` struct —
  * written through ordinary Spark parquet so the binary column plumbing
  * (schema, stats, scan) is the real thing. */
object MediaFixture {

  val DefaultPath = "/root/repo/fixtures/media/media.parquet"

  private def splitmix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  def ensure(spark: SparkSession, path: String = DefaultPath): String = synchronized {
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(path))) return path
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("meta", StructType(Seq(
        StructField("width", IntegerType, nullable = true),
        StructField("height", IntegerType, nullable = true),
        StructField("sample_rate", IntegerType, nullable = true))), nullable = false)))
    val rows: Seq[Row] = (0 until 30).map { id =>
      if (id % 5 == 4) { // audio rows
        val rate = 8000 + (id % 3) * 4000
        val n = 64 + (id * 7) % 64
        val body = Array.tabulate(n)(i => (splitmix(id * 1000L + i) & 0xff).toByte)
        val payload = "GAUD".getBytes ++
          Array(((rate / 100) >> 8).toByte, (rate / 100).toByte, 0.toByte, 0.toByte) ++ body
        Row(id.toLong, "audio", payload, Row(null, null, rate))
      } else {
        val w = 8 + id % 9
        val h = 6 + id % 7
        val body = Array.tabulate(w * h)(i => (splitmix(id * 1000L + i) & 0xff).toByte)
        val payload = "GIMG".getBytes ++
          Array((w >> 8).toByte, w.toByte, (h >> 8).toByte, h.toByte) ++ body
        Row(id.toLong, "image", payload, Row(w, h, null))
      }
    }
    val jrows = new java.util.ArrayList[Row](rows.size)
    rows.foreach(jrows.add)
    val df = spark.createDataFrame(jrows, schema)
    val tmp = path + ".tmpdir"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp)).iterator()
    val found = scala.jdk.CollectionConverters.IteratorHasAsScala(part).asScala
      .find(_.getFileName.toString.startsWith("part-")).get
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path).getParent)
    java.nio.file.Files.move(found, java.nio.file.Paths.get(path))
    val s = java.nio.file.Files.walk(java.nio.file.Paths.get(tmp))
    try scala.jdk.CollectionConverters.IteratorHasAsScala(
      s.sorted(java.util.Comparator.reverseOrder()).iterator()).asScala
      .foreach(java.nio.file.Files.deleteIfExists(_))
    finally s.close()
    path
  }
}
