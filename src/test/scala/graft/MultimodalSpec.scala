package graft

import java.nio.file.Files

import graft.core.{Storage, TimeUtils}
import graft.ingest.BufferedAppender
import graft.ops.{DeclaredMedia, MediaFixture, Multimodal}
import graft.streaming.StreamingLpIngest

/** Multimodal binary plumbing + streaming ingest. */
class MultimodalSpec extends GraftSuite {

  private lazy val media = spark.read.parquet(MediaFixture.ensure(spark))

  test("binary header decode agrees with the independent meta struct") {
    val decoded = Multimodal.decodeDims(media).collect()
    val meta = media.where("kind = 'image'")
      .selectExpr("media_id", "meta.format", "meta.width", "meta.height", "length(payload)")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4))))
      .toMap
    assert(decoded.nonEmpty)
    // All three image formats present, each byte-parsed to the meta truth.
    assert(decoded.map(_.getString(1)).toSet == Set("gimg", "jpeg", "png"))
    decoded.foreach { r =>
      val (fmt, w, h, len) = meta(r.getLong(0))
      assert(r.getString(r.fieldIndex("format")) == fmt)
      assert(r.getInt(r.fieldIndex("w")) == w)
      assert(r.getInt(r.fieldIndex("h")) == h)
      assert(r.getInt(r.fieldIndex("n_bytes")) == len)
      if (fmt == "gimg") assert(len == 8 + w * h, "GIMG payload = 8-byte header + w*h body")
    }
  }

  test("audio header decode walks RIFF chunks and the GAUD container") {
    val decoded = Multimodal.decodeAudio(media).collect()
    val meta = media.where("kind = 'audio'")
      .selectExpr("media_id", "meta.format", "meta.sample_rate", "meta.n_samples")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    assert(decoded.map(_.getString(1)).toSet == Set("gaud", "wav"))
    decoded.foreach { r =>
      val (fmt, rate, n) = meta(r.getLong(0))
      assert(r.getString(r.fieldIndex("format")) == fmt)
      assert(r.getInt(r.fieldIndex("rate")) == rate)
      assert(r.getLong(r.fieldIndex("n_samples")) == n.toLong)
    }
  }

  test("histogram features are normalized and similarity is ranked") {
    val rows = Multimodal.similarByHistogram(media).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val cs = rs.map(_.getLong(2)) // cos_x10k
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
      assert(cs.forall(c => c >= -10001 && c <= 10001))
    }
    val feats = media.where("kind = 'image'")
      .where(Multimodal.mediaHeader(org.apache.spark.sql.functions.col("payload"))
        .getField("format") === "gimg")
      .select(Multimodal.byteHistogram(
        org.apache.spark.sql.functions.expr("substring(payload, 9, 2147483647)")))
      .collect()
    feats.foreach { r =>
      val sum = r.getSeq[Float](0).sum
      assert(math.abs(sum - 1.0f) < 1e-4, s"histogram L1 norm $sum")
    }
  }

  test("frame sampling slices real bytes consistent with meta arithmetic") {
    val rows = Multimodal.frameSampleStats(media).collect()
    assert(rows.nonEmpty)
    val meta = media.where("kind = 'image' AND meta.format = 'gimg'")
      .selectExpr("media_id", "meta.width", "meta.height")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    rows.foreach { r =>
      val (w, h) = meta(r.getLong(0))
      assert(r.getInt(r.fieldIndex("n_frames")) == h)
      assert(r.getInt(r.fieldIndex("out_bytes")) == ((h + 3) / 4) * w)
    }
  }

  test("phash pairs: banded join equals a local all-pairs recompute") {
    val rows = media
      .where(org.apache.spark.sql.functions.expr(
        "kind = 'image' AND meta.format = 'gimg'"))
      .select("media_id", "payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1))
    def phash(bytes: Array[Byte]): Int = {
      val body = bytes.drop(8)
      val counts = new Array[Int](16)
      body.foreach(b => counts((b & 0xff) >>> 4) += 1)
      (0 until 16).foldLeft(0) { (h, b) =>
        if (counts(b) * 16 > body.length) h | (1 << (15 - b)) else h
      }
    }
    val ph = rows.map { case (id, bytes) => id -> phash(bytes) }.sortBy(_._1)
    val expected = for {
      (a, pa) <- ph; (b, pb) <- ph if a < b
      h = Integer.bitCount(pa ^ pb) if h <= 3
    } yield (a, b, h.toLong)
    val got = Multimodal.phashPairs(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == expected.toSeq,
      s"banded pairs ${got.toSeq} != all-pairs ${expected.toSeq}")
    assert(got.nonEmpty, "fixture must contain at least one phash near-pair")
    // No all-pairs in the plan: pairs may only form inside nibble buckets.
    val plan = Multimodal.phashPairs(media).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("media queries and oracles stay in sync") {
    assert(DeclaredMedia.queries.keySet -- DeclaredMedia.oracleSql.keySet == Set.empty)
  }

  test("pgm decode: real pixel stats match a local raster recompute") {
    import org.apache.spark.sql.functions.col
    val pgm = spark.read.parquet(graft.ops.PgmFixture.ensure(spark))
    val out = Multimodal.decodePgm(pgm).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getInt(5), r.getInt(6), r.getLong(7), r.getLong(8))))
      .toMap
    val metas = pgm.selectExpr("media_id", "meta.width", "meta.height").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(metas.nonEmpty && out.size == metas.length,
      "every fixture row must decode (headers are all valid P5)")
    metas.foreach { case (id, w, h) =>
      // Ground truth straight from the fixture's raster construction.
      val px = graft.ops.PgmFixture.raster(id, w * h).map(_ & 0xff)
      val (gw, gh, gmx, gn, gmin, gmax, gsum, gmean) = out(id)
      assert((gw, gh, gmx) == ((w, h, 255)), s"dims parse for $id")
      assert(gn == w.toLong * h)
      assert(gmin == px.min && gmax == px.max, s"min/max for $id")
      assert(gsum == px.map(_.toLong).sum, s"sum for $id")
      assert(gmean == gsum * 100 / (w.toLong * h))
    }
    // At least one header carries a comment line; the parser must have
    // skipped it (the fixture writes them for id % 3 == 1).
    assert(metas.exists(_._1 % 3 == 1), "fixture must exercise comments")
    // Malformed payloads decode to NULL, never a partial/garbage row.
    import spark.implicits._
    val bad = Seq(
      "P6\n2 2\n255\nAAAA".getBytes("US-ASCII"),      // wrong magic
      "P5\n3 3\n255\nAB".getBytes("US-ASCII"),        // truncated raster
      "P5\n0 4\n255\n".getBytes("US-ASCII"),          // zero width
      "P5\n2 2\n70000\nAAAA".getBytes("US-ASCII"),    // maxval > 255
      Array[Byte]())                                   // empty
      .toDF("payload")
    val decoded = bad
      .select(Multimodal.pgmStats(col("payload")).as("st"))
      .collect()
    assert(decoded.forall(_.isNullAt(0)), "malformed PGM must yield null")
    val resized = bad
      .select(Multimodal.pgmResizeStats(col("payload")).as("st"))
      .collect()
    assert(resized.forall(_.isNullAt(0)), "malformed PGM resize must yield null")
  }

  test("pgm resize: every output pixel matches a local 2x box-downsample") {
    val pgm = spark.read.parquet(graft.ops.PgmFixture.ensure(spark))
    val out = Multimodal.resizePgm(pgm).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3),
        r.getInt(4), r.getInt(5), r.getLong(6), r.getLong(7))))
      .toMap
    val metas = pgm.selectExpr("media_id", "meta.width", "meta.height").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(out.size == metas.length)
    metas.foreach { case (id, w, h) =>
      val px = graft.ops.PgmFixture.raster(id, w * h).map(_ & 0xff)
      val (ow, oh) = (w / 2, h / 2)
      // Ground-truth resize straight from the raster construction.
      val r = for (y <- 0 until oh; x <- 0 until ow) yield
        (px(2 * y * w + 2 * x) + px(2 * y * w + 2 * x + 1) +
         px((2 * y + 1) * w + 2 * x) + px((2 * y + 1) * w + 2 * x + 1)) / 4
      val fp = r.foldLeft(0L)((a, v) => (a * 31 + v) % 1000000007L)
      assert(out(id) == ((ow, oh, ow.toLong * oh, r.min, r.max,
        r.map(_.toLong).sum, fp)), s"resize mismatch for $id")
    }
  }

  test("ppm decode: per-channel stats and luma fp match a local raster recompute") {
    import org.apache.spark.sql.functions.col
    val ppm = spark.read.parquet(graft.ops.PpmFixture.ensure(spark))
    val out = Multimodal.decodePpm(ppm).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getInt(8), r.getInt(9), r.getLong(10))))
      .toMap
    val metas = ppm.selectExpr("media_id", "meta.width", "meta.height").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(metas.nonEmpty && out.size == metas.length,
      "every fixture row must decode (headers are all valid P6)")
    metas.foreach { case (id, w, h) =>
      // Ground truth straight from the fixture's raster construction.
      val px = graft.ops.PpmFixture.raster(id, w * h * 3).map(_ & 0xff)
      val r = (0 until w * h).map(i => px(3 * i))
      val g = (0 until w * h).map(i => px(3 * i + 1))
      val b = (0 until w * h).map(i => px(3 * i + 2))
      val luma = (0 until w * h).map(i =>
        (299 * px(3 * i) + 587 * px(3 * i + 1) + 114 * px(3 * i + 2)) / 1000)
      val fp = luma.foldLeft(0L)((a, v) => (a * 31 + v) % 1000000007L)
      assert(out(id) == ((w, h, 255, w.toLong * h,
        r.map(_.toLong).sum, g.map(_.toLong).sum, b.map(_.toLong).sum,
        px.min, px.max, fp)), s"ppm decode mismatch for $id")
    }
    assert(metas.exists(_._1 % 3 == 1), "fixture must exercise comments")
    // Malformed payloads decode to NULL — including a VALID P5 payload
    // (wrong magic for the P6 parser) and a raster long enough for
    // grayscale but truncated for 3 channels.
    import spark.implicits._
    val bad = Seq(
      "P5\n2 2\n255\nAAAA".getBytes("US-ASCII"),          // P5 magic
      "P6\n2 2\n255\nAAAA".getBytes("US-ASCII"),          // 1-channel-length raster
      "P6\n0 4\n255\n".getBytes("US-ASCII"),              // zero width
      "P6\n2 2\n70000\n".getBytes("US-ASCII") ++ Array.fill(12)('A'.toByte),
      Array[Byte]())
      .toDF("payload")
    val decoded = bad
      .select(Multimodal.ppmStats(col("payload")).as("st"))
      .collect()
    assert(decoded.forall(_.isNullAt(0)), "malformed PPM must yield null")
  }

  test("wav decode: sample stats and fp match a local PCM recompute") {
    import org.apache.spark.sql.functions.col
    val wav = spark.read.parquet(graft.ops.WavFixture.ensure(spark))
    val out = Multimodal.decodeWav(wav).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getInt(6), r.getInt(7),
        r.getLong(8), r.getLong(9))))
      .toMap
    val metas = wav
      .selectExpr("media_id", "meta.channels", "meta.sample_rate", "meta.n_frames")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(metas.nonEmpty && out.size == metas.length,
      "every fixture row must decode (all payloads are valid PCM16)")
    metas.foreach { case (id, c, rate, f) =>
      // Ground truth straight from the fixture's PCM construction.
      val bytes = graft.ops.WavFixture.pcm(id, c * 2 * f)
      val v = (0 until c * f).map(i =>
        ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt)
      val v0 = (0 until f).map(j => v(c * j))
      val ch1 = if (c == 2) (0 until f).map(j => v(c * j + 1)).map(_.toLong).sum else 0L
      val zc = (1 until f).count(j => (v0(j) < 0) != (v0(j - 1) < 0)).toLong
      val fp = v.foldLeft(0L)((a, s) => (a * 31 + (s + 32768)) % 1000000007L)
      assert(out(id) == ((c, rate, f.toLong, v0.map(_.toLong).sum, ch1,
        v.min, v.max, zc, fp)), s"wav decode mismatch for $id")
    }
    // All four chunk layouts (pad-byte LIST before fmt, LIST between fmt
    // and data, bare, double-extras) must be present in the fixture.
    assert((0 until 4).forall(k => metas.exists(_._1 % 4 == k)),
      "fixture must exercise every chunk layout")
    // Malformed payloads decode to NULL — wrong magic, float fmt, 8-bit,
    // inconsistent blockAlign, truncated data, and a valid GAUD payload.
    import spark.implicits._
    def le16(x: Int) = Array(x.toByte, (x >> 8).toByte)
    def le32(x: Int) = Array(x.toByte, (x >> 8).toByte, (x >> 16).toByte, (x >> 24).toByte)
    def riff(fmtTag: Int, ch: Int, bits: Int, blockAlign: Int, dataLen: Int,
        dataBytes: Int): Array[Byte] = {
      val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(fmtTag) ++
        le16(ch) ++ le32(8000) ++ le32(8000 * blockAlign) ++ le16(blockAlign) ++ le16(bits)
      val data = "data".getBytes("US-ASCII") ++ le32(dataLen) ++ Array.fill(dataBytes)(7.toByte)
      val c = "WAVE".getBytes("US-ASCII") ++ fmt ++ data
      "RIFF".getBytes("US-ASCII") ++ le32(c.length) ++ c
    }
    val bad = Seq(
      riff(3, 1, 16, 2, 8, 8).patch(0, "RIFX".getBytes("US-ASCII"), 4), // bad magic
      riff(3, 1, 16, 2, 8, 8),                                         // float fmt
      riff(1, 1, 8, 1, 8, 8),                                          // 8-bit
      riff(1, 2, 16, 2, 8, 8),                                         // blockAlign != ch*2
      riff(1, 1, 16, 2, 64, 8),                                        // data overshoots
      "GAUD".getBytes("US-ASCII") ++ Array.fill(12)(1.toByte),         // other container
      Array[Byte]())
      .toDF("payload")
    val decoded = bad
      .select(Multimodal.wavStats(col("payload")).as("st"))
      .collect()
    assert(decoded.forall(_.isNullAt(0)), "malformed WAV must yield null")
  }

  test("wav resample: every output sample matches a local downmix+decimate") {
    val wav = spark.read.parquet(graft.ops.WavFixture.ensure(spark))
    val out = Multimodal.resampleWav(wav).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getInt(5), r.getLong(6))))
      .toMap
    val metas = wav
      .selectExpr("media_id", "meta.channels", "meta.sample_rate", "meta.n_frames")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(out.size == metas.length, "every fixture row has >= 2 frames")
    metas.foreach { case (id, c, rate, f) =>
      val bytes = graft.ops.WavFixture.pcm(id, c * 2 * f)
      val v = (0 until c * f).map(i =>
        ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt)
      // Truncating mean downmix, then truncating mean 2x decimation —
      // exactly the declared contract (odd tail frame dropped).
      val mono = (0 until f).map(j => if (c == 1) v(j) else (v(2 * j) + v(2 * j + 1)) / 2)
      val o = (0 until f / 2).map(j => (mono(2 * j) + mono(2 * j + 1)) / 2)
      val fp = o.foldLeft(0L)((a, s) => (a * 31 + (s + 32768)) % 1000000007L)
      assert(out(id) == ((rate / 2, (f / 2).toLong, o.map(_.toLong).sum,
        o.min, o.max, fp)), s"wav resample mismatch for $id")
    }
    // Odd frame counts must drop the tail frame (fixture has f = 63, 31, 97).
    assert(metas.exists(_._4 % 2 == 1), "fixture must exercise odd frame counts")
  }

  test("wav parser property: arbitrary chunk layouts parse like a reference walk") {
    // Adversarial layout sweep (the P5/P6 comment-position discipline for
    // RIFF): unknown chunks of arbitrary odd/even sizes at every position
    // around fmt/data, deterministic from the case index.
    def le16(x: Int) = Array(x.toByte, (x >> 8).toByte)
    def le32(x: Int) = Array(x.toByte, (x >> 8).toByte, (x >> 16).toByte, (x >> 24).toByte)
    def junk(sz: Int, tagName: String): Array[Byte] =
      tagName.getBytes("US-ASCII") ++ le32(sz) ++
        Array.fill(sz + (sz & 1))(0x5a.toByte) // writer pads odd sizes
    for (k <- 0 until 64) {
      val ch = 1 + k % 2
      val frames = 2 + k % 7
      val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(ch) ++
        le32(8000) ++ le32(8000 * ch * 2) ++ le16(ch * 2) ++ le16(16)
      val pcm = Array.tabulate(ch * 2 * frames)(i => ((k * 31 + i * 7) & 0xff).toByte)
      val data = "data".getBytes("US-ASCII") ++ le32(ch * 2 * frames) ++ pcm
      val pre = if (k % 4 >= 2) junk(1 + k % 5, "JUNK") else Array.emptyByteArray
      val mid = if (k % 2 == 1) junk(k % 6, "LIST") else Array.emptyByteArray
      val post = if (k % 8 >= 4) junk(3, "fact") else Array.emptyByteArray
      val content = "WAVE".getBytes("US-ASCII") ++ pre ++ fmt ++ mid ++ data ++ post
      val payload = "RIFF".getBytes("US-ASCII") ++ le32(content.length) ++ content
      // Decode through the SQL-exposed expression; pin channel count,
      // rate, frame count AND the position-sensitive fingerprint against
      // a reference recompute from the raw pcm construction.
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val st = Seq(payload).toDF("payload")
        .select(Multimodal.wavStats(col("payload")).as("st"))
        .selectExpr("st.channels", "st.sample_rate", "st.n_frames", "st.fp")
        .collect()(0)
      assert(!st.isNullAt(0), s"layout $k must parse")
      val v = (0 until ch * frames).map(i =>
        ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toInt)
      val fp = v.foldLeft(0L)((a, s) => (a * 31 + (s + 32768)) % 1000000007L)
      assert((st.getInt(0), st.getInt(1), st.getLong(2), st.getLong(3)) ==
        ((ch, 8000, frames.toLong, fp)), s"layout $k decode mismatch")
    }
  }

  test("png decode: pixel stats match a local raw-raster recompute") {
    val png = spark.read.parquet(graft.ops.PngFixture.ensure(spark))
    def statsOf(raw: Array[Byte], w: Int, h: Int, c: Int) = {
      val v = raw.map(_ & 0xff)
      val fp = (0 until w * h).foldLeft(0L) { (a, p) =>
        val luma = if (c == 3)
          (299 * v(3 * p) + 587 * v(3 * p + 1) + 114 * v(3 * p + 2)) / 1000
        else v(p)
        (a * 31 + luma) % 1000000007L
      }
      (w, h, c, w.toLong * h, v.min, v.max, v.map(_.toLong).sum, fp)
    }
    val out = Multimodal.decodePng(png).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getInt(5), r.getInt(6), r.getLong(7), r.getLong(8))))
      .toMap
    val metas = png.selectExpr("media_id", "meta.width", "meta.height", "meta.channels")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(metas.nonEmpty && out.size == metas.length,
      "every fixture row must decode (all payloads are valid PNG)")
    metas.foreach { case (id, w, h, c) =>
      val raw = graft.ops.PngFixture.raster(id, w * h * c)
      assert(out(id) == statsOf(raw, w, h, c), s"png decode mismatch for $id")
    }
    // Both color types present; every image tall enough to cycle all
    // five filter types (h >= 5 by construction).
    assert(metas.exists(_._4 == 1) && metas.exists(_._4 == 3))
    assert(metas.forall(_._3 >= 5), "every image must exercise all five filters")
  }

  test("png filter reconstruction: hand-pinned vectors for all five filter types") {
    // The fixture's encoder and the expression's decoder are inverse
    // implementations; this pins the DECODER against BY-HAND filtered
    // bytes (PNG spec arithmetic worked on paper), so a shared
    // encoder/decoder bug cannot silently pass.
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val raw = Array[Int](
      10, 20, 30, // filter 0 (None)
      13, 24, 35, // filter 1 (Sub):  13, 11, 11
      20, 30, 40, // filter 2 (Up):    7,  6,  5
      25, 36, 47, // filter 3 (Avg):  15,  9,  9
      30, 40, 50 // filter 4 (Paeth):  5,  4,  3
    ).map(_.toByte)
    val filtered = Array[Int](
      0, 10, 20, 30,
      1, 13, 11, 11,
      2, 7, 6, 5,
      3, 15, 9, 9,
      4, 5, 4, 3).map(_.toByte)
    val d = new java.util.zip.Deflater()
    d.setInput(filtered); d.finish()
    val buf = new Array[Byte](256)
    val z = new java.io.ByteArrayOutputStream()
    while (!d.finished()) z.write(buf, 0, d.deflate(buf))
    d.end()
    def u32be(v: Long) =
      Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    val payload =
      Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte,
        0x0d.toByte, 0x0a.toByte, 0x1a.toByte, 0x0a.toByte) ++
        graft.ops.PngFixture.chunk("IHDR", u32be(3L) ++ u32be(5L) ++
          Array[Byte](8, 0, 0, 0, 0)) ++
        graft.ops.PngFixture.chunk("IDAT", z.toByteArray) ++
        graft.ops.PngFixture.chunk("IEND", Array.empty)
    val st = Seq(payload).toDF("payload")
      .select(Multimodal.pngStats(col("payload")).as("st"))
      .selectExpr("st.width", "st.height", "st.channels", "st.px_sum", "st.luma_fp")
      .collect()(0)
    assert(!st.isNullAt(0), "hand-built payload must parse")
    val v = raw.map(_ & 0xff)
    val fp = v.foldLeft(0L)((a, x) => (a * 31 + x) % 1000000007L)
    assert((st.getInt(0), st.getInt(1), st.getInt(2), st.getLong(3), st.getLong(4)) ==
      ((3, 5, 1, v.map(_.toLong).sum, fp)), "hand-pinned filter vectors mismatch")
  }

  test("png chunk-layout property: arbitrary IDAT splits decode identically; malformed yields null") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 64-case layout sweep (the RIFF-property discipline on PNG): IDAT
    // split sizes from 1 byte up, rotating phase, both color types,
    // ancillary chunks at varying positions via the id residues.
    for (k <- 0 until 64) {
      val id = k.toLong
      val w = 2 + k % 5
      val h = 5 + k % 4
      val c = if (k % 2 == 0) 3 else 1
      val raw = graft.ops.PngFixture.raster(id * 101L + 3L, w * h * c)
      val payload = graft.ops.PngFixture.payloadFrom(id, w, h, c, raw,
        Seq(1 + k % 9, 3, 17).drop(k % 3) ++ Seq(1 + k % 9, 3, 17).take(k % 3))
      val st = Seq(payload).toDF("payload")
        .select(Multimodal.pngStats(col("payload")).as("st"))
        .selectExpr("st.width", "st.height", "st.channels", "st.px_sum", "st.luma_fp")
        .collect()(0)
      assert(!st.isNullAt(0), s"layout $k must parse")
      val v = raw.map(_ & 0xff)
      val fp = (0 until w * h).foldLeft(0L) { (a, p) =>
        val luma = if (c == 3)
          (299 * v(3 * p) + 587 * v(3 * p + 1) + 114 * v(3 * p + 2)) / 1000
        else v(p)
        (a * 31 + luma) % 1000000007L
      }
      assert((st.getInt(0), st.getInt(1), st.getInt(2), st.getLong(3), st.getLong(4)) ==
        ((w, h, c, v.map(_.toLong).sum, fp)), s"layout $k decode mismatch")
    }
    // Malformed sweep: every failure mode yields NULL, never a partial
    // or wrapped decode.
    def u32be(v: Long) =
      Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    val sig = Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte,
      0x0d.toByte, 0x0a.toByte, 0x1a.toByte, 0x0a.toByte)
    val good = graft.ops.PngFixture.payload(0L, 4, 5, 1)
    def ihdr(depth: Int, color: Int, interlace: Int) =
      graft.ops.PngFixture.chunk("IHDR", u32be(4L) ++ u32be(5L) ++
        Array(depth.toByte, color.toByte, 0.toByte, 0.toByte, interlace.toByte))
    val goodTail = good.drop(8 + 25) // after sig + IHDR chunk (12 + 13)
    val bad: Seq[Array[Byte]] = Seq(
      good.patch(1, "QNG".getBytes("US-ASCII"), 3), // bad signature
      good.patch(good.length - 1,
        Array((good.last ^ 0x7f).toByte), 1), // corrupted CRC (IEND)
      good.dropRight(7), // truncated mid-chunk
      sig ++ ihdr(16, 0, 0) ++ goodTail, // 16-bit depth
      sig ++ ihdr(8, 3, 0) ++ goodTail, // palette color type
      sig ++ ihdr(8, 0, 1) ++ goodTail, // Adam7 interlace
      // declared chunk length near 2^32: the Long-guarded walk must
      // fail cleanly, never wrap to a negative offset
      sig ++ u32be(0xfffffff0L) ++ "IDAT".getBytes("US-ASCII") ++ u32be(0L),
      // height patched without re-CRC: the IHDR CRC check must catch it
      good.patch(8 + 8 + 4, u32be(6L), 4),
      // CRC-VALID IHDR that promises 6 rows over a 5-row deflate
      // stream: the inflate-size check must catch it
      sig ++ graft.ops.PngFixture.chunk("IHDR", u32be(4L) ++ u32be(6L) ++
        Array[Byte](8, 0, 0, 0, 0)) ++ goodTail,
      Array[Byte]())
    val decoded = Seq(bad: _*).toDF("payload")
      .select(Multimodal.pngStats(col("payload")).as("st"))
      .collect()
    assert(decoded.forall(_.isNullAt(0)), "malformed PNG must yield null")
    // Filter byte 5 specifically: rebuild a stream whose first scanline
    // declares an undefined filter type.
    val filtBad = {
      val f = graft.ops.PngFixture.filterRaster(
        graft.ops.PngFixture.raster(1L, 3 * 5), 3, 5, 1, 1L)
      f(0) = 5.toByte
      val d2 = new java.util.zip.Deflater()
      d2.setInput(f); d2.finish()
      val buf = new Array[Byte](256)
      val z2 = new java.io.ByteArrayOutputStream()
      while (!d2.finished()) z2.write(buf, 0, d2.deflate(buf))
      d2.end()
      sig ++ graft.ops.PngFixture.chunk("IHDR", u32be(3L) ++ u32be(5L) ++
        Array[Byte](8, 0, 0, 0, 0)) ++
        graft.ops.PngFixture.chunk("IDAT", z2.toByteArray) ++
        graft.ops.PngFixture.chunk("IEND", Array.empty)
    }
    val fb = Seq(filtBad).toDF("payload")
      .select(Multimodal.pngStats(col("payload")).as("st")).collect()(0)
    assert(fb.isNullAt(0), "undefined filter type must yield null")
  }

  test("audio sig pairs: banded join equals a local all-pairs recompute") {
    val audio = spark.read.parquet(graft.ops.AudioFixture.ensure(spark))
    def sig(bytes: Array[Byte]): Int = {
      val n = bytes.length - 8
      val e = (0 until 16).map { w =>
        (w * n / 16 until (w + 1) * n / 16)
          .map(i => math.abs((bytes(8 + i) & 0xff) - 128).toLong).sum
      }
      val total = e.sum
      (0 until 16).foldLeft(0) { (s, w) =>
        if (e(w) * 16 > total) s | (1 << (15 - w)) else s
      }
    }
    val sigs = audio.select("media_id", "payload").collect()
      .map(r => r.getLong(0) -> sig(r.getAs[Array[Byte]](1))).sortBy(_._1)
    val expected = for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      h = Integer.bitCount(sa ^ sb) if h <= 3
    } yield (a, b, h.toLong)
    val got = Multimodal.audioSigPairs(audio).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == expected.toSeq)
    assert(got.nonEmpty, "fixture must contain at least one audio near-pair")
    // The noised re-takes must actually collapse: every group's base and
    // at least one re-take pair within tau.
    assert(got.exists { case (a, b, _) => a / 3 == b / 3 },
      "at least one in-group (re-take) pair expected")
    val plan = Multimodal.audioSigPairs(audio).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("video sig pairs: majority vote over frame hashes, banded == all-pairs") {
    val video = spark.read.parquet(graft.ops.VideoFixture.ensure(spark))
    def framePhashes(bytes: Array[Byte]): Seq[Int] = {
      val w = ((bytes(4) & 0xff) << 8) | (bytes(5) & 0xff)
      val h = ((bytes(6) & 0xff) << 8) | (bytes(7) & 0xff)
      val fl = w * h
      val nf = (bytes.length - 8) / fl
      (0 until nf).map { f =>
        val body = bytes.slice(8 + f * fl, 8 + (f + 1) * fl)
        val counts = new Array[Int](16)
        body.foreach(b => counts((b & 0xff) >>> 4) += 1)
        (0 until 16).foldLeft(0) { (s, b) =>
          if (counts(b) * 16 > body.length) s | (1 << (15 - b)) else s
        }
      }
    }
    def majority(phs: Seq[Int]): Int =
      (0 until 16).foldLeft(0) { (s, b) =>
        if (2 * phs.count(p => ((p >> (15 - b)) & 1) == 1) > phs.length)
          s | (1 << (15 - b))
        else s
      }
    val sigs = video.select("media_id", "payload").collect()
      .map(r => r.getLong(0) -> majority(framePhashes(r.getAs[Array[Byte]](1))))
      .sortBy(_._1)
    val expected = for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      h = Integer.bitCount(sa ^ sb) if h <= 3
    } yield (a, b, h.toLong)
    val got = Multimodal.videoSigPairs(video).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == expected.toSeq)
    assert(got.nonEmpty, "fixture must contain at least one video near-pair")
    // Re-takes (id, id+5 share source identity id%5) must collapse.
    assert(got.exists { case (a, b, _) => a % 5 == b % 5 },
      "at least one re-take pair expected")
    val plan = Multimodal.videoSigPairs(video).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("scene cuts: in-row frame phash diffs match a driver byte recompute") {
    val video = spark.read.parquet(graft.ops.VideoFixture.ensure(spark))
    def phash(body: Array[Byte]): Int = {
      val counts = new Array[Int](16)
      body.foreach(b => counts((b & 0xff) >>> 4) += 1)
      (0 until 16).foldLeft(0) { (h, b) =>
        if (counts(b) * 16 > body.length) h | (1 << (15 - b)) else h
      }
    }
    val expected = video.select("media_id", "payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1))
      .sortBy(_._1)
      .flatMap { case (id, bytes) =>
        // Frame geometry re-read from the payload header bytes, like the
        // operator; the meta cross-check below pins header==meta.
        val w = ((bytes(4) & 0xff) << 8) | (bytes(5) & 0xff)
        val h = ((bytes(6) & 0xff) << 8) | (bytes(7) & 0xff)
        val fl = w * h
        val nf = (bytes.length - 8) / fl
        val phs = (0 until nf).map(f => phash(bytes.slice(8 + f * fl, 8 + (f + 1) * fl)))
        (1 until nf).map { f =>
          val ham = Integer.bitCount(phs(f) ^ phs(f - 1)).toLong
          (id, f, ham, if (ham >= 4) 1 else 0)
        }
      }
    val got = Multimodal.sceneCuts(video).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    assert(got.toSeq == expected.toSeq)
    // The fixture's construction yields both classes: hard cuts at scene
    // starts and quiet in-scene frames.
    assert(got.exists(_._4 == 1), "fixture must contain at least one scene cut")
    assert(got.exists(_._4 == 0), "fixture must contain at least one non-cut frame")
    // Header bytes agree with the independently-written meta struct.
    video.selectExpr("media_id", "payload", "meta.width", "meta.height", "meta.n_frames")
      .collect().foreach { r =>
        val b = r.getAs[Array[Byte]](1)
        assert((((b(4) & 0xff) << 8) | (b(5) & 0xff)) == r.getInt(2))
        assert((((b(6) & 0xff) << 8) | (b(7) & 0xff)) == r.getInt(3))
        assert((b.length - 8) / (r.getInt(2) * r.getInt(3)) == r.getInt(4))
      }
    // In-row formulation: no window exchange, no join — frames never
    // shuffle (the lag() plan this operator deliberately avoids).
    val plan = Multimodal.sceneCuts(video).queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("Join"))
  }

  test("streaming LP ingest: files -> micro-batch -> WAL -> query") {
    val base = Files.createTempDirectory("graft-stream")
    val in = Files.createTempDirectory("graft-stream-in")
    val ckpt = Files.createTempDirectory("graft-stream-ckpt")
    val appender = new BufferedAppender(spark, base, bufferSize = 1000000)
    val q = new StreamingLpIngest(spark, in.toString, ckpt.toString, appender,
      triggerMs = 500).start()
    try {
      val t0 = System.currentTimeMillis()
      Files.writeString(in.resolve("batch1.txt"),
        (0 until 30).map(i => s"sm,host=a v=$i.0 ${(t0 + i) * TimeUtils.NsPerMs}")
          .mkString("\n"))
      q.processAllAvailable()
      Files.writeString(in.resolve("batch2.txt"),
        (30 until 50).map(i => s"sm,host=b v=$i.0 ${(t0 + i) * TimeUtils.NsPerMs}")
          .mkString("\n"))
      q.processAllAvailable()
      val df = new Storage(base).load(spark, "sm", Long.MinValue, Long.MaxValue).get
      assert(df.count() == 50)
      q.stop()

      // Recovery: a NEW stream on the SAME checkpoint must not reprocess
      // the two already-committed batches (at-least-once upgrade over the
      // reference's lose-on-crash buffers, SURVEY §2.7).
      val q2 = new StreamingLpIngest(spark, in.toString, ckpt.toString, appender,
        triggerMs = 500).start()
      try {
        Files.writeString(in.resolve("batch3.txt"),
          (50 until 60).map(i => s"sm,host=c v=$i.0 ${(t0 + i) * TimeUtils.NsPerMs}")
            .mkString("\n"))
        q2.processAllAvailable()
        val df2 = new Storage(base).load(spark, "sm", Long.MinValue, Long.MaxValue).get
        assert(df2.count() == 60, "recovered stream must append only the new batch")
      } finally q2.stop()
    } finally q.stop()
  }
}
