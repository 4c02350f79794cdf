package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Declared multimodal queries over the committed binary media fixture
  * (real JPEG/PNG/WAV payloads + the synthetic GIMG/GAUD containers).
  * m1/m3/m4's oracles read the independently-written `meta` struct — they
  * cross-check the Spark side's actual BYTE-level marker/chunk walks
  * against the metadata, so a broken binary path cannot silently pass.
  * m2's oracle re-derives the float32 byte histograms from the payload
  * HEX and folds the same double cosine, so even the feature-extraction
  * math is hash-checked. */
object DeclaredMedia {

  // Plan cache per (session, fixture) (the Tables.load discipline): a
  // fixture is written once and immutable, but `spark.read.parquet`
  // re-lists and re-reads footers on every call — ~0.1 s of driver
  // latency each m* query paid per bench pass.
  private val fixtureCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private def fixtureDf(s: SparkSession, ensure: SparkSession => String): DataFrame = {
    val path = ensure(s)
    fixtureCache.computeIfAbsent((s, path), _ => s.read.parquet(path))
  }
  private def media(s: SparkSession): DataFrame = fixtureDf(s, MediaFixture.ensure(_))
  private def video(s: SparkSession): DataFrame = fixtureDf(s, VideoFixture.ensure(_))
  private def audio(s: SparkSession): DataFrame = fixtureDf(s, AudioFixture.ensure(_))
  private def pgm(s: SparkSession): DataFrame = fixtureDf(s, PgmFixture.ensure(_))
  private def ppm(s: SparkSession): DataFrame = fixtureDf(s, PpmFixture.ensure(_))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_media_decode"  -> ((s, _) => Multimodal.decodeDims(media(s))),
    "m2_media_sim"     -> ((s, _) => Multimodal.similarByHistogram(media(s))),
    "m3_frame_sample"  -> ((s, _) => Multimodal.frameSampleStats(media(s))),
    "m4_audio_decode"  -> ((s, _) => Multimodal.decodeAudio(media(s))),
    "m5_phash_pairs"   -> ((s, _) => Multimodal.phashPairs(media(s))),
    "m6_scene_cuts"    -> ((s, _) => Multimodal.sceneCuts(video(s))),
    "m7_audio_pairs"   -> ((s, _) => Multimodal.audioSigPairs(audio(s))),
    "m8_video_pairs"   -> ((s, _) => Multimodal.videoSigPairs(video(s))),
    "m9_pgm_decode"    -> ((s, _) => Multimodal.decodePgm(pgm(s))),
    "m10_pgm_resize"   -> ((s, _) => Multimodal.resizePgm(pgm(s))),
    "m11_ppm_decode"   -> ((s, _) => Multimodal.decodePpm(ppm(s))),
    "m12_wav_decode"   -> ((s, _) => Multimodal.decodeWav(wavpcm(s))),
    "m13_wav_resample" -> ((s, _) => Multimodal.resampleWav(wavpcm(s))),
    "m14_png_decode"   -> ((s, _) => Multimodal.decodePng(png(s))))

  private def wavpcm(s: SparkSession): DataFrame = fixtureDf(s, WavFixture.ensure(_))
  private def png(s: SparkSession): DataFrame = fixtureDf(s, PngFixture.ensure(_))

  private val Fixture = MediaFixture.DefaultPath
  private val VidFixture = VideoFixture.DefaultPath
  private val AudFixture = AudioFixture.DefaultPath
  private val PgmPath = PgmFixture.DefaultPath
  private val PpmPath = PpmFixture.DefaultPath
  private val WavPath = WavFixture.DefaultPath
  private val PngPath = PngFixture.DefaultPath

  val oracleSql: Map[String, String] = Map(
    "m1_media_decode" ->
      s"""SELECT media_id, meta.format AS format, meta.width AS w, meta.height AS h,
         |octet_length(payload) AS n_bytes
         |FROM read_parquet('$Fixture') WHERE kind = 'image'
         |ORDER BY media_id""".stripMargin,
    "m3_frame_sample" ->
      s"""SELECT media_id, meta.height AS n_frames,
         |CAST(ceil(meta.height / 4.0) AS INTEGER) * meta.width AS out_bytes
         |FROM read_parquet('$Fixture') WHERE kind = 'image' AND meta.format = 'gimg'
         |ORDER BY media_id""".stripMargin,
    // m2: byte histogram re-derived from hex(payload body); f32 division
    // mirrors ByteHistogram's int/float32 division; the cosine fold is
    // CosineSim's exact double left fold; ordering matches rankTopK.
    "m2_media_sim" ->
      s"""WITH img AS (
         |  SELECT media_id, substr(hex(payload), 17) AS hs,
         |    octet_length(payload) - 8 AS n
         |  FROM read_parquet('$Fixture')
         |  WHERE kind = 'image' AND meta.format = 'gimg' AND octet_length(payload) >= 8),
         |hx AS (SELECT media_id, hs, n FROM img),
         |f AS (SELECT media_id,
         |  list_transform(range(0, 16), b -> CAST(
         |    CAST(len(list_filter(range(0, n),
         |      i -> CAST(concat('0x', substr(hs, CAST(2*i + 1 AS INT), 2)) AS INT) // 16 = b)) AS FLOAT)
         |    / CAST(greatest(n, 1) AS FLOAT) AS FLOAT)) AS f
         |  FROM hx),
         |q AS (SELECT media_id AS query_id, f AS qf FROM f WHERE media_id < 4),
         |scored AS (
         |  SELECT q.query_id, f.media_id AS neighbor_id,
         |    CAST(round(
         |      list_sum(list_transform(range(1, 17), i -> CAST(f.f[i] AS DOUBLE) * CAST(q.qf[i] AS DOUBLE)))
         |      / (sqrt(list_sum(list_transform(range(1, 17), i -> CAST(f.f[i] AS DOUBLE) * CAST(f.f[i] AS DOUBLE)))) *
         |         sqrt(list_sum(list_transform(range(1, 17), i -> CAST(q.qf[i] AS DOUBLE) * CAST(q.qf[i] AS DOUBLE)))))
         |      * 10000) AS BIGINT) AS cos_x10k
         |  FROM f CROSS JOIN q WHERE f.media_id <> q.query_id)
         |SELECT query_id, neighbor_id, cos_x10k FROM (
         |  SELECT query_id, neighbor_id, cos_x10k,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos_x10k DESC, neighbor_id) AS rn
         |  FROM scored)
         |WHERE rn <= 3 ORDER BY query_id, cos_x10k DESC, neighbor_id""".stripMargin,
    "m4_audio_decode" ->
      s"""SELECT media_id, meta.format AS format, meta.sample_rate AS rate,
         |CAST(meta.n_samples AS BIGINT) AS n_samples
         |FROM read_parquet('$Fixture') WHERE kind = 'audio'
         |ORDER BY media_id""".stripMargin,

    // m12: SAMPLE-level ground truth — every little-endian int16 sample
    // re-read from the payload HEX. The data chunk is written LAST with
    // an even size, so its bytes are the final 2·channels·n_frames of
    // the payload with channels/n_frames taken from the INDEPENDENTLY-
    // written meta: Spark walks the RIFF chunks (pad bytes included),
    // the oracle walks the tail arithmetic — equality requires both to
    // be right (the m5/m6 offset-arithmetic contract, on audio).
    "m12_wav_decode" ->
      s"""WITH p AS (
         |  SELECT media_id, hex(payload) AS hs, octet_length(payload) AS tot,
         |    meta.channels AS c, meta.sample_rate AS sample_rate, meta.n_frames AS f
         |  FROM read_parquet('$WavPath')),
         |u AS (
         |  SELECT media_id, c, sample_rate, f,
         |    list_transform(range(0, c * f), i ->
         |      CAST(concat('0x', substr(hs, CAST((tot - 2*c*f + 2*i + 1) * 2 + 1 AS INT), 2)) AS INT) * 256
         |      + CAST(concat('0x', substr(hs, CAST((tot - 2*c*f + 2*i) * 2 + 1 AS INT), 2)) AS INT)) AS us
         |  FROM p),
         |v AS (
         |  SELECT media_id, c, sample_rate, f,
         |    list_transform(us, x -> CASE WHEN x >= 32768 THEN x - 65536 ELSE x END) AS vs
         |  FROM u),
         |ch AS (
         |  SELECT media_id, c, sample_rate, f, vs,
         |    list_transform(range(0, f), j -> vs[CAST(c*j + 1 AS INT)]) AS v0
         |  FROM v)
         |SELECT media_id, c AS channels, sample_rate, CAST(f AS BIGINT) AS n_frames,
         |  CAST(list_sum(v0) AS BIGINT) AS ch0_sum,
         |  CAST(CASE WHEN c = 2 THEN list_sum(list_transform(range(0, f),
         |    j -> vs[CAST(c*j + 2 AS INT)])) ELSE 0 END AS BIGINT) AS ch1_sum,
         |  CAST(list_min(vs) AS INT) AS smp_min, CAST(list_max(vs) AS INT) AS smp_max,
         |  CAST(len(list_filter(range(1, f),
         |    j -> (v0[CAST(j AS INT)] < 0) <> (v0[CAST(j + 1 AS INT)] < 0))) AS BIGINT) AS zero_cross,
         |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    list_transform(vs, x -> CAST(x + 32768 AS BIGINT))),
         |    (a, b) -> (a * 31 + b) % 1000000007) AS BIGINT) AS fp
         |FROM ch ORDER BY media_id""".stripMargin,

    // m13: every OUTPUT sample re-derived from the payload hex — stereo
    // downmix (truncating mean, DuckDB // ≡ Java /) then 2× decimation
    // (truncating mean of consecutive mono pairs), position-pinned by
    // the rolling fingerprint. Same tail-offset contract as m12.
    "m13_wav_resample" ->
      s"""WITH p AS (
         |  SELECT media_id, hex(payload) AS hs, octet_length(payload) AS tot,
         |    meta.channels AS c, meta.sample_rate AS rate, meta.n_frames AS f
         |  FROM read_parquet('$WavPath') WHERE meta.n_frames >= 2),
         |u AS (
         |  SELECT media_id, c, rate, f,
         |    list_transform(range(0, c * f), i ->
         |      CAST(concat('0x', substr(hs, CAST((tot - 2*c*f + 2*i + 1) * 2 + 1 AS INT), 2)) AS INT) * 256
         |      + CAST(concat('0x', substr(hs, CAST((tot - 2*c*f + 2*i) * 2 + 1 AS INT), 2)) AS INT)) AS us
         |  FROM p),
         |v AS (
         |  SELECT media_id, c, rate, f,
         |    list_transform(us, x -> CASE WHEN x >= 32768 THEN x - 65536 ELSE x END) AS vs
         |  FROM u),
         |mono AS (
         |  SELECT media_id, rate, f,
         |    CASE WHEN c = 1 THEN vs
         |         ELSE list_transform(range(0, f), j ->
         |           (vs[CAST(2*j + 1 AS INT)] + vs[CAST(2*j + 2 AS INT)]) // 2) END AS m
         |  FROM v),
         |o AS (
         |  SELECT media_id, rate, f,
         |    list_transform(range(0, f // 2), j ->
         |      (m[CAST(2*j + 1 AS INT)] + m[CAST(2*j + 2 AS INT)]) // 2) AS os
         |  FROM mono)
         |SELECT media_id, rate // 2 AS out_rate, CAST(f // 2 AS BIGINT) AS n_out,
         |  CAST(list_sum(os) AS BIGINT) AS smp_sum,
         |  CAST(list_min(os) AS INT) AS smp_min, CAST(list_max(os) AS INT) AS smp_max,
         |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    list_transform(os, x -> CAST(x + 32768 AS BIGINT))),
         |    (a, b) -> (a * 31 + b) % 1000000007) AS BIGINT) AS fp
         |FROM o ORDER BY media_id""".stripMargin,

    // m9: PIXEL-level ground truth — every raster byte re-read from the
    // payload HEX (the raster is the LAST w*h bytes whatever the header
    // shape, comments included), aggregated independently; dims/maxval
    // cross-check the meta struct against Spark's byte-level P5 parse
    // (the m1 contract, taken down to the pixels).
    "m9_pgm_decode" ->
      s"""WITH p AS (
         |  SELECT media_id, hex(payload) AS hs, octet_length(payload) AS tot,
         |    meta.width AS w, meta.height AS h, meta.maxval AS maxval
         |  FROM read_parquet('$PgmPath')),
         |px AS (
         |  SELECT media_id, w, h, maxval,
         |    list_transform(range(0, w * h), i -> CAST(concat('0x',
         |      substr(hs, CAST((tot - w * h + i) * 2 + 1 AS INT), 2)) AS INT)) AS v
         |  FROM p)
         |SELECT media_id, w, h, maxval, CAST(w AS BIGINT) * h AS n_pixels,
         |  list_min(v) AS px_min, list_max(v) AS px_max,
         |  CAST(list_sum(v) AS BIGINT) AS px_sum,
         |  CAST(list_sum(v) AS BIGINT) * 100 // (CAST(w AS BIGINT) * h) AS mean_x100
         |FROM px ORDER BY media_id""".stripMargin,

    // m10: every OUTPUT pixel of the 2x box-downsample re-derived from
    // the payload hex (floor mean of each 2x2 input block), pinned
    // position-sensitively by the t4 rolling fingerprint over the
    // resized raster in row-major order — a wrong pixel VALUE or a
    // wrong pixel POSITION both break the hash.
    "m10_pgm_resize" ->
      s"""WITH p AS (
         |  SELECT media_id, hex(payload) AS hs, octet_length(payload) AS tot,
         |    meta.width AS w, meta.height AS h
         |  FROM read_parquet('$PgmPath')),
         |px AS (
         |  SELECT media_id, w, h,
         |    CAST(w // 2 AS INT) AS ow, CAST(h // 2 AS INT) AS oh,
         |    list_transform(range(0, w * h), i -> CAST(concat('0x',
         |      substr(hs, CAST((tot - w * h + i) * 2 + 1 AS INT), 2)) AS INT)) AS v
         |  FROM p),
         |rz AS (
         |  SELECT media_id, ow, oh,
         |    list_transform(range(0, ow * oh), k ->
         |      (v[CAST((k // ow) * 2 * w + (k % ow) * 2 + 1 AS INT)]
         |     + v[CAST((k // ow) * 2 * w + (k % ow) * 2 + 2 AS INT)]
         |     + v[CAST(((k // ow) * 2 + 1) * w + (k % ow) * 2 + 1 AS INT)]
         |     + v[CAST(((k // ow) * 2 + 1) * w + (k % ow) * 2 + 2 AS INT)]) // 4) AS r
         |  FROM px)
         |SELECT media_id, ow AS out_w, oh AS out_h,
         |  CAST(ow AS BIGINT) * oh AS n_pixels,
         |  CAST(list_min(r) AS INT) AS px_min, CAST(list_max(r) AS INT) AS px_max,
         |  CAST(list_sum(r) AS BIGINT) AS px_sum,
         |  CAST(list_reduce(
         |    list_prepend(CAST(0 AS BIGINT), list_transform(r, x -> CAST(x AS BIGINT))),
         |    (a, b) -> (a * 31 + b) % 1000000007) AS BIGINT) AS fp
         |FROM rz ORDER BY media_id""".stripMargin,

    // m11: COLOR pixel ground truth — every channel byte of the
    // interleaved RGB raster re-read from the payload hex (raster =
    // last w*h*3 bytes whatever the header shape); per-channel sums,
    // global range, and the rolling fingerprint over the integer
    // Rec.601 luma pin value, channel ORDER, and pixel POSITION.
    "m11_ppm_decode" ->
      s"""WITH p AS (
         |  SELECT media_id, hex(payload) AS hs, octet_length(payload) AS tot,
         |    meta.width AS w, meta.height AS h, meta.maxval AS maxval
         |  FROM read_parquet('$PpmPath')),
         |px AS (
         |  SELECT media_id, w, h, maxval,
         |    list_transform(range(0, w * h * 3), i -> CAST(concat('0x',
         |      substr(hs, CAST((tot - w * h * 3 + i) * 2 + 1 AS INT), 2)) AS INT)) AS v
         |  FROM p),
         |ch AS (
         |  SELECT media_id, w, h, maxval,
         |    CAST(list_sum(list_transform(range(0, w * h), i -> v[CAST(3*i + 1 AS INT)])) AS BIGINT) AS r_sum,
         |    CAST(list_sum(list_transform(range(0, w * h), i -> v[CAST(3*i + 2 AS INT)])) AS BIGINT) AS g_sum,
         |    CAST(list_sum(list_transform(range(0, w * h), i -> v[CAST(3*i + 3 AS INT)])) AS BIGINT) AS b_sum,
         |    CAST(list_min(v) AS INT) AS px_min, CAST(list_max(v) AS INT) AS px_max,
         |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(range(0, w * h), i -> CAST(
         |        (299 * v[CAST(3*i + 1 AS INT)] + 587 * v[CAST(3*i + 2 AS INT)]
         |         + 114 * v[CAST(3*i + 3 AS INT)]) // 1000 AS BIGINT))),
         |      (a, b) -> (a * 31 + b) % 1000000007) AS BIGINT) AS luma_fp
         |  FROM px)
         |SELECT media_id, w, h, maxval, CAST(w AS BIGINT) * h AS n_pixels,
         |  r_sum, g_sum, b_sum, px_min, px_max, luma_fp
         |FROM ch ORDER BY media_id""".stripMargin,

    // m14: PIXEL-level ground truth for the COMPRESSED format - every
    // sample re-derived from the fixture's independently-written RAW
    // raster hex; the Spark side decodes ONLY the payload (chunk walk +
    // CRC + inflate + unfilter), so equality proves the whole decode
    // path. Same fold arithmetic as m11's luma fingerprint.
    "m14_png_decode" ->
      s"""WITH p AS (
         |  SELECT media_id, hex(raw) AS hs, octet_length(raw) AS n,
         |    meta.width AS w, meta.height AS h, meta.channels AS c
         |  FROM read_parquet('$PngPath')),
         |px AS (
         |  SELECT media_id, w, h, c,
         |    list_transform(range(0, n), i -> CAST(concat('0x',
         |      substr(hs, CAST(2*i + 1 AS INT), 2)) AS INT)) AS v
         |  FROM p),
         |st AS (
         |  SELECT media_id, w, h, c,
         |    CAST(list_min(v) AS INT) AS px_min, CAST(list_max(v) AS INT) AS px_max,
         |    CAST(list_sum(v) AS BIGINT) AS px_sum,
         |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(range(0, w * h), i -> CAST(CASE WHEN c = 3 THEN
         |        (299 * v[CAST(3*i + 1 AS INT)] + 587 * v[CAST(3*i + 2 AS INT)]
         |         + 114 * v[CAST(3*i + 3 AS INT)]) // 1000
         |        ELSE v[CAST(i + 1 AS INT)] END AS BIGINT))),
         |      (a, b) -> (a * 31 + b) % 1000000007) AS BIGINT) AS luma_fp
         |  FROM px)
         |SELECT media_id, w, h, c AS channels, CAST(w AS BIGINT) * h AS n_pixels,
         |  px_min, px_max, px_sum, luma_fp
         |FROM st ORDER BY media_id""".stripMargin,


    // Ground truth = all-pairs Hamming over the same integer phash
    // (count·16 > n bit rule re-derived byte-by-byte from the payload
    // hex); the Spark side's 4-nibble banding is pigeonhole-complete at
    // tau = 3, so banded ≡ all-pairs exactly.
    // Fixture-consistency dependencies (ADVICE r7): the oracle selects
    // GIMG rows via the independently-written meta.format while Spark
    // parses the payload HEADER — equality relies on the fixture writing
    // both consistently (that cross-check is m1's job). The
    // octet_length >= 8 guard makes the n = octet_length - 8 body
    // arithmetic well-defined: a sub-8-byte payload would give negative n
    // and `c*16 > n` would set all 16 bits where Phash16 yields 0. (No
    // such row exists in the fixture; the guard pins the semantics.)
    "m5_phash_pairs" ->
      s"""WITH img AS (SELECT media_id, substr(hex(payload), 17) AS hs,
         |    octet_length(payload) - 8 AS n
         |  FROM read_parquet('$Fixture')
         |  WHERE kind = 'image' AND meta.format = 'gimg' AND octet_length(payload) >= 8),
         |cnt AS (SELECT media_id, n, list_transform(range(0, 16), b ->
         |    len(list_filter(range(0, n),
         |      i -> CAST(concat('0x', substr(hs, CAST(2*i + 1 AS INT), 2)) AS INT) // 16 = b))) AS c
         |  FROM img),
         |ph AS (SELECT media_id, CAST(list_sum(list_transform(range(0, 16),
         |    b -> CASE WHEN c[CAST(b + 1 AS INT)] * 16 > n THEN 1 << (15 - b) ELSE 0 END)) AS BIGINT) AS phash
         |  FROM cnt)
         |SELECT a.media_id AS id_a, b.media_id AS id_b,
         |  CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
         |FROM ph a JOIN ph b ON a.media_id < b.media_id
         |WHERE bit_count(xor(a.phash, b.phash)) <= 3
         |ORDER BY id_a, id_b""".stripMargin,

    // m6: per-frame phash re-derived byte-by-byte from the payload hex,
    // with frame offsets computed from the INDEPENDENTLY-written meta
    // dims/frame-count (Spark walks the GVID header bytes — the m1
    // cross-validation contract at the frame-offset level). DuckDB
    // lists are 1-indexed: phs[f+1] is frame f, so frame pair
    // (f-1, f) for frame_idx = f in 1..nf-1 reads phs[f] and phs[f+1].
    "m6_scene_cuts" ->
      s"""WITH v AS (
         |  SELECT media_id, substr(hex(payload), 17) AS hs,
         |    meta.width * meta.height AS fl, meta.n_frames AS nf
         |  FROM read_parquet('$VidFixture')
         |  WHERE kind = 'video' AND meta.format = 'gvid'),
         |ph AS (
         |  SELECT media_id, nf,
         |    list_transform(range(0, nf), f ->
         |      list_sum(list_transform(range(0, 16), b ->
         |        CASE WHEN len(list_filter(range(f * fl, (f + 1) * fl),
         |          i -> CAST(concat('0x', substr(hs, CAST(2 * i + 1 AS INT), 2)) AS INT) // 16 = b)) * 16 > fl
         |        THEN 1 << (15 - b) ELSE 0 END))) AS phs
         |  FROM v)
         |SELECT media_id, CAST(f AS INTEGER) AS frame_idx,
         |  CAST(bit_count(xor(phs[CAST(f + 1 AS INT)], phs[CAST(f AS INT)])) AS BIGINT) AS hamming,
         |  CASE WHEN bit_count(xor(phs[CAST(f + 1 AS INT)], phs[CAST(f AS INT)])) >= 4
         |       THEN 1 ELSE 0 END AS is_cut
         |FROM ph, unnest(range(1, nf)) AS t(f)
         |ORDER BY media_id, frame_idx""".stripMargin,

    // m7: ground truth = all-pairs Hamming over the energy-envelope
    // signature re-derived byte-by-byte from the payload hex (the m5
    // contract for audio): per-window Σ|u8 − 128| energies over the 16
    // equal w·n/16 windows, bit rule 16·E_w > E_total. coalesce(…, 0)
    // pins the sub-16-sample edge (empty windows) the fixture never
    // exercises; the banded Spark side is pigeonhole-complete at
    // tau = 3, so banded ≡ all-pairs exactly.
    "m7_audio_pairs" ->
      s"""WITH a AS (
         |  SELECT media_id, substr(hex(payload), 17) AS hs,
         |    octet_length(payload) - 8 AS n
         |  FROM read_parquet('$AudFixture')
         |  WHERE kind = 'audio' AND meta.format = 'gaud' AND octet_length(payload) >= 8),
         |e AS (
         |  SELECT media_id,
         |    list_transform(range(0, 16), w ->
         |      coalesce(list_sum(list_transform(range(w * n // 16, (w + 1) * n // 16),
         |        i -> abs(CAST(concat('0x', substr(hs, CAST(2 * i + 1 AS INT), 2)) AS INT) - 128))), 0)) AS ew
         |  FROM a),
         |s AS (
         |  SELECT media_id, CAST(list_sum(list_transform(range(0, 16), w ->
         |      CASE WHEN ew[CAST(w + 1 AS INT)] * 16 > list_sum(ew)
         |           THEN 1 << (15 - w) ELSE 0 END)) AS BIGINT) AS sig
         |  FROM e)
         |SELECT x.media_id AS id_a, y.media_id AS id_b,
         |  CAST(bit_count(xor(x.sig, y.sig)) AS BIGINT) AS hamming
         |FROM s x JOIN s y ON x.media_id < y.media_id
         |WHERE bit_count(xor(x.sig, y.sig)) <= 3
         |ORDER BY id_a, id_b""".stripMargin,

    // m8: ground truth = all-pairs Hamming over the per-video MAJORITY
    // signature (bit b set iff 2·count(frames with bit b) > nf), frames
    // re-hashed from the payload hex exactly as m6's oracle does, with
    // meta-derived frame offsets. p // (1 << (15 - b)) % 2 reads frame-
    // hash bit b without engine-specific shift operators.
    "m8_video_pairs" ->
      s"""WITH v AS (
         |  SELECT media_id, substr(hex(payload), 17) AS hs,
         |    meta.width * meta.height AS fl, meta.n_frames AS nf
         |  FROM read_parquet('$VidFixture')
         |  WHERE kind = 'video' AND meta.format = 'gvid'),
         |ph AS (
         |  SELECT media_id, nf,
         |    list_transform(range(0, nf), f ->
         |      list_sum(list_transform(range(0, 16), b ->
         |        CASE WHEN len(list_filter(range(f * fl, (f + 1) * fl),
         |          i -> CAST(concat('0x', substr(hs, CAST(2 * i + 1 AS INT), 2)) AS INT) // 16 = b)) * 16 > fl
         |        THEN 1 << (15 - b) ELSE 0 END))) AS phs
         |  FROM v),
         |sg AS (
         |  SELECT media_id, CAST(list_sum(list_transform(range(0, 16), b ->
         |      CASE WHEN 2 * len(list_filter(phs, p -> p // (1 << (15 - b)) % 2 = 1)) > nf
         |           THEN 1 << (15 - b) ELSE 0 END)) AS BIGINT) AS sig
         |  FROM ph)
         |SELECT x.media_id AS id_a, y.media_id AS id_b,
         |  CAST(bit_count(xor(x.sig, y.sig)) AS BIGINT) AS hamming
         |FROM sg x JOIN sg y ON x.media_id < y.media_id
         |WHERE bit_count(xor(x.sig, y.sig)) <= 3
         |ORDER BY id_a, id_b""".stripMargin)
}
