package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Declared multimodal queries over the committed binary media fixture
  * (real JPEG/PNG/WAV payloads + the synthetic GIMG/GAUD containers).
  * m1/m3/m4's oracles read the independently-written `meta` struct — they
  * cross-check the Spark side's actual BYTE-level marker/chunk walks
  * against the metadata, so a broken binary path cannot silently pass. m2
  * (histogram-feature similarity) has no SQL-expressible oracle and takes
  * the driver's rows-only check. */
object DeclaredMedia {

  private def media(s: SparkSession): DataFrame =
    s.read.parquet(MediaFixture.ensure(s))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_media_decode"  -> ((s, _) => Multimodal.decodeDims(media(s))),
    "m2_media_sim"     -> ((s, _) => Multimodal.similarByHistogram(media(s))),
    "m3_frame_sample"  -> ((s, _) => Multimodal.frameSampleStats(media(s))),
    "m4_audio_decode"  -> ((s, _) => Multimodal.decodeAudio(media(s))))

  private val Fixture = MediaFixture.DefaultPath

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
    "m4_audio_decode" ->
      s"""SELECT media_id, meta.format AS format, meta.sample_rate AS rate,
         |CAST(meta.n_samples AS BIGINT) AS n_samples
         |FROM read_parquet('$Fixture') WHERE kind = 'audio'
         |ORDER BY media_id""".stripMargin)
}
