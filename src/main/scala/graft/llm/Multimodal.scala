package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{Q, Tables}

/** Multimodal column plumbing: image/audio/video carried as opaque
  * `binary` columns with typed metadata, partition-friendly batch shape,
  * and a decode/feature-extract boundary.
  *
  * IMAGE decode is REAL: [[decodeImages]] drives the JDK's own codecs
  * (javax.imageio ships PNG/JPEG/BMP/GIF readers — no external library
  * needed) inside mapPartitions, emitting true dimensions, and a 4×4
  * grayscale thumbnail as the feature vector. Payloads ImageIO cannot
  * decode — video/audio containers (ffmpeg-class codecs are not in this
  * environment) and the fixtures' synthetic text payloads — fall back to
  * the DETERMINISTIC STUB features, keeping the boundary total; swapping
  * the fallback for a JNI/process-call decoder is a single-function
  * change, and the partition-amortized batch shape is the part that
  * matters at scale.
  */
object Multimodal {

  /** Media feature row produced by the decode boundary. */
  final case class MediaFeature(
      doc_id: Long,
      mime: String,
      media_bytes: Long,
      width: Int,
      height: Int,
      feature: Array[Byte])

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("mime", StringType),
    StructField("media", BinaryType),
    StructField("media_bytes", LongType)))

  private def mimeFor = when(
    col("source").isin("src0", "src1", "src2", "src3", "src4", "src5"), "image/jpeg")
    .when(col("source").isin("src6", "src7", "src8", "src9", "src10", "src11", "src12"), "audio/wav")
    .otherwise("video/mp4")

  /** Pack the documents fixture into the media schema (text bytes stand in
    * for encoded media — the engine treats the payload as opaque). The
    * output is asserted against [[mediaSchema]] so the declared contract
    * cannot drift from the produced shape. */
  def packMedia(documents: DataFrame): DataFrame = {
    val out = documents.select(
      col("doc_id"),
      mimeFor.as("mime"),
      col("text").cast("binary").as("media"),
      length(col("text").cast("binary")).cast("long").as("media_bytes"))
    require(out.schema.fields.map(f => (f.name, f.dataType)).sameElements(
      mediaSchema.fields.map(f => (f.name, f.dataType))),
      s"packMedia output ${out.schema.simpleString} drifted from mediaSchema")
    out
  }

  /** Deterministic fallback features for payloads no available codec can
    * decode: dimensions derived from payload length, feature = first 16
    * payload bytes. */
  private def stubFeature(id: Long, mime: String, payload: Array[Byte],
                          bytes: Long): MediaFeature = {
    val w = 16 + (bytes % 1024).toInt
    val h = 9 + (bytes % 576).toInt
    MediaFeature(id, mime, bytes, w, h, payload.take(16))
  }

  /** STUB decode boundary — every row takes the deterministic fallback
    * (kept as the reproducible reference path; [[decodeImages]] is the
    * real boundary). The mapPartitions batch shape is what matters for
    * executor-side library reuse at scale. */
  def decodeStub(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    val enc = org.apache.spark.sql.Encoders.product[MediaFeature]
    media.select("doc_id", "mime", "media", "media_bytes")
      .as[(Long, String, Array[Byte], Long)]
      .mapPartitions { rows =>
        // one "decoder init" per partition, amortized over the batch
        rows.map { case (id, mime, payload, bytes) =>
          stubFeature(id, mime, payload, bytes)
        }
      }(enc)
      .toDF()
  }

  /** REAL image decode + feature extraction via the JDK's ImageIO
    * (PNG/JPEG/BMP/GIF — no external codecs): true width/height and a
    * 4×4 nearest-neighbor grayscale thumbnail (16 luma bytes, the classic
    * tiny-thumbnail perceptual feature) per image. Non-decodable payloads
    * take [[stubFeature]], so the operator is total over mixed corpora.
    * Decoding runs inside mapPartitions — the codec registry warms once
    * per executor task, amortized over the batch, which is the shape a
    * native decoder needs at 100 TB. */
  def decodeImages(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    val enc = org.apache.spark.sql.Encoders.product[MediaFeature]
    media.select("doc_id", "mime", "media", "media_bytes")
      .as[(Long, String, Array[Byte], Long)]
      .mapPartitions { rows =>
        rows.map { case (id, mime, payload, bytes) =>
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
            catch { case _: Exception => null }
          if (img == null) stubFeature(id, mime, payload, bytes)
          else {
            val w = img.getWidth
            val h = img.getHeight
            val thumb = new Array[Byte](16)
            var i = 0
            while (i < 16) {
              val x = math.min((i % 4) * w / 4 + w / 8, w - 1)
              val y = math.min((i / 4) * h / 4 + h / 8, h - 1)
              val rgb = img.getRGB(x, y)
              val luma = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                (rgb & 0xff) * 114) / 1000
              thumb(i) = luma.toByte
              i += 1
            }
            MediaFeature(id, mime, bytes, w, h, thumb)
          }
        }
      }(enc)
      .toDF()
  }

  /** l14 — metadata + first-bytes feature extraction, column-expression
    * form (oracle-checkable: hex of the leading payload BYTES — the
    * oracle slices the hex string, not the text, so multibyte UTF-8
    * documents stay byte-identical with Spark's binary substring). */
  def mediaMeta(documents: DataFrame): DataFrame =
    packMedia(documents)
      .withColumn("feature_hex", hex(substring(col("media"), 1, 16)))
      .withColumn("n_chunks", ceil(col("media_bytes") / lit(1024.0)).cast("long"))
      .select("doc_id", "mime", "media_bytes", "feature_hex", "n_chunks")
      .orderBy("doc_id")

  private val l14Sql =
    """SELECT doc_id,
      | CASE WHEN source IN ('src0','src1','src2','src3','src4','src5') THEN 'image/jpeg'
      |      WHEN source IN ('src6','src7','src8','src9','src10','src11','src12') THEN 'audio/wav'
      |      ELSE 'video/mp4' END AS mime,
      | cast(strlen(text) as bigint) AS media_bytes,
      | substr(hex(text), 1, 32) AS feature_hex,
      | cast(ceil(strlen(text)/cast(1024.0 as double)) as bigint) AS n_chunks
      |FROM documents ORDER BY doc_id""".stripMargin

  /** l15 — the decode boundary driven end-to-end through the REAL
    * ImageIO path (rows-only check: output summarized per mime type).
    * The fixtures' synthetic payloads all take the deterministic
    * fallback, which keeps the result reproducible; LlmSpec drives the
    * same operator over genuine PNG/BMP bytes. */
  def decodeFeatures(spark: SparkSession, documents: DataFrame): DataFrame =
    decodeImages(spark, packMedia(documents))
      .groupBy("mime")
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("media_bytes")).as("total_bytes"),
        max(col("width")).as("max_width"),
        max(col("height")).as("max_height"))
      .orderBy("mime")

  /** Audio metadata row produced by the WAV probe. */
  final case class AudioMeta(
      doc_id: Long,
      mime: String,
      media_bytes: Long,
      decoded: Boolean,
      sample_rate: Int,
      channels: Int,
      frames: Long,
      duration_ms: Long)

  /** REAL audio metadata extraction via the JDK's javax.sound.sampled
    * (WAV/AIFF/AU parse with no external library): sample rate, channel
    * count, frame count, and duration per clip, inside the same
    * partition-amortized batch shape as [[decodeImages]]. Payloads the
    * sound API cannot parse are emitted with `decoded = false` and
    * zeroed audio fields — total over mixed corpora, and the flag is
    * what a curation pipeline filters on. */
  def probeAudio(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    val enc = org.apache.spark.sql.Encoders.product[AudioMeta]
    media.select("doc_id", "mime", "media", "media_bytes")
      .as[(Long, String, Array[Byte], Long)]
      .mapPartitions { rows =>
        rows.map { case (id, mime, payload, bytes) =>
          val fmt =
            try {
              val in = new java.io.ByteArrayInputStream(payload)
              Some(javax.sound.sampled.AudioSystem.getAudioInputStream(in))
            } catch { case _: Exception => None }
          fmt match {
            case Some(ais) =>
              try {
                val f = ais.getFormat
                val frames = ais.getFrameLength
                val durMs =
                  if (f.getFrameRate > 0) (frames * 1000L / f.getFrameRate.toLong)
                  else 0L
                AudioMeta(id, mime, bytes, decoded = true,
                  f.getSampleRate.toInt, f.getChannels, frames, durMs)
              } finally ais.close()
            case None =>
              AudioMeta(id, mime, bytes, decoded = false, 0, 0, 0L, 0L)
          }
        }
      }(enc)
      .toDF()
  }

  /** l23 — frame-sample planning for video media: per clip, the
    * deterministic list of (frame_idx, time offset, byte offset) a frame
    * extractor would seek to — one `sequence` + `posexplode` per row, no
    * decoder needed to PLAN the I/O. At scale this is the partition-local
    * work list handed to the per-executor decoder; duration here is the
    * stub's bytes/8 model (a real container parser replaces one line). */
  def frameSamplePlan(documents: DataFrame, stepS: Int = 10): DataFrame =
    packMedia(documents)
      .filter(col("mime") === "video/mp4")
      .withColumn("duration_s", expr("media_bytes div 8"))
      .filter(col("duration_s") > 0)
      .select(col("doc_id"),
        posexplode(expr(s"sequence(0L, duration_s - 1, ${stepS}L)"))
          .as(Seq("frame_idx", "offset_s")))
      .withColumn("byte_offset", col("offset_s") * 8)
      .orderBy("doc_id", "frame_idx")

  private val l23Sql =
    """WITH v AS (
      |  SELECT doc_id, cast(strlen(text)//8 as bigint) AS duration_s FROM documents
      |  WHERE CASE WHEN source IN ('src0','src1','src2','src3','src4','src5') THEN 'image/jpeg'
      |             WHEN source IN ('src6','src7','src8','src9','src10','src11','src12') THEN 'audio/wav'
      |             ELSE 'video/mp4' END = 'video/mp4'
      |    AND strlen(text)//8 > 0),
      |f AS (SELECT doc_id, unnest(generate_series(0, duration_s - 1, 10)) AS offset_s FROM v)
      |SELECT doc_id, cast(offset_s//10 as int) AS frame_idx, offset_s, offset_s*8 AS byte_offset
      |FROM f ORDER BY doc_id, frame_idx""".stripMargin

  /** 64-bit difference hash (dHash) of an image: decode, sample a 9×8
    * luma grid, emit one bit per horizontal neighbor comparison — the
    * classic perceptual fingerprint that is invariant to re-encoding
    * (PNG vs BMP of the same pixels hash identically) and robust to mild
    * resizing, which byte- or text-level dedup can never catch.
    * Non-decodable payloads hash to null. */
  def withDHash(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("doc_id", "media")
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
            catch { case _: Exception => null }
          if (img == null) (id, None: Option[Long])
          else {
            val w = img.getWidth
            val h = img.getHeight
            // 9×8 luma grid via nearest-neighbor sampling
            val g = Array.tabulate(8, 9) { (y, x) =>
              val px = math.min(x * w / 9 + w / 18, w - 1)
              val py = math.min(y * h / 8 + h / 16, h - 1)
              val rgb = img.getRGB(px, py)
              (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                (rgb & 0xff) * 114) / 1000
            }
            var bits = 0L
            for (y <- 0 until 8; x <- 0 until 8)
              if (g(y)(x) < g(y)(x + 1)) bits |= 1L << (y * 8 + x)
            (id, Some(bits))
          }
        }
      }
      .toDF("doc_id", "dhash") // Option[Long] encodes to a nullable bigint
  }

  /** Perceptual image near-dup pairs: dHash 16-bit band join + hamming
    * verify — the SimHash banding machinery applied to image fingerprints
    * (same scale shape: banded candidates, never all-pairs). */
  def imageNearDup(spark: SparkSession, media: DataFrame,
                   maxHamming: Int = 10): DataFrame = {
    val hashed = withDHash(spark, media).filter(col("dhash").isNotNull)
      .select(col("doc_id"), col("dhash"),
        posexplode(array((0 until 4).map(k =>
          expr(s"shiftright(dhash, ${16 * k}) & 65535")): _*)).as(Seq("band_id", "band_val")))
    val a = hashed.select(col("doc_id").as("id_a"), col("dhash").as("h_a"),
      col("band_id"), col("band_val"))
    val b = hashed.select(col("doc_id").as("id_b"), col("dhash").as("h_b"),
      col("band_id"), col("band_val"))
    a.join(b, Seq("band_id", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "h_a", "h_b").distinct()
      .withColumn("hamming", expr("bit_count(h_a ^ h_b)"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
      .orderBy("hamming", "id_a", "id_b")
  }

  /** l39 — the audio boundary end-to-end (rows-only: per-mime rollup of
    * the real WAV probe; the synthetic fixture payloads all flag
    * `decoded = false`, and LlmSpec drives genuine WAV bytes). */
  def audioProbeStats(spark: SparkSession, documents: DataFrame): DataFrame =
    probeAudio(spark, packMedia(documents))
      .groupBy("mime")
      .agg(
        count(lit(1)).as("n_media"),
        sum(when(col("decoded"), 1).otherwise(0)).as("decoded_clips"),
        sum(col("media_bytes")).as("total_bytes"))
      .orderBy("mime")

  def all: Seq[Q] = Seq(
    Q("l14_media_meta", (s, d) => mediaMeta(Tables.documents(s, d)), Some(l14Sql)),
    Q("l15_media_decode", (s, d) => decodeFeatures(s, Tables.documents(s, d)), None),
    Q("l23_frame_sample_plan", (s, d) => frameSamplePlan(Tables.documents(s, d)), Some(l23Sql)),
    Q("l39_audio_probe", (s, d) => audioProbeStats(s, Tables.documents(s, d)), None))
}
