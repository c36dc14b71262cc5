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

  /** ImageIO's default ImageInputStream/ImageOutputStream cache is a
    * TEMP FILE PER read/write CALL — a per-image disk round-trip (plus a
    * synchronized temp-name allocation) that dwarfs the actual decode of
    * thumbnail-scale images and turns a 10k-image partition batch into
    * 10k file creations. Memory-buffered streams are strictly better for
    * in-memory payload columns at any scale. JVM-global, idempotent;
    * referenced at the top of every ImageIO-using partition so it runs
    * on the EXECUTOR JVM, not just the driver. */
  private lazy val imageioNoCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

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
        imageioNoCache
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
        imageioNoCache
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
    * (same scale shape: banded candidates, never all-pairs, and the same
    * deterministic bucket cap — a meme duplicated 10M times at corpus
    * scale would otherwise turn one band bucket into a quadratic join). */
  def imageNearDup(spark: SparkSession, media: DataFrame,
                   maxHamming: Int = 10,
                   maxBucket: Int = TextDedup.MaxBucketDefault): DataFrame = {
    // persisted: the decode+hash pipeline (the dominant cost) feeds BOTH
    // sides of the band self-join — uncached it would run twice
    val hashes = graft.CacheScope.manage(
      withDHash(spark, media).filter(col("dhash").isNotNull).persist())
    val hashed = TextDedup.capBuckets(hashes
      .select(col("doc_id"), col("dhash"),
        posexplode(array((0 until 4).map(k =>
          expr(s"shiftright(dhash, ${16 * k}) & 65535")): _*)).as(Seq("band_id", "band_val"))),
      Seq("band_id", "band_val"), maxBucket)
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

  // ---- synthesized-media oracle path -----------------------------------
  //
  // The fixture carries no real media bytes, so the decode boundary was
  // only rows-only checkable. These queries close that gap: each doc_id
  // deterministically ENCODES a real PNG / WAV on the executor (JDK
  // codecs), pushes it through the same decode operators as production
  // data, and emits only fields the decoder must RECOVER — which the
  // DuckDB oracle re-derives from doc_id arithmetic alone. A decoder bug
  // (wrong dimensions, wrong sample rate, dropped frames, luma drift)
  // breaks the hash compare.

  /** Solid-gray PNG, dimensions and luma a pure function of the id. */
  private[llm] def synthPng(id: Long): Array[Byte] = {
    val w = 16 + (id % 32).toInt
    val h = 12 + (id % 24).toInt
    val v = (id % 256).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (v << 16) | (v << 8) | v
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** l15 — REAL image decode, oracle-exact: encode a per-doc PNG, decode
    * it through [[decodeImages]], emit the recovered width/height and the
    * first thumbnail luma byte. With r=g=b=v the 299/587/114 luma weights
    * sum to 1000, so the thumbnail byte recovers v exactly; PNG is
    * lossless, so the oracle is plain doc_id arithmetic. */
  def synthImageDecode(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    val media = documents.select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        imageioNoCache
        ids.map(id => (id, "image/png", synthPng(id)))
      }
      .toDF("doc_id", "mime", "media")
      .withColumn("media_bytes", length(col("media")).cast("long"))
    decodeImages(spark, media)
      .select(col("doc_id"), col("width"), col("height"),
        conv(hex(substring(col("feature"), 1, 1)), 16, 10).cast("int").as("luma"))
      .orderBy("doc_id")
  }

  private val l15Sql =
    """SELECT doc_id,
      | cast(16 + doc_id % 32 as int) AS width,
      | cast(12 + doc_id % 24 as int) AS height,
      | cast(doc_id % 256 as int) AS luma
      |FROM documents ORDER BY doc_id""".stripMargin

  /** 16-bit PCM WAV with rate/channels/frames a pure function of the id. */
  private[llm] def synthWav(id: Long): Array[Byte] = {
    val rate = 8000 + 1600 * (id % 5).toInt
    val channels = 1 + (id % 2).toInt
    val frames = 100 + (id % 400).toInt
    val data = new Array[Byte](frames * channels * 2)
    var i = 0
    while (i < data.length) { data(i) = ((id + i) % 256).toByte; i += 1 }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, channels,
      true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** The l39/l42 AUDIT-SURFACE cap (r16 verdict #3 of What's wrong):
    * both are codec/Θ(answer) AUDITS whose bounded production twins
    * (l23 frame planning, l54 clusters) stay flat at scale — the audits
    * themselves need only a FIXED oracle-checked surface, not one that
    * grows with the corpus. 500 = the full fixture at sf0.001 AND
    * sf0.01 (doc_ids 0–499 at both), so the cap is NON-BINDING at every
    * driver-gated scale — capped ≡ uncapped there, hash-identically —
    * while larger corpora (sf0.1's 5 000 docs) re-verify the same
    * pinned 500-doc surface instead of re-paying codec CPU and
    * quadratic pair growth per scale rung. */
  private[llm] val AuditCap = 500L

  /** l39 — REAL audio probe, oracle-exact: encode a per-doc WAV, parse it
    * through [[probeAudio]], emit the recovered rate/channels/frames and
    * the probe's duration arithmetic. All rates are integer-valued, so
    * the float round-trip is exact. Audits the first [[AuditCap]] docs
    * (the whole fixture at gated scales). */
  def synthAudioProbe(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    val media = documents.filter(col("doc_id") < AuditCap)
      .select(col("doc_id")).as[Long]
      .mapPartitions(ids => ids.map(id => (id, "audio/wav", synthWav(id))))
      .toDF("doc_id", "mime", "media")
      .withColumn("media_bytes", length(col("media")).cast("long"))
    probeAudio(spark, media)
      .select(col("doc_id"), col("decoded"), col("sample_rate"),
        col("channels"), col("frames"), col("duration_ms"))
      .orderBy("doc_id")
  }

  private val l39Sql =
    s"""SELECT doc_id, true AS decoded,
      | cast(8000 + 1600 * (doc_id % 5) as int) AS sample_rate,
      | cast(1 + doc_id % 2 as int) AS channels,
      | cast(100 + doc_id % 400 as bigint) AS frames,
      | cast((100 + doc_id % 400) * 1000 // (8000 + 1600 * (doc_id % 5)) as bigint) AS duration_ms
      |FROM documents WHERE doc_id < $AuditCap ORDER BY doc_id""".stripMargin

  /** The 64-bit dHash a [[synthGradientPng]] image must produce: four
    * 16-bit band words from affine maps of the doc's dup-group id (so
    * group members share all bands), with every third variant flipping
    * one band-1 bit to create true NEAR-duplicates. Bit 63 stays clear so
    * the value is SQL-safe (no BIGINT overflow building it in DuckDB). */
  private[llm] def dhashTarget(id: Long): Long = {
    val base = id % 50
    val variant = id / 50
    val t = ((base * 40503 + 1229) % 65536) |
      (((base * 12345 + 6789) % 65536) << 16) |
      (((base * 23456 + 987) % 65536) << 32) |
      (((base * 7891 + 234) % 32768) << 48)
    if (variant % 3 == 1) t ^ (1L << ((variant % 16) + 16).toInt) else t
  }

  /** 9×8 gradient PNG whose dHash equals [[dhashTarget]] exactly: the
    * 9×8 canvas makes [[withDHash]]'s nearest-neighbor grid sample every
    * pixel 1:1, and each row walks luma ±1 per target bit (< compares). */
  private[llm] def synthGradientPng(id: Long): Array[Byte] = {
    val target = dhashTarget(id)
    val img = new java.awt.image.BufferedImage(
      9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 8) {
      var v = 128
      img.setRGB(0, y, (v << 16) | (v << 8) | v)
      var x = 0
      while (x < 8) {
        v += (if (((target >> (y * 8 + x)) & 1L) == 1L) 1 else -1)
        img.setRGB(x + 1, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** l42 — perceptual near-dup dedup end-to-end and oracle-exact: encode
    * gradient PNGs carrying a known dHash, run the full decode → dHash →
    * 16-bit band join → hamming-verify pipeline on real pixels, while the
    * oracle replays the SAME banding/hamming algebra over the closed-form
    * hashes. Every stage (codec, luma sampling, bit packing, band
    * bucketing, XOR popcount) is covered by the hash compare. Audits
    * the first [[AuditCap]] docs (the whole fixture at gated scales) —
    * the pair list is Θ(answer), quadratic in dup-group size, so the
    * audit surface is pinned while l54 carries the bounded production
    * contract at any corpus size. */
  def synthImageNearDup(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    val media = documents.filter(col("doc_id") < AuditCap)
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        imageioNoCache
        ids.map(id => (id, "image/png", synthGradientPng(id)))
      }
      .toDF("doc_id", "mime", "media")
      .withColumn("media_bytes", length(col("media")).cast("long"))
    imageNearDup(spark, media)
  }

  // The closed-form dHash CTE shared by l42 (pair audit, doc set capped
  // at AuditCap) and l54 (cluster rollup, uncapped). RECURSIVE prefix
  // is harmless for l42 and lets l54 append TextDedup's reachability
  // closure over its `pairs` CTE.
  private def hashCteSqlWhere(where: String): String =
    s"""WITH RECURSIVE h AS (
      |  SELECT doc_id,
      |    xor((doc_id % 50 * 40503 + 1229) % 65536
      |        + ((doc_id % 50 * 12345 + 6789) % 65536) * 65536
      |        + ((doc_id % 50 * 23456 + 987) % 65536) * 4294967296
      |        + ((doc_id % 50 * 7891 + 234) % 32768) * 281474976710656,
      |      CASE WHEN (doc_id // 50) % 3 = 1
      |           THEN (1::BIGINT << cast((doc_id // 50) % 16 + 16 as int))
      |           ELSE 0 END) AS dhash
      |  FROM documents $where)""".stripMargin
  private val hashCteSql = hashCteSqlWhere("")

  // the bucket cap is interpolated from the Scala-side constant (the
  // TextDedup.pairsCtes pattern) so a future cap change cannot desync
  // implementation and oracle silently
  private val dhashCtesSql = hashCteSqlWhere(s"WHERE doc_id < $AuditCap") + ",\n" +
    s"""b0 AS (
      |  SELECT doc_id, dhash, band_id, (dhash >> (16 * band_id)) & 65535 AS band_val
      |  FROM h, (SELECT unnest(range(0, 4)) AS band_id)),
      |b AS (
      |  SELECT doc_id, dhash, band_id, band_val FROM (
      |    SELECT *, row_number() OVER (PARTITION BY band_id, band_val ORDER BY doc_id) AS rn
      |    FROM b0)
      |  WHERE rn <= ${TextDedup.MaxBucketDefault}),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b,
      |         a.dhash AS h_a, b2.dhash AS h_b
      |  FROM b a JOIN b b2 ON a.band_id = b2.band_id AND a.band_val = b2.band_val
      |  WHERE a.doc_id < b2.doc_id),
      |pairs AS (
      |  SELECT id_a, id_b FROM cand WHERE bit_count(xor(h_a, h_b)) <= 10)""".stripMargin

  private val l42Sql = dhashCtesSql + "\n" +
    """SELECT id_a, id_b, cast(bit_count(xor(h_a, h_b)) as int) AS hamming
      |FROM cand WHERE bit_count(xor(h_a, h_b)) <= 10
      |ORDER BY hamming, id_a, id_b""".stripMargin

  /** l54 — image near-dup CLUSTER rollup (l26's shape for images): the
    * l42 pair list is the AUDIT surface, but at 100× duplication it
    * materializes pairs quadratically in cluster size (DocScale100's 25 M
    * rows at the 100× rung — Θ(answer), but the answer itself is huge).
    * A 100 TB pipeline wants the BOUNDED output: connected components
    * over the same dHash candidate pairs ([[TextDedup.propagateMinLabels]]
    * — min-label propagation + pointer jumping, one doc-keyed shuffle
    * per round), rolled up to one row per cluster. Output rows track
    * CLUSTER COUNT (flat in duplication factor), not pair count. The
    * oracle replays the identical closure over the closed-form hash
    * chain (the l26 recursive-CTE pattern on the l42 CTEs). */
  def synthImageDupClusters(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    val media = documents.select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        imageioNoCache
        ids.map(id => (id, "image/png", synthGradientPng(id)))
      }
      .toDF("doc_id", "mime", "media")
      .withColumn("media_bytes", length(col("media")).cast("long"))
    imageDupClusters(spark, media)
  }

  /** The clustering engine behind l54: EXACT-DUP COLLAPSE first — all
    * docs sharing a dHash fold into star edges onto their min-doc_id
    * representative (identical fingerprints are trivially mutual
    * near-dups, no pair enumeration needed) — then the banded near-dup
    * join runs over DISTINCT fingerprints only. At 100× duplication the
    * full pair graph grows ~quadratically (every clone pairs with every
    * clone — l42's audit surface measures exactly that); the collapsed
    * edge list is N star edges + rep-level near-dup pairs, LINEAR in
    * docs, and connectivity is preserved: members reach their rep by a
    * star edge, reps reach near-dup reps by the banded pairs. */
  def imageDupClusters(spark: SparkSession, media: DataFrame,
                       maxHamming: Int = 10,
                       maxBucket: Int = TextDedup.MaxBucketDefault): DataFrame = {
    val hashes = graft.CacheScope.manage(
      withDHash(spark, media).filter(col("dhash").isNotNull).persist())
    val reps = hashes.groupBy("dhash").agg(min(col("doc_id")).as("rep"))
    val starEdges = hashes.join(reps, Seq("dhash"))
      .filter(col("doc_id") =!= col("rep"))
      .select(col("doc_id").as("id_a"), col("rep").as("id_b"))
    val repHashes = reps.select(col("rep").as("doc_id"), col("dhash"))
    val banded = TextDedup.capBuckets(repHashes
      .select(col("doc_id"), col("dhash"),
        posexplode(array((0 until 4).map(k =>
          expr(s"shiftright(dhash, ${16 * k}) & 65535")): _*)).as(Seq("band_id", "band_val"))),
      Seq("band_id", "band_val"), maxBucket)
    val a = banded.select(col("doc_id").as("id_a"), col("dhash").as("h_a"),
      col("band_id"), col("band_val"))
    val b = banded.select(col("doc_id").as("id_b"), col("dhash").as("h_b"),
      col("band_id"), col("band_val"))
    val repPairs = a.join(b, Seq("band_id", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "h_a", "h_b").distinct()
      .filter(expr("bit_count(h_a ^ h_b)") <= maxHamming)
      .select("id_a", "id_b")
    TextDedup.propagateMinLabels(starEdges.unionByName(repPairs))
      .groupBy("comp").agg(count(lit(1)).as("n_imgs"))
      .select(col("comp").as("cluster_id"), col("n_imgs"),
        (col("n_imgs") - 1).as("removable"))
      .orderBy("cluster_id")
  }

  // l54's reduced graph: exact-dup star edges + rep-level banded
  // near-dup pairs (mirrors imageDupClusters term for term), then the
  // shared reachability closure.
  private val l54Sql = hashCteSql + ",\n" +
    s"""reps AS (SELECT dhash, min(doc_id) AS rep FROM h GROUP BY dhash),
      |star AS (SELECT h.doc_id AS id_a, r.rep AS id_b
      |         FROM h JOIN reps r USING (dhash) WHERE h.doc_id != r.rep),
      |rh AS (SELECT rep AS doc_id, dhash FROM reps),
      |rb0 AS (
      |  SELECT doc_id, dhash, band_id, (dhash >> (16 * band_id)) & 65535 AS band_val
      |  FROM rh, (SELECT unnest(range(0, 4)) AS band_id)),
      |rb AS (
      |  SELECT doc_id, dhash, band_id, band_val FROM (
      |    SELECT *, row_number() OVER (PARTITION BY band_id, band_val ORDER BY doc_id) AS rn
      |    FROM rb0)
      |  WHERE rn <= ${TextDedup.MaxBucketDefault}),
      |rpairs AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
      |  FROM rb a JOIN rb b2 ON a.band_id = b2.band_id AND a.band_val = b2.band_val
      |  WHERE a.doc_id < b2.doc_id AND bit_count(xor(a.dhash, b2.dhash)) <= 10),
      |pairs AS (SELECT id_a, id_b FROM star
      |          UNION ALL SELECT id_a, id_b FROM rpairs),""".stripMargin + "\n" +
    TextDedup.closureCtesSql + "\n" +
    """SELECT comp AS cluster_id, count(*) AS n_imgs,
      |       cast(count(*) - 1 as bigint) AS removable
      |FROM (SELECT src, min(dst) AS comp FROM reach GROUP BY 1)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  def all: Seq[Q] = Seq(
    Q("l14_media_meta", (s, d) => mediaMeta(Tables.documents(s, d)), Some(l14Sql)),
    Q("l15_media_decode", (s, d) => synthImageDecode(s, Tables.documents(s, d)), Some(l15Sql)),
    Q("l23_frame_sample_plan", (s, d) => frameSamplePlan(Tables.documents(s, d)), Some(l23Sql)),
    Q("l39_audio_probe", (s, d) => synthAudioProbe(s, Tables.documents(s, d)), Some(l39Sql)),
    Q("l42_image_neardup", (s, d) => synthImageNearDup(s, Tables.documents(s, d)), Some(l42Sql)),
    Q("l54_image_dup_clusters", (s, d) =>
      synthImageDupClusters(s, Tables.documents(s, d)), Some(l54Sql)))
}
