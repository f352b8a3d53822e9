package graft.functions

import graft.util._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for a training-data pipeline (builder-prompt north
  * star): image/audio/video as opaque BINARY columns with typed metadata,
  * processed by per-partition batch operators.
  *
  * Image decode/resize and WAV-PCM audio decode are REAL (the JDK ships
  * PNG/JPEG/GIF/BMP codecs in javax.imageio and WAV/AIFF/AU parsing in
  * javax.sound.sampled — no external dependency). Video is REAL at the
  * container level too: [[Mp4]] writes/parses actual ISO BMFF sample
  * tables, so frame indexing walks stsz/stco/stsc byte ranges, and
  * MJPEG-in-MP4 frames (fourcc `jpeg` — JPEG samples) decode through
  * ImageIO like any still image. Only non-JPEG video codecs and
  * compressed-audio resampling lack an in-JVM codec; those payloads take
  * the deterministic byte-sketch fallback that keeps every kernel total
  * (a 100 TB curation pass degrades per-row on undecodable bytes, never
  * throws).
  *
  * Scale design: media bytes never shuffle — all kernels are mapPartitions
  * (narrow, no exchange); only the small extracted features flow into joins
  * and aggregations downstream. Batches of 64 rows bound per-call overhead
  * the way Arrow record batches do for vectorized UDFs.
  */
object Multimodal {

  // executor-local, set at class-load: ImageIO's default stream cache
  // writes scratch FILES per decode; in-memory caching keeps the batched
  // kernels IO-free
  javax.imageio.ImageIO.setUseCache(false)

  // nullability follows the case-class Encoder derivation (AnyVal fields
  // non-null, AnyRef fields nullable)
  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = true),        // image|audio|video
    StructField("content", BinaryType, nullable = true),     // opaque payload
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false))), nullable = true)))

  case class MediaMeta(mime: String, width: Int, height: Int,
      sample_rate: Int, n_frames: Int)
  case class MediaRow(media_id: Long, kind: String, content: Array[Byte], meta: MediaMeta)
  case class MediaFeature(media_id: Long, kind: String, mime: String, n_bytes: Long,
      width: Int, height: Int, sample_rate: Int, embedding: Array[Float])

  // ---- container headers (real byte layouts, written and re-parsed) ----

  /** PNG signature + IHDR chunk (33 bytes): dims big-endian at 16/20.
    * CRC is zeroed — the probe reads structure, it doesn't validate. */
  private def pngHeader(w: Int, h: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(33)
    b.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    b.putInt(13).put("IHDR".getBytes("US-ASCII")).putInt(w).putInt(h)
    b.put(8.toByte).put(6.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    b.putInt(0)
    b.array
  }

  /** JPEG SOI + SOF0 segment (21 bytes): big-endian HEIGHT at 7, width
    * at 9 (SOF stores height first), 3 components */
  private def jpegHeader(w: Int, h: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(21)
    b.put(0xff.toByte).put(0xd8.toByte)
    b.put(0xff.toByte).put(0xc0.toByte)
    b.putShort(17).put(8.toByte)
    b.putShort(h.toShort).putShort(w.toShort)
    b.put(3.toByte)
    for (c <- 1 to 3) b.put(c.toByte).put(0x11.toByte).put(0.toByte)
    b.array
  }

  /** RIFF/WAVE header + fmt chunk (36 bytes): little-endian sample rate
    * at 24 (PCM mono 16-bit) */
  private def wavHeader(rate: Int, dataLen: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(36).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(28 + dataLen).put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1).putShort(1)
    b.putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
    b.array
  }

  /** byte-level container probe — real parsing, no codec: PNG IHDR dims
    * (big-endian at 16/20), JPEG marker scan to SOF0–SOF3 (height then
    * width), WAV fmt chunk (little-endian rate at 24), MP4 box walk
    * ([[Mp4.parse]]: tkhd dims + stsz frame count). This is the
    * format-sniffing a 100 TB media-curation pass runs per row before
    * deciding to decode at all — structure-only, so the scan cost is
    * independent of payload size. */
  def probeMedia(content: Array[Byte]): MediaMeta = {
    def u8(i: Int) = content(i) & 0xff
    def be32(i: Int) = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def tag(i: Int, n: Int) = new String(content, i, n, "US-ASCII")
    if (content.length >= 24 && u8(0) == 0x89 && tag(1, 3) == "PNG")
      MediaMeta("image/png", be32(16), be32(20), 0, 1)
    else if (content.length >= 2 && u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      var res = MediaMeta("image/jpeg", 0, 0, 0, 1)
      var done = false
      while (!done && i + 10 <= content.length && u8(i) == 0xff) {
        val marker = u8(i + 1)
        if (marker >= 0xc0 && marker <= 0xc3) {
          res = MediaMeta("image/jpeg", be16(i + 7), be16(i + 5), 0, 1)
          done = true
        } else i += 2 + be16(i + 2)
      }
      res
    } else if (content.length >= 36 && tag(0, 4) == "RIFF" && tag(8, 4) == "WAVE"
        && tag(12, 4) == "fmt ")
      MediaMeta("audio/wav", 0, 0, le32(24), 0)
    else if (content.length >= 12 && tag(4, 4) == "ftyp")
      // real box walk: tkhd dims + stsz frame count; an ftyp with no
      // parseable moov still identifies as MP4, with zeroed structure
      Mp4.parse(content) match {
        case Some(t) => MediaMeta("video/mp4", t.width, t.height, 0, t.nFrames)
        case None    => MediaMeta("video/mp4", 0, 0, 0, 0)
      }
    else MediaMeta("application/octet-stream", 0, 0, 0, 0)
  }

  /** deterministic synthetic media table derived from `documents`: the
    * binary column is a REAL container (PNG/JPEG/WAV headers; a full
    * ISO-BMFF MP4 via [[Mp4.write]], parameterized by doc_id) holding the
    * doc text as an opaque payload — so header probing and frame indexing
    * downstream exercise actual byte-format parsing, not carried
    * metadata. Video sample sizes are the uniform stride payload/nf, so
    * the oracle can replay every offset arithmetically while Spark must
    * read them back out of the stsz/stco tables. */
  def synthesizeMedia(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes("UTF-8")
        val kind = Seq("image", "audio", "video")((id % 3).toInt)
        val (content, meta) = kind match {
          case "image" =>
            val w = 64 + (id % 64).toInt * 16
            val h = 64 + (id % 48).toInt * 16
            if (id % 2 == 0)
              (pngHeader(w, h) ++ payload, MediaMeta("image/png", w, h, 0, 1))
            else
              (jpegHeader(w, h) ++ payload, MediaMeta("image/jpeg", w, h, 0, 1))
          case "audio" =>
            val rate = 8000 + (id % 5).toInt * 2000
            (wavHeader(rate, payload.length) ++ payload,
              MediaMeta("audio/wav", 0, 0, rate, 0))
          case _ =>
            val nf = 24 + (id % 100).toInt
            val w = 160 + (id % 16).toInt * 16
            val h = 120 + (id % 12).toInt * 16
            val stride = payload.length / nf
            // fourcc "text": the samples are text slices, honestly not
            // JPEG — the decode path must take its fallback, and the
            // structural parse must still succeed
            (Mp4.write(payload, Array.fill(nf)(stride), w, h, "text"),
              MediaMeta("video/mp4", w, h, 0, nf))
        }
        MediaRow(id, kind, content, meta)
      }
  }

  /** REAL image decode via the JDK's built-in ImageIO codecs (PNG, JPEG,
    * GIF, BMP readers ship with Java SE — pure JVM, zero added
    * dependencies): decodable payloads produce a 16-bin LUMINANCE
    * histogram over actual pixels (Rec. 601 integer weights, so the
    * result is bit-deterministic across JVMs). Payloads ImageIO cannot
    * decode — truncated files, exotic containers, or the synthesized
    * header+payload rows — fall back to [[byteHistogramSketch]] so the
    * kernel is TOTAL: a 100 TB curation pass must degrade per-row on
    * corrupt bytes, never throw. */
  private[functions] def decodeImage(content: Array[Byte]): Array[Float] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      catch { case _: Throwable => null }
    if (img == null) byteHistogramSketch(content) else pixelHistogram(img)
  }

  /** 16-bin normalized luminance histogram over decoded pixels (Rec. 601
    * integer weights — bit-deterministic across JVMs); shared by the
    * still-image and per-video-frame decode paths */
  private def pixelHistogram(img: java.awt.image.BufferedImage): Array[Float] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val hist = new Array[Float](16)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        hist(lum >> 4) += 1f
        x += 1
      }
      y += 1
    }
    val n = math.max(w * h, 1).toFloat
    var i = 0
    while (i < 16) { hist(i) /= n; i += 1 }
    hist
  }

  /** REAL audio decode via the JDK's javax.sound.sampled WAV/AIFF/AU
    * parsers (PCM needs no codec — frames are the samples): decodable
    * payloads produce a 16-bin sample-AMPLITUDE histogram over actual
    * 16-bit PCM frames (bin = (sample + 32768) >> 12 — deterministic
    * integer arithmetic). Non-decodable payloads (including the
    * synthesized fmt-only headers, which carry no data chunk) fall back
    * to [[byteHistogramSketch]], keeping the kernel total like the image
    * path. */
  private[functions] def decodeAudio(content: Array[Byte]): Array[Float] = {
    val in =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      catch { case _: Throwable => null }
    if (in == null) byteHistogramSketch(content)
    else {
      val fmt = in.getFormat
      val ok = fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
        fmt.getSampleSizeInBits == 16
      if (!ok) byteHistogramSketch(content)
      else {
        val bytes = in.readAllBytes()
        val hist = new Array[Float](16)
        val be = fmt.isBigEndian
        var i = 0
        var n = 0
        while (i + 1 < bytes.length) {
          val sample =
            if (be) ((bytes(i) << 8) | (bytes(i + 1) & 0xff)).toShort
            else ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort
          hist((sample + 32768) >> 12) += 1f
          n += 1
          i += fmt.getFrameSize / math.max(fmt.getChannels, 1)
        }
        if (n == 0) byteHistogramSketch(content)
        else { var j = 0; while (j < 16) { hist(j) /= n; j += 1 }; hist }
      }
    }
  }

  /** Fallback feature for non-decodable payloads: a byte-histogram sketch
    * — deterministic, content-sensitive, same 16-dim shape as the pixel
    * path so downstream schemas never branch on decodability. */
  private def byteHistogramSketch(content: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < content.length) { hist((content(i) & 0xff) % 16) += 1f; i += 1 }
    val n = math.max(content.length, 1).toFloat
    hist.map(_ / n)
  }

  /** REAL video feature extraction: walk the MP4 sample table
    * ([[Mp4.parse]]), pull every [[FrameEvery]]-th frame's byte range,
    * and ImageIO-decode each sampled frame — actual pixels for
    * MJPEG-in-MP4, where samples are JPEG stills the JDK can read. The
    * feature is the mean luminance histogram over the decodable sampled
    * frames. Payloads with no parseable sample table or no decodable
    * frames (non-JPEG codecs — no in-JVM decoder exists) fall back to
    * [[byteHistogramSketch]], keeping the kernel total. Decode cost is
    * O(sampled frame bytes), not O(video bytes): the table makes the
    * byte ranges addressable without a scan. */
  private[functions] def decodeVideo(content: Array[Byte]): Array[Float] = {
    Mp4.parse(content) match {
      case None => byteHistogramSketch(content)
      case Some(table) =>
        val acc = new Array[Float](16)
        var decoded = 0
        var i = 0
        while (i < table.nFrames) {
          val (off, len) = table.samples(i)
          if (off >= 0 && len > 0 && off + len <= content.length) {
            val frame = java.util.Arrays.copyOfRange(
              content, off.toInt, (off + len).toInt)
            val img =
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(frame))
              catch { case _: Throwable => null }
            if (img != null) {
              val hist = pixelHistogram(img)
              var j = 0
              while (j < 16) { acc(j) += hist(j); j += 1 }
              decoded += 1
            }
          }
          i += FrameEvery
        }
        if (decoded == 0) byteHistogramSketch(content)
        else { var j = 0; while (j < 16) { acc(j) /= decoded; j += 1 }; acc }
    }
  }

  /** feature extraction as a partition-local batched kernel: iterate the
    * partition in fixed-size batches (the Arrow-batch shape), decode each
    * batch, emit one small typed feature row per media row */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // batch boundary = where a vectorized codec would run once per chunk
        batch.iterator.map { m =>
          val emb = m.kind match {
            case "audio" => decodeAudio(m.content)
            case "video" => decodeVideo(m.content)
            case _       => decodeImage(m.content)
          }
          // probe the real container header rather than trusting carried meta:
          // at curation scale the binary column is the only source of truth
          val p = probeMedia(m.content)
          MediaFeature(m.media_id, m.kind, p.mime, m.content.length.toLong,
            p.width, p.height, p.sample_rate, emb)
        }
      }
    }
  }

  /** Image resize — REAL for decodable payloads: ImageIO decode →
    * bilinear Graphics2D rescale → re-encode in the source container
    * (PNG stays PNG, JPEG stays JPEG), all with JDK-only codecs. The
    * media bytes are rewritten in place within their partition (narrow
    * map, no shuffle — the transcode twin of [[extractFeatures]]'s
    * layout). Non-decodable image rows (truncated/corrupt at curation
    * scale, or the synthesized header-only fixtures) degrade to a
    * metadata-only retag rather than throwing, keeping the kernel total;
    * non-image rows pass through untouched. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { m =>
      if (m.kind != "image") m
      else {
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.content))
          catch { case _: Throwable => null }
        if (img == null) m.copy(meta = m.meta.copy(width = w, height = h))
        else {
          val out = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
          g.dispose()
          val fmt = if (m.meta.mime == "image/jpeg") "jpg" else "png"
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, fmt, baos)
          m.copy(content = baos.toByteArray,
            meta = m.meta.copy(width = w, height = h))
        }
      }
    }
  }

  case class FrameRef(media_id: Long, frame_idx: Long, byte_off: Long, n_bytes: Long)

  /** video frame sampling as byte-range indexing — the shape a 100 TB
    * video-curation pass needs: emit POINTERS (offset, length) into the
    * binary column for every k-th frame, so the expensive decode runs
    * only on sampled ranges and the full payload never leaves its
    * partition (no shuffle of media bytes; the output rows are 32 bytes
    * each whatever the video size).
    *
    * REAL: [[Mp4.parse]] walks the container's moov/stbl sample tables
    * (stsz sizes + stco chunk offsets + stsc chunk runs) — the offsets
    * come from the bytes, not from carried metadata. Videos with no
    * parseable sample table emit no refs (nothing is addressable without
    * an index; the degradation is per-row and silent, like the decode
    * fallbacks). Partition-local batched kernel like
    * [[extractFeatures]]. */
  def frameRefs(media: Dataset[MediaRow], every: Int = FrameEvery,
      batchSize: Int = 64): Dataset[FrameRef] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { m =>
          Mp4.parse(m.content).iterator.flatMap { table =>
            (0 until table.nFrames by every).iterator.flatMap { i =>
              val (off, len) = table.samples(i)
              // a truncated faststart file can carry a complete moov
              // whose table points past the surviving bytes — emit only
              // ranges the payload actually backs (decodeVideo applies
              // the same guard)
              if (off >= 0 && len >= 0 && off + len <= m.content.length)
                Iterator.single(FrameRef(m.media_id, i.toLong, off, len))
              else Iterator.empty
            }
          }
        }
      }
    }
  }

  val FrameEvery = 8

  /** declared query: the sampled-frame byte-range index over the
    * synthesized corpus — one row per kept frame. The Spark side parses
    * offsets/sizes back OUT of the real stsz/stco tables [[Mp4.write]]
    * encoded; the oracle replays the arithmetic the writer used (uniform
    * stride payload/nf from mdat data offset 24), so a one-byte drift in
    * either the box writer or the box parser breaks the hash. */
  def mediaFrames(s: SparkSession, dir: String): DataFrame =
    frameRefs(synthesizeMedia(s, dir)).toDF()
      .orderBy("media_id", "frame_idx")

  val mediaFramesSql: String =
    s"""WITH v AS (SELECT doc_id AS media_id, 24 + (doc_id % 100) AS nf,
       |    strlen(text)::BIGINT AS payload
       |  FROM documents WHERE doc_id % 3 = 2),
       |f AS (SELECT media_id, i::BIGINT AS frame_idx,
       |    (24 + i * (payload // nf))::BIGINT AS byte_off,
       |    (payload // nf)::BIGINT AS n_bytes
       |  FROM v JOIN generate_series(0, 200) g(i)
       |    ON i < nf AND i % $FrameEvery = 0)
       |SELECT media_id, frame_idx, byte_off, n_bytes FROM f
       |ORDER BY media_id, frame_idx""".stripMargin

  /** declared query: per-(kind, mime) stats over the PROBED container
    * metadata — every output value flows through probeMedia's byte-level
    * header parsing, so a probe or synthesis regression breaks the hash.
    * All aggregates are exact integers (counts + sums), so the DuckDB
    * oracle replays them with no float-rounding hazard. Media bytes stay
    * partition-local; only the small feature rows reach the exchange. */
  def mediaFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    extractFeatures(synthesizeMedia(s, dir))
      .groupBy("kind", "mime")
      .agg(count(lit(1)).as("n"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("width")).as("sum_w"),
        sum(col("height")).as("sum_h"),
        sum(col("sample_rate")).as("sum_rate"))
      .orderBy("kind", "mime")
  }

  /** the synthesis + probe replayed arithmetically: kind/mime/dims/rate
    * are pure functions of doc_id (synthesizeMedia's parameterization) and
    * n_bytes = container_overhead + byte-length(text), with overhead fixed
    * per container (PNG 33, JPEG 21, WAV 36) except MP4, whose overhead is
    * [[Mp4.overheadBase]] + 4·nf (the stsz table grows with frame count).
    * Video dims now flow through the tkhd box — written as 16.16 fixed
    * point, parsed back by the probe. The oracle agrees with the Spark
    * result only if the probe reads back exactly what the writers encoded
    * — a one-byte layout drift breaks the hash. */
  val mediaFeaturesSql: String =
    s"""SELECT
      |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |  CASE doc_id % 3
      |    WHEN 0 THEN CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'image/jpeg' END
      |    WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime,
      |  count(*) AS n,
      |  sum(CASE doc_id % 3
      |        WHEN 0 THEN CASE WHEN doc_id % 2 = 0 THEN 33 ELSE 21 END
      |        WHEN 1 THEN 36
      |        ELSE ${Mp4.overheadBase} + 4 * (24 + doc_id % 100) END
      |      + strlen(text))::BIGINT AS total_bytes,
      |  sum(CASE doc_id % 3 WHEN 0 THEN 64 + (doc_id % 64) * 16
      |        WHEN 2 THEN 160 + (doc_id % 16) * 16 ELSE 0 END)::BIGINT AS sum_w,
      |  sum(CASE doc_id % 3 WHEN 0 THEN 64 + (doc_id % 48) * 16
      |        WHEN 2 THEN 120 + (doc_id % 12) * 16 ELSE 0 END)::BIGINT AS sum_h,
      |  sum(CASE WHEN doc_id % 3 = 1 THEN 8000 + (doc_id % 5) * 2000 ELSE 0 END)::BIGINT AS sum_rate
      |FROM documents
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_media_features" -> mediaFeatures _,
    "q_media_frames" -> mediaFrames _)

  val oracle: Map[String, String] = Map(
    "q_media_features" -> mediaFeaturesSql,
    "q_media_frames" -> mediaFramesSql)
}
