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
  * javax.sound.sampled — no external dependency), with a deterministic
  * byte-sketch fallback for non-decodable payloads so the kernels are
  * total. Compressed-audio resampling and video frame DECODE have no
  * in-JVM codec, so those interiors remain deterministic STUBS (clearly
  * marked below); everything around them — schema, typed rows,
  * partition-local batch loop, output contract — is the real Spark
  * plumbing a codec drops into.
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

  /** MP4 ftyp box (12 bytes): big-endian box size + 'ftyp' + brand */
  private def mp4Header(): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(12)
    b.putInt(12).put("ftyp".getBytes("US-ASCII")).put("isom".getBytes("US-ASCII"))
    b.array
  }

  /** byte-level container probe — real parsing, no codec: PNG IHDR dims
    * (big-endian at 16/20), JPEG marker scan to SOF0–SOF3 (height then
    * width), WAV fmt chunk (little-endian rate at 24), MP4 ftyp box.
    * This is the format-sniffing a 100 TB media-curation pass runs per
    * row before deciding to decode at all — header-only, so the scan
    * cost is independent of payload size. */
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
      MediaMeta("video/mp4", 0, 0, 0, 0)
    else MediaMeta("application/octet-stream", 0, 0, 0, 0)
  }

  /** deterministic synthetic media table derived from `documents`: the
    * binary column is a REAL container header (PNG/JPEG/WAV/MP4 byte
    * layout, parameterized by doc_id) followed by the doc text as an
    * opaque payload — so header probing downstream exercises actual
    * byte-format parsing, not carried metadata */
  def synthesizeMedia(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes("UTF-8")
        val kind = Seq("image", "audio", "video")((id % 3).toInt)
        val (header, meta) = kind match {
          case "image" =>
            val w = 64 + (id % 64).toInt * 16
            val h = 64 + (id % 48).toInt * 16
            if (id % 2 == 0) (pngHeader(w, h), MediaMeta("image/png", w, h, 0, 1))
            else (jpegHeader(w, h), MediaMeta("image/jpeg", w, h, 0, 1))
          case "audio" =>
            val rate = 8000 + (id % 5).toInt * 2000
            (wavHeader(rate, payload.length), MediaMeta("audio/wav", 0, 0, rate, 0))
          case _ =>
            (mp4Header(), MediaMeta("video/mp4", 320, 240, 0, 24 + (id % 100).toInt))
        }
        MediaRow(id, kind, header ++ payload, meta)
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
  private[functions] def decodeImage(content: Array[Byte], meta: MediaMeta): Array[Float] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      catch { case _: Throwable => null }
    if (img == null) byteHistogramSketch(content)
    else {
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

  /** ??? STUB ??? — a real implementation resamples audio / samples video
    * frames; fake keeps every k-th byte (frame-sampling shape) */
  private def frameSampleStub(content: Array[Byte], k: Int): Array[Byte] = {
    val out = new Array[Byte]((content.length + k - 1) / k)
    var i = 0
    while (i < out.length) { out(i) = content(i * k); i += 1 }
    out
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
            case "video" => decodeImage(frameSampleStub(m.content, 4), m.meta)
            case _       => decodeImage(m.content, m.meta)
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
    * ??? STUB ??? — a real implementation walks the MP4 sample tables
    * (moov/stbl: stsz sizes + stco chunk offsets) to index frames; the
    * 12-byte ftyp synth header has no sample table, so the fake assumes
    * uniform stride payload/n_frames with n_frames from carried metadata.
    * Partition-local batched kernel like [[extractFeatures]]. */
  def frameRefs(media: Dataset[MediaRow], every: Int = FrameEvery,
      batchSize: Int = 64): Dataset[FrameRef] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { m =>
          val header = 12L // ftyp box — the only container structure present
          val payload = m.content.length - header
          val nf = m.meta.n_frames
          val stride = if (nf > 0) payload / nf else 0L
          (0 until nf by every).iterator
            .map(i => FrameRef(m.media_id, i.toLong, header + i * stride, stride))
        }
      }
    }
  }

  val FrameEvery = 8

  /** declared query: the sampled-frame byte-range index over the
    * synthesized corpus — one row per kept frame, pinned arithmetically
    * by the oracle (n_frames, stride, offsets are pure functions of
    * doc_id and text length, so a kernel or synthesis drift breaks the
    * hash) */
  def mediaFrames(s: SparkSession, dir: String): DataFrame =
    frameRefs(synthesizeMedia(s, dir)).toDF()
      .orderBy("media_id", "frame_idx")

  val mediaFramesSql: String =
    s"""WITH v AS (SELECT doc_id AS media_id, 24 + (doc_id % 100) AS nf,
       |    strlen(text)::BIGINT AS payload
       |  FROM documents WHERE doc_id % 3 = 2),
       |f AS (SELECT media_id, i::BIGINT AS frame_idx,
       |    (12 + i * (payload // nf))::BIGINT AS byte_off,
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
    * n_bytes = header_len + byte-length(text), with header_len fixed per
    * container (PNG 33, JPEG 21, WAV 36, MP4 12). The oracle agrees with
    * the Spark result only if the probe reads back exactly what the
    * header writers encoded — a one-byte layout drift breaks the hash. */
  val mediaFeaturesSql: String =
    """SELECT
      |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |  CASE doc_id % 3
      |    WHEN 0 THEN CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'image/jpeg' END
      |    WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime,
      |  count(*) AS n,
      |  sum(CASE doc_id % 3
      |        WHEN 0 THEN CASE WHEN doc_id % 2 = 0 THEN 33 ELSE 21 END
      |        WHEN 1 THEN 36 ELSE 12 END
      |      + strlen(text))::BIGINT AS total_bytes,
      |  sum(CASE WHEN doc_id % 3 = 0 THEN 64 + (doc_id % 64) * 16 ELSE 0 END)::BIGINT AS sum_w,
      |  sum(CASE WHEN doc_id % 3 = 0 THEN 64 + (doc_id % 48) * 16 ELSE 0 END)::BIGINT AS sum_h,
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
