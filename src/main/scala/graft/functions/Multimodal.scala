package graft.functions

import graft.util._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for a training-data pipeline (builder-prompt north
  * star): image/audio/video as opaque BINARY columns with typed metadata,
  * processed by per-partition batch operators.
  *
  * The actual codecs are NOT in this environment, so the decode kernels are
  * deterministic STUBS (clearly marked below); everything around them —
  * schema, typed rows, partition-local batch loop, output contract — is the
  * real Spark plumbing a codec would drop into.
  *
  * Scale design: media bytes never shuffle — all kernels are mapPartitions
  * (narrow, no exchange); only the small extracted features flow into joins
  * and aggregations downstream. Batches of 64 rows bound per-call overhead
  * the way Arrow record batches do for vectorized UDFs.
  */
object Multimodal {

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
  case class MediaFeature(media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, embedding: Array[Float])

  /** deterministic synthetic media table derived from `documents` — the
    * binary column is the doc text's bytes, metadata derived from doc_id */
  def synthesizeMedia(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val kind = Seq("image", "audio", "video")((id % 3).toInt)
        val meta = kind match {
          case "image" => MediaMeta("image/png", 64 + (id % 64).toInt * 16, 64 + (id % 48).toInt * 16, 0, 1)
          case "audio" => MediaMeta("audio/wav", 0, 0, 16000, 0)
          case _       => MediaMeta("video/mp4", 320, 240, 0, 24 + (id % 100).toInt)
        }
        MediaRow(id, kind, text.getBytes("UTF-8"), meta)
      }
  }

  /** ??? STUB ??? — a real implementation calls an image codec here.
    * Deterministic fake: "pixels" are a byte-histogram sketch of the
    * payload. Signature and batch shape are what a codec needs. */
  private def decodeImageStub(content: Array[Byte], meta: MediaMeta): Array[Float] = {
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
          val sampled = if (m.kind == "video") frameSampleStub(m.content, 4) else m.content
          val emb = decodeImageStub(sampled, m.meta)
          MediaFeature(m.media_id, m.kind, m.content.length.toLong,
            m.meta.width, m.meta.height, emb)
        }
      }
    }
  }

  /** ??? STUB ??? — resize: recompute metadata, payload untouched (a codec
    * would transcode); demonstrates metadata-typed transforms */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map(m => if (m.kind == "image")
      m.copy(meta = m.meta.copy(width = w, height = h)) else m)
  }

  /** declared query: per-kind feature stats off the extracted embeddings —
    * media bytes stay partition-local; only 16-float features aggregate */
  def mediaFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    extractFeatures(synthesizeMedia(s, dir))
      .map(f => (f.kind, f.n_bytes, math.sqrt(f.embedding.map(x => x.toDouble * x).sum)))
      .toDF("kind", "n_bytes", "norm")
      .groupBy("kind")
      .agg(count(lit(1)).as("n"), sum(col("n_bytes")).as("total_bytes"),
        r4f(sum(col("norm")) / count(lit(1))).as("avg_norm"))
      .orderBy("kind")
  }

  val queries: Map[String, Q] = Map("q_media_features" -> mediaFeatures _)
}
