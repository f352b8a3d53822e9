package graft

import graft.functions.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** multimodal plumbing: schema, determinism, batch shape, no-shuffle plan */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("synthesized media table matches the declared schema and is deterministic") {
    val m = Multimodal.synthesizeMedia(spark, TestSpark.sfDir)
    assert(m.toDF().schema === Multimodal.MediaSchema)
    val a = m.collect().map(r => (r.media_id, r.kind, r.content.toSeq)).sortBy(_._1).toSeq
    val b = Multimodal.synthesizeMedia(spark, TestSpark.sfDir)
      .collect().map(r => (r.media_id, r.kind, r.content.toSeq)).sortBy(_._1).toSeq
    assert(a === b)
    assert(a.map(_._2).toSet === Set("image", "audio", "video"))
  }

  test("feature extraction emits one feature row per media row, deterministically") {
    val media = Multimodal.synthesizeMedia(spark, TestSpark.sfDir)
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.length === media.count())
    f1.foreach { f =>
      assert(f.embedding.length === 16)
      val s = f.embedding.sum
      assert(math.abs(s - 1.0f) < 1e-3, s"histogram not normalized: $s")
    }
    val f2 = Multimodal.extractFeatures(media, batchSize = 7).collect().sortBy(_.media_id)
    assert(f1.map(_.embedding.toSeq).toSeq === f2.map(_.embedding.toSeq).toSeq,
      "batch size must not change results")
  }

  test("resize rewrites image metadata only") {
    val media = Multimodal.synthesizeMedia(spark, TestSpark.sfDir)
    val resized = Multimodal.resize(media, 32, 32).collect()
    resized.foreach { m =>
      if (m.kind == "image") assert(m.meta.width === 32 && m.meta.height === 32)
      else assert(m.meta.width != 32 || m.kind != "image")
    }
  }

  test("probeMedia re-reads exactly what the container writers encoded") {
    val rows = Multimodal.synthesizeMedia(spark, TestSpark.sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { m =>
      val p = Multimodal.probeMedia(m.content)
      assert(p.mime === m.meta.mime, s"media ${m.media_id}")
      m.kind match {
        case "image" =>
          assert(p.width === m.meta.width, s"media ${m.media_id}")
          assert(p.height === m.meta.height, s"media ${m.media_id}")
        case "audio" =>
          assert(p.sample_rate === m.meta.sample_rate, s"media ${m.media_id}")
        case _ =>
          // an mp4 ftyp box carries no dims/rate — the probe must say so
          // rather than echo the carried metadata
          assert(p.width === 0 && p.height === 0 && p.sample_rate === 0)
      }
    }
  }

  test("decode stub: known payloads give exact histogram embeddings") {
    import spark.implicits._
    val content = Array.tabulate(16)(_.toByte) // one byte per histogram bin
    val meta = Multimodal.MediaMeta("application/octet-stream", 0, 0, 0, 0)
    val img = Multimodal.extractFeatures(
      Seq(Multimodal.MediaRow(1L, "image", content, meta)).toDS()).collect().head
    assert(img.embedding.toSeq === Seq.fill(16)(1f / 16))
    assert(img.mime === "application/octet-stream" && img.n_bytes === 16L)
    // the video path frame-samples every 4th byte before the histogram
    val vid = Multimodal.extractFeatures(
      Seq(Multimodal.MediaRow(2L, "video", content, meta)).toDS()).collect().head
    assert(vid.embedding.toSeq === (0 until 16).map(i => if (i % 4 == 0) 0.25f else 0f))
  }

  test("q_media_features aggregates features without shuffling media bytes") {
    val df = functions.Multimodal.mediaFeatures(spark, TestSpark.sfDir)
    val rows = df.collect()
    assert(rows.length === 4) // image/png, image/jpeg, audio/wav, video/mp4
    // the only exchange in the plan must carry the small feature columns,
    // which happens after mapPartitions (media bytes stay narrow)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Exchange"))
    assert(!p.contains("content"), "binary payload leaked into the shuffle")
  }

  test("frameRefs: every-kth byte-range pointers match the uniform-stride model, videos only") {
    import spark.implicits._
    val media = functions.Multimodal.synthesizeMedia(spark, TestSpark.sfDir)
    val refs = functions.Multimodal.frameRefs(media).collect()
      .groupBy(_.media_id).view.mapValues(_.sortBy(_.frame_idx)).toMap
    val videos = media.collect().filter(_.kind == "video")
    assert(videos.nonEmpty && refs.keySet === videos.map(_.media_id).toSet,
      "exactly the video rows produce frame refs")
    videos.foreach { m =>
      val nf = m.meta.n_frames
      val stride = (m.content.length - 12L) / nf
      val expect = (0 until nf by functions.Multimodal.FrameEvery)
        .map(i => (i.toLong, 12L + i * stride, stride))
      val got = refs(m.media_id).map(r => (r.frame_idx, r.byte_off, r.n_bytes)).toSeq
      assert(got === expect, s"media ${m.media_id}")
    }
  }
}
