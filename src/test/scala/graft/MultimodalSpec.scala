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

  test("q_media_features aggregates features without shuffling media bytes") {
    val df = functions.Multimodal.mediaFeatures(spark, TestSpark.sfDir)
    val rows = df.collect()
    assert(rows.length === 3)
    // the only exchange in the plan must carry the small feature columns,
    // which happens after mapPartitions (media bytes stay narrow)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Exchange"))
    assert(!p.contains("content"), "binary payload leaked into the shuffle")
  }
}
