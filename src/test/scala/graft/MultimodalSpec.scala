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
          // video dims/frame-count travel through real boxes now: tkhd
          // 16.16 fixed-point dims and the stsz sample count must parse
          // back to exactly what the writer encoded
          assert(p.width === m.meta.width, s"media ${m.media_id}")
          assert(p.height === m.meta.height, s"media ${m.media_id}")
          assert(p.n_frames === m.meta.n_frames, s"media ${m.media_id}")
      }
    }
  }

  test("decode fallback: non-decodable payloads give the exact byte-sketch histogram") {
    import spark.implicits._
    val content = Array.tabulate(16)(_.toByte) // one byte per histogram bin
    val meta = Multimodal.MediaMeta("application/octet-stream", 0, 0, 0, 0)
    val img = Multimodal.extractFeatures(
      Seq(Multimodal.MediaRow(1L, "image", content, meta)).toDS()).collect().head
    assert(img.embedding.toSeq === Seq.fill(16)(1f / 16))
    assert(img.mime === "application/octet-stream" && img.n_bytes === 16L)
    // a video payload with no parseable MP4 structure takes the same
    // total fallback — the kernel must not throw on arbitrary bytes
    val vid = Multimodal.extractFeatures(
      Seq(Multimodal.MediaRow(2L, "video", content, meta)).toDS()).collect().head
    assert(vid.embedding.toSeq === Seq.fill(16)(1f / 16))
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

  test("frameRefs: every-kth byte ranges come from the parsed stsz/stco tables, videos only") {
    import spark.implicits._
    val media = functions.Multimodal.synthesizeMedia(spark, TestSpark.sfDir)
    val refs = functions.Multimodal.frameRefs(media).collect()
      .groupBy(_.media_id).view.mapValues(_.sortBy(_.frame_idx)).toMap
    val videos = media.collect().filter(_.kind == "video")
    assert(videos.nonEmpty && refs.keySet === videos.map(_.media_id).toSet,
      "exactly the video rows produce frame refs")
    videos.foreach { m =>
      // writer invariant: file = payload + overheadBase + 4·nf, samples
      // laid back-to-back from the mdat data offset with uniform stride
      val nf = m.meta.n_frames
      val payload = m.content.length - functions.Mp4.overheadBase - 4L * nf
      val stride = payload / nf
      val expect = (0 until nf by functions.Multimodal.FrameEvery)
        .map(i => (i.toLong, 24L + i * stride, stride))
      val got = refs(m.media_id).map(r => (r.frame_idx, r.byte_off, r.n_bytes)).toSeq
      assert(got === expect, s"media ${m.media_id}")
    }
    // a video whose bytes carry no sample table is unaddressable: no refs
    val noIdx = Multimodal.MediaRow(99L, "video", Array.tabulate(64)(_.toByte),
      Multimodal.MediaMeta("video/mp4", 0, 0, 0, 5))
    assert(functions.Multimodal.frameRefs(Seq(noIdx).toDS()).collect().isEmpty)
  }

  /** a REAL MJPEG-in-MP4: JPEG stills (encoded by ImageIO) as the MP4
    * samples, indexed by a real stsz table with per-frame sizes */
  private def mjpegVideo(shades: Seq[Int], w: Int, h: Int): (Array[Byte], Seq[Array[Byte]]) = {
    val frames = shades.map(v => realImage("jpg", w, h, (v << 16) | (v << 8) | v))
    (functions.Mp4.write(frames.reduce(_ ++ _), frames.map(_.length).toArray, w, h,
      "jpeg"), frames)
  }

  test("real MJPEG MP4: sample table indexes actual JPEG frames, decode reads their pixels") {
    import spark.implicits._
    // 9 frames so sampling every 8th keeps frames 0 and 8; both solid
    // gray 200 → all luminance mass in bin 12 (as in the still test)
    val shades = Seq(200, 40, 40, 40, 40, 40, 40, 40, 200)
    val (mp4, frames) = mjpegVideo(shades, 6, 4)
    // probe: tkhd dims and stsz count read back from real boxes
    val p = Multimodal.probeMedia(mp4)
    assert(p.mime === "video/mp4" && p.width === 6 && p.height === 4
      && p.n_frames === 9)
    // frameRefs: per-frame sizes differ (JPEG output is content-dependent)
    // so this exercises the stsz TABLE, not a uniform stride
    val row = Multimodal.MediaRow(7L, "video", mp4,
      Multimodal.MediaMeta("video/mp4", 6, 4, 0, 9))
    val refs = functions.Multimodal.frameRefs(Seq(row).toDS(), every = 1)
      .collect().sortBy(_.frame_idx)
    assert(refs.length === 9)
    val expectOffs = frames.map(_.length.toLong).scanLeft(24L)(_ + _).init
    assert(refs.map(_.byte_off).toSeq === expectOffs)
    assert(refs.map(_.n_bytes).toSeq === frames.map(_.length.toLong))
    // and the indexed ranges really are the JPEG bytes
    refs.zip(frames).foreach { case (r, f) =>
      assert(java.util.Arrays.equals(java.util.Arrays.copyOfRange(
        mp4, r.byte_off.toInt, (r.byte_off + r.n_bytes).toInt), f))
    }
    // decode: sampled frames (0 and 8, both gray 200) run the actual JPEG
    // codec — mean histogram has all mass in luminance bin 12; the dark
    // unsampled frames (bin 2) must NOT contribute
    val feat = Multimodal.extractFeatures(Seq(row).toDS()).collect().head
    assert(feat.embedding(12) === 1.0f,
      s"expected sampled-frame mass in bin 12, got ${feat.embedding.toSeq}")
    assert(feat.width === 6 && feat.height === 4)
    // corrupting the moov index degrades to the byte sketch, not a throw
    val broken = mp4.clone()
    val moovAt = mp4.indexOfSlice("moov".getBytes("US-ASCII"))
    broken(moovAt) = 'x'.toByte
    val fb = Multimodal.extractFeatures(Seq(row.copy(content = broken)).toDS())
      .collect().head
    assert(fb.embedding.toSeq !== feat.embedding.toSeq)
  }

  test("Mp4.parse / decodeVideo are total: arbitrary and truncated bytes never throw") {
    // deterministic xorshift byte soup — the parser runs on untrusted
    // bytes at curation scale, so every malformed shape must return
    // None / fall back, never escape an exception past the kernel
    var state = 0x9e3779b97f4a7c15L
    def next(): Long = {
      state ^= state << 13; state ^= state >>> 7; state ^= state << 17; state
    }
    for (len <- Seq(0, 1, 7, 8, 15, 16, 64, 333, 4096)) {
      val junk = Array.fill(len)((next() & 0xff).toByte)
      assert(Multimodal.probeMedia(junk) != null)
      assert(functions.Mp4.parse(junk).forall(_.nFrames >= 0))
      // junk prefixed with a valid-looking ftyp must also be safe
      if (len >= 8) {
        val withFtyp = junk.clone()
        Array[Byte](0, 0, 0, 16).copyToArray(withFtyp, 0)
        "ftyp".getBytes("US-ASCII").copyToArray(withFtyp, 4)
        assert(functions.Mp4.parse(withFtyp).forall(_.nFrames >= 0))
      }
    }
    // every truncation point of a VALID file parses to None or a
    // consistent table — no index-out-of-bounds at any boundary
    val (mp4, _) = mjpegVideo(Seq(200, 40, 200), 4, 4)
    for (cut <- 0 to mp4.length by 7) {
      val sliced = java.util.Arrays.copyOfRange(mp4, 0, cut)
      functions.Mp4.parse(sliced).foreach { t =>
        assert(t.nFrames >= 0 && t.samples.forall(_._2 >= 0))
      }
    }
  }

  test("crafted stsz bomb: a tiny file claiming 2^31 uniform samples is rejected, not allocated") {
    // hand-assembled ftyp + moov/trak/mdia/minf/stbl{stsz,stco}: the
    // uniform-size stsz claims sample_size=1, sample_count=0x7ffffffe —
    // a ~100-byte file that would demand a multi-GB array if the parser
    // trusted the count instead of bounding it by the file's capacity
    def box(tag: String, body: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + body.length)
      b.putInt(8 + body.length).put(tag.getBytes("US-ASCII")).put(body)
      b.array
    }
    def be(ints: Int*): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(4 * ints.length)
      ints.foreach(b.putInt); b.array
    }
    val stsz = box("stsz", be(0, 1, 0x7ffffffe)) // ver/flags, size=1, count
    val stco = box("stco", be(0, 1, 24))
    val bomb = box("ftyp", "isomiso2".getBytes("US-ASCII")) ++
      box("moov", box("trak", box("mdia", box("minf", box("stbl", stsz ++ stco)))))
    assert(functions.Mp4.parse(bomb).isEmpty, "bomb stsz must not produce a table")
    assert(Multimodal.probeMedia(bomb).n_frames === 0)
  }

  test("sample table pointing past EOF: frameRefs emits nothing, decode falls back") {
    import spark.implicits._
    // a truncated-faststart-shaped failure: complete moov, missing data —
    // the one stsz entry claims 100000 bytes the payload doesn't have
    val dangling = functions.Mp4.write(Array[Byte](1, 2, 3), Array(100000), 8, 8)
    val row = Multimodal.MediaRow(1L, "video", dangling,
      Multimodal.MediaMeta("video/mp4", 8, 8, 0, 1))
    assert(functions.Multimodal.frameRefs(Seq(row).toDS(), every = 1)
      .collect().isEmpty, "byte ranges past EOF must not be emitted")
    val feat = Multimodal.extractFeatures(Seq(row).toDS()).collect().head
    assert(feat.embedding.sum > 0f) // byte-sketch fallback, not a throw
  }

  /** a REAL encoded image (JDK ImageIO), w×h pixels of one solid RGB
    * color — the decode cases below run the actual PNG/JPEG codecs on it */
  private def realImage(fmt: String, w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, baos)
    baos.toByteArray
  }

  test("real PNG/JPEG bytes: decode reads actual pixels, probe reads actual headers") {
    import spark.implicits._
    // solid gray level 200 → luminance 200 → histogram bin 12 gets all mass
    val gray = (200 << 16) | (200 << 8) | 200
    val png = realImage("png", 5, 3, gray)
    val jpg = realImage("jpg", 7, 4, gray)
    // byte-level header probe against files a real encoder wrote (not our
    // own synth writers): PNG IHDR dims and JPEG SOF dims must read back
    val pp = Multimodal.probeMedia(png)
    assert(pp.mime === "image/png" && pp.width === 5 && pp.height === 3)
    val pj = Multimodal.probeMedia(jpg)
    assert(pj.mime === "image/jpeg" && pj.width === 7 && pj.height === 4)

    val meta = Multimodal.MediaMeta("image/png", 0, 0, 0, 1)
    val feats = Multimodal.extractFeatures(Seq(
        Multimodal.MediaRow(1L, "image", png, meta),
        Multimodal.MediaRow(2L, "image", jpg, meta.copy(mime = "image/jpeg"))).toDS())
      .collect().sortBy(_.media_id)
    // pixel-path histograms: all luminance mass in bin 12 (JPEG solid-color
    // blocks decode exactly at quality defaults; any codec round-trip drift
    // would land in a neighboring bin and fail)
    feats.foreach { f =>
      assert(f.embedding(12) === 1.0f,
        s"media ${f.media_id}: expected all mass in luminance bin 12, " +
          s"got ${f.embedding.toSeq}")
      assert(f.width > 0 && f.height > 0)
    }
    // and on the SAME bytes with a corrupted signature the decode falls
    // back to the byte sketch, which gives a different shape — proving the
    // pixel path, not the fallback, produced the bin-12 histogram above
    val broken = png.clone(); broken(0) = 0
    val sketchLike = Multimodal.extractFeatures(Seq(
        Multimodal.MediaRow(3L, "image", broken, meta)).toDS()).collect().head
    assert(sketchLike.embedding.toSeq !== feats.head.embedding.toSeq)
  }

  test("real WAV bytes: audio decode reads actual PCM samples") {
    import spark.implicits._
    // 64 frames of a ±16384 square wave, 16-bit mono PCM little-endian:
    // +16384 → amplitude bin 12, -16384 → bin 4, half the mass each
    val samples = Array.tabulate[Short](64)(i => if (i % 2 == 0) 16384 else -16384)
    val pcm = new Array[Byte](samples.length * 2)
    for (i <- samples.indices) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    val wav = baos.toByteArray

    val meta = Multimodal.MediaMeta("audio/wav", 0, 0, 8000, 0)
    val feat = Multimodal.extractFeatures(Seq(
        Multimodal.MediaRow(1L, "audio", wav, meta)).toDS()).collect().head
    assert(feat.embedding(12) === 0.5f && feat.embedding(4) === 0.5f,
      s"expected half mass in amplitude bins 4 and 12, got ${feat.embedding.toSeq}")
    // the header probe reads the real encoder's fmt chunk too
    val p = Multimodal.probeMedia(wav)
    assert(p.mime === "audio/wav" && p.sample_rate === 8000)
    // corrupted RIFF tag → total fallback, different shape
    val broken = wav.clone(); broken(0) = 0
    val fb = Multimodal.extractFeatures(Seq(
        Multimodal.MediaRow(2L, "audio", broken, meta)).toDS()).collect().head
    assert(fb.embedding.toSeq !== feat.embedding.toSeq)
  }

  test("resize on a real PNG transcodes: new dims decode back, content rewritten") {
    import spark.implicits._
    val gray = (64 << 16) | (64 << 8) | 64
    val png = realImage("png", 8, 8, gray)
    val meta = Multimodal.MediaMeta("image/png", 8, 8, 0, 1)
    val out = Multimodal.resize(
      Seq(Multimodal.MediaRow(1L, "image", png, meta)).toDS(), 4, 2).collect().head
    assert(out.meta.width === 4 && out.meta.height === 2)
    assert(out.content.toSeq !== png.toSeq, "payload not transcoded")
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out.content))
    assert(back != null && back.getWidth === 4 && back.getHeight === 2)
    // solid input stays solid through a bilinear rescale
    assert((back.getRGB(0, 0) & 0xffffff) === gray)
    // non-decodable image rows still take the metadata-only path, total
    val synth = Multimodal.synthesizeMedia(spark, TestSpark.sfDir)
    val resized = Multimodal.resize(synth, 32, 32).collect()
    resized.filter(_.kind == "image").foreach { m =>
      assert(m.meta.width === 32 && m.meta.height === 32)
    }
  }
}
