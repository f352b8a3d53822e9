package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Minimal ISO BMFF (MP4) container writer + sample-table parser — pure
  * JVM, no codec, public-knowledge byte layout (ISO/IEC 14496-12).
  *
  * Why this exists: a 100 TB video-curation pass must locate frame byte
  * ranges WITHOUT decoding — the container's `stbl` sample table (stsz
  * sizes, stco chunk offsets, stsc chunk runs) is the index that makes
  * frame sampling O(sampled frames), not O(video bytes). The writer
  * produces a structurally real `ftyp`+`mdat`+`moov` file (mvhd/tkhd/
  * mdhd/hdlr/stsd/stts/stsc/stsz/stco, all version-0 boxes); the parser
  * walks generic boxes and implements the standard stsc chunk-run →
  * per-sample offset algorithm, so it reads real muxer output too (e.g.
  * the MJPEG fixtures MultimodalSpec encodes with ImageIO).
  *
  * Reference behavior being generalized: the reference stores opaque
  * payloads and queries structured metadata (README.md:132-137); here the
  * binary column is the payload and the sample table is the queryable
  * structure.
  */
object Mp4 {

  /** parsed sample table: codec fourcc, visual dims (from tkhd 16.16
    * fixed-point), and one (byteOffset, byteLength) per sample */
  final case class SampleTable(fourcc: String, width: Int, height: Int,
      samples: Array[(Long, Long)]) {
    def nFrames: Int = samples.length
  }

  // ---- writer ----

  private def box(tag: String, body: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(8 + body.length)
    b.putInt(8 + body.length).put(tag.getBytes("US-ASCII")).put(body)
    b.array
  }

  private def fullBox(tag: String, body: Array[Byte]): Array[Byte] =
    box(tag, Array[Byte](0, 0, 0, 0) ++ body)

  private def be(ints: Int*): Array[Byte] = {
    val b = ByteBuffer.allocate(4 * ints.length)
    ints.foreach(b.putInt)
    b.array
  }

  private def identityMatrix: Array[Byte] =
    be(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)

  /** Build a real MP4: 16-byte `ftyp`, `mdat` holding `payload`, and a
    * `moov` whose `stbl` indexes `sizes` consecutive samples starting at
    * the mdat data offset (one chunk, stco[0] = 24). `sizes` must sum to
    * ≤ payload.length; trailing unindexed bytes are legal (real muxers
    * leave free space too). Timescale 1000, 40 ms/frame (25 fps). */
  def write(payload: Array[Byte], sizes: Array[Int], w: Int, h: Int,
      fourcc: String = "jpeg"): Array[Byte] = {
    require(fourcc.length == 4, "fourcc must be 4 chars")
    val nf = sizes.length
    val duration = 40 * nf
    val ftyp = box("ftyp", "isomiso2".getBytes("US-ASCII"))
    val mdat = box("mdat", payload)
    val dataStart = ftyp.length + 8 // first mdat payload byte

    val mvhd = fullBox("mvhd", be(0, 0, 1000, duration, 0x10000) ++
      Array[Byte](1, 0, 0, 0) ++ be(0, 0) ++ identityMatrix ++
      be(0, 0, 0, 0, 0, 0, 2))
    val tkhd = fullBox("tkhd", be(0, 0, 1, 0, duration, 0, 0) ++
      Array[Byte](0, 0, 0, 0, 0, 0, 0, 0) ++ identityMatrix ++
      be(w << 16, h << 16))
    val mdhd = fullBox("mdhd", be(0, 0, 1000, duration) ++
      Array[Byte](0x55, 0xc4.toByte, 0, 0))
    val hdlr = fullBox("hdlr",
      be(0) ++ "vide".getBytes("US-ASCII") ++ new Array[Byte](12 + 1))

    // VisualSampleEntry (86 bytes): the codec-identifying child of stsd
    val entryBody = {
      val b = ByteBuffer.allocate(78)
      b.put(new Array[Byte](6)).putShort(1)               // data_ref_index
      b.putShort(0).putShort(0).putInt(0).putInt(0).putInt(0)
      b.putShort(w.toShort).putShort(h.toShort)
      b.putInt(0x480000).putInt(0x480000).putInt(0)       // 72 dpi
      b.putShort(1).put(new Array[Byte](32))              // compressorname
      b.putShort(24).putShort(-1)                         // depth, pre_defined
      b.array
    }
    val stsd = fullBox("stsd", be(1) ++ box(fourcc, entryBody))
    val stts = fullBox("stts", be(1, nf, 40))
    val stsc = fullBox("stsc", be(1, 1, nf, 1))
    val stsz = fullBox("stsz", be(0, nf) ++ be(sizes: _*))
    val stco = fullBox("stco", be(1, dataStart))

    val stbl = box("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco)
    val minf = box("minf", stbl)
    val mdia = box("mdia", mdhd ++ hdlr ++ minf)
    val trak = box("trak", tkhd ++ mdia)
    val moov = box("moov", mvhd ++ trak)

    val out = new ByteArrayOutputStream(ftyp.length + mdat.length + moov.length)
    out.write(ftyp); out.write(mdat); out.write(moov)
    out.toByteArray
  }

  /** container overhead in bytes beyond the mdat payload, as a function
    * of frame count: total = payload + [[overheadBase]] + 4·nf (the stsz
    * table is the only frame-count-dependent structure). The media-
    * features oracle replays file sizes arithmetically from this. */
  lazy val overheadBase: Int = {
    val probe = write(Array[Byte](1, 2, 3), Array(3), 16, 16)
    probe.length - 3 - 4
  }

  // ---- parser ----

  private final class Reader(buf: Array[Byte]) {
    def u8(i: Long): Int = buf(i.toInt) & 0xff
    def u16(i: Long): Int = (u8(i) << 8) | u8(i + 1)
    def u32(i: Long): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def u64(i: Long): Long = (u32(i) << 32) | u32(i + 4)
    def tag(i: Long): String = new String(buf, i.toInt, 4, "US-ASCII")
    def len: Long = buf.length.toLong
  }

  /** walk the children of [start, end), invoking f(tag, bodyStart,
    * bodyEnd) per box; malformed sizes terminate the walk (total parse,
    * never throws past its own bounds checks) */
  private def walk(r: Reader, start: Long, end: Long)(
      f: (String, Long, Long) => Unit): Unit = {
    var i = start
    while (i + 8 <= end) {
      val size0 = r.u32(i)
      val tag = r.tag(i + 4)
      val (size, hdr) =
        if (size0 == 1 && i + 16 <= end) (r.u64(i + 8), 16L)
        else if (size0 == 0) (end - i, 8L) // box extends to end
        else (size0, 8L)
      if (size < hdr || i + size > end) return // malformed — stop
      f(tag, i + hdr, i + size)
      i += size
    }
  }

  private val Containers = Set("moov", "trak", "mdia", "minf", "stbl")

  /** Parse the first video-bearing sample table. Returns None unless the
    * bytes are a structurally valid MP4 with ftyp + a complete stbl
    * (stsz + stco/co64; stsc defaults to one run of all samples when
    * absent, matching single-chunk files). Per-sample offsets follow the
    * standard stsc chunk-run expansion: for each chunk run, consecutive
    * chunks hold `samplesPerChunk` samples laid out back-to-back from the
    * chunk's stco offset. */
  def parse(content: Array[Byte]): Option[SampleTable] = {
    if (content.length < 16) return None
    val r = new Reader(content)
    if (r.tag(4) != "ftyp") return None
    var fourcc: String = null
    var w, h = 0
    var sizes: Array[Long] = null
    var chunkOffsets: Array[Long] = null
    // stsc runs: (firstChunk, samplesPerChunk)
    var runs: Array[(Long, Long)] = null

    def visit(tag: String, s: Long, e: Long): Unit = tag match {
      case t if Containers(t) => walk(r, s, e)(visit)
      case "tkhd" if e - s >= 84 =>
        // v0 layout: width/height are the LAST 8 bytes either version
        w = (r.u32(e - 8) >> 16).toInt
        h = (r.u32(e - 4) >> 16).toInt
      case "stsd" if e - s >= 16 =>
        // first sample entry's fourcc sits 4 bytes into the entry box
        if (fourcc == null) fourcc = r.tag(s + 12)
      case "stsz" if e - s >= 12 =>
        val uniform = r.u32(s + 4)
        val n = r.u32(s + 8)
        // allocation bound on UNTRUSTED counts: n uniform samples of
        // `uniform` bytes must physically fit in the file, and a table
        // of n entries must fit in the box — without this a ~60-byte
        // crafted stsz claiming 2^31 samples allocates gigabytes
        if (uniform != 0) {
          if (n <= r.len / uniform) sizes = Array.fill(n.toInt)(uniform)
        } else if (e - s >= 12 + 4 * n)
          sizes = Array.tabulate(n.toInt)(i => r.u32(s + 12 + 4L * i))
      case "stco" if e - s >= 8 =>
        val n = r.u32(s + 4)
        if (e - s >= 8 + 4 * n)
          chunkOffsets = Array.tabulate(n.toInt)(i => r.u32(s + 8 + 4L * i))
      case "co64" if e - s >= 8 =>
        val n = r.u32(s + 4)
        if (e - s >= 8 + 8 * n)
          chunkOffsets = Array.tabulate(n.toInt)(i => r.u64(s + 8 + 8L * i))
      case "stsc" if e - s >= 8 =>
        val n = r.u32(s + 4)
        if (e - s >= 8 + 12 * n)
          runs = Array.tabulate(n.toInt)(i =>
            (r.u32(s + 8 + 12L * i), r.u32(s + 12 + 12L * i)))
      case _ => ()
    }
    try walk(r, 0, r.len)(visit)
    catch { case _: IndexOutOfBoundsException => return None }

    if (sizes == null || chunkOffsets == null || chunkOffsets.isEmpty)
      return None
    val effRuns =
      if (runs == null || runs.isEmpty) Array((1L, sizes.length.toLong))
      else runs
    val samples = new Array[(Long, Long)](sizes.length)
    var sample = 0
    var run = 0
    var chunk = 1L
    while (sample < sizes.length && chunk <= chunkOffsets.length) {
      val perChunk =
        effRuns(run)._2.min(Int.MaxValue).toInt
      var off = chunkOffsets((chunk - 1).toInt)
      var k = 0
      while (k < perChunk && sample < sizes.length) {
        samples(sample) = (off, sizes(sample))
        off += sizes(sample)
        sample += 1
        k += 1
      }
      chunk += 1
      if (run + 1 < effRuns.length && chunk >= effRuns(run + 1)._1) run += 1
    }
    if (sample < sizes.length) None // index incomplete — treat as unparsable
    else Some(SampleTable(if (fourcc == null) "????" else fourcc, w, h, samples))
  }
}
