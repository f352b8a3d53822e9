package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exact substring dedup (Lee et al. 2022, arXiv:2107.06499 §4.1 — the
  * char-L-gram fingerprint form; SURVEY.md §2 B.11): planted duplicated
  * runs with hand-computed span expectations, keep-first exemption,
  * within-doc repeats, whole-doc duplication, and the incremental probe.
  * The declared queries are ALSO oracle-checked against DuckDB on the
  * real tables; this spec pins the semantics the oracle can't name —
  * which doc keeps its copy, and exactly which characters go. */
class SubstringDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val L = operators.Dedup.SubstrL

  // planted corpus ------------------------------------------------------
  // S: a 41-char run shared by docs 10 and 11 (and 14, a full copy of 10)
  private val S = "0123456789abcdefghijklmnopqrstuvwxyz ABC"   // 40 chars
  // T: a 35-char run repeated WITHIN doc 12
  private val T = "zyxwvutsrqponmlkjihgfedcba 98765432"        // 35 chars
  // boundary characters around each planted run are DISTINCT per
  // occurrence, so the maximal shared substring is exactly the run —
  // a shared flanking char would (correctly) widen the span by one
  private val doc10 = "unique-head-alpha###" + S + "%%%unique-tail-alpha"
  private val doc11 = "другое-head-beta****" + S + "&&&&other-tail-beta!"
  private val doc12 = "intro-block-gamma_" + T + "-mid+" + T + "~outro-gamma"
  private val doc13 = "tiny doc"                                // < L chars
  private val doc14 = doc10                                     // exact copy
  private val doc17 = "batch-doc-head====" + S + ";;;;batch-doc-tail"

  private lazy val fixtureDir: String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_substr").toString
    Seq(
      (10L, doc10, "en", "src0", doc10.length.toLong),
      (11L, doc11, "en", "src0", doc11.length.toLong),
      (12L, doc12, "en", "src1", doc12.length.toLong),
      (13L, doc13, "en", "src1", doc13.length.toLong),
      (14L, doc14, "en", "src2", doc14.length.toLong),
      (17L, doc17, "en", "src3", doc17.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def spans(): Map[Long, Seq[(Long, Long)]] =
    operators.Dedup.dedupSubstring(spark, fixtureDir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap

  test("keep-first: the lowest (doc_id, pos) copy of a shared run survives") {
    val sp = spans()
    assert(!sp.contains(10L), s"doc 10 is the canonical copy, got ${sp.get(10L)}")
    // doc 11's span covers exactly S (1-based [start, end))
    val s11 = doc11.indexOf(S) + 1L
    assert(sp(11L) === Seq((s11, s11 + S.length)),
      s"doc 11 expected exactly S at [$s11, ${s11 + S.length})")
  }

  test("within-doc repeat: second occurrence marked, first kept") {
    val sp = spans()
    val second = doc12.indexOf(T, doc12.indexOf(T) + 1) + 1L
    assert(sp(12L) === Seq((second, second + T.length)),
      s"doc 12 expected exactly the second T at [$second, ${second + T.length})")
  }

  test("whole-doc duplicate collapses to one full-width span; sub-L docs are exempt") {
    val sp = spans()
    assert(sp(14L) === Seq((1L, doc14.length + 1L)), "doc 14 is a full copy of 10")
    assert(!sp.contains(13L), "doc shorter than L can hold no L-gram")
  }

  test("q_dedup_substring_stats prices removal per doc, zeros where clean") {
    val st = operators.Dedup.dedupSubstringStats(spark, fixtureDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(st(10L) === ((0L, 0L, 0.0)))
    assert(st(13L) === ((0L, 0L, 0.0)))
    assert(st(11L)._2 === S.length.toLong)
    assert(st(14L) === ((1L, doc14.length.toLong, 1.0)))
    assert(st.keySet === Set(10L, 11L, 12L, 13L, 14L, 17L), "stats must cover ALL docs")
  }

  test("q_dedup_substring_apply cuts exactly the spans and re-joins in order") {
    val cleaned = operators.Dedup.dedupSubstringApply(spark, fixtureDir).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(cleaned(10L) === doc10, "canonical copy untouched")
    assert(cleaned(11L) === doc11.replace(S, ""), "doc 11 loses exactly S")
    val second = doc12.indexOf(T, doc12.indexOf(T) + 1)
    assert(cleaned(12L) ===
      doc12.substring(0, second) + doc12.substring(second + T.length),
      "doc 12 loses exactly the second T")
    assert(cleaned(13L) === doc13, "sub-L doc passes through")
    assert(cleaned(14L) === "", "full duplicate cleans to empty")
  }

  test("incremental probe: batch doc marked against corpus grams only") {
    // doc 17 (17 % 10 == 7 → batch) shares S with corpus docs 10/11/14;
    // corpus docs never appear on the left of the incremental verdict
    val sp = operators.Dedup.dedupSubstringIncremental(spark, fixtureDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val s17 = doc17.indexOf(S) + 1L
    assert(sp === Seq((17L, s17, s17 + S.length)),
      s"batch probe expected exactly S in doc 17, got $sp")
  }

  test("persisted substring index: probe == the in-plan chain; append absorbs, old files untouched") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val idx = Files.createTempDirectory("graft_sub_idx").toString
    operators.Dedup.writeSubstrIndex(spark, fixtureDir, idx)
    // probe == the declared (memoized-index) incremental query
    val probeDf = util.t(spark, fixtureDir, "documents")
      .where(col("doc_id") % operators.Dedup.IncrementalMod
        === operators.Dedup.IncrementalRem)
      .select("doc_id", "text")
    val viaIndex = operators.Dedup.probeSubstrIndex(spark, probeDf, idx)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val declared = operators.Dedup.dedupSubstringIncremental(spark, fixtureDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaIndex === declared, "explicit index diverged from the declared query")

    // a novel 40-char run unknown to the corpus: no verdict before
    // absorption, full-span verdict after
    val Z = "NOVEL-RUN-0123456789-ZYXWVUTSRQPONMLKJIH"
    val probe2 = Seq((901L, "probe-head####" + Z + "@@@@probe-tail")).toDF("doc_id", "text")
    assert(operators.Dedup.probeSubstrIndex(spark, probe2, idx).collect().isEmpty,
      "novel run matched before it was absorbed")
    val hashFiles = new java.io.File(s"$idx/hashes").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> java.nio.file.Files.readAllBytes(f.toPath)).toMap
    operators.Dedup.appendSubstrIndex(spark, idx,
      Seq((900L, "donor-head****" + Z + "%%%%donor-tail")).toDF("doc_id", "text"))
    val after = new java.io.File(s"$idx/hashes").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> java.nio.file.Files.readAllBytes(f.toPath)).toMap
    hashFiles.foreach { case (name, bytes) =>
      assert(after.contains(name) &&
        java.util.Arrays.equals(after(name), bytes),
        s"append rewrote existing index file $name")
    }
    assert(after.size > hashFiles.size, "append added no files")
    val sp = operators.Dedup.probeSubstrIndex(spark, probe2, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val zs = "probe-head####".length + 1L
    assert(sp === Seq((901L, zs, zs + Z.length)),
      s"absorbed run not found by the next probe: $sp")
  }

  test("winnow guarantee: runs >= L + w - 1 are still found, spans nest in exact spans") {
    // S (40 chars) clears the winnowing threshold L + w − 1 = 34, so
    // doc 11's duplicated run MUST surface even from selected-only grams
    val wn = operators.Dedup.dedupSubstringWinnow(spark, fixtureDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ex = spans()
    assert(wn.exists(_._1 == 11L), "winnow missed the >= L+w-1 run in doc 11")
    assert(wn.exists(_._1 == 14L), "winnow missed the whole-doc duplicate")
    assert(!wn.exists(_._1 == 10L), "winnow marked the canonical copy")
    assert(!wn.exists(_._1 == 13L), "winnow marked a sub-L doc")
    // every winnow span nests inside some exact span of the same doc
    wn.foreach { case (doc, s, e) =>
      assert(ex(doc).exists { case (es, ee) => s >= es && e <= ee },
        s"winnow span [$s,$e) of doc $doc escapes the exact spans ${ex(doc)}")
    }
  }

  test("winnow eval: marks are a subset, recall in (0,1], rows actually shrink") {
    val r = operators.Dedup.dedupSubstringWinnowEval(spark, "/root/testdata/sf0.001")
      .collect().head
    val (exactChars, winnowChars) = (r.getLong(0), r.getLong(1))
    val recall = r.getDouble(2)
    val (exactPos, winnowPos) = (r.getLong(5), r.getLong(6))
    assert(exactChars > 0, "sf0.001 must contain duplicated substrings")
    assert(winnowChars <= exactChars, "winnow coverage exceeded exact coverage")
    assert(recall > 0.0 && recall <= 1.0)
    assert(winnowPos < exactPos,
      s"winnowing must shrink the marked-position set ($winnowPos vs $exactPos)")
  }

  test("winnow index: declared incremental == explicit probe, subset of the exact incremental") {
    import org.apache.spark.sql.functions._
    val idx = Files.createTempDirectory("graft_win_idx").toString
    operators.Dedup.writeWinnowIndex(spark, fixtureDir, idx)
    val probeDf = util.t(spark, fixtureDir, "documents")
      .where(col("doc_id") % operators.Dedup.IncrementalMod
        === operators.Dedup.IncrementalRem)
      .select("doc_id", "text")
    val viaIndex = operators.Dedup.probeWinnowIndex(spark, probeDf, idx)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val declared = operators.Dedup
      .dedupSubstringWinnowIncremental(spark, fixtureDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaIndex === declared)
    // S (40 chars >= L+w-1 = 34) must still surface from selected grams
    assert(declared.exists(_._1 == 17L),
      s"winnow index missed doc 17's >= L+w-1 run: $declared")
    // and every winnow verdict nests inside an exact-incremental span
    val exact = operators.Dedup.dedupSubstringIncremental(spark, fixtureDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    declared.foreach { case (doc, s0, e0) =>
      assert(exact.exists { case (d2, s2, e2) => d2 == doc && s0 >= s2 && e0 <= e2 },
        s"winnow span [$s0,$e0) of doc $doc escapes the exact spans")
    }
    // the index really is smaller than the exact one
    val exIdx = Files.createTempDirectory("graft_sub_idx2").toString
    operators.Dedup.writeSubstrIndex(spark, fixtureDir, exIdx)
    val nWin = spark.read.parquet(s"$idx/hashes").count()
    val nEx = spark.read.parquet(s"$exIdx/hashes").count()
    assert(nWin < nEx, s"winnow index not smaller: $nWin vs $nEx")
  }

  test("winnow index: probe and append refuse a substr_l mismatch") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft_win_idx_meta").toString
    operators.Dedup.writeWinnowIndex(spark, fixtureDir, idx)
    val probeDf = util.t(spark, fixtureDir, "documents").select("doc_id", "text")
    // sanity: matching meta passes
    operators.Dedup.probeWinnowIndex(spark, probeDf, idx).count()
    // corrupt the persisted gram length: L is an engine constant (not a
    // replayed dial like winnow_w) — probe and append must fail fast,
    // not silently hash different-length grams
    Seq(("substr_l", 999L), ("winnow_w", operators.Dedup.WinnowW.toLong))
      .toDF("key", "value").write.mode("overwrite").parquet(s"$idx/meta")
    val eProbe = intercept[IllegalArgumentException] {
      operators.Dedup.probeWinnowIndex(spark, probeDf, idx)
    }
    assert(eProbe.getMessage.contains("substr_l"))
    intercept[IllegalArgumentException] {
      operators.Dedup.appendWinnowIndex(spark, idx, probeDf)
    }
    // substring index: same guard on substr_l
    val sIdx = Files.createTempDirectory("graft_sub_idx_meta").toString
    operators.Dedup.writeSubstrIndex(spark, fixtureDir, sIdx)
    Seq(("substr_l", 999L)).toDF("key", "value")
      .write.mode("overwrite").parquet(s"$sIdx/meta")
    val eSub = intercept[IllegalArgumentException] {
      operators.Dedup.probeSubstrIndex(spark, probeDf, sIdx)
    }
    assert(eSub.getMessage.contains("substr_l"))
    intercept[IllegalArgumentException] {
      operators.Dedup.appendSubstrIndex(spark, sIdx, probeDf)
    }
  }

  test("winnow index: the w dial — build at w=50 persists, probe and append replay it") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft_win_idx_w").toString
    operators.Dedup.writeWinnowIndex(spark, fixtureDir, idx, w = 50)
    // meta round-trip: the APPLIED w is the index's source of truth,
    // not the running binary's default
    val meta = spark.read.parquet(s"$idx/meta")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(meta("winnow_w") === 50L)
    assert(meta("substr_l") === operators.Dedup.SubstrL.toLong)
    // a probe doc sharing doc10's full 80 chars clears the w=50
    // guarantee threshold L + w - 1 = 79: the hit must survive under
    // the REPLAYED w (the binary default w=5 would select different
    // grams and this span could silently vanish)
    val probe = Seq((99L, doc10)).toDF("doc_id", "text")
    val got = operators.Dedup.probeWinnowIndex(spark, probe, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.exists(_._1 == 99L),
      s"w=50 probe missed a >= L+w-1 shared run: $got")
    // append replays the same selection: a copy of an APPENDED doc hits
    val newDoc = "appended-doc-head=" + S + S + "=appended-doc-tail"
    operators.Dedup.appendWinnowIndex(spark, idx,
      Seq((200L, newDoc)).toDF("doc_id", "text"))
    val got2 = operators.Dedup.probeWinnowIndex(spark,
      Seq((201L, newDoc)).toDF("doc_id", "text"), idx)
      .collect().map(_.getLong(0)).toSeq
    assert(got2.contains(201L),
      "copy of an appended doc not caught under the replayed w")
  }

  test("span merge gap: islands bridge at <= mergeGap and split above it") {
    import spark.implicits._
    val L = operators.Dedup.SubstrL
    // marked positions 1, 1+45, 1+90: with the exact L=30 merge these are
    // three islands (gap 45 > 30); with a winnow bridge of 50 they fuse
    // into one span [1, 91+L)
    val pos = Seq((1L, 1L), (1L, 46L), (1L, 91L)).toDF("doc_id", "pos")
    val exact = operators.Dedup.substringSpansOf(pos)
      .orderBy("span_start")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(exact === Seq((1L, 1L + L), (46L, 46L + L), (91L, 91L + L)))
    val bridged = operators.Dedup.substringSpansOf(pos, 50)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(bridged === Seq((1L, 91L + L)))
    // boundary: gap exactly mergeGap merges, one past splits
    val b = Seq((2L, 10L), (2L, 60L)).toDF("doc_id", "pos")
    assert(operators.Dedup.substringSpansOf(b, 50).count() === 1L)
    assert(operators.Dedup.substringSpansOf(b, 49).count() === 2L)
    // the default gap equals L so the shipped w = 5 (< L) is unchanged
    assert(operators.Dedup.winnowMergeGap ===
      math.max(L, operators.Dedup.WinnowW))
  }

  /** brute-force robust-winnowing reference: per-window rightmost-min
    * over md5-40 gram hashes — O(n·w), independent of the deque/packing
    * machinery under test. BMP-only text so String (UTF-16) and
    * UTF8String (code-point) character indexing coincide. */
  private def winnowRef(text: String, l: Int, w: Int): Seq[Long] = {
    val n = text.length - l + 1
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = Array.tabulate(n) { i =>
      val d = md.digest(text.substring(i, i + l).getBytes("UTF-8"))
      ((d(0) & 0xffL) << 32) | ((d(1) & 0xffL) << 24) |
        ((d(2) & 0xffL) << 16) | ((d(3) & 0xffL) << 8) | (d(4) & 0xffL)
    }
    val starts = math.max(n - w + 1, 1)
    val sel = scala.collection.mutable.LinkedHashSet[Long]()
    var s = 0
    while (s < starts) {
      var best = s
      val end = math.min(s + w, n)
      var i = s + 1
      while (i < end) { if (h(i) <= h(best)) best = i; i += 1 }
      sel += (best + 1).toLong
      s += 1
    }
    sel.toSeq
  }

  test("winnow_positions handles >2^20-position docs (brute-force parity)") {
    import org.apache.spark.unsafe.types.UTF8String
    val l = operators.Dedup.SubstrL
    val w = operators.Dedup.WinnowW
    // 2^20 + margin chars with multi-byte sprinkles: the old packed
    // encoding corrupted (and then failed fast) past 2^20-1 positions;
    // the pair-comparison form must select exactly the reference set
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdefghij üé".toCharArray
    val chars = (1 << 20) + 200 + l
    val sb = new StringBuilder(chars)
    (0 until chars).foreach(_ => sb += alphabet(rnd.nextInt(alphabet.length)))
    val doc = sb.toString
    val got = functions.WinnowPositions
      .compute(UTF8String.fromString(doc), l, w)
      .toLongArray().toSeq
    assert(got.length > (1 << 20) / w,
      s"a ${chars}-char doc must select >n/w fingerprints, got ${got.length}")
    assert(got === winnowRef(doc, l, w))
  }

  test("winnow locality: shared-region fingerprints coincide across long docs") {
    import org.apache.spark.unsafe.types.UTF8String
    val l = operators.Dedup.SubstrL
    val w = operators.Dedup.WinnowW
    // two >2^20-char docs sharing a 100k-char region at different
    // offsets: winnowing is local (each selection depends on a w+l-1
    // char context), so interior selections inside the shared region
    // must coincide offset-shifted — the property that makes winnowed
    // dedup spans byte-identical to the exact pass on the overlap
    val rnd = new scala.util.Random(7)
    def rand(n: Int): String = {
      val sb = new StringBuilder(n)
      (0 until n).foreach(_ => sb += ('a' + rnd.nextInt(26)).toChar)
      sb.toString
    }
    val shared = rand(100000)
    val a = rand((1 << 20) + 50) + shared + rand(3000)
    val b = rand(500000) + shared + rand((1 << 19))
    val offA = (1 << 20) + 50
    val offB = 500000
    def interior(ps: Seq[Long], off: Int): Set[Long] = ps
      .filter(p => p > off + w + l && p <= off + shared.length - (w + l))
      .map(_ - off).toSet
    val pa = functions.WinnowPositions.compute(UTF8String.fromString(a), l, w).toLongArray().toSeq
    val pb = functions.WinnowPositions.compute(UTF8String.fromString(b), l, w).toLongArray().toSeq
    val ia = interior(pa, offA)
    val ib = interior(pb, offB)
    assert(ia.nonEmpty && ia === ib,
      s"interior selections differ: onlyA=${(ia -- ib).take(5)} onlyB=${(ib -- ia).take(5)}")
  }

  test("doc-pair bridge: shared gram mass lands on (canonical, marked) pairs") {
    val pairs = operators.Dedup.dedupSubstringPairs(spark, fixtureDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // S (40 chars) = 11 interior grams shared 10→{11, 17}; doc 14 is a
    // full 80-char copy of 10 = 51 grams; doc 12's repeat is WITHIN-doc
    // and must not pair
    assert(pairs === Seq(
      (10L, 11L, 11L), (10L, 14L, 51L), (10L, 17L, 11L)), s"got $pairs")
  }

  test("cross-source cells: shared mass lands directionally on (kept, cut) sources") {
    // fixture sources: 10→src0 (canonical), 11→src0, 14→src2, 17→src3
    val cells = operators.Dedup.dedupSubstringCrossSource(spark, fixtureDir)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    assert(cells === Map(
      ("src0", "src0") -> ((1L, 11L)),   // 10→11, intra-source
      ("src0", "src2") -> ((1L, 51L)),   // 10→14, the full copy
      ("src0", "src3") -> ((1L, 11L))))  // 10→17
  }

  test("residual audit: removal leaves no non-canonical copy of any original gram") {
    // fixture: cleaned corpus = docs 10/12(first T)/13/17 intact-ish,
    // 11 loses S, 14 empties — no surviving cross-doc run, and junction
    // grams (unique boundary chars) collide with nothing
    val r = operators.Dedup.dedupSubstringResidual(spark, fixtureDir).collect().head
    val (orig, resid) = (r.getLong(0), r.getLong(1))
    // S is marked in docs 11 AND 17 (10 is canonical), T's second run in
    // 12, and the whole of 14
    assert(orig === (2 * S.length + T.length + doc14.length).toLong,
      "orig_dup_chars must equal the planted span mass")
    assert(resid === 0L, s"fixture removal must converge in one pass, got $resid")
    assert(r.getDouble(2) === 0.0)
    // real corpus: residual strictly below original (the word-salad vocab
    // DOES create junction collisions — the instrument's reason to exist)
    val real = operators.Dedup.dedupSubstringResidual(spark, "/root/testdata/sf0.001")
      .collect().head
    assert(real.getLong(0) > 0)
    assert(real.getLong(1) < real.getLong(0),
      "one pass must strictly reduce duplicated mass")
  }

  test("property: spans match a brute-force reference on generated block corpora") {
    import spark.implicits._
    // corpora built by concatenating from a small block pool — block
    // reuse plants real shared runs at random offsets, including
    // within-doc repeats and cross-doc overlaps the fixture can't cover
    val rnd = new scala.util.Random(20260814)
    val alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 "
    def randBlock(len: Int): String =
      Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString
    (1 to 5).foreach { trial =>
      val pool = Seq.fill(6)(randBlock(10 + rnd.nextInt(26)))
      val docs = (0 until 12).map { id =>
        val text = Seq.fill(1 + rnd.nextInt(6))(pool(rnd.nextInt(pool.size)))
          .mkString
        (id.toLong, text)
      }
      // brute-force reference: literal gram strings, first-occurrence
      // exemption, interval union
      val L = operators.Dedup.SubstrL
      val occ = scala.collection.mutable.LinkedHashMap
        .empty[String, List[(Long, Int)]]
      for ((id, text) <- docs; p <- 1 to text.length - L + 1)
        occ.updateWith(text.substring(p - 1, p - 1 + L)) {
          case Some(l) => Some((id, p) :: l)
          case None => Some(List((id, p)))
        }
      val marks = occ.values.flatMap { revOccs =>
        val sorted = revOccs.reverse.sortBy(identity)
        if (sorted.size >= 2) sorted.tail else Nil
      }.toSeq
      val expected = marks.groupBy(_._1).flatMap { case (id, ps) =>
        val sorted = ps.map(_._2).sorted
        val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        for (p <- sorted) {
          if (spans.nonEmpty && p <= spans.last._2)
            spans(spans.size - 1) = (spans.last._1, math.max(spans.last._2, p + L))
          else spans += ((p.toLong, (p + L).toLong))
        }
        spans.map { case (s0, e0) => (id, s0, e0) }
      }.toSeq.sorted

      val got = operators.Dedup.substringSpansOf(
          operators.Dedup.dupSubstrPositionsOf(docs.toDF("doc_id", "text")))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq.sorted
      assert(got === expected, s"trial $trial diverged from brute force")
      assert(expected.nonEmpty, s"trial $trial generated no duplicates — weak fixture")
    }
  }

  test("span-covering property on real data: spans only cover duplicated grams") {
    // every reported span on the sf0.001 corpus is ≥ L wide, in-bounds,
    // and non-overlapping per doc in sorted order
    val dir = "/root/testdata/sf0.001"
    val rows = operators.Dedup.dedupSubstring(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val lens = util.t(spark, dir, "documents")
      .select(col("doc_id"), length(col("text")).cast("long").as("len"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (doc, sp) =>
      val sorted = sp.sortBy(_._2)
      sorted.foreach { case (_, s, e) =>
        assert(e - s >= L, s"span narrower than L in doc $doc")
        assert(s >= 1 && e <= lens(doc) + 1, s"span out of bounds in doc $doc")
      }
      sorted.sliding(2).foreach {
        case Array((_, _, e1), (_, s2, _)) =>
          assert(s2 > e1, s"overlapping/adjacent unmerged spans in doc $doc")
        case _ =>
      }
    }
  }

  test("convergence loop: a planted junction collision needs exactly 2 passes; one pass provably doesn't finish") {
    import spark.implicits._
    // J is split 20+20 around a duplicated run D inside doc 3: pre-cut,
    // doc 3 shares no 30-gram with doc 1 (each J fragment < L); cutting
    // D makes the fragments ADJACENT, minting the full J at the junction
    // — the Lee et al. §4.1 iteration case q_dedup_substring_residual
    // prices. Pass 1 cuts D, pass 2 cuts the junction-born J, pass 3
    // measures zero.
    val J = "The-quick-brown-fox-jumps-over-lazyXdog"
      .padTo(40, 'Z').take(40)
    val D = "D-run:ABCDEFGHIJKLMNOPQRSTUVWXYZ-987654".padTo(40, 'Y').take(40)
    assert(J.length === 40 && D.length === 40)
    val doc1 = "uno-head-!!!" + J + "???uno-tail"
    val doc2 = "dos-head-===" + D + "+++dos-tail"
    val doc3 = "tres-head-^^" + J.take(20) + D + J.drop(20) + "||tres-tail"
    val docs = Seq((1L, doc1), (2L, doc2), (3L, doc3)).toDF("doc_id", "text")

    // one pass is NOT a fixed point: it cuts D but leaves the newly
    // minted J duplicated (residual = |J| = 40 junction chars)
    val (_, p1, r1) = operators.Dedup.dedupSubstringToConvergence(docs, maxPasses = 1)
    assert(p1 === 1 && r1 === J.length.toLong,
      s"after one pass the junction J must remain: passes=$p1 residual=$r1")

    // the loop converges in exactly 2 passes to residual 0, canonical
    // copies intact and doc 3 reduced to its unique flanks
    val (cleaned, passes, residual) =
      operators.Dedup.dedupSubstringToConvergence(docs, maxPasses = 5)
    assert(passes === 2, s"expected convergence in exactly 2 passes, got $passes")
    assert(residual === 0L)
    val out = cleaned.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === doc1, "the canonical J carrier must be untouched")
    assert(out(2L) === doc2, "the canonical D carrier must be untouched")
    assert(out(3L) === "tres-head-^^" + "||tres-tail",
      s"doc 3 must reduce to its unique flanks, got '${out(3L)}'")

    // idempotence at the fixed point: converging again is a 0-pass no-op
    val (_, p0, r0) = operators.Dedup.dedupSubstringToConvergence(cleaned, maxPasses = 3)
    assert(p0 === 0 && r0 === 0L, "the fixed point must be stable")
  }
}
