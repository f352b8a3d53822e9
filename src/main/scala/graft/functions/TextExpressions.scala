package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text-shingling expression (SURVEY.md §4.2 ladder step b).
  *
  * Word n-gram shingles feed the whole dedup family (MinHash, n-gram
  * Jaccard, the band oracle). The HOF formulation —
  * `array_distinct(transform(sequence(0, size(toks)-3), i ->
  * concat_ws(' ', toks[i], toks[i+1], toks[i+2])))` — runs interpreted:
  * ~3 boxed element_at calls + a lambda frame per gram, which profiled at
  * ~5 s of the 6-7 s q_dedup_ngram_jaccard time at sf0.1. This expression
  * builds the same distinct gram array in one JVM loop per row.
  *
  * Semantics match the HOF form exactly: distinct first-occurrence order;
  * when the doc has fewer than `n` tokens the single gram is ALL tokens
  * joined by ' ' (concat_ws semantics, nulls skipped).
  */
case class WordNgrams(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams expects array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(input: Any): Any =
    WordNgrams.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WordNgrams.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNgrams {
  private val Sep = UTF8String.fromString(" ")

  /** one JVM loop per row; called from both eval and generated code */
  def compute(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    if (len < n) {
      val all = new Array[UTF8String](len)
      var i = 0
      while (i < len) { all(i) = toks.getUTF8String(i); i += 1 }
      new GenericArrayData(Array[Any](UTF8String.concatWs(Sep, all: _*)))
    } else {
      val seen = new java.util.LinkedHashSet[UTF8String]()
      val parts = new Array[UTF8String](n)
      var i = 0
      while (i <= len - n) {
        var k = 0
        while (k < n) { parts(k) = toks.getUTF8String(i + k); k += 1 }
        seen.add(UTF8String.concatWs(Sep, parts: _*))
        i += 1
      }
      new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size())))
    }
  }
}

/** Native robust-winnowing selection (Schleimer-Wilkerson-Aiken 2003 §4)
  * — the per-doc local step of the winnowed substring-dedup scale path.
  * Returns the 1-based positions of each w-window's minimal char-L-gram
  * md5-40 hash (rightmost on hash ties), distinct, in window order.
  *
  * The HOF formulation — three nested transform/array_min/array_distinct
  * lambdas with an md5 per gram — runs interpreted and profiled SLOWER
  * than the exact pass it exists to beat (4.9 s vs 3.5 s at sf0.1: the
  * lambda frames cost more than the shuffle they save at test scale).
  * This expression computes the same selection in one JVM loop per row:
  * md5 via a thread-local digest, sliding-window min via a monotonic
  * deque (O(n) total, not O(n·w)). Semantics are pinned to the HOF form
  * by a VectorSpec parity test and to DuckDB by the declared oracle. */
case class WinnowPositions(child: Expression, l: Int, w: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if l >= 1 && w >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"winnow_positions needs l >= 1 and w >= 1, got l=$l w=$w")
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_positions expects string, got ${t.simpleString}")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "winnow_positions"

  override def nullSafeEval(input: Any): Any =
    WinnowPositions.compute(input.asInstanceOf[UTF8String], l, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WinnowPositions.compute($a, $l, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowPositions {
  private[functions] val md = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** shared per-row groundwork: UTF-8 bytes + char→byte offset table.
    * Each gram then hashes its byte slice directly, where substringSQL
    * would re-scan from the string head per gram — O(chars²) on long
    * docs. Used by the winnow pass AND the exact-pass [[CharGramMd5]]. */
  private[functions] def byteOffsets(text: UTF8String): (Array[Byte], Array[Int]) = {
    val nChars = text.numChars()
    val bytes = text.getBytes
    val offs = new Array[Int](nChars + 1)
    var ci = 0
    var bi = 0
    while (ci < nChars) {
      offs(ci) = bi
      bi += UTF8String.numBytesForFirstByte(bytes(bi))
      ci += 1
    }
    offs(nChars) = bi
    (bytes, offs)
  }

  /** one JVM loop per row; called from both eval and generated code.
    * Selection order is (min h40, rightmost position on hash ties) —
    * the deque pop condition `h(last) >= h(new)` realizes exactly the
    * ordering the HOF/DuckDB twins encode arithmetically as
    * h40·2²⁰ + (2²⁰−1−pos); comparing the (hash, position) pair
    * directly instead of packing it removes their 2^20-1 position
    * ceiling, so arbitrarily long documents winnow without chunking
    * (the twins only ever see short oracle docs, where the encodings
    * coincide). Full windows only; a doc with fewer than w grams gets
    * one whole-array window (slice-overrun semantics). */
  def compute(text: UTF8String, l: Int, w: Int): ArrayData = {
    val sel = select(text, l, w)
    val out = new Array[Any](sel.length)
    var k = 0
    while (k < sel.length) { out(k) = sel(k); k += 1 }
    new GenericArrayData(out)
  }

  /** selected 1-based gram positions, distinct, in window order —
    * shared by [[compute]] and [[WinnowGrams]] */
  private[functions] def select(text: UTF8String, l: Int, w: Int): Array[Long] =
    selectWithTables(text, l, w)._1

  /** [[select]] plus the byte/offset table it hashed over, so callers
    * that digest the selected grams afterwards ([[WinnowGrams]]) don't
    * pay a second O(n) table build on the long-doc hot path */
  private[functions] def selectWithTables(text: UTF8String, l: Int,
      w: Int): (Array[Long], Array[Byte], Array[Int]) = {
    val nChars = text.numChars()
    val n = nChars - l + 1
    if (n <= 0) return (Array.empty[Long], Array.emptyByteArray, Array.empty[Int])
    val (bytes, offs) = byteOffsets(text)
    val digest = md.get()
    val h = new Array[Long](n)
    var p0 = 0
    while (p0 < n) {
      digest.reset()
      digest.update(bytes, offs(p0), offs(p0 + l) - offs(p0))
      val d = digest.digest()
      h(p0) = ((d(0) & 0xffL) << 32) | ((d(1) & 0xffL) << 24) |
        ((d(2) & 0xffL) << 16) | ((d(3) & 0xffL) << 8) | (d(4) & 0xffL)
      p0 += 1
    }
    val starts = math.max(n - w + 1, 1)
    val selected = new java.util.LinkedHashSet[Long]()
    val deque = new java.util.ArrayDeque[Int]()
    var i = 0
    val first = math.min(w, n)
    while (i < first) {
      while (!deque.isEmpty && h(deque.peekLast()) >= h(i)) deque.pollLast()
      deque.addLast(i)
      i += 1
    }
    selected.add(deque.peekFirst() + 1L)
    var s = 1
    while (s < starts) {
      if (deque.peekFirst() < s) deque.pollFirst()
      val in = s + w - 1
      while (!deque.isEmpty && h(deque.peekLast()) >= h(in)) deque.pollLast()
      deque.addLast(in)
      selected.add(deque.peekFirst() + 1L)
      s += 1
    }
    val out = new Array[Long](selected.size())
    val it = selected.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    (out, bytes, offs)
  }
}

/** Winnow selection + the full 16-byte md5 at each selected position, in
  * one pass: `array<struct<pos: bigint, h: binary>>`. The selection is
  * byte-identical to [[WinnowPositions]] (same 40-bit ordering); the full
  * digest is recomputed only at the selected ~n/w positions from the
  * already-built offset table, replacing the downstream
  * `unhex(md5(substring(text, pos, l)))` projection whose substring
  * re-scans O(pos) chars per selected gram. */
case class WinnowGrams(child: Expression, l: Int, w: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if l >= 1 && w >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"winnow_grams needs l >= 1 and w >= 1, got l=$l w=$w")
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_grams expects string, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("h", BinaryType, nullable = false))), containsNull = false)
  override def prettyName: String = "winnow_grams"

  override def nullSafeEval(input: Any): Any =
    WinnowGrams.compute(input.asInstanceOf[UTF8String], l, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WinnowGrams.compute($a, $l, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowGrams {
  def compute(text: UTF8String, l: Int, w: Int): ArrayData = {
    val (sel, bytes, offs) = WinnowPositions.selectWithTables(text, l, w)
    if (sel.isEmpty) return new GenericArrayData(Array.empty[Any])
    val digest = WinnowPositions.md.get()
    val out = new Array[Any](sel.length)
    var k = 0
    while (k < sel.length) {
      val p0 = (sel(k) - 1).toInt
      digest.reset()
      digest.update(bytes, offs(p0), offs(p0 + l) - offs(p0))
      out(k) = org.apache.spark.sql.catalyst.InternalRow(sel(k), digest.digest())
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** All char-L-gram md5s of a document in one pass:
  * `array<binary>` — element i (0-based) is the 16-byte md5 of the gram
  * at 1-based position i+1. The exact substring-dedup pass feeds this to
  * `posexplode`, replacing an `explode(sequence) → substring → md5 →
  * unhex` chain that re-scans O(pos) chars per gram (quadratic on long
  * docs) and round-trips every digest through hex text. */
case class CharGramMd5(child: Expression, l: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if l >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"char_gram_md5 needs l >= 1, got l=$l")
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_gram_md5 expects string, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def prettyName: String = "char_gram_md5"

  override def nullSafeEval(input: Any): Any =
    CharGramMd5.compute(input.asInstanceOf[UTF8String], l)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.CharGramMd5.compute($a, $l);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharGramMd5 {
  def compute(text: UTF8String, l: Int): ArrayData = {
    val n = text.numChars() - l + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val (bytes, offs) = WinnowPositions.byteOffsets(text)
    val digest = WinnowPositions.md.get()
    val out = new Array[Any](n)
    var p0 = 0
    while (p0 < n) {
      digest.reset()
      digest.update(bytes, offs(p0), offs(p0 + l) - offs(p0))
      out(p0) = digest.digest()
      p0 += 1
    }
    new GenericArrayData(out)
  }
}

/** First `hexLen` hex digits of md5(text) as a BIGINT — numerically
  * identical to `cast(conv(substring(md5(x), 1, hexLen), 16, 10) AS
  * BIGINT)`, the cross-engine gram-hash idiom the MinHash/Jaccard/
  * span-ratio pipelines shuffle on (DuckDB twin:
  * `('0x' || substr(md5(x), 1, hexLen))::BIGINT`). The conv form
  * hex-encodes the full 16-byte digest to a 32-char string, substrings
  * it, then parses digits back to a number — three allocations per gram
  * on the hottest projection in the dedup family; this reads the
  * nibbles straight off the digest. hexLen ≤ 15 keeps the value inside
  * a signed 64-bit integer, like the conv form it replaces. */
case class Md5Prefix64(child: Expression, hexLen: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if hexLen >= 1 && hexLen <= 15 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"md5_prefix64 needs 1 <= hexLen <= 15, got $hexLen")
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_prefix64 expects string, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix64"

  override def nullSafeEval(input: Any): Any =
    Md5Prefix64.compute(input.asInstanceOf[UTF8String], hexLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Md5Prefix64.compute($a, $hexLen);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Prefix64 {
  def compute(s: UTF8String, hexLen: Int): Long = {
    val digest = WinnowPositions.md.get()
    digest.reset()
    val d = digest.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < hexLen) {
      val nib = if ((i & 1) == 0) (d(i >> 1) >> 4) & 0xf else d(i >> 1) & 0xf
      v = (v << 4) | nib
      i += 1
    }
    v
  }
}

/** POSITIONAL word-n-gram md5-prefix hashes: element i (0-based) is
  * [[Md5Prefix64]] of `concat_ws(' ', tk[i..i+n-1])` — one entry per
  * window start, duplicates kept (unlike [[WordNgrams]], which dedups
  * for the set-shaped consumers). Numerically identical to the HOF
  * `transform(sequence(0, size(tk)-n), i -> cast(conv(substring(
  * md5(concat_ws(' ', tk[i]...)), 1, hexLen), 16, 10) AS BIGINT))`
  * that the scrub-span / fingerprint / quality-model pipelines ran
  * INTERPRETED (a lambda frame + boxed element_at calls + the hex
  * round-trip per gram). Empty array when the doc has fewer than n
  * tokens. */
case class WordNgramMd5p64(child: Expression, n: Int, hexLen: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 && hexLen >= 1 && hexLen <= 15 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
      s"word_ngram_md5p64 needs n >= 1 and 1 <= hexLen <= 15, got n=$n hexLen=$hexLen")
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_ngram_md5p64 expects array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_ngram_md5p64"

  override def nullSafeEval(input: Any): Any =
    WordNgramMd5p64.compute(input.asInstanceOf[ArrayData], n, hexLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WordNgramMd5p64.compute($a, $n, $hexLen);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNgramMd5p64 {
  private val Sep = UTF8String.fromString(" ")

  def compute(toks: ArrayData, n: Int, hexLen: Int): ArrayData = {
    val len = toks.numElements()
    val count = len - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val parts = new Array[UTF8String](n)
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      var k = 0
      while (k < n) { parts(k) = toks.getUTF8String(i + k); k += 1 }
      out(i) = Md5Prefix64.compute(UTF8String.concatWs(Sep, parts: _*), hexLen)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** One BPE merge round applied to a token array: greedy left-to-right
  * non-overlapping replacement of adjacent (a, b) with `a + " " + b` —
  * the exact semantics of `TextAnalysis.applyMerge` (a merged symbol
  * cannot re-pair with the token it just consumed within the same
  * pass). The training loop previously ran this via `Dataset.map`,
  * paying a full encoder round-trip (row → Seq[String] → row) on the
  * whole corpus EVERY round; as a codegen'd expression the remap stays
  * inside the same stage as the next round's pair count. The merge pair
  * is a per-round constant, so it rides the expression as literals —
  * no broadcast, no shuffle, matching the closure-constant design of
  * the loop it serves. */
case class BpeMergeStep(child: Expression, a: String, b: String)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private lazy val aU8 = UTF8String.fromString(a)
  private lazy val bU8 = UTF8String.fromString(b)
  private lazy val joinedU8 = UTF8String.fromString(a + " " + b)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_merge_step expects array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_merge_step"

  override def nullSafeEval(input: Any): Any =
    BpeMergeStep.compute(input.asInstanceOf[ArrayData], aU8, bU8, joinedU8)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[UTF8String].getName
    val aRef = ctx.addReferenceObj("bpeMergeA", aU8, cls)
    val bRef = ctx.addReferenceObj("bpeMergeB", bU8, cls)
    val jRef = ctx.addReferenceObj("bpeMergeJoined", joinedU8, cls)
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.BpeMergeStep.compute($x, $aRef, $bRef, $jRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeMergeStep {
  def compute(arr: ArrayData, a: UTF8String, b: UTF8String,
      joined: UTF8String): ArrayData = {
    val n = arr.numElements()
    val tmp = new Array[Any](n)
    var i = 0
    var k = 0
    while (i < n) {
      if (i + 1 < n && a.equals(arr.getUTF8String(i)) &&
          b.equals(arr.getUTF8String(i + 1))) {
        tmp(k) = joined; k += 1; i += 2
      } else {
        tmp(k) = arr.getUTF8String(i); k += 1; i += 1
      }
    }
    new GenericArrayData(
      if (k == n) tmp
      else java.util.Arrays.copyOf(tmp.asInstanceOf[Array[AnyRef]], k).asInstanceOf[Array[Any]])
  }
}

/** Adjacent-pair count DELTAS of one BPE merge round: the difference
  * between the row's bigram counts AFTER and BEFORE a greedy
  * [[BpeMergeStep]] application of (a, b), as array<struct<t1, t2, d>>
  * with only the changed pairs (empty-token pairs excluded, matching
  * the trainer's count universe). Rows that contain no adjacent (a, b)
  * short-circuit to an empty array without building the count maps —
  * the common case, which is why the incremental trainer's per-round
  * shuffle carries only O(occurrences-of-merged-pair) delta rows
  * instead of every bigram in the corpus (the fast-BPE-trainer
  * counterpart of Sennrich 2016's full recount; same argmax by
  * construction — the running count frame stays exactly
  * pairCounts(corpus-after-merges), spec-pinned against a driver-side
  * reference trainer). */
case class BpePairDeltas(child: Expression, a: String, b: String)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private lazy val aU8 = UTF8String.fromString(a)
  private lazy val bU8 = UTF8String.fromString(b)
  private lazy val joinedU8 = UTF8String.fromString(a + " " + b)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_pair_deltas expects array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("t1", StringType, nullable = false),
    StructField("t2", StringType, nullable = false),
    StructField("d", IntegerType, nullable = false))), containsNull = false)
  override def prettyName: String = "bpe_pair_deltas"

  override def nullSafeEval(input: Any): Any =
    BpePairDeltas.compute(input.asInstanceOf[ArrayData], aU8, bU8, joinedU8)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[UTF8String].getName
    val aRef = ctx.addReferenceObj("bpeDeltaA", aU8, cls)
    val bRef = ctx.addReferenceObj("bpeDeltaB", bU8, cls)
    val jRef = ctx.addReferenceObj("bpeDeltaJoined", joinedU8, cls)
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.BpePairDeltas.compute($x, $aRef, $bRef, $jRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpePairDeltas {
  private val Empty = new GenericArrayData(Array.empty[Any])

  def compute(arr: ArrayData, a: UTF8String, b: UTF8String,
      joined: UTF8String): ArrayData = {
    val n = arr.numElements()
    // fast path: no adjacent (a, b) in the row ⇒ the merge is a no-op
    // here and every delta is zero
    var has = false
    var i = 0
    while (i + 1 < n && !has) {
      if (a.equals(arr.getUTF8String(i)) && b.equals(arr.getUTF8String(i + 1)))
        has = true
      i += 1
    }
    if (!has) return Empty
    val merged = BpeMergeStep.compute(arr, a, b, joined)
    val d = new java.util.HashMap[(UTF8String, UTF8String), Int]()
    def accumulate(xs: ArrayData, sign: Int): Unit = {
      val m = xs.numElements()
      var j = 0
      while (j + 1 < m) {
        val t1 = xs.getUTF8String(j)
        val t2 = xs.getUTF8String(j + 1)
        if (t1.numBytes() > 0 && t2.numBytes() > 0) {
          val k = (t1, t2)
          val cur = d.getOrDefault(k, 0) + sign
          if (cur == 0) d.remove(k) else d.put(k, cur)
        }
        j += 1
      }
    }
    accumulate(merged, 1)
    accumulate(arr, -1)
    val out = new Array[Any](d.size())
    var k = 0
    val it = d.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out(k) = org.apache.spark.sql.catalyst.InternalRow(
        e.getKey._1, e.getKey._2, e.getValue)
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** Native Unicode normalization (NFC/NFD/NFKC/NFKD via
  * `java.text.Normalizer`) — the curation-pipeline hygiene step Spark has
  * no built-in for (mixed composed/decomposed sources hash and dedup as
  * DIFFERENT documents until normalized; every serious corpus pipeline
  * normalizes before fingerprinting). A codegen'd expression keeps it
  * inside whole-stage codegen next to the md5/split projections it
  * feeds, where a Scala UDF would box every row and fence the stage. */
case class UnicodeNormalize(child: Expression, form: String)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if UnicodeNormalize.Forms.contains(form) =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize form must be one of ${UnicodeNormalize.Forms.mkString("/")}, got $form")
    case t => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize expects string, got ${t.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.compute(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = graft.functions.UnicodeNormalize.compute($a, "$form");""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  /** called from both eval and generated code. Fast path: Normalizer
    * .isNormalized is a cheap scan that avoids allocating for the
    * overwhelmingly-already-normalized case (ASCII short-circuits). */
  def compute(s: UTF8String, form: String): UTF8String = {
    val f = java.text.Normalizer.Form.valueOf(form)
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }
}

/** All nine Gopher repetition metrics (Rae et al. 2021 §A1.1) in ONE
  * map-side pass per document:
  * `struct<top_char_frac_2..4: double, dup_char_frac_5..10: double>`.
  *
  * The metrics are per-doc local, so the right 100 TB shape is a
  * per-doc kernel, not a corpus-wide shuffle: the DataFrame chain this
  * replaces posexploded every token, shuffled them all into a
  * doc-partitioned window for 18 lead columns, exploded 9 gram structs
  * per position, and ran two more shuffling aggregations — the
  * steepest intrinsic scaler in the suite. This expression computes
  * the identical numbers from the token array in one JVM loop; the
  * only remaining shuffle in the operator is the output orderBy.
  *
  * Semantics are bit-for-bit the replaced chain's (pinned by the
  * legacy-parity spec):
  *   - char offsets: cs(p) = Σ_{j<p}(numChars(tok_j)+1), ce = cs+len;
  *     gram (p,n) spans [cs(p), ce(p+n−1)) — so gram char length
  *     counts concat_ws(" ") separators;
  *   - top (n=2..4): winner = max count, ties to the binary-smallest
  *     gram; frac = r4f(count·gramChars/docChars), per-occurrence
  *     (overlap NOT deduplicated — can exceed 1.0);
  *   - dup (n=5..10): interval union of all occurrences of duplicated
  *     grams ("not counting characters twice"): scan positions in
  *     order, add = max(0, ce − max(prevDupCe, cs)) on dup rows;
  *     frac = r4f(Σadd/docChars); 0.0 when grams exist but none
  *     repeat, null when the doc has no n-gram of that n. */
case class GopherRepetition(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"gopher_repetition expects (array<string>, int), got (${l.simpleString}, ${r.simpleString})")
  }
  override def dataType: DataType = GopherRepetition.Schema
  override def prettyName: String = "gopher_repetition"

  override def nullSafeEval(toks: Any, dl: Any): Any =
    GopherRepetition.compute(toks.asInstanceOf[ArrayData], dl.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.GopherRepetition.compute($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object GopherRepetition {
  val Schema: StructType = StructType(
    (2 to 4).map(n => StructField(s"top_char_frac_$n", DoubleType)) ++
    (5 to 10).map(n => StructField(s"dup_char_frac_$n", DoubleType)))

  private val Sep = UTF8String.fromString(" ")

  /** util.r4f's JVM twin: floor(x·10⁴+0.5)/10⁴ — plain IEEE arithmetic,
    * identical in Spark, DuckDB, and here */
  private def r4f(x: Double): Double = math.floor(x * 10000d + 0.5d) / 10000d

  /** one JVM pass per row; called from both eval and generated code */
  def compute(toks: ArrayData, dl: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val t = toks.numElements()
    val tok = new Array[UTF8String](t)
    val cs = new Array[Long](t)
    val ce = new Array[Long](t)
    var i = 0
    var off = 0L
    while (i < t) {
      val u = toks.getUTF8String(i)
      tok(i) = if (u == null) UTF8String.EMPTY_UTF8 else u
      cs(i) = off
      ce(i) = off + tok(i).numChars()
      off = ce(i) + 1 // the single-space separator
      i += 1
    }
    val out = new Array[Any](9)
    var n = 2
    while (n <= 10) {
      val m = t - n + 1
      if (m > 0) {
        // gram strings + counts for this n
        val grams = new Array[UTF8String](m)
        val counts = new java.util.HashMap[UTF8String, Int](m * 2)
        var p = 0
        while (p < m) {
          val parts = new Array[UTF8String](n)
          var j = 0
          while (j < n) { parts(j) = tok(p + j); j += 1 }
          val g = UTF8String.concatWs(Sep, parts: _*)
          grams(p) = g
          counts.put(g, counts.getOrDefault(g, 0) + 1)
          p += 1
        }
        if (n <= 4) {
          // top family: max count, ties to the binary-smallest gram
          var bestCnt = 0
          var bestGram: UTF8String = null
          var bestLen = 0L
          p = 0
          while (p < m) {
            val c = counts.get(grams(p))
            if (c > bestCnt ||
                (c == bestCnt && grams(p).binaryCompare(bestGram) < 0)) {
              bestCnt = c
              bestGram = grams(p)
              bestLen = ce(p + n - 1) - cs(p)
            }
            p += 1
          }
          out(n - 2) = r4f(bestCnt.toLong * bestLen / dl.toDouble)
        } else {
          // dup family: overlap-deduplicated interval union of all
          // occurrences of duplicated grams, in position order
          var covered = 0L
          var prevDupCe = 0L // ≡ coalesce(max preceding dup ce, 0)
          p = 0
          while (p < m) {
            if (counts.get(grams(p)) >= 2) {
              val end = ce(p + n - 1)
              val start = math.max(prevDupCe, cs(p))
              if (end > start) covered += end - start
              if (end > prevDupCe) prevDupCe = end
            }
            p += 1
          }
          out(n - 2) = r4f(covered.toDouble / dl.toDouble)
        }
      } // else: no n-gram of this n → null
      n += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }
}

/** The count-weighted repetition-filter inputs (q_repetition_ratio's
  * seven columns) in ONE map-side pass per document:
  * `struct<top_share_1, dup_frac_2, top_share_2, dup_frac_3,
  * top_share_3, dup_frac_4, top_share_4>` — [[GopherRepetition]]'s
  * count-weighted sibling, replacing the explode-over-4·len chain
  * (which shuffled every (doc, n, gram) row through two groupBys) for
  * the same per-doc-local reason. For each n = 1..4 over the doc's
  * grams: dup_frac_n = r4f(1 − distinct/total), top_share_n =
  * r4f(maxCount/total); null when the doc has no n-gram of that n. */
case class RepetitionRatio(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"repetition_ratio expects array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = RepetitionRatio.Schema
  override def prettyName: String = "repetition_ratio"

  override def nullSafeEval(toks: Any): Any =
    RepetitionRatio.compute(toks.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.RepetitionRatio.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionRatio {
  val Schema: StructType = StructType(Seq(
    StructField("top_share_1", DoubleType), StructField("dup_frac_2", DoubleType),
    StructField("top_share_2", DoubleType), StructField("dup_frac_3", DoubleType),
    StructField("top_share_3", DoubleType), StructField("dup_frac_4", DoubleType),
    StructField("top_share_4", DoubleType)))

  private val Sep = UTF8String.fromString(" ")

  private def r4f(x: Double): Double = math.floor(x * 10000d + 0.5d) / 10000d

  /** one JVM pass per row; called from both eval and generated code */
  def compute(toks: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val t = toks.numElements()
    val tok = new Array[UTF8String](t)
    var i = 0
    while (i < t) {
      val u = toks.getUTF8String(i)
      tok(i) = if (u == null) UTF8String.EMPTY_UTF8 else u
      i += 1
    }
    val out = new Array[Any](7)
    var n = 1
    while (n <= 4) {
      val m = t - n + 1
      if (m > 0) {
        val counts = new java.util.HashMap[UTF8String, Int](m * 2)
        var topc = 0
        var p = 0
        while (p < m) {
          val g = if (n == 1) tok(p) else {
            val parts = new Array[UTF8String](n)
            var j = 0
            while (j < n) { parts(j) = tok(p + j); j += 1 }
            UTF8String.concatWs(Sep, parts: _*)
          }
          val c = counts.getOrDefault(g, 0) + 1
          counts.put(g, c)
          if (c > topc) topc = c
          p += 1
        }
        val total = m.toDouble
        val dist = counts.size.toDouble
        if (n >= 2) out(2 * n - 3) = r4f(1d - dist / total)
        out(2 * (n - 1)) = r4f(topc / total)
      }
      n += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }
}

object TextExpressions {
  /** register once per session; idempotent */
  def register(s: SparkSession): Unit = {
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_ngrams", exprs => WordNgrams(exprs(0),
        exprs(1).eval(null).asInstanceOf[Int]), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "unicode_normalize", exprs => UnicodeNormalize(exprs(0),
        exprs(1).eval(null).asInstanceOf[UTF8String].toString), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_positions", exprs => WinnowPositions(exprs(0),
        exprs(1).eval(null).asInstanceOf[Int],
        exprs(2).eval(null).asInstanceOf[Int]), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_grams", exprs => WinnowGrams(exprs(0),
        exprs(1).eval(null).asInstanceOf[Int],
        exprs(2).eval(null).asInstanceOf[Int]), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_gram_md5", exprs => CharGramMd5(exprs(0),
        exprs(1).eval(null).asInstanceOf[Int]), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5_prefix64", exprs => Md5Prefix64(exprs(0),
        exprs(1).eval(null).asInstanceOf[Int]), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_ngram_md5p64", exprs => WordNgramMd5p64(exprs(0),
        exprs(1).eval(null).asInstanceOf[Int],
        exprs(2).eval(null).asInstanceOf[Int]), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bpe_merge_step", exprs => BpeMergeStep(exprs(0),
        exprs(1).eval(null).asInstanceOf[UTF8String].toString,
        exprs(2).eval(null).asInstanceOf[UTF8String].toString), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bpe_pair_deltas", exprs => BpePairDeltas(exprs(0),
        exprs(1).eval(null).asInstanceOf[UTF8String].toString,
        exprs(2).eval(null).asInstanceOf[UTF8String].toString), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "gopher_repetition", exprs => GopherRepetition(exprs(0), exprs(1)),
      "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "repetition_ratio", exprs => RepetitionRatio(exprs(0)), "built-in")
  }

  /** word_ngrams(toks, n) as a Column (requires register first) */
  def wordNgrams(toks: Column, n: Int): Column =
    call_function("word_ngrams", toks, org.apache.spark.sql.functions.lit(n))

  /** unicode_normalize(text, form) as a Column (requires register first) */
  def unicodeNormalize(text: Column, form: String): Column =
    call_function("unicode_normalize", text,
      org.apache.spark.sql.functions.lit(form))

  /** winnow_positions(text, l, w) as a Column (requires register first) */
  def winnowPositions(text: Column, l: Int, w: Int): Column =
    call_function("winnow_positions", text,
      org.apache.spark.sql.functions.lit(l),
      org.apache.spark.sql.functions.lit(w))

  /** winnow_grams(text, l, w) as a Column (requires register first) */
  def winnowGrams(text: Column, l: Int, w: Int): Column =
    call_function("winnow_grams", text,
      org.apache.spark.sql.functions.lit(l),
      org.apache.spark.sql.functions.lit(w))

  /** char_gram_md5(text, l) as a Column (requires register first) */
  def charGramMd5(text: Column, l: Int): Column =
    call_function("char_gram_md5", text,
      org.apache.spark.sql.functions.lit(l))

  /** md5_prefix64(text, hexLen) as a Column (requires register first) */
  def md5Prefix64(text: Column, hexLen: Int): Column =
    call_function("md5_prefix64", text,
      org.apache.spark.sql.functions.lit(hexLen))

  /** word_ngram_md5p64(toks, n, hexLen) as a Column (requires register first) */
  def wordNgramMd5p64(toks: Column, n: Int, hexLen: Int): Column =
    call_function("word_ngram_md5p64", toks,
      org.apache.spark.sql.functions.lit(n),
      org.apache.spark.sql.functions.lit(hexLen))

  /** bpe_merge_step(toks, a, b) as a Column (requires register first) */
  def bpeMergeStep(toks: Column, a: String, b: String): Column =
    call_function("bpe_merge_step", toks,
      org.apache.spark.sql.functions.lit(a),
      org.apache.spark.sql.functions.lit(b))

  /** bpe_pair_deltas(toks, a, b) as a Column (requires register first) */
  def bpePairDeltas(toks: Column, a: String, b: String): Column =
    call_function("bpe_pair_deltas", toks,
      org.apache.spark.sql.functions.lit(a),
      org.apache.spark.sql.functions.lit(b))

  /** gopher_repetition(toks, docChars) as a Column (requires register first) */
  def gopherRepetition(toks: Column, docChars: Column): Column =
    call_function("gopher_repetition", toks, docChars)

  /** repetition_ratio(toks) as a Column (requires register first) */
  def repetitionRatio(toks: Column): Column =
    call_function("repetition_ratio", toks)
}
