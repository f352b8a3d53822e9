package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for embedding math (SURVEY.md §4.2 ladder:
  * compose built-ins → custom Expression → custom plan). Cosine over
  * ArrayType(FloatType) is the one hot loop where the built-in route —
  * zip_with + aggregate higher-order functions — runs interpreted per
  * element with boxed lambda calls; this expression is a tight codegen'd
  * loop over the packed ArrayData (and a matching interpreted eval).
  *
  * Semantics match Similarity's HOF formulation bit-for-bit: per-element
  * float→double products accumulated in index order,
  * dot / (sqrt(norm_a) * sqrt(norm_b)); NaN when either norm is 0.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0d; var nx = 0d; var ny = 0d
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** MinHash signature as ONE native expression: array<string> grams →
  * array<int> of `perms` seeded-murmur3 minima. Replaces the
  * explode → 16-column min-aggregate → shuffle pipeline with a map-side
  * per-row projection — at scale, signatures cost zero shuffles and the
  * only exchange left in MinHash-LSH is the band-bucket grouping.
  * Hash family: Murmur3_x86_32 over the gram's UTF-8 bytes, seed = perm
  * index (the same deterministic-seeded family as hash(gram, i)). */
case class MinHashSig(child: Expression, perms: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_sig expects array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(perms)(Int.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      var p = 0
      while (p < perms) {
        val h = org.apache.spark.unsafe.hash.Murmur3_x86_32
          .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, p)
        if (h < mins(p)) mins(p) = h
        p += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val p = ctx.freshName("p")
      val n = ctx.freshName("n"); val mins = ctx.freshName("mins")
      val s = ctx.freshName("s"); val h = ctx.freshName("h")
      s"""
         |int $n = $a.numElements();
         |int[] $mins = new int[$perms];
         |java.util.Arrays.fill($mins, Integer.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($i);
         |  for (int $p = 0; $p < $perms; $p++) {
         |    int $h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
         |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), $p);
         |    if ($h < $mins[$p]) $mins[$p] = $h;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash as one native expression: array<string> tokens → LONG.
  * Each token hashes once (Murmur3 over UTF-8 bytes, 2 seeds for 64 bits);
  * per-bit ±1 sums accumulate in a local array — a map-side projection,
  * no explode, no 64-column aggregate, no shuffle. */
case class SimHashSig(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash_sig expects array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "simhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getUTF8String(i)
      val lo = org.apache.spark.unsafe.hash.Murmur3_x86_32
        .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 0)
      val hi = org.apache.spark.unsafe.hash.Murmur3_x86_32
        .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 1)
      val h = (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) >= 0) out |= (1L << b); b += 1 }
    java.lang.Long.valueOf(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val b = ctx.freshName("b")
      val counts = ctx.freshName("counts"); val s = ctx.freshName("s")
      val lo = ctx.freshName("lo"); val hi = ctx.freshName("hi")
      val h = ctx.freshName("h"); val out = ctx.freshName("out")
      s"""
         |int[] $counts = new int[64];
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($i);
         |  int $lo = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
         |    $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 0);
         |  int $hi = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
         |    $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 1);
         |  long $h = (((long) $hi) << 32) | (((long) $lo) & 0xffffffffL);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $counts[$b]++; else $counts[$b]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) { if ($counts[$b] >= 0) $out |= (1L << $b); }
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The CROSS-ENGINE SimHash signature as one map-side expression: 60-bit
  * sig over md5-prefix token hashes, numerically identical to the
  * explode → `md5_prefix64(tk, 15)` → groupBy(doc_id) with 60 bit-vote
  * sum-aggregates formulation the DuckDB oracle CTEs replay (bit b set
  * iff Σ_tokens ((h>>b)&1 ? +1 : −1) ≥ 0). The aggregate form shuffles
  * one row per TOKEN into a 60-column partial agg; every token of a doc
  * is already present in the doc's own row, so the signature is per-row
  * local math — zero explode, zero shuffle. The murmur3 [[SimHashSig]]
  * stays the production default; this twin exists wherever the oracle
  * must replay the hash family (chunks/eval/index paths). */
case class SimHashSigMd5(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash_sig_md5 expects array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "simhash_sig_md5"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(SimHashSigMd5.compute(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SimHashSigMd5.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashSigMd5 {
  def compute(arr: ArrayData): Long = {
    val counts = new Array[Int](60)
    var i = 0
    while (i < arr.numElements()) {
      val h = Md5Prefix64.compute(arr.getUTF8String(i), 15)
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) { if (counts(b) >= 0) out |= (1L << b); b += 1 }
    out
  }
}

/** Sign-LSH (random hyperplane) bucket id as ONE native expression:
  * array<float> embedding → INT of `planes` sign bits. Bit j is set when
  * dot(embedding, plane_j) >= 0, where plane_j's component for dimension d
  * is ±1 from the low bit of xxhash64(j, d) (seed 42) — the exact hash
  * family of the SQL `xxhash64(j, d)` the interpreted HOF formulation
  * used, so bucket assignments are bit-identical. The HOF version paid
  * planes×dims boxed lambda invocations per row (512 for 8×64); this is a
  * tight codegen'd double loop over packed ArrayData. The per-plane hash
  * seed (xxhash64 of j alone) is row-invariant and precomputed once. */
case class SignLshBucket(child: Expression, planes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"sign_lsh_bucket expects array<float>, got ${t.simpleString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "sign_lsh_bucket"

  /** per-plane seeds: xxhash64's running hash after the plane index j
    * (SQL xxhash64(j, d) == hashInt(d, hashInt(j, 42))) */
  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(planes)(j =>
      org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(j, 42L))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var bucket = 0
    var j = 0
    while (j < planes) {
      val seed = seeds(j)
      var dot = 0d
      var d = 0
      while (d < n) {
        val xi = arr.getFloat(d).toDouble
        dot += (if ((org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(d, seed) & 1L) == 1L) xi else -xi)
        d += 1
      }
      if (dot >= 0d) bucket |= (1 << j)
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val seedsRef = ctx.addReferenceObj("lshSeeds", seeds, "long[]")
      val n = ctx.freshName("n"); val j = ctx.freshName("j")
      val d = ctx.freshName("d"); val dot = ctx.freshName("dot")
      val xi = ctx.freshName("xi"); val bucket = ctx.freshName("bucket")
      val seed = ctx.freshName("seed")
      s"""
         |int $n = $a.numElements();
         |int $bucket = 0;
         |for (int $j = 0; $j < $planes; $j++) {
         |  long $seed = $seedsRef[$j];
         |  double $dot = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    double $xi = (double) $a.getFloat($d);
         |    $dot += ((org.apache.spark.sql.catalyst.expressions.XXH64.hashInt($d, $seed) & 1L) == 1L) ? $xi : -$xi;
         |  }
         |  if ($dot >= 0.0) $bucket |= (1 << $j);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** IVF coarse-quantizer assignment as ONE native expression:
  * (embedding array<float>, centroids array<struct<cid bigint,
  * ce array<float>>>) → BIGINT id of the nearest centroid by cosine.
  * The centroid array is a broadcast-small constant column (collect_list
  * of the centroid table crossed onto each row), so assignment is a
  * map-side projection: zero shuffles, no K× row amplification — the
  * shape a trained-k-means IVF would use at 100 TB, here with a
  * deterministic md5-sampled codebook so DuckDB can replay it exactly.
  * Cosine is rounded half-up to 4 dp before the argmax (floor(x·10⁴+0.5))
  * and ties break to the smallest cid, making the assignment
  * cross-engine deterministic. Contract: inputs and centroids must have
  * nonzero norm (normalize embeddings upstream) — NaN cosine ordering
  * differs between engines and is deliberately unspecified here. */
case class IvfAssign(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(org.apache.spark.sql.types.StructType(fields), _))
        if fields.length == 2 && fields(0).dataType == org.apache.spark.sql.types.LongType &&
           fields(1).dataType.isInstanceOf[ArrayType] &&
           fields(1).dataType.asInstanceOf[ArrayType].elementType == FloatType =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"ivf_assign expects (array<float>, array<struct<cid: bigint, ce: array<float>>>), " +
        s"got (${l.simpleString}, ${r.simpleString})")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "ivf_assign"

  override def nullSafeEval(a: Any, b: Any): Any =
    IvfAssign.assign(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.IvfAssign.assign($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IvfAssign {
  /** rounded-cosine argmax over the codebook; one JVM loop per row */
  def assign(v: ArrayData, cents: ArrayData): Long = {
    val k = cents.numElements()
    var bestCid = Long.MaxValue
    var bestCos = Double.NegativeInfinity
    var c = 0
    while (c < k) {
      val row = cents.getStruct(c, 2)
      val cid = row.getLong(0)
      val ce = row.getArray(1)
      val n = math.min(v.numElements(), ce.numElements())
      var dot = 0d; var nv = 0d; var nc = 0d
      var i = 0
      while (i < n) {
        val xi = v.getFloat(i).toDouble
        val yi = ce.getFloat(i).toDouble
        dot += xi * yi; nv += xi * xi; nc += yi * yi
        i += 1
      }
      val cos = math.floor(dot / (math.sqrt(nv) * math.sqrt(nc)) * 10000.0 + 0.5) / 10000.0
      // zero-norm inputs are out of contract (cos = NaN; Spark floor,
      // DuckDB floor, and IEEE compare all disagree on NaN, so no single
      // argmax semantic can match every twin) — normalize upstream
      if (cos > bestCos || (cos == bestCos && cid < bestCid)) {
        bestCos = cos; bestCid = cid
      }
      c += 1
    }
    bestCid
  }
}

/** pq_assign(sub, cents): INDEX (0-based) of the L2-nearest sub-centroid
  * — the product-quantization sub-space encoder. Returns a position, not
  * an id, so the caller can use it directly as an ADC distance-table
  * lookup index against arrays built in the SAME centroid order.
  * Tie-break: smallest index. L2 argmin (the standard PQ quantizer —
  * unlike [[IvfAssign]]'s cosine, sub-vector magnitude matters here
  * because the table lookup reconstructs dot-product contributions).
  * Exact double arithmetic in index order: deterministic everywhere. */
case class PqAssign(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(ArrayType(FloatType, _), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_assign expects (array<float>, array<array<float>>), " +
        s"got (${l.simpleString}, ${r.simpleString})")
  }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "pq_assign"

  override def nullSafeEval(a: Any, b: Any): Any =
    PqAssign.assign(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.PqAssign.assign($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** rank-space bucket assignment for the Z-order layout writer
  * (`Sinks.writeZOrdered`): the count of quantile boundaries strictly
  * below the value, via codegen'd BINARY SEARCH over the boundary array
  * (compiled ~log2(256) steps/row where the higher-order `aggregate`
  * fold this replaces ran 2^bits interpreted lambda calls/row — measured
  * ~3× the whole layout build). Boundaries must be sorted
  * (approxQuantile's contract); duplicate boundaries collapse buckets,
  * matching the fold's strict-< count. */
case class QuantileBucket(child: Expression, bounds: Array[Double])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quantile_bucket expects double, got ${child.dataType.simpleString}")

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "quantile_bucket"

  override def nullSafeEval(v: Any): Any = {
    val d = v.asInstanceOf[Double]
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (d > bounds(mid)) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val arr = ctx.addReferenceObj("bounds", bounds, "double[]")
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      s"""
         |int $lo = 0;
         |int $hi = $arr.length;
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($c > $arr[$mid]) { $lo = $mid + 1; } else { $hi = $mid; }
         |}
         |${ev.value} = (long) $lo;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QuantileBucket =
    copy(child = newChild)
}

object PqAssign {
  /** squared-L2 argmin over the sub-codebook; one JVM loop per row */
  def assign(v: ArrayData, cents: ArrayData): Int = {
    val k = cents.numElements()
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < k) {
      val ce = cents.getArray(c)
      val n = math.min(v.numElements(), ce.numElements())
      var d = 0d
      var i = 0
      while (i < n) {
        val diff = v.getFloat(i).toDouble - ce.getFloat(i).toDouble
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }
}

object VectorExpressions {
  /** register once per session; idempotent */
  def register(s: SparkSession): Unit = {
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig", exprs => MinHashSig(exprs(0),
        exprs(1).eval(null).asInstanceOf[Int]), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash_sig", exprs => SimHashSig(exprs(0)), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash_sig_md5", exprs => SimHashSigMd5(exprs(0)), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sign_lsh_bucket", exprs => SignLshBucket(exprs(0),
        exprs(1).eval(null).asInstanceOf[Int]), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ivf_assign", exprs => IvfAssign(exprs(0), exprs(1)), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_assign", exprs => PqAssign(exprs(0), exprs(1)), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "quantile_bucket", exprs => QuantileBucket(exprs(0),
        exprs(1).eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toDoubleArray()), "built-in")
  }

  /** simhash_sig(tokens) as a Column (requires register first) */
  def simhashSig(toks: Column): Column = call_function("simhash_sig", toks)

  /** simhash_sig_md5(tokens) as a Column (requires register first) */
  def simhashSigMd5(toks: Column): Column = call_function("simhash_sig_md5", toks)

  /** cosine_sim(a, b) as a Column (requires register(session) first) */
  def cosineSim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)

  /** minhash_sig(grams, perms) as a Column (requires register first) */
  def minhashSig(grams: Column, perms: Int): Column =
    call_function("minhash_sig", grams, org.apache.spark.sql.functions.lit(perms))

  /** sign_lsh_bucket(embedding, planes) as a Column (requires register first) */
  def signLshBucket(emb: Column, planes: Int): Column =
    call_function("sign_lsh_bucket", emb, org.apache.spark.sql.functions.lit(planes))

  /** ivf_assign(embedding, centroids) as a Column (requires register first) */
  def ivfAssign(emb: Column, centroids: Column): Column =
    call_function("ivf_assign", emb, centroids)

  /** quantile_bucket(value, bounds) as a Column (requires register first) */
  def quantileBucket(v: Column, bounds: Array[Double]): Column =
    call_function("quantile_bucket", v, org.apache.spark.sql.functions.lit(bounds))

  /** pq_assign(subvector, subcentroids) as a Column (requires register first) */
  def pqAssign(sub: Column, cents: Column): Column =
    call_function("pq_assign", sub, cents)
}
