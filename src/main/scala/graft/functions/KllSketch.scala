package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** KLL quantile sketches (Karnin, Lang, Liberty, FOCS 2016) as native
  * aggregates — the QUANTILE member of the persisted-sketch family
  * beside HLL (distinct), frequent-items (top-k), and theta (set
  * algebra). `percentile_approx` answers "p99 of THIS aggregation";
  * a KLL state is a first-class value: persist one per (segment, day),
  * answer p50/p99 over any later window by merging kilobyte states —
  * no raw-row rescan, and the merge is lossless in guarantee terms
  * (rank error stays bounded after any merge tree, the property
  * single-shot t-digest/GK states don't give you).
  *
  * Default k = 200 ⇒ ~1.65% one-sided rank error (the library's
  * published bound at 99% confidence); the spec pins the estimate
  * inside the EXACT values at ranks p ± 2·ε. */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression]
  with ImplicitCastInputTypes {

  // numeric inputs implicitly widen to double at analysis; a
  // non-numeric column is an AnalysisException, not a runtime
  // ClassCastException in an executor task
  override def inputTypes = Seq(DoubleType)

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(b: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) b.update(v.asInstanceOf[Double])
    b
  }

  override def merge(b: KllDoublesSketch, o: KllDoublesSketch): KllDoublesSketch = {
    b.merge(o); b
  }

  override def eval(b: KllDoublesSketch): Any = b.toByteArray
  override def serialize(b: KllDoublesSketch): Array[Byte] = b.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_sketch_agg"
  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}

/** union of serialized KLL states — the rollup half over a persisted
  * sketch table */
case class KllMergeAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression]
  with ExpectsInputTypes {

  // the input must be a serialized KLL state; anything else fails
  // analysis instead of a runtime cast in update()
  override def inputTypes = Seq(BinaryType)

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(b: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      b.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    b
  }

  override def merge(b: KllDoublesSketch, o: KllDoublesSketch): KllDoublesSketch = {
    b.merge(o); b
  }

  override def eval(b: KllDoublesSketch): Any = b.toByteArray
  override def serialize(b: KllDoublesSketch): Array[Byte] = b.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_sketch_merge"
  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
}

/** decode quantile estimates at the given ranks from a serialized KLL
  * state — eval-only, runs once per result row on a kilobyte state */
case class KllQuantiles(child: Expression, ranks: Seq[Double])
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) new GenericArrayData(Array.fill[Any](ranks.length)(Double.NaN))
    else new GenericArrayData(
      ranks.map(r => sk.getQuantile(r): Any).toArray)
  }

  override def prettyName: String = "kll_quantiles"
  override protected def withNewChildInternal(newChild: Expression): KllQuantiles =
    copy(child = newChild)
}

object KllSketch {
  /** default accuracy parameter: ~1.65% one-sided rank error @99% conf */
  val DefaultK = 200

  /** register once per session; idempotent */
  def register(s: SparkSession): Unit = {
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kll_sketch_agg", exprs => KllSketchAgg(exprs(0),
        FnArgs.litInt(exprs(1), "kll_sketch_agg", "k")), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kll_sketch_merge", exprs => KllMergeAgg(exprs(0),
        FnArgs.litInt(exprs(1), "kll_sketch_merge", "k")), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kll_quantiles", exprs => KllQuantiles(exprs(0),
        FnArgs.litDoubleArray(exprs(1), "kll_quantiles", "ranks")),
      "built-in")
  }

  def kllAgg(c: Column, k: Int = DefaultK): Column =
    call_function("kll_sketch_agg", c, org.apache.spark.sql.functions.lit(k))

  def kllMerge(c: Column, k: Int = DefaultK): Column =
    call_function("kll_sketch_merge", c, org.apache.spark.sql.functions.lit(k))

  /** quantiles(sketch, ranks) as a Column (requires register first) */
  def kllQuantiles(c: Column, ranks: Seq[Double]): Column =
    call_function("kll_quantiles", c,
      org.apache.spark.sql.functions.lit(ranks.toArray))
}
