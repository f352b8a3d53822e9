package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Re-aggregatable heavy-hitters sketches (ClickHouse
  * `topKWeighted`-with-state / Spark `hll_sketch_agg` analog for
  * FREQUENCIES): DataSketches frequent-items wrapped as native
  * `TypedImperativeAggregate`s, the frequency twin of `q_agg_hll_union`'s
  * HLL rollup.
  *
  * Why this exists next to [[TopKAggregator]]: the space-saving UDAF
  * answers "top k of THIS aggregation"; the sketch column here is a
  * first-class VALUE — persist one per (event_type, day), union any later
  * slice without rescanning rows, and read items WITH deterministic
  * error bounds (lb/ub). That persist-then-merge contract is what a
  * 100 TB dashboard needs: daily sketch builds touch each row once, every
  * later "top users in window W" is a merge of |W| kilobyte-sized states.
  *
  * Exactness contract (mirrors TopK's "capacity ≥ distinct ⇒ exact"):
  * while an ItemsSketch's internal map never purges (distinct items ≤
  * ~0.75 · maxMapSize), every count is exact and lb = est = ub — which is
  * what lets `q_agg_freq_sketch` carry a hard DuckDB oracle at the test
  * cardinalities. Past saturation the sketch guarantees
  * lb ≤ true ≤ ub with error ≤ 3.5·n/maxMapSize (Anderson et al.,
  * "A high-performance algorithm for identifying frequent items in data
  * streams" — the library's published bound); the spec pins that regime
  * on a deliberately tiny map.
  *
  * The aggregation state is the library sketch itself (serialized only at
  * shuffle/spill boundaries via `serialize`/`deserialize`, the
  * TypedImperativeAggregate contract), so per-row updates are O(1) map
  * hits, never per-row serde. */
case class FreqItemsAgg(
    child: Expression,
    maxMapSize: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] with UnaryLike[Expression] {

  @transient private lazy val serde = new ArrayOfStringsSerDe

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(b: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) b.update(v.toString)
    b
  }

  override def merge(b: ItemsSketch[String], o: ItemsSketch[String]): ItemsSketch[String] = {
    b.merge(o); b
  }

  override def eval(b: ItemsSketch[String]): Any = b.toByteArray(serde)
  override def serialize(b: ItemsSketch[String]): Array[Byte] = b.toByteArray(serde)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "freq_sketch_agg"
  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqItemsAgg =
    copy(child = newChild)
}

/** union of serialized frequent-items sketches — the rollup half: input
  * column is the BINARY sketch state [[FreqItemsAgg]] emitted */
case class FreqMergeAgg(
    child: Expression,
    maxMapSize: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] with UnaryLike[Expression]
  with ExpectsInputTypes {

  // the input must be a serialized sketch state; anything else fails
  // analysis instead of a runtime cast in update()
  override def inputTypes = Seq(BinaryType)

  @transient private lazy val serde = new ArrayOfStringsSerDe

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(b: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null)
      b.merge(ItemsSketch.getInstance(
        Memory.wrap(v.asInstanceOf[Array[Byte]]), serde))
    b
  }

  override def merge(b: ItemsSketch[String], o: ItemsSketch[String]): ItemsSketch[String] = {
    b.merge(o); b
  }

  override def eval(b: ItemsSketch[String]): Any = b.toByteArray(serde)
  override def serialize(b: ItemsSketch[String]): Array[Byte] = b.toByteArray(serde)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "freq_sketch_merge"
  override def withNewMutableAggBufferOffset(newOffset: Int): FreqMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqMergeAgg =
    copy(child = newChild)
}

/** decode a serialized sketch to its top-k rows
  * (item, est, lb, ub), ranked by (est DESC, item ASC) — the string
  * tie-break is part of the cross-engine contract, mirrored in the
  * oracle's `ORDER BY n DESC, item::VARCHAR`. Eval-only
  * (CodegenFallback): it runs once per GROUP on a kilobyte state, never
  * per input row, so codegen would buy nothing. */
case class FreqSketchTopK(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)

  @transient private lazy val serde = new ArrayOfStringsSerDe

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("lb", LongType, nullable = false),
    StructField("ub", LongType, nullable = false))), containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val sk = ItemsSketch.getInstance(
      Memory.wrap(v.asInstanceOf[Array[Byte]]), serde)
    val rows = sk.getFrequentItems(0L, ErrorType.NO_FALSE_NEGATIVES)
      .sortBy(r => (-r.getEstimate, r.getItem))
      .take(k)
      .map(r => InternalRow(UTF8String.fromString(r.getItem),
        r.getEstimate, r.getLowerBound, r.getUpperBound))
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def prettyName: String = "freq_sketch_topk"
  override protected def withNewChildInternal(newChild: Expression): FreqSketchTopK =
    copy(child = newChild)
}

object FreqSketch {
  /** default sketch map size: power of 2; exact while distinct ≤ ~0.75·this */
  val DefaultMapSize = 4096

  /** register once per session; idempotent */
  def register(s: SparkSession): Unit = {
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "freq_sketch_agg", exprs => FreqItemsAgg(exprs(0),
        FnArgs.litInt(exprs(1), "freq_sketch_agg", "maxMapSize")), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "freq_sketch_merge", exprs => FreqMergeAgg(exprs(0),
        FnArgs.litInt(exprs(1), "freq_sketch_merge", "maxMapSize")), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "freq_sketch_topk", exprs => FreqSketchTopK(exprs(0),
        FnArgs.litInt(exprs(1), "freq_sketch_topk", "k")), "built-in")
  }

  def freqAgg(c: Column, maxMapSize: Int = DefaultMapSize): Column =
    call_function("freq_sketch_agg", c, lit(maxMapSize))

  def freqMerge(c: Column, maxMapSize: Int = DefaultMapSize): Column =
    call_function("freq_sketch_merge", c, lit(maxMapSize))

  def freqTopK(c: Column, k: Int): Column =
    call_function("freq_sketch_topk", c, lit(k))
}
