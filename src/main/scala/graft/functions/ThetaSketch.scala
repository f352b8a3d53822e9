package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketch, Sketches, Union}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Theta sketches (Dasgupta et al., "Theta-Sketch Framework") as native
  * aggregates + set-operation expressions — the capability HLL cannot
  * express: distinct-count SET ALGEBRA. An HLL union answers "users in A
  * or B"; theta sketches also answer A ∩ B and A \ B, which is what
  * segment-overlap questions ("how many purchasers also clicked?") need.
  * At 100 TB the pattern is the same as the HLL/frequent-items rollups:
  * persist one kilobyte sketch per (segment, day), answer any later
  * overlap question by sketch algebra — no raw-row rescan, no
  * count-distinct join.
  *
  * Exactness contract: an UpdateSketch stays in exact mode (θ = 1, every
  * hash retained) until it exceeds its nominal-entries bound (default
  * 4096); set operations over exact sketches are exact. Test-corpus
  * segments sit far below the bound, so `q_agg_theta_ops` carries a hard
  * DuckDB oracle; the sampled approximate regime is spec-pinned. */
case class ThetaSketchAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Union =
    SetOperation.builder().buildUnion()

  override def update(b: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) b.update(v.toString)
    b
  }

  override def merge(b: Union, o: Union): Union = {
    b.union(o.getResult); b
  }

  override def eval(b: Union): Any = b.getResult.toByteArray
  override def serialize(b: Union): Array[Byte] = b.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().buildUnion()
    u.union(Sketches.wrapSketch(Memory.wrap(bytes)))
    u
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_sketch_agg"
  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

/** union of SERIALIZED theta sketches — the rollup half over a persisted
  * sketch table: input column is the binary state [[ThetaSketchAgg]]
  * emitted */
case class ThetaMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression]
  with ExpectsInputTypes {

  // the input must be a serialized theta state; anything else fails
  // analysis instead of a runtime cast in update()
  override def inputTypes = Seq(BinaryType)

  override def createAggregationBuffer(): Union =
    SetOperation.builder().buildUnion()

  override def update(b: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null)
      b.union(Sketches.wrapSketch(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    b
  }

  override def merge(b: Union, o: Union): Union = {
    b.union(o.getResult); b
  }

  override def eval(b: Union): Any = b.getResult.toByteArray
  override def serialize(b: Union): Array[Byte] = b.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().buildUnion()
    u.union(Sketches.wrapSketch(Memory.wrap(bytes)))
    u
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_sketch_merge"
  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaMergeAgg =
    copy(child = newChild)
}

/** set-operation expressions over serialized theta sketches — eval-only
  * (CodegenFallback): they run once per RESULT row on kilobyte states,
  * never per input row */
sealed trait ThetaBinaryOp extends BinaryExpression with CodegenFallback
    with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  protected def wrap(v: Any): Sketch =
    Sketches.wrapSketch(Memory.wrap(v.asInstanceOf[Array[Byte]]))
}

case class ThetaUnionOf(left: Expression, right: Expression) extends ThetaBinaryOp {
  override def nullSafeEval(a: Any, b: Any): Any = {
    val u = SetOperation.builder().buildUnion()
    u.union(wrap(a)); u.union(wrap(b))
    u.getResult.toByteArray
  }
  override def prettyName: String = "theta_union"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class ThetaIntersect(left: Expression, right: Expression) extends ThetaBinaryOp {
  override def nullSafeEval(a: Any, b: Any): Any = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(wrap(a)); i.intersect(wrap(b))
    i.getResult.toByteArray
  }
  override def prettyName: String = "theta_intersect"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class ThetaANotB(left: Expression, right: Expression) extends ThetaBinaryOp {
  override def nullSafeEval(a: Any, b: Any): Any = {
    val an = SetOperation.builder().buildANotB()
    an.setA(wrap(a)); an.notB(wrap(b))
    an.getResult(true).toByteArray
  }
  override def prettyName: String = "theta_a_not_b"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** rounded distinct estimate — exact-mode sketches give integral
  * estimates, so the round is lossless in the oracle regime */
case class ThetaEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    math.round(Sketches.wrapSketch(
      Memory.wrap(v.asInstanceOf[Array[Byte]])).getEstimate)
  override def prettyName: String = "theta_estimate"
  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

object ThetaSketch {
  /** register once per session; idempotent */
  def register(s: SparkSession): Unit = {
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "theta_sketch_agg", exprs => ThetaSketchAgg(exprs(0)), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "theta_sketch_merge", exprs => ThetaMergeAgg(exprs(0)), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "theta_union", exprs => ThetaUnionOf(exprs(0), exprs(1)), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "theta_intersect", exprs => ThetaIntersect(exprs(0), exprs(1)), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "theta_a_not_b", exprs => ThetaANotB(exprs(0), exprs(1)), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "theta_estimate", exprs => ThetaEstimate(exprs(0)), "built-in")
  }

  def thetaAgg(c: Column): Column = call_function("theta_sketch_agg", c)
  def thetaMerge(c: Column): Column = call_function("theta_sketch_merge", c)
  def thetaUnion(a: Column, b: Column): Column = call_function("theta_union", a, b)
  def thetaIntersect(a: Column, b: Column): Column = call_function("theta_intersect", a, b)
  def thetaANotB(a: Column, b: Column): Column = call_function("theta_a_not_b", a, b)
  def thetaEstimate(c: Column): Column = call_function("theta_estimate", c)
}
