package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.Decimal

/** Validation for the literal parameters of SQL-registered functions.
  *
  * `FunctionRegistry` builders receive raw `Expression`s; a bare
  * `eval(null).asInstanceOf[Int]` turns a mistyped call like
  * `kll_sketch_agg(x, '200')` into a runtime ClassCastException deep in
  * an executor task. These helpers fail at FUNCTION-RESOLUTION time
  * (analysis) with the function and parameter named, which is where a
  * bad literal should surface. Integral literals wider/narrower than
  * INT (tinyint..bigint in range) are accepted — SQL integer literals
  * are typed by magnitude, not intent. */
private[functions] object FnArgs {

  /** evaluate `e` as a literal Int parameter of `fn`, or fail with an
    * analysis-time error naming the function and parameter */
  def litInt(e: Expression, fn: String, param: String): Int = {
    require(e.foldable,
      s"$fn: $param must be a literal integer, got non-foldable ${e.sql}")
    e.eval(null) match {
      case i: Int => i
      case b: Byte => b.toInt
      case s: Short => s.toInt
      case l: Long if l.isValidInt => l.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: $param must be a literal integer, got " +
          s"${e.dataType.simpleString} literal ${String.valueOf(other)}")
    }
  }

  /** evaluate `e` as a literal array of doubles (numeric elements are
    * widened), or fail with an analysis-time error */
  def litDoubleArray(e: Expression, fn: String, param: String): Seq[Double] = {
    require(e.foldable,
      s"$fn: $param must be a literal array of doubles, got non-foldable ${e.sql}")
    e.eval(null) match {
      case a: ArrayData =>
        a.toObjectArray(e.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
          .elementType).toSeq.map {
          case d: java.lang.Double => d.doubleValue
          case f: java.lang.Float => f.doubleValue
          case i: java.lang.Integer => i.doubleValue
          case l: java.lang.Long => l.doubleValue
          case d: Decimal => d.toDouble
          case other => throw new IllegalArgumentException(
            s"$fn: $param must contain numeric literals, got ${String.valueOf(other)}")
        }
      case other => throw new IllegalArgumentException(
        s"$fn: $param must be a literal array of doubles, got " +
          s"${e.dataType.simpleString} literal ${String.valueOf(other)}")
    }
  }
}
