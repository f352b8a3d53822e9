package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
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

object TextExpressions {
  /** register once per session; idempotent */
  def register(s: SparkSession): Unit =
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_ngrams", exprs => WordNgrams(exprs(0),
        exprs(1).eval(null).asInstanceOf[Int]), "built-in")

  /** word_ngrams(toks, n) as a Column (requires register first) */
  def wordNgrams(toks: Column, n: Int): Column =
    call_function("word_ngrams", toks, org.apache.spark.sql.functions.lit(n))
}
