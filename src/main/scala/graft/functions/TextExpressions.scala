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

object TextExpressions {
  /** register once per session; idempotent */
  def register(s: SparkSession): Unit = {
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_ngrams", exprs => WordNgrams(exprs(0),
        exprs(1).eval(null).asInstanceOf[Int]), "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "unicode_normalize", exprs => UnicodeNormalize(exprs(0),
        exprs(1).eval(null).asInstanceOf[UTF8String].toString), "built-in")
  }

  /** word_ngrams(toks, n) as a Column (requires register first) */
  def wordNgrams(toks: Column, n: Int): Column =
    call_function("word_ngrams", toks, org.apache.spark.sql.functions.lit(n))

  /** unicode_normalize(text, form) as a Column (requires register first) */
  def unicodeNormalize(text: Column, form: String): Column =
    call_function("unicode_normalize", text,
      org.apache.spark.sql.functions.lit(form))
}
