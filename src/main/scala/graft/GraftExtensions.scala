package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: makes graft's custom expressions
  * available to ANY session — including pure-SQL clients over
  * Thrift/Connect — without calling the Scala registration helper:
  *
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *     ...
  *
  * Injects `cosine_sim(array<float>, array<float>)` (the codegen hot loop
  * behind q_sim_cosine / q_dedup_embedding / q_sim_ann_lsh),
  * `sign_lsh_bucket(array<float>, planes)` (the ANN bucketing hot loop),
  * `ivf_assign(array<float>, array<struct<cid,ce>>)` (IVF list
  * assignment), and `word_ngrams(array<string>, n)` (the shingle front of
  * the dedup family).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[functions.CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => functions.CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("sign_lsh_bucket"),
      new ExpressionInfo(classOf[functions.SignLshBucket].getName, "sign_lsh_bucket"),
      (exprs: Seq[Expression]) => functions.SignLshBucket(exprs(0),
        exprs(1).eval(null).asInstanceOf[Int])))
    ext.injectFunction((
      new FunctionIdentifier("ivf_assign"),
      new ExpressionInfo(classOf[functions.IvfAssign].getName, "ivf_assign"),
      (exprs: Seq[Expression]) => functions.IvfAssign(exprs(0), exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[functions.WordNgrams].getName, "word_ngrams"),
      (exprs: Seq[Expression]) => functions.WordNgrams(exprs(0),
        exprs(1).eval(null).asInstanceOf[Int])))
    ext.injectFunction((
      new FunctionIdentifier("unicode_normalize"),
      new ExpressionInfo(classOf[functions.UnicodeNormalize].getName,
        "unicode_normalize"),
      (exprs: Seq[Expression]) => functions.UnicodeNormalize(exprs(0),
        exprs(1).eval(null)
          .asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)))
  }
}
