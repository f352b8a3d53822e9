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
  * behind q_sim_cosine / q_dedup_embedding / q_sim_ann_lsh) and
  * `sign_lsh_bucket(array<float>, planes)` (the ANN bucketing hot loop).
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
  }
}
