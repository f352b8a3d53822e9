package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}
import org.scalatest.funsuite.AnyFunSuite

/** Frequent-items sketch contract (SURVEY.md §2 B.15 `q_agg_freq_sketch`):
  * the exact regime is oracle-pinned; here we pin what the oracle can't —
  * the SATURATED approximate regime's error-bound guarantee, and the
  * persist-then-merge rollup equivalence the sketch column exists for. */
class FreqSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("saturated sketch: bounds bracket the exact count for every reported item") {
    graft.functions.FreqSketch.register(spark)
    val ev = util.events(spark, TestSpark.sfDir)
    // 150 distinct users vs a 64-entry map: purges are guaranteed, so
    // est may drift but lb <= exact <= ub must hold (NO_FALSE_NEGATIVES)
    val sk = ev.agg(graft.functions.FreqSketch.freqAgg(
        col("user_id").cast(StringType), 64).as("sk"))
      .select(explode(graft.functions.FreqSketch.freqTopK(col("sk"), 1000)).as("r"))
      .select(col("r.item").cast(LongType).as("user_id"),
        col("r.est").as("est"), col("r.lb").as("lb"), col("r.ub").as("ub"))
      .collect()
    assert(sk.nonEmpty, "saturated sketch returned no items")
    val exact = ev.groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    sk.foreach { r =>
      val (u, est, lb, ub) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val ex = exact.getOrElse(u, 0L)
      assert(lb <= ex && ex <= ub, s"user $u: exact $ex outside [$lb, $ub]")
      assert(lb <= est && est <= ub, s"user $u: est $est outside its own bounds")
    }
  }

  test("daily sketches merged == one global sketch in the exact regime") {
    graft.functions.FreqSketch.register(spark)
    val ev = util.events(spark, TestSpark.sfDir)
    def decode(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(graft.functions.FreqSketch.freqTopK(col("sk"), 1000)).as("r"))
      .select(col("r.item"), col("r.est")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val merged = decode(ev
      .groupBy(to_date(col("ts")).as("day"))
      .agg(graft.functions.FreqSketch.freqAgg(col("user_id").cast(StringType)).as("sk"))
      .agg(graft.functions.FreqSketch.freqMerge(col("sk")).as("sk")))
    val global = decode(ev.agg(
      graft.functions.FreqSketch.freqAgg(col("user_id").cast(StringType)).as("sk")))
    assert(merged === global,
      "merge-of-daily and single-pass sketches disagree below the purge point")
  }

  test("mistyped SQL calls fail at analysis with the function and param named") {
    graft.functions.FreqSketch.register(spark)
    graft.functions.KllSketch.register(spark)
    graft.functions.ThetaSketch.register(spark)
    val ev = util.events(spark, TestSpark.sfDir)
    ev.createOrReplaceTempView("fnargs_ev")
    // string literal where an int parameter is expected → named error at
    // function-resolution time, not a ClassCastException in an executor
    val e1 = intercept[Exception] {
      spark.sql("SELECT freq_sketch_agg(cast(user_id AS string), '64') FROM fnargs_ev")
    }
    assert(e1.getMessage.contains("freq_sketch_agg"), e1.getMessage)
    // non-foldable parameter → named error
    val e2 = intercept[Exception] {
      spark.sql("SELECT kll_sketch_agg(value, cast(user_id AS int)) FROM fnargs_ev")
    }
    assert(e2.getMessage.contains("kll_sketch_agg"), e2.getMessage)
    // wrong input type for the merge side (double where a serialized
    // sketch state is required) → AnalysisException from ExpectsInputTypes
    val e3 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT kll_sketch_merge(value, 200) FROM fnargs_ev").collect()
    }
    assert(e3.getMessage.toLowerCase.contains("binary"), e3.getMessage)
    val e4 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT theta_sketch_merge(value) FROM fnargs_ev").collect()
    }
    assert(e4.getMessage.toLowerCase.contains("binary"), e4.getMessage)
    // numeric inputs implicitly widen for the value-side KLL aggregate:
    // an INT column is legal and aggregates as double
    val ok = spark.sql(
      "SELECT kll_quantiles(kll_sketch_agg(cast(user_id AS int), 200), array(0.5d)) FROM fnargs_ev")
      .collect()
    assert(ok.length === 1)
  }
}
