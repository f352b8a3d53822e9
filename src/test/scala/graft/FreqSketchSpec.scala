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
}
