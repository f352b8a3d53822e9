package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted sketch table (SURVEY.md §2 B.15 `q_sketch_rollup`): the
  * freq/theta rollup columns are oracle-pinned; here we pin the HLL
  * column (never exact, so outside the oracle) and the layout's reuse
  * contract. */
class SketchTableSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("persisted daily HLL states roll up to near-exact window distincts") {
    val path = Files.createTempDirectory("graft_sktest").toString
    operators.SketchTable.writeSketchDailies(spark, TestSpark.sfDir, path)
    val est = spark.read.parquet(path)
      .where(col("day").between(lit("2024-01-08"), lit("2024-01-21")))
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("hll_users"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = util.events(spark, TestSpark.sfDir)
      .where(to_date(col("ts")).between(lit("2024-01-08"), lit("2024-01-21")))
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet === exact.keySet)
    est.foreach { case (t, e) =>
      val x = exact(t)
      // lgConfigK = 12 ⇒ ~1.6% typical error; 5% is a safe ceiling
      assert(math.abs(e - x) <= math.max(1L, (x * 0.05).toLong),
        s"$t: HLL rollup $e too far from exact $x")
    }
  }

  test("q_agg_kll_quantile: each estimate sits inside the exact values at rank ± 2ε") {
    val est = operators.SketchTable.kllQuantileRollup(spark, TestSpark.sfDir)
      .collect().map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(est.nonEmpty)
    val eps = 0.0165 * 2 // 2x the published one-sided rank error at k=200
    val w = util.events(spark, TestSpark.sfDir)
      .where(to_date(col("ts")).between(lit("2024-01-08"), lit("2024-01-21")))
    operators.SketchTable.KllRanks.zipWithIndex.foreach { case (p, i) =>
      val bounds = w.groupBy("event_type")
        .agg(expr(s"percentile(value, ${math.max(0.0, p - eps)})").as("lo"),
          expr(s"percentile(value, ${math.min(1.0, p + eps)})").as("hi"))
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      est.foreach { case (t, qs) =>
        val (lo, hi) = bounds(t)
        assert(qs(i) >= lo && qs(i) <= hi,
          s"$t p$p estimate ${qs(i)} outside exact-rank window [$lo, $hi]")
      }
    }
  }

  test("the sketch table is the only thing q_sketch_rollup reads") {
    // no events.parquet scan in the plan: the daily build happens at
    // layout-materialization time, the declared query touches states only
    val plan = operators.SketchTable.sketchRollup(spark, TestSpark.sfDir)
      .queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
    assert(plan.length === 1, s"expected exactly one scan, got ${plan.length}")
    val loc = plan.head.metadata("Location")
    assert(loc.contains("graft_sketches"), s"scan reads $loc, not the sketch table")
  }
}
