package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.scalatest.funsuite.AnyFunSuite

/** Theta-sketch contract (SURVEY.md §2 B.15 `q_agg_theta_ops`): the
  * exact regime is oracle-pinned; here we pin the SAMPLED regime the
  * oracle can't reach — estimation error and set-algebra consistency
  * past the 4096-entry exact-mode bound. */
class ThetaSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("sampled regime: estimate within 5% and set algebra stays consistent") {
    graft.functions.ThetaSketch.register(spark)
    import graft.functions.ThetaSketch._
    // 50k distinct forces sampling (theta < 1); A = [0, 50k), B = [30k, 80k)
    val a = spark.range(0, 50000).select(col("id").cast(StringType).as("v"))
      .agg(thetaAgg(col("v")).as("sk"))
    val b = spark.range(30000, 80000).select(col("id").cast(StringType).as("v"))
      .agg(thetaAgg(col("v")).as("sk"))
    val r = a.crossJoin(b.withColumnRenamed("sk", "sk2"))
      .select(
        thetaEstimate(col("sk")).as("na"),
        thetaEstimate(thetaIntersect(col("sk"), col("sk2"))).as("inter"),
        thetaEstimate(thetaANotB(col("sk"), col("sk2"))).as("diff"),
        thetaEstimate(thetaUnion(col("sk"), col("sk2"))).as("uni"))
      .head()
    val (na, inter, diff, uni) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    def close(est: Long, truth: Long, tol: Double): Boolean =
      math.abs(est - truth) <= truth * tol
    assert(close(na, 50000, 0.05), s"|A| est $na off from 50000")
    assert(close(inter, 20000, 0.10), s"|A∩B| est $inter off from 20000")
    assert(close(diff, 30000, 0.10), s"|A\\B| est $diff off from 30000")
    assert(close(uni, 80000, 0.05), s"|A∪B| est $uni off from 80000")
    // the partition identity |A| = |A∩B| + |A\B| must hold approximately
    // even when every term is estimated
    assert(close(inter + diff, na, 0.10), s"partition identity broke: $inter + $diff vs $na")
  }
}
