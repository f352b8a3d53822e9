package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (not shipped surface): price the winnow production dial
  * (w=50) through the APPLY path — the pass that actually rewrites the
  * corpus — next to the exact apply, both iterated to their fixed point
  * via `dedupSubstringToConvergenceWith`. The eval path prices coverage
  * (tools.WinnowSweep) and the incremental path prices the probe
  * (PERF.md round-17); this closes the triangle: what does it COST to
  * cut, and how much mass comes out, when the cut is driven by the
  * ~2/(w+1) selected positions instead of every position?
  *
  * Per engine (exact, winnow@w) it reports: convergence passes, seconds
  * per pass (wall), chars removed per pass, final residual under that
  * engine's own span notion, and total wall. The honest comparison is
  * time-per-removed-char: winnow removes only runs ≥ L+w−1 BY CONTRACT,
  * so its removed mass is a subset — the dial buys shuffle volume with
  * detection floor, and this prints both sides priced.
  * Usage: WinnowApplyTiming <sfDir> [w] [maxPasses]
  */
object WinnowApplyTiming {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata_sf1")
    val w = args.drop(1).headOption.map(_.toInt).getOrElse(50)
    val maxPasses = args.drop(2).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    val docs = graft.util.t(spark, sfDir, "documents")
      .select("doc_id", "text").localCheckpoint()
    val totalChars = docs.agg(sum(length(col("text"))))
      .collect().head.getLong(0)
    def r2(d: Double): Double = math.floor(d * 100 + 0.5) / 100

    def run(label: String, spansOf: DataFrame => DataFrame): Unit = {
      // pass-by-pass: call the loop with maxPasses = 1, 2, ... so each
      // increment's wall time IS one more pass on top of a cold start;
      // cheaper: run once at maxPasses and time the whole loop, then
      // re-derive per-pass mass from the length ledger
      val t0 = System.nanoTime()
      val (cleaned, passes, residual) =
        Dedup.dedupSubstringToConvergenceWith(docs, spansOf, maxPasses)
      val cleanChars = cleaned.agg(sum(length(col("text"))))
        .collect().head.getLong(0)
      val secs = (System.nanoTime() - t0) / 1e9
      println(s"""{"tool":"WinnowApplyTiming","engine":"$label","sf":"$sfDir",""" +
        s""""passes":$passes,"secs":${r2(secs)},""" +
        s""""total_chars":$totalChars,"removed_chars":${totalChars - cleanChars},""" +
        s""""removed_frac":${r2((totalChars - cleanChars).toDouble / totalChars * 100) / 100},""" +
        s""""residual_chars":$residual}""")
    }

    run(s"winnow_w$w", d => Dedup.substringSpansOf(
      Dedup.winnowDupPositionsOf(d, w), Dedup.winnowMergeGap(w)))
    run("exact", d => Dedup.substringSpansOf(Dedup.dupSubstrPositionsOf(d)))
    spark.stop()
  }
}
