package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool (not shipped surface): adjudicate q_dedup_substring_pairs's
  * 13.5x/decade step at sf10 (BENCH_SF10.json) by MEASUREMENT instead of
  * variance argument. PERF.md's claim: the step is single-JVM sort/GC
  * pressure from partition-local sorts over 150M gram rows — a
  * local[32] artifact, not a plan term (the plan is one hash shuffle +
  * partition-local sort, partitioned by h at cluster scale). If that's
  * true, growing `spark.sql.shuffle.partitions` (smaller per-partition
  * sorts, the knob a real cluster turns by default) must pull the
  * per-decade step back toward the substring family's 4.6-5.6x; if a
  * hidden cross-partition term exists, more partitions won't save it.
  *
  * Protocol: Bench's session config; per partition setting, run the
  * declared query at the 10x dir AND the 100x dir, min-of-2 interleaved,
  * substring-spans cache cleared before every measured run.
  *
  * Usage: runMain graft.tools.SubstrPairsSweep [sf1Dir] [sf10Dir] [P ...]
  *        (defaults: /root/repo/testdata_sf1 /root/repo/testdata_sf10
  *         32 64 256 1024)
  */
object SubstrPairsSweep {
  def main(args: Array[String]): Unit = {
    val sf1 = if (args.length > 0) args(0) else "/root/repo/testdata_sf1"
    val sf10 = if (args.length > 1) args(1) else "/root/repo/testdata_sf10"
    val parts =
      if (args.length > 2) args.drop(2).toSeq.map(_.toInt)
      else Seq(32, 64, 256, 1024)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-substr-pairs-sweep")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(dir: String): Double = {
      graft.operators.Dedup.clearSubstringSpansCache()
      val t0 = System.nanoTime()
      graft.operators.Dedup.dedupSubstringPairs(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm the codegen/reader paths once at the small dir
    run(sf1)
    for (p <- parts) {
      spark.conf.set("spark.sql.shuffle.partitions", p.toString)
      var (b1, b10) = (Double.MaxValue, Double.MaxValue)
      for (_ <- 1 to 2) {
        b1 = math.min(b1, run(sf1))
        b10 = math.min(b10, run(sf10))
      }
      println(f"""{"partitions":$p,"sec_sf1":$b1%.2f,"sec_sf10":$b10%.2f,""" +
        f""""step_per_decade":${b10 / b1}%.2f}""")
    }
    spark.stop()
  }
}
