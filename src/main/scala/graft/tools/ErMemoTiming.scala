package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool (not shipped surface): measure the r20 ER labels memoization
  * as an IN-SESSION win — the thing Bench deliberately cannot show
  * (it clears every memo before each measured run so committed numbers
  * stay honest). A real session that asks for clusters, then golden,
  * then attribute survivorship, then the incremental upsert used to pay
  * the scored-pair front + multi-round min-label propagation once PER
  * QUERY; with `Resolve.clusterLabelsCached` the "full" population pays
  * it once and the "idx8" split once.
  *
  * Protocol: the four cluster-consuming declared keys run as a sequence
  * against the same dir; `uncached_sec` clears the labels cache before
  * EVERY query (the pre-r20 behavior), `cached_sec` clears once up
  * front (a cold session) and lets the sequence share. Min-of-2 per
  * mode, modes interleaved.
  *
  * Usage: runMain graft.tools.ErMemoTiming [sfDir]
  */
object ErMemoTiming {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-er-memo")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val keys = Seq("q_entity_resolve_clusters", "q_entity_golden",
      "q_entity_golden_attrs", "q_entity_golden_incremental")

    def sequence(clearPerQuery: Boolean): Double = {
      graft.operators.Resolve.clearLabelsCache()
      val t0 = System.nanoTime()
      for (k <- keys) {
        if (clearPerQuery) graft.operators.Resolve.clearLabelsCache()
        graft.SparkEntry.queries(k)(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      (System.nanoTime() - t0) / 1e9
    }
    sequence(clearPerQuery = true) // warm codegen/readers once
    var (cold, warm) = (Double.MaxValue, Double.MaxValue)
    for (_ <- 1 to 2) {
      cold = math.min(cold, sequence(clearPerQuery = true))
      warm = math.min(warm, sequence(clearPerQuery = false))
    }
    println(f"""{"keys":${keys.size},"uncached_sec":$cold%.2f,""" +
      f""""cached_sec":$warm%.2f,"saved_sec":${cold - warm}%.2f}""")
    spark.stop()
  }
}
