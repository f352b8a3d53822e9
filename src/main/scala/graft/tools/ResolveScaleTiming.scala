package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (not shipped surface): measure the entity-resolution family's
  * scaling by replicating the sf0.1 customer table K× in-memory and
  * driving the SAME frame-parameterized operators the declared queries
  * use (Resolve.scoredPairsFrom / clusterLabelsFrom / joinFuzzyFrom).
  *
  * Replication is measure-preserving and collision-free across copies:
  * copy k offsets custkey by k·1,111,110 and reformats the name from the
  * new key ("Customer#%09d"), so cross-copy name pairs differ in ≥ 6
  * digit positions (no Levenshtein-1 edges between copies barring
  * carries) — each copy contributes an isomorphic within-copy ER
  * problem, the right null hypothesis for a scaling measurement (the
  * cross-copy-duplicate regime is a different dial: it grows edges
  * quadratically in K by construction, not by plan behavior).
  *
  * Printed per K: wall seconds for the scored-pair front and the full
  * cluster labeling, plus candidate-pair and match-edge counts, and the
  * within-nation cross-join pair count the blocking avoided.
  *
  * Usage: runMain graft.tools.ResolveScaleTiming [sfDir] [K ...]
  *        (defaults: /root/testdata/sf0.1, K = 1 10)
  */
object ResolveScaleTiming {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ks = if (args.length > 1) args.drop(1).toSeq.map(_.toInt) else Seq(1, 10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-resolve-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$dir/customer.parquet")
      .select("c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal")

    def replicated(k: Int): DataFrame =
      (0 until k).map { i =>
        base.withColumn("c_custkey", col("c_custkey") + lit(i * 1111110L))
          .withColumn("c_name", format_string("Customer#%09d", col("c_custkey")))
      }.reduce(_ union _).repartition(32).cache()

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    for (k <- ks) {
      val cust = replicated(k)
      val n = cust.count() // materialize the cache so walls time the operator
      // within-nation cross-join pairs the blocking avoided: sum over
      // nations of m*(m-1)/2
      val crossPairs = cust.groupBy("c_nationkey").count()
        .agg(sum(col("count") * (col("count") - 1) / 2)).collect()(0).getDouble(0)
      val (pairs, tPairs) = time {
        graft.operators.Resolve.scoredPairsFrom(cust).count()
      }
      val (edges, tEdges) = time {
        graft.operators.Resolve.scoredPairsFrom(cust)
          .where(col("score") >= graft.operators.Resolve.MatchThreshold).count()
      }
      val (nEntities, tClusters) = time {
        graft.operators.Resolve.clusterLabelsFrom(cust)
          .agg(countDistinct(col("entity_id"))).collect()(0).getLong(0)
      }
      println(f"""{"k":$k,"rows":$n,"cross_pairs_avoided":${crossPairs.toLong},""" +
        f""""candidate_pairs":$pairs,"match_edges":$edges,"entities":$nEntities,""" +
        f""""sec_pairs":$tPairs%.2f,"sec_edges":$tEdges%.2f,"sec_clusters":$tClusters%.2f}""")
      cust.unpersist()
    }
    spark.stop()
  }
}
