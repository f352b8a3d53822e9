package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (not shipped surface): correctness of q_join_fuzzy_tokens AT
  * SCALE, where the DuckDB twin (an unblocked cross join with per-pair
  * list lambdas) stops being runnable — at the 10x dir the cross is
  * 150k × 10k = 1.5G scored pairs, ~100x the largest cross DuckDB has
  * ground for this repo's oracles. The check is the ResolveSpec pin
  * executed distributed: the UNBLOCKED cross join with the exact declared
  * scoring formula, compared to the declared blocked query via exceptAll
  * in both directions. Prints the verdict as one JSON line.
  *
  * Usage: runMain graft.tools.FuzzyTokensScaleCheck [sfDir]
  *        (default: /root/repo/testdata_sf1)
  */
object FuzzyTokensScaleCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata_sf1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-fuzzy-tokens-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nat = spark.read.parquet(s"$dir/nation.parquet")
      .select(col("n_nationkey"), lower(col("n_name")).as("nt"))
    val a = spark.read.parquet(s"$dir/customer.parquet")
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .select(concat_ws(" ", col("nt"), lit("customer"),
        regexp_extract(col("c_name"), "[0-9]+$", 0)).as("name_a")).distinct()
    val b = spark.read.parquet(s"$dir/supplier.parquet")
      .join(nat, col("s_nationkey") === col("n_nationkey"))
      .select(concat_ws(" ", col("nt"), lit("supplier"),
        regexp_extract(col("s_name"), "[0-9]+$", 0)).as("name_b")).distinct()
    val at = a.select(col("name_a"),
      array_distinct(split(col("name_a"), " ")).as("toks_a"))
    val bt = b.select(col("name_b"),
      array_distinct(split(col("name_b"), " ")).as("toks_b"))
    // the oracle formula, unblocked — repartition the cross's left side
    // so the 1.5G-pair evaluation spreads over every core
    val brute = at.repartition(spark.sparkContext.defaultParallelism * 4)
      .crossJoin(broadcast(bt))
      .select(col("name_a"), col("name_b"),
        graft.util.r4f((size(filter(col("toks_a"), ta =>
            exists(col("toks_b"), tb => levenshtein(ta, tb) <= 1)))
          + size(filter(col("toks_b"), tb =>
            exists(col("toks_a"), ta => levenshtein(ta, tb) <= 1))))
          .cast("double")
          / (size(col("toks_a")) + size(col("toks_b")))).as("score"))
      .where(col("score") >= 0.6)
    val blocked = graft.operators.Resolve.joinFuzzyTokens(spark, dir)
    val t0 = System.nanoTime()
    val nBlocked = blocked.count()
    val missed = brute.exceptAll(blocked).count()
    val extra = blocked.exceptAll(brute).count()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"""{"dir":"$dir","blocked_rows":$nBlocked,""" +
      f""""brute_minus_blocked":$missed,"blocked_minus_brute":$extra,""" +
      f""""sec":$dt%.1f,"pass":${missed == 0 && extra == 0}}""")
    spark.stop()
  }
}
