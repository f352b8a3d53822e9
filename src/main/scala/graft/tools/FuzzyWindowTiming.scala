package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (not shipped surface): price the q_join_fuzzy2 tail-window
  * truncation dial — per window setting, the exploded variant rows per
  * side, the candidate-pair front the variant equi-join emits (the
  * verify's input), and the end-to-end wall of the full blocked join.
  * Result-set equality across windows is the ResolveSpec losslessness
  * pin; this instrument prices the trade the window makes: fewer
  * variants per key vs a less selective blocking key.
  *
  * Usage: runMain graft.tools.FuzzyWindowTiming [sfDir] [window ...]
  *        (defaults: /root/testdata/sf0.1, windows 0 7 5)
  */
object FuzzyWindowTiming {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val windows =
      if (args.length > 1) args.drop(1).toSeq.map(_.toInt) else Seq(0, 7, 5)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-fuzzy-window")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val a = spark.read.parquet(s"$dir/customer.parquet")
      .select(regexp_extract(col("c_name"), "[0-9]+$", 0).as("name_a")).distinct().cache()
    val b = spark.read.parquet(s"$dir/supplier.parquet")
      .select(regexp_extract(col("s_name"), "[0-9]+$", 0).as("name_b")).distinct().cache()
    a.count(); b.count()

    def nb(w: Int): org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      if (w > 0) graft.operators.Resolve.delNeighborhood2Window(_, w)
      else graft.operators.Resolve.delNeighborhood2

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    for (w <- windows; _ <- 1 to 2) {
      val av = a.select(col("name_a"), explode(nb(w)(col("name_a"))).as("v"))
      val bv = b.select(col("name_b"), explode(nb(w)(col("name_b"))).as("v"))
      val (va, _) = time(av.count())
      val (cand, tCand) = time(av.join(bv, "v").count())
      val (pairs, tPairs) = time(
        av.join(bv, "v").select("name_a", "name_b").distinct().count())
      val (matches, tFull) = time {
        av.join(bv, "v").select("name_a", "name_b").distinct()
          .select(col("name_a"), col("name_b"),
            levenshtein(col("name_a"), col("name_b")).as("dist"))
          .where(col("dist") <= 2).count()
      }
      println(f"""{"window":$w,"variant_rows_a":$va,"variant_hits":$cand,""" +
        f""""distinct_pairs":$pairs,"matches":$matches,""" +
        f""""sec_hits":$tCand%.2f,"sec_pairs":$tPairs%.2f,"sec_full":$tFull%.2f}""")
    }
    spark.stop()
  }
}
