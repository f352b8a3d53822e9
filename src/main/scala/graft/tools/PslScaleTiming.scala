package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev instrument (not shipped surface): price the registrable-domain
  * pass as a function of PUBLIC-SUFFIX CATALOG SIZE — the empirical half
  * of the PSL loader's scale claim (CorpusOpsSpec pins the plan half: a
  * 10k-entry catalog stays one Project whose membership tests optimize
  * to hashed InSet). Runs `urlExtractWith` over the sf dir's documents
  * under the default (7-rule) catalog and under a synthetic
  * full-PSL-sized one (10k plain suffixes across two levels + wildcard +
  * exception — the real list's shape), min of 3 noop-sink runs each.
  * If the InSet claim holds, the two times coincide up to noise: per-row
  * work is one hash probe per rule level regardless of catalog size.
  * Usage: PslScaleTiming [sfDir] [nSuffixes]
  */
object PslScaleTiming {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.drop(1).headOption.map(_.toInt).getOrElse(10000)
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
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => }

    val big = (1 to n - 60).map(i => s"s$i.tld") ++
      (1 to 58).map(i => s"t$i.s1.tld") ++ Seq("*.wild", "!keep.wild")
    def secs(cat: Seq[String]): Double = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.operators.CorpusOps.urlExtractWith(spark, sfDir, cat)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      runs.min
    }
    def r3(d: Double): Double = math.floor(d * 1000 + 0.5) / 1000
    val default = secs(graft.operators.CorpusOps.DefaultPslCatalog)
    val atScale = secs(big)
    println(s"""{"tool":"PslScaleTiming","sf":"$sfDir","n_suffixes":$n,""" +
      s""""default_catalog_sec":${r3(default)},"big_catalog_sec":${r3(atScale)},""" +
      s""""ratio":${r3(atScale / default)}}""")
    spark.stop()
  }
}
