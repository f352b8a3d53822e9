package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan inspector for declared queries: prints the formatted physical
  * plan of each named key over the given SF dir (plans only — nothing
  * executes unless the operator itself runs jobs at build time, e.g.
  * the label-propagation loop). Usage:
  *   runMain graft.tools.ExplainQuery <sfDir> <key> [<key> ...]
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val keys = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (k <- keys; fn <- graft.SparkEntry.queries.get(k)) {
      println(s"==== $k ====")
      println(fn(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
