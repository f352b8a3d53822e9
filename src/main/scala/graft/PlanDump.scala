package graft

import org.apache.spark.sql.SparkSession

/** dev tool: print the executed plan of every declared query for smell
  * review (cartesians, missed pushdown, unexpected shuffles) */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        println(s"===== $name =====")
        println(df.queryExecution.executedPlan.toString.linesIterator
          .map(_.take(200)).mkString("\n"))
      } catch {
        case e: Throwable => println(s"===== $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
