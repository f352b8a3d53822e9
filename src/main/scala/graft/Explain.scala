package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of declared queries without
  * executing them — the `.explain("formatted")` loop the build methodology
  * calls for, reachable as `sbt "runMain graft.Explain <sfDir> <keySubstring>"`.
  * Not part of the library surface. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val filter = if (args.length > 1) Some(args(1)) else None
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries
      .filter { case (name, _) => filter.forall(name.contains) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        println(s"\n===== $name =====")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"[explain] failed: ${e.getMessage}") }
      }
    spark.stop()
  }
}
