package graft.tools

import org.apache.spark.sql.SparkSession

/** dev micro-measurement: per-call cost of parquet schema inference vs
  * an explicit schema (the util.t memo decision). Prints ms/call. */
object SchemaCost {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val path = s"$dir/customer.parquet"
    val schema = spark.read.parquet(path).schema
    // warm both paths
    for (_ <- 1 to 5) { spark.read.parquet(path).schema; spark.read.schema(schema).parquet(path).queryExecution.analyzed }
    val n = 200
    val t0 = System.nanoTime()
    for (_ <- 1 to n) spark.read.parquet(path).queryExecution.analyzed
    val inferMs = (System.nanoTime() - t0) / 1e6 / n
    val t1 = System.nanoTime()
    for (_ <- 1 to n) spark.read.schema(schema).parquet(path).queryExecution.analyzed
    val givenMs = (System.nanoTime() - t1) / 1e6 / n
    println(f"SCHEMA_COST infer=${inferMs}%.2f ms/call given=${givenMs}%.2f ms/call delta=${inferMs - givenMs}%.2f")
    spark.stop()
  }
}
