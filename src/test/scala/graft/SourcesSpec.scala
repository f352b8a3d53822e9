package graft

import java.nio.file.Files

import graft.streaming.Pipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** source/sink breadth beyond parquet: CSV and JSON round trips of the log
  * schema with explicit schemas + FAILFAST (no silent corruption), zstd
  * parquet compression, and observe() metrics on the parse pipeline. */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val logs = Pipeline.parseToLog(model.rawLines(spark))
    .withColumn("categories", col("categories").cast("string")) // csv has no arrays

  test("CSV round trip with explicit schema and FAILFAST") {
    val dir = Files.createTempDirectory("graft_csv").toString
    logs.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read
      .schema(logs.schema)
      .option("header", "true")
      .option("mode", "FAILFAST")
      .csv(dir)
    assert(back.count() === logs.count())
    // CSV reads force nullable=true; names and types must survive
    assert(back.schema.map(f => (f.name, f.dataType))
      === logs.schema.map(f => (f.name, f.dataType)))
  }

  test("JSON lines round trip preserves arrays and severity bytes") {
    val dir = Files.createTempDirectory("graft_json").toString
    val full = Pipeline.parseToLog(model.rawLines(spark))
    full.write.mode("overwrite").json(dir)
    val back = spark.read.schema(full.schema).option("mode", "FAILFAST").json(dir)
    assert(back.count() === full.count())
    val cats = back.where(col("message") === "msg body")
      .select("categories").collect().head.getSeq[String](0)
    assert(cats === Seq("a", "b", "c", "unknownsev"))
  }

  test("parquet writes with zstd compression and reads back") {
    val dir = Files.createTempDirectory("graft_zstd").toString
    val full = Pipeline.parseToLog(model.rawLines(spark))
    full.write.mode("overwrite").option("compression", "zstd").parquet(dir)
    assert(new java.io.File(dir).listFiles().exists(_.getName.contains(".zstd.parquet")))
    assert(spark.read.parquet(dir).count() === full.count())
  }

  test("observe() surfaces pipeline quality metrics without a second pass") {
    import org.apache.spark.sql.Observation
    val obs = Observation("parse_metrics")
    val full = Pipeline.parseToLog(model.rawLines(spark))
      .observe(obs, count(lit(1)).as("rows"),
        sum(when(expr("array_contains(categories, 'unknown')"), 1L).otherwise(0L)).as("fallback_rows"))
    full.write.mode("overwrite").parquet(Files.createTempDirectory("graft_obs").toString)
    val m = obs.get
    assert(m("rows") === model.syslogFixture.size.toLong)
    assert(m("fallback_rows") === 4L) // f14, f15, f16, f17
  }
}
