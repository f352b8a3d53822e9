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

  test("util.events normalizes BOTH generator ts encodings to the same instants") {
    // the testdata generator has shipped events.ts as INT64 nanoseconds
    // (arriving LongType under nanosAsLong) AND as TIMESTAMP[µs]; the
    // adapter branches on the arrived type, so each branch gets its own
    // fixture here — a regeneration flipping the encoding again cannot
    // silently rot the untested branch
    import spark.implicits._
    val instantsUs = Seq(1704164645123456L, 1704164646000001L)
    val nanoDir = Files.createTempDirectory("graft_ev_nanos").toString
    instantsUs.zipWithIndex
      .map { case (us, i) => (i.toLong, us * 1000L, s"u$i") }
      .toDF("event_id", "ts", "user_id")
      .write.mode("overwrite").parquet(s"$nanoDir/events.parquet")
    val microDir = Files.createTempDirectory("graft_ev_micros").toString
    def tsOf(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp((us / 1000000L) * 1000L)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      t
    }
    instantsUs.zipWithIndex
      .map { case (us, i) => (i.toLong, tsOf(us), s"u$i") }
      .toDF("event_id", "ts", "user_id")
      .write.mode("overwrite").parquet(s"$microDir/events.parquet")

    def arrived(dir: String) = spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
    assert(arrived(nanoDir) === org.apache.spark.sql.types.LongType,
      "nanos fixture must arrive as BIGINT to exercise the Long branch")
    assert(arrived(microDir) === org.apache.spark.sql.types.TimestampType,
      "micros fixture must arrive as TIMESTAMP to exercise the timestamp branch")

    def norm(dir: String) = util.events(spark, dir)
      .select("event_id", "ts_us", "ts").orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime)).toSeq
    val fromNanos = norm(nanoDir)
    val fromMicros = norm(microDir)
    assert(fromNanos === fromMicros,
      "the two ts encodings must normalize to identical instants")
    assert(fromNanos.map(_._2) === instantsUs, "ts_us must be exact µs since epoch")
    // and ts itself is a real TIMESTAMP column in both branches
    assert(util.events(spark, nanoDir).schema("ts").dataType
      === org.apache.spark.sql.types.TimestampType)
  }

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

  test("adversarial text survives the q_scan_text_formats CSV/JSON options verbatim") {
    import spark.implicits._
    // the corpus may never exercise the hard cases, so the round-trip
    // options are pinned directly on the content classes that break
    // naive CSV: embedded newlines (needs multiLine), embedded quotes
    // (needs quote-doubling), the delimiter itself, backslashes (must
    // NOT act as escapes under escape='"'), CJK + emoji (UTF-8 width),
    // leading/trailing spaces, and the empty string
    val nasty = Seq(
      (1L, "line one\nline two\r\nline three"),
      (2L, "she said \"hi\", twice \"\""),
      (3L, "comma, separated, values"),
      (4L, "back\\slash \\n not an escape"),
      (5L, "汉字 zeichen éè 🙂 end"),
      (6L, "  padded  "),
      (7L, ""))
      .toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft_nasty").toString
    nasty.write.mode("overwrite")
      .option("quote", "\"").option("escape", "\"")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .option("nullValue", "\\N")
      .csv(s"$dir/csv")
    nasty.write.mode("overwrite").json(s"$dir/jsonl")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val expect = nasty.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val csvBack = spark.read.schema(schema)
      .option("quote", "\"").option("escape", "\"").option("multiLine", "true")
      .option("nullValue", "\\N").option("emptyValue", "")
      .option("mode", "FAILFAST")
      .csv(s"$dir/csv")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(csvBack === expect, "CSV mangled adversarial text")
    val jsonBack = spark.read.schema(schema).option("mode", "FAILFAST")
      .json(s"$dir/jsonl")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(jsonBack === expect, "JSONL mangled adversarial text")
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
