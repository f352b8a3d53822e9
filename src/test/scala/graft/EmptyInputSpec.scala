package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** "Complete library" robustness property: every declared operator must
  * run (not crash) on structurally-valid but EMPTY inputs — the day-one
  * state of any new deployment, and the per-partition state of straggler
  * executors at scale. Catches head-of-empty assumptions, divide-by-zero
  * on count(*) = 0, and min/max-of-nothing surprises in one sweep. */
class EmptyInputSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** all ten tables with their real schemas and zero rows */
  private lazy val emptyDir: String = {
    val dir = Files.createTempDirectory("graft_empty").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      spark.read.parquet(s"${TestSpark.sfDir}/$t.parquet")
        .limit(0).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every declared query runs on empty tables without throwing") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, emptyDir).collect(); None }
      catch { case e: Throwable =>
        Some(s"$name: ${Option(e.getMessage).getOrElse(e.getClass.getName).linesIterator.next()}")
      }
    }
    assert(failures.isEmpty, s"queries crashing on empty input:\n${failures.mkString("\n")}")
  }

  test("round-17 API surface runs on empty input: convergence loop, dual-stack LPM, PSL paths, mix tables") {
    import spark.implicits._
    // convergence on zero docs: zero passes, zero residual, empty result
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val (cleaned, passes, residual) =
      operators.Dedup.dedupSubstringToConvergence(noDocs, maxPasses = 3)
    assert(passes === 0 && residual === 0L && cleaned.count() === 0L)
    // dual-stack batch LPM on an empty frame
    assert(functions.Scalars.deviceZonesOf(spark,
      Seq.empty[(Int, String)].toDF("id", "ip")).count() === 0L)
    // PSL-parameterized URL queries over the empty corpus
    assert(operators.CorpusOps.urlExtractWith(spark, emptyDir,
      operators.CorpusOps.DefaultPslCatalog).count() === 0L)
    assert(operators.CorpusOps.samplePerDomainWith(spark, emptyDir,
      operators.CorpusOps.DefaultPslCatalog).count() === 0L)
    // mix-from-table over the empty corpus and over an empty table
    val t1 = Seq(("src0", 1L)).toDF("source", "w")
    assert(operators.TextAnalysis.mixPlanFrom(spark, emptyDir, t1).count() === 0L)
    assert(operators.TextAnalysis.mixPlanApplyFrom(spark, emptyDir, t1).count() === 0L)
    val t0 = Seq.empty[(String, Long)].toDF("source", "w")
    assert(operators.TextAnalysis.mixPlanFrom(spark, TestSpark.sfDir, t0).count() === 0L)
    // kafka adapter on an empty kafka-shaped frame
    val k0 = Seq.empty[(Array[Byte], Array[Byte], String, Int, Long, java.sql.Timestamp, Int)]
      .toDF("key", "value", "topic", "partition", "offset", "timestamp", "timestampType")
    assert(streaming.Pipeline.parseToRfcLog(
      streaming.Pipeline.fromKafkaRecords(k0)).count() === 0L)
  }
}
