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
}
