package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed fixtures for the text-quality operators (the DuckDB
  * oracle pins cross-engine parity; these pin the absolute values). */
class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q_repetition_ratio: duplicate-bigram fraction and top-bigram share, hand-checked") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_rep").toString
    val docs = Seq(
      // "a b a b a" → bigrams [a b, b a, a b, b a]: 4 total, 2 distinct
      (1L, "a b a b a"),
      // all-distinct bigrams → dup_ratio 0
      (2L, "u v w"),
      // degenerate "batch batch batch batch" → one bigram repeated 3×
      (3L, "batch batch batch batch"),
      // single word: no bigram, excluded from output
      (4L, "solo"))
      .map { case (id, tx) => (id, tx, "en", "src", tx.length.toLong) }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = operators.TextAnalysis.repetitionRatio(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got === Map(
      1L -> ((4L, 2L, 0.5, 0.5)),
      2L -> ((2L, 2L, 0.0, 0.5)),
      3L -> ((3L, 1L, 0.6667, 1.0))))
  }
}
