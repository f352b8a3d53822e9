package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pipeline-health profiling (SURVEY.md §2 B.15): the skew diagnostic
  * must surface the corpus's planted hot key, and the expectations
  * report must DETECT violations — the corpus itself is clean, so the
  * oracle row only pins the all-pass shape; the dirty fixture here
  * proves each check fires. */
class ProfilingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q_skew_stats surfaces the planted hot key with a dominant skew factor") {
    val rows = operators.Profiling.skewStats(spark, TestSpark.sfDir).collect()
    assert(rows.length <= operators.Profiling.SkewTopK)
    val top = rows.head
    assert(top.getLong(0) === 7L, s"hot key should lead, got ${top.getLong(0)}")
    // key 7 absorbs every l_partkey % 3 == 0 row (~1/3 of the table) plus
    // its own modulo class — an order of magnitude over the 25-key mean
    assert(top.getDouble(3) > 5.0, s"hot-key skew factor ${top.getDouble(3)} too flat")
    // shares are a probability mass: non-increasing by construction here,
    // and their sum over the top-K cannot exceed 1
    val shares = rows.map(_.getDouble(2))
    assert(shares.sum <= 1.0001, s"shares sum ${shares.sum} > 1")
    assert(shares.zip(shares.tail).forall { case (a, b) => a >= b }, "shares not ranked")
  }

  test("expectationsReport fires each declared check on a dirty fixture") {
    import spark.implicits._
    val dirty = Seq(
      (Option(1L), "good text", "en", 9L),  // clean row
      (Option.empty[Long], "x", "en", 1L),  // null doc_id
      (Option(2L), "", "en", 0L),           // empty text
      (Option(2L), "dup id", "xx", 6L),     // duplicate id + out-of-domain lang
      (Option(3L), "drift", "fr", 99L))     // n_chars disagrees with text
      .toDF("doc_id", "text", "lang", "n_chars")
    val m = operators.Profiling.expectationsReport(dirty).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    // uniqueness counts the null id too: count(*) - countDistinct ignores
    // nulls on both engines, so a null key can never pass as unique
    assert(m === Map(
      "doc_id_not_null" -> ((1L, false)),
      "doc_id_unique" -> ((2L, false)),
      "lang_in_domain" -> ((1L, false)),
      "n_chars_consistent" -> ((1L, false)),
      "text_not_empty" -> ((1L, false))), s"report was $m")
  }

  test("expectations passes everywhere on the shipped corpus") {
    val rows = operators.Profiling.expectations(spark, TestSpark.sfDir).collect()
    assert(rows.length === 5)
    assert(rows.forall(_.getBoolean(3)), "shipped corpus should satisfy all checks")
  }
}
