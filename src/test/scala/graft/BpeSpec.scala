package graft

import graft.operators.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite

/** bpeTrain: hand-computed merge sequences on fixture corpora (the
  * oracle-free component's pinned spec), plus round-1 ≡ the declared
  * q_bpe_pairs argmax on real data. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.toDF("text")
  }

  test("hand-computed merge sequence: argmax, tie-break, and phrase remerge") {
    // corpus: "a b c a b" + "a b x"
    //   round 1 pairs: (a,b):3  (b,c):1 (c,a):1 (b,x):1 → merge (a,b) cnt 3
    //   after greedy apply: ["a b","c","a b"], ["a b","x"]
    //   round 2 pairs: ("a b",c):1 (c,"a b"):1 ("a b",x):1 — three-way tie
    //     → (cnt DESC, t1 ASC, t2 ASC) picks ("a b","c")
    val m = TextAnalysis.bpeTrain(docs("a b c a b", "a b x"), 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq === Seq((1, "a", "b", 3L), (2, "a b", "c", 1L)))
  }

  test("greedy non-overlap: 'a a a a' yields two merged pairs, then one") {
    // round 1: (a,a):3 → greedy apply merges positions (0,1) and (2,3)
    //   → ["a a","a a"]; round 2: ("a a","a a"):1
    val m = TextAnalysis.bpeTrain(docs("a a a a"), 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq === Seq((1, "a", "a", 3L), (2, "a a", "a a", 1L)))
  }

  test("runs dry: fewer pairs than requested merges terminates early") {
    // single-token docs have no adjacent pairs at all
    val m = TextAnalysis.bpeTrain(docs("solo", "tokens"), 5)
    assert(m.collect().isEmpty)
    // one pair exhausts after merging: 5 merges requested, 1 possible
    val m2 = TextAnalysis.bpeTrain(docs("x y"), 5)
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(m2.toSeq === Seq(("x", "y")))
  }

  test("round-1 merge equals the declared q_bpe_pairs argmax on real data") {
    val dir = "/root/testdata/sf0.001"
    val top = TextAnalysis.bpePairs(spark, dir).collect().head
    val m = TextAnalysis.bpeTrain(spark, dir, 1).collect().head
    assert((m.getString(1), m.getString(2), m.getLong(3))
      === (top.getString(0), top.getString(1), top.getLong(2)))
  }
}
