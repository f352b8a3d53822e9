package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The composed curation surface: the funnel's stage accounting against
  * independently-computed stage frames, and the serving core's verdicts
  * (corpus near-dups dropped, high-quality fresh docs admitted). The
  * row-level exactness of `q_curate_e2e`/`q_curate_funnel` is pinned by
  * the DuckDB oracle; these specs pin the cross-stage INVARIANTS the
  * hash can't express. */
class CurateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("q_curate_funnel: stage accounting matches the chain's own frames") {
    val f = operators.Curate.curateFunnel(spark, dir).collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(f.keySet === Set("raw", "dedup_survivors", "pii_scrubbed",
      "quality_kept", "packed_bins"))

    val nRaw = spark.read.parquet(s"$dir/documents.parquet").count()
    val nSurv = operators.Dedup.dedupApply(spark, dir).count()
    assert(f("raw")._1 === nRaw)
    assert(f("dedup_survivors")._1 === nSurv)
    // scrubbing renames tokens, never changes the doc count
    assert(f("pii_scrubbed")._1 === nSurv)
    // units fall monotonically through the doc stages
    assert(f("raw")._1 >= f("dedup_survivors")._1)
    assert(f("pii_scrubbed")._1 >= f("quality_kept")._1)
    assert(f("quality_kept")._1 > 0L, "p25 cut keeps 75% of a real corpus")

    // stage 3 ≡ the declared pipeline's own doc/token totals, and packing
    // conserves tokens exactly (bins re-bucket, they don't drop)
    val packed = operators.Curate.curateE2e(spark, dir)
      .agg(count(lit(1)), sum("n_docs"), sum("n_tokens")).collect()(0)
    assert(f("packed_bins")._1 === packed.getLong(0))
    assert(f("quality_kept")._1 === packed.getLong(1))
    assert(f("quality_kept")._2 === packed.getLong(2))
    assert(f("packed_bins")._2 === f("quality_kept")._2)
  }

  test("curateBatch: corpus near-dups are refused, high-quality fresh docs admitted") {
    import spark.implicits._
    val indexPath = operators.Dedup.ensureGramIndex(spark, dir)
    // copies of INDEXED corpus docs (doc_id % 10 =!= 7) under new ids →
    // jaccard 1.0 vs their originals → the gate must refuse them
    val copies = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("doc_id") % 10 =!= 7)
      .limit(5)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"),
        col("lang"), col("source"))
    // fresh docs: 60 distinct 8-char tokens → quality ≈ 1.0, above any
    // p25 cut; sources drawn from the corpus so the rates join hits
    val fresh = (0 until 10).map { i =>
      val text = (0 until 60).map(j => f"zq${i}%02dw${j}%02dab").mkString(" ")
      (200000L + i, text, "en", s"src$i")
    }.toDF("doc_id", "text", "lang", "source")
    val arriving = copies.unionAll(fresh)

    val out = operators.Curate.curateBatch(spark, arriving, dir, indexPath)
      .collect().map(_.getLong(0)).toSet
    assert(out.forall(_ >= 200000L), s"a corpus copy slipped through: $out")
    assert(out.size === 10, "every high-quality fresh doc should be admitted " +
      s"(sf0.001 temperature rates saturate at keep-all); got $out")
  }
}
