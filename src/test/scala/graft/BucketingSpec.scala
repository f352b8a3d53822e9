package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §2 B.15 bucketed co-located join: the at-rest layout must
  * actually eliminate the join shuffle (the whole point of paying the
  * one-time bucketed write), and must stay a PURE physical optimization —
  * identical rows to the same join over plain parquet. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("q_join_bucketed: sort-merge join with ZERO hash exchanges (both sides bucket-aligned)") {
    val df = operators.Bucketing.joinBucketed(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), s"expected sort-merge join:\n$p")
    // the bucketed scans satisfy the join's distribution AND the post-join
    // groupBy reuses it — the only allowed exchange is the final ORDER
    // BY's rangepartitioning
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$p")
  }

  test("bucketed result is identical to the plain-parquet join") {
    import org.apache.spark.sql.functions._
    import graft.util._
    val bucketed = operators.Bucketing.joinBucketed(spark, dir).collect().toSeq
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    val plain = o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_custkey"))
      .agg(min(col("c_mktsegment")).as("mkt"),
        count(lit(1)).as("n_orders"),
        r4(sum(d2(col("o_totalprice")))).as("total"))
      .orderBy("c_custkey")
      .collect().toSeq
    assert(bucketed === plain)
  }

  test("bucketed tables write a bounded file count (whole buckets per task)") {
    val (ot, _) = operators.Bucketing.bucketedTables(spark, dir)
    val loc = spark.sql(s"DESCRIBE FORMATTED $ot").collect()
      .find(_.getString(0).trim == "Location").get.getString(1)
    val files = new java.io.File(new java.net.URI(loc)).listFiles()
      .filter(f => f.getName.startsWith("part-"))
    assert(files.nonEmpty &&
      files.length <= operators.Bucketing.NumBuckets,
      s"expected ≤${operators.Bucketing.NumBuckets} bucket files, got ${files.length}")
  }
}
