package graft

import java.nio.file.Files

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted IVF index (SURVEY.md §2 B.14): the cid-partitioned layout
  * must (a) exist on disk as one directory per list, (b) prune to the
  * probed lists in the scan plan, and (c) return exactly the rows the
  * on-the-fly `q_sim_ann_ivf` operator computes. */
class IvfIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("persisted IVF index: cid-partitioned layout, pruned scan, parity with q_sim_ann_ivf") {
    val dir = TestSpark.sfDir
    val idx = Files.createTempDirectory("graft_ivf_idx").toString
    Similarity.writeIvfIndex(spark, dir, idx)

    val listDirs = new java.io.File(s"$idx/lists").listFiles()
      .map(_.getName).filter(_.startsWith("cid=")).sorted
    assert(listDirs.nonEmpty, "no cid= list directories written")

    val pe = util.t(spark, dir, "embeddings")
      .where(col("vec_id") === 0).select("embedding")
      .collect().head.getSeq[Float](0)
    val q = Similarity.annQueryIndex(spark, idx, pe, excludeVecId = 0L)

    // the probed-list restriction must reach the scan as a PARTITION
    // filter (directory pruning), not a post-scan row filter
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cid#") || plan.contains("PartitionFilters: [(cid#"),
      s"probed-cid filter did not become a partition filter:\n$plan")

    val got = q.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val expected = Similarity.simAnnIvf(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === expected, "index query diverged from the on-the-fly operator")
  }

  test("batch-probe index query matches per-probe single queries") {
    val dir = TestSpark.sfDir
    val idx = Files.createTempDirectory("graft_ivf_batch").toString
    Similarity.writeIvfIndex(spark, dir, idx)

    val probes = util.t(spark, dir, "embeddings")
      .orderBy("vec_id").limit(3)
      .select(col("vec_id").as("pid"), col("embedding").as("pe"))
    val batch = Similarity.annQueryIndexBatch(spark, idx, probes, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)

    probes.collect().foreach { pr =>
      val pid = pr.getLong(0)
      val pe = pr.getSeq[Float](1)
      val single = Similarity.annQueryIndex(spark, idx, pe, excludeVecId = pid, k = 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val got = batch(pid).sortBy(_._2).map(x => (x._3, x._4)).toSeq
      assert(got === single, s"probe $pid: batch diverged from single-probe query")
    }
  }
}
