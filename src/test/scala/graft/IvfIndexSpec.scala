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

  test("appendIvfIndex: new vectors join their lists without retrain or sibling rewrites") {
    import spark.implicits._
    val dir = TestSpark.sfDir
    val idx = Files.createTempDirectory("graft_ivf_app").toString
    Similarity.writeIvfIndex(spark, dir, idx)

    val pe = util.t(spark, dir, "embeddings")
      .where(col("vec_id") === 0).select("embedding")
      .collect().head.getSeq[Float](0)
    val before = Similarity.annQueryIndex(spark, idx, pe, excludeVecId = 0L)
      .collect().map(_.getLong(0)).toSeq

    val bookBytes = {
      val f = new java.io.File(s"$idx/codebook").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.readAllBytes(f.toPath)
    }
    val filesPerList = new java.io.File(s"$idx/lists").listFiles()
      .filter(_.getName.startsWith("cid="))
      .map(d => d.getName -> d.listFiles().count(_.getName.endsWith(".parquet"))).toMap

    // append a near-clone of the probe: it must land in the probe's own
    // best list and come back as the top hit (cos ≈ 1)
    val clone = pe.toArray.clone(); clone(0) += 0.001f
    Similarity.appendIvfIndex(spark, idx,
      Seq((900001L, clone.toSeq)).toDF("vec_id", "embedding"))

    val after = Similarity.annQueryIndex(spark, idx, pe, excludeVecId = 0L)
      .collect().map(_.getLong(0)).toSeq
    assert(after.head === 900001L, s"appended near-clone not top hit: $after")
    assert(after.tail === before.dropRight(1), "existing ranking disturbed beyond the insert")

    // codebook untouched (no retrain), and only ONE list directory grew
    val bookAfter = new java.io.File(s"$idx/codebook").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    assert(java.util.Arrays.equals(bookBytes,
      java.nio.file.Files.readAllBytes(bookAfter.toPath)), "codebook rewritten on append")
    val filesAfter = new java.io.File(s"$idx/lists").listFiles()
      .filter(_.getName.startsWith("cid="))
      .map(d => d.getName -> d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    val grown = filesAfter.filter { case (k, v) => filesPerList.getOrElse(k, 0) != v }
    assert(grown.size === 1, s"append must touch exactly one list: $grown")
  }
}
