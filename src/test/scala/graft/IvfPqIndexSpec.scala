package graft

import java.nio.file.Files

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted IVF+PQ index (SURVEY.md §2 B.15): the layout must (a) exist
  * as cell directories + codebooks, (b) prune the approximate phase to
  * the probed directories AND to the code columns (partition pruning +
  * column pruning — the two mechanisms that make the layout IVFADC), and
  * (c) recover most of the exact top-10 despite scoring via 4 table
  * lookups per candidate. */
class IvfPqIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("IVF+PQ index: layout, pruned+code-only approx scan, recall vs exact") {
    val dir = TestSpark.sfDir
    val idx = Files.createTempDirectory("graft_ivfpq_idx").toString
    Similarity.writeIvfPqIndex(spark, dir, idx)

    // layout: one directory per coarse cell, M rows of PQ sub-centroids
    val listDirs = new java.io.File(s"$idx/lists").listFiles()
      .map(_.getName).filter(_.startsWith("cid=")).sorted
    assert(listDirs.nonEmpty, "no cid= cell directories written")
    assert(spark.read.parquet(s"$idx/pq").count() === Similarity.PqM.toLong)
    val listCols = spark.read.parquet(s"$idx/lists").columns.toSet
    assert((0 until Similarity.PqM).forall(m => listCols.contains(s"c$m")),
      s"code columns missing from lists: $listCols")

    val pe = util.t(spark, dir, "embeddings")
      .where(col("vec_id") === 0).select("embedding")
      .collect().head.getSeq[Float](0)
    val q = Similarity.ivfPqQueryIndex(spark, idx, pe, excludeVecId = 0L)
    val plan = q.queryExecution.executedPlan.toString

    // the probed-cid restriction must be a PARTITION filter on every
    // lists scan (approximate phase and re-rank both)
    assert(plan.contains("PartitionFilters: [cid#") || plan.contains("PartitionFilters: [(cid#"),
      s"probed-cid filter did not become a partition filter:\n$plan")
    // the approximate phase must NOT read the embedding column: exactly
    // one lists scan carries it (the re-rank), the other reads codes only
    val listsScans = plan.linesIterator
      .filter(l => l.contains("Scan parquet") && l.contains("/lists"))
      .toSeq
    assert(listsScans.size === 2, s"expected 2 lists scans, got:\n$plan")
    assert(listsScans.count(_.contains("embedding")) === 1,
      s"approx phase should scan codes only (one embedding-free scan):\n${listsScans.mkString("\n")}")

    // recall floor vs EXACT COSINE WITHIN THE PROBED CELLS — isolates the
    // ADC-scoring approximation this index adds; the cell-routing recall
    // is q_sim_ann_ivf's already-covered concern (on i.i.d. data probing
    // 4/16 cells bounds global recall near probes/K, so a global floor
    // would test the data, not the index)
    graft.functions.VectorExpressions.register(spark)
    import spark.implicits._
    val probeDf = Seq(Tuple1(pe)).toDF("pe")
    val probedCids = spark.read.parquet(s"$idx/codebook")
      .crossJoin(broadcast(probeDf))
      .select(col("cid"),
        util.r4f(graft.functions.VectorExpressions.cosineSim(col("ce"), col("pe"))).as("ac"))
      .orderBy(col("ac").desc, col("cid").asc)
      .limit(Similarity.IvfProbes)
      .collect().map(_.getLong(0))
    val exactInCells = spark.read.parquet(s"$idx/lists")
      .where(col("cid").isin(probedCids: _*) && col("vec_id") =!= 0L)
      .crossJoin(broadcast(probeDf))
      .select(col("vec_id"),
        util.r4(graft.functions.VectorExpressions.cosineSim(col("embedding"), col("pe"))).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(10)
      .collect().map(_.getLong(0)).toSet
    val got = q.collect().map(_.getLong(0)).toSet
    val recall = (got & exactInCells).size.toDouble / exactInCells.size
    assert(recall >= 0.5, s"IVF+PQ ADC recall@10 vs exact-in-cells: $recall")
  }

  test("appendIvfPqIndex: encode-and-append against stored codebooks, no retrain, one cell grows") {
    import spark.implicits._
    val dir = TestSpark.sfDir
    val idx = Files.createTempDirectory("graft_ivfpq_app").toString
    Similarity.writeIvfPqIndex(spark, dir, idx)

    val pe = util.t(spark, dir, "embeddings")
      .where(col("vec_id") === 0).select("embedding")
      .collect().head.getSeq[Float](0)
    val before = Similarity.ivfPqQueryIndex(spark, idx, pe, excludeVecId = 0L)
      .collect().map(_.getLong(0)).toSeq

    def fileBytes(sub: String) = {
      val f = new java.io.File(s"$idx/$sub").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      f.toPath -> java.nio.file.Files.readAllBytes(f.toPath)
    }
    val (bookPath, bookBytes) = fileBytes("codebook")
    val (pqPath, pqBytes) = fileBytes("pq")
    val filesPerCell = new java.io.File(s"$idx/lists").listFiles()
      .filter(_.getName.startsWith("cid="))
      .map(d => d.getName -> d.listFiles().count(_.getName.endsWith(".parquet"))).toMap

    // append a near-clone of the probe: it must land in the probe's own
    // best cell, survive the ADC phase (its codes equal the probe's, so
    // its table-lookup score tops the cell) and win the exact re-rank
    val clone = pe.toArray.clone(); clone(0) += 0.001f
    Similarity.appendIvfPqIndex(spark, idx,
      Seq((900001L, clone.toSeq)).toDF("vec_id", "embedding"))

    val after = Similarity.ivfPqQueryIndex(spark, idx, pe, excludeVecId = 0L)
      .collect().map(_.getLong(0)).toSeq
    assert(after.head === 900001L, s"appended near-clone not top hit: $after")
    assert(after.tail === before.dropRight(1), "existing ranking disturbed beyond the insert")

    // BOTH training artifacts byte-identical (no per-batch retrain), and
    // only the clone's cell directory grew
    assert(java.util.Arrays.equals(bookBytes, java.nio.file.Files.readAllBytes(bookPath)),
      "coarse codebook rewritten on append")
    assert(java.util.Arrays.equals(pqBytes, java.nio.file.Files.readAllBytes(pqPath)),
      "PQ sub-centroids rewritten on append")
    val filesAfter = new java.io.File(s"$idx/lists").listFiles()
      .filter(_.getName.startsWith("cid="))
      .map(d => d.getName -> d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    val grown = filesAfter.filter { case (k, v) => filesPerCell.getOrElse(k, 0) != v }
    assert(grown.size === 1, s"append must touch exactly one cell: $grown")
  }

  test("batch-probe IVF+PQ query matches per-probe single queries") {
    val dir = TestSpark.sfDir
    val idx = Files.createTempDirectory("graft_ivfpq_batch").toString
    Similarity.writeIvfPqIndex(spark, dir, idx)

    val probes = util.t(spark, dir, "embeddings")
      .orderBy("vec_id").limit(3)
      .select(col("vec_id").as("pid"), col("embedding").as("pe"))
    val q = Similarity.ivfPqQueryIndexBatch(spark, idx, probes, k = 5)

    // the batch form keeps the single query's column-pruning contract:
    // the ADC phase scans code columns only — exactly one lists scan
    // (the exact re-rank) carries the embedding column
    val listsScans = q.queryExecution.sparkPlan.toString.linesIterator
      .filter(l => l.contains("Scan parquet") && l.contains("/lists"))
      .toSeq
    assert(listsScans.size === 2, s"expected 2 lists scans:\n${listsScans.mkString("\n")}")
    assert(listsScans.count(_.contains("embedding")) === 1,
      s"ADC phase must scan codes only:\n${listsScans.mkString("\n")}")

    val batch = q
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)

    probes.collect().foreach { pr =>
      val pid = pr.getLong(0)
      val pe = pr.getSeq[Float](1)
      val single = Similarity.ivfPqQueryIndex(spark, idx, pe, excludeVecId = pid, k = 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val got = batch(pid).sortBy(_._2).map(x => (x._3, x._4)).toSeq
      assert(got === single, s"probe $pid: batch IVFADC diverged from single-probe query")
    }
  }

  test("q_sim_ann_ivfpq ≡ ivfPqQueryIndex: on-the-fly IVFADC equals the persisted-index query") {
    val dir = TestSpark.sfDir
    val idx = Files.createTempDirectory("graft_ivfpq_parity").toString
    Similarity.writeIvfPqIndex(spark, dir, idx)
    val pe = util.t(spark, dir, "embeddings")
      .where(col("vec_id") === 0).select("embedding")
      .collect().head.getSeq[Float](0)
    val persisted = Similarity.ivfPqQueryIndex(spark, idx, pe, excludeVecId = 0L)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val onTheFly = Similarity.simAnnIvfPq(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(onTheFly === persisted,
      "declared IVFADC query diverged from the persisted-index path")
    assert(onTheFly.nonEmpty)
  }
}
