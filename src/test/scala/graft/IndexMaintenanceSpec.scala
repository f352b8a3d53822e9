package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Compaction maintenance: after append-driven file accumulation, each
  * family's compaction must (a) shrink the data-file count, (b) leave
  * probe/query results identical, and (c) never touch the training /
  * metadata sidecars the index's geometry depends on. */
class IndexMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def sidecarBytes(path: String): Map[String, Array[Byte]] =
    new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> java.nio.file.Files.readAllBytes(f.toPath))
      .toMap

  private def batchDocs(ids: Range, text: String) = {
    import spark.implicits._
    ids.map(i => (i.toLong, text)).toDF("doc_id", "text")
  }

  test("band-index meta persists the write-time occupancy profile") {
    // both band families must record the pre-cap bucket profile alongside
    // the cap: the density signal appends warn on and deployments tune by
    val profileKeys = Set("n_buckets", "n_entries", "max_bucket_size",
      "n_over_cap", "entries_over_cap")
    for ((name, write) <- Seq[(String, String => Unit)](
        "simhash" -> (p => operators.Dedup.writeSimhashIndex(spark, dir, p)),
        "minhash" -> (p => operators.Dedup.writeMinhashIndex(spark, dir, p)))) {
      val idx = Files.createTempDirectory(s"graft_prof_$name").toString
      write(idx)
      val meta = spark.read.parquet(s"$idx/meta").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(profileKeys.subsetOf(meta.keySet),
        s"$name meta missing profile rows: ${meta.keySet}")
      assert(meta.contains("max_bucket"), s"$name meta lost the cap")
      assert(meta("n_entries") > 0L, s"$name profile is empty: $meta")
      assert(meta("n_buckets") > 0L && meta("max_bucket_size") > 0L)
      assert(meta("entries_over_cap") >= meta("n_over_cap") * 0L &&
        meta("n_over_cap") <= meta("n_buckets"))
      // sf0.001 under the shipped caps has no degenerate bucket — and the
      // profile is exactly how a deployment would CHECK that claim
      assert(meta("entries_over_cap").toDouble / meta("n_entries")
        <= operators.Dedup.BandOverCapWarnFraction,
        s"$name over-cap mass unexpectedly high at sf0.001: $meta")
    }
  }

  test("compactSimhashIndex: fewer files, identical probe verdicts, meta untouched") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft_cmp_sh").toString
    operators.Dedup.writeSimhashIndex(spark, dir, idx)
    val srcText = util.t(spark, dir, "documents")
      .where(col("doc_id") % 10 =!= 7).orderBy("doc_id")
      .select("text").limit(1).collect().head.getString(0)
    // three appends = three more file generations, the admission-loop shape
    (0 until 3).foreach(b =>
      operators.Dedup.appendSimhashIndex(spark, idx,
        batchDocs(800000 + b * 10 until 800000 + b * 10 + 3, srcText + s" b$b")))
    val filesBefore = operators.IndexMaintenance.dataFileCount(spark, s"$idx/bands")
    val metaBefore = sidecarBytes(s"$idx/meta")
    val probe = batchDocs(900001 to 900001, srcText)
    val before = operators.Dedup.probeSimhashIndex(spark, probe, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._2)

    operators.IndexMaintenance.compactSimhashIndex(spark, idx)

    val filesAfter = operators.IndexMaintenance.dataFileCount(spark, s"$idx/bands")
    assert(filesAfter < filesBefore,
      s"compaction did not shrink bands: $filesBefore -> $filesAfter")
    val after = operators.Dedup.probeSimhashIndex(spark, probe, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._2)
    assert(after === before, "probe verdicts changed across compaction")
    assert(sidecarBytes(s"$idx/meta").view.mapValues(_.toSeq).toMap
      === metaBefore.view.mapValues(_.toSeq).toMap, "meta sidecar rewritten")
  }

  test("compactMinhashIndex: fewer files in both dirs, identical probe verdicts") {
    val idx = Files.createTempDirectory("graft_cmp_mh").toString
    operators.Dedup.writeMinhashIndex(spark, dir, idx)
    val srcText = util.t(spark, dir, "documents")
      .where(col("doc_id") % 10 =!= 7).orderBy("doc_id")
      .select("text").limit(1).collect().head.getString(0)
    (0 until 3).foreach(b =>
      operators.Dedup.appendMinhashIndex(spark, idx,
        batchDocs(810000 + b * 10 until 810000 + b * 10 + 3, srcText)))
    val bandsBefore = operators.IndexMaintenance.dataFileCount(spark, s"$idx/bands")
    val sigsBefore = operators.IndexMaintenance.dataFileCount(spark, s"$idx/sigs")
    val probe = batchDocs(900002 to 900002, srcText)
    val before = operators.Dedup.probeMinhashIndex(spark, probe, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._2)

    operators.IndexMaintenance.compactMinhashIndex(spark, idx)

    assert(operators.IndexMaintenance.dataFileCount(spark, s"$idx/bands") < bandsBefore)
    assert(operators.IndexMaintenance.dataFileCount(spark, s"$idx/sigs") < sigsBefore)
    val after = operators.Dedup.probeMinhashIndex(spark, probe, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._2)
    assert(after === before, "probe verdicts changed across compaction")
  }

  test("compactGramIndex: dfs delta log collapses to one row per gh with identical totals") {
    val idx = Files.createTempDirectory("graft_cmp_gr").toString
    operators.Dedup.writeGramIndex(spark, dir, idx)
    val srcText = util.t(spark, dir, "documents")
      .where(col("doc_id") % 10 =!= 7).orderBy("doc_id")
      .select("text").limit(1).collect().head.getString(0)
    (0 until 3).foreach(b =>
      operators.Dedup.appendGramIndex(spark, idx,
        batchDocs(820000 + b * 10 until 820000 + b * 10 + 2, srcText)))
    val dfsRowsBefore = spark.read.parquet(s"$idx/dfs").count()
    val totalsBefore = spark.read.parquet(s"$idx/dfs")
      .groupBy("gh").agg(sum("df").as("df"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val probe = batchDocs(900003 to 900003, srcText)
    val before = operators.Dedup.probeGramIndex(spark, probe, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._2)

    operators.IndexMaintenance.compactGramIndex(spark, idx)

    val dfs = spark.read.parquet(s"$idx/dfs")
    assert(dfs.count() < dfsRowsBefore, "delta log not collapsed")
    assert(dfs.groupBy("gh").count().where(col("count") > 1).count() === 0,
      "dfs must hold one row per gh after log compaction")
    val totalsAfter = dfs
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(totalsAfter === totalsBefore, "df totals drifted across compaction")
    val after = operators.Dedup.probeGramIndex(spark, probe, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._2)
    assert(after === before, "probe verdicts changed across compaction")
  }

  test("compactSubstrIndex: cross-append duplicate hashes collapse, probe verdicts identical") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft_cmp_sub").toString
    operators.Dedup.writeSubstrIndex(spark, dir, idx)
    val run = "COMPACT-RUN-ABCDEFGHIJKLMNOPQRSTUVWXYZ-01"
    // three appends of the SAME text: identical hash sets — the duplicate
    // accumulation the O(batch) append knowingly trades for
    (0 until 3).foreach(b =>
      operators.Dedup.appendSubstrIndex(spark, idx,
        batchDocs(820000 + b until 820000 + b + 1, s"head-$b====" + run)))
    val rowsBefore = spark.read.parquet(s"$idx/hashes").count()
    val distinctBefore = spark.read.parquet(s"$idx/hashes").distinct().count()
    assert(rowsBefore > distinctBefore, "fixture failed to create duplicate hash rows")
    val filesBefore = operators.IndexMaintenance.dataFileCount(spark, s"$idx/hashes")
    val probe = batchDocs(930001 to 930001, "probe~~~~" + run + ";;;;tail")
    val before = operators.Dedup.probeSubstrIndex(spark, probe, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._2)
    assert(before.nonEmpty, "probe should hit the appended run")

    operators.IndexMaintenance.compactSubstrIndex(spark, idx)

    assert(operators.IndexMaintenance.dataFileCount(spark, s"$idx/hashes") < filesBefore)
    assert(spark.read.parquet(s"$idx/hashes").count() === distinctBefore,
      "compaction must dedup the hash rows exactly")
    val after = operators.Dedup.probeSubstrIndex(spark, probe, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._2)
    assert(after === before, "probe verdicts changed across compaction")
  }

  test("compactIvfIndex: cell dirs shrink, ANN top-k identical, codebook untouched") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft_cmp_ivf").toString
    operators.Similarity.writeIvfIndex(spark, dir, idx)
    val vecs = util.t(spark, dir, "embeddings")
      .orderBy("vec_id").limit(4)
      .select(col("vec_id") + 900000L, col("embedding"))
      .toDF("vec_id", "embedding")
    (0 until 3).foreach(b =>
      operators.Similarity.appendIvfIndex(spark, idx,
        vecs.withColumn("vec_id", col("vec_id") + lit(b * 100L))))
    val filesBefore = operators.IndexMaintenance.dataFileCount(spark, s"$idx/lists")
    val bookBefore = sidecarBytes(s"$idx/codebook")
    val pe = util.t(spark, dir, "embeddings").orderBy("vec_id")
      .select("embedding").limit(1)
      .as[Array[Float]].collect().head.toSeq
    def topk = operators.Similarity.annQueryIndex(spark, idx, pe)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

    val before = topk
    operators.IndexMaintenance.compactIvfIndex(spark, idx)

    assert(operators.IndexMaintenance.dataFileCount(spark, s"$idx/lists") < filesBefore,
      "compaction did not shrink lists")
    assert(topk === before, "ANN top-k changed across compaction")
    assert(sidecarBytes(s"$idx/codebook").view.mapValues(_.toSeq).toMap
      === bookBefore.view.mapValues(_.toSeq).toMap, "codebook rewritten")
  }

  test("compactBloomIndex: word log folds to one row per widx, probe contamination identical") {
    val idx = Files.createTempDirectory("graft_cmp_bl").toString
    operators.Dedup.writeBloomIndex(spark, dir, idx)
    val srcText = util.t(spark, dir, "documents")
      .orderBy("doc_id").select("text").limit(1).collect().head.getString(0)
    (0 until 3).foreach(b =>
      operators.Dedup.appendBloomIndex(spark, idx,
        batchDocs(820000 + b * 10 until 820000 + b * 10 + 3, srcText + s" b$b")))
    val filesBefore = operators.IndexMaintenance.dataFileCount(spark, s"$idx/words")
    val metaBefore = sidecarBytes(s"$idx/meta")
    val probe = batchDocs(900003 to 900003, srcText + " b1")
    val before = operators.Dedup.probeBloomIndex(spark, probe, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq

    operators.IndexMaintenance.compactBloomIndex(spark, idx)

    assert(operators.IndexMaintenance.dataFileCount(spark, s"$idx/words") < filesBefore,
      "compaction did not shrink words")
    // the one family whose compaction shrinks ROWS: the append log must
    // fold to the merged form readers compute — exactly one row per widx
    val multi = spark.read.parquet(s"$idx/words")
      .groupBy("widx").count().where(col("count") > 1).count()
    assert(multi === 0L, "words must hold one row per widx after folding")
    val after = operators.Dedup.probeBloomIndex(spark, probe, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(after === before, "probe verdicts changed across compaction")
    assert(sidecarBytes(s"$idx/meta").view.mapValues(_.toSeq).toMap
      === metaBefore.view.mapValues(_.toSeq).toMap, "meta sidecar rewritten")
  }

  test("compactMvLog: batch log folds to one row per group, readMv identical, later batches still merge") {
    val mvDir = Files.createTempDirectory("graft_cmp_mv").toString + "/mv"
    val o = util.t(spark, dir, "orders")
    // simulate three committed stream batches over 3 of 4 order slices
    // (the shape streamMvMaintain writes: one batch_id partition each)
    for (k <- 0 until 3)
      operators.Relational.mvPartialStates(o.where(col("o_orderkey") % 4 === k))
        .withColumn("batch_id", lit(k.toLong))
        .write.mode("append").partitionBy("batch_id").parquet(mvDir)
    val before = operators.Relational.readMv(spark, mvDir).collect()
    val filesBefore = operators.IndexMaintenance.dataFileCount(spark, mvDir)
    operators.IndexMaintenance.compactMvLog(spark, mvDir)
    // identical view, fewer files, exactly one state row per group, all
    // under the reserved batch_id = -1 (monotone stream ids never collide)
    assert(operators.Relational.readMv(spark, mvDir).collect() === before)
    assert(operators.IndexMaintenance.dataFileCount(spark, mvDir) < filesBefore)
    val log = spark.read.parquet(mvDir)
    assert(log.groupBy("o_orderpriority", "o_year").count()
      .where(col("count") > 1).count() === 0L)
    assert(log.select(col("batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSeq === Seq(-1L))
    // a later stream batch lands on top of the compacted log and readMv
    // still equals the single-pass batch MV over ALL orders
    operators.Relational.mvPartialStates(o.where(col("o_orderkey") % 4 === 3))
      .withColumn("batch_id", lit(3L))
      .write.mode("append").partitionBy("batch_id").parquet(mvDir)
    val streamed = operators.Relational.readMv(spark, mvDir)
    val batchTwin = operators.Relational.mvPresent(
      operators.Relational.mvMergeStates(operators.Relational.mvPartialStates(o)))
    assert(streamed.collect() === batchTwin.collect())
    // compaction is idempotent: folding the folded log is a fixed point
    operators.IndexMaintenance.compactMvLog(spark, mvDir)
    assert(operators.Relational.readMv(spark, mvDir).collect()
      === batchTwin.collect())
    // REPLAY hazard (r19 ADVICE): a stream whose checkpoint lagged the
    // compaction replays batch 3 — its partition reappears on disk, but
    // the fold ceiling the compactor recorded makes readMv DROP it
    // instead of double-counting against the folded -1 row
    assert(operators.IndexMaintenance.compactedThrough(spark, mvDir) === Some(3L))
    operators.Relational.mvPartialStates(o.where(col("o_orderkey") % 4 === 3))
      .withColumn("batch_id", lit(3L))
      .write.mode("append").partitionBy("batch_id").parquet(mvDir)
    assert(operators.Relational.readMv(spark, mvDir).collect() === batchTwin.collect(),
      "replayed folded batch double-counted — fold-ceiling guard broken")
    // a genuinely NEW batch (id above the ceiling) still merges normally
    operators.Relational.mvPartialStates(o.where(col("o_orderkey") % 4 === 3))
      .withColumn("batch_id", lit(4L))
      .write.mode("append").partitionBy("batch_id").parquet(mvDir)
    val twin2 = operators.Relational.mvPresent(operators.Relational.mvMergeStates(
      operators.Relational.mvPartialStates(o).unionByName(
        operators.Relational.mvPartialStates(o.where(col("o_orderkey") % 4 === 3)))))
    assert(operators.Relational.readMv(spark, mvDir).collect() === twin2.collect())
    // a SECOND compaction with the replayed batch-3 partition still on
    // disk must fold batch 4 but DROP the replay — the fold applies the
    // same ceiling filter the readers do, or it would double-count what
    // the first fold already contains
    operators.IndexMaintenance.compactMvLog(spark, mvDir)
    assert(operators.Relational.readMv(spark, mvDir).collect() === twin2.collect(),
      "second compaction folded a replayed already-folded batch")
    assert(operators.IndexMaintenance.compactedThrough(spark, mvDir) === Some(4L))
  }

  test("compactMvSignedLog: signed log folds through the netting merge, replayed retraction dropped") {
    val mvDir = Files.createTempDirectory("graft_cmp_mvs").toString + "/mv"
    val o = util.t(spark, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderdate"), col("o_orderkey"),
        col("o_totalprice"))
    def signedStates(df: org.apache.spark.sql.DataFrame, sign: Int, id: Long): Unit =
      operators.Relational.mvSignedStates(df, sign)
        .withColumn("batch_id", lit(id))
        .write.mode("append").partitionBy("batch_id").parquet(mvDir)
    signedStates(o, 1, 0L)                                  // batch 0: everything
    signedStates(o.where(col("o_orderkey") % 5 === 0), -1, 1L) // batch 1: retraction
    val before = operators.Relational.readMvSigned(spark, mvDir).collect()
    operators.IndexMaintenance.compactMvSignedLog(spark, mvDir)
    assert(operators.Relational.readMvSigned(spark, mvDir).collect() === before)
    assert(spark.read.parquet(mvDir).groupBy("o_orderpriority", "o_year")
      .count().where(col("count") > 1).count() === 0L)
    // replaying the folded retraction must not double-retract
    signedStates(o.where(col("o_orderkey") % 5 === 0), -1, 1L)
    assert(operators.Relational.readMvSigned(spark, mvDir).collect() === before,
      "replayed folded retraction double-retracted")
  }

  test("deleteFromGramIndex: deleted docs' pairs vanish exactly, dfs subtraction is exact") {
    val idx = Files.createTempDirectory("graft_del_gram").toString
    operators.Dedup.writeGramIndex(spark, dir, idx)
    val docs = util.t(spark, dir, "documents").select("doc_id", "text")
    val probes = docs.where(col("doc_id") % 10 === 7)
    val before = operators.Dedup.probeGramIndex(spark, probes, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // delete a corpus slice (doc_id % 9 == 1, never a probe doc)
    val deleted = docs.where(col("doc_id") % 10 =!= 7 && col("doc_id") % 9 === 2)
    val delIds = deleted.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(delIds.nonEmpty, "degenerate fixture: nothing to delete")
    operators.IndexMaintenance.deleteFromGramIndex(spark, deleted, idx)
    // pair scores are independent per (new, old): deletion removes
    // EXACTLY the pairs whose dup_of was deleted, nothing else moves
    val after = operators.Dedup.probeGramIndex(spark, probes, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(after === before.filterNot(p => delIds(p._2)),
      "deletion moved pairs beyond the deleted docs' own")
    assert(before.exists(p => delIds(p._2)),
      "degenerate fixture: no probe pair involved a deleted doc")
    // the dfs sidecar subtraction is EXACT: summed deltas per gh equal
    // the df of the surviving corpus under the same derivation
    val survivors = docs.where(col("doc_id") % 10 =!= 7 && col("doc_id") % 9 =!= 2)
    val expectedDf = operators.Dedup.batchGramDf(spark, survivors)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val storedDf = spark.read.parquet(s"$idx/dfs")
      .groupBy("gh").agg(sum(col("df")).as("df"))
      .where(col("df") =!= 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(storedDf === expectedDf, "dfs subtraction diverged from the surviving corpus df")
    // a RETRIED deletion of the same batch must not double-subtract df:
    // the rewrites are no-ops and the content-hash marker skips the
    // delta append
    operators.IndexMaintenance.deleteFromGramIndex(spark, deleted, idx)
    val storedDf2 = spark.read.parquet(s"$idx/dfs")
      .groupBy("gh").agg(sum(col("df")).as("df"))
      .where(col("df") =!= 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(storedDf2 === expectedDf, "retried deletion double-subtracted df")
    // compaction after deletion folds the +/- log and reads identical
    operators.IndexMaintenance.compactGramIndex(spark, idx)
    val afterCompact = operators.Dedup.probeGramIndex(spark, probes, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(afterCompact === after)
  }

  test("deleteFromMinhashIndex / deleteFromSimhashIndex: deleted docs' verdicts vanish exactly") {
    val docs = util.t(spark, dir, "documents").select("doc_id", "text")
    val probes = docs.where(col("doc_id") % 10 === 7)
    val delIdsDf = docs.where(col("doc_id") % 10 =!= 7 && col("doc_id") % 9 === 2)
      .select("doc_id")
    val delIds = delIdsDf.collect().map(_.getLong(0)).toSet
    for ((name, write, del, probe) <- Seq[(String,
        String => Unit, String => Unit,
        String => Set[(Long, Long)])](
      ("minhash",
        p => operators.Dedup.writeMinhashIndex(spark, dir, p),
        p => operators.IndexMaintenance.deleteFromMinhashIndex(spark, delIdsDf, p),
        p => operators.Dedup.probeMinhashIndex(spark, probes, p)
          .select("new_id", "dup_of").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet),
      ("simhash",
        p => operators.Dedup.writeSimhashIndex(spark, dir, p),
        p => operators.IndexMaintenance.deleteFromSimhashIndex(spark, delIdsDf, p),
        p => operators.Dedup.probeSimhashIndex(spark, probes, p)
          .select("new_id", "dup_of").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet))) {
      val idx = Files.createTempDirectory(s"graft_del_$name").toString
      write(idx)
      val before = probe(idx)
      del(idx)
      val after = probe(idx)
      assert(after === before.filterNot(p => delIds(p._2)),
        s"$name: deletion moved verdicts beyond the deleted docs' own")
      assert(before.exists(p => delIds(p._2)),
        s"$name: degenerate fixture — no verdict involved a deleted doc")
    }
  }

  test("deleteFromIvfIndex: probes equal an index of the survivors on the same codebook") {
    import spark.implicits._
    val idxA = Files.createTempDirectory("graft_del_ivf_a").toString
    operators.Similarity.writeIvfIndex(spark, dir, idxA)
    val emb = util.t(spark, dir, "embeddings").select("vec_id", "embedding")
    val delIdsDf = emb.where(col("vec_id") % 7 === 2).select("vec_id")
    val delIds = delIdsDf.collect().map(_.getLong(0)).toSet
    assert(delIds.nonEmpty)
    // twin index: SAME codebook (deletion never retrains), survivors
    // appended onto empty lists — the exact population deletion promises
    val idxB = Files.createTempDirectory("graft_del_ivf_b").toString
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    org.apache.hadoop.fs.FileUtil.copy(
      fs, new org.apache.hadoop.fs.Path(s"$idxA/codebook"),
      fs, new org.apache.hadoop.fs.Path(s"$idxB/codebook"),
      false, spark.sparkContext.hadoopConfiguration)
    operators.Similarity.appendIvfIndex(spark, idxB,
      emb.join(delIdsDf, Seq("vec_id"), "left_anti"))
    operators.IndexMaintenance.deleteFromIvfIndex(spark, delIdsDf, idxA)
    val probes = emb.where(col("vec_id") % 11 === 3)
      .select(col("vec_id").as("pid"), col("embedding").as("pe"))
    def top(p: String) = operators.Similarity.annQueryIndexBatch(spark, p, probes, k = 5)
      .select("pid", "rank", "vec_id", "cos").orderBy("pid", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val a = top(idxA)
    assert(a === top(idxB), "deleted index diverged from the survivors-on-same-codebook twin")
    assert(a.nonEmpty && a.forall(r => !delIds(r._3)),
      "a deleted vector survived in the probe results")
  }

  test("deleteFromEntityIndex: appended/ replay markers survive the swap, verdicts match a survivor rebuild") {
    val tmp = Files.createTempDirectory("graft_del_ent").toString + "/entidx"
    val c = util.t(spark, dir, "customer")
    val idxPop = c.where(col("c_custkey") % 10 < 8)
    val probes = c.where(col("c_custkey") % 10 >= 8)
    operators.Resolve.writeEntityIndex(idxPop, tmp)
    // the replay markers the streaming absorb loop keeps under the SAME
    // root (Pipeline.ingestLoop writes appended/<batchId>) — the r20
    // ADVICE hazard was the delete's swap silently dropping them
    val fs = new org.apache.hadoop.fs.Path(tmp)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$tmp/appended"))
    fs.createNewFile(new org.apache.hadoop.fs.Path(s"$tmp/appended/0"))
    fs.createNewFile(new org.apache.hadoop.fs.Path(s"$tmp/appended/1"))
    val delKeys = idxPop.where(col("c_custkey") % 7 === 3)
      .select("c_custkey").localCheckpoint()
    operators.IndexMaintenance.deleteFromEntityIndex(spark, delKeys, tmp)
    assert(new java.io.File(s"$tmp/appended/0").exists(),
      "replay marker appended/0 must survive the delete's swap")
    assert(new java.io.File(s"$tmp/appended/1").exists(),
      "replay marker appended/1 must survive the delete's swap")
    // verdicts equal a probe against the surviving population rebuilt
    // directly — deletion changed membership, nothing else
    val survivors = idxPop.join(delKeys, Seq("c_custkey"), "left_anti")
    val viaIndex = operators.Resolve.probeEntityIndex(spark, probes, tmp)
      .orderBy("probe_key")
    val rebuilt = operators.Resolve.probeMatches(survivors, probes)
      .orderBy("probe_key")
    assert(viaIndex.collect() === rebuilt.collect())
  }

  test("compactMvLog: the fold ceiling is staged into the new directory before the swap") {
    val mvDir = Files.createTempDirectory("graft_cmp_ceiling").toString + "/mv"
    val o = util.t(spark, dir, "orders")
    for (k <- 0 until 2)
      operators.Relational.mvPartialStates(o.where(col("o_orderkey") % 2 === k))
        .withColumn("batch_id", lit(k.toLong))
        .write.mode("append").partitionBy("batch_id").parquet(mvDir)
    operators.IndexMaintenance.compactMvLog(spark, mvDir)
    // the ceiling rode the atomic rename (beforeSwap staging), so it is
    // present and correct even if the post-swap fallback write never ran
    assert(operators.IndexMaintenance.compactedThrough(spark, mvDir) === Some(1L))
  }

  test("crashed mid-swap state is refused: the __old rollback copy is never deleted") {
    val idx = Files.createTempDirectory("graft_cmp_crash").toString
    operators.Dedup.writeSimhashIndex(spark, dir, idx)
    // simulate a crash between the two renames: bands moved aside, the
    // compacted tree never swapped in
    val bands = new java.io.File(s"$idx/bands")
    val old = new java.io.File(s"$idx/bands__old")
    assert(bands.renameTo(old))
    val e = intercept[RuntimeException] {
      operators.IndexMaintenance.compactSimhashIndex(spark, idx)
    }
    assert(e.getMessage.contains("ONLY copy"),
      s"expected the refusal message, got: ${e.getMessage}")
    // the rollback copy must survive the refused run intact
    assert(old.exists && operators.IndexMaintenance.dataFileCount(spark, old.toString) > 0)
    // operator recovery: rename back, compaction proceeds normally
    assert(old.renameTo(bands))
    operators.IndexMaintenance.compactSimhashIndex(spark, idx)
    assert(operators.IndexMaintenance.dataFileCount(spark, bands.toString) > 0)
  }
}
