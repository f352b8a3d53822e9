package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Compaction maintenance for the persisted index families.
  *
  * Why it exists: every index family now has add-after-build appends
  * (appendIvfIndex / appendIvfPqIndex / appendSemanticIndex /
  * appendMinhashIndex / appendSimhashIndex / appendGramIndex), and the
  * streaming ingest admission loop runs one append PER MICRO-BATCH.
  * Parquet append mode only ever adds files, so a 2-second trigger
  * accumulates ~43k files/day per directory and probe-scan PLANNING
  * (file listing + footer reads), not IO, becomes the bottleneck —
  * the same failure mode `Sinks.compactDay` exists to stop on the log
  * sink. Compaction rewrites a directory clustered by its probe keys
  * into O(shuffle partitions) files and swaps it in place; probe
  * results are unchanged (asserted per family in
  * IndexMaintenanceSpec).
  *
  * Swap discipline: the rewrite lands in `<dir>__compact` first (the
  * slow part — full shuffle + write — happens against a live index;
  * probes keep working), then two renames swap it in. On a POSIX
  * filesystem / HDFS, rename is atomic so the unreadable window is the
  * gap between the two renames; a crash in that gap leaves
  * `<dir>__old` intact for manual rollback. On S3-style object stores
  * rename is copy+delete, so production runs there should instead
  * write versioned directories and flip a manifest pointer — the same
  * caveat `Sinks.writeManifest` documents for the shard layout.
  *
  * What compaction does NOT do: re-apply the bucket caps or the df
  * pruning. Appends already enforce those at admission time, so a
  * rewrite preserves row content exactly (the one semantic rewrite is
  * the gram `dfs/` delta log, whose CONTRACT is "readers sum per gh" —
  * summing the deltas into one row per gh is the log-compaction that
  * contract was designed for).
  */
object IndexMaintenance {

  private def hfs(s: SparkSession, path: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)

  /** number of parquet data files under a directory (recursive) — the
    * quantity compaction exists to bound; exposed for ops/specs. Goes
    * through the Hadoop FileSystem API like the swap, so HDFS/S3A
    * paths count correctly instead of silently reading as zero. */
  def dataFileCount(s: SparkSession, dir: String): Int = {
    val fs = hfs(s, dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(p)) 0
    else {
      val it = fs.listFiles(p, true)
      var n = 0
      while (it.hasNext) if (it.next().getPath.getName.endsWith(".parquet")) n += 1
      n
    }
  }

  /** rewrite one parquet directory: read → optional transform →
    * cluster by `clusterCols` → write to `<dir>__compact` → swap.
    * All path operations go through the Hadoop FileSystem API (rename
    * is atomic on POSIX/HDFS; see the object scaladoc for the object-
    * store caveat). A prior crash between the two renames leaves
    * `<dir>__old` as the only copy — that state is REFUSED, never
    * cleaned up, so a re-run cannot destroy the rollback copy. */
  private def compactDir(s: SparkSession, dir: String,
      clusterCols: Seq[String], partitionCols: Seq[String] = Nil,
      transform: DataFrame => DataFrame = identity,
      beforeSwap: org.apache.hadoop.fs.Path => Unit = _ => ()): Unit = {
    val fs = hfs(s, dir)
    val dirP = new org.apache.hadoop.fs.Path(dir)
    val tmpP = new org.apache.hadoop.fs.Path(dir + "__compact")
    val oldP = new org.apache.hadoop.fs.Path(dir + "__old")
    if (!fs.exists(dirP) && fs.exists(oldP))
      sys.error(s"compact: $dir is missing but $oldP exists — a prior " +
        "compaction crashed between its two renames and the rollback " +
        s"copy is the ONLY copy; rename $oldP back to $dir before " +
        "compacting again")
    fs.delete(tmpP, true)
    fs.delete(oldP, true) // reached only when dir exists — stale debris
    val w = transform(s.read.parquet(dir))
      .repartition(clusterCols.map(col): _*)
      .write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(tmpP.toString)
    // sidecars/markers that must survive the swap are staged INTO the
    // new directory while the live one is still intact — they then
    // commit atomically with the rename (the live dir is never mutated
    // before the swap, so a crash here changes nothing)
    beforeSwap(tmpP)
    if (!fs.rename(dirP, oldP))
      sys.error(s"compact: cannot move $dir aside")
    if (!fs.rename(tmpP, dirP)) {
      fs.rename(oldP, dirP) // rollback — the live index stays valid
      sys.error(s"compact: cannot swap $tmpP into place")
    }
    fs.delete(oldP, true)
  }

  /** SimHash band index: `bands/` re-clustered by its (chunk, cv) probe
    * key; `meta/` (the persisted cap) untouched */
  def compactSimhashIndex(s: SparkSession, indexPath: String): Unit =
    compactDir(s, s"$indexPath/bands", Seq("chunk", "cv"))

  /** MinHash band index: `bands/` by its (band, bh) probe key, `sigs/`
    * by doc_id (verification reads it via a doc_id equi-join) */
  def compactMinhashIndex(s: SparkSession, indexPath: String): Unit = {
    compactDir(s, s"$indexPath/bands", Seq("band", "bh"))
    compactDir(s, s"$indexPath/sigs", Seq("doc_id"))
  }

  /** Pruned inverted gram index: `grams/` by gh, `sizes/` by doc_id,
    * and the `dfs/` DELTA LOG summed into one row per gh — readers sum
    * per gh, so replacing k delta rows with their sum is the log
    * compaction the delta contract exists for (df totals identical,
    * future append admission decisions identical) */
  def compactGramIndex(s: SparkSession, indexPath: String): Unit = {
    compactDir(s, s"$indexPath/grams", Seq("gh"))
    compactDir(s, s"$indexPath/sizes", Seq("doc_id"))
    compactDir(s, s"$indexPath/dfs", Seq("gh"),
      transform = _.groupBy("gh").agg(sum(col("df")).as("df")))
  }

  /** Substring gram-hash set: `hashes/` re-clustered by h with the
    * cross-append duplicates dropped — semantics-preserving because the
    * probe is a left-semi membership join (present twice ≡ present
    * once; the contract `Dedup.appendSubstrIndex` trades on) */
  def compactSubstrIndex(s: SparkSession, indexPath: String): Unit =
    compactDir(s, s"$indexPath/hashes", Seq("h"),
      transform = _.distinct())

  /** winnowed substring index: identical layout and contract */
  def compactWinnowIndex(s: SparkSession, indexPath: String): Unit =
    compactSubstrIndex(s, indexPath)

  /** IVF (and semantic — same layout) index: `lists/` re-clustered and
    * re-partitioned by cid, so each cell directory returns to one file
    * per shuffle task; `codebook/` (the trained geometry) untouched */
  def compactIvfIndex(s: SparkSession, indexPath: String): Unit =
    compactDir(s, s"$indexPath/lists", Seq("cid"), partitionCols = Seq("cid"))

  def compactSemanticIndex(s: SparkSession, indexPath: String): Unit =
    compactIvfIndex(s, indexPath)

  /** IVF+PQ: `lists/` carries the code columns but the same cid
    * partitioning; `codebook/` and `pq/` (training state) untouched */
  def compactIvfPqIndex(s: SparkSession, indexPath: String): Unit =
    compactIvfIndex(s, indexPath)

  /** Bloom decontamination filter: `words/` bit_or-folded back to one
    * row per widx. This is the one family where compaction shrinks the
    * ROW count, not just the file count — appends write fresh word rows
    * per batch (`Dedup.appendBloomIndex`) and every reader merges them
    * per widx on load, so folding the log into the merged m/64 rows is
    * semantics-identical by the reader's own definition. `meta/` (the
    * m_bits/k dials) untouched. */
  def compactBloomIndex(s: SparkSession, indexPath: String): Unit =
    compactDir(s, s"$indexPath/words", Seq("widx"),
      transform = _.groupBy("widx").agg(expr("bit_or(word)").as("word")))

  /** URL frontier (`CorpusOps.appendUrlFrontier` appends without
    * dedup): `hashes/` re-clustered by h with cross-append duplicates
    * dropped — semantics-preserving because the probe is a left-anti
    * membership join (the substring-index contract) */
  def compactUrlFrontier(s: SparkSession, indexPath: String): Unit =
    compactDir(s, s"$indexPath/hashes", Seq("h"),
      transform = _.distinct())

  /** Materialized-view partial-state log
    * (`Pipeline.streamMvMaintain` appends one `batch_id=N` partition per
    * micro-batch; `Relational.readMv` merges the whole log on every
    * read): fold the log back to ONE partial-state row per group under
    * the reserved `batch_id = -1` partition. Semantics-identical by the
    * reader's own definition — readMv merges per group across all rows,
    * and the partial states are re-aggregable (sum/sum/min/max), so k
    * rows and their merge are indistinguishable to any read; pinned in
    * IndexMaintenanceSpec (compacted readMv ≡ uncompacted, then more
    * stream batches land on top and it still equals the batch twin).
    * The -1 id is safe against the stream's exactly-once discipline:
    * checkpointed batch ids are monotone non-negative, so a later
    * batch's dynamic partition overwrite can never clobber the
    * compacted row. Run it between stream generations (after a clean
    * stop): replaying an already-folded batch would re-add its rows —
    * the same quiesce discipline every marker-guarded append family
    * documents. Without compaction the log is O(batches × groups) and
    * grows without bound under a 2-second trigger; after, O(groups) +
    * the tail written since. */
  def compactMvLog(s: SparkSession, mvDir: String): Unit =
    compactMvWith(s, mvDir, df => Relational.mvMergeStates(
        df.select("o_orderpriority", "o_year", "n", "total",
          "min_price", "max_price"))
      .withColumn("batch_id", lit(-1L)))

  /** signed-log twin ([[graft.streaming.Pipeline.streamMvRetract]]'s
    * output): fold to one NET row per group. Deliberately NOT the
    * reader's n > 0 filter: a group currently netted ≤ 0 (a retraction
    * that out-ran its insert in an out-of-order CDC source) must keep
    * its negative residual in the log, or the late-arriving insert
    * would read back unretracted — readers apply the visibility filter
    * at read time, the fold only collapses rows. */
  def compactMvSignedLog(s: SparkSession, mvDir: String): Unit =
    compactMvWith(s, mvDir, df => df
      .select("o_orderpriority", "o_year", "n", "total")
      .groupBy("o_orderpriority", "o_year")
      .agg(sum(col("n")).as("n"),
        sum(col("total")).cast(org.apache.spark.sql.types.DecimalType(28, 2)).as("total"))
      .withColumn("batch_id", lit(-1L)))

  /** shared MV-log fold: record the FOLD CEILING (max live batch_id
    * folded, `_compacted_through` sidecar) so the readers can DROP a
    * replayed partition at or below it — the round-19 hazard where a
    * stream whose checkpoint lagged the compaction replayed a batch the
    * `batch_id = -1` row already contains and double-counted it. The
    * fold itself applies the SAME ceiling filter the readers do: a
    * replayed partition at or below the previous ceiling that
    * reappeared on disk must not be summed into the new `-1` row, or a
    * second compaction would double-count what the first already
    * folded. The ceiling is one 1-row maintenance-time aggregate
    * (collect allowlisted); the sidecar is read before the swap (the
    * swap replaces the directory) and re-written after with the running
    * max, so repeated compactions never lower it. The updated ceiling
    * is staged into `<dir>__compact` BEFORE the swap (beforeSwap hook),
    * so the fold and its ceiling commit atomically with the rename — a
    * crash anywhere in the pass leaves either the old dir with the old
    * ceiling or the new dir with the new one, never a folded log with
    * a missing/older ceiling (the r20-ADVICE hazard: the in-dir sidecar
    * used to be DESTROYED by the swap and recreated after, so a crash
    * in between erased the ceiling entirely and the next compaction
    * double-folded replayed partitions). The post-swap write stays as
    * a belt-and-suspenders fallback only. */
  private def compactMvWith(s: SparkSession, mvDir: String,
      fold: DataFrame => DataFrame): Unit = {
    val prev = compactedThrough(s, mvDir).getOrElse(-1L)
    // partition-directory values read back as int when they all fit —
    // cast before the max so the ceiling is a stable long
    val liveMaxRow = s.read.parquet(mvDir)
      .where(col("batch_id") > prev)
      .agg(max(col("batch_id").cast("long"))).collect()(0)
    val liveMax = if (liveMaxRow.isNullAt(0)) -1L else liveMaxRow.getLong(0)
    val ceiling = math.max(prev, liveMax)
    compactDir(s, mvDir, Seq("o_orderpriority", "o_year"),
      partitionCols = Seq("batch_id"),
      transform = df => fold(
        df.where(col("batch_id") < 0 || col("batch_id") > prev)),
      beforeSwap = tmp => writeCompactedThroughAt(s,
        new org.apache.hadoop.fs.Path(tmp, "_compacted_through"), ceiling))
    writeCompactedThrough(s, mvDir, ceiling)
  }

  /** the fold ceiling a prior MV-log compaction recorded: batches at or
    * below it are already inside the folded `batch_id = -1` row; None if
    * the log was never compacted */
  def compactedThrough(s: SparkSession, dir: String): Option[Long] = {
    val fs = hfs(s, dir)
    val p = new org.apache.hadoop.fs.Path(s"$dir/_compacted_through")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes, "UTF-8").trim.toLong)
      finally in.close()
    }
  }

  private def writeCompactedThrough(s: SparkSession, dir: String, v: Long): Unit =
    writeCompactedThroughAt(s,
      new org.apache.hadoop.fs.Path(s"$dir/_compacted_through"), v)

  private def writeCompactedThroughAt(s: SparkSession,
      file: org.apache.hadoop.fs.Path, v: Long): Unit = {
    val fs = file.getFileSystem(s.sparkContext.hadoopConfiguration)
    val out = fs.create(file, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
  }

  /** Golden table (`Resolve.writeGoldenTable` / `upsertGoldenTable` /
    * `deleteGoldenRecords`): `states/` is a per-entity partial-state
    * log with rebuild/delta visibility (readers serve the latest
    * rebuild plus later deltas) — fold it via the reader's OWN
    * resolution to one REBUILD row per surviving entity, stamped with
    * the entity's max visible seq so later monotone appends stay
    * visible; fully-retracted entities drop from the log entirely (no
    * row ≡ not served, and a later re-mint lands as a delta with no
    * rebuild row — still visible by the reader's rule). `members/`
    * folds through the same sign-netting its readers apply: net > 0
    * facts survive as one +1 row at their max seq, netted-out (deleted)
    * facts vanish. Read-equivalence by the readers' own definitions —
    * the [[compactMvLog]] argument — and the same quiesce discipline:
    * run between stream generations. */
  def compactGoldenTable(s: SparkSession, path: String): Unit = {
    compactDir(s, s"$path/states", Seq("entity_id"),
      transform = df => {
        val vis = Resolve.visibleGoldenStates(df)
        val seqs = vis.groupBy("entity_id").agg(max(col("seq")).as("seq"))
        Resolve.mergeGoldenStates(vis.drop("seq", "rebuild"))
          .where(col("n_members") > 0)
          .join(seqs, Seq("entity_id"))
          .withColumn("rebuild", lit(true))
          .select("entity_id", "n_members", "min_key", "surv_name",
            "max_bal", "total_bal_d", "seq", "rebuild")
      })
    compactDir(s, s"$path/members", Seq("entity_id"),
      transform = df =>
        df.dropDuplicates("c_custkey", "entity_id", "seq", "sign")
          .groupBy("c_custkey", "entity_id", "c_name", "c_acctbal")
          .agg(sum(col("sign")).as("net"), max(col("seq")).as("seq"))
          .where(col("net") > 0)
          .withColumn("sign", lit(1))
          .select("c_custkey", "entity_id", "c_name", "c_acctbal", "seq", "sign"))
  }

  /** Remove deleted records' blocking variants from the persisted
    * entity index — the companion maintenance pass to
    * `Resolve.deleteGoldenRecords`: an append-only parquet layout
    * cannot subtract, so deletion is a filtered rewrite with the
    * family's `__compact` swap discipline (probes keep working against
    * the live index during the slow part). Until it runs, a probe can
    * still match a deleted record; the golden upsert then finds no
    * current member mapping and mints — degraded verdicts, never
    * corrupt state.
    *
    * Writers-quiesced contract (the compactMvLog discipline, now stated
    * for this family too): run between stream generations — appends
    * racing the rewrite land in the renamed-away copy and are lost.
    * The `appended/<batchId>` replay markers that ingestLoop /
    * streamEntityAbsorb / streamGoldenApply keep under this root are
    * COPIED into the staging directory before the swap, so they commit
    * atomically with the rewrite and a post-crash replay still finds
    * its marker (the r20-ADVICE hazard: the swap used to silently drop
    * them, and a replayed batch would re-probe an index containing
    * itself and overwrite its verdicts with self-matches). */
  def deleteFromEntityIndex(s: SparkSession, delKeys: DataFrame,
      indexPath: String): Unit = {
    val keys = delKeys.select(col("c_custkey").as("key_i")).distinct()
    compactDir(s, indexPath, Seq("nat", "v"),
      transform = _.join(keys, Seq("key_i"), "left_anti"),
      beforeSwap = tmp => {
        val fs = hfs(s, indexPath)
        val markers = new org.apache.hadoop.fs.Path(s"$indexPath/appended")
        if (fs.exists(markers))
          org.apache.hadoop.fs.FileUtil.copy(fs, markers, fs,
            new org.apache.hadoop.fs.Path(tmp, "appended"),
            false /* keep source: the live dir stays intact on crash */,
            s.sparkContext.hadoopConfiguration)
      })
  }

  // ---- record deletion across the dedup/ANN index families -------------
  //
  // The GDPR/correction path for the persisted indexes, completing the
  // r20 retraction story (MV signed log, golden-table delete, entity
  // index): each family's postings for the deleted records leave via a
  // filtered rewrite under the swap discipline, and side-state follows
  // its own algebra. One-sided cap note shared with the append families:
  // deletion frees df/bucket headroom, but entries the caps TRUNCATED at
  // build/append time are not resurrected — the same bounded drift class
  // the appends document; a rebuild reclaims both.
  //
  // NOT deletable in place (rebuild-only, by math not by layout):
  //   - the Bloom decontamination filter (bit_or folds are irreversible),
  //   - the substring/winnow gram-hash SETS (membership rows carry no doc
  //     attribution — a hash may be shared by surviving docs),
  //   - the per-source theta sketch table (a sketch cannot unabsorb a
  //     row; theta a_not_b is a set operation between sketches, not a
  //     retraction of one).

  /** Delete documents from the pruned inverted gram index. `docs` must
    * carry (doc_id, text) — the TEXT is required because the `dfs/`
    * admission sidecar counts gram OCCURRENCES, and the postings alone
    * (df-capped, distinct) cannot reconstruct them: the deletion appends
    * NEGATIVE df deltas derived by the same shingle pipeline the
    * build/append use, so future appends admit against true
    * post-deletion totals (a gram whose surviving df re-enters the cap
    * admits NEW postings again; its truncated history stays absent —
    * the one-sided drift note above). `grams/` and `sizes/` rewrite
    * filtered; `dfs/` stays append-only.
    *
    * Retry discipline: the rewrites are idempotent (re-filtering removed
    * rows is a no-op) but the df append is NOT (re-running would
    * double-subtract and over-admit future appends), so the pass runs
    * rewrites first, appends the deltas LAST, and commits a marker under
    * `deleted/` keyed by the delete batch's content hash — a re-run of
    * the SAME batch redoes only the no-op rewrites. The residual window
    * is deltas-committed-but-marker-missing (one batch wide, the
    * ingestLoop class); a rebuild reclaims exactness. */
  def deleteFromGramIndex(s: SparkSession, docs: DataFrame,
      indexPath: String): Unit = {
    val keys = docs.select("doc_id").distinct().localCheckpoint()
    compactDir(s, s"$indexPath/grams", Seq("gh"),
      transform = _.join(keys, Seq("doc_id"), "left_anti"))
    compactDir(s, s"$indexPath/sizes", Seq("doc_id"),
      transform = _.join(keys, Seq("doc_id"), "left_anti"))
    // content hash of the delete batch: order-free xor over key hashes —
    // one 1-row maintenance aggregate (collect allowlisted)
    val fpRow = keys
      .agg(expr("conv(abs(coalesce(bit_xor(xxhash64(doc_id)), 0)) % 1152921504606846976, 10, 16)")
        .as("fp"), count(lit(1)).as("n")).collect()(0)
    val marker = new org.apache.hadoop.fs.Path(
      s"$indexPath/deleted/${fpRow.getString(0)}_${fpRow.getLong(1)}")
    val fs = hfs(s, indexPath)
    if (!fs.exists(marker)) {
      Dedup.batchGramDf(s, docs)
        .select(col("gh"), (-col("df")).as("df"))
        .write.mode("append").parquet(s"$indexPath/dfs")
      fs.mkdirs(marker.getParent)
      fs.createNewFile(marker)
      ()
    }
  }

  /** Delete documents from the MinHash band index: postings leave
    * `bands/`, signatures leave `sigs/` (verification would otherwise
    * still resolve a deleted doc as dup_of). Bucket-cap headroom the
    * deletion frees is NOT backfilled (one-sided, rebuild reclaims). */
  def deleteFromMinhashIndex(s: SparkSession, delIds: DataFrame,
      indexPath: String): Unit = {
    val keys = delIds.select("doc_id").distinct().localCheckpoint()
    compactDir(s, s"$indexPath/bands", Seq("band", "bh"),
      transform = _.join(keys, Seq("doc_id"), "left_anti"))
    compactDir(s, s"$indexPath/sigs", Seq("doc_id"),
      transform = _.join(keys, Seq("doc_id"), "left_anti"))
  }

  /** Delete documents from the SimHash band index (single `bands/`
    * directory; same cap note as MinHash). */
  def deleteFromSimhashIndex(s: SparkSession, delIds: DataFrame,
      indexPath: String): Unit = {
    val keys = delIds.select("doc_id").distinct().localCheckpoint()
    compactDir(s, s"$indexPath/bands", Seq("chunk", "cv"),
      transform = _.join(keys, Seq("doc_id"), "left_anti"))
  }

  /** Delete vectors from an IVF-family index (`lists/` partitioned by
    * cid — IVF, semantic, and IVF+PQ share the layout; the trained
    * codebook/pq geometry is untouched, exactly like add-after-train:
    * FAISS's remove_ids). Probes over the surviving population are
    * IDENTICAL to an index built by appending the survivors onto the
    * same codebook (spec-pinned) — deletion never changes geometry, so
    * recall properties measured at train time still hold. */
  def deleteFromIvfIndex(s: SparkSession, delIds: DataFrame,
      indexPath: String): Unit = {
    val keys = delIds.select("vec_id").distinct().localCheckpoint()
    compactDir(s, s"$indexPath/lists", Seq("cid"), partitionCols = Seq("cid"),
      transform = _.join(keys, Seq("vec_id"), "left_anti"))
  }

  def deleteFromSemanticIndex(s: SparkSession, delIds: DataFrame,
      indexPath: String): Unit =
    deleteFromIvfIndex(s, delIds, indexPath)

  def deleteFromIvfPqIndex(s: SparkSession, delIds: DataFrame,
      indexPath: String): Unit =
    deleteFromIvfIndex(s, delIds, indexPath)

  /** Delete URLs from the frontier (re-admit for crawling — the
    * frontier's probe is a left-anti membership join, so absence IS
    * re-admission). `docs` is any (doc_id, text) frame carrying the
    * URLs to forget; hashing is the frontier's own derivation. */
  def deleteFromUrlFrontier(s: SparkSession, docs: DataFrame,
      indexPath: String): Unit = {
    val keys = CorpusOps.frontierHashesOf(docs).localCheckpoint()
    compactDir(s, s"$indexPath/hashes", Seq("h"),
      transform = _.join(keys, Seq("h"), "left_anti"))
  }

  /** per-source theta sketch table (`CorpusOps.appendSourceGramSketches`
    * grows one row generation per batch): fold back to one merged row
    * per source — theta union is the readers' own merge, so matrix
    * cells are identical by construction */
  def compactSketchTable(s: SparkSession, path: String): Unit = {
    graft.functions.ThetaSketch.register(s)
    compactDir(s, path, Seq("source"),
      transform = _.groupBy("source")
        .agg(graft.functions.ThetaSketch.thetaMerge(col("sk")).as("sk")))
  }
}
