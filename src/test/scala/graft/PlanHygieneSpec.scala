package graft

import org.scalatest.funsuite.AnyFunSuite

/** Global plan hygiene over EVERY declared query — the anti-patterns that
  * kill a 100 TB run must be absent everywhere, not only in the operators
  * PlanSpec pins individually. Queries are planned, never executed, so the
  * sweep stays cheap and catches a plan-shape regression in ANY operator
  * the moment it appears.
  *
  * Unbounded-join discipline: a CartesianProduct or a nested-loop join is
  * O(|L|·|R|) work — acceptable only where one side is bounded by
  * construction (a broadcast probe row, a K-row codebook, a one-row count,
  * a small distinct dimension) or where the operator is *declared*
  * cartesian. Those appear in explicit allowlists; everything else fails.
  */
class PlanHygieneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private lazy val plans: Map[String, String] =
    SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, dir).queryExecution.executedPlan.toString
    }

  test("no ScalaUDF or Python eval anywhere: expressions stay inside codegen") {
    val offenders = plans.collect {
      case (n, p) if p.contains("ScalaUDF") || p.toLowerCase.contains("batchevalpython") => n
    }
    assert(offenders.isEmpty, s"UDF leaked into: ${offenders.toSeq.sorted}")
  }

  test("CartesianProduct only in the declared cartesian operator") {
    val allowed = Set("q_join_cross")
    val offenders = plans.collect {
      case (n, p) if p.contains("CartesianProduct") && !allowed(n) => n
    }
    assert(offenders.isEmpty,
      s"unexpected cartesian join in: ${offenders.toSeq.sorted}")
  }

  test("nested-loop joins only where one side is bounded by construction") {
    val allowed = Set(
      "q_join_cross",       // declared cartesian over small dims
      "q_join_theta_range", // declared non-equi range join, bounded dims
      "q_join_asof",        // as-of range match, bounded build side
      "q_sim_cosine",       // broadcast one-row probe vector
      "q_dedup_embedding",  // broadcast ≤100-row probe sample
      "q_sim_knn",          // broadcast ≤16-row probe sample (KnnProbes)
      "q_knn_classify",     // same broadcast ≤16-row probe sample (KnnProbes)
      "q_embed_project",    // broadcast 16-row JL sign-matrix frame
      "q_label_centroids",  // L-row centroid self-join (L = label count, bounded)
      "q_sim_ann_lsh",      // broadcast probe bucket
      "q_sim_ann_ivf",      // broadcast K-row codebook + one-row probe
      "q_sim_ann_pq",       // broadcast one-row ADC tables + one-row probe
      "q_sim_ann_ivfpq",    // broadcast codebook + ADC tables + one-row probe
      "q_embed_cluster_stats", // broadcast K-row codebook
      "q_embed_outliers",   // same broadcast K-row codebook + K-row moments
      "q_dedup_semantic",   // broadcast K-row codebook (pair join itself is the cid equi-join)
      "q_dedup_semantic_apply", // same codebook broadcast inside the embedded verdict frame
      "q_dedup_semantic_incremental", // broadcast K-row index codebook for probe assignment
      "q_source_overlap_theta", // |S|-row sketch self-join (source catalog, bounded)
      "q_source_overlap_persisted", // same |S|-row self-join over the at-rest sketch table
      "q_tfidf_top",        // broadcast one-row corpus count N
      "q_sample_temperature", // broadcast one-row corpus doc count
      "q_assemble_e2e",     // same one-row train-population count, composed
      "q_vocab_coverage",   // broadcast one-row occurrence/type totals
      "q_quality_unigram",  // broadcast one-row corpus occurrence total
      "q_quality_filter",   // broadcast one-row p25 threshold
      "q_corpus_mix",       // broadcast one-row global token total
      "q_mix_plan",         // same one-row (tot, wtot) totals frame
      "q_mix_plan_apply",   // same totals frame inside the plan side
      "q_curate_e2e",       // same one-row p25 threshold inside the composed pipeline
      "q_curate_funnel",    // same one-row p25 threshold, funnel accounting stages
      "q_dedup_eval",       // three 1-row metric aggregates broadcast-crossed
      "q_entity_blocking_eval", // two 1-row metric aggregates broadcast-crossed
      "q_dedup_simhash_eval", // three 1-row metric aggregates broadcast-crossed
      "q_dedup_minhash_incr_recall", // two 1-row metric aggregates broadcast-crossed
      "q_dedup_simhash_incr_recall", // two 1-row metric aggregates broadcast-crossed
      "q_dedup_substring_winnow_eval", // four 1-row metric aggregates broadcast-crossed
      "q_dedup_substring_residual", // two 1-row metric aggregates broadcast-crossed
      "q_skew_stats",       // broadcast one-row total/key-count frame
      "q_sim_eval",         // five 1-row metric aggregates broadcast-crossed
      "q_sim_eval_pq",      // per-path 1-row metric aggregates broadcast-crossed
      "q_gap_fill",         // dense (bucket × type) domain, small distinct dim
      "q_scalar_subquery",  // uncorrelated scalar compared per row
      "q_win_ntile_dist",          // broadcast one-row percentile bounds
      "q_win_dist_bucketed",       // broadcast one-row percentile bounds
      "q_win_range_frame_bucketed", // broadcast one-row percentile bounds
      "q_win_ntile",               // serves winNtileDist since r20 (same bounds broadcast)
      "q_win_dist",                // serves winDistBucketed since r20
      "q_win_range_frame")         // serves winRangeFrameBucketed since r20
    val offenders = plans.collect {
      case (n, p) if p.contains("BroadcastNestedLoopJoin") && !allowed(n) => n
    }
    assert(offenders.isEmpty,
      s"unexpected nested-loop join in: ${offenders.toSeq.sorted}")
  }

  /** The one-task-window rule. A WindowExec whose partition spec is empty,
    * or references ONLY fixed-cardinality dimension columns, runs as a
    * handful of tasks no matter how big the data — the canonical 100 TB
    * scale-killer. Exception: a window whose input subtree already passed
    * through an aggregation operates on a bounded (group-count-sized)
    * relation, where a low-cardinality key is fine (e.g. the per-(status,
    * bkt) offset windows inside the bucketed twins, or per-group mode over
    * two-phase counts). Round 20: the three window anchors that used to be
    * allowlisted here (q_win_ntile / q_win_dist / q_win_range_frame) now
    * SERVE their distributed twins, so no declared key plans a naive
    * window anymore — the naive forms survive only as direct-call parity
    * references, pinned naive below. q_pack_contexts stays allowlisted BY
    * NAME (its greedy packing is sequential by definition; the sharded
    * twin is the scale path) — and the allowlist is checked both ways, so
    * a fixed twin can't silently keep its exemption. */
  private val declaredNaiveTwins = Set("q_pack_contexts")

  /** columns whose distinct count is a constant of the schema, not of the
    * data size: partitioning raw fact rows by only these pins whole-table
    * work onto ≤ |domain| tasks */
  private val fixedCardinalityCols = Set(
    "o_orderstatus", "o_orderpriority", "l_returnflag", "l_linestatus",
    "lang", "event_type", "severity", "r_name", "n_name", "status")

  private def naiveWindows(name: String): Seq[String] =
    naiveWindowsOf(name, SparkEntry.queries(name)(spark, dir))

  private def naiveWindowsOf(name: String,
      df: org.apache.spark.sql.DataFrame): Seq[String] = {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
    // sparkPlan (pre-AQE) is a plain tree — executedPlan wraps everything
    // in AdaptiveSparkPlanExec, a leaf that collect() can't see through
    val plan = df.queryExecution.sparkPlan
    plan.collect {
      case w: WindowExec =>
        val refs = w.partitionSpec.flatMap(_.references.toSeq.map(_.name)).distinct
        val boundedInput = w.child.collect {
          case a: HashAggregateExec => a
          case a: ObjectHashAggregateExec => a
          case a: SortAggregateExec => a
        }.nonEmpty
        if (!boundedInput && (refs.isEmpty || refs.forall(fixedCardinalityCols)))
          Some(s"$name: Window over raw rows partitioned by [${refs.mkString(",")}]")
        else None
    }.flatten
  }

  test("no unpartitioned/fixed-cardinality window over raw rows outside the declared naive twins") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(declaredNaiveTwins)
      .flatMap(naiveWindows)
    assert(offenders.isEmpty,
      s"one-task-at-scale window in: $offenders — partition on a scaling key " +
        "or register a distributed twin and allowlist the naive form")
  }

  test("declared naive twins still trip the window rule (allowlist stays honest)") {
    val stale = declaredNaiveTwins.toSeq.sorted.filter(naiveWindows(_).isEmpty)
    assert(stale.isEmpty,
      s"allowlisted but no longer naive — remove from declaredNaiveTwins: $stale")
  }

  test("the direct-call naive window parity references are still naive (pins stay meaningful)") {
    // PlanSpec pins each distributed twin row-identical to its naive form;
    // those pins only mean something while the naive forms really do plan
    // the single-task window they exist to demonstrate
    val refs = Seq(
      "winNtile" -> graft.operators.Windows.winNtile(spark, dir),
      "winDist" -> graft.operators.Windows.winDist(spark, dir),
      "winRangeFrame" -> graft.operators.Windows.winRangeFrame(spark, dir))
    val fixed = refs.collect { case (n, df) if naiveWindowsOf(n, df).isEmpty => n }
    assert(fixed.isEmpty,
      s"naive parity references no longer plan a naive window: $fixed")
  }

  test("q_tfidf_top: df comes from an aggregate, never a tok-partitioned window") {
    // the round-5 skew fix: count(*) OVER (PARTITION BY tok) put ~n_docs
    // rows of every stop-word on ONE window task; df must stay a
    // groupBy(tok) + equi-join. A doc_id-partitioned window (top-3 per
    // doc) is fine — doc_id scales and partitions are tiny.
    import org.apache.spark.sql.execution.window.WindowExec
    val plan = SparkEntry.queries("q_tfidf_top")(spark, dir).queryExecution.sparkPlan
    val tokWindows = plan.collect {
      case w: WindowExec
        if w.partitionSpec.flatMap(_.references.toSeq.map(_.name)).contains("tok") => w
    }
    assert(tokWindows.isEmpty,
      "df skew regression: WindowExec partitioned on tok is back in q_tfidf_top")
  }

  test("every file-backed query plans a recognizable file scan (no RDD fallback)") {
    // json/csv/orc joined the recognizer with q_scan_text_formats — they
    // are FileSourceScan nodes like parquet, exactly what the rule wants
    // to see instead of an opaque RDD leaf
    val scans = Seq("Scan parquet", "Scan json", "Scan csv", "Scan orc",
      "LocalTableScan", "Scan ExistingRDD", "RowDataSourceScan")
    val offenders = plans.collect {
      case (n, p) if !scans.exists(p.contains) => n
    }
    assert(offenders.isEmpty, s"no recognizable scan in: ${offenders.toSeq.sorted}")
  }
}
