package graft.operators

import graft.util._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The composed LLM-data curation pipeline — the integration proof that
  * the individual corpus operators chain as ONE declarative DataFrame
  * without shape or determinism conflicts:
  *
  *   dedup_apply → pii_scrub → quality_filter → pack_contexts_sharded
  *
  * Order is part of the contract and makes the composition a REAL one
  * (each stage changes the next stage's inputs):
  *   - PII scrubbing rewrites text, so token counts and quality scores
  *     are computed on the SCRUBBED text;
  *   - the p25 quality cut is taken over the SURVIVING (post-dedup)
  *     population, not the raw corpus;
  *   - packing bins the docs that pass the cut, with scrubbed-text
  *     token counts.
  *
  * Scale shape is inherited from the pieces, unchanged: one propagation
  * run for the dedup clusters (memoized — shared with q_dedup_clusters /
  * q_dedup_apply in the same session), a left-anti join on doc_id, pure
  * per-row scrub + score projections, a 1-row broadcast threshold, and
  * the (lang, shard)-bounded packing windows. Catalyst fuses the per-row
  * stages into the survivor scan — no materialization between stages.
  * The DuckDB oracle replays the identical chain over `surv` (the shared
  * recursive-CTE survivor set from [[Dedup.survivorsCte]]).
  */
object Curate {

  /** survivors with PII scrubbed — stages 1+2 of the chain, shared by the
    * declared query, the funnel, and the curated-threshold derivation */
  private def curateScrubbed(s: SparkSession, dir: String): DataFrame =
    // fanOut (util.scala): the 3-regex scrub + tokenize + quality score
    // is the chain's hottest projection and runs map-side of the scored
    // checkpoint — serialized on the 1-split survivor scan at bench scale
    fanOut(Dedup.dedupSurvivors(s, dir), col("doc_id"))
      .select(col("doc_id"), col("lang"),
        TextAnalysis.scrubCol(col("text")).as("text"))

  /** (doc_id, lang, n_tok, quality) over the scrubbed survivor
    * population — the frame both the p25 statistic and the enforcement
    * cut read, so the two can never drift apart */
  private def curateScored(s: SparkSession, dir: String): DataFrame =
    curateScrubbed(s, dir)
      .select(col("doc_id"), col("lang"), col("text"), split(col("text"), " ").as("tk"))
      .select(col("doc_id"), col("lang"),
        size(col("tk")).cast(LongType).as("n_tok"),
        TextAnalysis.qualityCol(col("text"), col("tk")).as("quality"))

  /** 1-row (q_thr) frame: the p25 quality cut over the CURATED (deduped,
    * scrubbed) population — the statistics half of the serving gate.
    * Distinct from [[TextAnalysis.qualityThresholdFrame]], which cuts at
    * the raw corpus's p25: a curated threshold is what an arriving doc
    * must beat to join the corpus the trainer actually sees. */
  def curateThresholdFrame(s: SparkSession, dir: String): DataFrame =
    curateScored(s, dir).agg(r4(expr("percentile(quality, 0.25)")).as("q_thr"))

  /** stages 1-3 shared by [[curateE2e]] and [[curateFunnel]]: the scored
    * frame is `localCheckpoint`ed because THREE consumers read it (the
    * p25 statistic, the enforcement cut, and the funnel's stage-2 row)
    * and Spark re-executes shared subtrees per consumer — without the
    * materialization the survivor anti-join + scrub regex chain (the
    * pipeline's hottest projection) runs once per consumer. What
    * materializes is only the narrow (doc_id, lang, n_tok, quality)
    * projection — O(rows × ~40 B), the scrubbed text itself is never
    * stored — so the trade survives 100 TB: re-running the scrub 4× is
    * strictly worse than spilling 4 narrow columns. Returns (scored,
    * kept). */
  private def curateStages(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val scored = curateScored(s, dir).localCheckpoint()
    val thr = scored.agg(r4(expr("percentile(quality, 0.25)")).as("thr"))
    val kept = scored.crossJoin(broadcast(thr)).where(col("quality") >= col("thr"))
    (scored, kept)
  }

  /** stage 4: sharded sequence packing of the kept docs */
  private def packBins(kept: DataFrame): DataFrame = {
    val w = Window.partitionBy("lang", "shard").orderBy("doc_id")
    kept
      .withColumn("shard",
        conv(substring(md5(col("doc_id").cast(StringType)), 1, 8), 16, 10)
          .cast(LongType) % TextAnalysis.PackShards)
      .withColumn("start_off", sum(col("n_tok")).over(w) - col("n_tok"))
      .withColumn("bin", expr(s"start_off div ${TextAnalysis.PackBudget}"))
      .groupBy("lang", "shard", "bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
  }

  def curateE2e(s: SparkSession, dir: String): DataFrame = {
    val (_, kept) = curateStages(s, dir)
    packBins(kept).orderBy("lang", "shard", "bin")
  }

  val curateE2eSql: String =
    s"""${Dedup.survivorsCte},
       |scrub AS (SELECT doc_id, lang,
       |  regexp_replace(regexp_replace(regexp_replace(text,
       |    '${TextAnalysis.EmailRe}', '<EMAIL>', 'g'),
       |    '${TextAnalysis.Ipv4Re}', '<IP>', 'g'),
       |    '${TextAnalysis.PhoneRe}', '<PHONE>', 'g') AS text
       |  FROM surv),
       |scored AS (SELECT doc_id, lang, len(tk)::BIGINT AS n_tok,
       |  CAST(floor((
       |    least(1.0::DOUBLE, len(tk)::DOUBLE / 50.0::DOUBLE) * 0.4::DOUBLE
       |    + (len(list_distinct(tk))::DOUBLE / len(tk)) * 0.3::DOUBLE
       |    + least(1.0::DOUBLE, ((length(text) - (len(tk) - 1))::DOUBLE / len(tk)) / 8.0::DOUBLE) * 0.3::DOUBLE
       |    ) * 10000::DOUBLE + 0.5::DOUBLE) / 10000::DOUBLE AS DOUBLE) AS quality
       |  FROM (SELECT doc_id, lang, text, string_split(text, ' ') AS tk FROM scrub) x),
       |thr AS (SELECT CAST(round(quantile_cont(quality, 0.25), 4) AS DOUBLE) AS thr FROM scored),
       |kept AS (SELECT doc_id, lang, n_tok,
       |  ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % ${TextAnalysis.PackShards} AS shard
       |  FROM scored, thr WHERE quality >= thr),
       |o AS (SELECT lang, shard, n_tok,
       |  sum(n_tok) OVER (PARTITION BY lang, shard ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok AS start_off
       |  FROM kept)
       |SELECT lang, shard, (start_off // ${TextAnalysis.PackBudget})::BIGINT AS bin,
       |  count(*) AS n_docs, sum(n_tok)::BIGINT AS n_tokens
       |FROM o GROUP BY 1, 2, 3 ORDER BY lang, shard, bin""".stripMargin

  // ---- the serving core: curate ARRIVING documents ---------------------
  /** One micro-batch (or backfill slice) of arriving docs
    * (doc_id, text, lang, source) through the full curation gate:
    *
    *   near-dup drop vs the persisted corpus gram index
    *   → PII scrub → quality cut at the CURATED corpus's p25
    *   → temperature keep-coin at the corpus's per-source rates
    *
    * `qThr` / `rates` are the batch-derived statistics frames
    * ([[curateThresholdFrame]] / [[CorpusOps.temperatureRates]]) passed
    * in so a streaming caller persists them once across micro-batches
    * instead of re-deriving per trigger. Every stage is a stateless
    * projection or a broadcast of a ≤catalog-sized frame against the
    * arriving slice — the expensive passes (propagation, index build,
    * threshold scan) all ran batch-side. `Pipeline.streamCurateGate`
    * calls exactly this function per micro-batch, so stream ≡ batch by
    * construction. */
  def curateBatch(s: SparkSession, arriving: DataFrame, indexPath: String,
      qThr: DataFrame, rates: DataFrame): DataFrame = {
    val dupIds = Dedup.probeGramIndex(s, arriving.select("doc_id", "text"), indexPath)
      .select(col("new_id").as("doc_id")).distinct()
    arriving.join(dupIds, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"),
        TextAnalysis.scrubCol(col("text")).as("text"))
      .withColumn("tk", split(col("text"), " "))
      .select(col("doc_id"), col("lang"), col("source"), col("text"),
        size(col("tk")).cast(LongType).as("n_tok"),
        TextAnalysis.qualityCol(col("text"), col("tk")).as("quality"))
      .join(broadcast(qThr), col("quality") >= col("q_thr"))
      .join(broadcast(rates.select(col("source"), col("thr").as("t_thr"))), "source")
      .where(CorpusOps.coin(col("doc_id")) % 10000 < col("t_thr"))
      .select("doc_id", "lang", "source", "text", "n_tok", "quality")
  }

  /** convenience form deriving the statistics frames from the corpus */
  def curateBatch(s: SparkSession, arriving: DataFrame, corpusDir: String,
      indexPath: String): DataFrame =
    curateBatch(s, arriving, indexPath,
      curateThresholdFrame(s, corpusDir),
      CorpusOps.temperatureRates(s, corpusDir))

  // ---- curation-funnel observability -----------------------------------
  /** The curation funnel — unit and token counts at every stage of the
    * chain, the first dashboard an operator reads after a corpus build:
    *
    *   stage 0 `raw`             n_units = documents, tokens of raw text
    *   stage 1 `dedup_survivors` docs surviving cluster-keeper dedup
    *   stage 2 `pii_scrubbed`    same docs; tokens RE-COUNTED on the
    *                             scrubbed text (the token delta is the
    *                             scrub's footprint — phone/IP/email spans
    *                             collapse to one placeholder token)
    *   stage 3 `quality_kept`    docs at or above the p25 cut
    *   stage 4 `packed_bins`     n_units = PACKED BINS (the unit changes:
    *                             docs in, training sequences out);
    *                             n_tokens = what the trainer consumes
    *
    * A healthy build loses units monotonically through stages 0→3 and
    * conserves tokens 3→4; a stage-2 token collapse means the scrub
    * regexes are eating real text. Each stage is a single-row aggregate
    * over frames the chain already defines; the 5-row union is
    * catalog-sized. */
  def curateFunnel(s: SparkSession, dir: String): DataFrame = {
    def stage(id: Int, name: String, agg: DataFrame): DataFrame =
      agg.select(lit(id.toLong).as("stage_id"), lit(name).as("stage"),
        col("n_units"), col("n_tokens"))
    val rawToks = t(s, dir, "documents")
      .select(size(split(col("text"), " ")).cast(LongType).as("n_tok"))
    val survToks = Dedup.dedupSurvivors(s, dir)
      .select(size(split(col("text"), " ")).cast(LongType).as("n_tok"))
    // one materialized scored frame feeds stages 2, 3 (threshold + cut)
    // AND stage 4's packing — see curateStages: without the shared
    // checkpoint the scrub chain re-ran once per funnel stage
    val (scored, kept) = curateStages(s, dir)
    def cnt(d: DataFrame): DataFrame =
      d.agg(count(lit(1)).as("n_units"),
        coalesce(sum(col("n_tok")), lit(0L)).as("n_tokens"))
    stage(0, "raw", cnt(rawToks))
      .unionAll(stage(1, "dedup_survivors", cnt(survToks)))
      .unionAll(stage(2, "pii_scrubbed", cnt(scored)))
      .unionAll(stage(3, "quality_kept", cnt(kept)))
      .unionAll(stage(4, "packed_bins", packBins(kept)
        .agg(count(lit(1)).as("n_units"),
          coalesce(sum(col("n_tokens")), lit(0L)).as("n_tokens"))))
      .orderBy("stage_id")
  }

  val curateFunnelSql: String =
    s"""${Dedup.survivorsCte},
       |scrub AS (SELECT doc_id, lang,
       |  regexp_replace(regexp_replace(regexp_replace(text,
       |    '${TextAnalysis.EmailRe}', '<EMAIL>', 'g'),
       |    '${TextAnalysis.Ipv4Re}', '<IP>', 'g'),
       |    '${TextAnalysis.PhoneRe}', '<PHONE>', 'g') AS text
       |  FROM surv),
       |scored AS (SELECT doc_id, lang, len(tk)::BIGINT AS n_tok,
       |  CAST(floor((
       |    least(1.0::DOUBLE, len(tk)::DOUBLE / 50.0::DOUBLE) * 0.4::DOUBLE
       |    + (len(list_distinct(tk))::DOUBLE / len(tk)) * 0.3::DOUBLE
       |    + least(1.0::DOUBLE, ((length(text) - (len(tk) - 1))::DOUBLE / len(tk)) / 8.0::DOUBLE) * 0.3::DOUBLE
       |    ) * 10000::DOUBLE + 0.5::DOUBLE) / 10000::DOUBLE AS DOUBLE) AS quality
       |  FROM (SELECT doc_id, lang, text, string_split(text, ' ') AS tk FROM scrub) x),
       |thr AS (SELECT CAST(round(quantile_cont(quality, 0.25), 4) AS DOUBLE) AS thr FROM scored),
       |kept AS (SELECT doc_id, lang, n_tok,
       |  ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % ${TextAnalysis.PackShards} AS shard
       |  FROM scored, thr WHERE quality >= thr),
       |o AS (SELECT lang, shard, n_tok,
       |  sum(n_tok) OVER (PARTITION BY lang, shard ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok AS start_off
       |  FROM kept),
       |packed AS (SELECT lang, shard, (start_off // ${TextAnalysis.PackBudget})::BIGINT AS bin,
       |  count(*) AS n_docs, sum(n_tok)::BIGINT AS n_tokens FROM o GROUP BY 1, 2, 3)
       |SELECT 0::BIGINT AS stage_id, 'raw' AS stage, count(*)::BIGINT AS n_units,
       |  coalesce(sum(len(string_split(text, ' '))), 0)::BIGINT AS n_tokens FROM documents
       |UNION ALL SELECT 1, 'dedup_survivors', count(*),
       |  coalesce(sum(len(string_split(text, ' '))), 0)::BIGINT FROM surv
       |UNION ALL SELECT 2, 'pii_scrubbed', count(*),
       |  coalesce(sum(n_tok), 0)::BIGINT FROM scored
       |UNION ALL SELECT 3, 'quality_kept', count(*),
       |  coalesce(sum(n_tok), 0)::BIGINT FROM kept
       |UNION ALL SELECT 4, 'packed_bins', count(*),
       |  coalesce(sum(n_tokens), 0)::BIGINT FROM packed
       |ORDER BY stage_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_curate_e2e" -> curateE2e _,
    "q_curate_funnel" -> curateFunnel _)

  val oracle: Map[String, String] = Map(
    "q_curate_e2e" -> curateE2eSql,
    "q_curate_funnel" -> curateFunnelSql)
}
