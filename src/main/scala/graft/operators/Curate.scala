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

  def curateE2e(s: SparkSession, dir: String): DataFrame = {
    // stage 1+2: surviving corpus, scrubbed
    val scrubbed = Dedup.dedupSurvivors(s, dir)
      .select(col("doc_id"), col("lang"),
        TextAnalysis.scrubCol(col("text")).as("text"))
    // stage 3: quality over scrubbed text, p25 cut from the same population
    val scored = scrubbed
      .select(col("doc_id"), col("lang"), col("text"), split(col("text"), " ").as("tk"))
      .select(col("doc_id"), col("lang"),
        size(col("tk")).cast(LongType).as("n_tok"),
        TextAnalysis.qualityCol(col("text"), col("tk")).as("quality"))
    val thr = scored.agg(r4(expr("percentile(quality, 0.25)")).as("thr"))
    val kept = scored.crossJoin(broadcast(thr)).where(col("quality") >= col("thr"))
    // stage 4: sharded sequence packing of what remains
    val w = Window.partitionBy("lang", "shard").orderBy("doc_id")
    kept
      .withColumn("shard",
        conv(substring(md5(col("doc_id").cast(StringType)), 1, 8), 16, 10)
          .cast(LongType) % TextAnalysis.PackShards)
      .withColumn("start_off", sum(col("n_tok")).over(w) - col("n_tok"))
      .withColumn("bin", expr(s"start_off div ${TextAnalysis.PackBudget}"))
      .groupBy("lang", "shard", "bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .orderBy("lang", "shard", "bin")
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

  val queries: Map[String, Q] = Map(
    "q_curate_e2e" -> curateE2e _)

  val oracle: Map[String, String] = Map(
    "q_curate_e2e" -> curateE2eSql)
}
