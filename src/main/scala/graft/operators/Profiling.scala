package graft.operators

import graft.util._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pipeline-health profiling operators — the diagnostics an operator runs
  * BEFORE committing a 100 TB job to a plan shape:
  *
  *   - [[skewStats]]: per-join-key mass concentration. The top-key share
  *     is the number that decides between a plain shuffle join, AQE's
  *     skew split, and an explicit salted join ([[Skew.saltedJoin]]) —
  *     measured here on the same synthetically-skewed key
  *     `q_join_skew_salted` joins on, so the report and the mitigation
  *     pair up as diagnose → treat.
  *   - [[expectationsReport]]: declared-constraint validation (the
  *     Deequ/Great-Expectations pattern) over the documents table in ONE
  *     aggregation pass — null keys, duplicate keys, domain violations,
  *     empty text, metadata drift all counted map-side; the only extra
  *     shuffle is the exact distinct for uniqueness (the approx twin at
  *     scale is the `q_agg_approx_distinct` HLL family).
  */
object Profiling {

  // ---- join-key skew diagnostic ---------------------------------------
  val SkewTopK = 10

  /** Top-[[SkewTopK]] keys by row mass on `q_join_skew_salted`'s join
    * key, with each key's share of total rows and its skew factor
    * (mass vs the all-keys-equal mean). One map-side-combined groupBy on
    * the scaling key, a 1-row broadcast of the totals, and a bounded
    * top-K — no sort of the full key space. skew ≈ 1 everywhere means a
    * plain shuffle join balances; a double-digit top-1 skew is the
    * go-signal for [[Skew.saltedJoin]] (at this corpus's synthetic skew,
    * key 7 carries ~36% of all rows at ~9× the mean). */
  def skewStats(s: SparkSession, dir: String): DataFrame = {
    val counts = t(s, dir, "lineitem")
      .select(when(col("l_partkey") % 3 === 0, lit(7))
        .otherwise(col("l_partkey") % 25).cast(LongType).as("k"))
      .groupBy("k").agg(count(lit(1)).as("n"))
    val tot = counts.agg(
      coalesce(sum(col("n")), lit(0L)).as("tot_rows"),
      count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(tot))
      .select(col("k"), col("n"),
        when(col("tot_rows") > 0,
          r4(col("n").cast(DoubleType) / col("tot_rows"))).as("share"),
        when(col("tot_rows") > 0,
          r4(col("n").cast(DoubleType) * col("n_keys") / col("tot_rows"))).as("skew"))
      .orderBy(col("n").desc, col("k"))
      .limit(SkewTopK)
  }

  val skewStatsSql: String =
    s"""WITH c AS (
       |  SELECT CASE WHEN l_partkey % 3 = 0 THEN 7 ELSE l_partkey % 25 END AS k,
       |    count(*) AS n
       |  FROM lineitem GROUP BY 1),
       |t AS (SELECT coalesce(sum(n), 0) AS tot_rows, count(*) AS n_keys FROM c)
       |SELECT k::BIGINT AS k, n::BIGINT AS n,
       |  CASE WHEN tot_rows > 0
       |    THEN CAST(round(n::DOUBLE / tot_rows, 4) AS DOUBLE) END AS share,
       |  CASE WHEN tot_rows > 0
       |    THEN CAST(round(n::DOUBLE * n_keys / tot_rows, 4) AS DOUBLE) END AS skew
       |FROM c, t ORDER BY n DESC, k LIMIT $SkewTopK""".stripMargin

  // ---- declared-constraint validation ---------------------------------
  /** the lang values the corpus contract admits */
  val LangDomain: Seq[String] = Seq("de", "en", "es", "fr", "zh")

  /** Constraint report over any (doc_id, text, lang, n_chars) frame:
    * one row per declared check with violation count, rate, and verdict.
    * All conditional counts ride ONE aggregation (map-side combined);
    * uniqueness adds the exact-distinct expand. Reusable on arbitrary
    * frames (the spec feeds it a dirty fixture to prove detection);
    * [[expectations]] binds it to the documents table. */
  def expectationsReport(df: DataFrame): DataFrame = {
    def v(c: Column): Column = coalesce(sum(when(c, 1L).otherwise(0L)), lit(0L))
    val agg = df.agg(
      count(lit(1)).as("n_rows"),
      v(col("doc_id").isNull).as("v_id_null"),
      (count(lit(1)) - countDistinct(col("doc_id"))).as("v_id_dup"),
      v(col("lang").isNull || !col("lang").isin(LangDomain: _*)).as("v_lang"),
      v(col("text").isNull || length(col("text")) === 0).as("v_text_empty"),
      v(col("n_chars").isNull || col("n_chars") =!= length(col("text"))).as("v_chars"))
    def row(name: String, c: String) =
      struct(lit(name).as("check_name"), col(c).as("n_violations"))
    agg.select(col("n_rows"), explode(array(
        row("doc_id_not_null", "v_id_null"),
        row("doc_id_unique", "v_id_dup"),
        row("lang_in_domain", "v_lang"),
        row("n_chars_consistent", "v_chars"),
        row("text_not_empty", "v_text_empty"))).as("c"))
      .select(col("c.check_name").as("check_name"),
        col("c.n_violations").as("n_violations"),
        when(col("n_rows") > 0,
          r4(col("c.n_violations").cast(DoubleType) / col("n_rows"))).as("viol_rate"),
        (col("c.n_violations") === 0).as("passed"))
      .orderBy("check_name")
  }

  def expectations(s: SparkSession, dir: String): DataFrame =
    expectationsReport(t(s, dir, "documents"))

  val expectationsSql: String =
    s"""WITH a AS (SELECT count(*) AS n_rows,
       |  coalesce(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END), 0) AS v_id_null,
       |  count(*) - count(DISTINCT doc_id) AS v_id_dup,
       |  coalesce(sum(CASE WHEN lang IS NULL
       |    OR lang NOT IN (${LangDomain.map(l => s"'$l'").mkString(", ")})
       |    THEN 1 ELSE 0 END), 0) AS v_lang,
       |  coalesce(sum(CASE WHEN text IS NULL OR length(text) = 0
       |    THEN 1 ELSE 0 END), 0) AS v_text_empty,
       |  coalesce(sum(CASE WHEN n_chars IS NULL OR n_chars <> length(text)
       |    THEN 1 ELSE 0 END), 0) AS v_chars
       |  FROM documents),
       |r AS (
       |  SELECT 'doc_id_not_null' AS check_name, v_id_null AS n FROM a
       |  UNION ALL SELECT 'doc_id_unique', v_id_dup FROM a
       |  UNION ALL SELECT 'lang_in_domain', v_lang FROM a
       |  UNION ALL SELECT 'n_chars_consistent', v_chars FROM a
       |  UNION ALL SELECT 'text_not_empty', v_text_empty FROM a)
       |SELECT check_name, n::BIGINT AS n_violations,
       |  CASE WHEN n_rows > 0
       |    THEN CAST(round(n::DOUBLE / n_rows, 4) AS DOUBLE) END AS viol_rate,
       |  (n = 0) AS passed
       |FROM r, a ORDER BY check_name""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_skew_stats" -> skewStats _,
    "q_expectations" -> expectations _)

  val oracle: Map[String, String] = Map(
    "q_skew_stats" -> skewStatsSql,
    "q_expectations" -> expectationsSql)
}
