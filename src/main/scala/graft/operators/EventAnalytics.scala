package graft.operators

import graft.util._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-sequence analytics — the ClickHouse `windowFunnel` / `retention`
  * family the reference's NOC/SIEM users run over `mikrotik_logs`-shaped
  * data (README.md:42-50), expressed over `events`.
  *
  * Scale design: both operators are chains of per-user equi-joins and hash
  * aggregations — no windows over unbounded history, no cross products;
  * each stage shuffles once on user_id.
  */
object EventAnalytics {

  /** 3-stage funnel signup → view → purchase: earliest completion time of
    * each stage with strict event-time ordering between stages.
    *
    * SINGLE PASS: one scan, one shuffle on user_id, per-user stage
    * extraction over the collected (ts, type) list with higher-order
    * functions. The join-chain formulation (stage N filtered ⋈ stage N−1)
    * re-scans the events table once per stage — 4 scans of the fact table
    * at 100 TB; per-user event lists are bounded, so collect_list state is
    * safe. */
  def funnel(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(col("user_id"), col("event_type"), col("ts_us"))
      .groupBy("user_id")
      .agg(collect_list(struct(col("ts_us"), col("event_type"))).as("evs"))
      .withColumn("s1_us", expr(
        "array_min(transform(filter(evs, e -> e.event_type = 'signup'), e -> e.ts_us))"))
      .withColumn("s2_us", expr(
        "array_min(transform(filter(evs, e -> e.event_type = 'view' AND s1_us IS NOT NULL AND e.ts_us > s1_us), e -> e.ts_us))"))
      .withColumn("s3_us", expr(
        "array_min(transform(filter(evs, e -> e.event_type = 'purchase' AND s2_us IS NOT NULL AND e.ts_us > s2_us), e -> e.ts_us))"))
      .select(col("user_id"), col("s1_us"), col("s2_us"), col("s3_us"),
        (when(col("s3_us").isNotNull, 3)
          .when(col("s2_us").isNotNull, 2)
          .when(col("s1_us").isNotNull, 1)
          .otherwise(0)).as("depth"))
      .orderBy("user_id")

  val funnelSql =
    """WITH ev AS (SELECT user_id, event_type, epoch_us(ts::TIMESTAMP) AS ts_us FROM events),
      |s1 AS (SELECT user_id, min(ts_us) AS s1_us FROM ev WHERE event_type = 'signup' GROUP BY 1),
      |s2 AS (SELECT ev.user_id, min(ts_us) AS s2_us FROM ev JOIN s1 USING (user_id)
      |       WHERE event_type = 'view' AND ts_us > s1_us GROUP BY 1),
      |s3 AS (SELECT ev.user_id, min(ts_us) AS s3_us FROM ev JOIN s2 USING (user_id)
      |       WHERE event_type = 'purchase' AND ts_us > s2_us GROUP BY 1)
      |SELECT u.user_id, s1.s1_us, s2.s2_us, s3.s3_us,
      |  CASE WHEN s3.s3_us IS NOT NULL THEN 3 WHEN s2.s2_us IS NOT NULL THEN 2
      |       WHEN s1.s1_us IS NOT NULL THEN 1 ELSE 0 END AS depth
      |FROM (SELECT DISTINCT user_id FROM ev) u
      |LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
      |ORDER BY u.user_id""".stripMargin

  /** cohort retention grid: users by (first-active day, day offset) */
  def retention(s: SparkSession, dir: String): DataFrame = {
    val userDays = events(s, dir)
      .select(col("user_id"), to_date(date_trunc("day", col("ts"))).as("day"))
      .distinct()
    val cohorts = userDays.groupBy("user_id").agg(min(col("day")).as("cohort"))
    userDays.join(cohorts, "user_id")
      .groupBy(col("cohort"), datediff(col("day"), col("cohort")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort", "day_offset")
  }

  val retentionSql =
    """WITH ud AS (SELECT DISTINCT user_id, date_trunc('day', ts::TIMESTAMP)::DATE AS day FROM events),
      |c AS (SELECT user_id, min(day) AS cohort FROM ud GROUP BY 1)
      |SELECT cohort, date_diff('day', cohort, day) AS day_offset,
      |       count(DISTINCT ud.user_id) AS n_users
      |FROM ud JOIN c USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** per-type modal user (ClickHouse `topK(1)`/`anyHeavy` analog, exact):
    * the heaviest user per event type, tie → smallest user_id. Two-phase:
    * (type, user) count groupBy (map-side combined) then a per-type
    * row_number over the counts — standard exact-mode shape; at sketch
    * scale the TopKAggregator (q_udaf_topk) is the bounded-state variant. */
  def aggMode(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    events(s, dir)
      .groupBy("event_type", "user_id").agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type").orderBy(col("n").desc, col("user_id").asc)))
      .where(col("rn") === 1)
      .select(col("event_type"), col("user_id").as("modal_user"), col("n"))
      .orderBy("event_type")
  }

  val aggModeSql =
    """SELECT event_type, user_id AS modal_user, n FROM (
      |  SELECT event_type, user_id, count(*) AS n,
      |    row_number() OVER (PARTITION BY event_type ORDER BY count(*) DESC, user_id ASC) AS rn
      |  FROM events GROUP BY event_type, user_id) x
      |WHERE rn = 1 ORDER BY event_type""".stripMargin

  /** top event-sequence paths (ClickHouse `sequenceCount`-family analog
    * for exploratory path analysis): each user's event stream in
    * (ts, event_id) total order yields its 3-event windows via lead();
    * paths are counted globally and the top 20 returned. Scale shape:
    * ONE window partitioned by user_id (scaling key — a user's history
    * is bounded), then a map-side-combined groupBy on path (bounded by
    * |event_type|³ distinct keys) + TakeOrderedAndProject. */
  def eventTrigrams(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    events(s, dir).select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"))
      .withColumn("e2", lead("event_type", 1).over(w))
      .withColumn("e3", lead("event_type", 2).over(w))
      .where(col("e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(20)
  }

  val eventTrigramsSql =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) AS ts_us, event_type FROM events),
      |t AS (
      |  SELECT event_type,
      |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS e2,
      |    lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS e3
      |  FROM e)
      |SELECT event_type || '>' || e2 || '>' || e3 AS path, count(*)::BIGINT AS n
      |FROM t WHERE e3 IS NOT NULL
      |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin

  /** hourly spike detection (the alerting query a NOC runs on the
    * reference's table): per-type hourly counts z-scored against that
    * type's own distribution. Determinism: the moments (cnt, Σn, Σn²)
    * are exact BIGINTs, and mean/σ/z derive from them through an
    * expression tree mirrored verbatim in the oracle — identical doubles
    * on both engines; σ is clamped at 0 (float cancellation could give
    * sqrt a tiny negative) and σ=0 groups emit z=0 rather than NaN
    * (cross-engine NaN handling is unspecifiable). Scale shape: one
    * groupBy on (event_type, hour) — a scaling key — then a broadcast
    * join of the |event_type|-row stats frame back onto it. */
  def eventAnomaly(s: SparkSession, dir: String): DataFrame = {
    val D = org.apache.spark.sql.types.DoubleType
    val hourly = events(s, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
    val stats = hourly.groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sum(col("n")).as("s1"),
        sum(col("n") * col("n")).as("s2"))
    val mean = col("s1").cast(D) / col("cnt").cast(D)
    val sd = sqrt(greatest(lit(0d),
      (col("s2").cast(D) - col("s1").cast(D) * col("s1").cast(D) / col("cnt").cast(D))
        / col("cnt").cast(D)))
    hourly.join(broadcast(stats), "event_type")
      .select(col("event_type"), col("hour"), col("n"),
        r4f(when(sd === 0d, 0d).otherwise((col("n").cast(D) - mean) / sd)).as("z"))
      .withColumn("is_spike", abs(col("z")) >= 2.0d)
      .orderBy("event_type", "hour")
  }

  val eventAnomalySql =
    """WITH h AS (
      |  SELECT event_type, date_trunc('hour', ts::TIMESTAMP) AS hour, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |st AS (
      |  SELECT event_type, count(*) AS cnt, sum(n)::BIGINT AS s1, sum(n*n)::BIGINT AS s2
      |  FROM h GROUP BY 1),
      |j AS (
      |  SELECT h.event_type, hour, n,
      |    s1::DOUBLE / cnt::DOUBLE AS mean,
      |    sqrt(greatest(0::DOUBLE,
      |      (s2::DOUBLE - s1::DOUBLE * s1::DOUBLE / cnt::DOUBLE) / cnt::DOUBLE)) AS sd
      |  FROM h JOIN st USING (event_type)),
      |z AS (
      |  SELECT event_type, hour, n,
      |    CAST(floor((CASE WHEN sd = 0::DOUBLE THEN 0::DOUBLE
      |                     ELSE (n::DOUBLE - mean) / sd END)
      |      * 10000::DOUBLE + 0.5::DOUBLE) / 10000::DOUBLE AS DOUBLE) AS z
      |  FROM j)
      |SELECT event_type, hour, n, z, abs(z) >= 2::DOUBLE AS is_spike
      |FROM z ORDER BY event_type, hour""".stripMargin

  /** Top SESSION-level navigation paths — the whole-journey complement
    * to [[eventTrigrams]]'s fixed-length windows: each user's event
    * stream splits into sessions at [[PathGapMinutes]]-minute
    * inactivity gaps (the lag + cumulative-break-sum idiom — the batch
    * twin of `session_window`), each session's first [[PathMaxEvents]]
    * event types join into an ordered path string, and the global
    * top-[[PathTopK]] paths rank by session count (ties → path asc).
    * The product/SIEM question answered: "what do journeys actually
    * look like end-to-end, and which flows dominate?"
    *
    * Scale shape: every window partitions on user_id — a data-sized
    * key — and the per-session collect is capped at PathMaxEvents rows
    * BEFORE aggregation (the rn filter), so state is bounded; the final
    * count is a map-side-combined groupBy on the path string and a
    * TakeOrdered top-k, never a global sort. */
  val PathGapMinutes = 30
  val PathMaxEvents = 5
  val PathTopK = 20

  def eventPaths(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wu = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(wu))
      .withColumn("brk",
        when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") > PathGapMinutes * 60L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("sess", sum(col("brk")).over(wu))
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id", "sess").orderBy(col("ts_us"), col("event_id"))))
      .where(col("rn") <= PathMaxEvents)
      .groupBy("user_id", "sess")
      .agg(expr("concat_ws('>', transform(sort_array(collect_list(struct(rn, event_type))), x -> x.event_type))").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(PathTopK)
  }

  val eventPathsSql: String =
    s"""WITH ev AS (
       |  SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) AS ts_us, event_type
       |  FROM events),
       |b AS (
       |  SELECT *,
       |    CASE WHEN lag(ts_us) OVER w IS NULL
       |      OR ts_us - lag(ts_us) OVER w > ${PathGapMinutes} * 60 * 1000000 THEN 1 ELSE 0 END AS brk
       |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
       |se AS (
       |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS sess
       |  FROM b),
       |rn AS (
       |  SELECT *, row_number() OVER (PARTITION BY user_id, sess ORDER BY ts_us, event_id) AS rn
       |  FROM se),
       |paths AS (
       |  SELECT user_id, sess, string_agg(event_type, '>' ORDER BY rn) AS path
       |  FROM rn WHERE rn <= ${PathMaxEvents} GROUP BY 1, 2)
       |SELECT path, count(*) AS n_sessions FROM paths GROUP BY 1
       |ORDER BY n_sessions DESC, path ASC LIMIT ${PathTopK}""".stripMargin

  /** SCD-type-2 history build (Kimball slowly-changing dimension): each
    * user's event_type stream collapses into validity periods — one row
    * per RUN of consecutive equal values, [valid_from_us, valid_to_us)
    * half-open, valid_to NULL on the current (open) period. The classic
    * warehouse shape done Spark-native: change flags via lag, period ids
    * via running sum, one groupBy per (user, period), then lead over the
    * period starts to close each interval — every window partitions on
    * user_id (a scaling key), so no single-task stage at any history
    * size. Ties broken by event_id so both engines order identically. */
  def scd2(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val we = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val periods = events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts_us"))
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(we).isNull ||
          lag(col("event_type"), 1).over(we) =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("period", sum(col("chg")).over(we))
      .groupBy(col("user_id"), col("period"))
      .agg(min(col("event_type")).as("event_type"),
        min(col("ts_us")).as("valid_from_us"),
        count(lit(1)).as("n_events"))
    // the closing window ties on (valid_from_us, period): two periods can
    // share a valid_from_us when a user has equal-ts events of different
    // types, and period is the deterministic event_id-derived sequence —
    // without it the lead assignment is engine-dependent on such ties
    val wp = Window.partitionBy("user_id").orderBy("valid_from_us", "period")
    periods
      .select(col("user_id"), col("event_type"), col("valid_from_us"),
        lead(col("valid_from_us"), 1).over(wp).as("valid_to_us"),
        col("n_events"))
      .orderBy("user_id", "valid_from_us")
  }

  val scd2Sql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts::TIMESTAMP) AS ts_us
      |  FROM events),
      |c AS (
      |  SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
      |      OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
      |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |p AS (
      |  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS period
      |  FROM c),
      |periods AS (
      |  SELECT user_id, period, min(event_type) AS event_type,
      |    min(ts_us) AS valid_from_us, count(*) AS n_events
      |  FROM p GROUP BY 1, 2)
      |SELECT user_id, event_type, valid_from_us,
      |  lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY valid_from_us, period) AS valid_to_us,
      |  n_events
      |FROM periods ORDER BY user_id, valid_from_us""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_funnel" -> funnel _,
    "q_retention" -> retention _,
    "q_event_trigrams" -> eventTrigrams _,
    "q_event_paths" -> eventPaths _,
    "q_event_anomaly" -> eventAnomaly _,
    "q_scd2" -> scd2 _,
    "q_agg_mode" -> aggMode _)

  val oracle: Map[String, String] = Map(
    "q_funnel" -> funnelSql,
    "q_retention" -> retentionSql,
    "q_event_trigrams" -> eventTrigramsSql,
    "q_event_paths" -> eventPathsSql,
    "q_event_anomaly" -> eventAnomalySql,
    "q_scd2" -> scd2Sql,
    "q_agg_mode" -> aggModeSql)
}
