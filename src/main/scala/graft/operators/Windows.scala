package graft.operators

import graft.util._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2 B.5 window functions + B.9 batch twins of the streaming
  * windows (tumbling/sliding/session).
  *
  * Scale notes: every window partitions on a real key (customer/user) so
  * state is distributed; frames are pinned ROWS (not default RANGE) wherever
  * a running value is computed, and order keys always carry a unique
  * tie-break so cross-engine row order is total. Session windows use the
  * lag+cumulative-sum gaps-and-islands form — one shuffle on user_id.
  */
object Windows {

  def winRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"), rank().over(w).as("rk"), dense_rank().over(w).as("drk"))
      .where(col("rn") <= 5)
      .orderBy("o_custkey", "rn")
  }

  val winRankSql =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn, rk, drk FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER w AS rn, rank() OVER w AS rk, dense_rank() OVER w AS drk
      |  FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
      |) x WHERE rn <= 5 ORDER BY o_custkey, rn""".stripMargin

  /** inter-event gap per user in µs (lag over event time) */
  def winLagLead(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us").asc, col("event_id").asc)
    events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts_us"),
        (col("ts_us") - lag(col("ts_us"), 1).over(w)).as("gap_us"),
        lead(col("event_type"), 1).over(w).as("next_type"))
      .orderBy("user_id", "ts_us", "event_id")
  }

  val winLagLeadSql =
    """SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) AS ts_us,
      |  epoch_us(ts::TIMESTAMP) - lag(epoch_us(ts::TIMESTAMP), 1) OVER w AS gap_us,
      |  lead(event_type, 1) OVER w AS next_type
      |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts::TIMESTAMP) ASC, event_id ASC)
      |ORDER BY user_id, ts_us, event_id""".stripMargin

  /** running total, pinned ROWS frame, exact decimal accumulation */
  def winRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        r4(sum(d2(col("o_totalprice"))).over(w)).as("running_total"))
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  val winRunningSql =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |  PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS DOUBLE) AS running_total
      |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  /** 3-row moving average (decimal sum / count → deterministic) */
  def winMovingAvg(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us").asc, col("event_id").asc)
      .rowsBetween(-2, 0)
    events(s, dir)
      .select(col("user_id"), col("event_id"),
        r4f(sum(d2(col("value"))).over(w).cast(DoubleType) / count(col("value")).over(w)).as("mavg"))
      .orderBy("user_id", "event_id")
  }

  val winMovingAvgSql =
    """SELECT user_id, event_id,
      |CAST(floor(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) / count(value) OVER w * 10000::DOUBLE + 0.5::DOUBLE) / 10000::DOUBLE AS DOUBLE) AS mavg
      |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts::TIMESTAMP) ASC, event_id ASC
      |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin

  /** RANGE frame over a numeric key: sum of orders within 1000.0 of the
    * current totalprice (per status) — frame membership is value-based so
    * ties share identical frames in both engines */
  def winRangeFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderstatus").orderBy(col("o_totalprice").asc)
      .rangeBetween(-1000L, 0L)
    t(s, dir, "orders")
      .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"),
        count(lit(1)).over(w).as("n_in_band"),
        r4(sum(d2(col("o_totalprice"))).over(w)).as("band_total"))
      .orderBy("o_orderkey")
  }

  val winRangeFrameSql =
    """SELECT o_orderstatus, o_orderkey, o_totalprice,
      |count(*) OVER w AS n_in_band,
      |CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w, 4) AS DOUBLE) AS band_total
      |FROM orders WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice ASC
      |  RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW)
      |ORDER BY o_orderkey""".stripMargin

  /** the distributed twin of q_win_range_frame — same one-task-per-status
    * problem as q_win_dist, but a RANGE frame needs cross-bucket context:
    * a row near a bucket's lower edge must see rows up to 1000.0 below it
    * that live in earlier buckets. Classic halo replication (the spatial-
    * join technique): every row keeps one member copy in its own value
    * bucket and ghost copies in each later bucket whose range can still
    * see it inside the 1000-band lookback; the per-(status, bucket) range
    * window then computes exactly the original frame, and only member
    * rows are emitted. Ghost fan-out is GEOMETRY-DERIVED, not assumed:
    * the bucket count is sized from the data's own price range as
    * nb = clamp(floor(range / (2·band)), 1, NtileBuckets), so bucket
    * width is always ≥ 2·band and a 1000-wide lookback crosses at most
    * ONE bucket boundary — a structural ≤ 2 copies/row bound (asserted
    * by WindowsSpec) that a testdata regeneration with a narrow price
    * range cannot break. With the fixed constant, a range that shrank
    * below NtileBuckets·band would have replicated every row into every
    * trailing bucket. Row-identical to q_win_range_frame (same oracle
    * SQL). */
  def winRangeFrameBucketed(s: SparkSession, dir: String): DataFrame = {
    val tagged = rangeFrameGhosts(t(s, dir, "orders")
      .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice")))
    val w = Window.partitionBy("o_orderstatus", "bkt2")
      .orderBy(col("o_totalprice").asc).rangeBetween(-1000L, 0L)
    tagged
      .withColumn("n_in_band", count(lit(1)).over(w))
      .withColumn("band_total", r4(sum(d2(col("o_totalprice"))).over(w)))
      .where(col("is_member"))
      .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"),
        col("n_in_band"), col("band_total"))
      .orderBy("o_orderkey")
  }

  /** halo replication for winRangeFrameBucketed, factored out so the spec
    * can assert the ≤ 2 copies/row structural bound on the tagged frame
    * itself. Bucketing is exact for ANY monotone bucketing (a member p
    * sees context q iff q ≥ p−1000 ⟺ q+1000 ≥ p, which implies
    * bucket(q+1000) ≥ bucket(p)); the bucket COUNT only trades fan-out
    * against parallelism, so it is derived from the broadcast min/max:
    * width ≥ 2·band ⟹ at most one boundary inside any band ⟹ ≤ 1 ghost
    * per row. width_bucket takes the count as a column, so the whole
    * derivation stays inside codegen — no driver-side collect. */
  private[graft] def rangeFrameGhosts(o: DataFrame): DataFrame = {
    val bounds = o
      .agg(min(col("o_totalprice")).as("pmin"), max(col("o_totalprice")).as("pmax"))
      .withColumn("nb", greatest(lit(1L), least(lit(NtileBuckets.toLong),
        expr("cast(floor((pmax - pmin) / 2000.0d) as bigint)"))))
    o.crossJoin(broadcast(bounds))
      .withColumn("bkt",
        expr("width_bucket(o_totalprice, pmin, pmax + 1.0d, nb)"))
      .withColumn("gmax", least(
        expr("width_bucket(o_totalprice + 1000.0d, pmin, pmax + 1.0d, nb)"),
        col("nb")))
      .withColumn("copies", expr(
        """concat(array(named_struct('b', bkt, 'm', true)),
          |  transform(if(gmax > bkt, sequence(bkt + 1, gmax), array()),
          |    g -> named_struct('b', g, 'm', false)))""".stripMargin))
      .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"),
        explode(col("copies")).as("c"))
      .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"),
        col("c.b").as("bkt2"), col("c.m").as("is_member"))
  }

  def winNtile(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"), ntile(4).over(w).as("quartile"))
      .orderBy("o_orderkey")
  }

  val winNtileSql =
    """SELECT o_orderkey, o_totalprice,
      |ntile(4) OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS quartile
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** EXACT global ntile without the single-task global window: the plain
    * `ntile(4) OVER (ORDER BY …)` above forces the whole relation through
    * one `Exchange SinglePartition` — the canonical 100-TB bottleneck.
    * Scale shape here: (1) deterministic equal-width value buckets from
    * exact min/max (bucket QUALITY only affects balance — ANY monotone
    * bucketing yields exact ranks); (2) per-bucket local row_number,
    * B-way parallel;
    * (3) bucket offsets via a window over the B-row count frame (bounded)
    * broadcast back; (4) global rank = offset + local rank, ntile from
    * rank with SQL's bigger-buckets-first remainder rule. Output is
    * row-identical to q_win_ntile — the oracle is the same SQL — and the
    * same pattern distributes any global rank/row_number/cume_dist. */
  val NtileBuckets = 32

  def winNtileDist(s: SparkSession, dir: String): DataFrame = {
    val k = 4
    val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice"))
    // equal-width value buckets from exact min/max: any monotone bucketing
    // yields exact ranks (width only affects balance), and width_bucket is
    // a codegen'd O(1) expression — a per-row lambda over a boundary array
    // ran interpreted and cost ~15× at sf0.1. hi = pmax + 1 keeps the top
    // value inside bucket B and keeps lo < hi on degenerate input.
    // Sort order is price DESC, so flip the ascending bucket index.
    val bounds = o.agg(min(col("o_totalprice")).as("pmin"), max(col("o_totalprice")).as("pmax"))
    val bucketed = o.crossJoin(broadcast(bounds))
      .withColumn("bkt", lit(NtileBuckets) -
        expr(s"width_bucket(o_totalprice, pmin, pmax + 1.0d, $NtileBuckets)"))
      .drop("pmin", "pmax")
    val offs = bucketed.groupBy("bkt").agg(count(lit(1)).as("cnt"))
      .withColumn("off", sum(col("cnt")).over(Window.orderBy("bkt")) - col("cnt"))
      .withColumn("n_total", sum(col("cnt")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .drop("cnt")
    bucketed.join(broadcast(offs), Seq("bkt"))
      .withColumn("lr", row_number().over(
        Window.partitionBy("bkt").orderBy(col("o_totalprice").desc, col("o_orderkey").asc)))
      .withColumn("rnk", col("off") + col("lr"))
      .withColumn("base", expr(s"n_total div $k"))
      .withColumn("rem", expr(s"n_total % $k"))
      .withColumn("quartile",
        when(col("rnk") <= col("rem") * (col("base") + 1),
          expr("(rnk - 1) div (base + 1) + 1"))
        .otherwise(expr("rem + (rnk - rem * (base + 1) - 1) div base + 1"))
        .cast(IntegerType))
      .select(col("o_orderkey"), col("o_totalprice"), col("quartile"))
      .orderBy("o_orderkey")
  }

  // ---- B.9 batch twins of streaming windows ---------------------------

  /** tumbling 1h event-time window (batch twin of the streaming agg) */
  def windowTumbling(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"))
      .orderBy("ws", "event_type")

  val windowTumblingSql =
    """SELECT date_trunc('hour', ts::TIMESTAMP) AS ws, event_type, count(*) AS n
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** sliding 1h window every 30min — each event lands in 2 windows */
  def windowSliding(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"))
      .orderBy("ws", "event_type")

  val windowSlidingSql =
    """SELECT ws, event_type, count(*) AS n FROM (
      |  SELECT make_timestamp((epoch_us(ts::TIMESTAMP) // 1800000000) * 1800000000) AS ws,
      |         event_type FROM events
      |  UNION ALL
      |  SELECT make_timestamp((epoch_us(ts::TIMESTAMP) // 1800000000) * 1800000000
      |           - 1800000000) AS ws,
      |         event_type FROM events
      |) x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** session windows, 30-min inactivity gap, per user — gaps-and-islands
    * (lag + cumulative sum of new-session flags), identical SQL shape in
    * the oracle; streaming twin uses session_window() in tests */
  def windowSession(s: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy("user_id").orderBy(col("ts_us").asc, col("event_id").asc)
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, dir)
      .withColumn("prev_us", lag(col("ts_us"), 1).over(wOrd))
      .withColumn("new_sess",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > 1800000000L, 1L).otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(wCum))
      .groupBy("user_id", "sess_id")
      .agg(min(col("ts_us")).as("sess_start_us"), max(col("ts_us")).as("sess_end_us"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id", "sess_id")
  }

  val windowSessionSql =
    """SELECT user_id, sess_id::BIGINT AS sess_id, min(ts_us) AS sess_start_us, max(ts_us) AS sess_end_us,
      |       count(*) AS n_events
      |FROM (
      |  SELECT user_id, ts_us, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      |  FROM (
      |    SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) AS ts_us,
      |      CASE WHEN lag(epoch_us(ts::TIMESTAMP), 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts::TIMESTAMP), event_id) IS NULL
      |             OR epoch_us(ts::TIMESTAMP) - lag(epoch_us(ts::TIMESTAMP), 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts::TIMESTAMP), event_id) > 1800000000
      |           THEN 1 ELSE 0 END AS new_sess
      |    FROM events) a
      |) b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** first_value / last_value / nth_value over the full-partition frame */
  def winFirstLast(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        first(col("o_orderkey")).over(w).as("first_ok"),
        last(col("o_orderkey")).over(w).as("last_ok"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_ok"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val winFirstLastSql =
    """SELECT o_custkey, o_orderkey,
      |first_value(o_orderkey) OVER w AS first_ok,
      |last_value(o_orderkey) OVER w AS last_ok,
      |nth_value(o_orderkey, 2) OVER w AS second_ok
      |FROM orders WINDOW w AS (PARTITION BY o_custkey
      |  ORDER BY o_orderdate ASC, o_orderkey ASC
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** gap-filled hourly series (ClickHouse ORDER BY … WITH FILL analog):
    * dense hour spine from sequence() cross the type universe, left-joined
    * counts, missing buckets as 0 — the canonical dashboard query over
    * sparse log data. Spine generation is a per-group sequence explode, not
    * a driver loop. */
  def gapFill(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val counts = ev
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val bounds = ev.agg(
      date_trunc("hour", min(col("ts"))).as("lo"),
      date_trunc("hour", max(col("ts"))).as("hi"))
    val spine = bounds
      .select(explode(expr("sequence(lo, hi, interval 1 hour)")).as("hour"))
      .crossJoin(ev.select(col("event_type")).distinct())
    spine.join(counts, Seq("hour", "event_type"), "left")
      .select(col("hour"), col("event_type"), coalesce(col("n"), lit(0L)).as("n"))
      .orderBy("hour", "event_type")
  }

  val gapFillSql =
    """WITH counts AS (
      |  SELECT date_trunc('hour', ts::TIMESTAMP) AS hour, event_type, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |bounds AS (SELECT date_trunc('hour', min(ts::TIMESTAMP)) AS lo,
      |                  date_trunc('hour', max(ts::TIMESTAMP)) AS hi FROM events),
      |spine AS (
      |  SELECT b.lo + g.i * INTERVAL 1 HOUR AS hour, t.event_type
      |  FROM bounds b
      |  JOIN generate_series(0, 1000000) g(i) ON b.lo + g.i * INTERVAL 1 HOUR <= b.hi,
      |       (SELECT DISTINCT event_type FROM events) t)
      |SELECT s.hour, s.event_type, coalesce(c.n, 0) AS n
      |FROM spine s LEFT JOIN counts c ON s.hour = c.hour AND s.event_type = c.event_type
      |ORDER BY s.hour, s.event_type""".stripMargin

  /** distribution ranks: percent_rank / cume_dist (exact rational values —
    * k/n double division, identical both engines) */
  def winDist(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderstatus").orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .select(col("o_orderstatus"), col("o_orderkey"),
        r4f(percent_rank().over(w)).as("pr"),
        r4f(cume_dist().over(w)).as("cd"))
      .orderBy("o_orderstatus", "o_orderkey")
  }

  val winDistSql =
    """SELECT o_orderstatus, o_orderkey,
      |CAST(floor(percent_rank() OVER w * 10000::DOUBLE + 0.5::DOUBLE) / 10000::DOUBLE AS DOUBLE) AS pr,
      |CAST(floor(cume_dist() OVER w * 10000::DOUBLE + 0.5::DOUBLE) / 10000::DOUBLE AS DOUBLE) AS cd
      |FROM orders WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice ASC, o_orderkey ASC)
      |ORDER BY o_orderstatus, o_orderkey""".stripMargin

  /** percent_rank/cume_dist over a LOW-CARDINALITY partition key (three
    * order statuses) — at 100 TB each status is a third of the relation
    * in ONE window task. Same two-level rank shape as q_win_ntile_dist,
    * nested inside the group key: value-bucket within status, per-bucket
    * local row_number, broadcast per-(status, bkt) offsets and per-status
    * totals. The window's sort key (price, okey) is unique per status, so
    * rank = global row number and cume_dist = rank/n exactly —
    * row-identical to q_win_dist (same oracle SQL). */
  def winDistBucketed(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"))
    // codegen'd equal-width bucketing (see winNtileDist): monotone
    // non-decreasing in price, ties share a bucket
    val bounds = o.agg(min(col("o_totalprice")).as("pmin"), max(col("o_totalprice")).as("pmax"))
    val bucketed = o.crossJoin(broadcast(bounds))
      .withColumn("bkt",
        expr(s"width_bucket(o_totalprice, pmin, pmax + 1.0d, $NtileBuckets)"))
      .drop("pmin", "pmax")
    val offs = bucketed.groupBy("o_orderstatus", "bkt").agg(count(lit(1)).as("cnt"))
      .withColumn("off", sum(col("cnt")).over(
        Window.partitionBy("o_orderstatus").orderBy("bkt")) - col("cnt"))
      .withColumn("n_part", sum(col("cnt")).over(Window.partitionBy("o_orderstatus")))
      .drop("cnt")
    bucketed.join(broadcast(offs), Seq("o_orderstatus", "bkt"))
      .withColumn("lr", row_number().over(
        Window.partitionBy("o_orderstatus", "bkt")
          .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)))
      .withColumn("rnk", col("off") + col("lr"))
      .select(col("o_orderstatus"), col("o_orderkey"),
        r4f(when(col("n_part") > 1,
          (col("rnk") - 1).cast(DoubleType) / (col("n_part") - 1).cast(DoubleType))
          .otherwise(lit(0d))).as("pr"),
        r4f(col("rnk").cast(DoubleType) / col("n_part").cast(DoubleType)).as("cd"))
      .orderBy("o_orderstatus", "o_orderkey")
  }

  /** trailing-one-hour RANGE frame per user (the ClickHouse
    * "events in the last hour" rolling alert input): value-based frame
    * on epoch-µs, so simultaneous events are frame PEERS in both
    * engines — deterministic even with ts ties, unlike a ROWS frame.
    * Partitioned by user_id (scaling key); sum runs on DECIMAL so the
    * rolling money total is exact and order-independent. */
  def winTimeRange(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"))
      .rangeBetween(-3600L * 1000000L, 0L)
    events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts_us"), col("value"))
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("sum_1h", r4(sum(d2(col("value"))).over(w)))
      .select(col("user_id"), col("event_id"), col("n_1h"), col("sum_1h"))
      .orderBy("user_id", "event_id")
  }

  val winTimeRangeSql =
    """SELECT user_id, event_id, n_1h, sum_1h FROM (
      |  SELECT user_id, event_id,
      |    count(*) OVER w AS n_1h,
      |    CAST(round(sum(value::DECIMAL(18,2)) OVER w, 4) AS DOUBLE) AS sum_1h
      |  FROM (SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) AS ts_us, value FROM events) e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
      |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)) x
      |ORDER BY user_id, event_id""".stripMargin

  /** The three anchors that have distributed twins SERVE the twins: a
    * `ntile(4) OVER (ORDER BY …)` / one-task-per-status window is the
    * canonical 100 TB scale-killer, and the bucketed forms are
    * row-identical to the same oracle SQL by construction — so the
    * declared keys get the plan a cluster would want, while the naive
    * forms ([[winNtile]]/[[winDist]]/[[winRangeFrame]]) stay as
    * spec-only parity references (PlanSpec pins naive ≡ distributed). */
  val queries: Map[String, Q] = Map(
    "q_win_time_range" -> winTimeRange _,
    "q_win_dist" -> winDistBucketed _,
    "q_win_dist_bucketed" -> winDistBucketed _,
    "q_gap_fill" -> gapFill _,
    "q_win_first_last" -> winFirstLast _,
    "q_win_rank" -> winRank _,
    "q_win_lag_lead" -> winLagLead _,
    "q_win_running" -> winRunning _,
    "q_win_moving_avg" -> winMovingAvg _,
    "q_win_range_frame" -> winRangeFrameBucketed _,
    "q_win_range_frame_bucketed" -> winRangeFrameBucketed _,
    "q_win_ntile" -> winNtileDist _,
    "q_win_ntile_dist" -> winNtileDist _,
    "q_window_tumbling" -> windowTumbling _,
    "q_window_sliding" -> windowSliding _,
    "q_window_session" -> windowSession _)

  val oracle: Map[String, String] = Map(
    "q_win_time_range" -> winTimeRangeSql,
    "q_win_dist" -> winDistSql,
    "q_win_dist_bucketed" -> winDistSql, // row-identical by construction
    "q_gap_fill" -> gapFillSql,
    "q_win_first_last" -> winFirstLastSql,
    "q_win_rank" -> winRankSql,
    "q_win_lag_lead" -> winLagLeadSql,
    "q_win_running" -> winRunningSql,
    "q_win_moving_avg" -> winMovingAvgSql,
    "q_win_range_frame" -> winRangeFrameSql,
    "q_win_range_frame_bucketed" -> winRangeFrameSql, // row-identical by construction
    "q_win_ntile" -> winNtileSql,
    "q_win_ntile_dist" -> winNtileSql, // row-identical by construction
    "q_window_tumbling" -> windowTumblingSql,
    "q_window_sliding" -> windowSlidingSql,
    "q_window_session" -> windowSessionSql)
}
