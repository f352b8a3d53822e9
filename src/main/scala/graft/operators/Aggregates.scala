package graft.operators

import graft.util._
import graft.functions.TopK
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2 B.4 — the aggregation surface the reference delegates to
  * ClickHouse (uniq/quantile/topK/argMax/groupArray analogs).
  *
  * Scale notes: every aggregate here is hash-partial+final (map-side
  * combine before the shuffle); distinct uses Spark's expand+2-phase plan;
  * HLL replaces exact distinct where 100 TB cardinality would OOM;
  * the topK UDAF bounds per-group state (see TopKAggregator). Money sums
  * run on DECIMAL for exact, order-independent results (oracle parity).
  */
object Aggregates {

  /** flagship TPC-H-Q1-style multi-aggregate (partial+final hash agg) */
  def aggHash(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        r4(sum(d2(col("l_quantity")))).as("sum_qty"),
        r4(sum(d2(col("l_extendedprice")))).as("sum_base_price"),
        r4(sum(d2(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - d2(col("l_discount"))))).as("sum_disc_price"),
        r4(sum(d2(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - d2(col("l_discount")))
          * (lit(1).cast(DecimalType(18, 2)) + d2(col("l_tax"))))).as("sum_charge"),
        avgD2(col("l_quantity")).as("avg_qty"),
        avgD2(col("l_extendedprice")).as("avg_price"),
        avgD2(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val aggHashSql =
    """SELECT l_returnflag, l_linestatus,
      |CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 4) AS DOUBLE) AS sum_qty,
      |CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 4) AS DOUBLE) AS sum_base_price,
      |CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 4) AS DOUBLE) AS sum_disc_price,
      |CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))), 4) AS DOUBLE) AS sum_charge,
      |CAST(floor(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity) * 10000::DOUBLE + 0.5::DOUBLE) / 10000::DOUBLE AS DOUBLE) AS avg_qty,
      |CAST(floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(l_extendedprice) * 10000::DOUBLE + 0.5::DOUBLE) / 10000::DOUBLE AS DOUBLE) AS avg_price,
      |CAST(floor(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(l_discount) * 10000::DOUBLE + 0.5::DOUBLE) / 10000::DOUBLE AS DOUBLE) AS avg_disc,
      |count(*) AS count_order
      |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  def aggDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("n_cust"), count(lit(1)).as("n"))
      .orderBy("o_orderpriority")

  val aggDistinctSql =
    """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust, count(*) AS n
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** EXACT re-aggregatable distinct counting via roaring-style bitmaps
    * (ClickHouse `groupBitmap`) — the third point on the distinct-count
    * spectrum beside `countDistinct` (exact, but its partial state is the
    * raw value set) and HLL (mergeable but approximate). Values bucket by
    * `bitmap_bucket_number`; each (group, bucket) folds into ONE fixed
    * ≤4 KiB bitmap via map-side-combined `bitmap_construct_agg`, bucket
    * counts then sum per group. Shuffle is O(groups × touched buckets)
    * bitmaps, independent of row count; persisted per-bucket bitmaps
    * union across any later slice (`bitmap_or_agg`) with NO error — the
    * rollup pattern `q_agg_hll_union` demonstrates approximately, made
    * exact. Being exact, the DuckDB oracle is plain count(DISTINCT). */
  def aggBitmapDistinct(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("event_type"), expr("bitmap_bucket_number(user_id)").as("bkt"))
      .agg(expr("bitmap_count(bitmap_construct_agg(bitmap_bit_position(user_id)))").as("cnt"))
      .groupBy("event_type")
      .agg(sum(col("cnt")).as("n_users"))
      .orderBy("event_type")

  val aggBitmapDistinctSql =
    """SELECT event_type, count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** HLL++ sketch distinct (ClickHouse uniq()) — deterministic but not
    * cross-engine comparable → rows-only driver check + unit test vs exact */
  def aggApproxDistinct(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"))
      .orderBy("event_type")

  def aggRollup(s: SparkSession, dir: String): DataFrame = {
    {
    t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .select("r_name", "n_name", "c_acctbal")
      .createOrReplaceTempView("cnr_rollup")
    // DataFrame-DSL rollup + grouping() trips the ambiguous-self-join
    // analyzer check on multi-join inputs; the SQL path plans the same
    // Aggregate(Rollup) node
    s.sql(
      """SELECT r_name, n_name, count(*) AS n,
        |CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 4) AS DOUBLE) AS bal,
        |CAST(grouping(r_name) AS INT) AS g_r, CAST(grouping(n_name) AS INT) AS g_n
        |FROM cnr_rollup GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY g_r, g_n, r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)
    }
  }

  val aggRollupSql =
    """SELECT r_name, n_name, count(*) AS n,
      |CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 4) AS DOUBLE) AS bal,
      |GROUPING(r_name) AS g_r, GROUPING(n_name) AS g_n
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY g_r, g_n, r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin

  def aggCube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), r4(sum(d2(col("o_totalprice")))).as("total"),
        grouping(col("o_orderstatus")).as("g_s"), grouping(col("o_orderpriority")).as("g_p"))
      .orderBy(col("g_s"), col("g_p"),
        col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  val aggCubeSql =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 4) AS DOUBLE) AS total,
      |GROUPING(o_orderstatus) AS g_s, GROUPING(o_orderpriority) AS g_p
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY g_s, g_p, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  def aggGroupingSets(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders_gs")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |GROUPING(o_orderstatus) AS g_s, GROUPING(o_orderpriority) AS g_p
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_s, g_p, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  val aggGroupingSetsSql =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |GROUPING(o_orderstatus) AS g_s, GROUPING(o_orderpriority) AS g_p
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY g_s, g_p, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** exact interpolated percentile (ClickHouse quantile()); p ∈ {0.5, 0.9}
    * keeps the true value ≤3 decimals → round(…,4) is exact cross-engine */
  def aggQuantile(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        r4(expr("percentile(l_quantity, 0.5)")).as("p50_qty"),
        r4(expr("percentile(l_quantity, 0.9)")).as("p90_qty"),
        r4(expr("percentile(l_extendedprice, 0.5)")).as("p50_price"))
      .orderBy("l_returnflag")

  val aggQuantileSql =
    """SELECT l_returnflag,
      |CAST(round(quantile_cont(l_quantity, 0.5), 4) AS DOUBLE) AS p50_qty,
      |CAST(round(quantile_cont(l_quantity, 0.9), 4) AS DOUBLE) AS p90_qty,
      |CAST(round(quantile_cont(l_extendedprice, 0.5), 4) AS DOUBLE) AS p50_price
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** ClickHouse `quantiles(p1, p2, …)` (plural) — several percentiles from
    * ONE aggregation state: `percentile(col, array(...))` shares a single
    * per-group sorted buffer across all requested quantiles, where the
    * singular form ([[aggQuantile]]) pays one buffer per percentile
    * expression. Same exact-interpolation + r4 contract; the array result
    * keeps the one-pass shape visible in the schema. */
  def aggQuantileMulti(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(expr("percentile(o_totalprice, array(0.25D, 0.5D, 0.75D, 0.9D))").as("qs"))
      // flat doubles, not the array: the driver comparator hashes scalar
      // cells only — the one-pass shape lives in the single agg above
      .select(Seq(col("o_orderstatus")) ++ Seq(25, 50, 75, 90).zipWithIndex.map {
        case (p, i) => r4(element_at(col("qs"), i + 1)).as(s"p$p")
      }: _*)
      .orderBy("o_orderstatus")

  val aggQuantileMultiSql =
    """WITH q AS (
      |  SELECT o_orderstatus, quantile_cont(o_totalprice, [0.25, 0.5, 0.75, 0.9]) AS qs
      |  FROM orders GROUP BY 1)
      |SELECT o_orderstatus,
      |  CAST(round(qs[1], 4) AS DOUBLE) AS p25, CAST(round(qs[2], 4) AS DOUBLE) AS p50,
      |  CAST(round(qs[3], 4) AS DOUBLE) AS p75, CAST(round(qs[4], 4) AS DOUBLE) AS p90
      |FROM q ORDER BY 1""".stripMargin

  /** ClickHouse argMax/argMin — value of A at extremum of B, tie-broken by
    * (ts_us, event_id) struct ordering so it is total */
  def aggArgmax(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy("user_id")
      .agg(
        max_by(col("event_type"), struct(col("ts_us"), col("event_id"))).as("last_type"),
        min_by(col("event_type"), struct(col("ts_us"), col("event_id"))).as("first_type"),
        count(lit(1)).as("n"))
      .orderBy("user_id")

  val aggArgmaxSql =
    """WITH o AS (SELECT user_id, event_type,
      |  row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts::TIMESTAMP) DESC, event_id DESC) AS rl,
      |  row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts::TIMESTAMP) ASC, event_id ASC) AS rf
      |  FROM events),
      |c AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1)
      |SELECT c.user_id, l.event_type AS last_type, f.event_type AS first_type, c.n
      |FROM c JOIN o l ON c.user_id = l.user_id AND l.rl = 1
      |       JOIN o f ON c.user_id = f.user_id AND f.rf = 1
      |ORDER BY c.user_id""".stripMargin

  /** ClickHouse groupArray/groupUniqArray — sorted for determinism */
  def aggCollectSorted(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .groupBy("c_nationkey")
      .agg(array_join(array_sort(collect_set(col("c_mktsegment"))), "|").as("segments"),
        count(lit(1)).as("n"))
      .orderBy("c_nationkey")

  val aggCollectSortedSql =
    """SELECT c_nationkey, array_to_string(list_sort(list_distinct(list(c_mktsegment))), '|') AS segments,
      |count(*) AS n FROM customer GROUP BY 1 ORDER BY 1""".stripMargin

  /** ClickHouse countIf/sumIf/avgIf */
  def aggConditional(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        count(when(col("l_discount") > 0.05, 1)).as("n_disc"),
        r4(coalesce(sum(when(col("l_tax") > 0.04, d2(col("l_quantity")))), lit(0).cast(DecimalType(18, 2)))).as("qty_taxed"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  val aggConditionalSql =
    """SELECT l_returnflag,
      |count(*) FILTER (WHERE l_discount > 0.05) AS n_disc,
      |CAST(round(coalesce(sum(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_tax > 0.04), 0), 4) AS DOUBLE) AS qty_taxed,
      |count(*) AS n
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** custom space-saving topK UDAF (exact here since capacity ≫ distinct) */
  def udafTopk(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy("user_id")
      .agg(array_join(TopK.topk(col("event_type"), 3), "|").as("top_types"))
      .orderBy("user_id")

  val udafTopkSql =
    """SELECT user_id, array_to_string(list(event_type ORDER BY cnt DESC, event_type ASC)[1:3], '|') AS top_types
      |FROM (SELECT user_id, event_type, count(*) AS cnt FROM events GROUP BY 1, 2) x
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** ClickHouse `topKWeighted` analog: per-language top sources by TOTAL
    * characters (weight = n_chars), through the weighted space-saving
    * aggregate — bounded state per group, exact under capacity, which the
    * rank-SQL oracle pins */
  def udafTopkWeighted(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy("lang")
      .agg(array_join(
        graft.functions.TopK.topkWeighted(col("source"), col("n_chars"), 2), "|")
        .as("top_sources"))
      .orderBy("lang")

  val udafTopkWeightedSql =
    """SELECT lang, array_to_string(list(source ORDER BY w DESC, source ASC)[1:2], '|') AS top_sources
      |FROM (SELECT lang, source, sum(n_chars)::BIGINT AS w FROM documents GROUP BY 1, 2) x
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** pivot (ClickHouse conditional-agg matrix): order counts per priority ×
    * status; the status universe is pinned explicitly so the plan is a
    * single pass (no distinct-collect on the driver) and column names are
    * deterministic cross-engine */
  def aggPivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("o_orderpriority")

  val aggPivotSql =
    """SELECT o_orderpriority,
      |count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
      |count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
      |count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** stddev / covariance / correlation (ClickHouse stddevSamp/corr) — the
    * moments come from EXACT decimal sums, the closed-form combination runs
    * in identically-ordered double arithmetic in both engines, so results
    * are bit-deterministic (built-in corr/stddev use different streaming
    * formulas per engine and would drift in low bits) */
  def aggStats(s: SparkSession, dir: String): DataFrame = {
    val x = d2(col("l_extendedprice"))
    val y = d2(col("l_quantity"))
    val base = t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).cast(DoubleType).as("n"),
        sum(x).cast(DoubleType).as("sx"), sum(y).cast(DoubleType).as("sy"),
        sum(x * x).cast(DoubleType).as("sxx"), sum(y * y).cast(DoubleType).as("syy"),
        sum(x * y).cast(DoubleType).as("sxy"))
    base.select(col("l_returnflag"),
        r4f(sqrt((col("n") * col("sxx") - col("sx") * col("sx")) / (col("n") * (col("n") - 1)))).as("stddev_x"),
        r4f((col("n") * col("sxy") - col("sx") * col("sy")) / (col("n") * (col("n") - 1))).as("covar_xy"),
        r4f((col("n") * col("sxy") - col("sx") * col("sy"))
          / (sqrt(col("n") * col("sxx") - col("sx") * col("sx"))
            * sqrt(col("n") * col("syy") - col("sy") * col("sy")))).as("corr_xy"))
      .orderBy("l_returnflag")
  }

  val aggStatsSql =
    """WITH m AS (SELECT l_returnflag, count(*)::DOUBLE AS n,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sx,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sy,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS syy,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxy
      |  FROM lineitem GROUP BY 1)
      |SELECT l_returnflag,
      |CAST(floor(sqrt((n * sxx - sx * sx) / (n * (n - 1))) * 10000::DOUBLE + 0.5::DOUBLE) / 10000::DOUBLE AS DOUBLE) AS stddev_x,
      |CAST(floor((n * sxy - sx * sy) / (n * (n - 1)) * 10000::DOUBLE + 0.5::DOUBLE) / 10000::DOUBLE AS DOUBLE) AS covar_xy,
      |CAST(floor((n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) * 10000::DOUBLE + 0.5::DOUBLE) / 10000::DOUBLE AS DOUBLE) AS corr_xy
      |FROM m ORDER BY 1""".stripMargin

  /** fixed-width numeric histogram (ClickHouse histogram analog) */
  def aggHistogram(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(floor(col("l_quantity") / 5).cast(IntegerType).as("bucket"))
      .agg(count(lit(1)).as("n"), min(col("l_quantity")).as("lo"), max(col("l_quantity")).as("hi"))
      .orderBy("bucket")

  val aggHistogramSql =
    """SELECT CAST(floor(l_quantity / 5) AS INT) AS bucket, count(*) AS n,
      |min(l_quantity) AS lo, max(l_quantity) AS hi
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** deterministic hash sampling (ClickHouse SAMPLE BY analog): the md5-hex
    * trick gives an engine-portable uniform hash — 10% of orders by key */
  def sampleHash(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .where(conv(substring(md5(col("o_orderkey").cast(StringType)), 1, 8), 16, 10)
        .cast(LongType) % 100 < 10)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")

  val sampleHashSql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |WHERE ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 8))::BIGINT % 100 < 10
      |ORDER BY o_orderkey""".stripMargin

  /** t-digest-style approximate percentile (ClickHouse quantileTDigest
    * analog) — sketch values differ per engine, so no oracle; unit test
    * bounds it against the exact percentile */
  def aggQuantileApprox(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("p50_approx"),
        percentile_approx(col("l_extendedprice"), lit(0.9), lit(1000)).as("p90_approx"))
      .orderBy("l_returnflag")

  /** mergeable-sketch distinct counting (Apache DataSketches HLL via
    * `hll_sketch_agg`/`hll_union_agg`): per-(event_type, day) sketches
    * built in ONE pass over raw rows, then re-aggregated to per-type
    * distinct-user estimates WITHOUT touching raw rows again. This is
    * the 100 TB rollup pattern `approx_count_distinct` cannot express:
    * daily sketch tables are persisted once and ANY later slice (week,
    * month, campaign) is a cheap sketch union — re-aggregatable where
    * raw HLL±distinct counts are not. lgConfigK=12 ⇒ ~1.6% typical
    * error, 4 KiB max sketch. Oracle-free by design (sketch internals
    * are library-specific); spec bounds error vs exact. */
  def aggHllUnion(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_users"))
      .orderBy("event_type")

  /** re-aggregatable heavy hitters — the FREQUENCY twin of
    * [[aggHllUnion]]'s HLL rollup: per-day DataSketches frequent-items
    * sketches of user activity built in ONE pass (native
    * `TypedImperativeAggregate`, O(1) map-hit updates, serde only at
    * shuffle boundaries), unioned into a global state, decoded to the
    * top-10 users WITH error bounds. At 100 TB the persisted daily
    * sketch table answers any later "top users in window W" as a merge
    * of |W| kilobyte states — no raw-row rescan. Hard oracle is valid
    * because distinct users (1.5 k at sf0.1) sit far below the
    * 4096-entry map's ~0.75 purge point, where every count is exact and
    * lb = est = ub (documented contract in functions/FreqSketch.scala);
    * the saturated approximate regime is spec-pinned on a tiny map. */
  def aggFreqSketch(s: SparkSession, dir: String): DataFrame = {
    graft.functions.FreqSketch.register(s)
    events(s, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(graft.functions.FreqSketch.freqAgg(
        col("user_id").cast(StringType)).as("sk"))
      .agg(graft.functions.FreqSketch.freqMerge(col("sk")).as("sk"))
      .select(explode(graft.functions.FreqSketch.freqTopK(col("sk"), 10)).as("r"))
      .select(col("r.item").cast(LongType).as("user_id"),
        col("r.est").as("n_events"), col("r.lb").as("lb"), col("r.ub").as("ub"))
      .orderBy(col("n_events").desc, col("user_id"))
  }

  /** the in-sketch top-k tie-break ranks by the STRING item, so the
    * oracle's rank mirrors `user_id::VARCHAR`; in the exact regime
    * lb = est = ub = the true count */
  val aggFreqSketchSql: String =
    """WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
      |r AS (SELECT user_id, n,
      |  row_number() OVER (ORDER BY n DESC, user_id::VARCHAR) AS rk FROM c)
      |SELECT user_id::BIGINT AS user_id, n::BIGINT AS n_events,
      |  n::BIGINT AS lb, n::BIGINT AS ub
      |FROM r WHERE rk <= 10 ORDER BY n_events DESC, user_id""".stripMargin

  /** distinct-count SET ALGEBRA via theta sketches — the segment-overlap
    * question HLL cannot answer: of the users who purchased on Jan 5,
    * how many also clicked that day (∩), how many are purchase-only
    * (\), and how big is either audience (∪)? ONE scan of the day's
    * rows builds both segment sketches (conditional null routing into
    * two `theta_sketch_agg` states); the set ops then run on kilobyte
    * states — at 100 TB the per-(segment, day) sketch table answers any
    * later overlap across any date range with zero raw-row rescans.
    * Hard oracle: both segments sit far below the 4096-entry exact-mode
    * bound, where theta set ops are exact (functions/ThetaSketch.scala
    * contract); the sampled regime is spec-pinned. */
  def aggThetaOps(s: SparkSession, dir: String): DataFrame = {
    graft.functions.ThetaSketch.register(s)
    import graft.functions.ThetaSketch._
    val day = events(s, dir).where(to_date(col("ts")) === lit("2024-01-05"))
    day
      .agg(
        thetaAgg(when(col("event_type") === "purchase",
          col("user_id").cast(StringType))).as("a"),
        thetaAgg(when(col("event_type") === "click",
          col("user_id").cast(StringType))).as("b"))
      .select(explode(array(
        struct(lit("a_purchasers").as("op"), thetaEstimate(col("a")).as("n_users")),
        struct(lit("b_clickers").as("op"), thetaEstimate(col("b")).as("n_users")),
        struct(lit("a_and_b").as("op"),
          thetaEstimate(thetaIntersect(col("a"), col("b"))).as("n_users")),
        struct(lit("a_or_b").as("op"),
          thetaEstimate(thetaUnion(col("a"), col("b"))).as("n_users")),
        struct(lit("a_not_b").as("op"),
          thetaEstimate(thetaANotB(col("a"), col("b"))).as("n_users")))).as("r"))
      .select(col("r.op").as("op"), col("r.n_users").as("n_users"))
      .orderBy("op")
  }

  val aggThetaOpsSql: String =
    """WITH a AS (SELECT DISTINCT user_id FROM events
      |  WHERE event_type = 'purchase' AND ts::DATE = DATE '2024-01-05'),
      |b AS (SELECT DISTINCT user_id FROM events
      |  WHERE event_type = 'click' AND ts::DATE = DATE '2024-01-05'),
      |m AS (
      |  SELECT 'a_purchasers' AS op, (SELECT count(*) FROM a) AS n_users
      |  UNION ALL SELECT 'a_and_b', (SELECT count(*) FROM a JOIN b USING (user_id))
      |  UNION ALL SELECT 'a_not_b',
      |    (SELECT count(*) FROM a WHERE user_id NOT IN (SELECT user_id FROM b))
      |  UNION ALL SELECT 'a_or_b',
      |    (SELECT count(*) FROM (SELECT user_id FROM a UNION SELECT user_id FROM b) u)
      |  UNION ALL SELECT 'b_clickers', (SELECT count(*) FROM b))
      |SELECT op, n_users::BIGINT AS n_users FROM m ORDER BY op""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_agg_theta_ops" -> aggThetaOps _,
    "q_agg_freq_sketch" -> aggFreqSketch _,
    "q_agg_hll_union" -> aggHllUnion _,
    "q_agg_quantile_approx" -> aggQuantileApprox _,
    "q_agg_stats" -> aggStats _,
    "q_agg_histogram" -> aggHistogram _,
    "q_sample_hash" -> sampleHash _,
    "q_agg_pivot" -> aggPivot _,
    "q_agg_hash" -> aggHash _,
    "q_agg_distinct" -> aggDistinct _,
    "q_agg_bitmap_distinct" -> aggBitmapDistinct _,
    "q_agg_approx_distinct" -> aggApproxDistinct _,
    "q_agg_rollup" -> aggRollup _,
    "q_agg_cube" -> aggCube _,
    "q_agg_grouping_sets" -> aggGroupingSets _,
    "q_agg_quantile" -> aggQuantile _,
    "q_agg_quantile_multi" -> aggQuantileMulti _,
    "q_agg_argmax" -> aggArgmax _,
    "q_agg_collect_sorted" -> aggCollectSorted _,
    "q_agg_conditional" -> aggConditional _,
    "q_udaf_topk" -> udafTopk _,
    "q_udaf_topk_weighted" -> udafTopkWeighted _)

  val oracle: Map[String, String] = Map(
    "q_agg_theta_ops" -> aggThetaOpsSql,
    "q_agg_freq_sketch" -> aggFreqSketchSql,
    "q_agg_stats" -> aggStatsSql,
    "q_agg_histogram" -> aggHistogramSql,
    "q_sample_hash" -> sampleHashSql,
    "q_agg_pivot" -> aggPivotSql,
    "q_agg_hash" -> aggHashSql,
    "q_agg_distinct" -> aggDistinctSql,
    "q_agg_bitmap_distinct" -> aggBitmapDistinctSql,
    "q_agg_rollup" -> aggRollupSql,
    "q_agg_cube" -> aggCubeSql,
    "q_agg_grouping_sets" -> aggGroupingSetsSql,
    "q_agg_quantile" -> aggQuantileSql,
    "q_agg_quantile_multi" -> aggQuantileMultiSql,
    "q_agg_argmax" -> aggArgmaxSql,
    "q_agg_collect_sorted" -> aggCollectSortedSql,
    "q_agg_conditional" -> aggConditionalSql,
    "q_udaf_topk" -> udafTopkSql,
    "q_udaf_topk_weighted" -> udafTopkWeightedSql)
}
