package graft.operators

import graft.model
import graft.util._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parser-derived declared queries (SURVEY.md §2 Table A `q_parse_syslog`,
  * B.2 `q_case_map`, B.10 `q_udf_expr_severity` / `q_udtf_tokenize`) plus
  * the flagship severity-per-hour histogram. All run on the inline raw-line
  * corpus (FIXTURES.md §1) so the DuckDB oracle sees identical input. */
object Syslog {

  /** flagship: parse → hour bucket × severity counts (the canonical NOC
    * query the reference's ClickHouse table exists to serve) */
  def flagship(s: SparkSession, dir: String): DataFrame =
    model.rawLines(s)
      .withColumn("p", model.parseSyslog(col("raw")))
      .select(date_trunc("hour", col("ts")).as("hour"), col("p.severity").as("severity"))
      .groupBy("hour", "severity").agg(count(lit(1)).as("n"))
      .orderBy("hour", "severity")

  val flagshipSql: String =
    s"""SELECT date_trunc('hour', ts) AS hour, severity, count(*) AS n
       |FROM (${model.parseSyslogOracleSql(model.rawLinesValuesSql)} ) parsed
       |JOIN ${model.rawLinesValuesSql("g")} ON parsed.id = g.id
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** The flagship rolled up by NETWORK ZONE instead of raw device — the
    * composed form a NOC actually pages on ("critical spike in
    * corp-infra"), proving the parse, the LPM subnet enrichment
    * ([[graft.functions.Scalars.deviceZones]]), and the hourly rollup
    * chain without shape conflicts: parse is per-row, the zone join is
    * the LPM's bounded broadcast equi-join keyed on id, the rollup is
    * one map-side-combinable groupBy on (zone, hour). n_hi counts
    * severity ≤ 3 (err and worse). */
  def zoneSeverityHourly(s: SparkSession, dir: String): DataFrame =
    model.rawLines(s)
      .withColumn("sev", model.parseSyslog(col("raw")).getField("severity"))
      .join(graft.functions.Scalars.deviceZones(s).select("id", "zone"), Seq("id"))
      .groupBy(col("zone"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("sev") <= 3, 1L).otherwise(0L)).as("n_hi"))
      .orderBy("zone", "hour")

  val zoneSeverityHourlySql: String =
    s"""WITH parsed AS (${model.parseSyslogOracleSql(model.rawLinesValuesSql)}),
       |zones AS (SELECT id, zone FROM (${graft.functions.Scalars.ipLpmJoinSql}) z)
       |SELECT zone, date_trunc('hour', g.ts) AS hour, count(*) AS n,
       |  sum(CASE WHEN parsed.severity <= 3 THEN 1 ELSE 0 END)::BIGINT AS n_hi
       |FROM ${model.rawLinesValuesSql("g")}
       |JOIN parsed ON parsed.id = g.id
       |JOIN zones ON zones.id = g.id
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** categories stays an array inside the pipeline; the FINAL projection
    * flattens it to a '|'-joined string so the result is hashable by any
    * downstream comparator (array cells are not) — same op, same semantics. */
  def parseSyslogQ(s: SparkSession, dir: String): DataFrame =
    model.rawLines(s)
      .withColumn("p", model.parseSyslog(col("raw")))
      .select(col("id"), col("p.severity").as("severity"),
        array_join(col("p.categories"), "|").as("categories"), col("p.message").as("message"))
      .orderBy("id")

  val parseSyslogSql: String =
    s"""SELECT id, severity, array_to_string(categories, '|') AS categories, message
       |FROM (${model.parseSyslogOracleSql(model.rawLinesValuesSql)}) ps ORDER BY id""".stripMargin

  /** severity token → code mapping as a standalone relational op over the
    * distinct token universe (lib/lopParse.go:52-72) */
  def caseMap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = (model.knownTokens ++ Seq("weird", "unknownsev", "")).toDF("tok")
    toks.select(col("tok"), model.severityCode(col("tok")).as("code"),
        model.severityKnown(col("tok")).as("known"))
      .orderBy("tok")
  }

  val caseMapSql: String = {
    val vals = (model.knownTokens ++ Seq("weird", "unknownsev", ""))
      .map(t => s"('$t')").mkString(", ")
    val sevCase = model.severityTokens.map { case (t, c) => s"WHEN tok = '$t' THEN $c" }.mkString(" ")
    val known = model.knownTokens.map(t => s"'$t'").mkString(", ")
    s"""SELECT tok, CAST(CASE $sevCase ELSE 6 END AS TINYINT) AS code,
       |tok IN ($known) AS known
       |FROM (VALUES $vals) t(tok) ORDER BY tok""".stripMargin
  }

  /** scalar-UDF surface demo: same severity decode registered as a Scala
    * udf (the expression twin `q_case_map` is the production path — this
    * pins the udf registration machinery). */
  def udfSeverity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val m = model.severityTokens.toMap
    val sevUdf = udf((tok: String) => m.getOrElse(tok, 6))
    s.udf.register("severity_of", sevUdf)
    model.knownTokens.toDF("tok")
      .select(col("tok"), sevUdf(col("tok")).cast(ByteType).as("code"))
      .orderBy("tok")
  }

  val udfSeveritySql: String = {
    val vals = model.knownTokens.map(t => s"('$t')").mkString(", ")
    val sevCase = model.severityTokens.map { case (t, c) => s"WHEN tok = '$t' THEN $c" }.mkString(" ")
    s"SELECT tok, CAST(CASE $sevCase ELSE 6 END AS TINYINT) AS code FROM (VALUES $vals) t(tok) ORDER BY tok"
  }

  /** Real-syslog header decode (RFC 5424 §6 / RFC 3164 §4): `<PRI>` →
    * facility × severity, header timestamp/hostname/app extraction, the
    * MikroTik topics parse preserved as the no-header fallback — the
    * first operator an actual NOC user needs that the reference's
    * topics-only parser can't serve (its own README example line,
    * README.md:121, lands whole in `message` there). Pure column
    * expressions over the RFC fixture; every branch DuckDB-replayed. */
  def parseRfc5424Q(s: SparkSession, dir: String): DataFrame =
    model.rfcLines(s)
      .withColumn("p", model.parseRfc(col("raw")))
      .select(col("id"), col("p.format").as("format"),
        col("p.facility").as("facility"), col("p.severity").as("severity"),
        col("p.version").as("version"), col("p.ts_text").as("ts_text"),
        col("p.ts_us").as("ts_us"), col("p.hostname").as("hostname"),
        col("p.appname").as("appname"), col("p.procid").as("procid"),
        col("p.msgid").as("msgid"), col("p.sd").as("sd"),
        col("p.message").as("message"))
      .orderBy("id")

  val parseRfc5424Sql: String =
    s"""SELECT * FROM (${model.parseRfcOracleSql(model.rfcLinesValuesSql)}) p
       |ORDER BY id""".stripMargin

  /** RFC 5424 §6.3 structured-data PARAM extraction — the NOC user's
    * next query after the header decode (`sd['exampleSDID@32473']
    * ['eventID']`). [[model.parseSdParams]] is the map-typed API; this
    * declared view flattens to one row per (sd_id, param) because map
    * cells don't hash in the driver compare. Blocks with no params
    * (`[bare@1]`) and the empty block (`[]`) drop out of the flattened
    * view on both sides by the same rule (no kv pairs to emit).
    * Values are §6.3.3-unescaped on both sides; repeated PARAM-NAMEs
    * (§6.3.2-conformant) each keep their row, so `value` joins the
    * sort keys to pin a total order. */
  def parseSdParamsQ(s: SparkSession, dir: String): DataFrame = {
    val parsed = model.rfcLines(s)
      .withColumn("p", model.parseRfc(col("raw")))
      .select(col("id"), col("p.sd").as("sd"))
    model.sdParamRows(parsed, "sd")
      .select("id", "sd_id", "param", "value")
      .orderBy("id", "sd_id", "param", "value")
  }

  val parseSdParamsSql: String =
    s"""WITH p AS (${model.parseRfcOracleSql(model.rfcLinesValuesSql)}),
       |b AS (SELECT id, unnest(regexp_extract_all(sd, '${model.sdBlockRe}', 1)) AS blk
       |      FROM p WHERE sd IS NOT NULL AND sd <> '-'),
       |kv AS (SELECT id,
       |    CASE WHEN strpos(blk, ' ') > 0 THEN substr(blk, 1, strpos(blk, ' ') - 1) ELSE blk END AS sd_id,
       |    unnest(regexp_extract_all(blk, '${model.sdParamRe}', 1)) AS param,
       |    unnest(regexp_extract_all(blk, '${model.sdParamRe}', 2)) AS value
       |  FROM b)
       |SELECT id, sd_id, param, ${model.sdUnescapeSql("value")} AS value
       |FROM kv ORDER BY id, sd_id, param, value""".stripMargin

  /** RFC 3164 year anchoring ([[model.anchor3164TsUs]]): the year-less
    * BSD stamp + the row's ingest timestamp → epoch micros under the
    * Dec/Jan rollover rule, plus the hour bucket proving 3164 rows now
    * join the `q_date_trunc`/`q_window_tumbling` family. `parseRfc`
    * itself keeps `ts_us` null for 3164 — this materialization is the
    * documented opt-in deviation. */
  def parseRfc3164TsQ(s: SparkSession, dir: String): DataFrame = {
    val anchored = model.rfcLines(s)
      .withColumn("p", model.parseRfc(col("raw")))
      .where(col("p.format") === "rfc3164")
      .select(col("id"), col("p.ts_text").as("ts_text"),
        model.anchor3164TsUs(col("p.ts_text"), col("ts")).as("ts_us"))
    anchored
      .withColumn("hour", date_trunc("hour", timestamp_micros(col("ts_us"))))
      .orderBy("id")
  }

  val parseRfc3164TsSql: String = {
    val monCase = model.monthTokens.map { case (t, m) => s"WHEN '$t' THEN $m" }.mkString(" ")
    val re = model.rfc3164TsRe
    s"""WITH p AS (${model.parseRfcOracleSql(model.rfcLinesValuesSql)}),
       |j AS (SELECT p.id, p.ts_text, g.ts AS anchor
       |      FROM p JOIN ${model.rfcLinesValuesSql("g")} ON p.id = g.id
       |      WHERE p.format = 'rfc3164'),
       |x AS (SELECT *, CASE regexp_extract(ts_text, '$re', 1) $monCase END AS mon,
       |      try_cast(nullif(regexp_extract(ts_text, '$re', 2), '') AS INT) AS day,
       |      try_cast(nullif(regexp_extract(ts_text, '$re', 3), '') AS INT) AS hh,
       |      try_cast(nullif(regexp_extract(ts_text, '$re', 4), '') AS INT) AS mi,
       |      try_cast(nullif(regexp_extract(ts_text, '$re', 5), '') AS INT) AS ss FROM j),
       |y AS (SELECT *, CASE WHEN mon = 12 AND month(anchor) = 1 THEN year(anchor) - 1
       |                     WHEN mon = 1 AND month(anchor) = 12 THEN year(anchor) + 1
       |                     ELSE year(anchor) END AS yr FROM x),
       |z AS (SELECT *, mon IS NOT NULL AND day IS NOT NULL AND anchor IS NOT NULL
       |      AND day BETWEEN 1 AND (CASE WHEN mon = 2 THEN (CASE WHEN (yr % 4 = 0 AND yr % 100 <> 0) OR yr % 400 = 0 THEN 29 ELSE 28 END)
       |                                  WHEN mon IN (4, 6, 9, 11) THEN 30 ELSE 31 END)
       |      AND hh <= 23 AND mi <= 59 AND ss <= 59 AS ok FROM y),
       |r AS (SELECT id, ts_text,
       |      CASE WHEN ok THEN epoch_us(make_timestamp(yr, mon, day, hh, mi, CAST(ss AS DOUBLE))) END AS ts_us FROM z)
       |SELECT id, ts_text, ts_us,
       |  CASE WHEN ts_us IS NOT NULL THEN date_trunc('hour', make_timestamp(ts_us)) END AS hour
       |FROM r ORDER BY id""".stripMargin
  }

  /** generator (UDTF) surface: message → one row per word (1→N) */
  def tokenize(s: SparkSession, dir: String): DataFrame =
    model.rawLines(s)
      .withColumn("message", model.parseSyslog(col("raw")).getField("message"))
      .select(col("id"), explode(split(col("message"), " ")).as("word"))
      .filter(col("word") =!= "")
      .orderBy("id", "word")

  val tokenizeSql: String =
    s"""SELECT id, w AS word
       |FROM (${model.parseSyslogOracleSql(model.rawLinesValuesSql)} ) parsed,
       |     UNNEST(string_split(parsed.message, ' ')) AS u(w)
       |WHERE w <> '' ORDER BY id, word""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_severity_hourly" -> flagship _,
    "q_zone_severity_hourly" -> zoneSeverityHourly _,
    "q_parse_syslog" -> parseSyslogQ _,
    "q_parse_rfc5424" -> parseRfc5424Q _,
    "q_parse_sd_params" -> parseSdParamsQ _,
    "q_parse_rfc3164_ts" -> parseRfc3164TsQ _,
    "q_case_map" -> caseMap _,
    "q_udf_expr_severity" -> udfSeverity _,
    "q_udtf_tokenize" -> tokenize _)

  val oracle: Map[String, String] = Map(
    "q_severity_hourly" -> flagshipSql,
    "q_zone_severity_hourly" -> zoneSeverityHourlySql,
    "q_parse_syslog" -> parseSyslogSql,
    "q_parse_rfc5424" -> parseRfc5424Sql,
    "q_parse_sd_params" -> parseSdParamsSql,
    "q_parse_rfc3164_ts" -> parseRfc3164TsSql,
    "q_case_map" -> caseMapSql,
    "q_udf_expr_severity" -> udfSeveritySql,
    "q_udtf_tokenize" -> tokenizeSql)
}
