package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canonical log data model + the syslog "topics" parser, re-expressed as
  * pure Catalyst column expressions (codegen-friendly, no UDF).
  *
  * Semantics derived from the reference parser
  * `/root/reference/lib/lopParse.go:29-81` (see SURVEY.md §1.4):
  *   - split raw at FIRST space → catStr + message;
  *   - catStr split on ',' → topics; severity token is topics[1];
  *   - categories = topics[0] ++ topics[2:], plus the unknown severity
  *     token appended LAST when unrecognized (lopParse.go:69-71);
  *   - fallback (fewer than 2 comma-tokens): severity=Info(6),
  *     categories=["unknown"], message=whole raw line (lopParse.go:34-42);
  *   - engine-defined FIX: inputs with no space (reference PANICS,
  *     lopParse.go:33 indexes before the :34 guard) route to the fallback.
  */
object model {

  /** canonical log schema (SURVEY.md §1.1; lib/lopParse.go:21-27) */
  val logSchema: StructType = StructType(Seq(
    StructField("timestamp", TimestampType, nullable = false),
    StructField("device", StringType, nullable = false),
    StructField("severity", ByteType, nullable = false),
    StructField("categories", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("message", StringType, nullable = false)))

  /** severity token → RFC-5424 code (lib/lopParse.go:51-72) */
  val severityTokens: Seq[(String, Int)] = Seq(
    "fatal" -> 0, "emergency" -> 0, "alert" -> 1, "critical" -> 2,
    "error" -> 3, "warning" -> 4, "notice" -> 5, "info" -> 6,
    "debug" -> 7, "packet" -> 7, "raw" -> 7)

  val knownTokens: Seq[String] = severityTokens.map(_._1)

  /** CASE chain: token → code, unknown → 6 (Info) */
  def severityCode(tok: Column): Column =
    severityTokens.foldRight(lit(6)) { case ((t, code), rest) =>
      when(tok === t, lit(code)).otherwise(rest)
    }.cast(ByteType)

  def severityKnown(tok: Column): Column = tok.isin(knownTokens: _*)

  /** full parse: raw line → struct(severity, categories, message).
    * try_element_at (not element_at) everywhere an index can be absent:
    * under ANSI mode (Spark 4 default) element_at THROWS on out-of-bounds —
    * a space-free datagram would crash the job exactly like the reference's
    * lopParse.go:33 panic this parser is specified to fix. */
  def parseSyslog(raw: Column): Column = {
    val parts   = split(raw, " ", 2)
    val catStr  = parts.getItem(0)
    val msg     = coalesce(try_element_at(parts, lit(2)), lit(""))
    val topics  = split(catStr, ",")
    val fb      = size(topics) < 2
    val sevTok  = try_element_at(topics, lit(2))
    val known   = severityKnown(sevTok)
    val emptyA  = array().cast(ArrayType(StringType))
    val cats = when(fb, array(lit("unknown"))).otherwise(
      concat(
        array(topics.getItem(0)),
        slice(topics, lit(3), greatest(size(topics) - 2, lit(0))),
        when(known, emptyA).otherwise(array(sevTok))))
    struct(
      when(fb, lit(6).cast(ByteType)).otherwise(severityCode(sevTok)).as("severity"),
      cats.as("categories"),
      when(fb, raw).otherwise(msg).as("message"))
  }

  /** Raw syslog corpus — one line per parser branch (FIXTURES.md §1), with
    * injected deterministic device + event-time companions (the reference
    * stamps wall-clock/remoteAddr, which is untestable). */
  val syslogFixture: Seq[(Int, String, String, String)] = Seq(
    (1,  "firewall,info forward: in:ether1 out:ether2",            "10.0.0.5:51514", "2024-01-01 00:05:00"),
    (2,  "system,error,critical login failure for user admin",     "10.0.0.5:51514", "2024-01-01 00:15:00"),
    (3,  "wireless,fatal radio down",                              "10.0.0.6:41000", "2024-01-01 00:25:00"),
    (4,  "wireless,emergency radio down",                          "10.0.0.6:41000", "2024-01-01 01:05:00"),
    (5,  "dhcp,alert lease pool exhausted",                        "10.0.0.7:5514",  "2024-01-01 01:15:00"),
    (6,  "system,critical disk failure",                           "10.0.0.5:51514", "2024-01-01 01:25:00"),
    (7,  "interface,warning link flap on ether3",                  "10.0.0.8:514",   "2024-01-01 02:05:00"),
    (8,  "dns,notice cache flushed",                               "10.0.0.8:514",   "2024-01-01 02:15:00"),
    (9,  "firewall,debug rule matched",                            "10.0.0.5:51514", "2024-01-01 02:25:00"),
    (10, "sniffer,packet tcp 10.0.0.1:443",                        "10.0.0.9:60000", "2024-01-01 03:05:00"),
    (11, "ppp,raw LCP echo",                                       "10.0.0.9:60000", "2024-01-01 03:15:00"),
    (12, "vpn,weird tunnel established",                           "10.0.0.7:5514",  "2024-01-01 03:25:00"),
    (13, "a,unknownsev,b,c msg body",                              "10.0.0.7:5514",  "2024-01-01 04:05:00"),
    (14, "<166>1 2023-10-27T10:00:00+00:00 MyDevice this is a test", "10.0.0.10:1000", "2024-01-01 04:15:00"),
    (15, "plainword no commas here",                               "10.0.0.10:1000", "2024-01-01 04:25:00"),
    (16, "nospacetoken",                                           "10.0.0.11:2000", "2024-01-01 05:05:00"),
    (17, "",                                                       "10.0.0.11:2000", "2024-01-01 05:15:00"),
    (18, "firewall,info ",                                         "10.0.0.5:51514", "2024-01-01 05:25:00"),
    (19, "firewall,info forward: in:ether1 out:ether2",            "10.0.0.12:3000", "2024-01-01 05:35:00"))

  /** fixture as a DataFrame: id, raw, device, ts */
  def rawLines(s: SparkSession): DataFrame = {
    import s.implicits._
    syslogFixture.toDF("id", "raw", "device", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s")))
      .drop("ts_s")
  }

  /** the same fixture as a DuckDB VALUES relation `f(id, raw, device, ts)` */
  def rawLinesValuesSql: String =
    syslogFixture.map { case (id, raw, dev, ts) =>
      val esc = raw.replace("'", "''")
      s"($id, '$esc', '$dev', TIMESTAMP '$ts')"
    }.mkString("(VALUES ", ", ", ") f(id, raw, device, ts)")

  /** DuckDB twin of parseSyslog over `$rel` (a relation with id/raw/...):
    * produces id, severity TINYINT, categories VARCHAR[], message. */
  def parseSyslogOracleSql(rel: String): String = {
    val knownList = knownTokens.map(t => s"'$t'").mkString(", ")
    val sevCase = severityTokens.map { case (t, c) => s"WHEN sevtok = '$t' THEN $c" }.mkString(" ")
    s"""WITH src AS (SELECT * FROM $rel),
       |p AS (SELECT *,
       |  CASE WHEN strpos(raw, ' ') > 0 THEN substr(raw, 1, strpos(raw, ' ') - 1) ELSE raw END AS catstr,
       |  CASE WHEN strpos(raw, ' ') > 0 THEN substr(raw, strpos(raw, ' ') + 1) ELSE '' END AS msg
       |  FROM src),
       |tt AS (SELECT *, string_split(catstr, ',') AS topics FROM p),
       |d AS (SELECT *, len(topics) AS n,
       |  CASE WHEN len(topics) >= 2 THEN topics[2] ELSE NULL END AS sevtok FROM tt)
       |SELECT id,
       |  CAST(CASE WHEN n < 2 THEN 6 $sevCase ELSE 6 END AS TINYINT) AS severity,
       |  CASE WHEN n < 2 THEN ['unknown']
       |       ELSE list_concat(list_concat([topics[1]], topics[3:]),
       |                        CASE WHEN sevtok IN ($knownList) THEN []::VARCHAR[] ELSE [sevtok] END)
       |  END AS categories,
       |  CASE WHEN n < 2 THEN raw ELSE msg END AS message
       |FROM d""".stripMargin
  }
}
