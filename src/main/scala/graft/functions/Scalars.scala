package graft.functions

import graft.util._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2 B.8 — the ClickHouse scalar-function families usable over
  * the mikrotik_logs schema, exercised on the fixture tables. All stock
  * `org.apache.spark.sql.functions` (whole-stage codegen'd, no UDF).
  * Oracle SQL pins every cross-dialect divergence explicitly (dayofweek
  * base, floor/ceil return types, regex dialect kept to the common subset).
  */
object Scalars {

  def strBasic(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").select(
        col("p_partkey"),
        lower(col("p_name")).as("lname"),
        upper(col("p_brand")).as("ubrand"),
        length(col("p_name")).as("len"),
        trim(col("p_name")).as("trimmed"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("cat"),
        substring(col("p_type"), 1, 5).as("type5"))
      .orderBy("p_partkey")

  val strBasicSql =
    """SELECT p_partkey, lower(p_name) AS lname, upper(p_brand) AS ubrand,
      |length(p_name) AS len, trim(p_name) AS trimmed,
      |concat(p_brand, '#', p_type) AS cat, substr(p_type, 1, 5) AS type5
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Device endpoint normalization (SURVEY.md §1.2) over BOTH address
    * families: the syslog fixture's v4:port stamps unioned with
    * [[graft.model.deviceFormFixture]]'s v6/bare forms, split by the
    * shared [[graft.model.deviceIp]]/[[graft.model.devicePort]] pair —
    * the v6-safe replacement for the bare `substring_index(device,':',1)`
    * idiom (which reads "[2001" out of a bracketed v6 stamp). last_octet
    * only has meaning for dotted-quad addresses and is null for v6. */
  def strSplitIndex(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val devices = graft.model.rawLines(s).select(col("id"), col("device"))
      .union(graft.model.deviceFormFixture.toDF("id", "device"))
    val ip = graft.model.deviceIp(col("device"))
    devices.select(
        col("id"), col("device"), ip.as("ip"),
        graft.model.devicePort(col("device")).as("port"),
        ip.contains(":").as("is_v6"),
        when(!ip.contains(":"), element_at(split(ip, "\\."), 4)).as("last_octet"))
      .orderBy("id")
  }

  val strSplitIndexSql =
    s"""WITH d AS (
       |  SELECT id, device FROM ${graft.model.rawLinesValuesSql}
       |  UNION ALL SELECT id, device FROM ${graft.model.deviceFormsValuesSql}),
       |x AS (SELECT id, device,
       |  ${graft.model.deviceIpSqlExpr("device")} AS ip,
       |  ${graft.model.devicePortSqlExpr("device")} AS port FROM d)
       |SELECT id, device, ip, port, contains(ip, ':') AS is_v6,
       |  CASE WHEN NOT contains(ip, ':') THEN string_split(ip, '.')[4] END AS last_octet
       |FROM x ORDER BY id""".stripMargin

  def strMatch(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .where(col("p_name").like("%a%") && col("p_type").rlike("BRASS|STEEL"))
      .select(col("p_partkey"), col("p_name"), col("p_type"),
        col("p_brand").ilike("BRAND%").as("is_brand"))
      .orderBy("p_partkey")

  val strMatchSql =
    """SELECT p_partkey, p_name, p_type, p_brand ILIKE 'BRAND%' AS is_brand
      |FROM part WHERE p_name LIKE '%a%' AND regexp_matches(p_type, 'BRASS|STEEL')
      |ORDER BY p_partkey""".stripMargin

  /** pull the first integer out of the JSON-ish props text */
  def strRegexExtract(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(
        col("event_id"),
        regexp_extract(col("props"), "([0-9]+)", 1).as("first_num"))
      .orderBy("event_id")

  val strRegexExtractSql =
    """SELECT event_id, coalesce(regexp_extract(props, '([0-9]+)', 1), '') AS first_num
      |FROM events ORDER BY event_id""".stripMargin

  def strReplace(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").select(
        col("p_partkey"),
        regexp_replace(col("p_type"), "[AEIOU]", "_").as("novowel"),
        translate(col("p_name"), " ", "-").as("dashed"))
      .orderBy("p_partkey")

  val strReplaceSql =
    """SELECT p_partkey, regexp_replace(p_type, '[AEIOU]', '_', 'g') AS novowel,
      |replace(p_name, ' ', '-') AS dashed
      |FROM part ORDER BY p_partkey""".stripMargin

  /** THE canonical log query: time-bucketed counts */
  def dateTrunc(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
      .orderBy("hour")

  val dateTruncSql =
    """SELECT date_trunc('hour', ts::TIMESTAMP) AS hour, count(*) AS n
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** date part extraction — dow numbering pinned: Spark 1=Sunday,
    * DuckDB dayofweek 0=Sunday → oracle adds 1 */
  def dateParts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        hour(col("o_orderdate")).as("h"),
        dayofweek(col("o_orderdate")).as("dow"),
        quarter(col("o_orderdate")).as("q"))
      .orderBy("o_orderkey")

  val datePartsSql =
    """SELECT o_orderkey, year(o_orderdate)::INT AS y, month(o_orderdate)::INT AS m,
      |day(o_orderdate)::INT AS d, hour(o_orderdate)::INT AS h,
      |(dayofweek(o_orderdate) + 1)::INT AS dow, quarter(o_orderdate)::INT AS q
      |FROM orders ORDER BY o_orderkey""".stripMargin

  def dateArith(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
        col("o_orderkey"),
        date_add(col("o_orderdate"), 30).as("due"),
        datediff(lit("2025-01-01").cast(DateType), col("o_orderdate")).as("age_days"),
        (col("o_orderdate") + expr("INTERVAL 90 DAYS")).as("plus90"))
      .orderBy("o_orderkey")

  val dateArithSql =
    """SELECT o_orderkey, (o_orderdate::DATE + 30) AS due,
      |date_diff('day', o_orderdate::DATE, DATE '2025-01-01') AS age_days,
      |o_orderdate + INTERVAL 90 DAY AS plus90
      |FROM orders ORDER BY o_orderkey""".stripMargin

  def dateFormat(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        to_date(col("o_orderdate")).as("d"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"))
      .orderBy("o_orderkey")

  val dateFormatSql =
    """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m') AS ym,
      |o_orderdate::DATE AS d, epoch(o_orderdate)::BIGINT AS epoch_s
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** math family; libm-edge functions (sqrt/ln/exp) round(…,4) — values
    * are far from .00005 boundaries at these magnitudes */
  def mathFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .where(col("l_orderkey") <= 200)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        r4(sqrt(col("l_quantity"))).as("sqrt_q"),
        r4(log(col("l_quantity") + 1)).as("ln_q"),
        r4(exp(col("l_discount"))).as("exp_d"),
        r4(pow(col("l_quantity"), 2)).as("q2"),
        floor(col("l_extendedprice")).cast(LongType).as("fl"),
        ceil(col("l_extendedprice")).cast(LongType).as("ce"),
        abs(col("l_quantity") * -1).as("absq"),
        (col("l_quantity").cast(LongType) % 7).as("mod7"),
        (col("l_quantity").cast(LongType) / lit(7L)).cast(LongType).as("div7"))
      .orderBy("l_orderkey", "l_linenumber")

  val mathFuncsSql =
    """SELECT l_orderkey, l_linenumber,
      |CAST(round(sqrt(l_quantity), 4) AS DOUBLE) AS sqrt_q,
      |CAST(round(ln(l_quantity + 1), 4) AS DOUBLE) AS ln_q,
      |CAST(round(exp(l_discount), 4) AS DOUBLE) AS exp_d,
      |CAST(round(pow(l_quantity, 2), 4) AS DOUBLE) AS q2,
      |CAST(floor(l_extendedprice) AS BIGINT) AS fl,
      |CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
      |abs(l_quantity * -1) AS absq,
      |CAST(l_quantity AS BIGINT) % 7 AS mod7,
      |CAST(l_quantity AS BIGINT) // 7 AS div7
      |FROM lineitem WHERE l_orderkey <= 200 ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** if/multiIf/coalesce/nullIf/greatest/least */
  def condFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 5000, "low")
          .otherwise("high").as("band"),
        greatest(col("c_acctbal"), lit(0.0)).as("bal_pos"),
        least(col("c_acctbal"), lit(1000.0)).as("bal_cap"),
        nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_nb"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("-")).as("seg_c"))
      .orderBy("c_custkey")

  val condFuncsSql =
    """SELECT c_custkey,
      |CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS band,
      |greatest(c_acctbal, 0.0) AS bal_pos,
      |least(c_acctbal, 1000.0) AS bal_cap,
      |nullif(c_mktsegment, 'BUILDING') AS seg_nb,
      |coalesce(nullif(c_mktsegment, 'BUILDING'), '-') AS seg_c
      |FROM customer ORDER BY c_custkey""".stripMargin

  def arrayFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .where(col("doc_id") < 50)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(
        col("doc_id"),
        size(col("toks")).as("n_toks"),
        array_contains(col("toks"), "spark").as("has_spark"),
        array_position(col("toks"), "spark").as("spark_pos"),
        array_join(array_sort(array_distinct(col("toks"))), "|").as("vocab"),
        array_join(slice(col("toks"), 1, 3), "_").as("first3"))
      .orderBy("doc_id")

  val arrayFuncsSql =
    """SELECT doc_id, len(toks) AS n_toks, list_contains(toks, 'spark') AS has_spark,
      |coalesce(list_position(toks, 'spark'), 0) AS spark_pos,
      |array_to_string(list_sort(list_distinct(toks)), '|') AS vocab,
      |array_to_string(toks[1:3], '_') AS first3
      |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id < 50) x
      |ORDER BY doc_id""".stripMargin

  /** higher-order lambdas: filter / transform */
  def arrayLambda(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .where(col("doc_id") < 50)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(
        col("doc_id"),
        array_join(filter(col("toks"), x => length(x) > 4), "|").as("long_toks"),
        array_join(transform(col("toks"), x => upper(x)), "|").as("upper_toks"),
        aggregate(col("toks"), lit(0L), (acc, x) => acc + length(x)).as("total_chars"))
      .orderBy("doc_id")

  val arrayLambdaSql =
    """SELECT doc_id, array_to_string(list_filter(toks, x -> length(x) > 4), '|') AS long_toks,
      |array_to_string(list_transform(toks, x -> upper(x)), '|') AS upper_toks,
      |coalesce(list_sum(list_transform(toks, x -> length(x))), 0)::BIGINT AS total_chars
      |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id < 50) x
      |ORDER BY doc_id""".stripMargin

  /** arrayJoin / UNNEST — 1→N generator */
  def explodeQ(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .where(col("doc_id") < 10)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .orderBy("doc_id", "pos")

  val explodeSql =
    """SELECT doc_id, (i - 1)::INT AS pos, toks[i] AS tok
      |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id < 10) x
      |JOIN generate_series(1, 100000) g(i) ON i <= len(toks)
      |ORDER BY doc_id, pos""".stripMargin

  /** JSONExtract on events.props */
  def jsonExtract(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k"),
        from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
          .getField("k").as("k_typed"))
      .orderBy("event_id")

  val jsonExtractSql =
    """SELECT event_id, json_extract_string(props, '$.k')::INT AS k,
      |json_extract(props, '$.k')::INT AS k_typed
      |FROM events ORDER BY event_id""".stripMargin

  /** MapType surface: JSON props → typed map, key/value extraction */
  def mapFuncs(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(
        col("event_id"),
        from_json(col("props"), MapType(StringType, IntegerType)).as("m"))
      .select(
        col("event_id"),
        array_join(array_sort(map_keys(col("m"))), "|").as("keys"),
        size(map_keys(col("m"))).as("n_keys"),
        col("m").getItem("k").as("k_val"))
      .orderBy("event_id")

  val mapFuncsSql =
    """SELECT event_id, array_to_string(list_sort(json_keys(props)), '|') AS keys,
      |len(json_keys(props)) AS n_keys,
      |json_extract_string(props, '$.k')::INT AS k_val
      |FROM events ORDER BY event_id""".stripMargin

  /** edit distance (ClickHouse editDistance / fuzzy text matching) */
  def strDistance(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").select(
        col("p_partkey"),
        levenshtein(col("p_brand"), lit("Brand#11")).as("d_brand"),
        levenshtein(substring(col("p_name"), 1, 10), substring(col("p_type"), 1, 10)).as("d_nt"))
      .orderBy("p_partkey")

  val strDistanceSql =
    """SELECT p_partkey, levenshtein(p_brand, 'Brand#11') AS d_brand,
      |levenshtein(substr(p_name, 1, 10), substr(p_type, 1, 10)) AS d_nt
      |FROM part ORDER BY p_partkey""".stripMargin

  /** IPv4 dotted-quad ↔ uint32 (ClickHouse IPv4StringToNum/NumToString) —
    * pure arithmetic, no inet builtins needed, oracle-portable; runs on the
    * syslog fixture's device ip:port values */
  /** dotted-quad text → uint32-as-long, shared by the v4 family */
  private def ip4Num(ip: Column): Column = {
    val oct = (i: Int) => element_at(split(ip, "\\."), i).cast(LongType)
    oct(1) * 16777216L + oct(2) * 65536L + oct(3) * 256L + oct(4)
  }

  def ipFuncs(s: SparkSession, dir: String): DataFrame = {
    val ip = graft.model.deviceIp(col("device")) // v6-safe split (all-v4 fixture)
    val ipNum = ip4Num(ip)
    graft.model.rawLines(s).select(
        col("id"), ip.as("ip"), ipNum.as("ip_num"),
        concat_ws(".",
          (ipNum / 16777216L).cast(LongType).cast(StringType),
          ((ipNum / 65536L).cast(LongType) % 256L).cast(StringType),
          ((ipNum / 256L).cast(LongType) % 256L).cast(StringType),
          (ipNum % 256L).cast(StringType)).as("roundtrip"),
        (ipNum.bitwiseAND(lit(4294901760L)) === lit(167772160L)).as("in_10_0"))
      .orderBy("id")
  }

  val ipFuncsSql = {
    val rel = graft.model.rawLinesValuesSql
    s"""WITH b AS (SELECT id, ${graft.model.deviceIpSqlExpr("device")} AS ip FROM $rel),
       |n AS (SELECT id, ip,
       |  string_split(ip, '.')[1]::BIGINT * 16777216 + string_split(ip, '.')[2]::BIGINT * 65536
       |  + string_split(ip, '.')[3]::BIGINT * 256 + string_split(ip, '.')[4]::BIGINT AS ip_num
       |  FROM b)
       |SELECT id, ip, ip_num,
       |  concat_ws('.', (ip_num // 16777216)::VARCHAR, ((ip_num // 65536) % 256)::VARCHAR,
       |    ((ip_num // 256) % 256)::VARCHAR, (ip_num % 256)::VARCHAR) AS roundtrip,
       |  (ip_num & 4294901760) = 167772160 AS in_10_0
       |FROM n ORDER BY id""".stripMargin
  }

  // ---- longest-prefix-match subnet enrichment ---------------------------
  /** CIDR → zone catalog for the LPM join: nested prefixes (8/28/29 over
    * the fixture's 10.0.0.x devices) so longest-match is observable, a
    * sibling /16, and the /0 default route so every ip classifies. */
  val CidrCatalog: Seq[(String, String)] = Seq(
    ("10.0.0.0/8", "corp"),
    ("10.0.0.0/28", "corp-core"),   // .0-.15: fixture devices .5-.7
    ("10.0.0.8/29", "corp-infra"),  // .8-.15: fixture devices .8-.12
    ("192.168.0.0/16", "lab"),
    ("0.0.0.0/0", "default"))

  private def maskOf(len: Int): Long =
    if (len == 0) 0L else (0xFFFFFFFFL << (32 - len)) & 0xFFFFFFFFL

  private def dottedToLong(s: String): Long =
    s.split("\\.").map(_.toLong).reduceLeft(_ * 256L + _)

  /** Longest-prefix-match enrichment of device IPs against a CIDR → zone
    * catalog (the ClickHouse ip_trie-dictionary analog) in ITS scalable
    * join shape: instead of a range/cross join, each ip expands to one
    * masked candidate PER DISTINCT PREFIX LENGTH IN THE CATALOG (a
    * catalog property, ≤ 33, here 5) and equi-joins (net, mlen) against
    * the broadcast prefix table; LPM is then a max_by per ip. Works
    * unchanged with a million-entry prefix table — the fan-out is bounded
    * by mask-length diversity, never by table size, and the join stays a
    * hash join on scaling keys. */
  def ipLpmJoin(s: SparkSession, dir: String): DataFrame =
    deviceZones(s).orderBy("id")

  /** LPM zone as ONE when-chain expression, DUAL-STACK: v4 devices match
    * [[CidrCatalog]], v6 devices (any stamp form `model.deviceIp`
    * splits) match [[Cidr6Catalog]] over the (hi, lo) words — each
    * catalog sorted mask-desc, so first match IS the longest match.
    * This is the pure-projection form for STREAMS and NOC-sized
    * catalogs, where a per-row join would add a stateful stage for a
    * constant table; [[deviceZones]]' candidate/equi-join form is the
    * million-entry path. Unparseable devices fall through to 'unzoned'
    * (both catalogs carry their own /0 default, so parsed addresses
    * always classify); v6 zone ids are stripped before the group parse. */
  def zoneOfDevice(device: Column): Column = {
    val ip = graft.model.deviceIp(device)
    val ipl = lower(ip)
    val stripped = regexp_replace(ipl, "%.*$", "")
    // a v4-MAPPED literal (::ffff:a.b.c.d) is a v4 SENDER seen through a
    // dual-stack socket — it classifies under the v4 catalog, like the
    // dotted-quad stamp the same sender produces on a v4 bind. The gate
    // runs on the ZONE-STRIPPED literal so '::ffff:10.0.0.9%eth0'
    // classifies like its unsuffixed spelling; the non-canonical mapped
    // spellings ('0:0:0:0:0:ffff:a.b.c.d', '::ffff:a00:9') route through
    // the v6 branch, whose NUMERIC mapped check (hi == 0, lo >> 32 ==
    // 0xffff) reroutes them to the same v4 catalog — text-form-blind.
    when(stripped.rlike(MappedV4Re),
        zone4OfIp(regexp_extract(stripped, "^::ffff:(.*)$", 1)))
      // v6 shape gate before the word derivation: Spark's conv() parses
      // the leading valid-digit prefix of garbage (conv('foo',16,10) →
      // 15, non-null), so ungated colon-bearing junk would derive real
      // words and classify ::/0 'default' instead of 'unzoned'
      .when(ip.contains(":") && stripped.rlike(V6ShapeRe) &&
          size(split(stripped, ":")) <= 9, zone6OfIp(stripped))
      // dotted-quad shape gate before the v4 arithmetic: a hostname or a
      // malformed stamp would otherwise hit an ANSI cast error inside
      // ip4Num — streams carry whatever senders stamp, so the expression
      // must be TOTAL; octets are BOUNDED (≤ 255) so an out-of-range quad
      // like 266.0.0.5 classifies 'unzoned' instead of wrapping mod 2^32
      // into a real zone
      .when(ip.rlike(DottedQuadRe), zone4OfIp(ip))
      .otherwise(lit("unzoned"))
  }

  /** one bounded octet, leading zeros FORBIDDEN ('10.01.2.3' is ambiguous
    * — octal per inet_aton, decimal per most parsers — so the shared gate
    * rejects the whole class instead of picking a reading) */
  private val OctetRe = "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"

  /** anchored octet-bounded dotted-quad gate, shared by the streaming
    * classifier and the batch LPM join so both are total under the same
    * definition of "parseable v4" */
  private[graft] val DottedQuadRe = s"^$OctetRe(\\.$OctetRe){3}$$"

  /** shape gate for the v6 branch of both classifiers: hex groups (1-4
    * digits) in full, compressed, or RFC 4291 §2.2 mixed (dotted-quad
    * tail) notation. Applied to the lowercase zone-stripped literal
    * BEFORE the quad-tail rewrite; paired with a group-count bound
    * (split-on-':' length ≤ 9) since the per-side {0,6} repetitions
    * can't see across the '::'. Junk that fails either lands 'unzoned'
    * — conv()'s prefix-parsing never sees it. */
  private[graft] val V6ShapeRe = {
    val h = "[0-9a-f]{1,4}"
    val q = s"$OctetRe(\\.$OctetRe){3}"
    s"^($h(:$h){7}" + // full form, 8 hex groups
      s"|$h(:$h){5}:$q" + // full form, 6 hex groups + quad tail
      s"|($h(:$h){0,6})?::($h(:$h){0,6})?" + // compressed
      s"|($h(:$h){0,4})?::($h(:$h){0,4}:)?$q)$$" // compressed + quad tail
  }

  private def zone4OfIp(ip: Column): Column = zone4OfNum(ip4Num(ip))

  private def zone4OfNum(ipNum: Column): Column = {
    val sorted = CidrCatalog.map { case (cidr, zone) =>
      val Array(net, len) = cidr.split("/")
      (dottedToLong(net), len.toInt, zone)
    }.sortBy(-_._2)
    coalesce(
      sorted.foldLeft(lit(null).cast(StringType)) { case (acc, (net, len, zone)) =>
        coalesce(acc, when(ipNum.bitwiseAND(lit(maskOf(len))) === lit(net), zone))
      },
      lit("unzoned"))
  }

  private def zone6OfIp(ipl: Column): Column = {
    val hi = ip6Word(ipl, 1, 2, 3, 4)
    val lo = ip6Word(ipl, 5, 6, 7, 8)
    val sorted = Cidr6Catalog.map { case (cidr, zone) =>
      val Array(net, len) = cidr.split("/")
      val (nHi, nLo) = ip6ToWords(net)
      val l = len.toInt
      (nHi & mask6Hi(l), nLo & mask6Lo(l), l, zone)
    }.sortBy(-_._3)
    // numeric v4-mapped check AFTER the word parse: any spelling of
    // ::ffff:a.b.c.d/128 — uncompressed, hex-tail, mixed case — is a v4
    // sender and reroutes to the v4 catalog, matching the batch LPM
    when(hi === lit(0L) && shiftrightunsigned(lo, 32) === lit(0xffffL),
        zone4OfNum(lo.bitwiseAND(lit(0xffffffffL))))
      .otherwise(coalesce(
        sorted.foldLeft(lit(null).cast(StringType)) {
          case (acc, (nHi, nLo, l, zone)) =>
            coalesce(acc, when(
              hi.bitwiseAND(lit(mask6Hi(l))) === lit(nHi) &&
                lo.bitwiseAND(lit(mask6Lo(l))) === lit(nLo), zone))
        },
        lit("unzoned")))
  }

  /** the unordered LPM core — (id, ip, zone, masklen) per fixture line;
    * composed by `Syslog.zoneSeverityHourly` without the presentation
    * sort */
  def deviceZones(s: SparkSession): DataFrame =
    deviceZonesOf(s, graft.model.rawLines(s).select(
      col("id"), graft.model.deviceIp(col("device")).as("ip")))

  /** the mapped-v4 gate shared by the streaming classifier and the batch
    * LPM: a `::ffff:a.b.c.d` literal IS a v4 sender */
  private[graft] val MappedV4Re = "^::ffff:" + DottedQuadRe.substring(1)

  /** The LPM core over ANY (id, ip) frame — DUAL-STACK and TOTAL, the
    * batch twin of [[zoneOfDevice]] branch for branch: plain dotted
    * quads and v4-MAPPED literals route through the v4 catalog's
    * candidate/equi-join; v6 literals (zone ids stripped) through the
    * v6 catalog's; everything else — hostnames, malformed stamps,
    * out-of-range octets, unparseable hex — lands 'unzoned' instead of
    * throwing. All three branches are filtered passes over the same
    * scan (filters push down; the union is append, not a shuffle), and
    * both join sides stay bounded-fan-out broadcast equi-joins at any
    * catalog size. Zone parity with the streaming classifier is
    * spec-pinned (ZoneSpec); masklen is the batch form's extra. */
  def deviceZonesOf(s: SparkSession, base: DataFrame): DataFrame = {
    import s.implicits._
    val ipl = lower(col("ip"))
    val stripped = regexp_replace(ipl, "%.*$", "")
    val isV4 = col("ip").rlike(DottedQuadRe)
    // zone-stripped like the streaming gate: '::ffff:10.0.0.9%eth0' is
    // the same v4 sender as its unsuffixed spelling
    val isMapped = stripped.rlike(MappedV4Re)
    // the v6 shape gate (see V6ShapeRe): colon-bearing junk must null
    // out BEFORE word derivation — conv() would otherwise parse the
    // leading valid-digit prefix of garbage into non-null words that
    // match ::/0 instead of landing 'unzoned'
    val isV6Shape = stripped.rlike(V6ShapeRe) && size(split(stripped, ":")) <= 9

    // ONE family-tagged broadcast prefix table (v4 nets ride net_hi,
    // net_lo = 0) — dual-stack costs no extra join or scan pass: the
    // same single explode → broadcast LEFT join → max_by as the v4-only
    // form (a 3-branch union form measured 5x the fixture latency and
    // would scan the base three times at scale)
    val prefixes = (CidrCatalog.map { case (cidr, zone) =>
        val Array(net, len) = cidr.split("/")
        (4, dottedToLong(net), 0L, len.toInt, zone)
      } ++ Cidr6Catalog.map { case (cidr, zone) =>
        val Array(net, len) = cidr.split("/")
        val (hi, lo) = ip6ToWords(net)
        val l = len.toInt
        (6, hi & mask6Hi(l), lo & mask6Lo(l), l, zone)
      }).toDF("family", "net_hi", "net_lo", "mlen", "zone")

    // Materialize the parsed address in STAGED projections before the
    // candidate fan-out — this bounds the expression tree, which is a
    // DRIVER-scaling concern, not a row one: embedding the word trees in
    // every per-length struct multiplied the plan ~20x (10 MiB task
    // binaries), and even one flat projection re-deriving the quad-tail
    // rewrite per hex group cost ~1 s of Catalyst analysis per
    // invocation. Stage 1 normalizes the literal once; stage 2 derives
    // the two words from that single column; candidates then reference
    // plain attributes. (Catalyst's CollapseProject keeps multi-use
    // non-cheap projections staged, so the shape survives optimization.)
    val v4num = ip4Num(
      when(isV4, col("ip")).otherwise(regexp_extract(stripped, "^::ffff:(.*)$", 1)))
    val pre = base.select(col("id"), col("ip"),
      when(isV4 || isMapped, v4num).as("ip4num0"),
      when(!isV4 && !isMapped && col("ip").contains(":") && isV6Shape,
        ip6HexTail(stripped)).as("ip6n"))
    // words are guarded on the normalized literal: a NULL ip6n (non-v6
    // rows, shape-gate rejects) would otherwise decompose into all-"0"
    // groups (the missing-group default) and wrongly match ::/0 —
    // malformed stamps must land 'unzoned' like the streaming when-chain
    // sends them
    val enriched = pre.select(col("id"), col("ip"), col("ip4num0"),
      when(col("ip6n").isNotNull,
        ip6WordRaw(col("ip6n"), 1, 2, 3, 4)).as("hi6"),
      when(col("ip6n").isNotNull,
        ip6WordRaw(col("ip6n"), 5, 6, 7, 8)).as("lo6"))
    // numeric v4-mapped reroute, matching the streaming classifier: any
    // spelling of ::ffff:a.b.c.d that reached the v6 word parse
    // (uncompressed, hex-tail, zone-suffixed) carries hi == 0 and
    // lo >> 32 == 0xffff — it is a v4 SENDER and joins the v4 catalog
    val routed = enriched.select(col("id"), col("ip"),
      coalesce(col("ip4num0"),
        when(col("hi6") === lit(0L) &&
            shiftrightunsigned(col("lo6"), 32) === lit(0xffffL),
          col("lo6").bitwiseAND(lit(0xffffffffL)))).as("ip4num"),
      col("hi6"), col("lo6"))

    val v4Cands = array(CidrCatalog.map(_._1.split("/")(1).toInt).distinct.sorted
      .map(l => struct(lit(4).as("family"),
        col("ip4num").bitwiseAND(lit(maskOf(l))).as("net_hi"),
        lit(0L).as("net_lo"), lit(l).as("mlen"))): _*)
    val v6Cands = array(cidr6Lens.map(l => struct(lit(6).as("family"),
      col("hi6").bitwiseAND(lit(mask6Hi(l))).as("net_hi"),
      col("lo6").bitwiseAND(lit(mask6Lo(l))).as("net_lo"), lit(l).as("mlen"))): _*)
    // malformed stamps (no family: shape-gated out before word
    // derivation, the same rows the streaming when-chain rejects) get a
    // NULL candidate array: explode_outer keeps the row, the left join
    // misses, and the coalesce lands it 'unzoned' — total, one pass.
    // ip4num-first means numerically-rerouted mapped rows take the v4
    // candidates even though their v6 words are non-null.
    val cands = when(col("ip4num").isNotNull, v4Cands)
      .when(col("hi6").isNotNull && col("lo6").isNotNull, v6Cands)

    routed.select(col("id"), col("ip"), explode_outer(cands).as("c"))
      .select(col("id"), col("ip"), col("c.family").as("family"),
        col("c.net_hi").as("net_hi"), col("c.net_lo").as("net_lo"),
        col("c.mlen").as("mlen"))
      .join(broadcast(prefixes), Seq("family", "net_hi", "net_lo", "mlen"), "left")
      .groupBy("id", "ip")
      // unmatched candidate rows carry a null zone: key max_by off them
      // (null ordering values are ignored) so a missed /29 candidate
      // can't shadow the matched /28 underneath it
      .agg(coalesce(max_by(col("zone"),
          when(col("zone").isNotNull, col("mlen"))), lit("unzoned")).as("zone"),
        max(when(col("zone").isNotNull, col("mlen"))).as("masklen"))
  }

  val ipLpmJoinSql: String = {
    val pfx = CidrCatalog.map { case (cidr, zone) =>
      val Array(net, len) = cidr.split("/")
      s"(${dottedToLong(net)}, ${len.toInt}, '$zone')"
    }.mkString(", ")
    val rel = graft.model.rawLinesValuesSql
    s"""WITH d AS (SELECT id, ${graft.model.deviceIpSqlExpr("device")} AS ip FROM $rel),
       |n AS (SELECT id, ip,
       |  string_split(ip, '.')[1]::BIGINT * 16777216 + string_split(ip, '.')[2]::BIGINT * 65536
       |  + string_split(ip, '.')[3]::BIGINT * 256 + string_split(ip, '.')[4]::BIGINT AS ip_num
       |  FROM d WHERE regexp_matches(ip, '$DottedQuadRe')),
       |pfx(net, mlen, zone) AS (VALUES $pfx),
       |hits AS (SELECT n.id, n.ip, p.mlen, p.zone
       |  FROM n JOIN pfx p
       |    ON (n.ip_num & (4294967296 - (1::BIGINT << (32 - p.mlen)))) = p.net)
       |SELECT id, ip, max_by(zone, mlen) AS zone, max(mlen)::INT AS masklen
       |FROM hits GROUP BY id, ip
       |UNION ALL
       |SELECT id, ip, 'unzoned' AS zone, NULL::INT AS masklen
       |FROM d WHERE NOT regexp_matches(ip, '$DottedQuadRe')
       |ORDER BY id""".stripMargin
  }

  /** IPv6 text ↔ 128-bit arithmetic (ClickHouse IPv6StringToNum/
    * NumToString analog), the 128-bit value carried as two BIGINTs
    * (hi = groups 1-4 as a signed 64-bit word, lo = groups 5-8): `::`
    * decompression is pure column algebra — split on '::', count the
    * explicit groups each side, group i comes from the left slice, the
    * right slice, or the implied zero run — then each hex group converts
    * via `conv`. Emits the canonical FULL form (8 lpad'd lowercase
    * groups — the unambiguous at-rest key form), the /64 network, and a
    * 2001:db8::/32 prefix test computed from the top two groups (no
    * unsigned-shift portability trap). Embedded dotted-quad tails
    * (`::ffff:192.0.2.1` — the one v6 text form a dual-stack fleet emits
    * for v4 senders — and any RFC 4291 §2.2 mixed-notation literal such
    * as the NAT64 64:ff9b::a.b.c.d) pre-normalize into their two hex
    * groups via [[ip6HexTail]] before decompression. */
  /** the embedded dotted-quad tail regex — end-anchored AND
    * start-delimited (`(^|:)`, group 1), octet-bounded (group 2 = the
    * quad) so a malformed quad (octet > 255) falls through WHOLE to the
    * hex parse rather than partially matching its own suffix
    * (`266.0.0.5` must not rewrite as `2` + hex("66.0.0.5")) or
    * silently wrapping mod 2^32 */
  private val QuadTailRe = s"(^|:)($OctetRe(\\.$OctetRe){3})$$"

  /** rewrite an embedded dotted-quad tail into its two hex groups
    * (`::ffff:192.0.2.1` → `::ffff:c000:201`) so the group decompressor
    * sees pure hex — total (literals without a quad tail pass through
    * untouched), pure column algebra, shared with the DuckDB twin via
    * [[ip6HexTailSqlExpr]] */
  private def ip6HexTail(ipl: Column): Column = {
    val quad = regexp_extract(ipl, QuadTailRe, 2)
    def oct(i: Int) = element_at(split(quad, "\\."), i).cast(LongType)
    def hx(n: Column) = lower(conv(n.cast(StringType), 10, 16))
    // the $1 backreference keeps the delimiting colon the match consumed
    when(quad === "", ipl)
      .otherwise(concat(regexp_replace(ipl, QuadTailRe, "$1"),
        hx(oct(1) * 256L + oct(2)), lit(":"), hx(oct(3) * 256L + oct(4))))
  }

  /** DuckDB twin of [[ip6HexTail]] over an expression `e` — same anchored
    * octet-bounded tail regex, same `prefix || hex(o1*256+o2) || ':' ||
    * hex(o3*256+o4)` rebuild, so both engines decompress the identical
    * canonical form */
  private def ip6HexTailSqlExpr(e: String): String = {
    val re = QuadTailRe // the same RE2 text verbatim in both engines
    def oct(i: Int) =
      s"string_split(regexp_extract($e, '$re', 2), '.')[$i]::BIGINT"
    s"""CASE WHEN regexp_matches($e, '$re')
       |  THEN regexp_replace($e, '$re', '\\1') ||
       |    printf('%x', ${oct(1)} * 256 + ${oct(2)}) || ':' ||
       |    printf('%x', ${oct(3)} * 256 + ${oct(4)})
       |  ELSE $e END""".stripMargin
  }

  /** hex group i (1-8) of a lowercase v6 literal after quad-tail
    * normalization and `::` decompression — shared by the arithmetic
    * family and the v6 LPM join */
  private def ip6GHex(ipl0: Column)(i: Int): Column =
    ip6GHexRaw(ip6HexTail(ipl0))(i)

  /** [[ip6GHex]] WITHOUT the quad-tail rewrite — for callers that
    * pre-normalize the literal once into its own projected column
    * (deviceZonesOf): embedding the rewrite in all 8 group extractions
    * multiplies the expression tree ~8x, which shows up as per-query
    * Catalyst analysis/optimization time, not row work */
  private def ip6GHexRaw(ipl: Column)(i: Int): Column = {
    val parts = split(ipl, "::") // limit -1: "1::" keeps its trailing ""
    val leftS = element_at(parts, 1)
    val rightS = when(size(parts) < 2, lit("")).otherwise(element_at(parts, 2))
    val left = split(leftS, ":")
    val right = split(rightS, ":")
    val nl = when(leftS === "", 0).otherwise(size(left))
    val nr = when(rightS === "", 0).otherwise(size(right))
    when(lit(i) <= nl, element_at(left, i))
      .when(lit(i) > lit(8) - nr, element_at(right, lit(i) - (lit(8) - nr)))
      .otherwise(lit("0"))
  }

  /** canonical FULL form (8 lpad'd lowercase groups) of a lowercase v6
    * literal — the at-rest key rendering; exposed for the randomized
    * round-trip property in UdpSourceSpec */
  def ip6Norm(ipl: Column): Column =
    concat_ws(":", (1 to 8).map(i => lpad(ip6GHex(ipl)(i), 4, "0")): _*)

  /** one signed-64 word from four 16-bit groups */
  private def ip6Word(ipl: Column, a: Int, b: Int, c: Int, d: Int): Column = {
    def g(i: Int) = conv(ip6GHex(ipl)(i), 16, 10).cast(LongType)
    shiftleft(g(a), 48).bitwiseOR(shiftleft(g(b), 32))
      .bitwiseOR(shiftleft(g(c), 16)).bitwiseOR(g(d))
  }

  /** [[ip6Word]] over an ALREADY tail-normalized literal (see
    * [[ip6GHexRaw]]) */
  private def ip6WordRaw(ipl: Column, a: Int, b: Int, c: Int, d: Int): Column = {
    def g(i: Int) = conv(ip6GHexRaw(ipl)(i), 16, 10).cast(LongType)
    shiftleft(g(a), 48).bitwiseOR(shiftleft(g(b), 32))
      .bitwiseOR(shiftleft(g(c), 16)).bitwiseOR(g(d))
  }

  def ip6Funcs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val df = graft.model.ip6Fixture.toDF("id", "ip")
    val ipl = lower(col("ip"))
    def gHex(i: Int) = ip6GHex(ipl)(i)
    def gNum(i: Int) = conv(gHex(i), 16, 10).cast(LongType)
    def word(a: Int, b: Int, c: Int, d: Int) = ip6Word(ipl, a, b, c, d)
    val norm = concat_ws(":", (1 to 8).map(i => lpad(gHex(i), 4, "0")): _*)
    val net64 = concat(
      concat_ws(":", (1 to 4).map(i => lpad(gHex(i), 4, "0")): _*),
      lit(":0000:0000:0000:0000"))
    df.select(col("id"), col("ip"),
        word(1, 2, 3, 4).as("hi"), word(5, 6, 7, 8).as("lo"),
        norm.as("norm"), net64.as("net64"),
        (gNum(1) * 65536L + gNum(2) === lit(0x20010db8L)).as("in_doc32"))
      .orderBy("id")
  }

  val ip6FuncsSql = {
    val hs = (1 to 8).map(i =>
      s"CASE WHEN $i <= nl THEN ll[$i] WHEN $i > 8 - nr THEN rl[$i - (8 - nr)] ELSE '0' END AS h$i")
      .mkString(",\n|  ")
    val gs = (1 to 8).map(i => s"('0x' || h$i)::BIGINT AS g$i").mkString(", ")
    def word(a: Int, b: Int, c: Int, d: Int) =
      s"(CASE WHEN g$a >= 32768 THEN g$a - 65536 ELSE g$a END) * 281474976710656" +
        s" + g$b * 4294967296 + g$c * 65536 + g$d"
    val pads = (1 to 8).map(i => s"lpad(h$i, 4, '0')").mkString(", ")
    val pads4 = (1 to 4).map(i => s"lpad(h$i, 4, '0')").mkString(", ")
    s"""WITH d AS (SELECT id, ip FROM ${graft.model.ip6ValuesSql}),
       |pn AS (SELECT id, ip, ${ip6HexTailSqlExpr("lower(ip)").replace("\n", " ")} AS ipn FROM d),
       |sp AS (SELECT id, ip, string_split(ipn, '::') AS parts FROM pn),
       |lr AS (SELECT id, ip,
       |  string_split(parts[1], ':') AS ll,
       |  CASE WHEN parts[1] = '' THEN 0 ELSE len(string_split(parts[1], ':')) END AS nl,
       |  string_split(CASE WHEN len(parts) < 2 THEN '' ELSE parts[2] END, ':') AS rl,
       |  CASE WHEN len(parts) < 2 OR parts[2] = '' THEN 0
       |       ELSE len(string_split(parts[2], ':')) END AS nr
       |  FROM sp),
       |h AS (SELECT id, ip,
       |  $hs
       |  FROM lr),
       |n AS (SELECT id, ip, h1, h2, h3, h4, h5, h6, h7, h8, $gs FROM h)
       |SELECT id, ip,
       |  ${word(1, 2, 3, 4)} AS hi,
       |  ${word(5, 6, 7, 8)} AS lo,
       |  concat_ws(':', $pads) AS norm,
       |  concat(concat_ws(':', $pads4), ':0000:0000:0000:0000') AS net64,
       |  g1 * 65536 + g2 = 536939960 AS in_doc32
       |FROM n ORDER BY id""".stripMargin
  }

  /** v6 CIDR → zone catalog: nested 32/48/60 under the doc prefix, the
    * link-local and multicast blocks, and ::/0 so every address
    * classifies. Parsed driver-side into (hi, lo, len) — the catalog is
    * a literal, like its v4 twin. */
  val Cidr6Catalog: Seq[(String, String)] = Seq(
    ("2001:db8::/32", "doc"),
    ("2001:db8:85a3::/48", "doc-site"),
    ("2001:db8:0:cd30::/60", "doc-lab"),
    ("fe80::/10", "link-local"),
    ("ff00::/8", "multicast"),
    ("::/0", "default"))

  /** /len masks over the (hi, lo) two-word form */
  private def mask6Hi(len: Int): Long =
    if (len == 0) 0L else if (len >= 64) -1L else -1L << (64 - len)
  private def mask6Lo(len: Int): Long =
    if (len <= 64) 0L else -1L << (128 - len)

  /** driver-side v6 text → (hi, lo) for catalog literals */
  private def ip6ToWords(s: String): (Long, Long) = {
    val b = java.net.InetAddress.getByName(s).getAddress
    require(b.length == 16, s"not a v6 literal: $s")
    def w(off: Int) = (0 until 8).foldLeft(0L)((a, i) => (a << 8) | (b(off + i) & 0xffL))
    (w(0), w(8))
  }

  /** [[ipLpmJoin]]'s IPv6 twin over the [[graft.model.ip6Fixture]]
    * addresses: identical scalable shape — one masked (hi, lo) candidate
    * per distinct prefix length in the catalog, equi-join (net_hi,
    * net_lo, mlen) against the broadcast table, max_by per ip — with the
    * 128-bit masks precomputed per catalog length as two signed-64
    * literals, so neither engine shifts at runtime. */
  /** the v6 catalog's distinct prefix lengths / broadcast prefix frame —
    * shared by [[ip6LpmJoin]] and the dual-stack [[deviceZonesOf]] */
  private def cidr6Lens: Seq[Int] =
    Cidr6Catalog.map(_._1.split("/")(1).toInt).distinct.sorted

  private def cidr6PrefixFrame(s: SparkSession): DataFrame = {
    import s.implicits._
    Cidr6Catalog.map { case (cidr, zone) =>
      val Array(net, len) = cidr.split("/")
      val (hi, lo) = ip6ToWords(net)
      val l = len.toInt
      (hi & mask6Hi(l), lo & mask6Lo(l), l, zone)
    }.toDF("net_hi", "net_lo", "mlen", "zone")
  }

  def ip6LpmJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lens = cidr6Lens
    val prefixes = cidr6PrefixFrame(s)
    val ipl = lower(col("ip"))
    val base = graft.model.ip6Fixture.toDF("id", "ip")
      .withColumn("hi", ip6Word(ipl, 1, 2, 3, 4))
      .withColumn("lo", ip6Word(ipl, 5, 6, 7, 8))
    base.select(col("id"), col("ip"),
        explode(array(lens.map(l => struct(lit(l).as("mlen"),
          col("hi").bitwiseAND(lit(mask6Hi(l))).as("net_hi"),
          col("lo").bitwiseAND(lit(mask6Lo(l))).as("net_lo"))): _*)).as("c"))
      .select(col("id"), col("ip"), col("c.mlen").as("mlen"),
        col("c.net_hi").as("net_hi"), col("c.net_lo").as("net_lo"))
      .join(broadcast(prefixes), Seq("net_hi", "net_lo", "mlen"))
      .groupBy("id", "ip")
      .agg(max_by(col("zone"), col("mlen")).as("zone"),
        max(col("mlen")).as("masklen"))
      .orderBy("id")
  }

  val ip6LpmJoinSql: String = {
    val pfx = Cidr6Catalog.map { case (cidr, zone) =>
      val Array(net, len) = cidr.split("/")
      val (hi, lo) = ip6ToWords(net)
      val l = len.toInt
      s"(${hi & mask6Hi(l)}, ${lo & mask6Lo(l)}, $l, ${mask6Hi(l)}, ${mask6Lo(l)}, '$zone')"
    }.mkString(", ")
    val hs = (1 to 8).map(i =>
      s"CASE WHEN $i <= nl THEN ll[$i] WHEN $i > 8 - nr THEN rl[$i - (8 - nr)] ELSE '0' END AS h$i")
      .mkString(",\n|  ")
    val gs = (1 to 8).map(i => s"('0x' || h$i)::BIGINT AS g$i").mkString(", ")
    def word(a: Int, b: Int, c: Int, d: Int) =
      s"(CASE WHEN g$a >= 32768 THEN g$a - 65536 ELSE g$a END) * 281474976710656" +
        s" + g$b * 4294967296 + g$c * 65536 + g$d"
    s"""WITH d AS (SELECT id, ip FROM ${graft.model.ip6ValuesSql}),
       |pn AS (SELECT id, ip, ${ip6HexTailSqlExpr("lower(ip)").replace("\n", " ")} AS ipn FROM d),
       |sp AS (SELECT id, ip, string_split(ipn, '::') AS parts FROM pn),
       |lr AS (SELECT id, ip,
       |  string_split(parts[1], ':') AS ll,
       |  CASE WHEN parts[1] = '' THEN 0 ELSE len(string_split(parts[1], ':')) END AS nl,
       |  string_split(CASE WHEN len(parts) < 2 THEN '' ELSE parts[2] END, ':') AS rl,
       |  CASE WHEN len(parts) < 2 OR parts[2] = '' THEN 0
       |       ELSE len(string_split(parts[2], ':')) END AS nr
       |  FROM sp),
       |h AS (SELECT id, ip,
       |  $hs
       |  FROM lr),
       |g AS (SELECT id, ip, $gs FROM h),
       |n AS (SELECT id, ip,
       |  ${word(1, 2, 3, 4)} AS hi,
       |  ${word(5, 6, 7, 8)} AS lo FROM g),
       |pfx(net_hi, net_lo, mlen, mask_hi, mask_lo, zone) AS (VALUES $pfx),
       |hits AS (SELECT n.id, n.ip, p.mlen, p.zone
       |  FROM n JOIN pfx p
       |    ON (n.hi & p.mask_hi) = p.net_hi AND (n.lo & p.mask_lo) = p.net_lo)
       |SELECT id, ip, max_by(zone, mlen) AS zone, max(mlen)::INT AS masklen
       |FROM hits GROUP BY id, ip ORDER BY id""".stripMargin
  }

  /** base64 / hex encode-decode round trips */
  def encodeFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .where(col("p_partkey") <= 50)
      .select(col("p_partkey"),
        base64(col("p_name").cast(BinaryType)).as("b64"),
        unbase64(base64(col("p_name").cast(BinaryType))).cast(StringType).as("b64_rt"),
        hex(col("p_brand").cast(BinaryType)).as("hexed"))
      .orderBy("p_partkey")

  val encodeFuncsSql =
    """SELECT p_partkey, to_base64(p_name::BLOB) AS b64,
      |from_base64(to_base64(p_name::BLOB))::VARCHAR AS b64_rt,
      |upper(hex(p_brand::BLOB)) AS hexed
      |FROM part WHERE p_partkey <= 50 ORDER BY p_partkey""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_ip_funcs" -> ipFuncs _,
    "q_ip6_funcs" -> ip6Funcs _,
    "q_ip_lpm_join" -> ipLpmJoin _,
    "q_ip6_lpm_join" -> ip6LpmJoin _,
    "q_encode_funcs" -> encodeFuncs _,
    "q_str_distance" -> strDistance _,
    "q_map_funcs" -> mapFuncs _,
    "q_str_basic" -> strBasic _,
    "q_str_split_index" -> strSplitIndex _,
    "q_str_match" -> strMatch _,
    "q_str_regex_extract" -> strRegexExtract _,
    "q_str_replace" -> strReplace _,
    "q_date_trunc" -> dateTrunc _,
    "q_date_parts" -> dateParts _,
    "q_date_arith" -> dateArith _,
    "q_date_format" -> dateFormat _,
    "q_math_funcs" -> mathFuncs _,
    "q_cond_funcs" -> condFuncs _,
    "q_array_funcs" -> arrayFuncs _,
    "q_array_lambda" -> arrayLambda _,
    "q_explode" -> explodeQ _,
    "q_json_extract" -> jsonExtract _)

  val oracle: Map[String, String] = Map(
    "q_ip_funcs" -> ipFuncsSql,
    "q_ip6_funcs" -> ip6FuncsSql,
    "q_ip_lpm_join" -> ipLpmJoinSql,
    "q_ip6_lpm_join" -> ip6LpmJoinSql,
    "q_encode_funcs" -> encodeFuncsSql,
    "q_str_distance" -> strDistanceSql,
    "q_map_funcs" -> mapFuncsSql,
    "q_str_basic" -> strBasicSql,
    "q_str_split_index" -> strSplitIndexSql,
    "q_str_match" -> strMatchSql,
    "q_str_regex_extract" -> strRegexExtractSql,
    "q_str_replace" -> strReplaceSql,
    "q_date_trunc" -> dateTruncSql,
    "q_date_parts" -> datePartsSql,
    "q_date_arith" -> dateArithSql,
    "q_date_format" -> dateFormatSql,
    "q_math_funcs" -> mathFuncsSql,
    "q_cond_funcs" -> condFuncsSql,
    "q_array_funcs" -> arrayFuncsSql,
    "q_array_lambda" -> arrayLambdaSql,
    "q_explode" -> explodeSql,
    "q_json_extract" -> jsonExtractSql)
}
