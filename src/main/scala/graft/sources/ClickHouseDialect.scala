package graft.sources

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types._

/** JDBC dialect for ClickHouse — the reference's actual sink
  * (`/root/reference/lib/cacheManage.go:40-58`: native-protocol
  * `PrepareBatch` → `batch.Send` into `mikrotik_logs`). Spark's generic
  * JDBC path has no dialect for ClickHouse URLs, so without this the
  * `categories Array(String)` column (SURVEY.md §1.1) cannot round-trip:
  * the default dialect maps ArrayType to nothing and table creation
  * fails. Registered by [[register]] (idempotent), wired into
  * `streaming.Pipeline.startJdbc`.
  *
  * Type mapping follows the reference's declared ClickHouse schema
  * (`lib/lopParse.go:21-27` comments):
  *   - `severity Int8` (RFC-5424 0-7) ← ByteType
  *   - `categories Array(String)` ← ArrayType(StringType), recursive for
  *     nested arrays
  *   - `timestamp DateTime64(6)` ← TimestampType — the reference comment
  *     says `DateTime` (second precision); DateTime64(6) is the lossless
  *     superset for Spark's µs timestamps and reads identically in CH SQL
  */
object ClickHouseDialect extends JdbcDialect {

  override def canHandle(url: String): Boolean =
    url.startsWith("jdbc:clickhouse:") || url.startsWith("jdbc:ch:")

  override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
    case StringType    => Some(JdbcType("String", java.sql.Types.VARCHAR))
    case BooleanType   => Some(JdbcType("Bool", java.sql.Types.BOOLEAN))
    case ByteType      => Some(JdbcType("Int8", java.sql.Types.TINYINT))
    case ShortType     => Some(JdbcType("Int16", java.sql.Types.SMALLINT))
    case IntegerType   => Some(JdbcType("Int32", java.sql.Types.INTEGER))
    case LongType      => Some(JdbcType("Int64", java.sql.Types.BIGINT))
    case FloatType     => Some(JdbcType("Float32", java.sql.Types.FLOAT))
    case DoubleType    => Some(JdbcType("Float64", java.sql.Types.DOUBLE))
    case DateType      => Some(JdbcType("Date", java.sql.Types.DATE))
    case TimestampType => Some(JdbcType("DateTime64(6)", java.sql.Types.TIMESTAMP))
    case d: DecimalType =>
      Some(JdbcType(s"Decimal(${d.precision}, ${d.scale})", java.sql.Types.DECIMAL))
    case ArrayType(et, _) =>
      getJDBCType(et).map(inner =>
        JdbcType(s"Array(${inner.databaseTypeDefinition})", java.sql.Types.ARRAY))
    case _ => None
  }

  /** ClickHouse accepts backquoted identifiers (MySQL style) */
  override def quoteIdentifier(colName: String): String =
    s"`${colName.replace("`", "``")}`"

  /** ClickHouse STRING LITERAL escaping — where a generic dialect breaks
    * silently: the CH lexer processes BACKSLASH escapes inside
    * single-quoted literals (`\'`, `\\`, `\n`, …), so the ANSI-only
    * `''` doubling the generic `compileValue` emits mis-renders any
    * value containing a backslash (e.g. a Windows path pushed down in a
    * WHERE filter reaches the server with its escapes interpreted).
    * Escapes backslash first, then quote; control chars (newline, tab,
    * CR, NUL) to their named escapes so a multi-line message stays one
    * literal token. Unicode passes through — CH literals are UTF-8. */
  def escapeStringLiteral(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '\'' => sb.append("\\'")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\u0000' => sb.append("\\0")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** CH `Array(String)` literal text (`['a','b']`) — for INSERT/SELECT
    * text generation against the reference's `categories` column; the
    * JDBC parameter path binds arrays natively, but any tool that has to
    * RENDER the statement (the reference's own `PrepareBatch` SQL, CH
    * `INSERT … VALUES` text, dashboards) needs exactly this escaping. */
  def arrayLiteral(values: Seq[String]): String =
    values.map(v => s"'${escapeStringLiteral(v)}'").mkString("[", ",", "]")

  /** filter-pushdown literal rendering (Spark calls this when compiling
    * Catalyst filters to WHERE text). Strings/dates/timestamps get CH
    * escaping; Seq stays a comma list (the generic contract for IN). */
  override def compileValue(value: Any): Any = value match {
    case s: String => s"'${escapeStringLiteral(s)}'"
    case s: org.apache.spark.unsafe.types.UTF8String =>
      s"'${escapeStringLiteral(s.toString)}'"
    case t: java.sql.Timestamp => s"'${escapeStringLiteral(t.toString)}'"
    case d: java.sql.Date => s"'${escapeStringLiteral(d.toString)}'"
    case a: Array[Any] => a.map(compileValue).mkString(", ")
    case _ => value
  }

  /** ClickHouse TRUNCATE does not cascade */
  override def isCascadingTruncateTable(): Option[Boolean] = Some(false)

  /** reference-parity write properties: 1000-row bulk INSERT statements ≡
    * `logCacheLimit` (`main.go:19`, `lib/cacheManage.go:19`) */
  def writeProperties: java.util.Properties = {
    val p = new java.util.Properties()
    p.put("batchsize", "1000")
    p.put("isolationLevel", "NONE") // CH has no transactions; skip the probe
    p
  }

  @volatile private var registered = false

  /** idempotent global registration — JdbcDialects keeps a list, so a
    * second register would shadow-duplicate the entry */
  def register(): Unit = synchronized {
    if (!registered) {
      JdbcDialects.registerDialect(this)
      registered = true
    }
  }
}
