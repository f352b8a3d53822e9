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
