package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared helpers for every declared query (SURVEY.md §2 determinism rules).
  *
  * Determinism contract with the DuckDB oracle:
  *   - money/quantity aggregates run on DECIMAL (exact, order-independent),
  *     then round(…,4) and cast to DOUBLE — both engines produce identical
  *     bits, so the driver's hash compare is stable;
  *   - every query ends in a total ORDER BY (tie-broken);
  *   - events.ts is nanosecond parquet (Spark can't read TIMESTAMP(NANOS)):
  *     read with spark.sql.legacy.parquet.nanosAsLong=true → BIGINT ns, then
  *     truncate to µs (`ts div 1000`), which matches DuckDB `ts::TIMESTAMP`.
  */
object util {
  type Q = (SparkSession, String) => DataFrame

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events with ts normalized: ts_us (µs since epoch, BIGINT) and ts
    * (TIMESTAMP, µs precision) — DuckDB twin: epoch_us(ts::TIMESTAMP) /
    * ts::TIMESTAMP. */
  def events(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("ts", timestamp_micros(col("ts_us")))

  /** exact decimal view of a 2-dp money/rate double */
  def d2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** round to 4 and emit DOUBLE (final output form for aggregates) */
  def r4(c: Column): Column = round(c, 4).cast(DoubleType)

  /** exact decimal average → double: sum(decimal)/count, deterministic in
    * both engines (DuckDB twin: round(CAST(sum(CAST(x AS DECIMAL(18,2))) AS
    * DOUBLE)/count(x), 4)) */
  def avgD2(c: Column): Column =
    r4(sum(d2(c)).cast(DoubleType) / count(c))
}
