package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every SURVEY.md §2 key with Oracle=yes appears in BOTH maps; oracle-free
  * operators (sketches, LSH, streaming) appear in `queries` only and are
  * covered by ScalaTest specs instead. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Severity-per-hour histogram through the full syslog parse path. */
  def entry(spark: SparkSession): DataFrame =
    operators.Syslog.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Syslog.queries ++
    operators.Relational.queries ++
    operators.Bucketing.queries ++
    operators.Aggregates.queries ++
    operators.Windows.queries ++
    operators.EventAnalytics.queries ++
    operators.Dedup.queries ++
    operators.Similarity.queries ++
    operators.TextAnalysis.queries ++
    operators.CorpusOps.queries ++
    operators.Curate.queries ++
    operators.Resolve.queries ++
    operators.Profiling.queries ++
    operators.SketchTable.queries ++
    functions.Multimodal.queries ++
    functions.Scalars.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Syslog.oracle ++
    operators.Relational.oracle ++
    operators.Bucketing.oracle ++
    operators.Aggregates.oracle ++
    operators.Windows.oracle ++
    operators.EventAnalytics.oracle ++
    operators.Dedup.oracle ++
    operators.Similarity.oracle ++
    operators.TextAnalysis.oracle ++
    operators.CorpusOps.oracle ++
    operators.Curate.oracle ++
    operators.Resolve.oracle ++
    operators.Profiling.oracle ++
    operators.SketchTable.oracle ++
    functions.Multimodal.oracle ++
    functions.Scalars.oracle
}
