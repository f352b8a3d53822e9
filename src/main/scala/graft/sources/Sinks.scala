package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch/streaming sinks (SURVEY.md §2 B.1 sink_parquet /
  * stream_sink_batched) — the at-rest layout half of the reference's
  * ClickHouse table.
  *
  * At 100 TB the layout IS the index: day-partitioned directories give
  * partition pruning on the canonical time-range scans (`q_date_trunc`
  * family), and sorting within files by timestamp gives parquet row-group
  * min/max skipping inside each day.
  */
object Sinks {

  /** day-partitioned, timestamp-sorted parquet layout for log rows
    * (columns per model.logSchema). `repartition(day)` gives one writer
    * task per partition value — no small-file explosion; files within a
    * day are row-group-sorted for min/max pruning. */
  def writeLogsPartitioned(logs: DataFrame, path: String): Unit =
    logs.withColumn("day", to_date(col("timestamp")))
      .repartition(col("day"))
      .sortWithinPartitions(col("timestamp"))
      .write.partitionBy("day").mode("append").parquet(path)

  /** JDBC twin of the reference's batched ClickHouse insert
    * (lib/cacheManage.go:35-65): 1000-row batches, bounded connection
    * fan-out (the reference pools 5 connections, main.go:49-50). Wire it
    * inside foreachBatch for streaming. Untestable in this environment
    * (no database), kept as the documented production path. */
  def writeJdbcBatched(df: DataFrame, url: String, table: String,
      batchSize: Int = 1000, connections: Int = 5): Unit =
    df.coalesce(connections).write
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchSize)
      .option("isolationLevel", "NONE") // bulk append, ClickHouse-style
      .mode("append")
      .save()
}
