package graft.streaming

import graft.model
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** The reference's native half (SURVEY.md §2 Table A) as Structured
  * Streaming: UDP datagrams → parse → micro-batch trigger → batched sink.
  *
  * Reference dataflow (`/root/reference/main.go:27-90`,
  * `lib/cacheManage.go:12-65`): receive loop → ParseLog → bounded channel
  * (cap 10 000) → flush every 1000 rows OR 2 s → bulk INSERT, errors drop
  * the batch (at-most-once).
  *
  * Spark mapping:
  *   - channel + ticker ≡ the micro-batch loop, `Trigger.ProcessingTime(2s)`
  *     (time half of the trigger; the 1000-row count half has no Spark
  *     twin — rate limiting via maxFilesPerTrigger/maxOffsetsPerTrigger
  *     bounds batch size instead, a documented deviation);
  *   - bounded channel ≡ source-side rate limits + pull-based backpressure;
  *   - flushLogs ≡ foreachBatch parquet/JDBC append; unlike the reference's
  *     at-most-once drop-on-error, checkpointing gives exactly-once into
  *     files — the strictly-stronger default.
  */
object Pipeline {

  /** reference's receive-buffer cap: datagrams beyond 40 960 bytes are
    * silently truncated (main.go:38, ReadFromUDP into a fixed buffer) */
  val MaxDatagramChars = 40960

  /** parse projection shared by batch and streaming: (raw, device, ts) →
    * canonical log schema (SURVEY.md §1.1) */
  def parseToLog(lines: DataFrame): DataFrame =
    lines
      .withColumn("p", model.parseSyslog(substring(col("raw"), 1, MaxDatagramChars)))
      .select(
        col("ts").as("timestamp"),
        col("device"),
        col("p.severity").as("severity"),
        col("p.categories").as("categories"),
        col("p.message").as("message"))

  /** the whole reference as one streaming query: lines → parse → 2 s
    * trigger → batched parquet sink (stream_pipeline_e2e) */
  def start(lines: DataFrame, outDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("2 seconds")): StreamingQuery =
    parseToLog(lines).writeStream
      .trigger(trigger)
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // row→columnar pivot + bulk append ≡ PrepareBatch/Send
        // (lib/cacheManage.go:40-60); swap .parquet for .jdbc to target
        // ClickHouse with option("batchsize", 1000)
        batch.write.mode("append").parquet(outDir)
      }
      .start()

  /** event-time windowed severity counts with late-data drop
    * (stream_watermark_late): rows later than the watermark are excluded,
    * the principled version of the reference's fixed 2 s flush bound */
  def severityCounts(logs: DataFrame, watermark: String = "10 minutes"): DataFrame =
    logs
      .withWatermark("timestamp", watermark)
      .groupBy(window(col("timestamp"), "1 hour"), col("severity"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("severity"), col("n"))

  /** stateful dedup on an id column within the watermark (stream_dedup) */
  def dedupWithinWatermark(events: DataFrame, idCol: String = "event_id",
      watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("timestamp", watermark)
      .dropDuplicatesWithinWatermark(idCol)

  /** running per-device severity counters across batches
    * (stream_stateful_count) — custom state via mapGroupsWithState, the
    * KeyValueGroupedDataset path for semantics windowed aggs can't express */
  case class DeviceCount(device: String, total: Long, errors: Long)

  def statefulDeviceCounts(logs: DataFrame): Dataset[DeviceCount] = {
    val spark = logs.sparkSession
    import spark.implicits._
    logs.selectExpr("device", "severity")
      .as[(String, Byte)]
      .groupByKey(_._1)
      .mapGroupsWithState[DeviceCount, DeviceCount](GroupStateTimeout.NoTimeout) {
        (device: String, rows: Iterator[(String, Byte)], state: GroupState[DeviceCount]) =>
          val prev = state.getOption.getOrElse(DeviceCount(device, 0L, 0L))
          var total = prev.total
          var errors = prev.errors
          rows.foreach { case (_, sev) =>
            total += 1
            if (sev <= 3) errors += 1
          }
          val next = DeviceCount(device, total, errors)
          state.update(next)
          next
      }
  }
}
