package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Event-analytics edge cases the sf fixtures don't reach — notably
  * SCD2 on equal-timestamp events, where the period-closing window must
  * break ties deterministically in BOTH engines. */
class EventAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** events.parquet fixture dir with the generator's schema */
  private def eventsDir(rows: Seq[(Long, String, Long, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_events_fixture").toString
    rows.toDF("event_id", "ts_str", "user_id", "event_type")
      .select(col("event_id"), col("ts_str").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("scd2 closes equal-valid_from periods deterministically by period order") {
    // user 7: two events at the SAME instant with different types, then a
    // later third type. The two periods share valid_from_us; the closing
    // lead window must order them by the event_id-derived period sequence
    // (A first: event_id 1 < 2), so A closes at the shared instant and B
    // closes at the later event — never the other way around, regardless
    // of partitioning or engine.
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 00:00:00", 7L, "A"),
      (2L, "2024-01-01 00:00:00", 7L, "B"),
      (3L, "2024-01-01 00:01:00", 7L, "C")))
    val rows = operators.EventAnalytics.scd2(spark, dir)
      .select("event_type", "valid_from_us", "valid_to_us", "n_events")
      .collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("A", "B", "C"))
    val t0 = rows(0).getLong(1)
    assert(rows(1).getLong(1) === t0, "B's period starts at the shared instant")
    assert(rows(0).getLong(2) === t0, "A (earlier event_id) closes at the shared instant")
    assert(rows(1).getLong(2) === rows(2).getLong(1), "B closes at C's start")
    assert(rows(2).isNullAt(2), "current period stays open")
  }

  test("scd2 collapses runs and reopens a period on value recurrence") {
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "x"),
      (2L, "2024-01-01 00:01:00", 1L, "x"),
      (3L, "2024-01-01 00:02:00", 1L, "y"),
      (4L, "2024-01-01 00:03:00", 1L, "x")))
    val rows = operators.EventAnalytics.scd2(spark, dir)
      .select("event_type", "n_events").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("x", 2L), ("y", 1L), ("x", 1L)))
  }
}
