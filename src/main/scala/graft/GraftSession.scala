package graft

import org.apache.spark.sql.SparkSession

/** Library entry point: a SparkSession configured the way every graft
  * operator expects — UTC, AQE on, nanosecond-parquet compatibility, and a
  * shuffle-partition count sized to the execution environment instead of
  * the 200 default.
  *
  * On a real cluster pass the actual core count (or leave shufflePartitions
  * at 0 to let AQE coalesce from a high initial value); in local mode match
  * the local parallelism.
  */
object GraftSession {

  def builder(appName: String = "graft",
      master: Option[String] = None,
      shufflePartitions: Int = 0): SparkSession.Builder = {
    val b = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // events-style feeds carry TIMESTAMP(NANOS) parquet, unreadable by
      // Spark natively; ingest as BIGINT ns (see util.events)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    val withMaster = master.fold(b)(b.master)
    if (shufflePartitions > 0)
      withMaster.config("spark.sql.shuffle.partitions", shufflePartitions)
    else withMaster
  }

  /** local development/test session: local[n], shuffle partitions = n */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    builder(master = Some(s"local[$cores]"), shufflePartitions = cores)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
