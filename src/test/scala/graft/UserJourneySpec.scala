package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.sources.Sinks
import graft.streaming.Pipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The whole library as a user composes it: stream raw syslog lines →
  * parse → day-partitioned warehouse → analytics over the landed table.
  * This is the reference program (ingest) plus its ClickHouse queries
  * (analytics) as one flow. */
class UserJourneySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ingest stream lands a partitioned warehouse that serves the NOC queries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // 1. ingest: streamed datagram lines → parse → day-partitioned parquet
    val warehouse = Files.createTempDirectory("graft_journey_wh").toString
    val ckpt = Files.createTempDirectory("graft_journey_ck").toString
    val ms = MemoryStream[RawLine]
    ms.addData(model.syslogFixture.map { case (_, raw, dev, t) =>
      RawLine(raw, dev, Timestamp.valueOf(t))
    })
    val q = Pipeline.parseToLog(ms.toDF()).writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        Sinks.writeLogsPartitioned(b, warehouse)
      }
      .start()
    q.awaitTermination(60000)

    val logs = spark.read.parquet(warehouse)
    assert(logs.count() === model.syslogFixture.size.toLong)

    // 2. the canonical NOC query: errors-and-worse per hour
    val critical = logs.where(col("severity") <= 3)
      .groupBy(date_trunc("hour", col("timestamp")).as("hour"))
      .agg(count(lit(1)).as("n"))
      .orderBy("hour")
      .collect()
    assert(critical.map(_.getLong(1)).sum === 5L) // f02 f03 f04 f05 f06

    // 3. device normalization + top talkers (ip without ephemeral port)
    val topTalkers = logs
      .groupBy(substring_index(col("device"), ":", 1).as("ip"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("ip"))
      .limit(3)
      .collect()
    assert(topTalkers.head.getString(0) === "10.0.0.5")
    assert(topTalkers.head.getLong(1) === 5L) // f01 f02 f06 f09 f18

    // 4. category fan-out: explode the topics array
    val cats = logs.select(explode(col("categories")).as("cat"))
      .groupBy("cat").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(cats("firewall") === 4L) // f01, f09, f18, f19
    assert(cats("unknown") === 4L)  // f14-f17 fallbacks
  }

  /** The dedup-index LIFECYCLE as production runs it: build once, absorb
    * arriving batches, compact on a maintenance cadence, keep absorbing.
    * The post-compaction append is the step no per-component spec covers
    * — it proves compaction leaves an index the admission loop can keep
    * writing into (meta sidecar intact, bucket caps still enforced). */
  test("index lifecycle: build, absorb, compact, absorb again, probe") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val idx = Files.createTempDirectory("graft_journey_idx").toString
    graft.operators.Dedup.writeGramIndex(spark, dir, idx)
    val srcText = graft.util.t(spark, dir, "documents")
      .where(col("doc_id") % 10 =!= 7).orderBy("doc_id")
      .select("text").limit(1).collect().head.getString(0)

    // day 1: a novel batch arrives and is absorbed
    graft.operators.Dedup.appendGramIndex(spark, idx,
      Seq((700001L, srcText)).toDF("doc_id", "text"))
    // nightly maintenance
    graft.operators.IndexMaintenance.compactGramIndex(spark, idx)
    // day 2: absorption continues against the compacted index
    graft.operators.Dedup.appendGramIndex(spark, idx,
      Seq((700002L, srcText + " tail")).toDF("doc_id", "text"))

    // a later probe of the same text must see the corpus original AND
    // both absorbed generations — one written pre-compact, one post
    val hits = graft.operators.Dedup.probeGramIndex(spark,
        Seq((700003L, srcText)).toDF("doc_id", "text"), idx)
      .collect().map(_.getLong(1)).toSet
    assert(hits.contains(700001L), s"pre-compact absorbed doc lost: $hits")
    assert(hits.contains(700002L), s"post-compact append broken: $hits")
    // and the persisted df cap survives the rewrite (meta untouched)
    assert(new java.io.File(s"$idx/meta").exists)
  }
}
