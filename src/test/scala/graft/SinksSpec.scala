package graft

import java.nio.file.Files

import graft.sources.Sinks
import graft.streaming.Pipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** at-rest layout: day partitioning must produce prunable directories and
  * time-range scans must actually prune them */
class SinksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("writeLogsPartitioned lays out day directories and scans prune them") {
    val out = Files.createTempDirectory("graft_part_sink").toString
    val logs = Pipeline.parseToLog(model.rawLines(spark))
    Sinks.writeLogsPartitioned(logs, out)

    val days = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("day="))
    assert(days.toSeq === Seq("day=2024-01-01"), s"unexpected layout: ${days.toSeq}")

    val pruned = spark.read.parquet(out)
      .where(col("day") === "2024-01-01" && col("severity") <= 3)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day"), s"no partition pruning:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(severity), LessThanOrEqual(severity,3)"),
      s"no rowgroup predicate pushdown:\n$plan")
    assert(pruned.count() === logs.where(col("severity") <= 3).count())

    // appending a second day creates a sibling partition, untouched reads prune it
    val day2 = logs.withColumn("timestamp", col("timestamp") + expr("INTERVAL 1 DAY"))
    Sinks.writeLogsPartitioned(day2, out)
    val dirs2 = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("day=")).sorted
    assert(dirs2.toSeq === Seq("day=2024-01-01", "day=2024-01-02"))
  }

  test("writeCorpusShards: deterministic JSONL shards, round-trip identical, stable assignment") {
    val out1 = Files.createTempDirectory("graft_shards1").toString
    val out2 = Files.createTempDirectory("graft_shards2").toString
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")

    Sinks.writeCorpusShards(docs, out1, shards = 4)
    val shardDirs = new java.io.File(out1).listFiles()
      .map(_.getName).filter(_.startsWith("shard=")).sorted
    assert(shardDirs.toSeq === Seq("shard=0", "shard=1", "shard=2", "shard=3"))

    // JSONL round trip preserves the corpus (modulo column order)
    val back = spark.read.json(out1)
    assert(back.count() === docs.count())
    val a = docs.select("doc_id", "text", "lang", "source")
      .orderBy("doc_id").collect().toSeq
    val b = back.select("doc_id", "text", "lang", "source")
      .orderBy("doc_id").collect().toSeq
    assert(a === b, "round trip changed the corpus")

    // re-export lands every doc in the same shard (stable md5 assignment)
    Sinks.writeCorpusShards(docs, out2, shards = 4)
    // shard= is a directory partition column: inferred INT on read-back
    val m1 = spark.read.json(out1).selectExpr("doc_id", "CAST(shard AS BIGINT)")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m2 = spark.read.json(out2).selectExpr("doc_id", "CAST(shard AS BIGINT)")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m1 === m2, "shard assignment not deterministic")
  }

  test("compactDay collapses a fragmented day to one file, preserves rows, leaves siblings alone") {
    val out = Files.createTempDirectory("graft_compact").toString
    val logs = Pipeline.parseToLog(model.rawLines(spark))
    // simulate a streaming day: many appends → many small files
    (1 to 10).foreach(_ => Sinks.writeLogsPartitioned(logs, out))
    val day2 = logs.withColumn("timestamp", col("timestamp") + expr("INTERVAL 1 DAY"))
    Sinks.writeLogsPartitioned(day2, out)

    def filesIn(day: String) = new java.io.File(s"$out/day=$day").listFiles()
      .map(_.getName).filter(_.endsWith(".parquet"))
    val before = filesIn("2024-01-01").length
    assert(before >= 10, s"fixture should be fragmented, got $before files")
    val sibBefore = filesIn("2024-01-02").toSeq.sorted
    val rowsBefore = spark.read.parquet(out).where(col("day") === "2024-01-01")
      .orderBy("timestamp", "device", "message").collect().toSeq

    Sinks.compactDay(spark, out, "2024-01-01")

    assert(filesIn("2024-01-01").length === 1, "day not compacted to one file")
    assert(filesIn("2024-01-02").toSeq.sorted === sibBefore, "sibling day was touched")
    val rowsAfter = spark.read.parquet(out).where(col("day") === "2024-01-01")
      .orderBy("timestamp", "device", "message").collect().toSeq
    assert(rowsAfter === rowsBefore, "compaction changed the data")
  }

  test("writeTrainShards: file order IS the q_shuffle_shard permutation; epochs re-deal deterministically") {
    val out = Files.createTempDirectory("graft_train").toString
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    Sinks.writeTrainShards(docs, out) // seed 0, 64 shards

    // membership: every doc lands exactly once
    val back = spark.read.parquet(out)
    assert(back.select("doc_id").distinct().count() === docs.count())
    assert(back.count() === docs.count())

    // stored pos is a 1..n sequence per shard, and (count, Σ doc_id·pos)
    // reproduces the declared query's permutation pin exactly
    val perShard = back.groupBy("shard")
      .agg(count(lit(1)).as("n"), sum(expr("doc_id * pos")).as("cs"),
        min("pos").as("lo"), max("pos").as("hi"))
      .collect().map(r => r.getAs[Int]("shard").toLong ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    perShard.foreach { case (s, (n, _, lo, hi)) =>
      assert(lo === 1L && hi === n, s"shard $s pos not a 1..n sequence")
    }
    val declared = operators.CorpusOps.shuffleShard(spark, TestSpark.sfDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(perShard.view.mapValues(v => (v._1, v._2)).toMap === declared,
      "at-rest layout must pin the same permutation as q_shuffle_shard")

    // within each shard directory the FILE ROW ORDER is the training order
    new java.io.File(out).listFiles().filter(_.getName.startsWith("shard=")).foreach { d =>
      val pos = spark.read.parquet(d.toString).select("pos")
        .collect().map(_.getLong(0)).toSeq
      assert(pos === pos.sorted, s"${d.getName}: rows not stored in shuffle order")
    }

    // a new epoch (seed 1) keeps membership but deals a different permutation
    val out2 = Files.createTempDirectory("graft_train2").toString
    Sinks.writeTrainShards(docs, out2, seed = 1L)
    val back2 = spark.read.parquet(out2)
    assert(back2.select("doc_id").distinct().count() === docs.count())
    val deal1 = back.selectExpr("doc_id", "CAST(shard AS LONG) AS s", "pos")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val deal2 = back2.selectExpr("doc_id", "CAST(shard AS LONG) AS s", "pos")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(deal1 !== deal2, "epoch reseed must produce a different permutation")
    // and the epoch deal is itself deterministic
    val out3 = Files.createTempDirectory("graft_train3").toString
    Sinks.writeTrainShards(docs, out3, seed = 1L)
    val deal3 = spark.read.parquet(out3).selectExpr("doc_id", "CAST(shard AS LONG) AS s", "pos")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(deal2 === deal3, "same seed must replay the same permutation")
  }

  test("writeManifest/verifyManifest: release digest pins the export, tampering flips it") {
    val out = Files.createTempDirectory("graft_manifest").toString
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    Sinks.writeTrainShards(docs, out, shards = 4)
    Sinks.writeManifest(spark, out)

    val mf = java.nio.file.Paths.get(out, "_MANIFEST.json")
    assert(java.nio.file.Files.exists(mf), "manifest file missing")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(out, "_MANIFEST.json.tmp")),
      "tmp file must not survive the atomic rename")
    val json = new String(java.nio.file.Files.readAllBytes(mf), "UTF-8")
    assert(json.contains(s""""rows":${docs.count()}"""), s"row count missing: $json")
    assert(json.contains(""""shards":{"""), "per-shard breakdown missing")
    // the underscore prefix keeps the manifest invisible to directory reads
    assert(spark.read.parquet(out).count() === docs.count())

    assert(Sinks.verifyManifest(spark, out), "fresh export must verify")

    // tamper: drop one shard directory → count and digest both move
    val shard0 = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("shard=")).minBy(_.getName)
    def nuke(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(nuke)); f.delete(); ()
    }
    nuke(shard0)
    assert(!Sinks.verifyManifest(spark, out), "missing shard must fail verification")

    // no manifest at all → false, not an exception
    val empty = Files.createTempDirectory("graft_manifest2").toString
    docs.limit(1).write.mode("overwrite").parquet(empty)
    assert(!Sinks.verifyManifest(spark, empty))
  }

  test("writeZOrdered: every file covers a narrow range of BOTH keys; a single sort does not") {
    val outZ = Files.createTempDirectory("graft_zorder").toString
    val outLin = Files.createTempDirectory("graft_linear").toString
    val ev = util.events(spark, TestSpark.sfDir)
      .select("event_id", "user_id", "ts_us", "event_type", "value")
    Sinks.writeZOrdered(ev, outZ, Seq("user_id", "ts_us"), files = 8)
    ev.repartitionByRange(8, col("user_id")).sortWithinPartitions("user_id")
      .write.mode("overwrite").parquet(outLin)

    assert(spark.read.parquet(outZ).count() === ev.count(), "z-order write lost rows")

    val (uMin, uMax, tMin, tMax) = {
      val r = ev.agg(min("user_id"), max("user_id"), min("ts_us"), max("ts_us")).head()
      (r.getLong(0).toDouble, r.getLong(1).toDouble, r.getLong(2).toDouble, r.getLong(3).toDouble)
    }
    // per-FILE normalized (max-min) span of each key — the quantity
    // row-group min/max skipping actually prunes on
    def spans(path: String): Seq[(Double, Double)] =
      new java.io.File(path).listFiles()
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
        .toSeq.map { f =>
          val r = spark.read.parquet(f.getAbsolutePath)
            .agg(min("user_id"), max("user_id"), min("ts_us"), max("ts_us")).head()
          ((r.getLong(1) - r.getLong(0)) / (uMax - uMin),
            (r.getLong(3) - r.getLong(2)) / (tMax - tMin))
        }
    def avg(xs: Seq[Double]): Double = xs.sum / xs.length
    val z = spans(outZ); val lin = spans(outLin)
    val (zU, zT) = (avg(z.map(_._1)), avg(z.map(_._2)))
    val (linU, linT) = (avg(lin.map(_._1)), avg(lin.map(_._2)))
    // the single sort is perfect on its key and useless on the other;
    // z-order must be materially narrow on BOTH
    assert(linU < 0.3, s"baseline user span should be tight, was $linU")
    assert(linT > 0.9, s"baseline ts span should be ~full range, was $linT")
    assert(zU < 0.7 && zT < 0.7, s"z-order spans not narrow on both keys: user=$zU ts=$zT")
    assert(zT < linT / 2, s"z-order must at least halve the ts span: $zT vs $linT")
  }

  test("q_scan_zorder pushes BOTH selection dimensions down to the parquet scan") {
    // the layout is pointless if either predicate stays above the scan:
    // row-group min/max skipping only fires on pushed filters. Read the
    // scan node's metadata — the plan's toString elides long filter lists
    val scans = operators.Relational.scanZOrder(spark, TestSpark.sfDir)
      .queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
    assert(scans.length === 1, s"expected one parquet scan, got ${scans.length}")
    val pushed = scans.head.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(user_id,10)")
      && pushed.contains("LessThanOrEqual(user_id,60)"),
      s"user_id bounds not pushed: $pushed")
    assert(pushed.contains("GreaterThanOrEqual(ts,") && pushed.contains("LessThan(ts,"),
      s"ts bounds not pushed: $pushed")
  }

}
