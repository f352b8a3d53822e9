package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Stage-level profiler for declared queries (dev tool, guide §1: the
  * empirical loop with the UI disabled). Runs each named key through the
  * SAME session shape as Bench (local[$SPARK_GRAFT_CPUS], noop sink,
  * cold memo caches) and prints, per query, every job and stage with its
  * wall time and aggregated task metrics — executor run/CPU time, shuffle
  * read/write bytes, fetch wait, GC — so a slow query can be blamed on a
  * specific exchange, scan or compute stage without the UI.
  *
  * Usage: runMain graft.tools.Profile <sfDir> <key> [<key> ...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val keys = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class StageRow(id: Int, attempt: Int, name: String, tasks: Int,
        wallMs: Long, runMs: Long, cpuMs: Long, gcMs: Long,
        shReadMB: Double, fetchWaitMs: Long, shWriteMB: Double,
        inputMB: Double, spillMB: Double)
    val stages = mutable.ArrayBuffer[StageRow]()
    val jobs = mutable.ArrayBuffer[(Int, Long, Long)]() // id, start, end
    val listener = new SparkListener {
      private val jobStart = mutable.Map[Int, Long]()
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobStart(js.jobId) = js.time
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobs += ((je.jobId, jobStart.getOrElse(je.jobId, je.time), je.time))
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val wall = (for (a <- si.completionTime; b <- si.submissionTime)
          yield a - b).getOrElse(0L)
        stages += StageRow(si.stageId, si.attemptNumber(), si.name,
          si.numTasks, wall,
          m.executorRunTime, m.executorCpuTime / 1000000,
          m.jvmGCTime,
          m.shuffleReadMetrics.totalBytesRead / 1e6,
          m.shuffleReadMetrics.fetchWaitTime,
          m.shuffleWriteMetrics.bytesWritten / 1e6,
          m.inputMetrics.bytesRead / 1e6,
          m.diskBytesSpilled / 1e6)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // JVM/codegen warm-up through the same sink the measured runs use
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => }
    for (name <- graft.SparkEntry.queries.keys.toSeq.sorted.take(1);
         fn <- graft.SparkEntry.queries.get(name))
      try fn(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }

    def clearCaches(): Unit = {
      graft.operators.Dedup.clearLabelsCache()
      graft.operators.Dedup.clearGramIndexCache()
      graft.operators.Dedup.clearSimhashIndexCache()
      graft.operators.Dedup.clearMinhashIndexCache()
      graft.operators.Dedup.clearSubstrIndexCache()
      graft.operators.Dedup.clearWinnowIndexCache()
      graft.operators.Dedup.clearSubstringSpansCache()
      graft.operators.TextAnalysis.clearBpeMergeCache()
      graft.operators.Similarity.clearCodebookCache()
      graft.operators.Similarity.clearSemanticIndexCache()
      graft.operators.Resolve.clearLabelsCache()
      graft.operators.Bucketing.clearTableCache()
      graft.operators.Relational.clearZOrderCache()
      graft.operators.Relational.clearTextFormatsCache()
      graft.operators.SketchTable.clearTableCache()
      graft.operators.CorpusOps.clearSourceSketchCache()
      graft.operators.CorpusOps.clearFrontierCache()
    }

    for (k <- keys; fn <- graft.SparkEntry.queries.get(k)) {
      clearCaches()
      stages.clear(); jobs.clear()
      spark.sparkContext.setJobDescription(k)
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let listener events drain
      println(f"%n==== $k: total ${wall}%.2f s, ${jobs.size} jobs, ${stages.size} stages ====")
      val jobWall = jobs.map(j => j._3 - j._2).sum / 1e3
      println(f"  sum of job walls: $jobWall%.2f s (gap to total = driver/planning time)")
      println("  stage  att tasks  wall_ms   run_ms   cpu_ms  gc_ms  shR_MB fetch_ms  shW_MB  in_MB spill_MB  name")
      for (s <- stages.sortBy(-_.wallMs).take(25))
        println(f"  ${s.id}%5d ${s.attempt}%4d ${s.tasks}%5d ${s.wallMs}%8d ${s.runMs}%8d ${s.cpuMs}%8d ${s.gcMs}%6d ${s.shReadMB}%7.1f ${s.fetchWaitMs}%8d ${s.shWriteMB}%7.1f ${s.inputMB}%6.1f ${s.spillMB}%8.1f  ${s.name.take(80)}")
    }
    spark.stop()
  }
}
