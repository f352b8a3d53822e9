package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (not shipped surface): measure the r20 index-deletion
  * maintenance passes at real index sizes — the walls PERF.md's
  * deletion claims rest on. Per dir: build the gram and IVF indexes,
  * delete a fixed fraction of records, and report build/delete/probe
  * walls plus file counts (deletion is a filtered rewrite, so its wall
  * should track the INDEX size, not the delete batch — the honest
  * statement of its cost class, unlike the O(batch) appends).
  *
  * Usage: runMain graft.tools.DeleteMaintenanceTiming [dir ...]
  *        (defaults: /root/testdata/sf0.1 /root/repo/testdata_sf1)
  */
object DeleteMaintenanceTiming {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/root/repo/testdata_sf1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-delete-timing")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    for (dir <- dirs) {
      val docs = graft.util.t(spark, dir, "documents").select("doc_id", "text")
      val probes = docs.where(col("doc_id") % 10 === 7)
      val deleted = docs.where(col("doc_id") % 10 =!= 7 && col("doc_id") % 9 === 2)
      val nDel = deleted.count()
      val gram = java.nio.file.Files.createTempDirectory("graft_dmt_gram").toString
      val (_, tBuild) = time { graft.operators.Dedup.writeGramIndex(spark, dir, gram) }
      val (_, tProbe0) = time {
        graft.operators.Dedup.probeGramIndex(spark, probes, gram)
          .write.format("noop").mode("overwrite").save()
      }
      val (_, tDel) = time {
        graft.operators.IndexMaintenance.deleteFromGramIndex(spark, deleted, gram)
      }
      val (_, tProbe1) = time {
        graft.operators.Dedup.probeGramIndex(spark, probes, gram)
          .write.format("noop").mode("overwrite").save()
      }
      graft.util.deleteRecursively(gram)

      val emb = graft.util.t(spark, dir, "embeddings").select("vec_id", "embedding")
      val delVec = emb.where(col("vec_id") % 7 === 2).select("vec_id")
      val ivf = java.nio.file.Files.createTempDirectory("graft_dmt_ivf").toString
      val (_, tBuildIvf) = time { graft.operators.Similarity.writeIvfIndex(spark, dir, ivf) }
      val (_, tDelIvf) = time {
        graft.operators.IndexMaintenance.deleteFromIvfIndex(spark, delVec, ivf)
      }
      graft.util.deleteRecursively(ivf)

      println(f"""{"dir":"$dir","deleted_docs":$nDel,"sec_gram_build":$tBuild%.2f,""" +
        f""""sec_gram_probe_before":$tProbe0%.2f,"sec_gram_delete":$tDel%.2f,""" +
        f""""sec_gram_probe_after":$tProbe1%.2f,"sec_ivf_build":$tBuildIvf%.2f,""" +
        f""""sec_ivf_delete":$tDelIvf%.2f}""")
    }
    spark.stop()
  }
}
