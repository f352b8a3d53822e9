package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** salting must change the distribution, never the answer */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** orders with a manufactured hot key: every third order rewritten to
    * customer 1 — one key carrying a third of the table */
  private lazy val skewed = {
    val o = spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")
    o.withColumn("o_custkey",
      when(col("o_orderkey") % 3 === 0, lit(1L)).otherwise(col("o_custkey")))
  }

  test("saltedJoin returns exactly the rows of the plain join") {
    val c = spark.read.parquet(s"${TestSpark.sfDir}/customer.parquet")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = skewed.join(c, Seq("o_custkey"))
      .select("o_orderkey", "o_custkey", "c_name")
      .collect().map(_.toSeq).sortBy(_.toString)
    val salted = Skew.saltedJoin(skewed, c, "o_custkey", salts = 8)
      .select("o_orderkey", "o_custkey", "c_name")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(salted === plain)
  }

  test("q_join_skew_salted: salt reaches a real shuffled join, no single-reducer hot key") {
    val plan = operators.Relational.joinSkewSalted(spark, TestSpark.sfDir)
      .queryExecution.sparkPlan.toString
    // the join must be a shuffled equi-join whose keys include the salt:
    // the hot key's rows then hash to `salts` reducers instead of one —
    // a broadcast here would silently bypass the pattern being declared
    assert(plan.contains("ShuffledHashJoin"), s"expected ShuffledHashJoin:\n$plan")
    assert(plan.contains("__salt"), s"salt column missing from join keys:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"), "dim side was broadcast — salt never reaches a shuffle")
  }

  test("saltedCount returns exactly the plain groupBy counts") {
    val plain = skewed.groupBy("o_custkey").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val salted = Skew.saltedCount(skewed, "o_custkey", salts = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(salted.toSeq === plain.toSeq)
    assert(plain.find(_._1 == 1L).get._2 >= 500, "hot key missing from fixture")
  }
}
