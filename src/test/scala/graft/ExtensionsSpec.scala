package graft

import java.sql.Timestamp

import graft.streaming.Pipeline
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** extension-point registration + oversized-datagram truncation parity */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions makes cosine_sim callable from pure SQL") {
    // force a genuinely new session (same shared SparkContext) so the
    // extensions config is applied — getOrCreate would hand back the
    // active session and silently ignore it; never stop() here, that
    // would kill the context under every other suite
    val shared = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // .withExtensions: the spark.sql.extensions CONFIG is only read when
      // the SparkContext itself is created, so it can't inject into a JVM
      // whose context already exists (as here, shared across suites)
      val s = SparkSession.builder()
        .master(shared.sparkContext.master)
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s.sql(
        """SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
          |                  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c""".stripMargin)
        .collect().head.getDouble(0)
      assert(math.abs(r - 1.0) < 1e-12)
      val grams = s.sql("SELECT word_ngrams(array('a', 'b', 'c', 'a', 'b', 'c'), 3) AS g")
        .collect().head.getSeq[String](0)
      assert(grams === Seq("a b c", "b c a", "c a b"))
      val cid = s.sql(
        """SELECT ivf_assign(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
          |  array(named_struct('cid', 7L, 'ce', array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))),
          |        named_struct('cid', 9L, 'ce', array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT))))) AS cid""".stripMargin)
        .collect().head.getLong(0)
      assert(cid === 7L)
      val b = s.sql("SELECT sign_lsh_bucket(array(CAST(1.0 AS FLOAT)), 8) AS b")
        .collect().head.getInt(0)
      assert(b >= 0 && b < 256)
      val norm = s.sql("SELECT unicode_normalize('a' || 'b', 'NFC') AS n")
        .collect().head.getString(0)
      assert(norm === "ab")
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("oversized raw lines truncate at 40960 chars like the reference receive buffer") {
    val spark = TestSpark.spark
    import spark.implicits._
    val bigMsg = "x" * 60000
    val line = s"firewall,info $bigMsg"
    val df = Seq((line, "10.0.0.1:1", Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("raw", "device", "ts")
    val out = Pipeline.parseToLog(df).collect().head
    val msg = out.getAs[String]("message")
    assert(msg.length === Pipeline.MaxDatagramChars - "firewall,info ".length)
    assert(msg.forall(_ == 'x'))
    assert(out.getAs[Byte]("severity") === 6.toByte)
  }
}
