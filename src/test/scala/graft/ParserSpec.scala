package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** q_parse_syslog semantics (SURVEY.md §1.4, FIXTURES.md §1) — every branch
  * of /root/reference/lib/lopParse.go:29-81 plus the engine-defined fix for
  * its no-space panic, and property tests over generated raw lines. */
class ParserSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def parse(lines: Seq[String]): Seq[(String, Byte, Seq[String], String)] =
    lines.toDF("raw")
      .select(col("raw"), model.parseSyslog(col("raw")).as("p"))
      .select("raw", "p.severity", "p.categories", "p.message")
      .as[(String, Byte, Seq[String], String)]
      .collect().toSeq

  // FIXTURES.md §1 expectations, keyed by raw line
  private val expected = Seq(
    ("firewall,info forward: in:ether1 out:ether2", 6, Seq("firewall"), "forward: in:ether1 out:ether2"),
    ("system,error,critical login failure for user admin", 3, Seq("system", "critical"), "login failure for user admin"),
    ("wireless,fatal radio down", 0, Seq("wireless"), "radio down"),
    ("wireless,emergency radio down", 0, Seq("wireless"), "radio down"),
    ("dhcp,alert lease pool exhausted", 1, Seq("dhcp"), "lease pool exhausted"),
    ("system,critical disk failure", 2, Seq("system"), "disk failure"),
    ("interface,warning link flap on ether3", 4, Seq("interface"), "link flap on ether3"),
    ("dns,notice cache flushed", 5, Seq("dns"), "cache flushed"),
    ("firewall,debug rule matched", 7, Seq("firewall"), "rule matched"),
    ("sniffer,packet tcp 10.0.0.1:443", 7, Seq("sniffer"), "tcp 10.0.0.1:443"),
    ("ppp,raw LCP echo", 7, Seq("ppp"), "LCP echo"),
    ("vpn,weird tunnel established", 6, Seq("vpn", "weird"), "tunnel established"),
    ("a,unknownsev,b,c msg body", 6, Seq("a", "b", "c", "unknownsev"), "msg body"),
    ("<166>1 2023-10-27T10:00:00+00:00 MyDevice this is a test", 6, Seq("unknown"),
      "<166>1 2023-10-27T10:00:00+00:00 MyDevice this is a test"),
    ("plainword no commas here", 6, Seq("unknown"), "plainword no commas here"),
    ("nospacetoken", 6, Seq("unknown"), "nospacetoken"),
    ("", 6, Seq("unknown"), ""),
    ("firewall,info ", 6, Seq("firewall"), ""))

  test("every parser branch matches the reference semantics table") {
    val got = parse(expected.map(_._1)).map(r => (r._1, r._2.toInt, r._3, r._4))
    expected.zip(got).foreach { case (want, have) =>
      assert(have === want, s"for raw line '${want._1}'")
    }
  }

  // --- property tests over generated lines (deterministic seed) ---------
  private val topicGen = Gen.oneOf("firewall", "system", "wifi", "a", "x1")
  private val sevGen = Gen.oneOf(model.knownTokens ++ Seq("bogus", "zzz", "Info", ""))
  private val msgGen = Gen.oneOf("", "hello world", "x", "a b c d", "ünïcode msg", "trailing ")
  private val lineGen: Gen[String] = Gen.oneOf(
    for { t <- topicGen; s0 <- sevGen; extra <- Gen.listOf(topicGen); m <- msgGen }
      yield (Seq(t, s0) ++ extra).mkString(",") + " " + m,
    Gen.oneOf("nospace", "", "word1 word2", "a,b", ",", ", x", " leadingspace"),
    Gen.asciiPrintableStr)

  private def samples(n: Int): Seq[String] =
    (0 until n).flatMap(i => lineGen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("parser is total and severity always in [0,7]") {
    val rows = parse(samples(300))
    assert(rows.nonEmpty)
    rows.foreach { case (raw, sev, cats, msg) =>
      assert(sev >= 0 && sev <= 7, s"severity out of range for '$raw'")
      assert(cats.nonEmpty, s"categories empty for '$raw'")
      assert(msg != null)
    }
  }

  test("fallback iff first space-token has fewer than 2 comma-fields") {
    parse(samples(300)).foreach { case (raw, sev, cats, msg) =>
      val catStr = raw.split(" ", 2).head
      val isFallback = catStr.split(",", -1).length < 2
      if (isFallback) {
        assert(sev === 6 && cats === Seq("unknown") && msg === raw, s"for '$raw'")
      } else {
        assert(cats.head === catStr.split(",", -1).head, s"for '$raw'")
      }
    }
  }

  test("unknown severity token is appended LAST to categories") {
    parse(Seq("top,oddtok,mid hello")).foreach { case (_, sev, cats, _) =>
      assert(sev === 6)
      assert(cats === Seq("top", "mid", "oddtok"))
    }
  }

  test("non-fallback lines reconstruct: catStr + ' ' + message == raw") {
    parse(samples(300)).foreach { case (raw, _, cats, msg) =>
      val catStr = raw.split(" ", 2).head
      if (catStr.split(",", -1).length >= 2 && raw.contains(" "))
        assert(catStr + " " + msg === raw, s"for '$raw'")
    }
  }

  test("severity token mapping matches lopParse.go:51-72 verbatim") {
    val got = parse(model.knownTokens.map(t => s"top,$t m"))
    val want = model.severityTokens.toMap
    model.knownTokens.zip(got).foreach { case (tok, (_, sev, _, _)) =>
      assert(sev.toInt === want(tok), s"token $tok")
    }
  }
}
