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

  // ===== q_parse_rfc5424: real-syslog header decode =====================

  private def parseRfc(lines: Seq[String]): Seq[Row] =
    lines.toDF("raw")
      .select(col("raw"), model.parseRfc(col("raw")).as("p"))
      .select("raw", "p.format", "p.facility", "p.severity", "p.version",
        "p.ts_text", "p.ts_us", "p.hostname", "p.appname", "p.procid",
        "p.msgid", "p.sd", "p.message")
      .collect().toSeq

  test("rfc decode: every fixture branch lands in the right format with the right header fields") {
    val byRaw = parseRfc(model.rfcFixture.map(_._2))
      .map(r => r.getString(0) -> r).toMap
    def f(raw: String) = byRaw(raw)

    // RFC 5424 §6.5 example: pri 34 → facility 4 (auth), severity 2 (crit)
    val r1 = f("<34>1 2003-10-11T22:14:15.003Z mymachine.example.com su - ID47 - 'su root' failed for lonvick on /dev/pts/8")
    assert(r1.getString(1) === "rfc5424")
    assert(r1.getByte(2) === 4.toByte && r1.getByte(3) === 2.toByte)
    assert(r1.getInt(4) === 1)
    assert(r1.getString(7) === "mymachine.example.com")
    assert(r1.getString(8) === "su" && r1.getString(9) === "-" && r1.getString(10) === "ID47")
    assert(r1.getString(11) === "-")
    assert(r1.getString(12) === "'su root' failed for lonvick on /dev/pts/8")
    // fractional-second RFC 3339 parses to exact µs
    assert(r1.getLong(6) === java.time.Instant.parse("2003-10-11T22:14:15.003Z")
      .toEpochMilli * 1000L)

    // SD blocks + message: sd captured, message after the blocks
    val r3 = f("<165>1 2003-10-11T22:14:15.003Z mymachine.example.com evntslog - ID47 [exampleSDID@32473 iut=\"3\" eventSource=\"Application\" eventID=\"1011\"] An application event log entry")
    assert(r3.getString(11).startsWith("[exampleSDID@32473"))
    assert(r3.getString(12) === "An application event log entry")

    // SD only, no message
    val r4 = f("<165>1 2003-10-11T22:14:15.003Z mymachine.example.com evntslog - ID47 [exampleSDID@32473 iut=\"3\"][examplePriority@32473 class=\"high\"]")
    assert(r4.getString(11) === "[exampleSDID@32473 iut=\"3\"][examplePriority@32473 class=\"high\"]")
    assert(r4.getString(12) === "")

    // the reference README's own example now decodes instead of falling through
    val r5 = f("<166>1 2023-10-27T10:00:00+00:00 MyDevice this is a test")
    assert(r5.getString(1) === "rfc5424")
    assert(r5.getByte(2) === 20.toByte && r5.getByte(3) === 6.toByte)
    assert(r5.getString(7) === "MyDevice")

    // RFC 3164: BSD stamp text kept (no year → no ts_us), host + msg split
    val r7 = f("<13>Oct 11 22:14:15 mymachine su: 'su root' failed for lonvick")
    assert(r7.getString(1) === "rfc3164")
    assert(r7.getByte(2) === 1.toByte && r7.getByte(3) === 5.toByte)
    assert(r7.getString(5) === "Oct 11 22:14:15" && r7.isNullAt(6))
    assert(r7.getString(7) === "mymachine")
    assert(r7.getString(12) === "su: 'su root' failed for lonvick")
    // space-padded day
    assert(f("<13>Oct  7 10:09:00 unicorn sched[0]: That's All Folks!")
      .getString(1) === "rfc3164")

    // PRI > 191 is not a valid header (RFC 5424 §6.2.1) → topics fallback
    val r10 = f("<999>1 2023-01-01T00:00:00Z h a p m - x")
    assert(r10.getString(1) === "topics" && r10.isNullAt(2))

    // MikroTik lines keep their topics severity; facility is null
    val r11 = f("firewall,info forward: in:ether1 out:ether2")
    assert(r11.getString(1) === "topics" && r11.isNullAt(2))
    assert(r11.getByte(3) === 6.toByte)
    assert(r11.getString(12) === "forward: in:ether1 out:ether2")

    // valid PRI but neither shape: decode pri, rest is the message
    val r13 = f("<165>written without version")
    assert(r13.getString(1) === "pri")
    assert(r13.getByte(2) === 20.toByte && r13.getByte(3) === 5.toByte)
    assert(r13.getString(12) === "written without version")
  }

  // --- RFC property tests (deterministic seed) --------------------------
  private val hostGen = Gen.oneOf("h1", "mymachine.example.com", "192.0.2.1", "-")
  private val wordGen = Gen.oneOf("su", "app", "sched", "-", "x9")
  private val priGen = Gen.choose(0, 191)
  private val rfcMsgGen = Gen.oneOf("", "hello world", "a b", "'quoted' txt", "ünïcode")

  private val rfc5424Gen: Gen[(Int, String, String, String, String)] = for {
    pri <- priGen; host <- hostGen; app <- wordGen; msg <- rfcMsgGen
  } yield (pri, "2023-10-27T10:00:00Z", host, app, msg)

  private def rfcSamples(n: Int): Seq[(Int, String, String, String, String)] =
    (0 until n).flatMap(i => rfc5424Gen.apply(Gen.Parameters.default, Seed(7L + i)))

  test("rfc round-trip: generated 5424 lines recover pri/host/app/msg exactly") {
    val cases = rfcSamples(200)
    val lines = cases.map { case (pri, ts, host, app, msg) =>
      s"<$pri>1 $ts $host $app 77 MID -" + (if (msg.isEmpty) "" else s" $msg")
    }
    parseRfc(lines).zip(cases).foreach { case (r, (pri, _, host, app, msg)) =>
      assert(r.getString(1) === "rfc5424", s"line '${r.getString(0)}'")
      assert(r.getByte(2) === (pri / 8).toByte && r.getByte(3) === (pri % 8).toByte)
      assert(r.getString(7) === host && r.getString(8) === app)
      assert(r.getString(12) === msg, s"line '${r.getString(0)}'")
    }
  }

  test("rfc decode is total: arbitrary input never throws, fields stay in range") {
    val junk = (0 until 300).flatMap(i =>
      Gen.asciiPrintableStr.apply(Gen.Parameters.default, Seed(99L + i))) ++
      Seq("<", "<>", "<1>", "<12", "<192>1 x y", "<0>", "<191>",
        "<1><2>msg", "<01>Oct 11 22:14:15 h m")
    parseRfc(junk).foreach { r =>
      val fmt = r.getString(1)
      assert(Set("rfc5424", "rfc3164", "pri", "topics")(fmt), s"'${r.getString(0)}'")
      if (!r.isNullAt(2))
        assert(r.getByte(2) >= 0 && r.getByte(2) <= 23, s"'${r.getString(0)}'")
      assert(r.getByte(3) >= 0 && r.getByte(3) <= 7, s"'${r.getString(0)}'")
      assert(!r.isNullAt(12), s"message null for '${r.getString(0)}'")
      // facility present iff a valid PRI header was decoded
      assert(r.isNullAt(2) === (fmt == "topics"), s"'${r.getString(0)}'")
    }
  }
}
