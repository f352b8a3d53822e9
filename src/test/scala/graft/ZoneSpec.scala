package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Totality + dual-stack contract of the zone classifiers
  * (functions/Scalars.scala): the streaming `zoneOfDevice` when-chain and
  * the batch `deviceZonesOf` LPM join must BOTH classify every
  * sender-controlled stamp — parseable v4 into the v4 catalog, v6 into
  * the v6 catalog, v4-MAPPED literals (::ffff:a.b.c.d — a v4 sender seen
  * through a dual-stack socket) into the v4 catalog, and everything
  * malformed (hostnames, out-of-range octets, truncated brackets) into
  * 'unzoned' — never an ANSI cast error, never a mod-2^32 wrap into a
  * real zone. */
class ZoneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def zoneOf(device: String): String = {
    import spark.implicits._
    Seq(device).toDF("device")
      .select(functions.Scalars.zoneOfDevice(col("device")).as("zone"))
      .collect().head.getString(0)
  }

  test("zoneOfDevice: v4 / v6 / mapped / malformed stamps all classify, totally") {
    // v4 catalog: 10.0.0.0/8 corp, 10.0.0.0/28 corp-core, 10.0.0.8/29
    // corp-infra, 192.168/16 lab, 0/0 default
    assert(zoneOf("10.0.0.5:514") === "corp-core")
    assert(zoneOf("10.0.0.9:514") === "corp-infra")
    assert(zoneOf("10.9.9.9") === "corp")
    assert(zoneOf("8.8.8.8:53") === "default")
    // v6 catalog via the bracketed stamp
    assert(zoneOf("[2001:db8:85a3::1]:514") === "doc-site")
    assert(zoneOf("fe80::1%eth0") === "link-local")
    // v4-mapped = a v4 sender: classifies under the v4 catalog, exactly
    // like the dotted-quad stamp the same sender produces on a v4 bind
    assert(zoneOf("[::ffff:10.0.0.9]:514") === "corp-infra")
    assert(zoneOf("::ffff:192.168.7.1") === "lab")
    assert(zoneOf("::FFFF:10.0.0.5") === "corp-core")
    // ... in EVERY spelling, not just the canonical compressed one: the
    // zone-suffixed, uncompressed, and hex-tail forms of the same v4
    // sender route through the v6 branch, whose NUMERIC mapped check
    // (hi == 0, lo >> 32 == 0xffff) reroutes them to the v4 catalog
    assert(zoneOf("::ffff:10.0.0.9%eth0") === "corp-infra")
    assert(zoneOf("0:0:0:0:0:ffff:10.0.0.9") === "corp-infra")
    assert(zoneOf("::ffff:a00:9") === "corp-infra")
    assert(zoneOf("0:0:0:0:0:ffff:c0a8:701") === "lab")
    // malformed: hostnames, out-of-range octets (266 & 0xFF = 10 — the
    // wrap that used to land in corp-core), truncated brackets
    assert(zoneOf("myrouter.lan:514") === "unzoned")
    assert(zoneOf("266.0.0.5:514") === "unzoned")
    assert(zoneOf("1.2.3.999") === "unzoned")
    assert(zoneOf("[garbage") === "unzoned")
    assert(zoneOf("") === "unzoned")
    // leading-zero octets are octal-ambiguous (inet_aton reads 011 as 9,
    // most parsers as 11) — the shared gate rejects the whole class
    // instead of picking a reading
    assert(zoneOf("10.01.2.3") === "unzoned")
    assert(zoneOf("10.001.2.3") === "unzoned")
    // colon-bearing junk fails the v6 SHAPE gate and lands 'unzoned':
    // without the gate, conv()'s prefix-parsing ('foo' → 15) would
    // derive non-null words and classify the v6 ::/0 default
    assert(zoneOf("foo:bar:baz") === "unzoned")
    assert(zoneOf("dead:beef") === "unzoned") // 2 valid hex groups ≠ a v6 literal
    assert(zoneOf("1:2:3:4:5:6:7:8:9") === "unzoned") // 9 groups, no '::'
    // a mapped literal with an out-of-range quad fails the mapped
    // branch's octet bound, the tail rewrite's, AND the shape gate's
    // (the quad must match WHOLE — '266.0.0.5' never partially rewrites
    // as '2'+hex('66…')): deterministically unzoned
    assert(zoneOf("::ffff:266.0.0.5") === "unzoned")
  }

  test("deviceZonesOf: the batch LPM is total like its streaming twin") {
    import spark.implicits._
    val base = Seq(
      (1, "10.0.0.5"),        // corp-core
      (2, "10.0.0.9"),        // corp-infra
      (3, "192.168.1.1"),     // lab
      (4, "8.8.8.8"),         // default
      (5, "myrouter.lan"),    // hostname → unzoned (used to throw)
      (6, "266.0.0.5"),       // out-of-range octet → unzoned (used to wrap)
      (7, "")).toDF("id", "ip")
    val out = functions.Scalars.deviceZonesOf(spark, base)
      .orderBy("id")
      .collect()
      .map(r => (r.getInt(0), r.getString(2),
        if (r.isNullAt(3)) -1 else r.getInt(3)))
      .toSeq
    assert(out === Seq(
      (1, "corp-core", 28), (2, "corp-infra", 29), (3, "lab", 16),
      (4, "default", 0), (5, "unzoned", -1), (6, "unzoned", -1),
      (7, "unzoned", -1)))
  }

  test("deviceZonesOf is dual-stack: v6 and mapped literals classify like the streaming twin") {
    import spark.implicits._
    val base = Seq(
      (1, "2001:db8:85a3::1"),     // doc-site /48
      (2, "fe80::1%eth0"),         // link-local /10 (zone id stripped)
      (3, "2001:db8::5"),          // doc /32
      (4, "64:ff9b::1"),           // ::/0 default
      (5, "::ffff:10.0.0.9"),      // v4-MAPPED → v4 catalog /29
      (6, "10.0.0.5"),             // plain v4 /28
      (7, "ff02::2"),              // multicast /8
      (8, "myhost.lan"),
      (9, "0:0:0:0:0:ffff:10.0.0.9"), // uncompressed mapped → v4 /29
      (10, "::ffff:a00:9"),        // hex-tail mapped → v4 /29
      (11, "::ffff:10.0.0.9%eth0"), // zone-suffixed mapped → v4 /29
      (12, "foo:bar:baz")          // colon junk → shape-gated unzoned
    ).toDF("id", "ip")
    val out = functions.Scalars.deviceZonesOf(spark, base)
      .orderBy("id").collect()
      .map(r => (r.getInt(0), r.getString(2),
        if (r.isNullAt(3)) -1 else r.getInt(3))).toSeq
    assert(out === Seq(
      (1, "doc-site", 48), (2, "link-local", 10), (3, "doc", 32),
      (4, "default", 0), (5, "corp-infra", 29), (6, "corp-core", 28),
      (7, "multicast", 8), (8, "unzoned", -1),
      (9, "corp-infra", 29), (10, "corp-infra", 29),
      (11, "corp-infra", 29), (12, "unzoned", -1)))
    // zone parity with the streaming classifier on the same frame
    val stream = base
      .select(col("id"), functions.Scalars.zoneOfDevice(col("ip")).as("zone"))
      .as[(Int, String)].collect().toMap
    assert(out.map(r => r._1 -> r._2).toMap === stream,
      "batch dual-stack LPM diverged from the streaming classifier")
  }

  test("batch LPM and streaming classifier agree on every fixture device") {
    import spark.implicits._
    val batch = functions.Scalars.deviceZones(spark)
      .select(col("id"), col("zone")).as[(Int, String)].collect().toMap
    val stream = graft.model.rawLines(spark)
      .select(col("id"), functions.Scalars.zoneOfDevice(col("device")).as("zone"))
      .as[(Int, String)].collect().toMap
    assert(batch === stream, "the two LPM forms diverged on the fixture")
  }
}
