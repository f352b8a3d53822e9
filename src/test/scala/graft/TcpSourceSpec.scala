package graft

import java.io.OutputStream
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.file.Files

import graft.streaming.Pipeline
import org.scalatest.funsuite.AnyFunSuite

/** stream_source_tcp e2e: RFC 6587 framed syslog over real loopback TCP
  * through the DSv2 source — octet counting and LF framing mixed on one
  * connection, the RFC decode downstream, burst admission parity with
  * the UDP source (the two share the offset/admission machinery in
  * sources.Ingest). */
class TcpSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freePort(): Int = {
    val s = new ServerSocket(0); val p = s.getLocalPort; s.close(); p
  }

  private def octet(msg: String): Array[Byte] = {
    val b = msg.getBytes("UTF-8")
    (s"${b.length} ".getBytes("UTF-8").toSeq ++ b.toSeq).toArray
  }

  test("framing: mixed octet-counting and LF frames on one connection") {
    val rx = new sources.TcpReceiver(0)
    rx.start()
    val sock = new Socket(InetAddress.getByName("127.0.0.1"), rx.boundPort)
    try {
      val out: OutputStream = sock.getOutputStream
      // octet-counted frame whose PAYLOAD contains \n — must arrive whole
      out.write(octet("<34>1 2003-10-11T22:14:15.003Z h app - - - line1\nline2"))
      // LF-framed with CRLF
      out.write("<13>Oct 11 22:14:15 h su: lf framed\r\n".getBytes("UTF-8"))
      // empty LF line: skipped
      out.write("\n".getBytes("UTF-8"))
      // octet-counted again after the LF ones (per-message detection)
      out.write(octet("firewall,info forward"))
      // digit-run NOT followed by SP: falls back to LF framing, digits kept
      out.write("99x not a length\n".getBytes("UTF-8"))
      out.flush()
      val dl = System.currentTimeMillis() + 10000
      while (rx.latest < 4L && System.currentTimeMillis() < dl) Thread.sleep(50)
      val rows = rx.log.slice(0, rx.latest).map(_._1).toSeq
      assert(rows === Seq(
        "<34>1 2003-10-11T22:14:15.003Z h app - - - line1\nline2",
        "<13>Oct 11 22:14:15 h su: lf framed",
        "firewall,info forward",
        "99x not a length"), s"got $rows")
      val dev = rx.log.slice(0, 1).head._2
      assert(dev.startsWith("127.0.0.1:"), s"device should be ip:port, got $dev")
    } finally {
      sock.close()
      rx.shutdown()
    }
  }

  test("IPv6 client on the dual-stack listener stamps a bracketed device; v4 client unchanged") {
    val v6 = try {
      val s = new ServerSocket(0, 1, InetAddress.getByName("::1")); s.close(); true
    } catch { case _: Throwable => false }
    assume(v6, "IPv6 loopback unavailable on this host")

    val rx = new sources.TcpReceiver(0)
    rx.start()
    val sock6 = new Socket(InetAddress.getByName("::1"), rx.boundPort)
    val sock4 = new Socket(InetAddress.getByName("127.0.0.1"), rx.boundPort)
    try {
      sock6.getOutputStream.write(octet("firewall,info v6 frame"))
      sock6.getOutputStream.flush()
      var dl = System.currentTimeMillis() + 20000
      while (rx.latest < 1L && System.currentTimeMillis() < dl) Thread.sleep(50)
      assert(rx.latest >= 1L, "v6 frame never reached the dual-stack listener")
      val (raw6, dev6, _) = rx.log.slice(0, 1).head
      assert(raw6 === "firewall,info v6 frame")
      assert(dev6 === s"[::1]:${sock6.getLocalPort}",
        s"v6 client must stamp bracketed canonical form, got $dev6")

      sock4.getOutputStream.write(octet("firewall,info v4 frame"))
      sock4.getOutputStream.flush()
      dl = System.currentTimeMillis() + 20000
      while (rx.latest < 2L && System.currentTimeMillis() < dl) Thread.sleep(50)
      assert(rx.latest >= 2L, "v4 frame lost on the dual-stack listener")
      val dev4 = rx.log.slice(1, 2).head._2
      assert(dev4 === s"127.0.0.1:${sock4.getLocalPort}",
        s"v4 client must keep the reference stamp, got $dev4")
    } finally {
      sock6.close(); sock4.close(); rx.shutdown()
    }
  }

  test("framing: oversize octet frame truncates but stays in sync") {
    val rx = new sources.TcpReceiver(0)
    rx.start()
    val sock = new Socket(InetAddress.getByName("127.0.0.1"), rx.boundPort)
    try {
      val out = sock.getOutputStream
      val big = "x" * (sources.Ingest.MaxMessage + 5000)
      out.write(octet(big))
      out.write(octet("after the big one"))
      out.flush()
      val dl = System.currentTimeMillis() + 10000
      while (rx.latest < 2L && System.currentTimeMillis() < dl) Thread.sleep(50)
      val rows = rx.log.slice(0, rx.latest).map(_._1).toSeq
      assert(rows.length === 2, s"desynchronized: $rows")
      assert(rows.head === "x" * sources.Ingest.MaxMessage,
        "oversize frame should truncate at the reference's 40960-byte cap")
      assert(rows(1) === "after the big one",
        "the frame AFTER an oversize one must parse cleanly")
    } finally {
      sock.close()
      rx.shutdown()
    }
  }

  test("framing: frames split across TCP segments reassemble") {
    val rx = new sources.TcpReceiver(0)
    rx.start()
    val sock = new Socket(InetAddress.getByName("127.0.0.1"), rx.boundPort)
    try {
      sock.setTcpNoDelay(true)
      val out = sock.getOutputStream
      val frame = octet("<165>1 2003-10-11T22:14:15.003Z h app - - - split frame payload")
      // drip the frame byte-group by byte-group: length prefix split from
      // payload, payload split mid-way — stream framing must not care
      Seq(frame.slice(0, 2), frame.slice(2, 10), frame.slice(10, frame.length))
        .foreach { part => out.write(part); out.flush(); Thread.sleep(30) }
      out.write("tail,info lf after split\n".getBytes("UTF-8"))
      out.flush()
      val dl = System.currentTimeMillis() + 10000
      while (rx.latest < 2L && System.currentTimeMillis() < dl) Thread.sleep(50)
      val rows = rx.log.slice(0, rx.latest).map(_._1).toSeq
      assert(rows === Seq(
        "<165>1 2003-10-11T22:14:15.003Z h app - - - split frame payload",
        "tail,info lf after split"), s"got $rows")
    } finally {
      sock.close()
      rx.shutdown()
    }
  }

  /** self-signed PKCS12 keystore via the JDK's keytool; trust-all client
    * context (the test peers on loopback — no CA to chain to) */
  private def makeKeystore(): (String, String) = {
    val dir = Files.createTempDirectory("graft_tls_ks")
    val path = dir.resolve("server.p12").toString
    val pw = "graftpass"
    val keytool = new ProcessBuilder(
      s"${System.getProperty("java.home")}/bin/keytool",
      "-genkeypair", "-alias", "graft", "-keyalg", "RSA", "-keysize", "2048",
      "-validity", "2", "-dname", "CN=localhost",
      "-keystore", path, "-storetype", "PKCS12",
      "-storepass", pw, "-keypass", pw)
      .redirectErrorStream(true).start()
    val out = new String(keytool.getInputStream.readAllBytes, "UTF-8")
    assert(keytool.waitFor() === 0, s"keytool failed: $out")
    (path, pw)
  }

  private val trustAll: Array[javax.net.ssl.TrustManager] = Array(
    new javax.net.ssl.X509TrustManager {
      override def checkClientTrusted(c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
      override def checkServerTrusted(c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
      override def getAcceptedIssuers: Array[java.security.cert.X509Certificate] = Array.empty
    })

  private def trustAllSocket(port: Int): javax.net.ssl.SSLSocket = {
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(null, trustAll, null)
    ctx.getSocketFactory.createSocket("127.0.0.1", port)
      .asInstanceOf[javax.net.ssl.SSLSocket]
  }

  private def keytool(args: String*): Unit = {
    val p = new ProcessBuilder(
      (Seq(s"${System.getProperty("java.home")}/bin/keytool") ++ args): _*)
      .redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes, "UTF-8")
    assert(p.waitFor() === 0, s"keytool failed: $out")
  }

  /** mTLS sender material: a client keypair keystore + a server-side
    * truststore holding (only) that client's cert */
  private def makeClientIdentity(): (String, String, String) = {
    val dir = Files.createTempDirectory("graft_tls_client")
    val ks = dir.resolve("client.p12").toString
    val cer = dir.resolve("client.cer").toString
    val trust = dir.resolve("trust.p12").toString
    val pw = "graftpass"
    keytool("-genkeypair", "-alias", "sender", "-keyalg", "RSA",
      "-keysize", "2048", "-validity", "2", "-dname", "CN=sender",
      "-keystore", ks, "-storetype", "PKCS12", "-storepass", pw, "-keypass", pw)
    keytool("-exportcert", "-alias", "sender", "-keystore", ks,
      "-storepass", pw, "-file", cer)
    keytool("-importcert", "-noprompt", "-alias", "sender", "-file", cer,
      "-keystore", trust, "-storetype", "PKCS12", "-storepass", pw)
    (ks, trust, pw)
  }

  /** client socket that PRESENTS a cert from `ksPath` (and trusts any
    * server — loopback peers, no CA) */
  private def clientCertSocket(port: Int, ksPath: String, pw: String): javax.net.ssl.SSLSocket = {
    val ks = java.security.KeyStore.getInstance("PKCS12")
    val in = new java.io.FileInputStream(ksPath)
    try ks.load(in, pw.toCharArray) finally in.close()
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, pw.toCharArray)
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, trustAll, null)
    ctx.getSocketFactory.createSocket("127.0.0.1", port)
      .asInstanceOf[javax.net.ssl.SSLSocket]
  }

  test("TLS (RFC 5425): octet-counted frames over a real TLS handshake; plaintext rejected") {
    val (ksPath, ksPw) = makeKeystore()
    val rx = new sources.TcpReceiver(0, Some(sources.TlsServerConfig(ksPath, ksPw)))
    rx.start()
    // plaintext client first: its bytes must die in the handshake, never
    // reaching the log (RFC 5425's point — no cleartext fallback)
    val plain = new Socket(InetAddress.getByName("127.0.0.1"), rx.boundPort)
    try {
      plain.getOutputStream.write(octet("<34>1 2003-10-11T22:14:15.003Z h app - - - plaintext leak"))
      plain.getOutputStream.flush()
    } catch { case _: java.io.IOException => () } finally plain.close()

    val sock = trustAllSocket(rx.boundPort)
    try {
      sock.startHandshake()
      val out = sock.getOutputStream
      out.write(octet("<34>1 2003-10-11T22:14:15.003Z secure.example.com su - ID47 - over tls"))
      out.write(octet("firewall,info tls forward"))
      out.flush()
      val dl = System.currentTimeMillis() + 10000
      while (rx.latest < 2L && System.currentTimeMillis() < dl) Thread.sleep(50)
      val rows = rx.log.slice(0, rx.latest).map(_._1).toSeq
      assert(rows === Seq(
        "<34>1 2003-10-11T22:14:15.003Z secure.example.com su - ID47 - over tls",
        "firewall,info tls forward"), s"got $rows")
      assert(!rows.exists(_.contains("plaintext leak")),
        "plaintext bytes must never survive the TLS handshake")
    } finally {
      sock.close()
      rx.shutdown()
    }
  }

  test("TLS source e2e: readStream with tls options lands decoded rows") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val (ksPath, ksPw) = makeKeystore()
    val port = freePort()
    sources.TcpSyslogSourceProvider.receiver(port,
      Some(sources.TlsServerConfig(ksPath, ksPw)))

    val lines = spark.readStream
      .format(classOf[sources.TcpSyslogSourceProvider].getName)
      .option("port", port.toString)
      .option("tls", "true")
      .option("tlsKeystore", ksPath)
      .option("tlsKeystorePassword", ksPw)
      .load()
    val ckpt = Files.createTempDirectory("graft_tls_ckpt").toString
    val q = Pipeline.parseToRfcLog(lines).writeStream
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("tls_rfc").start()
    val sock = trustAllSocket(port)
    try {
      sock.startHandshake()
      sock.getOutputStream.write(octet("<165>1 2023-01-01T00:00:00Z tlshost app 1 - - hello"))
      sock.getOutputStream.flush()
      val deadline = System.currentTimeMillis() + 120000
      var n = 0L
      while (n < 1L && System.currentTimeMillis() < deadline) {
        Thread.sleep(1000)
        n = try spark.table("tls_rfc").count() catch { case _: Throwable => 0L }
      }
      assert(n === 1L, "TLS frame did not reach the sink")
      val r = spark.table("tls_rfc").select("format", "hostname").collect().head
      assert(r.getString(0) === "rfc5424" && r.getString(1) === "tlshost")
    } finally {
      sock.close()
      q.stop()
    }
  }

  test("mTLS (RFC 5425 §5.2): certless client rejected before any frame lands; cert-bearing client decodes") {
    val (serverKs, serverPw) = makeKeystore()
    val (clientKs, trustPath, pw) = makeClientIdentity()
    val rx = new sources.TcpReceiver(0, Some(sources.TlsServerConfig(
      serverKs, serverPw, Some(trustPath), pw, needClientAuth = true)))
    rx.start()
    // client that completes TLS but presents NO certificate: the server
    // aborts the handshake (certificate_required) — its frames must
    // never reach the log
    val bare = trustAllSocket(rx.boundPort)
    try {
      bare.startHandshake()
      bare.getOutputStream.write(octet("<34>1 2003-10-11T22:14:15.003Z h app - - - certless leak"))
      bare.getOutputStream.flush()
      bare.getInputStream.read() // drive the server's alert back
    } catch { case _: java.io.IOException => () } finally bare.close()
    Thread.sleep(500)
    assert(rx.latest === 0L, "certless client's frames must never reach the log")
    // client presenting the truststore's cert: frames decode normally
    val sock = clientCertSocket(rx.boundPort, clientKs, pw)
    try {
      sock.startHandshake()
      val out = sock.getOutputStream
      out.write(octet("<34>1 2003-10-11T22:14:15.003Z mutual.example.com su - ID47 - over mtls"))
      out.flush()
      val dl = System.currentTimeMillis() + 10000
      while (rx.latest < 1L && System.currentTimeMillis() < dl) Thread.sleep(50)
      val rows = rx.log.slice(0, rx.latest).map(_._1).toSeq
      assert(rows === Seq(
        "<34>1 2003-10-11T22:14:15.003Z mutual.example.com su - ID47 - over mtls"),
        s"got $rows")
    } finally {
      sock.close()
      rx.shutdown()
    }
  }

  test("provider options: tlsNeedClientAuth requires tlsTruststore; tls requires tlsKeystore") {
    def table(opts: (String, String)*) = {
      val props = new java.util.HashMap[String, String]()
      opts.foreach { case (k, v) => props.put(k, v) }
      new sources.TcpSyslogSourceProvider().getTable(
        sources.TcpSyslogSourceProvider.Schema, Array.empty, props)
    }
    val eKs = intercept[IllegalArgumentException] { table("tls" -> "true") }
    assert(eKs.getMessage.contains("tlsKeystore"))
    val eTs = intercept[IllegalArgumentException] {
      table("tls" -> "true", "tlsKeystore" -> "/tmp/k.p12",
        "tlsNeedClientAuth" -> "true")
    }
    assert(eTs.getMessage.contains("tlsTruststore"))
    // fully-specified mTLS options parse into a tls-mode table
    val t = table("tls" -> "true", "tlsKeystore" -> "/tmp/k.p12",
      "tlsNeedClientAuth" -> "true", "tlsTruststore" -> "/tmp/t.p12",
      "port" -> "6514")
    assert(t.name().startsWith("tcp+tls"))
  }

  test("conflicting TLS rebind on a bound port throws instead of silently downgrading") {
    val port = freePort()
    sources.TcpSyslogSourceProvider.receiver(port) // bound plaintext
    try {
      val (ksPath, ksPw) = makeKeystore()
      intercept[IllegalStateException] {
        sources.TcpSyslogSourceProvider.receiver(port,
          Some(sources.TlsServerConfig(ksPath, ksPw)))
      }
      // re-requesting the SAME binding stays fine
      sources.TcpSyslogSourceProvider.receiver(port)
    } finally sources.TcpSyslogSourceProvider.stop(port)
  }

  test("restored offsets re-base a fresh TCP receiver instead of swallowing new frames") {
    val port = freePort()
    val stream = new sources.TcpMicroBatchStream(port, 1000)
    // simulate a checkpoint restore: offset 7 was committed by a previous
    // JVM; the fresh receiver's buffer is empty
    val restored = stream.deserializeOffset("7")
    val rx = sources.TcpSyslogSourceProvider.receiver(port)
    assert(rx.latest === 7L, "restore should fast-forward the offset space")
    val sock = new Socket(InetAddress.getByName("127.0.0.1"), port)
    try {
      val out: OutputStream = sock.getOutputStream
      (1 to 3).foreach(i => out.write(octet(s"row $i")))
      out.flush()
      val dl = System.currentTimeMillis() + 10000
      while (rx.latest < 10L && System.currentTimeMillis() < dl) Thread.sleep(50)
      assert(rx.latest === 10L)
      // without the re-base these three frames would be eaten by the
      // stale offset range (slice clamps to the new buffer's head) —
      // on a lossless-by-contract transport that would be silent loss
      val parts = stream.planInputPartitions(restored, sources.IngestOffset(rx.latest))
      val rows = parts.head.asInstanceOf[sources.IngestInputPartition].rows
      assert(rows.length === 3, "new frames swallowed by a stale restored offset")
      assert(rows.map(_._1).toSeq === Seq("row 1", "row 2", "row 3"))
    } finally {
      sock.close()
      sources.TcpSyslogSourceProvider.stop(port)
    }
  }

  test("framed TCP flows source → rfc decode → sink: mixed fleet, two connections") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val port = freePort()
    sources.TcpSyslogSourceProvider.receiver(port)

    val lines = spark.readStream
      .format(classOf[sources.TcpSyslogSourceProvider].getName)
      .option("port", port.toString)
      .load()
    val ckpt = Files.createTempDirectory("graft_tcp_rfc_ckpt").toString
    val q = Pipeline.parseToRfcLog(lines).writeStream
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("tcp_rfc").start()

    val target = InetAddress.getByName("127.0.0.1")
    val sockA = new Socket(target, port)
    val sockB = new Socket(target, port)
    try {
      // connection A: octet-counted RFC 5424 + LF-framed RFC 3164
      val a = sockA.getOutputStream
      a.write(octet("<34>1 2003-10-11T22:14:15.003Z mymachine.example.com su - ID47 - auth failure"))
      a.write("<13>Oct 11 22:14:15 mymachine su: session opened\n".getBytes("UTF-8"))
      a.flush()
      // connection B: LF-framed MikroTik topics line
      val bOut = sockB.getOutputStream
      bOut.write("firewall,info forward: in:ether1 out:ether2\n".getBytes("UTF-8"))
      bOut.flush()

      val deadline = System.currentTimeMillis() + 120000
      var n = 0L
      while (n < 3L && System.currentTimeMillis() < deadline) {
        Thread.sleep(1000)
        n = try spark.table("tcp_rfc").count() catch { case _: Throwable => 0L }
      }
      assert(n === 3L, "framed messages did not reach the sink")
      val rows = spark.table("tcp_rfc")
        .select("format", "facility", "severity", "hostname")
        .collect().map(r => (r.getString(0),
          if (r.isNullAt(1)) -1 else r.getByte(1).toInt,
          r.getByte(2).toInt, if (r.isNullAt(3)) null else r.getString(3)))
        .sortBy(_._1).toSeq
      assert(rows === Seq(
        ("rfc3164", 1, 5, "mymachine"),
        ("rfc5424", 4, 2, "mymachine.example.com"),
        ("topics", -1, 6, null)), s"got $rows")
    } finally {
      sockA.close()
      sockB.close()
      q.stop()
    }
  }

  test("maxRowsPerBatch caps micro-batch size under burst (admission parity with UDP)") {
    val port = freePort()
    val rx = sources.TcpSyslogSourceProvider.receiver(port)

    val sock = new Socket(InetAddress.getByName("127.0.0.1"), port)
    try {
      // burst past the 1000-row flush bound BEFORE the stream starts —
      // TCP is lossless, so unlike the UDP twin every row must arrive
      val out = sock.getOutputStream
      val total = 2500
      (1 to total).foreach { i =>
        out.write(s"system,info burst row $i\n".getBytes("UTF-8"))
      }
      out.flush()
      val rxDeadline = System.currentTimeMillis() + 15000
      while (rx.latest < total && System.currentTimeMillis() < rxDeadline) Thread.sleep(50)
      assert(rx.latest === total.toLong, s"TCP must be lossless, got ${rx.latest}")

      val sizes = scala.collection.mutable.ArrayBuffer[Long]()
      val ckpt = Files.createTempDirectory("graft_tcp_burst_ckpt").toString
      val q = spark.readStream
        .format(classOf[sources.TcpSyslogSourceProvider].getName)
        .option("port", port.toString)
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val n = b.count()
          sizes.synchronized { sizes += n }
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
        .start()
      try {
        val deadline = System.currentTimeMillis() + 30000
        while (sizes.synchronized(sizes.sum) < total &&
          System.currentTimeMillis() < deadline) Thread.sleep(100)
        val snap = sizes.synchronized(sizes.toSeq)
        assert(snap.sum >= total, s"rows lost: ${snap.sum} of $total")
        assert(snap.forall(_ <= sources.UdpSourceProvider.FlushRows),
          s"a micro-batch exceeded the ${sources.UdpSourceProvider.FlushRows}-row flush bound: $snap")
        assert(snap.count(_ == sources.UdpSourceProvider.FlushRows) >= 2,
          s"expected at least two full flush-bound batches from a $total-row burst: $snap")
      } finally q.stop()
    } finally sock.close()
  }
}
