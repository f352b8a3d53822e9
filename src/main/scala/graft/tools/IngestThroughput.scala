package graft.tools

/** Dev instrument (not shipped surface): measure the socket sources'
  * single-listener ingest throughput against the reference's implied
  * design envelope — its size trigger fires at a steady ≥500 msg/s
  * (1000-row flush / 2 s ticker, main.go:19-20; BASELINE.md) and its
  * burst ceiling is the 10 000-message channel. No Spark session: this
  * times the receiver thread + bounded row log in isolation, which is
  * the component the reference's numbers describe (its channel consumer
  * is the ClickHouse writer, ours is micro-batch planning — both
  * drain-side, not receive-side).
  *
  * UDP measures RECEIVED msg/s (loopback sends above the receive rate
  * overflow the kernel buffer — the at-most-once contract; the log's
  * `latest` counts admissions). TCP is lossless by construction, so its
  * number is end-to-end for all N frames. The `tls` family prices the
  * RFC 5425 transport (one handshake + per-byte record crypto on an
  * established session); `mtls` adds certificate client auth
  * (handshake-time cost only — the record path is identical), so the
  * four rows together price the full transport trade. TLS key material
  * is generated fresh per run via the JDK's keytool (self-signed,
  * loopback peers — no CA to chain to). Usage:
  *   IngestThroughput [udp|tcp|tls|mtls] [nMessages] [payloadBytes]
  * Prints one JSON line: family, sent, received, secs, msgs_per_sec.
  */
object IngestThroughput {
  private def keytool(args: String*): Unit = {
    val p = new ProcessBuilder(
      (Seq(s"${System.getProperty("java.home")}/bin/keytool") ++ args): _*)
      .redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes, "UTF-8")
    require(p.waitFor() == 0, s"keytool failed: $out")
  }

  /** self-signed PKCS12 server keystore (the TcpSourceSpec recipe) */
  private def makeServerKeystore(): (String, String) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest_tls")
    val path = dir.resolve("server.p12").toString
    val pw = "graftpass"
    keytool("-genkeypair", "-alias", "graft", "-keyalg", "RSA",
      "-keysize", "2048", "-validity", "2", "-dname", "CN=localhost",
      "-keystore", path, "-storetype", "PKCS12", "-storepass", pw, "-keypass", pw)
    (path, pw)
  }

  /** client keypair + a server-side truststore of (only) that cert */
  private def makeClientIdentity(): (String, String, String) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest_mtls")
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

  private val trustAll: Array[javax.net.ssl.TrustManager] = Array(
    new javax.net.ssl.X509TrustManager {
      override def checkClientTrusted(c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
      override def checkServerTrusted(c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
      override def getAcceptedIssuers: Array[java.security.cert.X509Certificate] = Array.empty
    })

  /** TLS client socket; presents the keystore's cert when given (mTLS) */
  private def tlsSocket(port: Int, clientKs: Option[(String, String)]): java.net.Socket = {
    val kms = clientKs.map { case (path, pw) =>
      val ks = java.security.KeyStore.getInstance("PKCS12")
      val in = new java.io.FileInputStream(path)
      try ks.load(in, pw.toCharArray) finally in.close()
      val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
        javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
      kmf.init(ks, pw.toCharArray)
      kmf.getKeyManagers
    }.orNull
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(kms, trustAll, null)
    val s = ctx.getSocketFactory.createSocket("127.0.0.1", port)
      .asInstanceOf[javax.net.ssl.SSLSocket]
    s.startHandshake()
    s
  }

  /** the shared lossless-stream measuring loop: N octet-counted frames
    * through `sock` into `rx`, drained as they land */
  private def measureStream(rx: graft.sources.TcpReceiver,
      sock: java.net.Socket, payload: String, n: Int): (Long, Long, Double) = {
    val out = new java.io.BufferedOutputStream(sock.getOutputStream, 1 << 16)
    val frame = {
      val b = payload.getBytes("UTF-8")
      (s"${b.length} ".getBytes("UTF-8").toSeq ++ b.toSeq).toArray
    }
    val t0 = System.nanoTime()
    var i = 0
    val drainer = new Thread(() => { // keep the bounded log from blocking the reader
      var last = 0L
      while (last < n) {
        val now = rx.latest
        if (now > last) { rx.log.trim(now); last = now }
        else Thread.sleep(1)
      }
    })
    drainer.setDaemon(true)
    drainer.start()
    while (i < n) { out.write(frame); i += 1 }
    out.flush()
    val dl = System.currentTimeMillis() + 120000
    while (rx.latest < n && System.currentTimeMillis() < dl) Thread.sleep(5)
    val dt = (System.nanoTime() - t0) / 1e9
    val got = rx.latest
    sock.close(); rx.shutdown()
    (n.toLong, got, dt)
  }

  def main(args: Array[String]): Unit = {
    val family = args.headOption.getOrElse("udp")
    val n = args.drop(1).headOption.map(_.toInt).getOrElse(200000)
    val payloadBytes = args.drop(2).headOption.map(_.toInt).getOrElse(64)
    val payload = ("firewall,info " + "x" * payloadBytes).take(payloadBytes max 14)

    val (sent, received, secs) = family match {
      case "tcp" =>
        val rx = new graft.sources.TcpReceiver(0)
        rx.start()
        val sock = new java.net.Socket(
          java.net.InetAddress.getByName("127.0.0.1"), rx.boundPort)
        measureStream(rx, sock, payload, n)
      case "tls" =>
        val (ksPath, ksPw) = makeServerKeystore()
        val rx = new graft.sources.TcpReceiver(0,
          Some(graft.sources.TlsServerConfig(ksPath, ksPw)))
        rx.start()
        measureStream(rx, tlsSocket(rx.boundPort, None), payload, n)
      case "mtls" =>
        val (ksPath, ksPw) = makeServerKeystore()
        val (clientKs, trustPath, pw) = makeClientIdentity()
        val rx = new graft.sources.TcpReceiver(0,
          Some(graft.sources.TlsServerConfig(ksPath, ksPw,
            truststorePath = Some(trustPath), truststorePassword = pw,
            needClientAuth = true)))
        rx.start()
        measureStream(rx, tlsSocket(rx.boundPort, Some((clientKs, pw))), payload, n)
      case _ =>
        val rx = new graft.sources.UdpReceiver(0)
        rx.start()
        val sender = new java.net.DatagramSocket()
        val b = payload.getBytes("UTF-8")
        val pkt = new java.net.DatagramPacket(b, b.length,
          java.net.InetAddress.getByName("127.0.0.1"), rx.boundPort)
        val drainer = new Thread(() => {
          while (true) { val now = rx.latest; rx.log.trim(now); Thread.sleep(1) }
        })
        drainer.setDaemon(true)
        drainer.start()
        val t0 = System.nanoTime()
        var i = 0
        while (i < n) { sender.send(pkt); i += 1 }
        // give the receive loop a moment to drain the kernel buffer —
        // and time-stamp the LAST observed admission, so the settle
        // window itself (20 × 10 ms of unchanged reads) never inflates
        // the elapsed time the rate divides by (it biased small-n rates
        // low by the fixed ~200 ms tail)
        var settled = rx.latest
        var tLast = System.nanoTime()
        var same = 0
        while (same < 20) {
          Thread.sleep(10)
          val now = rx.latest
          if (now == settled) same += 1
          else { settled = now; tLast = System.nanoTime(); same = 0 }
        }
        val dt = (tLast - t0) / 1e9
        sender.close(); rx.shutdown()
        (n.toLong, settled, dt)
    }
    def r1(d: Double): Double = math.floor(d * 10 + 0.5) / 10
    println(s"""{"tool":"IngestThroughput","family":"$family","sent":$sent,""" +
      s""""received":$received,"secs":${r1(secs * 10) / 10},""" +
      s""""msgs_per_sec":${r1(received / secs)},""" +
      s""""reference_envelope_msgs_per_sec":500}""")
  }
}
