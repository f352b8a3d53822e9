package graft

import java.net.{DatagramPacket, DatagramSocket, InetAddress}
import java.nio.file.Files

import graft.streaming.Pipeline
import org.scalatest.funsuite.AnyFunSuite

/** stream_source_udp e2e: real datagrams through the custom DSv2 source,
  * parsed by the shared projection, landed in parquet — the full reference
  * program (main.go) as one Spark pipeline. */
class UdpSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("UDP datagrams flow source → parse → parquet sink") {
    // bind an OS-assigned free port first, hand it to the source
    val probe = new DatagramSocket(0)
    val port = probe.getLocalPort
    probe.close()
    // bind the receiver BEFORE sending: datagrams to an unbound port are
    // silently dropped by the kernel (UDP), and the stream may take seconds
    // to initialize the source
    sources.UdpSourceProvider.receiver(port)

    val lines = spark.readStream
      .format(classOf[sources.UdpSourceProvider].getName)
      .option("port", port.toString)
      .load()
    val out = Files.createTempDirectory("graft_udp_sink").toString
    val ckpt = Files.createTempDirectory("graft_udp_ckpt").toString
    val q = Pipeline.start(lines, out, ckpt,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime("200 milliseconds"))

    val sender = new DatagramSocket()
    val target = InetAddress.getByName("127.0.0.1")
    val payloads = Seq(
      "firewall,info forward: in:ether1 out:ether2",
      "system,error,critical login failure",
      "nospacetoken")
    try {
      payloads.foreach { p =>
        val b = p.getBytes("UTF-8")
        sender.send(new DatagramPacket(b, b.length, target, port))
      }
      // UDP is lossy in principle; loopback practically isn't — poll the sink
      val deadline = System.currentTimeMillis() + 30000
      var n = 0L
      while (n < payloads.size && System.currentTimeMillis() < deadline) {
        Thread.sleep(500)
        n = try spark.read.parquet(out).count() catch { case _: Throwable => 0L }
      }
      assert(n === payloads.size.toLong, "datagrams did not reach the sink")
      val sevs = spark.read.parquet(out)
        .select("severity").collect().map(_.getByte(0)).sorted.toSeq
      assert(sevs === Seq(3.toByte, 6.toByte, 6.toByte))
      val dev = spark.read.parquet(out).select("device").collect().head.getString(0)
      assert(dev.startsWith("127.0.0.1:"), s"device should be ip:port, got $dev")
    } finally {
      sender.close()
      q.stop()
    }
  }
}
