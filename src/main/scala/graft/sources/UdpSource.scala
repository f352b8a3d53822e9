package graft.sources

import java.net.{DatagramPacket, DatagramSocket, InetAddress}
import java.util
import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DSv2 micro-batch UDP source — the one operator the reference
  * implements natively that Spark lacks (SURVEY.md Table A
  * `stream_source_udp`; `/root/reference/main.go:29-88`).
  *
  * Reference semantics preserved:
  *   - one row per datagram, payload capped at 40 960 bytes (the
  *     reference's receive buffer, main.go:38 — longer datagrams truncate);
  *   - `device` = "ip:port" of the sender (lopParse.go:36);
  *   - `ts` = receive time (lopParse.go:38) — ingest-time semantics;
  *   - bounded buffer of 10 000 datagrams (main.go:21): when full the
  *     receiver thread blocks, pushing drop decisions down to the kernel's
  *     UDP buffer — the same at-most-once contract as the reference.
  *
  * Usage: spark.readStream.format("graft.sources.UdpSourceProvider")
  *   .option("port", "5514").load() → columns (raw, device, ts).
  *
  * Scale note: a single UDP listener is inherently one-node (so is the
  * reference); at fleet scale the ingest edge is a partitioned log (Kafka),
  * and this source exists for protocol parity + local e2e tests. Rows are
  * shipped to executors inside the planned InputPartition, like Spark's own
  * socket source.
  */
object UdpSourceProvider {
  val Schema: StructType = StructType(Seq(
    StructField("raw", StringType), StructField("device", StringType),
    StructField("ts", TimestampType)))

  val MaxDatagram = 40960
  val BufferLimit = 10000

  /** reference's count-based flush bound (`logCacheLimit = 1000`,
    * main.go:19 / lib/cacheManage.go:19-22): a batch flushes at 1000 rows
    * OR the time trigger, whichever first. Here the count half is the
    * default micro-batch admission limit (`maxRowsPerBatch` option, ≤ 0
    * disables); the time half is the query's ProcessingTime trigger. */
  val FlushRows = 1000L

  /** one receiver per port, shared across micro-batch planning calls */
  private val receivers = new ConcurrentHashMap[Int, UdpReceiver]()

  def receiver(port: Int): UdpReceiver =
    receivers.computeIfAbsent(port, p => { val r = new UdpReceiver(p); r.start(); r })

  def stop(port: Int): Unit = {
    val r = receivers.remove(port)
    if (r != null) r.shutdown()
  }
}

/** background receive loop ≡ the reference's main.go:78-88 */
final class UdpReceiver(port: Int) extends Thread(s"graft-udp-$port") {
  setDaemon(true)
  private val socket = new DatagramSocket(port, InetAddress.getByName("0.0.0.0"))
  val boundPort: Int = socket.getLocalPort
  // received rows, index-ordered; offset n = "first n rows"
  private val rows = new ArrayBuffer[(String, String, Long)]()
  private var trimmed = 0L // rows dropped from the head after commit
  @volatile private var running = true

  override def run(): Unit = {
    val buf = new Array[Byte](UdpSourceProvider.MaxDatagram)
    while (running) {
      try {
        val pkt = new DatagramPacket(buf, buf.length)
        socket.receive(pkt) // blocking, like ReadFromUDP
        val raw = new String(pkt.getData, 0, pkt.getLength, "UTF-8")
        val device = s"${pkt.getAddress.getHostAddress}:${pkt.getPort}"
        val ts = System.currentTimeMillis() * 1000L // µs
        synchronized {
          // bounded buffer: block ingest (kernel drops overflow) — the
          // reference's full-channel behavior (main.go:87)
          while (running && rows.length >= UdpSourceProvider.BufferLimit) wait(100)
          rows += ((raw, device, ts))
        }
      } catch {
        case _: Throwable if !running => // socket closed on shutdown
        case _: java.io.IOException => // transient receive error: drop (at-most-once)
      }
    }
  }

  def latest: Long = synchronized { trimmed + rows.length }

  def slice(from: Long, until: Long): Array[(String, String, Long)] = synchronized {
    val lo = math.max(from - trimmed, 0L).toInt
    val hi = math.max(until - trimmed, 0L).toInt
    rows.slice(lo, hi).toArray
  }

  def trim(upTo: Long): Unit = synchronized {
    val n = math.max(upTo - trimmed, 0L).toInt min rows.length
    rows.remove(0, n)
    trimmed += n
    notifyAll()
  }

  /** fast-forward the offset space to `to` after a checkpoint restore:
    * a restarted JVM has a fresh (empty) receiver, so a committed offset
    * from the previous lifetime would otherwise index datagrams that no
    * longer exist and silently swallow the next `to` NEW datagrams (slice
    * clamps). Re-basing aligns "offset `to`" with the current head; the
    * pre-restart datagrams themselves are gone — UDP ingest across a
    * crash is at-most-once, same as the reference's drop-on-error. */
  def rebase(to: Long): Unit = synchronized {
    val cur = trimmed + rows.length
    if (cur < to) trimmed += to - cur
  }

  def shutdown(): Unit = {
    running = false
    socket.close()
  }
}

case class UdpOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

class UdpSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    UdpSourceProvider.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new UdpTable(properties.getOrDefault("port", "5514").toInt,
      properties.getOrDefault("maxRowsPerBatch",
        UdpSourceProvider.FlushRows.toString).toLong)
}

class UdpTable(port: Int, maxRowsPerBatch: Long) extends Table with SupportsRead {
  override def name(): String = s"udp:$port"
  override def schema(): StructType = UdpSourceProvider.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = UdpSourceProvider.Schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new UdpMicroBatchStream(port, maxRowsPerBatch)
      }
    }
}

class UdpMicroBatchStream(port: Int, maxRowsPerBatch: Long)
    extends MicroBatchStream with SupportsAdmissionControl {
  private def rx = UdpSourceProvider.receiver(port)

  // start from 0, not rx.latest: datagrams buffered between receiver
  // bind and stream start must land in the first batch, not be skipped
  override def initialOffset(): Offset = { rx; UdpOffset(0) }
  override def latestOffset(): Offset = UdpOffset(rx.latest)

  // count half of the reference's 1000-row/2s flush rule, expressed as
  // micro-batch admission control: a burst never lands in one giant batch
  override def getDefaultReadLimit: ReadLimit =
    if (maxRowsPerBatch > 0) ReadLimit.maxRows(maxRowsPerBatch)
    else ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[UdpOffset].n
    val cap = limit match {
      case r: ReadMaxRows => from + r.maxRows()
      case _ => Long.MaxValue
    }
    UdpOffset(math.min(rx.latest, cap))
  }

  override def reportLatestOffset(): Offset = UdpOffset(rx.latest)
  // called when restoring offsets from a checkpoint: offsets minted by a
  // previous JVM index a buffer that no longer exists, so re-base the
  // fresh receiver to the restored position instead of letting it swallow
  // that many NEW datagrams (see UdpReceiver.rebase)
  override def deserializeOffset(json: String): Offset = {
    val n = json.toLong
    rx.rebase(n)
    UdpOffset(n)
  }
  override def commit(end: Offset): Unit = rx.trim(end.asInstanceOf[UdpOffset].n)
  override def stop(): Unit = UdpSourceProvider.stop(port)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val rows = rx.slice(start.asInstanceOf[UdpOffset].n, end.asInstanceOf[UdpOffset].n)
    if (rows.isEmpty) Array.empty else Array(UdpInputPartition(rows))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => new PartitionReader[InternalRow] {
      private val rows = partition.asInstanceOf[UdpInputPartition].rows
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = {
        val (raw, device, ts) = rows(i)
        InternalRow(UTF8String.fromString(raw), UTF8String.fromString(device), ts)
      }
      override def close(): Unit = ()
    }
}

case class UdpInputPartition(rows: Array[(String, String, Long)]) extends InputPartition
