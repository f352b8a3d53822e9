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
  *   .option("port", "5514").load() → columns (raw, device, ts), or
  *   .option("ports", "5514,5515,5516") for N parallel listeners.
  *
  * Scale note: ONE listener is the reference's shape (a single socket,
  * main.go:67-71) and a single-threaded receive loop is the ingest
  * ceiling; the `ports` form shards ingest across N independent
  * receiver threads — each with its own socket, 10 k bounded buffer,
  * and offset lane — and plans one InputPartition PER RECEIVER, so
  * downstream parse/aggregate work fans out N-wide. The per-batch
  * admission cap stays GLOBAL (max-min fair across receivers), keeping
  * the reference's 1000-row flush contract whatever N is. At fleet
  * scale the ingest edge is a partitioned log (Kafka); this source
  * exists for protocol parity + local e2e tests. Rows are shipped to
  * executors inside the planned InputPartition, like Spark's own socket
  * source.
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

/** per-receiver row counts, aligned with the stream's port list; a
  * single-port offset serializes to the same plain integer as before
  * (checkpoint compatibility with the one-port era) */
case class UdpOffset(ns: Seq[Long]) extends Offset {
  override def json(): String = ns.mkString(",")
}
object UdpOffset {
  def apply(n: Long): UdpOffset = UdpOffset(Seq(n))
}

class UdpSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    UdpSourceProvider.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // `ports` (csv) = N sharded listeners; `port` = the reference's
    // single-socket shape. `ports` wins when both are set.
    val ports = Option(properties.get("ports")) match {
      case Some(csv) => csv.split(",").map(_.trim.toInt).toSeq
      case None => Seq(properties.getOrDefault("port", "5514").toInt)
    }
    new UdpTable(ports,
      properties.getOrDefault("maxRowsPerBatch",
        UdpSourceProvider.FlushRows.toString).toLong)
  }
}

class UdpTable(ports: Seq[Int], maxRowsPerBatch: Long) extends Table with SupportsRead {
  override def name(): String = s"udp:${ports.mkString(",")}"
  override def schema(): StructType = UdpSourceProvider.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = UdpSourceProvider.Schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new UdpMicroBatchStream(ports, maxRowsPerBatch)
      }
    }
}

class UdpMicroBatchStream(ports: Seq[Int], maxRowsPerBatch: Long)
    extends MicroBatchStream with SupportsAdmissionControl {
  def this(port: Int, maxRowsPerBatch: Long) = this(Seq(port), maxRowsPerBatch)

  private def rxs = ports.map(UdpSourceProvider.receiver)

  /** offsets written by an older (or re-configured) port list may carry
    * fewer/more lanes — missing lanes start at 0, surplus lanes' rows are
    * gone with their receivers (at-most-once, like the rebase path) */
  private def aligned(o: Offset): Seq[Long] =
    o.asInstanceOf[UdpOffset].ns.padTo(ports.length, 0L).take(ports.length)

  // start from 0, not rx.latest: datagrams buffered between receiver
  // bind and stream start must land in the first batch, not be skipped
  override def initialOffset(): Offset = { rxs; UdpOffset(ports.map(_ => 0L)) }
  override def latestOffset(): Offset = UdpOffset(rxs.map(_.latest))

  // count half of the reference's 1000-row/2s flush rule, expressed as
  // micro-batch admission control: a burst never lands in one giant
  // batch — the cap is GLOBAL across receivers, preserving the contract
  // whatever the listener count
  override def getDefaultReadLimit: ReadLimit =
    if (maxRowsPerBatch > 0) ReadLimit.maxRows(maxRowsPerBatch)
    else ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = aligned(start)
    val avail = rxs.zip(from).map { case (rx, f) => math.max(rx.latest - f, 0L) }
    val budget = limit match {
      case r: ReadMaxRows => r.maxRows()
      case _ => Long.MaxValue
    }
    UdpOffset(from.zip(fairShares(avail, budget)).map { case (f, take) => f + take })
  }

  /** max-min fair split of a global row budget across receivers: ports
    * are served smallest-backlog first, each taking at most an equal
    * share of what remains, so one bursting listener cannot starve the
    * others out of a batch */
  private def fairShares(avail: Seq[Long], budget: Long): Seq[Long] = {
    if (budget == Long.MaxValue) return avail
    val take = Array.fill(avail.length)(0L)
    var remaining = budget
    var left = avail.length
    avail.zipWithIndex.sortBy(_._1).foreach { case (a, i) =>
      val share = math.min(a, remaining / left)
      take(i) = share
      remaining -= share
      left -= 1
    }
    take.toSeq
  }

  override def reportLatestOffset(): Offset = UdpOffset(rxs.map(_.latest))
  // called when restoring offsets from a checkpoint: offsets minted by a
  // previous JVM index buffers that no longer exist, so re-base each
  // fresh receiver to its restored position instead of letting it
  // swallow that many NEW datagrams (see UdpReceiver.rebase)
  override def deserializeOffset(json: String): Offset = {
    val ns = json.split(",").map(_.trim.toLong).toSeq
      .padTo(ports.length, 0L).take(ports.length)
    rxs.zip(ns).foreach { case (rx, n) => rx.rebase(n) }
    UdpOffset(ns)
  }
  override def commit(end: Offset): Unit =
    rxs.zip(aligned(end)).foreach { case (rx, n) => rx.trim(n) }
  override def stop(): Unit = ports.foreach(UdpSourceProvider.stop)

  /** one InputPartition PER RECEIVER with rows: downstream parse work
    * fans out as wide as the listener count */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    rxs.zip(aligned(start).zip(aligned(end))).flatMap { case (rx, (f, u)) =>
      val rows = rx.slice(f, u)
      if (rows.isEmpty) None else Some(UdpInputPartition(rows))
    }.toArray
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
