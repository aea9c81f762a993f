package graft.sources

import java.net.{InetSocketAddress, Socket}
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sinks.KafkaWire

/** Kafka topic read over the from-scratch wire layer — the CONSUMER
  * half of the S1 alternate deployment ("Kafka+Debezium topic read",
  * SURVEY §2.1): `spark.readStream.format(...KafkaWireSource...)`
  * yields `(topic, partition, offset, key, value, timestamp)` rows,
  * and [[graft.operators.DebeziumEnvelope.decode]] turns the values
  * back into the engine's CDC frame. With [[graft.sinks
  * .KafkaEnvelopeSink]] on the other end this closes the reference's
  * Kafka-as-durable-buffer loop offline (no Kafka jar exists in the
  * sandbox; the stock `spark-sql-kafka` connector this mirrors is
  * equally absent).
  *
  * Execution shape — the same as the stock connector's: ONE Spark
  * input partition per Kafka topic-partition, each task opening its
  * own socket and fetching `[start, end)` for exactly its partition;
  * offsets are a per-partition map checkpointed as JSON, so replay
  * after failure re-reads only uncommitted ranges. The driver touches
  * the broker only for ListOffsets (earliest/latest) at plan time.
  */
object KafkaWireSource {
  val schema: StructType = StructType(Seq(
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("key", StringType),
    StructField("value", StringType),
    StructField("timestamp", LongType)
  ))

  /** One short-lived consumer dialogue: connect, run `body`, close. */
  private[sources] def withConn[A](host: String, port: Int)(
      body: ConsumerConn => A): A = {
    val c = new ConsumerConn(host, port)
    try body(c) finally c.close()
  }

  private[sources] final class ConsumerConn(host: String, port: Int) {
    private val socket = new Socket()
    socket.connect(new InetSocketAddress(host, port), 30000)
    socket.setSoTimeout(30000)
    socket.setTcpNoDelay(true)
    private var correlation = 0
    private def nextId(): Int = { correlation += 1; correlation }

    private def roundTrip(framed: Array[Byte]): Array[Byte] = {
      socket.getOutputStream.write(framed); socket.getOutputStream.flush()
      val resp = KafkaWire.readFrame(socket.getInputStream)
      val got = java.nio.ByteBuffer.wrap(resp, 0, 4).getInt
      require(got == correlation, s"correlation drift: sent $correlation got $got")
      resp
    }

    def partitions(topic: String): Seq[Int] = {
      val md = KafkaWire.parseMetadata(
        roundTrip(KafkaWire.metadataRequest(nextId(), "graft-source", Seq(topic))))
      val tm = md.topics.find(_.name == topic)
        .getOrElse(throw new IllegalStateException(s"no metadata for $topic"))
      require(tm.error == 0, s"metadata error ${tm.error} for $topic")
      tm.partitions.map(_.partition).sorted
    }

    def offsets(topic: String, parts: Seq[Int], timestamp: Long): Map[Int, Long] = {
      val res = KafkaWire.parseListOffsets(roundTrip(
        KafkaWire.listOffsetsRequest(nextId(), "graft-source", topic, parts, timestamp)))
      res.map { case (p, (err, off)) =>
        require(err == 0, s"ListOffsets error $err on $topic/$p")
        p -> off
      }
    }

    def fetch(topic: String, partition: Int, offset: Long): KafkaWire.FetchResult = {
      val r = KafkaWire.parseFetchResponse(
        roundTrip(KafkaWire.fetchRequest(nextId(), "graft-source", topic, partition, offset)),
        topic, partition)
      require(r.error == 0, s"fetch error ${r.error} on $topic/$partition")
      r
    }

    def close(): Unit = socket.close()
  }
}

class KafkaWireSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KafkaWireSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    val host = properties.get("host")
    val port = Option(properties.get("port")).map(_.toInt)
      .getOrElse(throw new IllegalArgumentException("kafka-wire source needs .option(\"port\", ...)"))
    val topic = properties.get("topic")
    require(host != null && topic != null,
      "kafka-wire source needs .option(\"host\", ...) and .option(\"topic\", ...)")
    val maxRows = Option(properties.get("maxOffsetsPerTrigger")).map(_.toLong)
    new KafkaWireTable(host, port, topic, maxRows)
  }
  override def supportsExternalMetadata(): Boolean = false
}

class KafkaWireTable(host: String, port: Int, topic: String,
                     maxRowsPerTrigger: Option[Long]) extends Table with SupportsRead {
  override def name(): String = s"graft-kafka-wire($topic@$host:$port)"
  override def schema(): StructType = KafkaWireSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new KafkaWireScan(host, port, topic, maxRowsPerTrigger)
    }
}

class KafkaWireScan(host: String, port: Int, topic: String,
                    maxRowsPerTrigger: Option[Long]) extends Scan {
  override def readSchema(): StructType = KafkaWireSource.schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new KafkaWireMicroBatchStream(host, port, topic, maxRowsPerTrigger)
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      KafkaWireSource.withConn(host, port) { c =>
        val parts = c.partitions(topic)
        val earliest = c.offsets(topic, parts, KafkaWire.TsEarliest)
        val latest = c.offsets(topic, parts, KafkaWire.TsLatest)
        parts.map(p => KafkaWirePartition(host, port, topic, p,
          earliest(p), latest(p)): InputPartition).toArray
      }
    override def createReaderFactory(): PartitionReaderFactory = new KafkaWireReaderFactory
  }
}

/** Per-partition next-offset map, checkpointed as canonical JSON (keys
  * sorted numerically so equal offsets serialize identically).
  */
case class KafkaWireOffset(next: Map[Int, Long]) extends Offset {
  override def json(): String =
    next.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p":$o""" }.mkString("{", ",", "}")
}

object KafkaWireOffset {
  def parse(json: String): KafkaWireOffset = {
    val m = "\"(\\d+)\":(\\d+)".r.findAllMatchIn(json)
      .map(m => m.group(1).toInt -> m.group(2).toLong).toMap
    KafkaWireOffset(m)
  }
}

class KafkaWireMicroBatchStream(host: String, port: Int, topic: String,
                                maxRowsPerTrigger: Option[Long])
    extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset =
    KafkaWireSource.withConn(host, port) { c =>
      val parts = c.partitions(topic)
      KafkaWireOffset(c.offsets(topic, parts, KafkaWire.TsEarliest))
    }

  override def latestOffset(): Offset =
    KafkaWireSource.withConn(host, port) { c =>
      val parts = c.partitions(topic)
      KafkaWireOffset(c.offsets(topic, parts, KafkaWire.TsLatest))
    }

  /** Rate limiting: admit at most maxRows per trigger, split evenly
    * across partitions (the stock connector's proportional admission,
    * simplified to the even split a keyed CDC topic approximates).
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val hi = latestOffset().asInstanceOf[KafkaWireOffset].next
    val lo = start.asInstanceOf[KafkaWireOffset].next
    limit match {
      case r: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
        val perPart = math.max(1L, r.maxRows() / math.max(1, hi.size))
        KafkaWireOffset(hi.map { case (p, h) =>
          p -> math.min(h, lo.getOrElse(p, 0L) + perPart) })
      case _ => KafkaWireOffset(hi)
    }
  }

  override def getDefaultReadLimit: ReadLimit =
    maxRowsPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[KafkaWireOffset].next
    val hi = end.asInstanceOf[KafkaWireOffset].next
    hi.toSeq.sortBy(_._1).collect {
      case (p, h) if h > lo.getOrElse(p, 0L) =>
        KafkaWirePartition(host, port, topic, p, lo.getOrElse(p, 0L), h): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new KafkaWireReaderFactory
  override def deserializeOffset(json: String): Offset = KafkaWireOffset.parse(json)
  override def commit(end: Offset): Unit = () // broker retention is external
  override def stop(): Unit = ()
}

case class KafkaWirePartition(host: String, port: Int, topic: String,
                              partition: Int, start: Long, end: Long) extends InputPartition

class KafkaWireReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[KafkaWirePartition]
    new KafkaWirePartitionReader(p)
  }
}

/** One task = one topic-partition slice `[start, end)`: fetch loop on a
  * private socket; records below `start` (a batch straddling the
  * boundary) are skipped, and a fetch that returns no progress below
  * `end` fails loudly rather than spinning (the broker advertised
  * offsets it cannot serve — truncation, a real consumer's reset case).
  */
class KafkaWirePartitionReader(p: KafkaWirePartition) extends PartitionReader[InternalRow] {
  private val conn = new KafkaWireSource.ConsumerConn(p.host, p.port)
  private var cursor = p.start
  private var buf: Iterator[(Long, KafkaWire.Record)] = Iterator.empty
  private var row: InternalRow = _

  override def next(): Boolean = {
    row = null
    while (row == null && cursor < p.end) {
      if (!buf.hasNext) {
        val r = conn.fetch(p.topic, p.partition, cursor)
        val usable = r.records.filter { case (o, _) => o >= cursor && o < p.end }
        if (usable.isEmpty)
          throw new IllegalStateException(
            s"no progress fetching ${p.topic}/${p.partition} at $cursor (end ${p.end}, hw ${r.highWatermark})")
        buf = usable.iterator
      }
      val (off, rec) = buf.next()
      cursor = off + 1
      row = InternalRow(
        UTF8String.fromString(p.topic),
        p.partition,
        off,
        rec.key.map(b => UTF8String.fromBytes(b)).orNull,
        rec.value.map(b => UTF8String.fromBytes(b)).orNull,
        rec.timestamp)
    }
    row != null
  }

  override def get(): InternalRow = row
  override def close(): Unit = conn.close()
}
