package graft.sinks

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream, InputStream}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

/** From-scratch Kafka wire protocol — the byte layer under the K6 sink
  * (reference publishes CDC envelopes with a Kafka producer library,
  * `driver/kafka/kafka3.go:867-1063`; here the producer itself is
  * rebuilt from the public protocol spec, kafka.apache.org/protocol,
  * because no Kafka jar exists in the offline environment — the same
  * honest-substitute shape as `sources/MysqlWire.scala` for S1).
  *
  * Scope: exactly what a CDC producer needs, in the oldest
  * NON-FLEXIBLE (no tagged fields) versions that carry v2 record
  * batches — ApiVersions v0, Metadata v1, Produce v3. Every message is
  * `INT32 size + payload`; requests carry header v1 (`api_key INT16,
  * api_version INT16, correlation_id INT32, client_id
  * NULLABLE_STRING`), responses header v0 (`correlation_id INT32`).
  *
  * The record set is a v2 RecordBatch: fixed 61-byte header
  * (baseOffset, batchLength, partitionLeaderEpoch, magic=2, CRC32C,
  * attributes, lastOffsetDelta, base/max timestamps, producer
  * id/epoch/sequence, record count) followed by varint-framed records
  * (zigzag protobuf varints — the protocol's one non-big-endian
  * encoding). The CRC is CRC32-Castagnoli over attributes..end
  * (`java.util.zip.CRC32C`), NOT the IEEE polynomial the binlog layer
  * uses — a broker rejects an IEEE-summed batch with
  * CORRUPT_MESSAGE(2).
  */
object KafkaWire {

  // ---- API keys -----------------------------------------------------
  val ApiProduce: Short = 0
  val ApiFetch: Short = 1
  val ApiListOffsets: Short = 2
  val ApiMetadata: Short = 3
  val ApiVersions: Short = 18

  // ---- primitive writers (big-endian, like the JVM's DataOutput) ----
  final class Out {
    private val bos = new ByteArrayOutputStream()
    private val d = new DataOutputStream(bos)
    def i8(v: Int): Out = { d.writeByte(v); this }
    def i16(v: Int): Out = { d.writeShort(v); this }
    def i32(v: Int): Out = { d.writeInt(v); this }
    def i64(v: Long): Out = { d.writeLong(v); this }
    def raw(b: Array[Byte]): Out = { d.write(b); this }
    /** STRING: INT16 length + UTF-8 bytes. */
    def str(s: String): Out = { val b = s.getBytes(UTF_8); i16(b.length); raw(b) }
    /** NULLABLE_STRING: length -1 encodes null. */
    def nstr(s: Option[String]): Out =
      s.fold { i16(-1) } { v => str(v) }
    /** NULLABLE_BYTES: INT32 length, -1 = null. */
    def nbytes(b: Option[Array[Byte]]): Out =
      b.fold { i32(-1) } { v => i32(v.length); raw(v) }
    /** Zigzag varint (protobuf encoding — records only). */
    def varint(v: Int): Out = varlong(v.toLong)
    def varlong(v: Long): Out = {
      var z = (v << 1) ^ (v >> 63)
      while ((z & ~0x7fL) != 0) { d.writeByte(((z & 0x7f) | 0x80).toInt); z >>>= 7 }
      d.writeByte(z.toInt); this
    }
    def bytes: Array[Byte] = { d.flush(); bos.toByteArray }
    def size: Int = bos.size()
  }

  // ---- primitive readers ---------------------------------------------
  final class In(buf: ByteBuffer) {
    def this(b: Array[Byte]) = this(ByteBuffer.wrap(b))
    def i8: Byte = buf.get()
    def i16: Short = buf.getShort()
    def i32: Int = buf.getInt()
    def i64: Long = buf.getLong()
    def raw(n: Int): Array[Byte] = { val b = new Array[Byte](n); buf.get(b); b }
    def str: String = new String(raw(i16 & 0xffff), UTF_8)
    def nstr: Option[String] = { val n = i16; if (n < 0) None else Some(new String(raw(n), UTF_8)) }
    def nbytes: Option[Array[Byte]] = { val n = i32; if (n < 0) None else Some(raw(n)) }
    def varint: Int = varlong.toInt
    def varlong: Long = {
      var z = 0L; var shift = 0; var b = 0
      do { b = buf.get() & 0xff; z |= (b & 0x7fL) << shift; shift += 7 } while ((b & 0x80) != 0)
      (z >>> 1) ^ -(z & 1)
    }
    def remaining: Int = buf.remaining()
    def position: Int = buf.position()
  }

  // ---- framing --------------------------------------------------------
  /** One framed request: INT32 size, header v1, body. */
  def request(apiKey: Short, apiVersion: Short, correlationId: Int,
              clientId: String, body: Array[Byte]): Array[Byte] = {
    val o = new Out
    o.i16(apiKey).i16(apiVersion).i32(correlationId).nstr(Some(clientId)).raw(body)
    val framed = new Out
    framed.i32(o.size).raw(o.bytes)
    framed.bytes
  }

  /** Blocking read of one framed message (response or request) off a
    * stream; throws EOFException on a torn frame like the binlog layer.
    */
  def readFrame(in: InputStream): Array[Byte] = {
    val d = new DataInputStream(in)
    val size = d.readInt()
    require(size >= 0 && size <= 64 * 1024 * 1024, s"unreasonable kafka frame: $size")
    val b = new Array[Byte](size)
    d.readFully(b)
    b
  }

  // ---- ApiVersions v0 ---------------------------------------------------
  def apiVersionsRequest(correlationId: Int, clientId: String): Array[Byte] =
    request(ApiVersions, 0, correlationId, clientId, Array.emptyByteArray)

  /** (apiKey → (min, max)) from an ApiVersions v0 response body. */
  def parseApiVersions(body: Array[Byte]): (Short, Map[Short, (Short, Short)]) = {
    val in = new In(body.drop(4)) // response header v0: correlation_id
    val err = in.i16
    val n = in.i32
    val m = (0 until n).map { _ => (in.i16, (in.i16, in.i16)) }.toMap
    (err, m)
  }

  // ---- Metadata v1 --------------------------------------------------------
  def metadataRequest(correlationId: Int, clientId: String, topics: Seq[String]): Array[Byte] = {
    val o = new Out
    o.i32(topics.size); topics.foreach(o.str)
    request(ApiMetadata, 1, correlationId, clientId, o.bytes)
  }

  case class PartitionMeta(error: Short, partition: Int, leader: Int)
  case class TopicMeta(error: Short, name: String, internal: Boolean, partitions: Seq[PartitionMeta])
  case class Metadata(brokers: Map[Int, (String, Int)], controller: Int, topics: Seq[TopicMeta])

  def parseMetadata(body: Array[Byte]): Metadata = {
    val in = new In(body.drop(4))
    val brokers = (0 until in.i32).map { _ =>
      val id = in.i32; val host = in.str; val port = in.i32; in.nstr // rack
      id -> (host, port)
    }.toMap
    val controller = in.i32
    val topics = (0 until in.i32).map { _ =>
      val err = in.i16; val name = in.str; val internal = in.i8 != 0
      val parts = (0 until in.i32).map { _ =>
        val pe = in.i16; val p = in.i32; val leader = in.i32
        (0 until in.i32).foreach(_ => in.i32) // replicas
        (0 until in.i32).foreach(_ => in.i32) // isr
        PartitionMeta(pe, p, leader)
      }
      TopicMeta(err, name, internal, parts)
    }
    Metadata(brokers, controller, topics)
  }

  // ---- RecordBatch v2 ---------------------------------------------------
  case class Record(key: Option[Array[Byte]], value: Option[Array[Byte]],
                    timestamp: Long,
                    headers: Seq[(String, Array[Byte])] = Nil)

  /** Encode records into one v2 batch. CRC32C covers attributes..end —
    * computed over the assembled suffix, then spliced in after the
    * 21-byte prefix (baseOffset, batchLength, partitionLeaderEpoch,
    * magic).
    */
  def encodeBatch(records: Seq[Record], baseTimestamp: Long): Array[Byte] = {
    require(records.nonEmpty, "empty record batch")
    val maxTs = records.map(_.timestamp).max
    val afterCrc = new Out
    afterCrc.i16(0)                       // attributes: no compression
    afterCrc.i32(records.size - 1)        // lastOffsetDelta
    afterCrc.i64(baseTimestamp)
    afterCrc.i64(maxTs)
    afterCrc.i64(-1L)                     // producerId (idempotence off)
    afterCrc.i16(-1)                      // producerEpoch
    afterCrc.i32(-1)                      // baseSequence
    afterCrc.i32(records.size)
    records.zipWithIndex.foreach { case (r, i) =>
      val rec = new Out
      rec.i8(0)                           // record attributes
      rec.varlong(r.timestamp - baseTimestamp)
      rec.varint(i)                       // offsetDelta
      r.key.fold { rec.varint(-1) } { k => rec.varint(k.length); rec.raw(k) }
      r.value.fold { rec.varint(-1) } { v => rec.varint(v.length); rec.raw(v) }
      rec.varint(r.headers.size)
      r.headers.foreach { case (hk, hv) =>
        val kb = hk.getBytes(UTF_8)
        rec.varint(kb.length); rec.raw(kb)
        rec.varint(hv.length); rec.raw(hv)
      }
      afterCrc.varint(rec.size); afterCrc.raw(rec.bytes)
    }
    val suffix = afterCrc.bytes
    val crc = new java.util.zip.CRC32C
    crc.update(suffix)
    val o = new Out
    o.i64(0L)                             // baseOffset
    o.i32(4 + 1 + 4 + suffix.length)      // batchLength: epoch+magic+crc+suffix
    o.i32(-1)                             // partitionLeaderEpoch
    o.i8(2)                               // magic
    o.i32(crc.getValue.toInt)
    o.raw(suffix)
    o.bytes
  }

  /** Decode one v2 batch, VERIFYING the CRC32C (throws on mismatch —
    * the corrupt-batch behavior a real broker has).
    */
  def decodeBatch(bytes: Array[Byte]): Seq[Record] = {
    val in = new In(bytes)
    in.i64                                // baseOffset
    val batchLength = in.i32
    require(batchLength == bytes.length - 12,
      s"batchLength $batchLength != ${bytes.length - 12}")
    in.i32                                // partitionLeaderEpoch
    val magic = in.i8
    require(magic == 2, s"only v2 batches supported, got magic=$magic")
    val claimed = in.i32
    val suffix = java.util.Arrays.copyOfRange(bytes, 21, bytes.length)
    val crc = new java.util.zip.CRC32C
    crc.update(suffix)
    require(crc.getValue.toInt == claimed,
      f"record batch CRC32C mismatch: claimed 0x$claimed%08x computed 0x${crc.getValue.toInt}%08x")
    in.i16                                // attributes
    in.i32                                // lastOffsetDelta
    val baseTs = in.i64
    in.i64                                // maxTimestamp
    in.i64; in.i16; in.i32                // producer id/epoch/sequence
    val n = in.i32
    (0 until n).map { _ =>
      val len = in.varint
      val end = in.position + len
      in.i8                               // record attributes
      val tsDelta = in.varlong
      in.varint                           // offsetDelta
      val klen = in.varint
      val key = if (klen < 0) None else Some(in.raw(klen))
      val vlen = in.varint
      val value = if (vlen < 0) None else Some(in.raw(vlen))
      val headers = (0 until in.varint).map { _ =>
        val hk = new String(in.raw(in.varint), UTF_8)
        (hk, in.raw(in.varint))
      }
      require(in.position == end, s"record framing drift: at ${in.position}, expected $end")
      Record(key, value, baseTs + tsDelta, headers)
    }
  }

  // ---- Produce v3 -----------------------------------------------------------
  /** topicData: topic → (partition → batch bytes). */
  def produceRequest(correlationId: Int, clientId: String, acks: Short, timeoutMs: Int,
                     topicData: Seq[(String, Seq[(Int, Array[Byte])])]): Array[Byte] = {
    val o = new Out
    o.nstr(None)                          // transactional_id
    o.i16(acks)
    o.i32(timeoutMs)
    o.i32(topicData.size)
    topicData.foreach { case (topic, parts) =>
      o.str(topic)
      o.i32(parts.size)
      parts.foreach { case (p, batch) => o.i32(p); o.nbytes(Some(batch)) }
    }
    request(ApiProduce, 3, correlationId, clientId, o.bytes)
  }

  case class PartitionAck(topic: String, partition: Int, error: Short, baseOffset: Long)

  def parseProduceResponse(body: Array[Byte]): Seq[PartitionAck] = {
    val in = new In(body.drop(4))
    val acks = (0 until in.i32).flatMap { _ =>
      val topic = in.str
      (0 until in.i32).map { _ =>
        val p = in.i32; val err = in.i16; val off = in.i64; in.i64 // log_append_time
        PartitionAck(topic, p, err, off)
      }
    }
    in.i32                                // throttle_time_ms
    acks
  }

  /** Decode a LOG slice — zero or more concatenated v2 batches (what a
    * Fetch response's record_set carries) — yielding each record with
    * its ABSOLUTE offset (baseOffset + offsetDelta). CRC-verified per
    * batch like [[decodeBatch]]. A trailing partial batch (the broker
    * may cut a slice at max_bytes mid-batch) is dropped silently — the
    * consumer re-fetches from the last full offset, Kafka's contract.
    */
  def decodeLog(bytes: Array[Byte]): Seq[(Long, Record)] = {
    val out = Seq.newBuilder[(Long, Record)]
    var pos = 0
    while (pos + 12 <= bytes.length) {
      val bb = ByteBuffer.wrap(bytes, pos, 12)
      val baseOffset = bb.getLong
      val batchLength = bb.getInt
      val end = pos + 12 + batchLength
      if (end > bytes.length) pos = bytes.length // partial tail: stop
      else {
        val slice = java.util.Arrays.copyOfRange(bytes, pos, end)
        // decodeBatch returns records in offsetDelta order (they are
        // written that way and the framing walk preserves it)
        decodeBatch(slice).zipWithIndex.foreach { case (r, i) =>
          out += ((baseOffset + i, r))
        }
        pos = end
      }
    }
    out.result()
  }

  // ---- ListOffsets v1 ---------------------------------------------------
  val TsLatest: Long = -1L
  val TsEarliest: Long = -2L

  def listOffsetsRequest(correlationId: Int, clientId: String,
                         topic: String, partitions: Seq[Int], timestamp: Long): Array[Byte] = {
    val o = new Out
    o.i32(-1)                             // replica_id: consumer
    o.i32(1).str(topic)
    o.i32(partitions.size)
    partitions.foreach { p => o.i32(p); o.i64(timestamp) }
    request(ApiListOffsets, 1, correlationId, clientId, o.bytes)
  }

  /** partition → (error, offset). */
  def parseListOffsets(body: Array[Byte]): Map[Int, (Short, Long)] = {
    val in = new In(body.drop(4))
    (0 until in.i32).flatMap { _ =>
      in.str
      (0 until in.i32).map { _ =>
        val p = in.i32; val err = in.i16; in.i64 // timestamp
        p -> (err, in.i64)
      }
    }.toMap
  }

  // ---- Fetch v4 ------------------------------------------------------------
  def fetchRequest(correlationId: Int, clientId: String, topic: String,
                   partition: Int, fetchOffset: Long,
                   maxWaitMs: Int = 100, minBytes: Int = 1,
                   maxBytes: Int = 8 * 1024 * 1024): Array[Byte] = {
    val o = new Out
    o.i32(-1)                             // replica_id
    o.i32(maxWaitMs)
    o.i32(minBytes)
    o.i32(maxBytes)
    o.i8(0)                               // isolation_level: READ_UNCOMMITTED
    o.i32(1).str(topic)
    o.i32(1)
    o.i32(partition).i64(fetchOffset).i32(maxBytes)
    request(ApiFetch, 4, correlationId, clientId, o.bytes)
  }

  case class FetchResult(error: Short, highWatermark: Long, records: Seq[(Long, Record)])

  def parseFetchResponse(body: Array[Byte], topic: String, partition: Int): FetchResult = {
    val in = new In(body.drop(4))
    in.i32                                // throttle_time_ms
    var result: Option[FetchResult] = None
    (0 until in.i32).foreach { _ =>
      val t = in.str
      (0 until in.i32).foreach { _ =>
        val p = in.i32
        val err = in.i16
        val hw = in.i64
        in.i64                            // last_stable_offset
        val nAborted = in.i32             // nullable array: -1 = null
        (0 until math.max(nAborted, 0)).foreach { _ => in.i64; in.i64 }
        val set = in.nbytes.getOrElse(Array.emptyByteArray)
        if (t == topic && p == partition)
          result = Some(FetchResult(err, hw, decodeLog(set)))
      }
    }
    result.getOrElse(throw new IllegalStateException(
      s"fetch response missing $topic/$partition"))
  }

  // ---- default partitioner ---------------------------------------------------
  /** Kafka's murmur2 (seed 0x9747b28c) — the default partitioner's
    * hash, so a consumer co-partitioning by key agrees with any stock
    * producer writing the same topic.
    */
  def murmur2(data: Array[Byte]): Int = {
    val seed = 0x9747b28c
    val m = 0x5bd1e995
    val r = 24
    val length = data.length
    var h = seed ^ length
    val length4 = length / 4
    var i = 0
    while (i < length4) {
      val i4 = i * 4
      var k = (data(i4) & 0xff) + ((data(i4 + 1) & 0xff) << 8) +
        ((data(i4 + 2) & 0xff) << 16) + ((data(i4 + 3) & 0xff) << 24)
      k *= m; k ^= k >>> r; k *= m
      h *= m; h ^= k
      i += 1
    }
    (length % 4) match {
      case 3 =>
        h ^= (data((length & ~3) + 2) & 0xff) << 16
        h ^= (data((length & ~3) + 1) & 0xff) << 8
        h ^= data(length & ~3) & 0xff; h *= m
      case 2 =>
        h ^= (data((length & ~3) + 1) & 0xff) << 8
        h ^= data(length & ~3) & 0xff; h *= m
      case 1 =>
        h ^= data(length & ~3) & 0xff; h *= m
      case _ => ()
    }
    h ^= h >>> 13; h *= m; h ^= h >>> 15
    h
  }

  def partitionFor(key: Array[Byte], numPartitions: Int): Int =
    (murmur2(key) & 0x7fffffff) % numPartitions
}
