package graft.sinks

import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.DataFrame

/** K6 deployment shape — publish a `(key, value, topic)` frame (the
  * [[graft.operators.DebeziumEnvelope]] output) to a Kafka broker over
  * raw TCP via [[KafkaWire]] (reference producer loop
  * `driver/kafka/kafka3.go:867-1063`; the library it delegates to is
  * replaced by the from-scratch wire layer since the sandbox has no
  * Kafka jar).
  *
  * Distribution shape: `foreachPartition` — one connection per task,
  * records grouped by (topic, murmur2(key) % partitions) into v2
  * batches, flushed when a group hits `maxBatchRecords` and at task
  * end. A non-zero partition error code fails the task (Spark's retry
  * then re-produces the partition — at-least-once, the reference's
  * delivery contract). Nothing is collected to the driver; per-task
  * state is one socket plus the open batches.
  */
object KafkaWireSink {

  /** Produce every row of `df` (columns: key STRING, value STRING,
    * topic STRING) to the broker at host:port. Returns the row count
    * (the action that runs the job).
    */
  def produce(df: DataFrame, host: String, port: Int,
              acks: Short = -1, timeoutMs: Int = 30000,
              maxBatchRecords: Int = 500, clientId: String = "graft-sink"): Long = {
    val counter = df.sparkSession.sparkContext.longAccumulator("kafka_records")
    df.select("key", "value", "topic").foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        if (rows.hasNext) {
          val conn = new Conn(host, port, clientId, acks, timeoutMs)
          try {
            val open = scala.collection.mutable.LinkedHashMap
              .empty[(String, Int), scala.collection.mutable.ArrayBuffer[KafkaWire.Record]]
            rows.foreach { r =>
              val key = Option(r.getString(0)).map(_.getBytes(UTF_8))
              val value = Option(r.getString(1)).map(_.getBytes(UTF_8))
              val topic = r.getString(2)
              val nParts = conn.partitionCount(topic)
              // keyless rows (no PK table) spread round-robin like the
              // stock producer's sticky fallback; keyed rows follow the
              // default partitioner so external consumers co-partition
              val p = key.fold(conn.nextRoundRobin(nParts))(KafkaWire.partitionFor(_, nParts))
              val buf = open.getOrElseUpdate((topic, p),
                scala.collection.mutable.ArrayBuffer.empty[KafkaWire.Record])
              buf += KafkaWire.Record(key, value, System.currentTimeMillis())
              counter.add(1L)
              if (buf.size >= maxBatchRecords) {
                conn.send(topic, p, buf.toSeq); open.remove((topic, p)); ()
              }
            }
            open.foreach { case ((topic, p), buf) => conn.send(topic, p, buf.toSeq) }
          } finally conn.close()
        }
    }
    counter.value
  }

  /** Driver-side produce of a handful of control-plane messages (DDL
    * schema-change envelopes at a barrier) without scheduling a Spark
    * job — DDL is rare and serialized by design (K5), so one
    * short-lived connection from the driver is the right altitude.
    * `rows` = (key, value, topic).
    */
  def produceLocal(host: String, port: Int,
                   rows: Seq[(Option[String], String, String)],
                   acks: Short = -1, timeoutMs: Int = 30000,
                   clientId: String = "graft-ddl"): Unit =
    if (rows.nonEmpty) {
      val conn = new Conn(host, port, clientId, acks, timeoutMs)
      try rows.foreach { case (key, value, topic) =>
        val nParts = conn.partitionCount(topic)
        val p = key.map(_.getBytes(UTF_8)).fold(conn.nextRoundRobin(nParts))(
          KafkaWire.partitionFor(_, nParts))
        conn.send(topic, p, Seq(KafkaWire.Record(
          key.map(_.getBytes(UTF_8)), Some(value.getBytes(UTF_8)),
          System.currentTimeMillis())))
      } finally conn.close()
    }

  /** One producer connection: handshake once, cache topic metadata,
    * frame/ack produce calls.
    */
  private final class Conn(host: String, port: Int, clientId: String,
                           acks: Short, timeoutMs: Int) {
    private val socket = new Socket()
    socket.connect(new InetSocketAddress(host, port), timeoutMs)
    socket.setSoTimeout(timeoutMs)
    socket.setTcpNoDelay(true)
    private val out = socket.getOutputStream
    private val in = socket.getInputStream
    private var correlation = 0
    private var rr = 0
    private val partitions = scala.collection.mutable.Map.empty[String, Int]

    locally {
      // version sanity up front: a broker that cannot speak Produce v3
      // (v2 batches) must fail the task loudly, not corrupt silently
      val (err, versions) = KafkaWire.parseApiVersions(
        roundTrip(KafkaWire.apiVersionsRequest(nextId(), clientId)))
      require(err == 0, s"ApiVersions error $err")
      val produceOk = versions.get(KafkaWire.ApiProduce).exists {
        case (min, max) => min <= 3 && max >= 3 }
      require(produceOk, s"broker cannot speak Produce v3: ${versions.get(KafkaWire.ApiProduce)}")
    }

    def partitionCount(topic: String): Int =
      partitions.getOrElseUpdate(topic, {
        val md = KafkaWire.parseMetadata(
          roundTrip(KafkaWire.metadataRequest(nextId(), clientId, Seq(topic))))
        val tm = md.topics.find(_.name == topic)
          .getOrElse(throw new IllegalStateException(s"no metadata for $topic"))
        require(tm.error == 0, s"metadata error ${tm.error} for $topic")
        require(tm.partitions.nonEmpty, s"topic $topic has no partitions")
        tm.partitions.size
      })

    def nextRoundRobin(nParts: Int): Int = { rr += 1; ((rr - 1) % nParts + nParts) % nParts }

    def send(topic: String, partition: Int, records: Seq[KafkaWire.Record]): Unit = {
      val batch = KafkaWire.encodeBatch(records, records.head.timestamp)
      val resp = roundTrip(KafkaWire.produceRequest(nextId(), clientId, acks, timeoutMs,
        Seq(topic -> Seq(partition -> batch))))
      val pa = KafkaWire.parseProduceResponse(resp)
        .find(a => a.topic == topic && a.partition == partition)
        .getOrElse(throw new IllegalStateException(s"no ack for $topic/$partition"))
      if (pa.error != 0)
        throw new IllegalStateException(
          s"produce to $topic/$partition failed: kafka error ${pa.error}")
    }

    private def nextId(): Int = { correlation += 1; correlation }

    private def roundTrip(framed: Array[Byte]): Array[Byte] = {
      out.write(framed); out.flush()
      val resp = KafkaWire.readFrame(in)
      val got = java.nio.ByteBuffer.wrap(resp, 0, 4).getInt
      require(got == correlation, s"correlation drift: sent $correlation got $got")
      resp
    }

    def close(): Unit = socket.close()
  }
}
