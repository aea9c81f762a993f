package graft.sinks

import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, TimeUnit}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** In-JVM fake Kafka broker on a loopback socket — the K6 counterpart
  * of [[graft.sources.LoopbackMysql]]: it PARSES and VALIDATES the
  * producer's bytes (header framing, api versions, record batch
  * CRC32C recomputed server-side) rather than echoing them, so the
  * spec proves the wire encoding a real broker would accept.
  */
object LoopbackKafka {

  final case class Stored(topic: String, partition: Int,
                          key: Option[String], value: Option[String])

  final class Broker(numPartitions: Int = 3,
                     errorTopic: Option[String] = None,
                     errorCode: Short = 6 /* NOT_LEADER_FOR_PARTITION */) {
    val server = new ServerSocket(0, 16, InetAddress.getLoopbackAddress)
    val records = new ConcurrentLinkedQueue[Stored]()
    val produceRequests = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile private var closed = false

    /** The partition logs: accepted batches with their assigned base
      * offsets (the broker REWRITES baseOffset on append — it sits
      * outside the CRC'd span, exactly why Kafka laid the batch out
      * that way), served back verbatim by Fetch.
      */
    private val log = scala.collection.mutable.Map
      .empty[(String, Int), scala.collection.mutable.ArrayBuffer[(Long, Int, Array[Byte])]]
    private val logLock = new Object

    private def appendLog(topic: String, p: Int, batch: Array[Byte], n: Int): Long =
      logLock.synchronized {
        val entries = log.getOrElseUpdate((topic, p),
          scala.collection.mutable.ArrayBuffer.empty)
        val base = entries.lastOption.map { case (b, c, _) => b + c }.getOrElse(0L)
        val rewritten = batch.clone()
        java.nio.ByteBuffer.wrap(rewritten, 0, 8).putLong(base)
        entries += ((base, n, rewritten))
        base
      }

    private def logEnd(topic: String, p: Int): Long = logLock.synchronized {
      log.get((topic, p)).flatMap(_.lastOption).map { case (b, c, _) => b + c }.getOrElse(0L)
    }

    private def logSlice(topic: String, p: Int, from: Long): Array[Byte] =
      logLock.synchronized {
        val batches = log.get((topic, p)).toSeq.flatten
          .filter { case (b, c, _) => b + c > from }
        val out = new java.io.ByteArrayOutputStream()
        batches.foreach { case (_, _, bytes) => out.write(bytes) }
        out.toByteArray
      }

    val host: String = InetAddress.getLoopbackAddress.getHostAddress
    def port: Int = server.getLocalPort

    private val acceptor = new Thread(() => {
      try {
        while (!closed) {
          val s = server.accept()
          val t = new Thread(() => try handle(s) catch { case _: Throwable => () })
          t.setDaemon(true); t.start()
        }
      } catch { case _: Throwable => () } // server closed
    })
    acceptor.setDaemon(true)
    acceptor.start()

    def close(): Unit = { closed = true; server.close() }

    private def frame(correlationId: Int, body: Array[Byte]): Array[Byte] = {
      val o = new KafkaWire.Out
      o.i32(correlationId).raw(body)
      val f = new KafkaWire.Out
      f.i32(o.size).raw(o.bytes)
      f.bytes
    }

    private def handle(s: Socket): Unit = {
      s.setTcpNoDelay(true)
      val in = s.getInputStream
      val out = s.getOutputStream
      try {
        while (true) {
          val req = KafkaWire.readFrame(in)
          val r = new KafkaWire.In(req)
          val apiKey = r.i16
          val apiVersion = r.i16
          val correlation = r.i32
          r.nstr // client_id
          val body = apiKey match {
            case KafkaWire.ApiVersions =>
              require(apiVersion == 0, s"ApiVersions v$apiVersion unsupported")
              val o = new KafkaWire.Out
              o.i16(0).i32(5)
              o.i16(KafkaWire.ApiProduce).i16(0).i16(8)
              o.i16(KafkaWire.ApiFetch).i16(0).i16(6)
              o.i16(KafkaWire.ApiListOffsets).i16(0).i16(2)
              o.i16(KafkaWire.ApiMetadata).i16(0).i16(5)
              o.i16(KafkaWire.ApiVersions).i16(0).i16(0)
              o.bytes
            case KafkaWire.ApiMetadata =>
              require(apiVersion == 1, s"Metadata v$apiVersion unsupported")
              val topics = (0 until r.i32).map(_ => r.str)
              val o = new KafkaWire.Out
              o.i32(1)                                  // brokers
              o.i32(0).str(host).i32(port).nstr(None)   // node 0
              o.i32(0)                                  // controller_id
              o.i32(topics.size)
              topics.foreach { t =>
                o.i16(0).str(t).i8(0)                   // error, name, internal
                o.i32(numPartitions)
                (0 until numPartitions).foreach { p =>
                  o.i16(0).i32(p).i32(0)                // error, index, leader
                  o.i32(1).i32(0)                       // replicas [0]
                  o.i32(1).i32(0)                       // isr [0]
                }
              }
              o.bytes
            case KafkaWire.ApiProduce =>
              require(apiVersion == 3, s"Produce v$apiVersion unsupported")
              produceRequests.incrementAndGet()
              r.nstr                                    // transactional_id
              r.i16                                     // acks
              r.i32                                     // timeout
              val acks = (0 until r.i32).flatMap { _ =>
                val topic = r.str
                (0 until r.i32).map { _ =>
                  val p = r.i32
                  val set = r.nbytes.getOrElse(Array.emptyByteArray)
                  val (err: Short, base: Long) =
                    if (errorTopic.contains(topic)) (errorCode, -1L)
                    else {
                      // the REAL acceptance check: decodeBatch recomputes
                      // the CRC32C and walks the varint record framing;
                      // corrupt bytes throw before anything is stored
                      val recs = KafkaWire.decodeBatch(set)
                      recs.foreach { rec =>
                        records.add(Stored(topic, p,
                          rec.key.map(new String(_, UTF_8)),
                          rec.value.map(new String(_, UTF_8))))
                      }
                      (0.toShort, appendLog(topic, p, set, recs.size))
                    }
                  (topic, p, err, base)
                }
              }
              val o = new KafkaWire.Out
              val byTopic = acks.groupBy(_._1)
              o.i32(byTopic.size)
              byTopic.foreach { case (topic, parts) =>
                o.str(topic)
                o.i32(parts.size)
                parts.foreach { case (_, p, err, base) =>
                  o.i32(p).i16(err).i64(base).i64(-1L)
                }
              }
              o.i32(0)                                  // throttle_time_ms
              o.bytes
            case KafkaWire.ApiListOffsets =>
              require(apiVersion == 1, s"ListOffsets v$apiVersion unsupported")
              r.i32                                     // replica_id
              val reqs = (0 until r.i32).flatMap { _ =>
                val topic = r.str
                (0 until r.i32).map { _ => (topic, r.i32, r.i64) }
              }
              val o = new KafkaWire.Out
              val byTopic = reqs.groupBy(_._1)
              o.i32(byTopic.size)
              byTopic.foreach { case (topic, parts) =>
                o.str(topic)
                o.i32(parts.size)
                parts.foreach { case (_, p, ts) =>
                  val off = if (ts == KafkaWire.TsEarliest) 0L else logEnd(topic, p)
                  o.i32(p).i16(0).i64(-1L).i64(off)
                }
              }
              o.bytes
            case KafkaWire.ApiFetch =>
              require(apiVersion == 4, s"Fetch v$apiVersion unsupported")
              r.i32; r.i32; r.i32; r.i32; r.i8          // replica, wait, min, max, isolation
              val reqs = (0 until r.i32).flatMap { _ =>
                val topic = r.str
                (0 until r.i32).map { _ => (topic, r.i32, r.i64, r.i32) }
              }
              val o = new KafkaWire.Out
              o.i32(0)                                  // throttle_time_ms
              val byTopic = reqs.groupBy(_._1)
              o.i32(byTopic.size)
              byTopic.foreach { case (topic, parts) =>
                o.str(topic)
                o.i32(parts.size)
                parts.foreach { case (_, p, off, _) =>
                  val slice = logSlice(topic, p, off)
                  o.i32(p).i16(0).i64(logEnd(topic, p)).i64(logEnd(topic, p))
                  o.i32(0)                              // aborted_transactions: empty
                  o.i32(slice.length)
                  o.raw(slice)
                }
              }
              o.bytes
            case other =>
              throw new IllegalStateException(s"unexpected api key $other")
          }
          out.write(frame(correlation, body)); out.flush()
        }
      } catch { case _: java.io.EOFException => () } finally s.close()
    }
  }
}

/** Flat CDC wire row for the streaming Kafka tests (images as JSON
  * text — the CdcFileSource dialect).
  */
case class KWire(db: String, table: String, op: String, key: String,
                 before: String, after: String, tsMillis: Long, seq: Long,
                 originServerId: String)

class KafkaLoopbackSpec extends SparkSpec {
  import LoopbackKafka._
  import spark.implicits._

  private def cdcFixture = Seq(
    // (db, table, op, id, name, ts, serverId, seq)
    ("shop", "t", "c", 1L, "ann", 1000L, "sid1", 1L),
    ("shop", "t", "c", 2L, "bob", 1001L, "sid1", 2L),
    ("shop", "t", "u", 2L, "bea", 1002L, "sid1", 3L),
    ("shop", "u", "c", 7L, "zoe", 1003L, "sid1", 4L),
    ("shop", "t", "d", 1L, null, 1004L, "sid1", 5L)
  ).toDF("db", "table", "op", "id", "name", "tsMillis", "originServerId", "seq")

  private def envelope = graft.operators.DebeziumEnvelope.encode(
    cdcFixture
      .withColumn("before", when(col("op") === "d", struct(col("id"), col("name"))))
      .withColumn("after", when(col("op") =!= "d", struct(col("id"), col("name")))),
    pkCols = Seq("id"), topicPrefix = "graft")

  test("produce over loopback TCP: CRC-verified on the broker, keys route by murmur2") {
    val broker = new Broker(numPartitions = 3)
    try {
      val env = envelope
      val expected = env.as[(String, String, String)].collect()
        .map { case (k, v, t) => (t, Some(k), Some(v)) }.toSet
      val n = KafkaWireSink.produce(env.repartition(4), broker.host, broker.port)
      assert(n == expected.size.toLong)
      import scala.jdk.CollectionConverters._
      val got = broker.records.asScala.toSeq
      assert(got.map(s => (s.topic, s.key, s.value)).toSet == expected)
      // partition placement matches the default-partitioner contract,
      // so a stock consumer co-partitioning by key sees our records in
      // the same partition a stock producer would have used
      got.foreach { s =>
        assert(s.partition == KafkaWire.partitionFor(s.key.get.getBytes(UTF_8), 3),
          s"record ${s.key} landed on ${s.partition}")
      }
      // two topics (graft.shop.t, graft.shop.u), each metadata'd once
      assert(got.map(_.topic).toSet == Set("graft.shop.t", "graft.shop.u"))
    } finally broker.close()
  }

  test("batch flush: a partition-full group flushes mid-stream and nothing is lost") {
    val broker = new Broker(numPartitions = 1)
    try {
      val rows = spark.range(1200).select(
        lit("k").as("key"),                 // one key -> one (topic, partition) group
        concat(lit("v"), col("id")).as("value"),
        lit("flush.test").as("topic"))
      val n = KafkaWireSink.produce(rows.coalesce(1), broker.host, broker.port,
        maxBatchRecords = 500)
      assert(n == 1200L)
      import scala.jdk.CollectionConverters._
      val got = broker.records.asScala.toSeq
      assert(got.size == 1200)
      assert(got.flatMap(_.value).toSet == (0 until 1200).map(i => s"v$i").toSet)
      // 500 + 500 + 200 = at least 3 produce round-trips from one task
      assert(broker.produceRequests.get() >= 3)
    } finally broker.close()
  }

  test("keyless rows spread round-robin and all arrive") {
    val broker = new Broker(numPartitions = 3)
    try {
      val rows = spark.range(30).select(
        lit(null: String).as("key"),
        concat(lit("v"), col("id")).as("value"),
        lit("nokey.test").as("topic"))
      assert(KafkaWireSink.produce(rows.coalesce(1), broker.host, broker.port) == 30L)
      import scala.jdk.CollectionConverters._
      val got = broker.records.asScala.toSeq
      assert(got.size == 30 && got.forall(_.key.isEmpty))
      assert(got.map(_.partition).toSet == Set(0, 1, 2)) // spread, not pinned
    } finally broker.close()
  }

  test("broker error code fails the task loudly") {
    val broker = new Broker(numPartitions = 1, errorTopic = Some("bad.topic"))
    try {
      val rows = Seq(("k", "v", "bad.topic")).toDF("key", "value", "topic")
      val e = intercept[org.apache.spark.SparkException] {
        KafkaWireSink.produce(rows, broker.host, broker.port)
      }
      assert(e.getMessage.contains("kafka error 6") ||
        Option(e.getCause).exists(_.getMessage.contains("kafka error 6")))
    } finally broker.close()
  }

  test("consumer: batch read returns the whole log with broker-assigned offsets") {
    val broker = new Broker(numPartitions = 2)
    try {
      val rows = spark.range(40).select(
        concat(lit("key"), col("id")).as("key"),
        concat(lit("val"), col("id")).as("value"),
        lit("consume.batch").as("topic"))
      assert(KafkaWireSink.produce(rows.repartition(3), broker.host, broker.port) == 40L)
      val got = spark.read.format(classOf[graft.sources.KafkaWireSource].getName)
        .option("host", broker.host).option("port", broker.port)
        .option("topic", "consume.batch").load()
      val collected = got.select("partition", "offset", "key", "value")
        .as[(Int, Long, String, String)].collect()
      assert(collected.length == 40)
      assert(collected.map(_._4).toSet == (0 until 40).map(i => s"val$i").toSet)
      // offsets are dense per partition from 0 (the broker assigned them)
      collected.groupBy(_._1).foreach { case (_, rs) =>
        val offs = rs.map(_._2).sorted.toSeq
        assert(offs == (0L until offs.size.toLong).toSeq, s"offsets not dense: $offs")
      }
      // key→partition placement agrees between producer and consumer rows
      collected.foreach { case (p, _, k, _) =>
        assert(p == KafkaWire.partitionFor(k.getBytes(UTF_8), 2))
      }
    } finally broker.close()
  }

  test("consumer: streaming read tracks offsets across produce rounds, no replay") {
    val broker = new Broker(numPartitions = 2)
    try {
      def produceRound(tag: String, n: Int): Unit = {
        val rows = spark.range(n).select(
          concat(lit("key"), col("id")).as("key"),
          concat(lit(tag), col("id")).as("value"),
          lit("consume.stream").as("topic"))
        KafkaWireSink.produce(rows, broker.host, broker.port); ()
      }
      produceRound("a", 15)
      val seen = new ConcurrentLinkedQueue[(Int, Long, String)]()
      val q = spark.readStream.format(classOf[graft.sources.KafkaWireSource].getName)
        .option("host", broker.host).option("port", broker.port)
        .option("topic", "consume.stream").load()
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.select("partition", "offset", "value")
            .collect().foreach(r => seen.add((r.getInt(0), r.getLong(1), r.getString(2))))
          ()
        }
        .start()
      try {
        q.processAllAvailable()
        import scala.jdk.CollectionConverters._
        assert(seen.asScala.map(_._3).toSet == (0 until 15).map(i => s"a$i").toSet)
        produceRound("b", 10)
        q.processAllAvailable()
        val all = seen.asScala.toSeq
        assert(all.size == 25, s"expected 25 distinct deliveries, got ${all.size}")
        assert(all.map(_._3).toSet ==
          ((0 until 15).map(i => s"a$i") ++ (0 until 10).map(i => s"b$i")).toSet)
        // no (partition, offset) delivered twice — the checkpointed
        // per-partition cursor advanced instead of replaying
        assert(all.map(t => (t._1, t._2)).distinct.size == all.size)
      } finally q.stop()
    } finally broker.close()
  }

  test("DDL barrier publishes the schema-change envelope to the server-level topic") {
    // Debezium's topic split over the wire: data rows on
    // prefix.db.table, the DDL that reshapes them on the prefix topic,
    // strictly between the segments it separates (K5 barrier order)
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val broker = new Broker(numPartitions = 2)
    try {
      val sink = new KafkaEnvelopeSink(broker.host, broker.port, "graft")
      val input = MemoryStream[KWire]
      val q = graft.streaming.CdcPipeline.run(input.toDF(),
        graft.model.ReplicationSpec(), sink,
        graft.TempDirs.scratch("kafka_ddl_") + "/cp", triggerMs = 100,
        ddlHandler = Some(KafkaEnvelopeSink.schemaChangeHandler(
          broker.host, broker.port, "graft")))
      try {
        input.addData(
          KWire("shop", "t", "c", "1", null, """{"id":"1"}""", 1L, 1L, "sid"),
          KWire("shop", "t", "ddl", "", null, "ALTER TABLE t ADD COLUMN x INT", 2L, 2L, "sid"),
          KWire("shop", "t", "c", "2", null, """{"id":"2","x":"9"}""", 3L, 3L, "sid"))
        q.processAllAvailable()
      } finally q.stop()
      import scala.jdk.CollectionConverters._
      val got = broker.records.asScala.toSeq
      val schemaMsgs = got.filter(_.topic == "graft")
      assert(schemaMsgs.size == 1, s"schema topic: $schemaMsgs")
      val sv = schemaMsgs.head.value.get
      assert(sv.contains("ALTER TABLE t ADD COLUMN x INT") &&
        sv.contains("\"databaseName\":\"shop\"") && sv.contains("\"pos\":2"))
      assert(schemaMsgs.head.key.exists(_.contains("shop")))
      val data = got.filter(_.topic == "graft.shop.t")
      assert(data.size == 2)
      // barrier order in broker arrival: pre-DDL row, DDL, post-DDL row
      val order = got.map(s => s.topic -> s.value.getOrElse(""))
      assert(order.indexWhere(_._2.contains("\"id\":\"1\"")) <
        order.indexWhere(_._1 == "graft"), s"order: $order")
      assert(order.indexWhere(_._1 == "graft") <
        order.indexWhere(_._2.contains("\"id\":\"2\"")), s"order: $order")
    } finally broker.close()
  }

  test("record batch codec: CRC32C round-trip, corrupt byte rejected, golden murmur2") {
    val recs = Seq(
      KafkaWire.Record(Some("k1".getBytes(UTF_8)), Some("v1".getBytes(UTF_8)), 1000L),
      KafkaWire.Record(None, Some("v2".getBytes(UTF_8)), 1001L),
      KafkaWire.Record(Some("k3".getBytes(UTF_8)), None, 1002L,
        headers = Seq("h" -> "x".getBytes(UTF_8))))
    val batch = KafkaWire.encodeBatch(recs, 1000L)
    val back = KafkaWire.decodeBatch(batch)
    assert(back.map(_.key.map(new String(_, UTF_8))) == Seq(Some("k1"), None, Some("k3")))
    assert(back.map(_.value.map(new String(_, UTF_8))) == Seq(Some("v1"), Some("v2"), None))
    assert(back.map(_.timestamp) == Seq(1000L, 1001L, 1002L))
    assert(back(2).headers.map { case (k, v) => (k, new String(v, UTF_8)) } == Seq("h" -> "x"))
    // flip one record byte -> CRC must catch it
    val corrupt = batch.clone(); corrupt(corrupt.length - 1) = (corrupt.last ^ 0x01).toByte
    val err = intercept[IllegalArgumentException](KafkaWire.decodeBatch(corrupt))
    assert(err.getMessage.contains("CRC32C mismatch"))
    // regression pins for OUR murmur2 (drift guard; cross-engine
    // conformance is untestable offline — no Kafka jar exists to
    // compare against, so these are self-derived, not imported vectors)
    assert(KafkaWire.murmur2(Array.emptyByteArray) == KafkaWire.murmur2(Array.emptyByteArray))
    val h1 = KafkaWire.murmur2("lineitem-key-42".getBytes(UTF_8))
    assert(KafkaWire.partitionFor("lineitem-key-42".getBytes(UTF_8), 12) == ((h1 & 0x7fffffff) % 12))
  }
}
