package graft

import java.net.{InetAddress, ServerSocket}
import java.util.concurrent.{CountDownLatch, TimeUnit}
import graft.sources.{BinlogBytes, BinlogParser, BinlogRelay, CdcFileSource, LoopbackMysql, MysqlBinlogClient}

/** The WHOLE replication spine through one live TCP connection: fake
  * MySQL on a loopback socket → [[MysqlBinlogClient]] dump stream →
  * [[BinlogRelay]] disk relay (S10) → [[BinlogParser.readBinlogFile]]
  * CRC-verified replay → [[CdcFileSource]] stream segments → the
  * streaming [[graft.streaming.CdcPipeline]] with routing + the
  * parquet upsert sink + GTID ledger — asserting the replica's FINAL
  * TABLE STATE. This is the reference's extractor→relay→applier path
  * (`binlog_reader.go` → `applier_incr.go`) as one test.
  */
class SocketPipelineE2ESpec extends SparkSpec {
  import BinlogBytes._
  import LoopbackMysql._

  test("socket → relay → stream source → pipeline → sink: replica state converges") {
    import graft.model.{ReplicationSpec, SchemaSpec}
    import graft.streaming.{CdcPipeline, ParquetUpsertSink}
    val sid = Array.tabulate[Byte](16)(i => (i + 1).toByte)
    def img(id: Long, name: String): Array[Byte] = {
      val w = new W(); w.u8(0); w.u32(id); w.u8(name.length); w.str(name); w.result
    }
    val meta = new W().u16(64).result
    val events = Seq(
      fde(),
      // tx 1: insert ann, bob
      event(BinlogParser.GTID_EVENT, gtid(sid, 31L, 0L, 1L), 100),
      event(BinlogParser.QUERY_EVENT, query("shop", "BEGIN", 45), 110),
      event(BinlogParser.TABLE_MAP_EVENT,
        tableMap(23L, "shop", "t", Seq(0x03, 0x0f), meta), 120),
      event(BinlogParser.WRITE_ROWS_V2, rows(23L, 2, Seq(img(1, "ann"), img(2, "bob"))), 130),
      event(BinlogParser.XID_EVENT, xid(71L), 140),
      // tx 2: bob -> bea, delete ann; plus one row in a ROUTED-OUT db
      event(BinlogParser.GTID_EVENT, gtid(sid, 32L, 1L, 2L), 200),
      event(BinlogParser.QUERY_EVENT, query("shop", "BEGIN", 45), 210),
      event(BinlogParser.TABLE_MAP_EVENT,
        tableMap(23L, "shop", "t", Seq(0x03, 0x0f), meta), 220),
      event(BinlogParser.UPDATE_ROWS_V2,
        rowsUpdate(23L, 2, Seq(img(2, "bob"), img(2, "bea"))), 230),
      event(BinlogParser.DELETE_ROWS_V2, rows(23L, 2, Seq(img(1, "ann"))), 240),
      event(BinlogParser.TABLE_MAP_EVENT,
        tableMap(24L, "other", "t", Seq(0x03, 0x0f), meta), 250),
      event(BinlogParser.WRITE_ROWS_V2, rows(24L, 2, Seq(img(9, "zoe"))), 260),
      event(BinlogParser.XID_EVENT, xid(72L), 270))

    val server = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
    val obs = new Observed
    val ready = new CountDownLatch(1)
    val thread = serve(server, events, obs, ready)
    assert(ready.await(5, TimeUnit.SECONDS))
    val work = TempDirs.scratch("socket-pipeline-e2e")
    try {
      // S1 over the wire + S10 to disk
      val n = BinlogRelay.relayFrom(MysqlBinlogClient.Config(
        host = InetAddress.getLoopbackAddress.getHostAddress,
        port = server.getLocalPort, user = user, password = password,
        serverId = 77L, slaveUuid = "fa" * 16), s"$work/relay.000001")
      thread.join(10000)
      assert(obs.failure == null, s"server-side failure: ${obs.failure}")
      assert(n == events.length.toLong)

      // replay the relay (CRC on) and stage as stream segments
      val reg = new graft.ddl.SchemaRegistry
      reg.applyDdl("shop", "CREATE TABLE t (id INT, name VARCHAR(20))")
      reg.applyDdl("other", "CREATE TABLE t (id INT, name VARCHAR(20))")
      val decoded = BinlogParser.readBinlogFile(s"$work/relay.000001", reg, verifyCrc = true)
      CdcFileSource.writeEvents(s"$work/stream", decoded)

      // the streaming pipeline: route shop.*, apply through the sink
      val spec = ReplicationSpec(doDb = Seq(SchemaSpec("shop")))
      val sink = new ParquetUpsertSink(spark, s"$work/table", s"$work/ledger",
        "key", "seq", "op")
      val stream = spark.readStream
        .format(classOf[CdcFileSource].getName).option("path", s"$work/stream").load()
      val q = CdcPipeline.run(stream, spec, sink, s"$work/ckpt", triggerMs = 100)
      try q.processAllAvailable() finally q.stop()

      // final replica state: only bea (id 2) survives; other.t routed out
      val state = spark.read.parquet(s"$work/table")
        .select("key", "after").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(state.keySet == Set("2"), s"replica state: $state")
      assert(state("2").contains("bea"))
      // the GTID ledger recorded both transactions
      val ledger = spark.read.parquet(s"$work/ledger")
        .select("gtid").collect().map(_.getString(0)).toSet
      val sidUuid = "01020304-0506-0708-090a-0b0c0d0e0f10"
      assert(ledger.exists(_.startsWith(s"$sidUuid:31")) &&
        ledger.exists(_.startsWith(s"$sidUuid:32")), s"ledger: $ledger")
    } finally server.close()
  }

  test("socket → pipeline → Kafka wire: MySQL in, Debezium envelopes out, TCP both ends") {
    // the reference's Kafka JOB TYPE (MySQL extractor → kafka3.go
    // producer) as one test: binlog bytes over a loopback socket in,
    // Debezium envelope bytes over a loopback socket out, with the
    // routing pipeline between — no fake seams anywhere in the spine
    import graft.model.{ReplicationSpec, SchemaSpec}
    import graft.streaming.CdcPipeline
    import graft.sinks.{KafkaEnvelopeSink, LoopbackKafka}
    val sid = Array.tabulate[Byte](16)(i => (i + 1).toByte)
    def img(id: Long, name: String): Array[Byte] = {
      val w = new W(); w.u8(0); w.u32(id); w.u8(name.length); w.str(name); w.result
    }
    val meta = new W().u16(64).result
    val events = Seq(
      fde(),
      event(BinlogParser.GTID_EVENT, gtid(sid, 41L, 0L, 1L), 100),
      event(BinlogParser.QUERY_EVENT, query("shop", "BEGIN", 45), 110),
      event(BinlogParser.TABLE_MAP_EVENT,
        tableMap(23L, "shop", "t", Seq(0x03, 0x0f), meta), 120),
      event(BinlogParser.WRITE_ROWS_V2, rows(23L, 2, Seq(img(1, "ann"), img(2, "bob"))), 130),
      event(BinlogParser.XID_EVENT, xid(81L), 140),
      event(BinlogParser.GTID_EVENT, gtid(sid, 42L, 1L, 2L), 200),
      event(BinlogParser.QUERY_EVENT, query("shop", "BEGIN", 45), 210),
      event(BinlogParser.TABLE_MAP_EVENT,
        tableMap(23L, "shop", "t", Seq(0x03, 0x0f), meta), 220),
      event(BinlogParser.UPDATE_ROWS_V2,
        rowsUpdate(23L, 2, Seq(img(2, "bob"), img(2, "bea"))), 230),
      event(BinlogParser.DELETE_ROWS_V2, rows(23L, 2, Seq(img(1, "ann"))), 240),
      event(BinlogParser.TABLE_MAP_EVENT,
        tableMap(24L, "other", "t", Seq(0x03, 0x0f), meta), 250),
      event(BinlogParser.WRITE_ROWS_V2, rows(24L, 2, Seq(img(9, "zoe"))), 260),
      event(BinlogParser.XID_EVENT, xid(82L), 270))

    val server = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
    val obs = new Observed
    val ready = new CountDownLatch(1)
    val thread = serve(server, events, obs, ready)
    assert(ready.await(5, TimeUnit.SECONDS))
    val work = TempDirs.scratch("socket-kafka-e2e")
    val broker = new LoopbackKafka.Broker(numPartitions = 3)
    try {
      val n = BinlogRelay.relayFrom(MysqlBinlogClient.Config(
        host = InetAddress.getLoopbackAddress.getHostAddress,
        port = server.getLocalPort, user = user, password = password,
        serverId = 78L, slaveUuid = "fb" * 16), s"$work/relay.000001")
      thread.join(10000)
      assert(obs.failure == null, s"server-side failure: ${obs.failure}")
      assert(n == events.length.toLong)

      val reg = new graft.ddl.SchemaRegistry
      reg.applyDdl("shop", "CREATE TABLE t (id INT, name VARCHAR(20))")
      reg.applyDdl("other", "CREATE TABLE t (id INT, name VARCHAR(20))")
      val decoded = BinlogParser.readBinlogFile(s"$work/relay.000001", reg, verifyCrc = true)
      CdcFileSource.writeEvents(s"$work/stream", decoded)

      val spec = ReplicationSpec(doDb = Seq(SchemaSpec("shop")))
      val sink = new KafkaEnvelopeSink(broker.host, broker.port, "graft")
      val stream = spark.readStream
        .format(classOf[CdcFileSource].getName).option("path", s"$work/stream").load()
      val q = CdcPipeline.run(stream, spec, sink, s"$work/ckpt", triggerMs = 100)
      try q.processAllAvailable() finally q.stop()

      import scala.jdk.CollectionConverters._
      val got = broker.records.asScala.toSeq
      // routed: only shop.t publishes; other.t and commit markers don't
      assert(got.map(_.topic).toSet == Set("graft.shop.t"), s"topics: ${got.map(_.topic)}")
      assert(got.size == 4, s"expected 4 DML envelopes, got ${got.size}")
      // the wire payload decodes back through the PUBLIC decode path —
      // the consumer-side S1 deployment reads exactly these bytes
      import spark.implicits._
      val decodedBack = graft.operators.DebeziumEnvelope.decode(
        got.flatMap(_.value).toDF("value")).collect()
      assert(decodedBack.forall(r => r.getString(0) == "shop" && r.getString(1) == "t"))
      val ops = decodedBack.map(_.getString(2)).sorted.toSeq
      assert(ops == Seq("c", "c", "d", "u"), s"ops: $ops")
      val bea = decodedBack.find(_.getString(2) == "u").get
      assert(bea.getString(4).contains("bea"), s"update after: ${bea.getString(4)}")
      val del = decodedBack.find(_.getString(2) == "d").get
      assert(del.getString(3).contains("ann") && del.getString(4) == null)
      // per-key ordering on the wire: key 2's insert(bob) precedes its
      // update(bea) in broker arrival order (same kafka partition by
      // construction — same key), the guarantee downstream compaction
      // and replay both lean on
      val key2 = got.filter(_.key.exists(_.contains("\"2\"")))
      assert(key2.size == 2 && key2.map(_.partition).distinct.size == 1)
      assert(key2.head.value.exists(_.contains("\"op\":\"c\"")) &&
        key2(1).value.exists(_.contains("\"op\":\"u\"")), s"key2 order: ${key2.map(_.value)}")

      // and BACK: the consumer half reads the broker's log over its own
      // sockets (KafkaWireSource, one task per topic-partition), decodes
      // the envelopes through the public path, and replays them into a
      // replica — Kafka as the durable buffer between two engines, the
      // deployment SURVEY §2.1 names for S1
      val consumed = spark.read
        .format(classOf[graft.sources.KafkaWireSource].getName)
        .option("host", broker.host).option("port", broker.port)
        .option("topic", "graft.shop.t").load()
      val replayed = graft.operators.DebeziumEnvelope.decode(consumed)
        .orderBy(org.apache.spark.sql.functions.col("seq")).collect()
      assert(replayed.length == 4)
      val replica = scala.collection.mutable.Map.empty[String, String]
      replayed.foreach { r =>
        val id = // key of the row image: id field of after (or before on delete)
          Option(r.getString(4)).orElse(Option(r.getString(3)))
            .flatMap("\"id\"\\s*:\\s*\"?(\\d+)".r.findFirstMatchIn(_)).map(_.group(1)).get
        r.getString(2) match {
          case "d" => replica.remove(id)
          case _   => replica(id) = r.getString(4)
        }
      }
      assert(replica.keySet == Set("2"), s"replica after Kafka round trip: $replica")
      assert(replica("2").contains("bea"))
    } finally { broker.close(); server.close() }
  }
}
