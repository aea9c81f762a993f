package graft

import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.sources.CdcFileSource

/** S1 — the DSv2 MicroBatchStream CDC source: offsets, incremental
  * discovery, admission control, checkpoint resume without duplicates.
  */
class CdcFileSourceSpec extends SparkSpec {

  private def ev(seq: Long, op: String = "c", key: String = "k1"): String =
    s"""{"db":"shop","table":"t","op":"$op","key":"$key","before":null,""" +
      s""""after":"{\\"v\\":$seq}","ts_ms":${1000 + seq},"gtid":"uuid:$seq","seq":$seq,""" +
      s""""last_committed":${seq - 1},"origin_server_id":"server-1"}"""

  private def fmt = classOf[CdcFileSource].getName

  test("batch read sees all segments; streaming reads incrementally with offsets") {
    val dir = graft.TempDirs.scratch("graft-cdc")
    CdcFileSource.writeSegment(dir, (1L to 5L).map(s => ev(s)), 1, 5)
    CdcFileSource.writeSegment(dir, (6L to 9L).map(s => ev(s)), 6, 9)

    // batch read
    val all = spark.read.format(fmt).option("path", dir).load()
    assert(all.count() == 9)
    assert(all.selectExpr("max(seq)").head.getLong(0) == 9L)

    // streaming read
    val q = spark.readStream.format(fmt).option("path", dir).load()
      .writeStream.format("memory").queryName("cdcstream").outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      assert(spark.table("cdcstream").count() == 9)
      // new segment appears mid-stream → picked up, no re-read of old ones
      CdcFileSource.writeSegment(dir, (10L to 12L).map(s => ev(s, op = "u")), 10, 12)
      q.processAllAvailable()
      assert(spark.table("cdcstream").count() == 12)
      assert(spark.table("cdcstream").where("op = 'u'").count() == 3)
    } finally q.stop()
  }

  test("checkpoint resume continues from the committed offset, no duplicates") {
    val dir = graft.TempDirs.scratch("graft-cdc2")
    val ckpt = graft.TempDirs.scratch("graft-ckpt")
    val out = graft.TempDirs.scratch("graft-out")
    CdcFileSource.writeSegment(dir, (1L to 4L).map(s => ev(s)), 1, 4)

    def run(): Unit = {
      val q = spark.readStream.format(fmt).option("path", dir).load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode(OutputMode.Append).start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(spark.read.parquet(out).count() == 4)
    CdcFileSource.writeSegment(dir, (5L to 7L).map(s => ev(s)), 5, 7)
    run() // fresh query, same checkpoint → only the new range
    val rows = spark.read.parquet(out)
    assert(rows.count() == 7)
    assert(rows.select("seq").distinct().count() == 7)
  }

  test("maxOffsetsPerTrigger paces admission") {
    val dir = graft.TempDirs.scratch("graft-cdc3")
    CdcFileSource.writeSegment(dir, (1L to 10L).map(s => ev(s)), 1, 10)
    val q = spark.readStream.format(fmt).option("path", dir)
      .option("maxOffsetsPerTrigger", "4").load()
      .writeStream.format("memory").queryName("paced").outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow()).start()
    try {
      q.awaitTermination(60000)
      assert(spark.table("paced").count() == 10)
      // 10 seqs at <=4 per trigger => at least 3 micro-batches ran
      assert(q.recentProgress.count(_.numInputRows > 0) >= 3)
    } finally q.stop()
  }

  test("end-to-end: DSv2 source -> route/filter pipeline -> upsert sink") {
    import graft.model.{ReplicationSpec, SchemaSpec}
    import graft.streaming.{CdcPipeline, ParquetUpsertSink}
    val dir = graft.TempDirs.scratch("graft-e2e-src")
    val work = graft.TempDirs.scratch("graft-e2e")
    // shop.t rows k1..k3; one foreign-db row and one delete
    CdcFileSource.writeSegment(dir, Seq(
      ev(1, "c", "k1"), ev(2, "c", "k2"), ev(3, "c", "k3"),
      s"""{"db":"other","table":"t","op":"c","key":"x","before":null,"after":"{}","ts_ms":1,"gtid":"g:4","seq":4,"last_committed":3,"origin_server_id":"server-1"}""",
      ev(5, "u", "k2"), ev(6, "d", "k3")), 1, 6)
    val spec = ReplicationSpec(doDb = Seq(SchemaSpec("shop")), skipOps = Set.empty)
    val sink = new ParquetUpsertSink(spark, s"$work/table", s"$work/ledger", "key", "seq", "op")
    val events = spark.readStream.format(fmt).option("path", dir).load()
    val q = CdcPipeline.run(events, spec, sink, s"$work/ckpt", triggerMs = 100)
    try q.processAllAvailable() finally q.stop()
    val state = spark.read.parquet(s"$work/table").select("key", "seq").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(state == Map("k1" -> 1L, "k2" -> 5L)) // k3 deleted, other.t routed out
  }

  test("fixture-scale: paced streaming replication equals the one-pass batch replay") {
    // the cross-micro-batch pin: 1000 fixture events split over 4
    // segments, admitted <=150 seqs per trigger (>=7 micro-batches) —
    // the sink's incremental merge + ledger must land on exactly the
    // state a single batch applyChangeLog computes
    import graft.model.{ChangeEvent, ReplicationSpec, SchemaSpec}
    import graft.streaming.{CdcPipeline, ParquetUpsertSink}
    import org.apache.spark.sql.functions.{col, when}
    import spark.implicits._
    val work = graft.TempDirs.scratch("graft-equiv")
    val evRows = Tables.load(spark, sf, "events")
      .withColumn("op",
        when(col("event_type") === "error", "d")
          .when(col("event_type") === "signup", "c").otherwise("u"))
      .select("event_id", "user_id", "event_type", "value", "op")
      .as[(Long, Long, String, Double, String)].collect().sortBy(_._1)
    val ces = evRows.map { case (eid, uid, et, v, op) =>
      ChangeEvent("shop", "t", op, uid.toString, Map.empty,
        if (op == "d") Map.empty else Map("event_type" -> et, "value" -> v.toString),
        1000 + eid, s"u:$eid", eid, eid - 1, "server-1")
    }
    ces.grouped(250).foreach(g => CdcFileSource.writeEvents(s"$work/stream", g.toSeq))
    val sink = new ParquetUpsertSink(spark, s"$work/table", s"$work/ledger", "key", "seq", "op")
    val stream = spark.readStream.format(fmt).option("path", s"$work/stream")
      .option("maxOffsetsPerTrigger", "150").load()
    val q = CdcPipeline.run(stream,
      ReplicationSpec(doDb = Seq(SchemaSpec("shop")), skipOps = Set.empty),
      sink, s"$work/ckpt", triggerMs = 50)
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.read.parquet(s"$work/table")
      .select("key", "seq").as[(String, Long)].collect().toMap
    val batch = graft.operators.CdcBatch.applyChangeLog(
        ces.toSeq.toDF(), "key", "seq", "op")
      .select("key", "seq").as[(String, Long)].collect().toMap
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("S5: snapshot -> stream handoff starts at the recorded watermark") {
    import graft.model.TableSpec
    val work = graft.TempDirs.scratch("graft-s5")
    val streamDir = s"$work/stream"
    // the change stream contains history BEFORE the snapshot point too
    CdcFileSource.writeSegment(streamDir, (1L to 8L).map(s => ev(s)), 1, 8)

    // 1. consistent snapshot of a source table, recording the watermark
    val runner = new JobRunner(spark, graft.model.ReplicationSpec())
    val src = Tables.load(spark, sf, "orders").limit(100)
      .withColumn("seq", org.apache.spark.sql.functions.lit(5L)) // snapshot taken at seq 5
    val snap = runner.snapshot(src, TableSpec("shop", "orders"), Seq("o_orderkey"), 4,
      s"$work/snap", seqCol = Some("seq"))
    assert(snap.watermark == 5L)

    // 2. incremental phase starts at the watermark: only seq 6-8 flow
    val q = spark.readStream.format(fmt).option("path", streamDir)
      .option("startSeq", snap.watermark.toString).load()
      .writeStream.format("memory").queryName("handoff").outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      val seqs = spark.table("handoff").select("seq").collect().map(_.getLong(0)).sorted
      assert(seqs.sameElements(Array(6L, 7L, 8L)), seqs.mkString(","))
    } finally q.stop()
  }

  test("raw binlog bytes drive the streaming pipeline end-to-end (S1 bytes -> S2 tx)") {
    import graft.sources.{BinlogBytes, BinlogParser}
    import graft.model.ChangeEvent
    import BinlogBytes._
    import BinlogParser.{GTID_EVENT, QUERY_EVENT, TABLE_MAP_EVENT, WRITE_ROWS_V2, XID_EVENT}
    // table: id INT, name VARCHAR(20)
    val sid = Array.tabulate[Byte](16)(i => (i + 1).toByte)
    val metas = new W().u16(20).result
    def img(id: Long, name: String): Array[Byte] = {
      val w = new W()
      w.u8(0x00); w.u32(id)
      val bs = name.getBytes("ISO-8859-1"); w.u8(bs.length); w.raw(bs)
      w.result
    }
    val bytes = file(
      fde(),
      event(GTID_EVENT, gtid(sid, 42L, 7L, 8L), 100),
      event(QUERY_EVENT, query("src", "BEGIN", 45), 110),
      event(TABLE_MAP_EVENT, tableMap(23L, "src", "t", Seq(0x03, 0x0f), metas), 120),
      event(WRITE_ROWS_V2, rows(23L, 2, Seq(img(1, "ann"), img(2, "bob"))), 130),
      event(XID_EVENT, xid(77L), 140))
    val work = java.nio.file.Paths.get(graft.TempDirs.scratch("graft-binlog-e2e"))
    val binlogFile = work.resolve("relay.000001")
    java.nio.file.Files.write(binlogFile, bytes)
    // decode the BYTES and stage them as a stream segment
    val reg = new graft.ddl.SchemaRegistry
    reg.applyDdl("src", "CREATE TABLE t (id INT, name VARCHAR(20))")
    val decoded = BinlogParser.readBinlogFile(binlogFile.toString, reg)
    CdcFileSource.writeEvents(s"$work/stream", decoded)
    // tail the directory as a stream and assemble transactions
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = spark.readStream.format(fmt).option("path", s"$work/stream").load()
    val q = graft.streaming.CdcPipeline
      .assembleTransactions(CdcFileSource.asChangeEvents(stream), timeoutMs = 0)
      .writeStream.format("memory").queryName("binlog_e2e").outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      val txs = spark.table("binlog_e2e").as[graft.model.TxEntry].collect()
      assert(txs.length == 1)
      val tx = txs.head
      assert(tx.gtid == "01020304-0506-0708-090a-0b0c0d0e0f10:42")
      assert(tx.events.map(_.op) == Seq("c", "c"))
      assert(tx.events.map(_.after("name")) == Seq("ann", "bob"))
      assert(tx.events.map(_.after("id")) == Seq("1", "2"))
    } finally q.stop()
  }

  test("permissive mode skips malformed lines; failfast raises") {
    val dir = graft.TempDirs.scratch("graft-cdc-perm")
    CdcFileSource.writeSegment(dir, Seq(ev(1), "{not json", ev(2), """{"no_seq":true}"""), 1, 2)
    val ok = spark.read.format(fmt).option("path", dir).option("mode", "permissive").load()
    assert(ok.count() == 2)
    val strict = spark.read.format(fmt).option("path", dir).load()
    intercept[org.apache.spark.SparkException] { strict.count() }
  }
}
