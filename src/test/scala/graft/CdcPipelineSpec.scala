package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.model._
import graft.streaming.{CdcPipeline, ParquetUpsertSink}

/** S2 streaming tx assembly + K2-K7 sink semantics, end-to-end through
  * Structured Streaming (MemoryStream source, memory/parquet sinks).
  */
class CdcPipelineSpec extends SparkSpec {

  private def ev(gtid: String, seq: Long, op: String, key: String = "k"): ChangeEvent =
    ChangeEvent("db", "t", op, key, Map.empty, Map("v" -> s"payload$seq"),
      1000L + seq, gtid, seq, seq - 1, "server-1")

  test("assembleTransactions emits a tx when its commit arrives") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[ChangeEvent]
    val q = CdcPipeline.assembleTransactions(input.toDS(), commitOp = "commit", timeoutMs = 0)
      .writeStream.format("memory").queryName("txout").outputMode(OutputMode.Append).start()
    try {
      input.addData(ev("g1", 1, "i"), ev("g1", 2, "u"), ev("g2", 5, "i"))
      q.processAllAvailable()
      assert(spark.table("txout").count() == 0) // no commits yet
      input.addData(ev("g1", 3, "commit"))
      q.processAllAvailable()
      val txs = spark.table("txout").as[TxEntry].collect()
      assert(txs.length == 1)
      assert(txs.head.gtid == "g1" && txs.head.events.map(_.seq) == Seq(1L, 2L))
      input.addData(ev("g2", 6, "commit"))
      q.processAllAvailable()
      assert(spark.table("txout").count() == 2)
    } finally q.stop()
  }

  test("ParquetUpsertSink: upsert + delete + ledger idempotence") {
    import spark.implicits._
    val dir = graft.TempDirs.scratch("graft-sink")
    val sink = new ParquetUpsertSink(spark, s"$dir/table", s"$dir/ledger", "pk", "seq", "op")

    val b1 = Seq(
      ("g1", "k1", 1L, "i", "a"), ("g1", "k2", 2L, "i", "b"),
      ("g2", "k1", 3L, "u", "a2")
    ).toDF("gtid", "pk", "seq", "op", "payload")
    sink.applyBatch(b1, 0L)
    val after1 = spark.read.parquet(s"$dir/table").select("pk", "payload")
      .as[(String, String)].collect().toMap
    assert(after1 == Map("k1" -> "a2", "k2" -> "b"))

    // replay g1+g2 (already applied) + new g3 deleting k2 — replays must no-op
    val b2 = Seq(
      ("g1", "k1", 1L, "i", "a"), ("g2", "k1", 3L, "u", "a2"),
      ("g3", "k2", 4L, "d", null.asInstanceOf[String])
    ).toDF("gtid", "pk", "seq", "op", "payload")
    sink.applyBatch(b2, 1L)
    val after2 = spark.read.parquet(s"$dir/table").select("pk", "payload")
      .as[(String, String)].collect().toMap
    assert(after2 == Map("k1" -> "a2"))

    // full replay of everything: state unchanged
    sink.applyBatch(b1.union(b2), 2L)
    val after3 = spark.read.parquet(s"$dir/table").select("pk", "payload")
      .as[(String, String)].collect().toMap
    assert(after3 == after2)
  }

  test("end-to-end pipeline: route + op filter + cycle filter + sink") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = graft.TempDirs.scratch("graft-pipe")
    val sink = new ParquetUpsertSink(spark, s"$dir/table", s"$dir/ledger", "key", "seq", "op")
    val input = MemoryStream[ChangeEvent]
    val spec = ReplicationSpec(
      doDb = Seq(SchemaSpec("db")),
      skipOps = Set("ddl"),
      selfServerId = Some("self"))
    val q = CdcPipeline.run(input.toDS().toDF(), spec, sink, s"$dir/ckpt", triggerMs = 100)
    try {
      input.addData(
        ev("g1", 1, "i", "a"),
        ev("g1", 2, "ddl", "x"),                       // dropped: op filter
        ev("g2", 3, "i", "b").copy(db = "otherdb"),    // dropped: route
        ev("g3", 4, "i", "c").copy(originServerId = "self") // dropped: cycle
      )
      q.processAllAvailable()
      val keys = spark.read.parquet(s"$dir/table").select("key").as[String].collect().toSet
      assert(keys == Set("a"))
    } finally q.stop()
  }

  test("K5: DDL events act as serial barriers between DML segments") {
    import spark.implicits._
    import graft.streaming.{CdcPipeline, DdlBarrierEvent, UpsertSink}
    // one batch: rows 1,2 | DDL@3 | row 4 | DDL@5 | row 6
    val batch = Seq(
      ("shop", "t", "c", "k1", null.asInstanceOf[String], 1L),
      ("shop", "t", "c", "k2", null.asInstanceOf[String], 2L),
      ("shop", "t", "ddl", "", "ALTER TABLE shop.t ADD COLUMN x INT", 3L),
      ("shop", "t", "c", "k3", null.asInstanceOf[String], 4L),
      ("shop", "t", "ddl", "", "ALTER TABLE shop.t DROP COLUMN x", 5L),
      ("shop", "t", "c", "k4", null.asInstanceOf[String], 6L)
    ).toDF("db", "table", "op", "key", "after", "seq")

    val log = scala.collection.mutable.ArrayBuffer.empty[String]
    val recordingSink = new UpsertSink {
      override def applyBatch(b: org.apache.spark.sql.DataFrame, e: Long): Unit = {
        val seqs = b.select("seq").collect().map(_.getLong(0)).sorted.mkString(",")
        log.synchronized { log += s"dml[$seqs]" }
      }
    }
    val handler = (d: DdlBarrierEvent) => { log.synchronized { log += s"ddl@${d.seq}:${d.sql.take(20)}" }; () }
    CdcPipeline.applyWithDdlBarriers(batch, 0L, recordingSink, Some(handler))
    assert(log.toList == List(
      "dml[1,2]", "ddl@3:ALTER TABLE shop.t A", "dml[4]",
      "ddl@5:ALTER TABLE shop.t D", "dml[6]"), log.toList.toString)
  }

  test("K5: batch source is computed once across all DDL segments (persisted)") {
    import spark.implicits._
    import graft.streaming.{CdcPipeline, DdlBarrierEvent, UpsertSink}
    val evals = spark.sparkContext.longAccumulator("sourceEvals")
    val batch = Seq(
      ("shop", "t", "c", "k1", null.asInstanceOf[String], 1L),
      ("shop", "t", "ddl", "", "ALTER TABLE shop.t ADD COLUMN x INT", 2L),
      ("shop", "t", "c", "k2", null.asInstanceOf[String], 3L),
      ("shop", "t", "ddl", "", "ALTER TABLE shop.t DROP COLUMN x", 4L),
      ("shop", "t", "c", "k3", null.asInstanceOf[String], 5L)
    ).toDS().map { r => evals.add(1); r }
      .toDF("db", "table", "op", "key", "after", "seq")
    val sink = new UpsertSink {
      override def applyBatch(b: org.apache.spark.sql.DataFrame, e: Long): Unit = b.count()
    }
    CdcPipeline.applyWithDdlBarriers(batch, 0L, sink, Some((_: DdlBarrierEvent) => ()))
    // 2 DDL boundaries -> 3 segments, each with a probe + apply action, plus the
    // hasDdl probe and the ddl collect: without the persist the 5-row source
    // would be re-evaluated ~8x (>=40 adds). Persisted, each row computes once
    // for the cache fill plus once for the pre-persist hasDdl probe.
    assert(evals.value <= 10L, s"source evaluated ${evals.value} row-times; batch not cached")
  }

  test("K5: no DDL in batch -> single sink call, handler untouched") {
    import spark.implicits._
    import graft.streaming.{CdcPipeline, DdlBarrierEvent, UpsertSink}
    val batch = Seq(("shop", "t", "c", "k1", null.asInstanceOf[String], 1L))
      .toDF("db", "table", "op", "key", "after", "seq")
    var calls = 0
    val sink = new UpsertSink {
      override def applyBatch(b: org.apache.spark.sql.DataFrame, e: Long): Unit = calls += 1
    }
    CdcPipeline.applyWithDdlBarriers(batch, 0L, sink, Some((_: DdlBarrierEvent) => fail("no DDL expected")))
    assert(calls == 1)
  }
}
