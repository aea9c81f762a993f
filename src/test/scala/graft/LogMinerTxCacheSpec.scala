package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.sources.LogMinerTxCache
import graft.sources.LogMinerTxCache.{OracleTx, RedoRecord}

/** S7 — LogMiner tx cache semantics (reference
  * `driver/oracle/extractor/log_miner.go:394-500`, tests
  * `log_miner_test.go:141,295`): commit emits, rollback drops, a
  * rollback-flagged record cancels earlier same-ROWID records.
  */
class LogMinerTxCacheSpec extends SparkSpec {

  private def r(scn: Long, xid: String, op: String, rowId: String = "AAA", rb: Int = 0) =
    RedoRecord(scn, xid, op, rowId, s"sql@$scn", rb)

  // ---- batch form -----------------------------------------------------

  private def batch(recs: RedoRecord*) = {
    import spark.implicits._
    LogMinerTxCache.committedRecords(
      recs.toDS().toDF("scn", "xid", "op", "row_id", "redo_sql", "rollback"))
  }

  test("batch: only committed transactions survive") {
    val out = batch(
      r(1, "tx1", "c"), r(2, "tx1", "u"), r(3, "tx1", "commit"),
      r(4, "tx2", "c"), r(5, "tx2", "rollback"),
      r(6, "tx3", "d") // still active: no terminal op
    ).select("scn").collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(1L, 2L))
  }

  test("batch: partial rollback cancels earlier same-rowid records only") {
    val out = batch(
      r(1, "tx1", "c", rowId = "R1"),
      r(2, "tx1", "c", rowId = "R2"),
      r(3, "tx1", "u", rowId = "R1"),
      r(4, "tx1", "d", rowId = "R1", rb = 1), // cancels scn 1 and 3
      r(5, "tx1", "c", rowId = "R1"),         // written after: survives
      r(6, "tx1", "commit")
    )
    assert(out.select("scn").collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 5L))
    assert(out.select("end_scn").distinct().collect().map(_.getLong(0)).toSeq == Seq(6L))
  }

  test("batch: commit of an empty (fully cancelled) tx emits nothing") {
    val out = batch(
      r(1, "tx1", "c", rowId = "R1"),
      r(2, "tx1", "c", rowId = "R1", rb = 1),
      r(3, "tx1", "commit"))
    assert(out.count() == 0)
  }

  // ---- csf continuation reassembly -------------------------------------

  private def csf(rows: (Long, String, Int, String)*) = {
    import spark.implicits._
    LogMinerTxCache.reassembleCsf(
      rows.map { case (seq, xid, f, sql) => (seq * 10, xid, seq, f, sql) }
        .toDF("scn", "xid", "seq", "csf", "redo_sql"))
  }

  test("csf: runs concatenate in order, metadata from the first piece") {
    val out = csf(
      (1, "tx1", 1, "insert into t va"),
      (2, "tx1", 1, "lues ("),
      (3, "tx1", 0, "1)"),
      (4, "tx1", 0, "delete from t"),
      (5, "tx2", 0, "update t")
    ).select("scn", "xid", "redo_sql", "n_pieces")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3))).toSet
    assert(out == Set(
      (10L, "tx1", "insert into t values (1)", 3),
      (40L, "tx1", "delete from t", 1),
      (50L, "tx2", "update t", 1)))
  }

  test("csf: a truncated trailing run still emits (cursor-end behavior)") {
    val out = csf((1, "tx1", 1, "insert into"), (2, "tx1", 1, " t values"))
      .select("redo_sql", "n_pieces").collect()
    assert(out.length == 1)
    assert(out.head.getString(0) == "insert into t values" && out.head.getInt(1) == 2)
  }

  test("csf: a NULL csf value reads as 'record finished', not as csf=1") {
    // lag(csf, 1, 0)'s default only covers the missing first row; a NULL
    // csf VALUE in the predecessor must open a new record too (coalesce)
    import spark.implicits._
    val in = Seq(
      (10L, "tx1", 1L, Some(0), "a"),
      (20L, "tx1", 2L, None, "b"),    // null csf: terminates its own record
      (30L, "tx1", 3L, Some(0), "c")  // must OPEN a new record, not append
    ).toDF("scn", "xid", "seq", "csf", "redo_sql")
    val out = LogMinerTxCache.reassembleCsf(in)
      .select("redo_sql").collect().map(_.getString(0)).toSet
    assert(out == Set("a", "b", "c"))
  }

  test("csf: interleaved transactions never merge pieces across xids") {
    // LogMiner emits a record's pieces consecutively; different xids'
    // RECORDS may interleave in the global log order
    val out = csf(
      (1, "tx1", 1, "a"), (2, "tx1", 0, "b"),
      (3, "tx2", 1, "x"), (4, "tx2", 0, "y"),
      (5, "tx1", 0, "c")
    ).select("xid", "redo_sql").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("tx1", "ab"), ("tx1", "c"), ("tx2", "xy")))
  }

  // ---- streaming form -------------------------------------------------

  test("streaming: commit emits in scn order, rollback drops, xid recycles") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[RedoRecord]
    val q = LogMinerTxCache.assemble(input.toDS())
      .writeStream.format("memory").queryName("oratx").outputMode(OutputMode.Append).start()
    try {
      input.addData(r(2, "tx1", "u", "R2"), r(1, "tx1", "c", "R1"), r(4, "tx2", "c"))
      q.processAllAvailable()
      assert(spark.table("oratx").count() == 0) // nothing committed yet

      input.addData(r(3, "tx1", "commit"))
      q.processAllAvailable()
      val tx1 = spark.table("oratx").as[OracleTx].collect()
      assert(tx1.length == 1)
      assert(tx1.head.xid == "tx1" && tx1.head.startScn == 1 && tx1.head.endScn == 3)
      assert(tx1.head.records.map(_.scn) == Seq(1L, 2L)) // scn order

      input.addData(r(5, "tx2", "rollback")) // tx2 dropped
      // recycled xid: new tx under tx1 after its commit
      input.addData(r(6, "tx1", "d", "R9"), r(7, "tx1", "commit"))
      q.processAllAvailable()
      val all = spark.table("oratx").as[OracleTx].collect().sortBy(_.endScn)
      assert(all.length == 2)
      assert(all.last.records.map(_.scn) == Seq(6L))
      assert(!all.exists(_.xid == "tx2"))
    } finally q.stop()
  }

  test("streaming: partial rollback cancels buffered same-rowid records") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[RedoRecord]
    val q = LogMinerTxCache.assemble(input.toDS())
      .writeStream.format("memory").queryName("oratx2").outputMode(OutputMode.Append).start()
    try {
      input.addData(r(1, "tx1", "c", "R1"), r(2, "tx1", "c", "R2"))
      q.processAllAvailable()
      input.addData(r(3, "tx1", "u", "R1", rb = 1), r(4, "tx1", "commit"))
      q.processAllAvailable()
      val txs = spark.table("oratx2").as[OracleTx].collect()
      assert(txs.length == 1)
      assert(txs.head.records.map(_.scn) == Seq(2L))
    } finally q.stop()
  }

  test("streaming and batch forms agree on a mixed workload") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val recs = (0L until 400L).map { i =>
      val tx = s"x${i / 20}"
      val p = i % 20
      if (p == 19) r(i, tx, if ((i / 20) % 4 == 0) "rollback" else "commit")
      else r(i, tx, Seq("c", "u", "d")(p.toInt % 3), rowId = s"R${p % 5}", rb = if (p == 15) 1 else 0)
    }
    val fromBatch = batch(recs: _*).select("scn").collect().map(_.getLong(0)).toSet

    val input = MemoryStream[RedoRecord]
    val q = LogMinerTxCache.assemble(input.toDS())
      .writeStream.format("memory").queryName("oratx3").outputMode(OutputMode.Append).start()
    val fromStream = try {
      input.addData(recs.take(150): _*)
      q.processAllAvailable()
      input.addData(recs.drop(150): _*)
      q.processAllAvailable()
      spark.table("oratx3").as[OracleTx].collect().flatMap(_.records).map(_.scn).toSet
    } finally q.stop()
    assert(fromBatch == fromStream)
    assert(fromBatch.nonEmpty)
  }
}
