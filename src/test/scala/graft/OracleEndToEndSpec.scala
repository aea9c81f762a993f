package graft

import org.apache.spark.sql.functions._
import graft.ddl.{DdlProcessor, SchemaRegistry}
import graft.model.{Op, ReplicationSpec, SchemaSpec}
import graft.sinks.SqlBuilder
import graft.sources.{LogMinerTxCache, RedoSqlParser}

/** The full Oracle-source replication path wired end to end — the
  * round-8 closing proof that every S7/S8 stage hands off to the next:
  *
  *   redo rows (csf-split, interleaved txs, rollbacks, DDL)
  *     → [[LogMinerTxCache.reassembleCsf]]       (piece reassembly)
  *     → [[LogMinerTxCache.committedRecords]]    (commit/rollback gate)
  *     → [[RedoSqlParser.toChangeEvents]]        (DML rows + DDL via
  *                                                OracleDdlConverter)
  *     → [[DdlProcessor.process]]                (K5 barrier: registry +
  *                                                rename to target)
  *     → [[SqlBuilder]]                          (target MySQL text)
  *
  * Mirrors the reference loop LoopLogminerRecord → handleSQLs →
  * parseDMLSQL/parseDDLSQL → applier (`log_miner.go:733,918,1075`).
  */
class OracleEndToEndSpec extends SparkSpec {
  import spark.implicits._

  test("redo stream → committed events → DDL barrier → target SQL") {
    // -- the raw LogMiner window: one DDL (auto-committed tx), one
    //    committed DML tx (with a csf-split insert), one rolled-back tx
    val createSql = "CREATE TABLE SHOP.ITEMS(ID NUMBER(8), NAME VARCHAR2(40), ADDED DATE)"
    val (csfA, csfB) = createSql.splitAt(30) // any split point: csf joins pieces verbatim
    val redo = Seq(
      // DDL arrives csf-split across two V$LOGMNR_CONTENTS rows
      (100L, "x1", "ddl", "AAA", 1, csfA, 0),
      (101L, "x1", "ddl", "AAA", 0, csfB, 0),
      (102L, "x1", "commit", "", 0, "", 0),
      // committed DML tx
      (110L, "x2", "c", "R1", 0,
        """insert into "SHOP"."ITEMS"("ID","NAME") values (1,'ok')""", 0),
      (111L, "x2", "u", "R1", 0,
        """update "SHOP"."ITEMS" set "NAME" = 'better' where "ID" = 1""", 0),
      (112L, "x2", "commit", "", 0, "", 0),
      // rolled-back tx: must vanish entirely
      (120L, "x3", "c", "R9", 0,
        """insert into "SHOP"."ITEMS"("ID","NAME") values (9,'gone')""", 0),
      (121L, "x3", "rollback", "", 0, "", 0)
    ).toDF("scn", "xid", "op", "row_id", "csf", "redo_sql", "rollback")

    // -- reassemble csf pieces, then keep only committed records
    val whole = LogMinerTxCache.reassembleCsf(redo, seqCol = "scn")
    val committed = LogMinerTxCache.committedRecords(whole)
      .select(col("scn"), col("xid"), col("redo_sql"))
      .orderBy("scn").as[(Long, String, String)].collect()

    // the rolled-back insert is gone; DDL + 2 DML survive
    assert(committed.map(_._1).toSeq == Seq(100L, 110L, 111L))
    assert(committed.head._3 == createSql) // csf pieces joined verbatim

    // -- decode to ChangeEvents (DML rows + converted DDL)
    val events = RedoSqlParser.toChangeEvents(
      committed.iterator, "oracle-1", segOwner = "SHOP").toSeq
    assert(events.map(_.op) == Seq(Op.Ddl, "c", "u"))
    val ddlEvent = events.head
    assert(ddlEvent.after("sql") ==
      "CREATE TABLE `SHOP`.`ITEMS` (`ID` INT,`NAME` VARCHAR(40),`ADDED` DATETIME) DEFAULT CHARACTER SET = UTF8MB4")

    // -- K5 barrier: route, replay into the registry, rename to target
    val spec = ReplicationSpec(doDb = Seq(SchemaSpec("SHOP")))
    val reg = new SchemaRegistry
    val outcome = DdlProcessor.process(ddlEvent.db, ddlEvent.table,
      ddlEvent.after("sql"), spec, reg, renameSchema = Map("SHOP" -> "shop_t"))
    assert(outcome.schemaChanged)
    assert(outcome.sql.get.startsWith("CREATE TABLE `shop_t`.`ITEMS`"))
    // the registry now knows the SOURCE table's columns — the schema
    // the DML applier binds parameters against
    assert(reg.get("SHOP", "ITEMS").map(_.fieldNames.toSeq)
      .contains(Seq("ID", "NAME", "ADDED")))

    // (the streaming form of this handoff is the next test)
    // -- DML half: the registry-backed table def drives the target SQL
    val cols = reg.get("SHOP", "ITEMS").get.fieldNames.toSeq
    val t = SqlBuilder.TableDef("shop_t", "ITEMS", cols, pkColumns = Seq("ID"))
    assert(SqlBuilder.replaceInto(t, 1) ==
      "REPLACE INTO `shop_t`.`ITEMS` (`ID`, `NAME`, `ADDED`) VALUES (?, ?, ?)")
    // and the events carry exactly the row images the applier binds
    assert(events(1).after == Map("ID" -> "1", "NAME" -> "ok"))
    assert(events(2).before == Map("ID" -> "1") &&
      events(2).after == Map("ID" -> "1", "NAME" -> "better"))
  }

  test("streaming: tx spans micro-batches; DDL barrier applies mid-stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import LogMinerTxCache.RedoRecord
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val repl = ReplicationSpec(doDb = Seq(SchemaSpec("SHOP")))
    val reg = new SchemaRegistry
    val applied = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val input = MemoryStream[RedoRecord]
    val q = LogMinerTxCache.assemble(input.toDS()).writeStream
      .outputMode("append")
      .foreachBatch { (txs: org.apache.spark.sql.Dataset[LogMinerTxCache.OracleTx], _: Long) =>
        applied.synchronized {
          txs.collect().sortBy(_.endScn).foreach { tx =>
            RedoSqlParser.toChangeEvents(
              tx.records.iterator.map(r => (r.scn, r.xid, r.redoSql)),
              "oracle-1", segOwner = "SHOP"
            ).foreach { ev =>
              if (ev.op == Op.Ddl) {
                val out = DdlProcessor.process(ev.db, ev.table, ev.after("sql"), repl, reg)
                applied += (("ddl", out.sql.get))
              } else applied += ((ev.op, s"${ev.table}:${ev.after.getOrElse("ID", "")}"))
            }
          }
        }
        ()
      }.start()
    try {
      // micro-batch 1: an auto-committed DDL tx, plus the START of a
      // DML tx whose commit arrives later — it must WAIT in state
      input.addData(
        RedoRecord(100L, "x1", "ddl", "AAA", "CREATE TABLE SHOP.LIVE(ID NUMBER(8))", 0),
        RedoRecord(101L, "x1", "commit", "", "", 0),
        RedoRecord(110L, "x2", "c", "R1",
          """insert into "SHOP"."LIVE"("ID") values (7)""", 0))
      q.processAllAvailable()
      applied.synchronized {
        assert(applied.toList == List(
          ("ddl", "CREATE TABLE `SHOP`.`LIVE` (`ID` INT) DEFAULT CHARACTER SET = UTF8MB4")))
        assert(reg.get("SHOP", "LIVE").isDefined) // the barrier replayed
      }
      // micro-batch 2: the commit releases the buffered DML
      input.addData(
        RedoRecord(111L, "x2", "c", "R2",
          """insert into "SHOP"."LIVE"("ID") values (8)""", 0),
        RedoRecord(112L, "x2", "commit", "", "", 0))
      q.processAllAvailable()
      applied.synchronized {
        assert(applied.toList.drop(1) == List(("c", "LIVE:7"), ("c", "LIVE:8")))
      }
    } finally q.stop()
  }
}
