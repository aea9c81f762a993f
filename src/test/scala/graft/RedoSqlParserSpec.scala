package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.RedoSqlParser
import graft.model.Op

/** S7/S8 golden tests mirroring the reference's LogMiner parsing suite
  * (`driver/oracle/extractor/log_miner_test.go:141-656`,
  * `sql_parse_test.go:7`): redo SQL → expected row maps.
  */
class RedoSqlParserSpec extends AnyFunSuite {

  test("insert with quoted idents and mixed literals") {
    val p = RedoSqlParser.parse(
      """insert into "SCOTT"."EMP"("ID","NAME","SAL","HIRED") values (1,'O''Brien',1234.5,TO_DATE('2021-03-04 10:00:00', 'YYYY-MM-DD HH24:MI:SS'))""").get
    assert(p.schema == "SCOTT" && p.table == "EMP" && p.op == Op.Insert)
    assert(p.after == Map("ID" -> "1", "NAME" -> "O'Brien", "SAL" -> "1234.5",
      "HIRED" -> "2021-03-04 10:00:00"))
    assert(p.before.isEmpty)
  }

  test("update: where conjuncts become before image, set merges into after") {
    val p = RedoSqlParser.parse(
      """update "S"."T" set "NAME" = 'new', "N" = 2 where "ID" = 7 and "NAME" = 'old' and "N" = 1""").get
    assert(p.op == Op.Update)
    assert(p.before == Map("ID" -> "7", "NAME" -> "old", "N" -> "1"))
    assert(p.after == Map("ID" -> "7", "NAME" -> "new", "N" -> "2"))
  }

  test("delete with IS NULL conjunct") {
    val p = RedoSqlParser.parse(
      """delete from "S"."T" where "ID" = 3 and "NOTE" IS NULL""").get
    assert(p.op == Op.Delete)
    assert(p.before("ID") == "3")
    assert(p.before.contains("NOTE") && p.before("NOTE") == null)
    assert(p.after.isEmpty)
  }

  test("value converters: hextoraw, empty lobs, null, timestamps") {
    val p = RedoSqlParser.parse(
      """insert into "S"."T"("B","C","X","TS") values (HEXTORAW('DEADBEEF'),EMPTY_CLOB(),NULL,TO_TIMESTAMP('2020-01-01 00:00:00.123'))""").get
    assert(p.after("B") == "deadbeef")
    assert(p.after("C") == "")
    assert(p.after("X") == null)
    assert(p.after("TS") == "2020-01-01 00:00:00.123")
  }

  test("value converters: UNISTR (+concat), intervals, Inf/Nan null out") {
    // reference goldens: UNISTR('\0412\044B')||UNISTR('\0431\0443') = Выбу
    // (sql_parse_test.go TestColumnsValueConverter)
    val p = RedoSqlParser.parse(
      """insert into "S"."T"("N1","N2","DS","YM","F1","F2","F3") values (""" +
        """UNISTR('\0412\044B') ||UNISTR('\0431\0443'),""" +
        """UNISTR('\6570\636E\5E93\6D4B\8BD5'),""" +
        """TO_DSINTERVAL('+00 01:02:03.000000'),""" +
        """TO_YMINTERVAL('+01-02'),Inf,-Inf,Nan)""").get
    assert(p.after("N1") == "Выбу")
    assert(p.after("N2") == "数据库测试")
    assert(p.after("DS") == "+00 01:02:03.000000")
    assert(p.after("YM") == "+01-02")
    assert(p.after("F1") == null && p.after("F2") == null && p.after("F3") == null)
    // mixed literal chars + escapes; doubled-backslash (restored-SQL) form
    val q = RedoSqlParser.parse(
      """insert into T2(A,B) values (UNISTR('x\0041y'),UNISTR('\\0412'))""").get
    assert(q.after("A") == "xAy")
    assert(q.after("B") == "В")
    // malformed trailing escape stops cleanly, never loops
    assert(RedoSqlParser.parse("""insert into T3(A) values (UNISTR('\04'))""")
      .get.after("A") == "")
  }

  test("unquoted identifiers and schemaless table") {
    val p = RedoSqlParser.parse("insert into T1(ID) values (9)").get
    assert(p.schema == "" && p.table == "T1" && p.after("ID") == "9")
  }

  test("non-DML returns None") {
    assert(RedoSqlParser.parse("commit").isEmpty)
    assert(RedoSqlParser.parse("alter table t add c int").isEmpty)
  }

  test("toChangeEvents orders by SCN and tags xid") {
    val evs = RedoSqlParser.toChangeEvents(Iterator(
      (100L, "x1", """insert into "S"."T"("ID") values (1)"""),
      (101L, "x1", "commit"),
      (102L, "x2", """delete from "S"."T" where "ID" = 1""")
    ), "oracle-1").toSeq
    assert(evs.map(_.seq) == Seq(100L, 102L))
    assert(evs.map(_.op) == Seq("c", "d"))
    assert(evs.head.gtid == "x1")
  }

  test("DDL redo converts to a MySQL-dialect Op.Ddl event in-stream") {
    // the parseDDLSQL branch of the LogMiner loop: DDL redo arrives
    // interleaved with DML; the event's sql is already MySQL dialect
    val evs = RedoSqlParser.toChangeEvents(Iterator(
      (200L, "x3", """insert into "S"."T"("ID") values (2)"""),
      (201L, "x3", "CREATE TABLE S.T2(ID NUMBER(8), NOTE VARCHAR2(50))"),
      (202L, "x3", "commit"), // neither DML nor convertible DDL → dropped
      (203L, "x4", "alter table T2 add (C2 DATE)") // unqualified → segOwner
    ), "oracle-1", segOwner = "S").toSeq
    assert(evs.map(_.seq) == Seq(200L, 201L, 203L))
    val ddl = evs(1)
    assert(ddl.op == graft.model.Op.Ddl && ddl.db == "S" && ddl.table == "T2")
    assert(ddl.after("sql") ==
      "CREATE TABLE `S`.`T2` (`ID` INT,`NOTE` VARCHAR(50)) DEFAULT CHARACTER SET = UTF8MB4")
    assert(evs(2).after("sql") == "ALTER TABLE `S`.`T2` ADD COLUMN (`C2` DATETIME)")
  }

  test("unconvertible DDL fails the batch instead of silently dropping") {
    // reference parseToDataEvent propagates the parseDDLSQL error
    // (log_miner.go:903-907); a dropped DDL would diverge the target
    // schema with no trace
    val ex = intercept[IllegalArgumentException] {
      RedoSqlParser.toChangeEvents(Iterator(
        (300L, "x5", "CREATE SYNONYM S1 FOR T1")
      ), "oracle-1", segOwner = "S").toSeq
    }
    assert(ex.getMessage.contains("scn=300"))
    assert(ex.getMessage.contains("CREATE SYNONYM S1 FOR T1"))
  }

  test("malformed DML fails the batch; tx-control rows still skip silently") {
    val ex = intercept[IllegalArgumentException] {
      RedoSqlParser.toChangeEvents(Iterator(
        (301L, "x6", """insert into "S"."T"("ID" values garbage""")
      ), "oracle-1").toSeq
    }
    assert(ex.getMessage.contains("scn=301"))
    // commit / rollback / set transaction: not op-codes 1/2/3/5 → skipped
    val evs = RedoSqlParser.toChangeEvents(Iterator(
      (302L, "x7", "commit"),
      (303L, "x7", "rollback"),
      (304L, "x7", "set transaction read write")
    ), "oracle-1").toSeq
    assert(evs.isEmpty)
  }

  test("S9 snapshot chunks produce rownum-windowed AS OF SCN queries") {
    val chunks = RedoSqlParser.snapshotChunks("S", "T", 12345L, totalRows = 10, chunk = 4)
    assert(chunks.size == 3)
    assert(chunks.head.contains("AS OF SCN 12345"))
    assert(chunks.head.contains("ROWNUM <= 4") && chunks.head.contains("rn > 0"))
    assert(chunks.last.contains("ROWNUM <= 12") && chunks.last.contains("rn > 8"))
  }
}
